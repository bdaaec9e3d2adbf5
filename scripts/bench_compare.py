"""Cross-round bench drift comparator.

Round 4's VERDICT asked for per-query plan-cost attribution across
rounds: wall-clock alone cannot separate a plan that got heavier from
a noisy environment (same wall, more task time = plan got heavier;
same task time, more wall = environment). bench.py writes the needed
SQLMetrics to ``bench_metrics.json``; this tool diffs two such files
(typically ``metrics_history/rNN.json`` snapshots).

Usage: python scripts/bench_compare.py OLD.json NEW.json

Prints one row per query shared by both files: wall ratio, per-pass
executor task-time ratio, shuffle-bytes ratio — ratios > 1 mean NEW is
more expensive. Queries present in only one file are listed at the
end.
"""

from __future__ import annotations

import json
import sys


def _per_pass_task_ms(m: dict) -> float | None:
    tt = m.get("task_time_ms")
    if tt is None:
        return None
    return tt / max(m.get("timed_passes", 1), 1)


def _ratio(old, new) -> str:
    if old is None or new is None or old == 0:
        return "   —"
    return f"{new / old:5.2f}"


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    print(
        f"{'query':<28} {'wall_old':>8} {'wall_new':>8} {'wall×':>5} "
        f"{'task×':>5} {'shuf×':>5}"
    )
    for q in shared:
        om = old.get("query_metrics", {}).get(q, {})
        nm = new.get("query_metrics", {}).get(q, {})
        print(
            f"{q:<28} {old['queries'][q]:8.3f} {new['queries'][q]:8.3f} "
            f"{_ratio(old['queries'][q], new['queries'][q])} "
            f"{_ratio(_per_pass_task_ms(om), _per_pass_task_ms(nm))} "
            f"{_ratio(om.get('shuffle_bytes'), nm.get('shuffle_bytes'))}"
        )
    only_old = sorted(set(old["queries"]) - set(new["queries"]))
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_old:
        print("only in OLD:", ", ".join(only_old))
    if only_new:
        print("only in NEW:", ", ".join(only_new))
    wall_old = sum(old["queries"][q] for q in shared)
    wall_new = sum(new["queries"][q] for q in shared)
    if shared and wall_old:
        print(
            f"shared-query wall total: {wall_old:.3f}s -> {wall_new:.3f}s "
            f"({wall_new / wall_old:.2f}x)"
        )
    else:
        print("no overlapping queries with nonzero wall time to compare")


if __name__ == "__main__":
    main()
