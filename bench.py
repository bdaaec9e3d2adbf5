#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query runs once as warm-up (JVM/JIT/code-cache, not counted),
then N timed passes (default 3, $SPARK_GRAFT_BENCH_RUNS) of which the
MINIMUM is reported — the steady-state cost, insulated from one-off
scheduler/GC noise. The timed action is a full collect() of the query
result — scan + compute + result materialization.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from etsd_time_series_database_spark import get_spark  # noqa: E402
from etsd_time_series_database_spark.plans import catalog  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark = get_spark("etsd_spark_bench")

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    names = sorted(n for n, q in catalog().items() if q.headline)
    timings: dict[str, float] = {}
    for name in names:
        q = catalog()[name]
        q.build(spark, sf_dir).collect()  # warm-up (not counted)
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            q.build(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
