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

The 10M-row window-skew comparison runs in a SEPARATE subprocess with
its own JVM: generating and checkpointing 10M rows in the same session
as the headline timings inflated every unchanged query ~20-30% in
round 2 (heap/code-cache pressure), which read as a phantom
regression. Isolation keeps the headline numbers clean.
"""

from __future__ import annotations

import json
import os
import subprocess
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
                "skew_compare": _skew_compare_isolated(),
            }
        )
    )


def _skew_compare_isolated() -> dict:
    """Run the skew comparison in a fresh subprocess/JVM so its 10M-row
    generation cannot pressure the headline-timing session."""
    if int(os.environ.get("SPARK_GRAFT_BENCH_SKEW_ROWS", "10000000")) <= 0:
        return {}
    proc = subprocess.run(
        [sys.executable, __file__, "--skew-only"],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if proc.returncode != 0:
        return {"error": proc.stderr[-500:]}
    return json.loads(proc.stdout.strip().splitlines()[-1])


def _skew_compare(spark) -> dict:
    """Measured (not prose) low-cardinality window-skew comparison:
    counter rate over N synthetic rows with only 3 channels — the
    global per-channel window form (parallelism hard-capped at 3 sort
    tasks) vs the stitched (channel, day-bucket) rate_scalable form.
    Warm-up pass each, then one timed pass to a noop sink (full JVM
    evaluation, no driver materialization).
    $SPARK_GRAFT_BENCH_SKEW_ROWS overrides N (0 skips)."""
    import pyspark.sql.functions as F

    from etsd_time_series_database_spark.operators.range_stats import rate
    from etsd_time_series_database_spark.operators.scalable_window import (
        rate_scalable,
    )

    n = int(os.environ.get("SPARK_GRAFT_BENCH_SKEW_ROWS", "10000000"))
    if n <= 0:
        return {}
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            # 1-second cadence → N seconds ≈ N/86400 daily buckets, so the
            # stitched form actually has buckets to parallelize over
            F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
            F.concat(F.lit("chan_"), (F.col("id") % 3).cast("string")).alias(
                "event_type"
            ),
            (F.col("id") % 100000).cast("double").alias("value"),
        )
        .localCheckpoint()  # freeze the input so both forms time only the op
    )

    forms = {
        "rate_global_s": lambda: rate(df, scalable=False),
        "rate_scalable_s": lambda: rate_scalable(df),
    }
    out = {"rows": n}
    for key, build in forms.items():
        build().write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        out[key] = round(time.perf_counter() - t0, 4)
    return out


if __name__ == "__main__":
    if "--skew-only" in sys.argv:
        spark = get_spark("etsd_spark_bench_skew")
        print(json.dumps(_skew_compare(spark)))
    else:
        main()
