"""q62 plain-vs-stitched-vs-auto crossover harness (round-11 verdict
#5): the evidence behind operators.range_stats.AUTO_EPISODE_PLAIN_MAX.

Two regimes at 20M rows in a memory-bounded JVM (7g, the same
per-task-sort-share argument as bench.py's skew child):

  * chatter — 3 channels, ~20% decisive rows (~1.33M per channel):
    the documented counterexample where the PLAIN channel-global
    window beats the stitched form (the per-channel sort fits a task).
  * dense — ONE channel, EVERY row decisive (20M-row single sort
    task): the cliff the stitched form exists for.

For each regime, times plain (scalable=False), stitched
(scalable=True) and auto (the round-12 default: density rollup picks
the form). Done-criterion: auto ~= best-of-both in BOTH regimes.
Numbers are recorded in metrics_history/README.md, not the per-round
bench. Usage: python scripts/bench_episode_crossover.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "7g")


def main() -> None:
    import pyspark.sql.functions as F

    from etsd_time_series_database_spark import get_spark
    from etsd_time_series_database_spark.operators.range_stats import (
        hysteresis_episodes,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("episode-crossover")

    def synth(rows: int, keys: int, dense: bool):
        base = spark.range(rows).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + F.col("id")
            ).alias("ts"),
            F.concat(
                F.lit("chan_"), (F.col("id") % keys).cast("string")
            ).alias("event_type"),
        )
        if dense:  # alternating 0/100: every row decisive at 90/10
            v = (F.col("event_id") % 2 * 100).cast("double")
        else:  # id % 100000 ramp: ~20% decisive at 90000/10000
            v = (F.col("event_id") % 100000).cast("double")
        return base.withColumn("value", v).localCheckpoint()

    regimes = {
        "chatter_3key": (synth(n, 3, False), 90000.0, 10000.0),
        "dense_1key": (synth(n, 1, True), 90.0, 10.0),
    }
    out: dict = {"rows": n}
    for rname, (df, hi, lo) in regimes.items():
        out[rname] = {}
        for mode, kw in (
            ("plain", {"scalable": False}),
            ("stitched", {"scalable": True}),
            ("auto", {"scalable": "auto"}),
        ):
            def run():
                hysteresis_episodes(df, hi=hi, lo=lo, **kw).write.format(
                    "noop"
                ).mode("overwrite").save()

            run()  # warm-up
            t0 = time.perf_counter()
            run()
            out[rname][mode] = round(time.perf_counter() - t0, 2)
        picked = out[rname]["auto"]
        best = min(out[rname]["plain"], out[rname]["stitched"])
        out[rname]["auto_vs_best"] = round(picked / best, 2) if best else None
    print("EPISODEJSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
