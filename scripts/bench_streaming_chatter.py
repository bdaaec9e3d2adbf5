"""Stateful-streaming chatter pair: measure the live monitor topology
end-to-end under the SAME chatter pathology the batch skew harness
uses for q57/q65 — alternating above/below values, so EVERY sample is
a hysteresis transition (worst-case output volume for the alert
stream) and every transition rides the single-group site union fold.

Topology (the two-query monitor chain the CLI `watch` drives, the
reference's edd daemon shape, code/edd.c:292-386):

    parquet chatter replay
      -> hysteresis_alarm_stream (availableNow, keyed by channel)
      -> parquet transitions dir
      -> site_alarm_stream      (availableNow, single group)
      -> noop sink

Reports rows/s for each stage plus the state-store rows/bytes from the
final StreamingQueryProgress — the "state size" number: hysteresis
state is 2 scalars per (source, channel), site state is 3 scalars
total, so the store should stay KB-sized no matter how many rows
replay through it.

Usage: python scripts/bench_streaming_chatter.py [rows] [channels]
Env:   SPARK_GRAFT_BENCH_STREAM_ROWS overrides rows (default 20M).

Results are recorded in metrics_history/README.md; this script exists
so the number is reproducible, it is not part of the per-round bench.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    rows = int(
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SPARK_GRAFT_BENCH_STREAM_ROWS", "20000000")
    )
    channels = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from etsd_time_series_database_spark import get_spark
    from etsd_time_series_database_spark.streaming.stateful import (
        hysteresis_alarm_stream,
        site_alarm_stream,
    )

    spark = get_spark("etsd_spark_bench_stream_chatter")
    work = tempfile.mkdtemp(prefix="etsd_stream_chatter_")
    src = os.path.join(work, "src")
    trans = os.path.join(work, "transitions")
    out: dict = {"rows": rows, "channels": channels}
    try:
        # 1 s cadence, round-robin channels, alternating 100/0 per
        # channel sample (ids stride by `channels`, so id DIV channels
        # alternates parity per channel) -> every sample crosses the
        # hi=50/lo=50 pair: N transitions total, the chatter worst case
        (
            spark.range(rows)
            .select(
                F.timestamp_seconds(
                    F.lit(1704067200) + F.col("id")
                ).alias("ts"),
                F.lit("site").alias("source"),
                F.concat(
                    F.lit("chan_"), (F.col("id") % channels).cast("string")
                ).alias("channel"),
                (
                    (F.col("id") / channels).cast("long") % 2 * 100
                ).cast("double").alias("value"),
                F.col("id").alias("seq"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(src)
        )
        schema = spark.read.parquet(src).schema

        def run(stage: str, stream_df, sink_fmt: str, path=None):
            q = stream_df.writeStream.format(sink_fmt)
            if path:
                q = q.option("path", path)
            q = q.option(
                "checkpointLocation", os.path.join(work, f"ckpt_{stage}")
            ).trigger(availableNow=True)
            t0 = time.perf_counter()
            query = q.start()
            query.awaitTermination()
            wall = time.perf_counter() - t0
            state = {}
            lp = query.lastProgress
            if lp and lp.get("stateOperators"):
                so = lp["stateOperators"][0]
                state = {
                    "state_rows": so.get("numRowsTotal"),
                    "state_bytes": so.get("memoryUsedBytes"),
                }
            return wall, state

        alarms = hysteresis_alarm_stream(
            spark.readStream.schema(schema).parquet(src), hi=50.0, lo=50.0
        )
        wall1, st1 = run("hyst", alarms, "parquet", trans)
        n_trans = spark.read.parquet(trans).count()
        out["hysteresis"] = {
            "wall_s": round(wall1, 2),
            "rows_per_s": round(rows / wall1),
            "transitions": n_trans,
            **st1,
        }

        site = site_alarm_stream(
            spark.readStream.schema(
                spark.read.parquet(trans).schema
            ).parquet(trans)
        )
        wall2, st2 = run("site", site, "noop")
        out["site_union"] = {
            "wall_s": round(wall2, 2),
            "rows_per_s": round(n_trans / wall2),
            **st2,
        }
        out["end_to_end_rows_per_s"] = round(rows / (wall1 + wall2))
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
