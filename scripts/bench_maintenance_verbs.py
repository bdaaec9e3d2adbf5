"""Maintenance-verb scan-shape harness (round-12 verdict #4): the
measured evidence for the round-13 day-scoped-refresh fix.

A 20M-row events store spread over 40 dt= days, in the same
memory-bounded JVM regime as the other skew harnesses. Measures:

  * refresh scan shape — the q77 digest of ONE day computed two ways:
    the pre-round-13 form (``to_date(ts) == day``, a data-column
    predicate with zero PartitionFilters) vs the fixed form
    (``sources.store.day_scoped``: ``dt == day`` partition filter).
    Reported per form: wall, files/bytes actually scanned
    (plans.metrics.collect_plan_metrics). The fix's contract is
    O(day) scan work: files_after ~= files_before / n_days.
  * consolidation refresh — ``refresh_downsample(days=[d])``
    end-to-end (scan + aggregate + crash-safe rename swap), the verb
    ``amend --refresh-sink`` chains per amended day.
  * amend, cross_day="resolve" — 2k corrections (half in-place, half
    moving keys across days) against the 20M-row store: the
    key-column probe scan plus two partition rewrites.

Numbers are recorded in metrics_history/README.md, not the per-round
bench (the verbs build real layouts in a tempdir — gate work, not a
headline). Usage: python scripts/bench_maintenance_verbs.py [n_rows]
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

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "7g")

N_DAYS = 40


def main() -> None:
    import pyspark.sql.functions as F

    from etsd_time_series_database_spark import get_spark
    from etsd_time_series_database_spark.operators.range_stats import (
        range_digest,
    )
    from etsd_time_series_database_spark.plans.metrics import (
        collect_plan_metrics,
    )
    from etsd_time_series_database_spark.sources.store import (
        amend_events,
        day_scoped,
    )
    from etsd_time_series_database_spark.streaming.ingest import (
        refresh_downsample,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("maintenance-verbs")
    work = tempfile.mkdtemp(prefix="maint_bench_")
    out: dict = {"rows": n, "days": N_DAYS}
    try:
        store = os.path.join(work, "store")
        # n rows over N_DAYS days (id mod N_DAYS picks the day, id div
        # N_DAYS the second-of-day); 8 channels; key = row id
        (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_seconds(
                    F.lit(1704067200)
                    + (F.col("id") % N_DAYS) * 86_400
                    + (F.col("id") / N_DAYS).cast("long") % 86_400
                ).alias("ts"),
                F.concat(
                    F.lit("chan_"), (F.col("id") % 8).cast("string")
                ).alias("event_type"),
                (F.col("id") % 100_000).cast("double").alias("value"),
            )
            .withColumn("dt", F.to_date("ts"))
            .repartition("dt")
            .sortWithinPartitions("event_type", "ts")
            .write.partitionBy("dt")
            .parquet(store)
        )
        raw = spark.read.parquet(store)
        day = "2024-01-10"

        # --- refresh scan shape: before (to_date) vs after (dt) ---
        def digest_run(df):
            dg = range_digest(df, bucket_s=3600)
            t0 = time.perf_counter()
            # collect (bounded: channels x buckets rows) so the
            # metrics land on THIS Dataset's QueryExecution — a write
            # runs under a fresh execution whose metrics we can't walk
            dg.collect()
            wall = round(time.perf_counter() - t0, 2)
            m = collect_plan_metrics(dg)
            return {
                "wall_s": wall,
                "scan_files": m["scan_files"],
                "scan_mb": round(m["scan_bytes"] / 1e6, 1),
            }

        digest_run(raw)  # warm-up (full-store digest)
        out["refresh_scan_to_date_ts"] = digest_run(
            raw.filter(F.to_date("ts") == F.lit(day)).drop("dt")
        )
        out["refresh_scan_day_scoped"] = digest_run(day_scoped(raw, day))

        # --- consolidation refresh end-to-end (rename swap incl.) ---
        sink = os.path.join(work, "sink")
        refresh_downsample(spark, store, sink, width_s=3600, days=None)
        t0 = time.perf_counter()
        refresh_downsample(spark, store, sink, width_s=3600, days=[day])
        out["refresh_downsample_one_day_s"] = round(
            time.perf_counter() - t0, 2
        )

        # --- amend with cross-day resolve at 20M ---
        move_day = "2024-01-30"
        corr = (
            raw.filter(F.col("dt") == F.lit(day))
            .orderBy("event_id")
            .limit(2000)
            .drop("dt")
            .withColumn(
                "value", F.col("value") + F.lit(1.0)
            )
            .withColumn(
                "ts",
                # ids within one day are congruent mod N_DAYS, so use
                # id div N_DAYS for an alternating half-move
                F.when(
                    (F.col("event_id") / N_DAYS).cast("long") % 2 == 0,
                    F.to_timestamp(F.lit(move_day + " 12:00:00")),
                ).otherwise(F.col("ts")),
            )
            .localCheckpoint()
        )
        t0 = time.perf_counter()
        stats = amend_events(spark, store, corr, cross_day="resolve")
        out["amend_cross_day_resolve_s"] = round(
            time.perf_counter() - t0, 2
        )
        out["amend_moved"] = stats["moved"]
        out["amend_partitions"] = len(stats["partitions"])

        # --- multi-day refresh: does the per-day driver loop's job
        # submission dominate a wide --days list? (round-13 verdict
        # #1 'what's wrong') ---
        many_days = [f"2024-01-{d:02d}" for d in range(2, 12)]  # 10 days
        t0 = time.perf_counter()
        refresh_downsample(spark, store, sink, width_s=3600,
                           days=many_days)
        ten = round(time.perf_counter() - t0, 2)
        out["refresh_downsample_ten_days_s"] = ten
        out["refresh_downsample_per_day_marginal_s"] = round(ten / 10, 2)

        # --- RRA fetch vs raw aggregate (round-14 headline): the
        # same 12 h range answer from the materialized 1 h sink vs
        # scanning raw history — the query model that makes dashboard
        # zooms O(tier) at 100 TB ---
        from etsd_time_series_database_spark.operators.trends import (
            fetch_from_tier,
        )

        def timed_metrics(frame):
            t0 = time.perf_counter()
            frame.collect()
            wall = round(time.perf_counter() - t0, 2)
            m = collect_plan_metrics(frame)
            return {
                "wall_s": wall,
                "scan_files": m["scan_files"],
                "scan_mb": round(m["scan_bytes"] / 1e6, 1),
            }

        # fresh read: the earlier `raw` frame's file listing predates
        # the amend's partition rewrites
        raw2 = spark.read.parquet(store)
        w12 = 43_200 * 1_000_000
        raw_direct = (
            raw2.groupBy(
                "event_type",
                (F.expr(f"unix_micros(ts) div {w12}") * w12).alias(
                    "bucket_us"
                ),
            )
            .agg(
                F.count("value").cast("bigint").alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).alias("__s"),
                F.min("value").alias("min_v"),
                F.max("value").alias("max_v"),
            )
            .select(
                "event_type", "bucket_us", "n",
                F.round(
                    F.col("__s").cast("double") / F.col("n"), 6
                ).alias("avg_v"),
                "min_v", "max_v",
            )
        )
        out["fetch_raw_direct_12h"] = timed_metrics(raw_direct)
        fetched = fetch_from_tier(spark, sink, 43_200)
        out["fetch_from_tier_12h"] = timed_metrics(fetched)

        # --- ivf_compact over a deliberately fragmented index:
        # 128 cells x 8 small files each (8 appends), dim 16 ---
        from etsd_time_series_database_spark.operators.similarity import (
            ivf_compact,
            write_ivf_partitioned,
        )

        n_cells, n_appends, n_vec = 128, 8, 131_072
        dim = 16
        # uniform pseudo-random components so appends spread over ALL
        # cells (the verdict's >=100-fragmented-cells shape); xxhash64
        # keeps it deterministic
        vecs = spark.range(n_vec).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (
                    (F.xxhash64(F.col("id"), i) % 1000).cast("double")
                    / 500.0
                ).cast("float"),
            ).alias("embedding"),
        )
        idx = os.path.join(work, "ivf")
        write_ivf_partitioned(
            vecs.filter(F.col("vec_id") % (n_appends + 1) == 0),
            # seeds must live in the base subset (multiples of 9)
            centroid_ids=[(n_appends + 1) * k for k in range(n_cells)],
            path=idx,
        )
        from etsd_time_series_database_spark.operators.similarity import (
            ivf_append,
        )

        for a in range(1, n_appends + 1):
            ivf_append(
                vecs.filter(F.col("vec_id") % (n_appends + 1) == a), idx
            )
        t0 = time.perf_counter()
        cstats = ivf_compact(spark, idx, files_per_cell=1)
        wall = round(time.perf_counter() - t0, 2)
        out["ivf_compact"] = {
            "wall_s": wall,
            "cells_compacted": cstats["cells_compacted"],
            "files_before": cstats["files_before"],
            "files_after": cstats["files_after"],
            "per_cell_s": round(wall / max(cstats["cells_compacted"], 1), 3),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print("MAINTJSON:" + json.dumps(out))


if __name__ == "__main__":
    main()
