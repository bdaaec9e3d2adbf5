"""O29 metrics/error accounting: every recorded query leaves one row in
the log table with its scan/shuffle/spill totals; failures are logged
with the error class (the reference's error-bitmask analog,
code/errorlog.c:51-183)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etsd_time_series_database_spark.plans.metrics import MetricsLog, collect_plan_metrics
from etsd_time_series_database_spark.sources.store import load_table
from tests.conftest import SF_SMOKE


def test_metrics_row_appears_with_scan_and_shuffle_totals(spark, tmp_path):
    log = MetricsLog(spark, path=str(tmp_path / "qlog"))
    df = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    row = log.record("agg_by_type", df)
    assert row.status == "ok"
    assert row.scan_rows > 0 and row.scan_files >= 1 and row.scan_bytes > 0
    assert row.shuffle_records > 0  # the groupBy exchange
    assert row.wall_ms > 0

    log.flush()
    stored = spark.read.parquet(str(tmp_path / "qlog"))
    logged = {r.query: r for r in stored.collect()}
    assert "agg_by_type" in logged and logged["agg_by_type"].status == "ok"
    assert logged["agg_by_type"].scan_rows == row.scan_rows


def test_failing_query_logged_with_error_class(spark):
    log = MetricsLog(spark)
    # fails at EXECUTION (analysis-time errors never reach record())
    bad = load_table(spark, SF_SMOKE, "events").select(
        F.raise_error(F.lit("boom: channel decode failed"))
    )
    with pytest.raises(Exception):
        log.record("broken", bad)
    rows = log.to_df().collect()
    assert len(rows) == 1
    assert rows[0].status == "error"
    assert "boom" in rows[0].error


def test_collect_plan_metrics_sees_through_aqe(spark):
    df = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .count()
    )
    df.collect()
    totals = collect_plan_metrics(df)
    # scan really measured (AQE wrappers traversed), shuffle observed
    assert totals["scan_rows"] >= 1000
    assert totals["shuffle_records"] > 0
    assert totals["output_rows"] >= 1


def test_progress_accumulator_exact_past_retention_cap(spark, tmp_path):
    """Round-11 verdict #4 / ADVICE: fold_streaming_progress reads
    only the RETAINED recentProgress list, so a catch-up of more
    micro-batches than spark.sql.streaming.numRecentProgressUpdates
    silently undercounts; the ProgressAccumulator listener folds every
    progress event as delivered and stays exact. Pinned by shrinking
    the retention to 4 and replaying 12 single-file micro-batches: the
    capped fold sees <=4 batches, the listener sees all 12 and the
    true row total."""
    from etsd_time_series_database_spark.plans.metrics import (
        ProgressAccumulator,
        fold_streaming_progress,
    )

    src = str(tmp_path / "acc_src")
    out = str(tmp_path / "acc_out")
    n_files, rows_per_file = 12, 3
    df = spark.range(n_files * rows_per_file).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    df.repartition(n_files).write.parquet(src)

    old = spark.conf.get("spark.sql.streaming.numRecentProgressUpdates")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "4")
    acc = ProgressAccumulator()
    spark.streams.addListener(acc.listener)
    try:
        q = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", out + "_ck")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        assert acc.wait_terminated(q, timeout_s=30.0)
        exact = acc.totals(q)
        capped = fold_streaming_progress(q)
    finally:
        spark.streams.removeListener(acc.listener)
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", old)

    assert exact["n_batches"] == n_files
    assert exact["input_rows"] == n_files * rows_per_file
    # the capped fold really was lossy here (the failure mode pinned)
    assert capped["n_batches"] <= 4
    assert capped["input_rows"] < exact["input_rows"]


def test_metrics_log_read_merges_pre_late_rows_files(spark, tmp_path):
    """ADVICE r11: an ops-log directory can mix files written before
    late_rows existed; MetricsLog.read pins the current schema so old
    rows surface NULL for the new columns instead of a footer-lottery
    read dropping them. Simulated by writing one file WITHOUT
    late_rows + one current append."""
    path = str(tmp_path / "mixed_log")
    # a pre-round-11 file: no late_rows column
    spark.createDataFrame(
        [("old_q", "ok", 1.5, 10, 10, 1, 100, 0, 0, 0, 0, None, 1)],
        "query string, status string, wall_ms double, output_rows bigint, "
        "scan_rows bigint, scan_files bigint, scan_bytes bigint, "
        "shuffle_bytes bigint, shuffle_records bigint, spill_bytes bigint, "
        "peak_memory bigint, error string, logged_at_us bigint",
    ).write.parquet(path)

    log = MetricsLog(spark, path=path)
    df = load_table(spark, SF_SMOKE, "events").groupBy("event_type").count()
    log.record("new_q", df)
    log.flush()

    got = {r.query: r for r in MetricsLog.read(spark, path).collect()}
    assert set(got) == {"old_q", "new_q"}
    assert got["old_q"].late_rows is None  # old file: NULL, not dropped
    assert got["old_q"].scan_rows == 10
    assert got["new_q"].status == "ok"
