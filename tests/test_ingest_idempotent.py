"""Regression (exactly-once ingest): foreachBatch is at-least-once — a
failed/restarted micro-batch re-runs with the SAME epoch id. The sink
write must therefore be idempotent per epoch: re-writing an epoch
replaces its previous (possibly partial) output instead of appending
duplicates, while distinct epochs accumulate."""

from __future__ import annotations

from pyspark.sql import functions as F

from etsd_time_series_database_spark.streaming import ingest


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "ts string, source string, channel string, value double, status int"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_epoch_rerun_does_not_duplicate(spark, tmp_path):
    raw = str(tmp_path / "raw")
    ds = str(tmp_path / "ds")
    b0 = _batch(
        spark,
        [
            ("2026-01-01 00:00:05", "s", "a", 1.0, 0),
            ("2026-01-02 00:00:05", "s", "b", 2.0, 0),
        ],
    )
    ingest.write_ingest_epoch(b0, 0, raw, downsample_to=ds)
    # the retry: same epoch re-runs (possibly after a partial write)
    ingest.write_ingest_epoch(b0, 0, raw, downsample_to=ds)
    assert ingest.read_ingest_table(spark, raw).count() == 2
    assert ingest.read_ingest_table(spark, ds).count() == 2

    # a NEW epoch accumulates normally
    b1 = _batch(spark, [("2026-01-01 00:00:06", "s", "a", 3.0, 0)])
    ingest.write_ingest_epoch(b1, 1, raw, downsample_to=ds)
    assert ingest.read_ingest_table(spark, raw).count() == 3
    vals = sorted(
        r.value for r in ingest.read_ingest_table(spark, raw).collect()
    )
    assert vals == [1.0, 2.0, 3.0]


def test_epoch_rerun_replaces_partial_output(spark, tmp_path):
    """A retry with MORE rows than the failed attempt (the partial-write
    case) must end up with exactly the retry's rows."""
    raw = str(tmp_path / "raw")
    partial = _batch(spark, [("2026-01-01 00:00:05", "s", "a", 1.0, 0)])
    full = _batch(
        spark,
        [
            ("2026-01-01 00:00:05", "s", "a", 1.0, 0),
            ("2026-01-01 00:00:06", "s", "a", 9.0, 0),
        ],
    )
    ingest.write_ingest_epoch(partial, 7, raw)
    ingest.write_ingest_epoch(full, 7, raw)
    vals = sorted(r.value for r in ingest.read_ingest_table(spark, raw).collect())
    assert vals == [1.0, 9.0]


def test_date_pruning_survives_epoch_partitioning(spark, tmp_path):
    raw = str(tmp_path / "raw")
    b = _batch(
        spark,
        [
            ("2026-01-01 00:00:05", "s", "a", 1.0, 0),
            ("2026-01-02 00:00:05", "s", "b", 2.0, 0),
        ],
    )
    ingest.write_ingest_epoch(b, 0, raw)
    read = spark.read.parquet(raw).filter(F.col("dt") == "2026-01-02")
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan
    assert read.count() == 1
