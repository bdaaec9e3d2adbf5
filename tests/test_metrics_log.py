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
