"""Regression: the as-of join must carry the matched right row as ONE
struct. If the newest right row at-or-before a probe has a NULL value
column, the output must show THAT row's (ts, NULL) — never that row's
ts paired with an older row's non-NULL value (the column-wise
last(ignorenulls) bug), and never a value leaked across a bucket
boundary in the scalable form."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etsd_time_series_database_spark.operators.asof import (
    asof_join,
    asof_join_scalable,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _fixture(spark):
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 00:00:01"), 10.0),
            # newest right row before the probe: NULL value
            ("k", _ts("2024-01-02 00:00:02"), None),
        ],
        "k string, ts timestamp, v double",
    )
    left = spark.createDataFrame(
        [("k", _ts("2024-01-02 00:00:03"), 1)],
        "k string, ts timestamp, probe_id int",
    )
    return left, right


def test_asof_null_value_not_mixed_with_newer_ts(spark):
    left, right = _fixture(spark)
    row = asof_join(left, right, on="k", value_cols=["v"]).collect()[0]
    assert row.ts_asof == _ts("2024-01-02 00:00:02")
    assert row.v_asof is None  # the matched row's own NULL, not 10.0


def test_asof_scalable_null_value_not_pulled_from_prev_bucket(spark):
    left, right = _fixture(spark)
    # day buckets: right rows land in different buckets; the probe's
    # bucket has the NULL-valued row in-bucket, the non-NULL one is the
    # previous bucket's seed — coalesce must not resurrect it.
    row = asof_join_scalable(
        left, right, on="k", value_cols=["v"], bucket_s=86400
    ).collect()[0]
    assert row.ts_asof == _ts("2024-01-02 00:00:02")
    assert row.v_asof is None


def test_asof_no_match_is_all_null(spark):
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:00"), 1)],
        "k string, ts timestamp, probe_id int",
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-06-01 00:00:00"), 5.0)],
        "k string, ts timestamp, v double",
    )
    for fn in (asof_join, asof_join_scalable):
        row = fn(left, right, on="k", value_cols=["v"]).collect()[0]
        assert row.ts_asof is None and row.v_asof is None


def test_asof_matched_row_is_consistent_snapshot(spark):
    """Two value columns with NULLs in different rows: output columns
    must all come from the single matched row."""
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01 00:00:01"), 1.0, None),
            ("k", _ts("2024-01-01 00:00:02"), None, 2.0),
        ],
        "k string, ts timestamp, a double, b double",
    )
    left = spark.createDataFrame(
        [("k", _ts("2024-01-01 00:00:03"), 1)],
        "k string, ts timestamp, probe_id int",
    )
    for fn in (asof_join, asof_join_scalable):
        row = fn(left, right, on="k", value_cols=["a", "b"]).collect()[0]
        assert row.ts_asof == _ts("2024-01-01 00:00:02")
        assert row.a_asof is None and row.b_asof == 2.0


def test_asof_scalable_span_guard_trips_on_outlier_timestamp(spark):
    """One corrupt epoch-1970 row must not inflate the dense bucket
    grid to millions of sequence elements: the span guard raises a
    clear error naming the key instead of Spark's opaque
    sequence-length failure."""
    import pytest

    left, right = _fixture(spark)
    poisoned = right.unionByName(
        spark.createDataFrame(
            [("k", _ts("1970-01-01 00:00:00"), 0.0)],
            "k string, ts timestamp, v double",
        )
    )
    out = asof_join_scalable(
        left, poisoned, on="k", value_cols=["v"],
        bucket_s=60, max_span_buckets=10_000,
    )
    with pytest.raises(Exception, match="outlier timestamp|increase bucket_s"):
        out.collect()
    # same data passes when the guard budget accommodates the span
    ok = asof_join_scalable(
        left, poisoned, on="k", value_cols=["v"],
        bucket_s=86400 * 365, max_span_buckets=10_000,
    )
    assert ok.count() == 1


def test_tolerance_nulls_stale_matches_whole_row(spark):
    """tolerance_s (q78): a match older than the bound comes back as
    whole-row NULLs — never a column mixture — and the plain/scalable
    twins agree exactly, including at the boundary (exactly-tolerance
    matches are kept, one microsecond past is dropped)."""
    import pyspark.sql.functions as F

    from etsd_time_series_database_spark.operators.asof import (
        asof_join,
        asof_join_scalable,
    )

    left = spark.createDataFrame(
        [(1, "k", "2026-01-01 01:00:00.000000"),
         (2, "k", "2026-01-01 02:00:00.000000"),
         (3, "k", "2026-01-01 02:00:00.000001")],
        "event_id long, k string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("k", "2026-01-01 01:00:00", 10.0)],
        "k string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))

    def run(fn):
        return {
            r.event_id: (r.ts_asof, r.value_asof)
            for r in fn(
                left, right, on="k", value_cols=["value"],
                tolerance_s=3600,
            ).collect()
        }

    plain = run(asof_join)
    scal = run(asof_join_scalable)
    assert plain == scal
    # probe 1: exact-time match kept; probe 2: exactly 3600 s old,
    # kept (inclusive bound); probe 3: 3600.000001 s old, whole row
    # NULLed
    assert plain[1][1] == 10.0 and plain[2][1] == 10.0
    assert plain[3] == (None, None)
