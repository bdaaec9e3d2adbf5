"""Round-trip tests for wide<->long reshaping."""

from __future__ import annotations

import importlib

from pyspark.sql import functions as F

rs = importlib.import_module("etsd_time_series_database_spark.operators.reshape")


def _long(spark):
    return spark.createDataFrame(
        [
            ("2026-01-01 00:00:01", "a", 1.0),
            ("2026-01-01 00:00:01", "b", 2.0),
            ("2026-01-01 00:00:02", "a", 3.0),
        ],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_to_wide(spark):
    w = rs.to_wide(_long(spark), ["a", "b"]).collect()
    assert [tuple(r)[1:] for r in w] == [(1.0, 2.0), (3.0, None)]


def test_roundtrip_long_wide_long(spark):
    df = _long(spark)
    wide = rs.to_wide(df, ["a", "b"])
    back = rs.to_long(wide, ["a", "b"])
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want


def test_to_long_no_shuffle(spark):
    wide = rs.to_wide(_long(spark), ["a", "b"])
    plan = rs.to_long(wide, ["a", "b"])._jdf.queryExecution().optimizedPlan().toString()
    # the wide->long direction is a pure projection over its input
    assert "Generate" in plan or "stack" in plan
