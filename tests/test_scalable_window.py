"""Equivalence tests: the skew-proof (channel, bucket) window operators
must produce bit-identical results to the plain per-channel windows on
the real testdata — same numbers, ~n_buckets x more parallelism."""

from __future__ import annotations

import importlib

from pyspark.sql import functions as F

from etsd_time_series_database_spark.sources.store import load_table
from tests.conftest import SF_SMOKE

ops = importlib.import_module("etsd_time_series_database_spark.operators.range_stats")
sw = importlib.import_module(
    "etsd_time_series_database_spark.operators.scalable_window"
)


def _events(spark):
    return load_table(spark, SF_SMOKE, "events")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_rate_scalable_equals_global_window(spark):
    e = _events(spark)
    assert _rows(sw.rate_scalable(e, bucket_s=86400)) == _rows(ops.rate(e))


def test_rate_scalable_small_buckets_still_exact(spark):
    # 1-hour buckets: many more boundaries to stitch, same result.
    e = _events(spark)
    assert _rows(sw.rate_scalable(e, bucket_s=3600)) == _rows(ops.rate(e))


def test_rollover_scalable_equals_global_window(spark):
    e = _events(spark)
    assert _rows(sw.rollover_corrected_scalable(e, bucket_s=86400)) == _rows(
        ops.rollover_corrected(e)
    )


def test_cumsum_scalable_equals_window_sum(spark):
    e = _events(spark)
    got = sw.cumsum_scalable(e, F.col("value"), "cum").select("event_id", "cum")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = e.select("event_id", F.sum("value").over(w).alias("cum"))
    g = dict(map(tuple, got.collect()))
    x = dict(map(tuple, want.collect()))
    # float addition order differs between the two plans; values agree
    # to within accumulation round-off
    assert g.keys() == x.keys()
    assert all(abs(g[k] - x[k]) < 1e-6 for k in x)


def test_parallelism_actually_increases(spark):
    """The in-bucket window must partition by (channel, bucket), not by
    channel alone: check the physical plan's first window exchange keys."""
    e = _events(spark)
    plan = (
        sw.rate_scalable(e, bucket_s=3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__bkt" in plan  # bucket key participates in the hash partitioning
