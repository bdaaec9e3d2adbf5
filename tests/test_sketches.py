"""Error-bound tests for the approximate sketches against their exact
counterparts on real testdata — the correctness contract where no
cross-engine oracle exists."""

from __future__ import annotations

import importlib

from pyspark.sql import functions as F

from etsd_time_series_database_spark.sources.store import load_table
from tests.conftest import SF_SMOKE

sk = importlib.import_module("etsd_time_series_database_spark.operators.sketches")
ops = importlib.import_module("etsd_time_series_database_spark.operators.range_stats")


def test_approx_distinct_within_rsd(spark):
    e = load_table(spark, SF_SMOKE, "events")
    approx = {
        r.event_type: r.approx_n_user_id
        for r in sk.approx_distinct(e, ["user_id"], rsd=0.02).collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        # 5 sigma of the 2% target rsd
        assert abs(approx[k] - exact[k]) <= max(5, 0.10 * exact[k])


def test_approx_percentiles_within_rank_error(spark):
    """GK's guarantee is on RANK, not value: the returned value must be
    an actual sample whose rank is within n/accuracy of the target
    (tail order statistics can be far apart in value)."""
    e = load_table(spark, SF_SMOKE, "events")
    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in sk.approx_percentiles(e, accuracy=10_000).collect()
    }
    series = {}
    for r in e.select("event_type", "value").dropna().collect():
        series.setdefault(r.event_type, []).append(r.value)
    for k, picks in approx.items():
        vals = sorted(series[k])
        n = len(vals)
        slack = max(2, n // 1000)  # n/accuracy + discretization
        for p, got in zip((0.5, 0.9, 0.99), picks):
            target = p * (n - 1)
            ranks = [i for i, v in enumerate(vals) if v == got]
            assert ranks, f"{k} p{p}: {got} not an actual sample"
            assert min(abs(i - target) for i in ranks) <= slack + 1, (
                k, p, got, target, ranks[:3]
            )
