"""Property-based check of the distributed interval union (q57/q66's
shared machinery): on RANDOM episode sets, the bucket-split +
boundary-stitch form must equal the one-level global union at any
bucket width — including adversarial shapes hypothesis finds that
hand-written cases miss (nested intervals, exact-touch chains, point
episodes on boundaries, duplicate intervals across channels)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

episode = st.tuples(
    st.integers(min_value=0, max_value=500),   # start (scaled to us)
    st.integers(min_value=0, max_value=120),   # span
    st.sampled_from(["a", "b", "c"]),
)


def _run_union(spark, eps_rows, bucket_s, scalable):
    from etsd_time_series_database_spark.operators.range_stats import (
        _interval_union_stitched,
    )
    from pyspark.sql import Window

    eps = spark.createDataFrame(
        [(ch, i, s * 1_000_000, (s + d) * 1_000_000)
         for i, (s, d, ch) in enumerate(eps_rows)],
        "event_type string, __island bigint, start_us bigint, end_us bigint",
    )
    if scalable:
        merged = _interval_union_stitched(eps, "event_type", bucket_s)
    else:
        order = [F.col("start_us"), F.col("end_us"), F.col("event_type")]
        w_prev = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, -1
        )
        w_run = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0
        )
        opened = F.when(
            F.max("end_us").over(w_prev).isNull()
            | (F.col("start_us") > F.max("end_us").over(w_prev)),
            F.lit(1),
        ).otherwise(F.lit(0))
        merged = (
            eps.withColumn("__iv", F.sum(opened).over(w_run))
            .groupBy("__iv")
            .agg(
                F.min("start_us").alias("i_start"),
                F.max("end_us").alias("i_end"),
                F.count(F.lit(1)).alias("i_eps"),
            )
            .select("i_start", "i_end", "i_eps")
        )
    return sorted(
        (r.i_start, r.i_end, r.i_eps) for r in merged.collect()
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    eps=st.lists(episode, min_size=1, max_size=25),
    bucket_s=st.sampled_from([7, 60, 97, 250]),
)
def test_stitched_union_equals_global_union(spark, eps, bucket_s):
    got = _run_union(spark, eps, bucket_s, scalable=True)
    want = _run_union(spark, eps, bucket_s, scalable=False)
    assert got == want
