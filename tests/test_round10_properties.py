"""Property-based checks for the round-10 batch operators: on RANDOM
row sets, each operator must equal a brute-force Python reference —
including the shapes hypothesis finds that hand cases miss (duplicate
timestamps, bucket-boundary rows, single-row buckets, negative and
near-boundary values)."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DAY_US = 86_400 * 1_000_000

# (offset_us within ~2 days, channel, value, unique ids assigned later)
row = st.tuples(
    st.integers(min_value=0, max_value=2 * 86_400),  # seconds offset
    st.sampled_from(["a", "b"]),
    st.floats(
        min_value=-1000, max_value=1000,
        allow_nan=False, allow_infinity=False, width=32,
    ),
)


def _df(spark, rows):
    data = [
        (s * 1_000_000 + (i % 3), ch, float(v), i)
        for i, (s, ch, v) in enumerate(rows)
    ]
    return (
        spark.createDataFrame(
            data,
            "us bigint, event_type string, value double, event_id bigint",
        ).selectExpr(
            "timestamp_micros(us) AS ts", "event_type", "value",
            "event_id",
        ),
        data,
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row, min_size=1, max_size=30))
def test_m4_downsample_matches_bruteforce(spark, rows):
    from etsd_time_series_database_spark.operators.trends import (
        m4_downsample,
    )

    df, data = _df(spark, rows)
    got = {
        (r.event_type, r.bucket_us): (
            r.n, r.first_us, r.first_v, r.min_v, r.max_v, r.last_us,
            r.last_v,
        )
        for r in m4_downsample(df, bucket_s=86_400).collect()
    }
    groups = defaultdict(list)
    for us, ch, v, i in data:
        groups[(ch, us // DAY_US * DAY_US)].append((us, i, v))
    want = {}
    for key, g in groups.items():
        by_order = sorted(g)  # (us, id, v): the packed-key order
        want[key] = (
            len(g),
            min(us for us, _, _ in g),
            by_order[0][2],
            min(v for _, _, v in g),
            max(v for _, _, v in g),
            max(us for us, _, _ in g),
            by_order[-1][2],
        )
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row, min_size=1, max_size=30))
def test_bucketed_twa_matches_bruteforce(spark, rows):
    from etsd_time_series_database_spark.operators.trends import (
        bucketed_time_weighted_avg,
    )

    df, data = _df(spark, rows)
    got = {
        (r.event_type, r.bucket_us): (r.n, r.observed_us, r.twa)
        for r in bucketed_time_weighted_avg(df, bucket_s=86_400).collect()
    }
    groups = defaultdict(list)
    for us, ch, v, i in data:
        groups[(ch, us // DAY_US * DAY_US)].append((us, i, v))
    for key, g in groups.items():
        bucket_end = key[1] + DAY_US
        ordered = sorted(g)  # (us, id, v)
        wsum, wtot = 0.0, 0
        for j, (us, _, v) in enumerate(ordered):
            nxt = ordered[j + 1][0] if j + 1 < len(ordered) else bucket_end
            wsum += v * (nxt - us)
            wtot += nxt - us
        n, observed, twa = got[key]
        assert n == len(g) and observed == wtot
        # the engine folds exact decimals; the float reference is only
        # good to ~1e-9 relative
        assert abs(twa - wsum / wtot) < 1e-6 + abs(twa) * 1e-9
    assert len(got) == len(groups)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(row, min_size=1, max_size=30),
    seed=st.integers(min_value=0, max_value=3),
)
def test_range_digest_permutation_invariant(spark, rows, seed):
    """Any repartitioning/ordering of the same rows digests
    identically, and dropping one row never goes unnoticed."""
    from etsd_time_series_database_spark.operators.range_stats import (
        range_digest,
    )

    df, data = _df(spark, rows)
    base = [tuple(r) for r in range_digest(df).collect()]
    reshuffled = df.repartition(3 + seed, "value")
    assert [tuple(r) for r in range_digest(reshuffled).collect()] == base
    if len(data) > 1:
        dropped = df.filter(f"event_id != {data[0][3]}")
        assert [
            tuple(r) for r in range_digest(dropped).collect()
        ] != base


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row, min_size=1, max_size=25))
def test_tiered_rollup_tiers_are_consistent(spark, rows):
    """Coarser tiers must be exact re-aggregations of finer ones:
    per (channel, coarse bucket), n sums and min/max fold from the
    member fine buckets."""
    from etsd_time_series_database_spark.operators.trends import (
        tiered_rollup,
    )

    df, _ = _df(spark, rows)
    out = tiered_rollup(df, tiers_s=(3600, 86400)).collect()
    fine = [r for r in out if r.tier_s == 3600]
    coarse = {
        (r.event_type, r.bucket_us): r for r in out if r.tier_s == 86400
    }
    agg = defaultdict(list)
    for r in fine:
        agg[(r.event_type, r.bucket_us // DAY_US * DAY_US)].append(r)
    assert set(agg) == set(coarse)
    for key, members in agg.items():
        c = coarse[key]
        assert c.n == sum(m.n for m in members)
        assert c.min_v == min(m.min_v for m in members)
        assert c.max_v == max(m.max_v for m in members)
