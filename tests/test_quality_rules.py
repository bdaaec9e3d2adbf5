"""Unit tests for the Gopher-rule battery (x43) and MAD anomaly
accounting (x44); the cross-engine hash equivalence is covered by
test_catalog_oracle."""

from __future__ import annotations

from etsd_time_series_database_spark.operators.textstats import gopher_rules
from etsd_time_series_database_spark.operators.trends import mad_anomaly

GOOD = (
    "the quick brown fox jumps over a lazy dog and then runs back to "
    "the barn where it sleeps in soft straw until morning light comes"
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_gopher_rules_flags(spark):
    texts = [
        GOOD,  # passes everything
        "",  # empty: fails len/word_len/alpha/stop, vacuously passes symbol
        "short doc only",  # fails rule_len (3 tokens)
        GOOD + " ####### !!!!!!! @@@@@@@ $$$$$$$ %%%%%%% ^^^^^^^ &&&&&&&",
        "the " + "42 17 99 3 8 " * 5 + "a of and to in is",  # numeric soup
    ]
    rows = {r["doc_id"]: r for r in gopher_rules(_docs(spark, texts)).collect()}

    assert rows[0]["keep"] is True
    assert rows[0]["n_failed"] == 0

    assert rows[1]["n_tokens"] == 0
    assert rows[1]["rule_len"] is False
    assert rows[1]["rule_word_len"] is False
    assert rows[1]["rule_alpha"] is False
    assert rows[1]["rule_symbol"] is True  # vacuous on empty text
    assert rows[1]["rule_stop"] is False
    assert rows[1]["keep"] is False  # never NULL

    assert rows[2]["rule_len"] is False
    assert rows[2]["keep"] is False

    assert rows[3]["rule_symbol"] is False
    assert rows[3]["keep"] is False

    assert rows[4]["rule_alpha"] is False  # 25/31 numeric tokens
    assert rows[4]["keep"] is False
    # no row may carry a NULL verdict
    assert all(r["keep"] in (True, False) for r in rows.values())


def test_gopher_rules_zero_shuffle_plan(spark):
    # the only exchange is the presentation ORDER BY (range
    # partitioning); the battery itself is map-only — no hash shuffle
    plan = (
        gopher_rules(_docs(spark, [GOOD]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan  # zero Python in the plan


def test_mad_anomaly_flags_outlier_zscore_would_soften(spark):
    # 1..9 plus one wild outlier: median 5.5, MAD 2.5,
    # threshold 3.5*1.4826*2.5 = 12.97 -> only the outlier flags.
    vals = [float(v) for v in range(1, 10)] + [100.0]
    df = spark.createDataFrame(
        [(i, "ch", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    [r] = mad_anomaly(df).collect()
    assert r["n"] == 10
    assert r["median"] == 5.5
    assert r["mad"] == 2.5
    assert r["n_anomalies"] == 1
    assert r["anomaly_frac"] == 0.1
    assert r["max_abs_dev"] == 94.5


def test_mad_anomaly_constant_channel_has_no_anomalies(spark):
    df = spark.createDataFrame(
        [(i, "flat", 7.0) for i in range(6)] + [(9, "other", 1.0)],
        "event_id long, event_type string, value double",
    )
    rows = {r["event_type"]: r for r in mad_anomaly(df).collect()}
    assert rows["flat"]["mad"] == 0.0
    assert rows["flat"]["n_anomalies"] == 0  # strict >: 0 > 0 is False
    # single-sample channel: median = the sample, no anomalies
    assert rows["other"]["n"] == 1
    assert rows["other"]["n_anomalies"] == 0


def test_mad_anomaly_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(0, "ch", 1.0), (1, "ch", None), (2, "ch", 3.0)],
        "event_id long, event_type string, value double",
    )
    [r] = mad_anomaly(df).collect()
    assert r["n"] == 2
    assert r["median"] == 2.0


def test_epoch_shuffle_is_a_seeded_permutation(spark):
    from etsd_time_series_database_spark.operators.sampling import (
        epoch_shuffle,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    s1 = epoch_shuffle(df, seed=1, n_buckets=8).collect()
    # a permutation of 0..n-1
    assert sorted(r["epoch_pos"] for r in s1) == list(range(200))
    # stable under repartitioning (no partition-order dependence)
    s1b = epoch_shuffle(df.repartition(13), seed=1, n_buckets=8).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s1b))
    # bucket count must not change the order (alignment invariant)
    s1c = epoch_shuffle(df, seed=1, n_buckets=64).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s1c))
    # a different seed gives a different order
    s2 = epoch_shuffle(df, seed=2, n_buckets=8).collect()
    assert sorted(map(tuple, s1)) != sorted(map(tuple, s2))
    # xxhash64 scale path: still a permutation, still repartition-stable
    x1 = epoch_shuffle(df, seed=1, n_buckets=8, hash_mode="xxhash64")
    x2 = epoch_shuffle(
        df.repartition(5), seed=1, n_buckets=8, hash_mode="xxhash64"
    )
    assert sorted(r["epoch_pos"] for r in x1.collect()) == list(range(200))
    assert sorted(map(tuple, x1.collect())) == sorted(map(tuple, x2.collect()))


def test_surprisal_score_rarity_semantics(spark):
    from etsd_time_series_database_spark.operators.textstats import (
        surprisal_score,
    )

    # corpus: 'the' x4, 'rare' x1, 'word' x3 -> total 8
    texts = ["the the word", "the word rare", "the word", ""]
    rows = {
        r["doc_id"]: r
        for r in surprisal_score(
            spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            )
        ).collect()
    }
    # integer rarity: the=8 div 4=2, word=8 div 3=2, rare=8 div 1=8
    assert rows[1]["max_rarity"] == 8
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["mean_rarity"] == 4.0
    assert rows[0]["max_rarity"] == 2
    assert rows[0]["mean_rarity"] == 2.0
    assert rows[3]["n_tokens"] == 0
    assert rows[3]["mean_rarity"] is None


def test_contamination_score_fraction(spark):
    from etsd_time_series_database_spark.operators.dedup import (
        contamination_score,
    )

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    test = mk([(100, "a b c d e f")])  # shingles: 'a b c', 'b c d', ...
    train = mk(
        [
            (0, "a b c d x"),  # 3 shingles, 2 shared (a b c, b c d)
            (1, "q r s t u"),  # 3 shingles, 0 shared
            (2, "a b"),  # too short: 0 shingles
        ]
    )
    rows = {
        r["doc_id"]: r for r in contamination_score(train, test, n=3).collect()
    }
    assert rows[0]["n_shingles"] == 3 and rows[0]["n_shared"] == 2
    assert abs(rows[0]["contamination"] - 2 / 3) < 1e-12
    assert rows[1]["n_shared"] == 0 and rows[1]["contamination"] == 0.0
    assert rows[2]["n_shingles"] == 0 and rows[2]["contamination"] is None


def test_neardup_safe_split_components_never_straddle(spark):
    from etsd_time_series_database_spark.operators.sampling import (
        neardup_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    rows = {
        r["doc_id"]: r
        for r in neardup_safe_split(
            docs, pairs, permille=(500, 250, 250)
        ).collect()
    }
    assert len(rows) == 10
    # chain 1-2-3 collapses to component 1; pair 7-8 to component 7
    assert rows[1]["component"] == rows[2]["component"] == rows[3]["component"] == 1
    assert rows[7]["component"] == rows[8]["component"] == 7
    assert rows[1]["split"] == rows[2]["split"] == rows[3]["split"]
    assert rows[7]["split"] == rows[8]["split"]
    # singletons are their own component
    assert rows[0]["component"] == 0 and rows[9]["component"] == 9


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    st.integers(min_value=0, max_value=2**30),
)
def test_epoch_shuffle_property(spark, keys, seed):
    """Extreme keys (negative, near-2^62) and arbitrary seeds: the
    LCG stays overflow-free, the ordinal is always a 0-based
    permutation, and bucket count never changes the order."""
    from etsd_time_series_database_spark.operators.sampling import (
        epoch_shuffle,
    )

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    a = epoch_shuffle(df, seed=seed, n_buckets=4).collect()
    assert sorted(r["epoch_pos"] for r in a) == list(range(len(keys)))
    b = epoch_shuffle(df, seed=seed, n_buckets=32).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
