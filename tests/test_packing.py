"""Unit semantics for training-batch assembly operators
(operators/packing.py) and the exploded k-means catalog view
(operators/similarity.kmeans_cells), on hand-built inputs where the
expected values are computable by eye."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etsd_time_series_database_spark.operators.packing import (
    domain_mix,
    pack_sequences,
)
from etsd_time_series_database_spark.operators.similarity import kmeans_cells


@pytest.fixture(scope="module")
def docs(spark):
    # doc_id, text (token counts 3, 2, 4, 1), source
    rows = [
        (0, "a b c", "s0"),
        (1, "d e", "s0"),
        (2, "f g h i", "s1"),
        (3, "j", "s1"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_pack_sequences_concat_then_split(spark, docs):
    # one shard, ctx=4: cumulative-exclusive token counts are
    # 0, 3, 5, 9 -> packs 0, 0, 1, 2 — doc 1 straddles the boundary
    # but belongs to the pack where its first token lands
    out = pack_sequences(docs, ctx_tokens=4, n_shards=1).collect()
    got = [(r.pack_idx, r.n_docs, r.pack_tokens, r.first_doc, r.last_doc) for r in out]
    assert got == [(0, 2, 5, 0, 1), (1, 1, 4, 2, 2), (2, 1, 1, 3, 3)]


def test_pack_sequences_sharding_is_doc_id_pmod(spark, docs):
    out = pack_sequences(docs, ctx_tokens=100, n_shards=2).collect()
    # evens (0,2) -> shard 0 (3+4 tokens); odds (1,3) -> shard 1 (2+1)
    got = {(r.shard, r.pack_idx): (r.n_docs, r.pack_tokens) for r in out}
    assert got == {(0, 0): (2, 7), (1, 0): (2, 3)}


def test_pack_sequences_pack_budget_holds_for_short_docs(spark):
    # 96 docs of 10 tokens each over 4 shards = 24 docs/shard, ctx=40:
    # every pack gets exactly 4 docs / 40 tokens — the budget is exact
    # when docs don't straddle and the shard divides evenly
    df = spark.range(96).select(
        F.col("id").alias("doc_id"),
        F.lit(" ".join("t" * 1 for _ in range(10))).alias("text"),
    )
    out = pack_sequences(df, ctx_tokens=40, n_shards=4).collect()
    assert all(r.pack_tokens == 40 and r.n_docs == 4 for r in out)
    assert len(out) == 24


def test_domain_mix_weights_equalize(spark, docs):
    out = {r.source: r for r in domain_mix(docs).collect()}
    # s0: 5 tokens, s1: 5 tokens, total 10, nsrc 2 -> shares .5/.5,
    # weights (10/2)/5 = 1.0
    assert out["s0"].src_tokens == 5 and out["s1"].src_tokens == 5
    assert out["s0"].token_share == pytest.approx(0.5)
    assert out["s0"].weight == pytest.approx(1.0)
    # weight * share is constant across sources (the equalization law)
    ws = {s: r.weight * r.token_share for s, r in out.items()}
    assert len(set(round(v, 12) for v in ws.values())) == 1


def test_domain_mix_skewed_weights(spark):
    rows = [(0, "a b c d e f g h", "big"), (1, "a b", "small")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.source: r for r in domain_mix(df).collect()}
    assert out["big"].weight < 1.0 < out["small"].weight
    assert out["big"].token_share == pytest.approx(0.8)


def test_kmeans_cells_separable_clusters(spark):
    # two tight groups around orthogonal axes; seeds one per group
    rows = [(i, [1.0, 0.01 * i]) for i in range(5)] + [
        (10 + i, [0.01 * i, 1.0]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = kmeans_cells(df, centroid_ids=[0, 10], n_iter=2).collect()
    # 2 centroids x 2 dims, each cluster holds its 5 members
    assert len(out) == 4
    sizes = {r.cent_id: r.cluster_n for r in out}
    assert sizes == {0: 5, 10: 5}
    cents = {(r.cent_id, r.dim): r.centroid for r in out}
    # cluster 0 is the x-axis group: mean dim0 ~1, dim1 = mean(.00..04)
    assert cents[(0, 0)] == pytest.approx(1.0, abs=1e-6)
    assert cents[(0, 1)] == pytest.approx(0.02, abs=1e-6)
    assert cents[(10, 1)] == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------- property layer

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_few = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs_df(spark, token_counts):
    rows = [
        (i, " ".join("w" for _ in range(n)) if n else "", f"s{i % 3}")
        for i, n in enumerate(token_counts)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


@_few
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=4),
)
def test_pack_sequences_conserves_corpus(spark, token_counts, ctx, shards):
    """Packing must lose nothing: pack_tokens sums to the corpus token
    count, n_docs sums to the doc count, and within a shard the
    (first_doc..last_doc) ranges are disjoint and increasing with
    pack_idx (contiguity of concat-then-split)."""
    out = pack_sequences(
        _docs_df(spark, token_counts), ctx_tokens=ctx, n_shards=shards
    ).collect()
    assert sum(r.pack_tokens for r in out) == sum(token_counts)
    assert sum(r.n_docs for r in out) == len(token_counts)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.pack_idx)
        for a, b in zip(rows, rows[1:]):
            assert a.last_doc < b.first_doc
            assert a.pack_idx < b.pack_idx


@_few
@given(
    st.lists(st.integers(min_value=1, max_value=30), min_size=2, max_size=40),
)
def test_domain_mix_is_a_probability_rebalance(spark, token_counts):
    """Shares sum to 1; weight*share is the same constant (1/n_sources)
    for every source — the defining property of uniform-target
    reweighting."""
    out = domain_mix(_docs_df(spark, token_counts)).collect()
    assert sum(r.token_share for r in out) == pytest.approx(1.0)
    n = len(out)
    for r in out:
        assert r.weight * r.token_share == pytest.approx(1.0 / n)


def test_pack_sequences_default_shards_is_cluster_parallelism(spark):
    """n_shards=None must shard at sparkContext.defaultParallelism —
    the packing window's parallelism scales with the cluster instead of
    silently capping at a fixed constant — and match the explicit-int
    form for that same count (the determinism contract is unchanged,
    just parameterized by cluster size)."""
    dp = spark.sparkContext.defaultParallelism
    n = 6 * dp
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("t"), 3)).alias("text"),
    )
    default = pack_sequences(df, ctx_tokens=7).collect()
    explicit = pack_sequences(df, ctx_tokens=7, n_shards=dp).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, explicit))
    assert {r.shard for r in default} == set(range(dp))


def test_context_length_plan_semantics_and_shape(spark):
    """x80: known token counts -> exact truncation/kept/lost/bins per
    L, and the plan must aggregate the corpus ONCE (L unpivoted after
    the agg — no Generate/explode of the corpus)."""
    from etsd_time_series_database_spark.operators.packing import (
        context_length_plan,
    )

    rows = [
        (1, " ".join(["w"] * 10), "s0"),   # 10 tokens
        (2, " ".join(["w"] * 50), "s0"),   # 50 tokens
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r.ctx_len: r
        for r in context_length_plan(df, lengths=(32, 64)).collect()
    }
    r32 = out[32]
    # doc2 truncates at 32: kept 10+32=42, lost 18, util 42/64, bins 2
    assert (r32.n_truncated, r32.tokens_kept, r32.tokens_lost) == (1, 42, 18)
    assert r32.pad_utilization == round(42 / 64, 6)
    assert r32.packed_bins == 2
    r64 = out[64]
    assert (r64.n_truncated, r64.tokens_kept, r64.tokens_lost) == (0, 60, 0)
    assert r64.packed_bins == 1

    # the scale contract: ONE Aggregate over the corpus, and the
    # stack's Generate sits ABOVE it (tree prints parents first) — a
    # refactor to explode(lengths)-then-groupBy would print Generate
    # BELOW the Aggregate and still scan once, so counting scans
    # cannot catch it
    plan = (
        context_length_plan(df, lengths=(32, 64))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("Aggregate [") == 1, plan
    assert "Generate" in plan, plan
    assert plan.index("Generate") < plan.index("Aggregate ["), plan


def test_context_length_plan_null_text_is_zero_tokens(spark):
    """Regression (review): least(NULL, L) returns L on both engines
    (least skips NULLs), so an unguarded NULL-text doc was credited L
    phantom kept tokens; with the coalesce it counts as a zero-token
    document — kept/lost 0, not truncated, still in n_docs."""
    from etsd_time_series_database_spark.operators.packing import (
        context_length_plan,
    )

    rows = [
        (1, " ".join(["w"] * 10), "s0"),
        (2, None, "s0"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = context_length_plan(df, lengths=(32,)).collect()
    r = out[0]
    assert (r.n_docs, r.n_tokens) == (2, 10)
    assert (r.n_truncated, r.tokens_kept, r.tokens_lost) == (0, 10, 0)
    assert r.packed_bins == 1
