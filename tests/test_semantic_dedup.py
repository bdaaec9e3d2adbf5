"""Unit tests for SemDeDup-style semantic dedup (x46); cross-engine
hash equivalence is covered by test_catalog_oracle."""

from __future__ import annotations

from etsd_time_series_database_spark.operators.similarity import (
    semantic_dedup,
)

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),  # seed A
    (1, [0.0, 1.0, 0.0, 0.0]),  # seed B
    (2, [1.0, 0.05, 0.0, 0.0]),  # near-dup of seed A -> dropped
    (3, [0.6, 0.8, 0.0, 0.0]),  # cell B, far from seed B -> kept
    (4, [0.6, 0.8, 0.01, 0.0]),  # near-dup of 3 -> dropped
    (5, [0.0, 0.0, 1.0, 0.0]),  # orthogonal: tie -> lowest cell, kept
]


def _emb(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<float>"
    )


def test_semantic_dedup_verdicts(spark):
    rows = {
        r["vec_id"]: r
        for r in semantic_dedup(_emb(spark), [0, 1], tau=0.99).collect()
    }
    assert len(rows) == 6
    # seeds keep themselves (no prior member)
    assert rows[0]["dropped"] is False and rows[0]["max_prior_cos"] == -2.0
    assert rows[1]["dropped"] is False
    # 2 is a near-dup of seed A (cos ~ 0.99875)
    assert rows[2]["cent_id"] == 0
    assert rows[2]["dropped"] is True
    # 3 lands in cell B but is far from seed B
    assert rows[3]["cent_id"] == 1
    assert rows[3]["dropped"] is False
    # 4 is a near-dup of 3 within cell B
    assert rows[4]["cent_id"] == 1
    assert rows[4]["dropped"] is True
    assert rows[4]["max_prior_cos"] > 0.999
    # cosine tie to both seeds -> deterministic lowest cell id
    assert rows[5]["cent_id"] == 0
    assert rows[5]["dropped"] is False


def test_semantic_dedup_is_order_free(spark):
    """Repartitioned input must give identical verdicts (the max_by
    tie-break and keep-the-earliest rule are total orders)."""
    a = semantic_dedup(_emb(spark), [0, 1], tau=0.99).collect()
    b = semantic_dedup(
        _emb(spark).repartition(7), [0, 1], tau=0.99
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hard_negatives_excludes_same_label(spark):
    from etsd_time_series_database_spark.operators.similarity import (
        hard_negatives,
    )

    rows = [
        (0, [1.0, 0.0], 0),  # query, label 0
        (1, [0.99, 0.1], 0),  # same label, MOST similar -> must be excluded
        (2, [0.9, 0.2], 1),  # different label, close -> hard negative
        (3, [0.0, 1.0], 1),  # different label, orthogonal -> easy negative
        (4, [0.8, 0.3], 2),  # different label
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = hard_negatives(df, [0], k=2).collect()
    assert [r["neg_vec_id"] for r in got] == [2, 4]
    assert all(r["q_vec_id"] == 0 for r in got)
    assert [r["rank"] for r in got] == [1, 2]
    assert got[0]["cosine"] > got[1]["cosine"]

    plan = (
        hard_negatives(df, [0], k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the k-filter must push into the sort (per-partition top-k),
    # and nothing drops to Python
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan
