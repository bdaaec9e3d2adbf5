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
