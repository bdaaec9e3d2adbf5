

"""Unit tests for text-statistics operators not covered by the larger
pipeline suites (the per-source vocabulary profile family)."""

from __future__ import annotations


def test_vocab_concentration_profile(spark):
    """Known tiny corpus: hapax share and top-k coverage are exact
    rational fractions; rank ties break on the token string."""
    from etsd_time_series_database_spark.operators.textstats import (
        vocab_concentration,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b b c", "s1"),
            (2, "a d", "s1"),
            (3, "x y", "s2"),
        ],
        ["doc_id", "text", "source"],
    )
    out = {r.source: r for r in
           vocab_concentration(docs, top_ks=(1, 2)).collect()}
    s1 = out["s1"]
    # s1 counts: a=4, b=2, c=1, d=1 -> vocab 4, total 8, hapax 2
    assert (s1.vocab, s1.total_tokens, s1.hapax) == (4, 8, 2)
    assert s1.hapax_share == 0.5
    assert s1.top1_cov == 0.5          # a: 4/8
    assert s1.top2_cov == 0.75         # a+b: 6/8
    s2 = out["s2"]
    # x=1, y=1: top1 tie breaks on token string -> x
    assert (s2.vocab, s2.total_tokens, s2.hapax) == (2, 2, 2)
    assert s2.top1_cov == 0.5 and s2.top2_cov == 1.0
