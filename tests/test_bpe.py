"""BPE vocabulary induction: property tests against a pure-Python
reference implementation (classic Sennrich-style get_stats/merge), plus
the catalog's DuckDB oracle via test_catalog_oracle."""

from __future__ import annotations

from collections import Counter

import pytest

from etsd_time_series_database_spark.operators.bpe import (
    bpe_encode,
    bpe_merges,
)


def _ref_bpe(words: Counter, n_merges: int):
    """Reference BPE: overlapping pair counts, (cnt DESC, l, r)
    tie-break, greedy left-to-right non-overlapping merge."""
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += words[w]
        if not stats:
            break
        (l, r), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _corpus(spark, docs):
    return spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )


CORPORA = [
    ["banana bandana banana", "ban ana nab"],
    # overlap semantics: "aaaa" counts (a,a) x3 but merges to [aa, aa]
    ["aaaa aaa aa a", "aaaa aaaa"],
    # ties everywhere: forces the (cnt, l, r) lexicographic tie-break
    ["ab cd ab cd", "cd ab", "ba dc"],
    # single-char words only: zero pairs, zero merges
    ["a b c a b", "c c a"],
]


@pytest.mark.parametrize("docs", CORPORA)
def test_bpe_matches_reference(spark, docs):
    words = Counter(w for d in docs for w in d.split() if w)
    ref_merges, ref_vocab = _ref_bpe(words, 5)
    got = [
        (r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_merges(_corpus(spark, docs), 5).collect()
    ]
    # bpe_merges emits no row for rounds with no pairs left
    assert got == ref_merges

    if ref_merges:
        enc = bpe_encode(
            _corpus(spark, docs), [(l, r) for l, r, _ in ref_merges]
        ).collect()
        for row in enc:
            doc_words = docs[row["doc_id"]].split()
            assert row["n_char_syms"] == sum(len(w) for w in doc_words)
            assert row["n_bpe_syms"] == sum(
                len(ref_vocab[w]) for w in doc_words
            )
            assert row["n_bpe_syms"] <= row["n_char_syms"]


def test_bpe_rejects_bad_n_merges(spark):
    with pytest.raises(ValueError):
        bpe_merges(_corpus(spark, ["a b"]), 0)


def test_bpe_merge_order_is_rank_order(spark):
    """Later merges may consume earlier merge outputs (that's the
    point of BPE): learned on banana-corpus, merge 4 builds on 1-3."""
    rows = bpe_merges(
        _corpus(spark, ["banana bandana banana", "ban ana nab"]), 4
    ).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
    merged = {r["merged"] for r in rows}
    assert "an" in merged  # first merge
    # at least one later merge uses a merged symbol as an operand
    assert any(r["lhs"] in merged or r["rhs"] in merged for r in rows[1:])


def test_bpe_plan_shapes(spark):
    """The scale contract: the only corpus-sized pass (word_freq) is a
    map-side-combinable hash agg; the per-round argmax is TakeOrdered
    (per-partition top-1 + merge, never a global sort); nothing drops
    to Python."""
    from pyspark.sql import functions as F

    from etsd_time_series_database_spark.operators.bpe import (
        _pair_structs,
        word_freq,
    )

    docs = _corpus(spark, ["banana bandana banana", "ban ana nab"])
    wf = word_freq(docs)
    plan = wf._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan  # map-side combine before the shuffle
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan

    best = (
        wf.select("freq", F.explode(_pair_structs("syms")).alias("p"))
        .select("freq", "p.l", "p.r")
        .groupBy("l", "r")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "l", "r")
        .limit(1)
    )
    bplan = best._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in bplan
    assert "partial_sum" in bplan  # pair counts combine map-side too
    assert "BatchEvalPython" not in bplan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abc", min_size=1, max_size=6)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(_word, min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_bpe_property_matches_reference(spark, docs):
    """Random tiny-alphabet corpora (maximal pair collisions, overlap
    runs like 'aaaaaa', heavy ties) against the pure-Python reference."""
    words = Counter(w for d in docs for w in d.split() if w)
    ref_merges, _ = _ref_bpe(words, 4)
    got = [
        (r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_merges(_corpus(spark, docs), 4).collect()
    ]
    assert got == ref_merges


def test_bpe_compression_matches_encode(spark):
    """The declarative join-based encoder (x47) and the literal-model
    fold encoder must agree document-by-document."""
    from etsd_time_series_database_spark.operators.bpe import (
        bpe_compression,
    )

    docs = ["banana bandana banana", "ban ana nab", ""]
    df = _corpus(spark, docs)
    merges = [(r["lhs"], r["rhs"]) for r in bpe_merges(df, 4).collect()]
    enc = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    comp = {r["doc_id"]: r for r in bpe_compression(df, 4).collect()}
    # both encoders keep the empty doc (zero counts), same key set
    assert set(comp) == set(enc) == {0, 1, 2}
    for i in (0, 1, 2):
        assert comp[i]["n_char_syms"] == enc[i]["n_char_syms"]
        assert comp[i]["n_bpe_syms"] == enc[i]["n_bpe_syms"]
    for i in (0, 1):
        assert comp[i]["compression"] == (
            comp[i]["n_char_syms"] / comp[i]["n_bpe_syms"]
        )
    assert comp[2]["n_words"] == 0
    assert comp[2]["n_char_syms"] == 0 and enc[2]["n_char_syms"] == 0
    assert comp[2]["compression"] is None
