"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All of these are JVM-side Catalyst expressions — no Python UDFs.
Two physical regimes, chosen per operator:

* simple per-doc metrics stay as zero-shuffle column expressions in
  the scan stage;
* metrics that reference a heavy array expression (tokenize, shingle)
  MORE THAN ONCE are computed from exploded rows + hash-aggs instead:
  higher-order array lambdas run interpreted (CodegenFallback), and
  projection collapse / filter pushdown re-evaluate the expression
  per reference — a Generate consumes it exactly once, and the
  follow-up aggs are map-side-combinable (see repetition_profile;
  the fused clean-corpus gate in plans/pipeline.py measured 10.4 s ->
  2.3 s at sf0.1 from this rewrite alone).

This extends the reference's scope: the reference is a numeric TSDB
with no text facility; these operators are the data-pipeline
capabilities a Spark-native engine adds on top (SURVEY.md §2 extension
set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etsd_time_series_database_spark.functions.exprs import DEC, poly_fingerprint

# Deterministic tiny English stopword list for the language heuristic.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

TOKEN_RE = "[a-z0-9]+"


def _tokens(text: str = "text") -> Column:
    """Whitespace tokens with empties removed (JVM lambda)."""
    return F.filter(F.split(F.col(text), " "), lambda x: x != "")


def token_counts(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Whitespace token count + regex ([a-z0-9]+, a BPE-ish word unit)
    token count per document."""
    return df.select(
        key,
        F.size(_tokens(text)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text), F.lit(TOKEN_RE), 0)).alias(
            "n_re_tokens"
        ),
    ).orderBy(key)


def quality_expr(text: str = "text"):
    """x17's composite quality score as a reusable Column:
    ``0.5 * distinct-token ratio + 0.5 * least(1, n_tokens/100)``.

    This is the SINGLE source of truth for the composite — x17
    (:func:`quality_score`), x60 (:func:`corpus_datacard`), x61
    (``dedup.keep_best_canonical``) and x66 (``sampling.eval_slice``)
    all build on this expression, so a tweak here changes all four
    operators and their oracles together instead of silently
    desynchronizing hand-copied variants. NULL (not 0) on empty
    documents — callers choose their own coalesce policy.
    """
    toks = _tokens(text)
    n_tok = F.size(toks)
    n_dis = F.size(F.array_distinct(toks))
    return F.lit(0.5) * F.try_divide(n_dis, n_tok) + F.lit(0.5) * F.least(
        F.lit(1.0), n_tok / F.lit(100.0)
    )


def quality_score(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, token count, distinct-token
    ratio, average token length, composite score in [0,1]."""
    toks = _tokens(text)
    n_tok = F.size(toks)
    n_dis = F.size(F.array_distinct(toks))
    chars_no_space = F.length(F.replace(F.col(text), F.lit(" "), F.lit("")))
    # try_divide: empty documents yield NULL ratios instead of an ANSI
    # divide-by-zero error (same as SQL NULLIF-guarded division).
    distinct_ratio = F.try_divide(n_dis, n_tok)
    return df.select(
        key,
        F.length(text).cast("int").alias("n_chars"),
        n_tok.alias("n_tokens"),
        n_dis.alias("n_distinct"),
        F.try_divide(chars_no_space, n_tok).alias("avg_token_len"),
        distinct_ratio.alias("distinct_ratio"),
        quality_expr(text).alias("quality"),
    ).orderBy(key)


def language_id(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """N-gram/stopword language heuristic: ratio of English stopwords
    among tokens; >= 5% -> 'en' else 'und'. (A real model would be a
    fastText-style classifier behind a Pandas UDF; the Spark plumbing
    is identical.)"""
    toks = _tokens(text)
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.size(
        F.expr(f"filter(filter(split({text}, ' '), x -> x != ''), x -> x IN ({in_list}))")
    )
    n_tok = F.size(toks)
    ratio = F.try_divide(n_stop, n_tok)
    return df.select(
        key,
        n_tok.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        ratio.alias("stopword_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias("pred_lang"),
    ).orderBy(key)


def fingerprint(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Deterministic rolling-hash document fingerprint (dedup key).
    Portable across engines (unlike builtin hash()): h = fold over
    ascii codes of (h*31 + c) mod 1e9+7."""
    return df.select(key, poly_fingerprint(text).alias("fp")).orderBy(key)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows — the chunking
    step of a training/RAG corpus pipeline: chunk i covers tokens
    [i*stride, i*stride + chunk_tokens) with stride = chunk - overlap.

    Pure JVM: tokenize once, generate chunk starts with sequence(),
    slice() each window, posexplode to one row per chunk. No shuffle —
    a 100 TB corpus chunks at scan speed. Empty documents emit no
    chunks; a final short chunk is kept only when it adds tokens beyond
    the previous chunk's end (standard stride semantics).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = df.select(key, _tokens(text).alias("__toks")).withColumn(
        "__n", F.size("__toks")
    )
    # chunk starts: 0, stride, ... while start < n (at least one chunk
    # for non-empty docs); suppress trailing chunks fully covered by
    # the previous window.
    starts = F.when(F.col("__n") <= 0, F.array()).otherwise(
        F.filter(
            F.sequence(F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(stride)),
            lambda s: (s == 0) | (s + F.lit(chunk_tokens) - F.lit(stride) < F.col("__n")),
        )
    )
    chunked = toks.select(
        key,
        "__toks",
        F.posexplode(starts).alias("chunk_idx", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return chunked.select(
        key,
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    ).orderBy(key, "chunk_idx")


# PII patterns restricted to the syntax subset Java regex (Spark) and
# RE2 (DuckDB/Go) interpret identically: explicit classes, {m,n}
# repetition, \b word boundaries — no lookarounds, no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RE = r"https?://[^ ]+"
PII_ID_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"


def pii_scrub(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Redact emails, URLs and SSN-style ids from a corpus, reporting
    per-document redaction counts and a fingerprint of the scrubbed
    text (the dedup key AFTER scrubbing, so near-identical documents
    differing only in contact details collapse).

    Pure JVM regexp expressions — zero shuffle, scan-speed at 100 TB.
    Replacement order (email, URL, id) is fixed so every engine
    produces the identical scrubbed string.
    """
    t = F.col(text)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"), PII_URL_RE, "<URL>"
        ),
        PII_ID_RE,
        "<ID>",
    )
    return df.select(
        key,
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_URL_RE)).alias("n_urls"),
        F.regexp_count(t, F.lit(PII_ID_RE)).alias("n_ids"),
        poly_fingerprint(scrubbed).alias("clean_fp"),
    ).orderBy(key)


def corpus_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-source corpus profile: document count, distinct languages,
    token and character totals — the summary a pipeline operator reads
    before choosing sampling weights.  One hash-agg shuffle keyed by
    source; exact integer/decimal sums (order-independent)."""
    from etsd_time_series_database_spark.functions.exprs import davg

    return (
        df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(F.size(_tokens(text))).cast("bigint").alias("total_tokens"),
            davg(F.length(F.col(text)).cast("double"), "avg_chars"),
            F.max(F.length(text)).cast("bigint").alias("max_chars"),
        )
        .orderBy("source")
    )


def token_topk(
    df: DataFrame, k: int = 50, text: str = "text", min_len: int = 1
) -> DataFrame:
    """Corpus-wide heavy hitters: the ``k`` most frequent tokens with
    document frequency alongside term frequency — the vocabulary /
    stopword induction step of a tokenizer-training pipeline.

    Shape at 100 TB: explode -> hash-agg. The aggregation is map-side
    combinable (token cardinality << row count after combine), and the
    final top-k is a TakeOrderedAndProject — no global sort ever
    materializes. Ties break lexicographically so the result is total.
    """
    # (token, doc) pairs via per-document distinct tokens: array_distinct
    # before explode keeps doc-frequency exact without a second shuffle.
    per_doc = df.select(F.array_distinct(_tokens(text)).alias("__toks"))
    dfreq = (
        per_doc.select(F.explode("__toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    tfreq = (
        df.select(F.explode(_tokens(text)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("term_freq"))
    )
    return (
        tfreq.join(dfreq, "token")
        .filter(F.length("token") >= F.lit(min_len))
        .orderBy(F.col("term_freq").desc(), F.col("token").asc())
        .limit(k)
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text: str = "text",
    key: str = "doc_id",
    fingerprint: bool = True,
) -> DataFrame:
    """Per-document novelty: the share of a document's DISTINCT word
    n-grams whose FIRST corpus occurrence (lowest ``key``) is this
    document. The online view of corpus redundancy — a doc made of
    spans already seen in earlier documents scores near 0, fresh text
    scores near 1 — used to rank/filter scraped snapshots where later
    crawls mostly re-collect earlier content. Complementary to
    operators.dedup: segment_dedup counts how many docs share a span;
    this attributes each span to its earliest document.

    Scale: the per-doc distinct n-gram explode is a JVM transform
    (scan-speed). First-occurrence attribution groups on
    ``xxhash64(gram)`` by default — a fixed 8-byte shuffle key;
    ``fingerprint=False`` is the exact raw-string oracle form (the
    segment-dedup quarantine pattern). All aggs map-side combinable;
    no window, no global sort (the ORDER BY is presentation-only).

    Physical shape (round-14 optimization, CONFIRMED at volume in
    round 15): a doc's novel count is the number of grams whose
    first-occurrence doc is that doc — so after the (gram -> min doc)
    aggregate, ``n_novel`` is just a count of the GRAM-DISTINCT rows
    grouped by their min doc, and ``n_ngrams`` a count of the gram
    rows grouped by doc (map-side combinable — collapses to doc-sized
    before the exchange). The pre-round-14 form instead joined the
    corpus-sized gram table back against the firsts table; the
    round-15 20M-gram head-to-head (scripts/bench_ngram_novelty.py)
    measured it at task 206 s vs 129 s for this form — the structural
    claim the round-14 side metrics left unproven. A round-15 attempt
    to compute ``n_ngrams`` from size(array_distinct(...)) WITHOUT the
    explode measured 350 s (2.7x WORSE): with no Generate boundary,
    CollapseProject inlines the token split into every one of
    shingle_expr's column references, so tokenization runs 4x per
    row — measured and reverted, recorded here so it is not
    re-attempted. Note on ``fingerprint=True`` collision semantics
    (round-14 advisory): ``n_novel`` counts distinct xxhash64
    fingerprints first seen in the doc, so two distinct grams
    colliding on one 64-bit fingerprint within their shared first doc
    count 1 where the raw-string form counts 2 (probability ~2^-64
    per gram pair; ``fingerprint=False`` is collision-free and exact).
    """
    from etsd_time_series_database_spark.operators.dedup import shingle_expr

    toks = df.select(F.col(key), _tokens(text).alias("__toks"))
    grams = toks.select(
        F.col(key),
        F.explode(F.array_distinct(shingle_expr("__toks", n))).alias("__g"),
    )
    gk = "__gfp" if fingerprint else "__g"
    if fingerprint:
        grams = grams.withColumn("__gfp", F.xxhash64("__g")).drop("__g")
    firsts = grams.groupBy(gk).agg(F.min(key).alias("__first"))
    novel = firsts.groupBy(F.col("__first").alias(key)).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    totals = grams.groupBy(key).agg(F.count(F.lit(1)).alias("n_ngrams"))
    per = totals.join(novel, key, "left")
    return (
        df.select(key)
        .join(per, key, "left")
        .select(
            key,
            F.coalesce("n_ngrams", F.lit(0).cast("bigint")).alias("n_ngrams"),
            F.coalesce("n_novel", F.lit(0).cast("bigint")).alias("n_novel"),
        )
        .withColumn("novelty", F.try_divide("n_novel", "n_ngrams"))
        .orderBy(key)
    )


def source_token_topk(
    df: DataFrame,
    k: int = 5,
    text: str = "text",
    source: str = "source",
    min_len: int = 1,
) -> DataFrame:
    """Per-source heavy hitters: the ``k`` most frequent tokens WITHIN
    each source — the source-conditional vocabulary report a mixture
    designer reads next to :func:`corpus_stats` (a web source whose top
    tokens are boilerplate chrome needs cleaning before upweighting).

    Shape at 100 TB: one (source, token) hash-agg with map-side
    combine, then a per-source row_number window over the AGGREGATED
    histogram — vocabulary-sized, not corpus-sized, so the window's
    per-partition sort is bounded. Ties break lexicographically.
    """
    tf = (
        df.select(F.col(source), F.explode(_tokens(text)).alias("token"))
        .filter(F.length("token") >= F.lit(min_len))
        .groupBy(source, "token")
        .agg(F.count(F.lit(1)).alias("term_freq"))
    )
    w = Window.partitionBy(source).orderBy(
        F.col("term_freq").desc(), F.col("token").asc()
    )
    return (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= F.lit(k))
        .select(source, "rnk", "token", "term_freq")
        .orderBy(source, "rnk")
    )


def inverted_index(
    df: DataFrame,
    min_df: int = 2,
    max_df: int = 50,
    text: str = "text",
    key: str = "doc_id",
    n: int = 1,
) -> DataFrame:
    """Postings lists for mid-frequency terms: term -> sorted array
    of containing doc ids, restricted to terms whose document
    frequency lies in [min_df, max_df] (high-df terms are stopwords,
    df=1 terms retrieve nothing). ``n`` > 1 indexes word n-gram
    phrases instead of single tokens — the phrase-index form a
    retrieval pipeline actually queries.

    This is the retrieval-index build a RAG-style pipeline runs over a
    corpus. One shuffle keyed by term; posting arrays are bounded by
    max_df so no single group can blow an executor, which is the
    property that makes the plan safe at 100 TB (unbounded postings
    for stopwords are exactly what the df ceiling removes).
    """
    if n > 1:
        from etsd_time_series_database_spark.operators.dedup import shingle_expr

        toks = df.select(F.col(key), _tokens(text).alias("__toks"))
        pairs = toks.select(
            F.col(key),
            F.explode(F.array_distinct(shingle_expr("__toks", n))).alias("token"),
        )
    else:
        pairs = df.select(
            F.col(key), F.explode(F.array_distinct(_tokens(text))).alias("token")
        )
    return (
        pairs.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sort_array(F.collect_list(key)).alias("postings"),
        )
        .filter(
            (F.col("doc_freq") >= F.lit(min_df)) & (F.col("doc_freq") <= F.lit(max_df))
        )
        .orderBy("token")
    )


def tfidf_topterms(
    df: DataFrame,
    k: int = 3,
    min_df: int = 2,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Per-document top-``k`` characteristic terms by TF-IDF — the
    term-weighting step of retrieval / keyword-extraction pipelines.

    The weight is the log-free rational form score = tf * N / df
    (monotone in the classic tf*log(N/df) for fixed tf): division of
    exactly-representable BIGINTs is a single correctly-rounded IEEE
    op, so scores are bit-identical across engines, where ln()
    implementations drift by ulps (same policy as the rest of the
    catalog — no transcendental functions in verified outputs).

    Shape at 100 TB: two map-side-combinable hash-aggs (term frequency
    keyed by (doc, token); document frequency keyed by token), a join
    on token (vocabulary-sized right side — AQE broadcasts when it
    fits), a one-row corpus-count broadcast, and a per-doc top-k window
    (parallelism = doc cardinality). No global sort: the final ORDER BY
    is presentation-only.
    """
    tf = (
        df.select(F.col(key), F.explode(_tokens(text)).alias("token"))
        .groupBy(key, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = (
        df.select(F.explode(F.array_distinct(_tokens(text))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= F.lit(min_df))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("__n")).cast("double") / F.col("doc_freq"),
        )
    )
    w = Window.partitionBy(key).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(key, "rk", "token", "tf", "doc_freq", "score")
        .orderBy(key, "rk")
    )


def repetition_profile(
    df: DataFrame,
    max_dup_3gram: float = 0.15,
    max_top_token: float = 0.20,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Within-document repetition quality signals (the Gopher-rule
    family used to filter LLM training corpora): duplicate 2-gram and
    3-gram fractions, the most-frequent-token dominance fraction, and a
    keep flag applying the thresholds.

    Every signal is computed from EXPLODED tokens/grams — each heavy
    array expression (tokenize, shingle) is consumed exactly once by a
    Generate, then counted by map-side-combinable hash-aggs. The
    per-row array-expression form looks cheaper (zero shuffle) but
    higher-order lambdas are interpreted (CodegenFallback) and
    projection collapse re-evaluates the tokenizer per reference —
    measured 2.5 s vs 0.9 s on sf0.1. All fractions are single IEEE
    divisions of exact BIGINTs, so both engines agree bit-for-bit;
    documents too short to shingle keep NULL fractions, and empty
    documents keep their row (n_tokens 0, keep true — no evidence of
    repetition).
    """
    from etsd_time_series_database_spark.operators.dedup import shingle_expr

    toks = df.select(F.col(key), _tokens(text).alias("__toks"))

    def _gram_frac(n: int, out: str):
        return (
            toks.select(
                F.col(key), F.explode(shingle_expr("__toks", n)).alias("__g")
            )
            .groupBy(key)
            .agg(
                F.try_divide(
                    F.count(F.lit(1)) - F.count_distinct(F.col("__g")),
                    F.count(F.lit(1)),
                ).alias(out)
            )
        )

    stats = (
        toks.select(F.col(key), F.explode("__toks").alias("__t"))
        .groupBy(key, "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(key)
        .agg(
            F.sum("__c").cast("int").alias("__nt"),
            F.try_divide(F.max("__c"), F.sum("__c")).alias("top_token_frac"),
        )
    )
    keep = (
        F.coalesce(F.col("dup_3gram_frac"), F.lit(0.0)) <= F.lit(max_dup_3gram)
    ) & (F.coalesce(F.col("top_token_frac"), F.lit(0.0)) <= F.lit(max_top_token))
    return (
        df.select(key)
        .join(stats, key, "left")
        .join(_gram_frac(2, "dup_2gram_frac"), key, "left")
        .join(_gram_frac(3, "dup_3gram_frac"), key, "left")
        .select(
            key,
            F.coalesce(F.col("__nt"), F.lit(0)).alias("n_tokens"),
            "dup_2gram_frac",
            "dup_3gram_frac",
            "top_token_frac",
            keep.alias("keep"),
        )
        .orderBy(key)
    )


def gopher_rules(
    df: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_word_len: float = 3.0,
    max_word_len: float = 10.0,
    min_alpha_frac: float = 0.80,
    max_symbol_ratio: float = 0.10,
    min_stopwords: int = 2,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Gopher-style document quality-rule battery (Rae et al. 2021,
    C4-family heuristics), complementary to ``repetition_profile``
    (x27) which owns the repetition rules:

    * ``rule_len``        — token count within [min_tokens, max_tokens]
    * ``rule_word_len``   — mean word length within [min, max] chars
    * ``rule_alpha``      — fraction of tokens containing a letter
                            >= min_alpha_frac
    * ``rule_symbol``     — non-[a-z0-9 ] character ratio
                            <= max_symbol_ratio
    * ``rule_stop``       — >= min_stopwords distinct stopwords present

    Every signal is a pure Catalyst column expression over the token
    array (split / filter / length lambdas): zero shuffle, zero Python,
    the whole battery runs at parquet scan speed — at 100 TB this is a
    map-only pass. Ratios are single IEEE divisions of exact BIGINTs so
    both engines agree bit-for-bit. Empty documents fail ``rule_len``
    and vacuously pass the ratio rules (NULL -> documented default), so
    ``keep`` is never NULL.
    """
    toks = _tokens(text)
    n_tok = F.size(toks)
    chars_no_space = F.length(F.replace(F.col(text), F.lit(" "), F.lit("")))
    mean_word_len = F.try_divide(chars_no_space, n_tok)
    alpha_frac = F.try_divide(
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))), n_tok
    )
    symbol_ratio = F.try_divide(
        F.length(F.regexp_replace(F.col(text), "[a-z0-9 ]", "")),
        F.length(F.col(text)),
    )
    # reuse the one tokenizer (_tokens) — a second inline definition
    # could silently diverge from the other rules' token convention
    n_stop = F.size(
        F.filter(F.array_distinct(toks), lambda x: x.isin(*STOPWORDS))
    )
    rule_len = (n_tok >= F.lit(min_tokens)) & (n_tok <= F.lit(max_tokens))
    rule_word_len = F.coalesce(
        (mean_word_len >= F.lit(min_word_len))
        & (mean_word_len <= F.lit(max_word_len)),
        F.lit(False),
    )
    rule_alpha = F.coalesce(alpha_frac >= F.lit(min_alpha_frac), F.lit(False))
    rule_symbol = F.coalesce(
        symbol_ratio <= F.lit(max_symbol_ratio), F.lit(True)
    )
    rule_stop = n_stop >= F.lit(min_stopwords)
    rules = [rule_len, rule_word_len, rule_alpha, rule_symbol, rule_stop]
    n_failed = sum(F.when(r, 0).otherwise(1) for r in rules)
    keep = rules[0]
    for r in rules[1:]:
        keep = keep & r
    return df.select(
        key,
        n_tok.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        symbol_ratio.alias("symbol_ratio"),
        n_stop.alias("n_stopwords"),
        rule_len.alias("rule_len"),
        rule_word_len.alias("rule_word_len"),
        rule_alpha.alias("rule_alpha"),
        rule_symbol.alias("rule_symbol"),
        rule_stop.alias("rule_stop"),
        n_failed.cast("int").alias("n_failed"),
        keep.alias("keep"),
    ).orderBy(key)


def surprisal_score(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Unigram rarity scoring — the transcendental-free proxy for
    perplexity filtering (CCNet-style quality bucketing): each token's
    rarity is ``corpus_tokens div token_freq`` (monotone in its -log
    unigram probability, like the x26 TF-IDF weight policy), and each
    document reports its token count, mean rarity and max rarity.
    High mean = unusual vocabulary; high max = at least one
    corpus-rare token.

    Rarity is an exact BIGINT (integer division — granularity 1 on
    values that start at 1 and run to corpus size, plenty for
    bucketing): sums, max and the final mean division are then exact
    integer arithmetic plus ONE IEEE division, identical on every
    engine — no double->decimal rounding boundary anywhere (a
    fractional rarity summed through DECIMAL(18,6) flipped a 6th
    decimal between engines on real data).

    Plan: one map-side-combinable vocab count, a one-row corpus-total
    broadcast, a token->vocab equi-join (vocab-sized right side, AQE
    broadcasts while it fits) and one per-doc hash-agg. Empty
    documents survive with zero counts and NULL scores.
    """
    toks = df.select(F.col(key), F.explode(_tokens(text)).alias("__t"))
    vocab = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("__f"))
    total = vocab.agg(F.sum("__f").cast("bigint").alias("__n"))
    rar = (
        toks.join(vocab, "__t")
        .join(F.broadcast(total))
        .withColumn("__rar", F.expr("__n div __f"))
    )
    g = rar.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("__nt"),
        F.round(
            F.sum("__rar").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_rarity"),
        F.max("__rar").cast("bigint").alias("max_rarity"),
    )
    return (
        df.select(key)
        .join(g, key, "left")
        .select(
            key,
            F.coalesce(F.col("__nt"), F.lit(0)).alias("n_tokens"),
            "mean_rarity",
            "max_rarity",
        )
        .orderBy(key)
    )


def dsir_weights(
    df: DataFrame,
    target_source: str = "src0",
    n_buckets: int = 2048,
    text: str = "text",
    key: str = "doc_id",
    source: str = "source",
    hash_mode: str = "hash64",
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by how much its hashed n-gram
    feature distribution looks like a TARGET domain versus the raw
    corpus, so a pipeline can resample raw data toward the target.

    Features are word unigrams + bigrams hashed into ``n_buckets``
    buckets (the paper's hashed n-gram feature space). ``hash_mode``
    follows the dedup convention: 'hash64' (default) buckets with
    codegen'd xxhash64 — the scale path; 'poly' uses the portable
    polynomial fingerprint so a DuckDB oracle reproduces the exact
    bucketing (an interpreted per-char fold — measured ~2x slower on
    the whole query at sf0.1; which features share a bucket differs
    between modes, but both are valid DSIR feature spaces and the
    ranking statistics agree). Bucket probabilities are
    Laplace-smoothed ((n+1)/(N+B)). The per-document score is the
    linear distribution contrast Σ_b c_b · (p̂_target(b) − p̂_raw(b)),
    scaled to parts-per-million — a deterministic, log-free surrogate
    for the paper's log-likelihood-ratio (same sign structure and the
    same resampling ORDER on docs whose features concentrate in
    target-heavy buckets; ln() is libm/engine-specific, which the
    house rules ban from oracle-gated paths — the x50 rational-rarity
    precedent).

    Shape (all map-side-combinable, no window, no per-doc state):
    Generate (explode) consumes the token array once; hash-agg to
    (doc, bucket) counts; hash-agg to the B-row bucket table; the
    B-row table and its 1-row total broadcast back onto the (doc,
    bucket) counts; one final per-doc hash-agg. Shuffles carry
    (doc, bucket, count) triples and the KB-sized bucket table —
    never text. At 100 TB the bucket table is static: train it once,
    persist, and the scoring pass is a single broadcast-join scan.

    Docs with no features (empty text) drop out — scoring needs at
    least one feature. Cross-row sums quantize each ppm term to
    DECIMAL(18,6) (resolution 1e-12 of the raw probability delta), so
    accumulation order cannot move the hash.
    """
    from etsd_time_series_database_spark.operators.dedup import shingle_expr

    toks = df.select(
        key,
        (F.col(source) == target_source).alias("is_target"),
        _tokens(text).alias("__toks"),
    )
    feats = toks.select(
        key,
        "is_target",
        F.explode(F.concat(F.col("__toks"), shingle_expr("__toks", 2))).alias(
            "feat"
        ),
    )
    if hash_mode == "poly":
        bucket = F.pmod(poly_fingerprint("feat"), F.lit(n_buckets))
    elif hash_mode == "hash64":
        bucket = F.pmod(F.xxhash64("feat"), F.lit(n_buckets))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    cnts = (
        feats.select(
            key,
            "is_target",
            bucket.alias("bucket"),
        )
        .groupBy(key, "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bt = cnts.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(F.lit(0))).alias(
            "nt"
        ),
        F.sum(F.when(~F.col("is_target"), F.col("c")).otherwise(F.lit(0))).alias(
            "nr"
        ),
    )
    tot = bt.agg(F.sum("nt").alias("t_total"), F.sum("nr").alias("r_total"))
    pt = (F.col("nt") + 1).cast("double") / (
        F.col("t_total") + n_buckets
    ).cast("double")
    pr = (F.col("nr") + 1).cast("double") / (
        F.col("r_total") + n_buckets
    ).cast("double")
    term = F.col("c").cast("double") * (pt - pr) * F.lit(1000000.0)
    return (
        cnts.join(F.broadcast(bt), "bucket")
        .crossJoin(F.broadcast(tot))
        .groupBy(key, "is_target")
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(term.cast("decimal(18,6)")).alias("__w"),
        )
        .select(
            key,
            "is_target",
            "n_feats",
            F.round(F.col("__w").cast("double"), 6).alias("dsir_ppm"),
        )
        .orderBy(key)
    )


def corpus_datacard(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-source corpus data card — the datasheet row a training run
    records per feed: document count, token volume, English fraction
    (x16's stopword rule), mean quality (x17's composite), and the
    exact-duplicate rate (x11's fingerprint grouping) — all five
    signals in ONE map-side-combinable hash aggregation keyed by
    source (no joins between the component operators, no second
    pass).

    Per-doc expressions reuse the catalog components verbatim so the
    card is consistent with the standalone entries. The x10/x54 note
    applies at 100 TB: the token array is referenced several times per
    row, which evaluates interpreted per reference — the fused
    exploded form in plans/pipeline.py is the hot-path variant; this
    card is the small-output reporting form. Mean quality quantizes
    per-doc scores with round(·, 6) before the DECIMAL sum (the
    exact-half tie rule — see _bucket_means); dup-rate counts distinct
    xxhash64(text) with the raw-text oracle, the x11 collision-free
    convention.
    """
    toks = _tokens(text)
    n_tok = F.size(toks)
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.size(
        F.expr(
            f"filter(filter(split({text}, ' '), x -> x != ''), "
            f"x -> x IN ({in_list}))"
        )
    )
    is_en = F.try_divide(n_stop, n_tok) >= 0.05
    quality = quality_expr(text)
    agg = df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).cast("bigint").alias("total_tokens"),
        F.sum(F.when(is_en, 1).otherwise(0)).alias("__n_en"),
        F.sum(F.round(quality, 6).cast(DEC)).alias("__sq"),
        F.count(quality).alias("__nq"),
        F.countDistinct(F.xxhash64(text)).alias("__nd"),
    )
    n = F.col("n_docs").cast("double")
    return agg.select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(F.col("__n_en").cast("double") / n, 6).alias("english_frac"),
        F.round(
            F.col("__sq").cast("double") / F.col("__nq").cast("double"), 6
        ).alias("mean_quality"),
        F.round(F.lit(1.0) - F.col("__nd").cast("double") / n, 6).alias(
            "dup_rate"
        ),
    ).orderBy("source")


def normalize_dedup_lift(df: DataFrame, text: str = "text") -> DataFrame:
    """Normalization-aware dedup accounting (the CCNet/RefinedWeb
    pre-dedup step): lowercase + whitespace-run collapse + trim, then
    report in ONE row how much duplicate mass normalization exposes —
    docs changed by normalization, distinct texts before vs after, and
    the extra duplicates found (raw-distinct − norm-distinct).

    The normalization grammar sticks to the Java-regex/RE2-compatible
    subset (the PII-module rule): explicit classes and {m,n} runs, no
    lookarounds — so the oracle reproduces the exact strings. Distinct
    counts key on xxhash64 of the (raw|normalized) text Spark-side
    with raw-string oracle grouping (the x11 collision-free
    convention). Shape: one projection + one global hash-agg (two
    count-distincts + two conditional sums) — map-side combinable,
    text never shuffles.
    """
    t = F.col(text)
    norm = F.trim(F.regexp_replace(F.lower(t), "[ ]{2,}", " "))
    per = df.select(
        t.alias("__raw"),
        norm.alias("__norm"),
        (norm != t).cast("int").alias("__changed"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__changed").cast("bigint").alias("n_changed"),
        F.countDistinct(F.xxhash64("__raw")).alias("distinct_raw"),
        F.countDistinct(F.xxhash64("__norm")).alias("distinct_norm"),
        (
            F.countDistinct(F.xxhash64("__raw"))
            - F.countDistinct(F.xxhash64("__norm"))
        ).cast("bigint").alias("extra_dups_found"),
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Dataset version diff — the audit row a pipeline records when a
    corpus snapshot is refreshed: how many documents were added,
    removed, changed (same id, different text), and unchanged between
    two versions. The ingest-side counterpart of retention/rotation
    (O26): rotation tells you what aged out, this tells you what a
    refresh actually did.

    One full-outer join keyed on the document id comparing xxhash64
    text fingerprints (bodies never shuffle — the x11 convention;
    raw-text comparison is the oracle form), then a single global
    hash-agg of four conditional counters.
    """
    o = old.select(
        F.col(key), F.xxhash64(F.col(text)).alias("__fo")
    )
    n = new.select(
        F.col(key), F.xxhash64(F.col(text)).alias("__fn")
    )
    j = o.join(n, key, "full_outer")
    return j.agg(
        F.sum(F.when(F.col("__fo").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_old"),
        F.sum(F.when(F.col("__fn").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(
            F.when(F.col("__fo").isNull() & F.col("__fn").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_added"),
        F.sum(
            F.when(F.col("__fo").isNotNull() & F.col("__fn").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_removed"),
        F.sum(
            F.when(
                F.col("__fo").isNotNull()
                & F.col("__fn").isNotNull()
                & (F.col("__fo") != F.col("__fn")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_changed"),
        F.sum(
            F.when(F.col("__fo") == F.col("__fn"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_unchanged"),
    )


def source_style_distance(
    df: DataFrame,
    n_buckets: int = 1024,
    text: str = "text",
    source: str = "source",
    hash_mode: str = "hash64",
) -> DataFrame:
    """Pairwise STYLE distance between corpus sources: total-variation
    distance between their hashed token distributions — the
    distributional complement of x59's shingle overlap (x59 finds
    sources that COPY each other; this finds sources that merely WRITE
    alike, which drives mixture weighting and dedup-threshold choices
    per feed pair).

    Tokens hash into ``n_buckets`` (the DSIR feature-space trick, same
    ``hash_mode`` convention: codegen xxhash64 by default, portable
    polynomial fingerprint for the oracle). Shape: Generate + ONE
    (source, bucket) hash-agg — the only corpus-sized shuffle, carrying
    counts, never text; per-source totals and the S² pair join run on
    the KB-sized bucket table. TV terms are DECIMAL-quantized before
    the cross-row sum. Output: S(S−1)/2 rows, 0 ≤ tv ≤ 1.
    """
    toks = df.select(
        F.col(source).alias("src"), F.explode(_tokens(text)).alias("tok")
    )
    if hash_mode == "poly":
        bucket = F.pmod(poly_fingerprint("tok"), F.lit(n_buckets))
    elif hash_mode == "hash64":
        bucket = F.pmod(F.xxhash64("tok"), F.lit(n_buckets))
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    cnt = (
        toks.select("src", bucket.alias("bucket"))
        .groupBy("src", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("src").agg(F.sum("c").alias("t"))
    withp = cnt.join(tot, "src").select(
        "src",
        "bucket",
        (F.col("c").cast("double") / F.col("t").cast("double")).alias("p"),
    )
    a = withp.select(
        F.col("src").alias("source_a"), "bucket", F.col("p").alias("pa")
    )
    b = withp.select(
        F.col("src").alias("source_b"), "bucket", F.col("p").alias("pb")
    )
    # the bucket equi-join yields only buckets BOTH sources populate;
    # one-sided buckets close algebraically (Σp = 1 per source):
    # TV = 0.5·(Σ_common |pa−pb| + (1 − Σ_common pa) + (1 − Σ_common pb))
    # — no outer-join bookkeeping, and the join never leaves the
    # KB-sized bucket tables
    pairs = a.join(b, "bucket").filter(F.col("source_a") < F.col("source_b"))
    term = F.abs(F.col("pa") - F.col("pb"))

    # round(·, 9) BEFORE the decimal cast: integer-ratio probabilities
    # land exactly on cast tie boundaries (the _bucket_means exact-half
    # rule), and 1e-9 keeps the per-term quantum three orders below the
    # round-6 output
    def q9(c):
        return F.round(c, 9).cast("decimal(18,9)")

    agg = pairs.groupBy("source_a", "source_b").agg(
        F.sum(q9(term)).cast("double").alias("sab"),
        F.sum(q9(F.col("pa"))).cast("double").alias("spa"),
        F.sum(q9(F.col("pb"))).cast("double").alias("spb"),
    )
    # pairs with NO common bucket (fully disjoint vocabularies) never
    # reach the equi-join: enumerate all S(S−1)/2 pairs from the tiny
    # source list and left-join the overlap sums, zero-filled — their
    # TV correctly closes to 1
    all_pairs = (
        tot.select(F.col("src").alias("source_a"))
        .crossJoin(tot.select(F.col("src").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    full = all_pairs.join(agg, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce("sab", F.lit(0.0)).alias("sab"),
        F.coalesce("spa", F.lit(0.0)).alias("spa"),
        F.coalesce("spb", F.lit(0.0)).alias("spb"),
    )
    # quantized Σp can exceed 1 by <= n_buckets·5e-7: clamp the
    # one-sided remainders at 0 (the _pearson convention)
    tv = F.lit(0.5) * (
        F.col("sab")
        + F.greatest(F.lit(1.0) - F.col("spa"), F.lit(0.0))
        + F.greatest(F.lit(1.0) - F.col("spb"), F.lit(0.0))
    )
    return full.select(
        "source_a",
        "source_b",
        F.round(tv, 6).alias("tv_distance"),
    ).orderBy("source_a", "source_b")


PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
PII_IDNUM_RE = "\\b\\d{3}-\\d{2}-\\d{4}\\b"


def pii_scan(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Per-document PII pattern counts (emails, phone-shaped numbers,
    SSN-shaped ids) and a has_pii flag — the redaction/filter gate a
    training pipeline runs before anything else. Pure scan-side
    regexp_count expressions: no shuffle at all (the output is
    one row per doc in scan order), no UDF, text never leaves the
    scan task.

    The three patterns use only syntax with identical semantics in
    Java regex (Spark) and RE2 (DuckDB oracle): ASCII classes,
    bounded repetition, word boundaries. Counts are
    non-overlapping-match counts in both engines.
    """
    t = F.col(text)
    n_email = F.regexp_count(t, F.lit(PII_EMAIL_RE))
    n_phone = F.regexp_count(t, F.lit(PII_PHONE_RE))
    n_idnum = F.regexp_count(t, F.lit(PII_IDNUM_RE))
    return df.select(
        key,
        n_email.cast("bigint").alias("n_email"),
        n_phone.cast("bigint").alias("n_phone"),
        n_idnum.cast("bigint").alias("n_idnum"),
        ((n_email + n_phone + n_idnum) > 0).cast("int").alias("has_pii"),
    ).orderBy(key)


def quality_percentile(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    source: str = "source",
    n_buckets: int = 1000,
) -> DataFrame:
    """Rank-based quality calibration: each document's x17 composite
    quality mapped to its PERCENT RANK within its source — the
    cross-source comparable score a mixture pipeline filters on when
    sources have incomparable raw-quality scales (one feed's 0.4 is
    another's 0.9).

    Exact percent_rank without a per-source global sort: quality is
    quantized to value-range buckets (it lives in [0, 1] rounded to
    1e-6, so ``floor(q * n_buckets)`` is order-aligned); a tiny
    (source x bucket) count table windows per source for exclusive
    running offsets (the x48 epoch-shuffle pattern, ordered by VALUE
    instead of hash); the min-rank of a doc = its bucket's offset +
    rank() within the bucket. Ties share the min rank, so
    ``(rank - 1) / (n - 1)`` equals SQL ``percent_rank()`` exactly —
    the oracle uses the plain window form. Parallelism is
    sources x buckets; per-bucket sort state is corpus/n_buckets.
    """
    q = F.round(quality_expr(text), 6)
    d = df.select(
        key, F.col(source), q.alias("quality")
    ).withColumn("__qb", F.floor(F.col("quality") * n_buckets).cast("int"))
    counts = d.groupBy(source, "__qb").agg(F.count(F.lit(1)).alias("__c"))
    w_off = (
        Window.partitionBy(source)
        .orderBy("__qb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_n = Window.partitionBy(source)
    offsets = counts.select(
        source,
        "__qb",
        F.coalesce(F.sum("__c").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__c").over(w_n).alias("__n"),
    )
    w_in = Window.partitionBy(source, "__qb").orderBy("quality")
    return (
        d.join(offsets, [source, "__qb"])
        .withColumn("__rk", F.col("__off") + F.rank().over(w_in))
        .select(
            key,
            source,
            "quality",
            F.round(
                F.when(F.col("__n") > 1,
                       (F.col("__rk") - 1) / (F.col("__n") - 1))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("quality_pct"),
        )
        .orderBy(key)
    )


def bigram_surprisal(
    df: DataFrame, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Bigram conditional-rarity scoring — the order-sensitive upgrade
    of x50's unigram proxy: each bigram's rarity is
    ``context_freq div bigram_freq`` (monotone in -log P(cur | prev),
    the conditional probability a KenLM-style perplexity filter
    estimates), and each document reports its bigram count, mean and
    max conditional rarity. High mean = token order unusual for the
    corpus (gibberish, shuffled text, boilerplate soup) even when
    every individual token is common — exactly the failure mode
    unigram rarity cannot see.

    Rarity is an exact BIGINT (integer division), so sums/max/mean
    are integer arithmetic plus ONE IEEE division (the x50
    determinism discipline). Bigrams travel as ``xxhash64`` keys from
    the moment they leave the token array — the raw strings never
    shuffle (the x11 discipline); the context key ``xxhash64(prev)``
    rides along so context totals re-aggregate from the bigram vocab
    without touching the corpus again. Plan: one bigram explode, a
    map-side-combinable vocab hash-agg, a vocab-derived context
    re-agg (unigram-sized, AQE-broadcast), one vocab equi-join and
    one per-doc hash-agg. Documents with < 2 tokens survive with
    zero counts and NULL scores.
    """
    toks = df.select(F.col(key), _tokens(text).alias("__t")).filter(
        F.size("__t") >= 2
    )
    bg = toks.select(
        F.col(key),
        F.explode(
            F.expr(
                "zip_with(slice(__t, 1, size(__t) - 1),"
                " slice(__t, 2, size(__t) - 1),"
                " (a, b) -> struct(xxhash64(a) AS hp, xxhash64(a, b) AS hb))"
            )
        ).alias("__g"),
    ).select(key, F.col("__g.hp").alias("__hp"), F.col("__g.hb").alias("__hb"))
    vocab = bg.groupBy("__hp", "__hb").agg(F.count(F.lit(1)).alias("__bf"))
    ctx = vocab.groupBy("__hp").agg(F.sum("__bf").cast("bigint").alias("__cf"))
    rar = (
        bg.join(vocab, ["__hp", "__hb"])
        .join(ctx, "__hp")
        .withColumn("__rar", F.expr("__cf div __bf"))
    )
    g = rar.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("__nb"),
        F.round(
            F.sum("__rar").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_cond_rarity"),
        F.max("__rar").cast("bigint").alias("max_cond_rarity"),
    )
    return (
        df.select(key)
        .join(g, key, "left")
        .select(
            key,
            F.coalesce(F.col("__nb"), F.lit(0)).alias("n_bigrams"),
            "mean_cond_rarity",
            "max_cond_rarity",
        )
        .orderBy(key)
    )


def vocab_concentration(
    df: DataFrame,
    top_ks: tuple = (1, 10, 100),
    text: str = "text",
    source: str = "source",
) -> DataFrame:
    """Per-source vocabulary concentration profile — the log-free
    Zipf-ness signal: vocabulary size, total tokens, hapax share
    (tokens seen once: high in diverse/noisy text, low in templated
    text), and the token-mass coverage of the top-1/10/100 most
    frequent tokens (a steep head = boilerplate/templated source, a
    flat head = diverse prose). A log-log slope fit would say the
    same thing through ln(), which the house rules ban from
    oracle-gated outputs (libm ulp drift); coverage fractions are
    rational BIGINT divisions rounded at 6 — hash-exact.

    Shape at 100 TB: one explode + hash-agg to the (source, token)
    frequency table, then ONE window (rank by count) over that
    VOCABULARY-cardinality table per source — bounded by distinct
    tokens, never corpus volume — and a final per-source hash-agg.
    Text leaves the executors only as token counts. Rank ties break
    on the token string (the registry determinism contract).
    """
    tf = (
        df.select(F.col(source), F.explode(_tokens(text)).alias("token"))
        .groupBy(source, "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.partitionBy(source).orderBy(
        F.col("c").desc(), F.col("token")
    )
    ranked = tf.withColumn("rk", F.row_number().over(w))
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("c").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax"),
    ]
    for k in top_ks:
        aggs.append(
            F.sum(F.when(F.col("rk") <= k, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias(f"__top{k}")
        )
    out = ranked.groupBy(source).agg(*aggs)
    sel = [
        source,
        "vocab",
        "total_tokens",
        "hapax",
        F.round(F.col("hapax") / F.col("vocab"), 6).alias("hapax_share"),
    ]
    for k in top_ks:
        sel.append(
            F.round(
                F.col(f"__top{k}") / F.col("total_tokens"), 6
            ).alias(f"top{k}_cov")
        )
    return out.select(*sel).orderBy(source)
