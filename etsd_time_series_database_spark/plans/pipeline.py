"""Training-data pipeline catalog queries (SURVEY.md §2 extension set):
deduplication, similarity search, text analysis, multimodal plumbing —
the operations a 100 TB training-data pipeline runs, expressed
Spark-first over the ``documents`` and ``embeddings`` tables.

Oracle portability notes:
  * shingle/minhash/fingerprint hashing uses a portable polynomial /
    universal hash — engine builtins (xxhash64) are the scale path but
    can't be verified cross-engine (operators default to hash64;
    catalog queries opt into the portable mode);
  * embedding math folds sequentially on both engines (Spark
    F.aggregate == DuckDB list_reduce), so cosines match bit-for-bit
    with no rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etsd_time_series_database_spark.operators.dedup import (
    MINHASH_P,
    MINHASH_PARAMS,
    SIMHASH_BITS,
    decontaminate,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from etsd_time_series_database_spark.operators.multimodal import (
    extract_features,
    to_blob_table,
)
from etsd_time_series_database_spark.operators.packing import (
    domain_mix,
    pack_sequences,
)
from etsd_time_series_database_spark.operators.similarity import (
    cosine_pairs_bucketed,
    cosine_topk,
    ivf_topk,
    kmeans_cells,
    normalize_quantize,
)
from etsd_time_series_database_spark.operators.sampling import (
    hash_sample,
    shard_balance,
    stratified_sample,
)
from etsd_time_series_database_spark.operators.textstats import (
    PII_EMAIL_RE,
    PII_ID_RE,
    PII_URL_RE,
    STOPWORDS,
    TOKEN_RE,
    corpus_stats,
    fingerprint,
    inverted_index,
    language_id,
    pii_scrub,
    quality_score,
    repetition_profile,
    tfidf_topterms,
    token_counts,
    token_topk,
)
from etsd_time_series_database_spark.plans.registry import register
from etsd_time_series_database_spark.sources.store import load_table

# ------------------------------- shared SQL fragments (DuckDB oracle)

_TOKS = "list_filter(string_split(text, ' '), x -> x != '')"

_SHINGLES = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
    "ELSE [] END"
)

# term-weighting / repetition-gate parameters, shared by x26/x27 and
# the x10 clean-corpus composite (defined here because registrations
# interpolate them at import time)
TFIDF_K = 3
TFIDF_MIN_DF = 2
REP_MAX_DUP3 = 0.15
REP_MAX_TOP = 0.20


def _duck_cos(a: str, b: str) -> str:
    """Sequential-fold cosine in DuckDB — bit-identical to Spark's
    zip_with/aggregate expression in functions.exprs."""
    dot = (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q)"
    )

    def norm(v: str) -> str:
        return (
            f"sqrt(list_reduce(list_transform({v}, "
            f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))"
        )

    return f"{dot} / ({norm(a)} * {norm(b)})"


_DUCK_POLY_FP = (
    "list_reduce(list_transform(range(1, length({col}) + 1), "
    "i -> CAST(ascii(substr({col}, i, 1)) AS BIGINT)), "
    "(a, b) -> (a * 31 + b) % 1000000007)"
)

# ------------------------------------------------------ deduplication


@register(
    "x11_dedup_exact",
    "dedup",
    """
    SELECT min(doc_id) AS canonical_id, CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY text ORDER BY canonical_id
    """,
    doc="Exact dedup by full-text equality: the groupBy keys on "
    "xxhash64(text) so document bodies never shuffle (raw-text form "
    "retained as the equivalence oracle).",
)
def p01(spark, sf_dir):
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "x12_ngram_jaccard",
    "dedup",
    f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < 150
    ),
    sh AS (
      SELECT DISTINCT doc_id, shingle
      FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM tok)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.3
    ORDER BY doc_a, doc_b
    """,
    doc="All-pairs word-3-gram Jaccard on a bounded subset (the "
    "verification path; the scale path feeds LSH candidates into the "
    "same jaccard expression).",
)
def p02(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return ngram_jaccard_pairs(docs, threshold=0.3)


def _minhash_bands_ctes() -> str:
    """The shared DuckDB CTE chain that reproduces the MinHash band
    table (tok -> shingles -> universal-hash signatures -> 2-row
    bands) — the oracle-side twin of operators.dedup.minhash_band_table
    in 'poly' mode, reused by every banding oracle (x06 candidates,
    x82 band-load profile)."""
    hp_rows = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_PARAMS))
    sid = _DUCK_POLY_FP.format(col="sh.shingle")
    return f"""tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle
      FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM tok)
    ),
    hp(j, a, b) AS (VALUES {hp_rows}),
    mh AS (
      SELECT sh.doc_id, hp.j, MIN((hp.a * ({sid}) + hp.b) % {MINHASH_P}) AS h
      FROM sh CROSS JOIN hp
      GROUP BY sh.doc_id, hp.j
    ),
    bands AS (
      SELECT doc_id, j // 2 AS band,
             string_agg(CAST(h AS VARCHAR), ',' ORDER BY j) AS sig
      FROM mh GROUP BY doc_id, band
    )"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_bands_ctes()}
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared_bands
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id ORDER BY doc_a, doc_b
    """


@register(
    "x06_minhash_lsh",
    "dedup",
    _minhash_oracle(),
    doc="MinHash (8 universal hashes over 3-gram shingles) + LSH banding "
    "(4 bands x 2 rows): candidate near-dup pairs from bucket "
    "collisions only — never an n^2 comparison. Portable dict-id mode "
    "for the oracle; xxhash64 mode for scale.",
)
def p03(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(docs, rows_per_band=2, hash_mode="poly")


def _simhash_oracle() -> str:
    tok_fp = _DUCK_POLY_FP.format(col="tok")
    votes = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    hashed AS (SELECT doc_id, {tok_fp} AS h FROM tok),
    votes AS (
      SELECT doc_id,
             {votes}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({sig} AS BIGINT) AS simhash
    FROM votes ORDER BY doc_id
    """


@register(
    "x13_simhash",
    "dedup",
    _simhash_oracle(),
    doc="30-bit SimHash signature per document (bit-majority over "
    "portable token hashes); near-dups then cluster by hamming "
    "distance on the signature.",
)
def p04(spark, sf_dir):
    return simhash(load_table(spark, sf_dir, "documents"))

# -------------------------------------------------- similarity search


@register(
    "x14_ann_cosine_topk",
    "similarity",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, {_duck_cos("e.embedding", "q.qv")} AS cosine
    FROM embeddings e, q WHERE e.vec_id != 0
    ORDER BY cosine DESC, vec_id LIMIT 10
    """,
    doc="Brute-force exact cosine top-k (baseline ANN path): codegen'd "
    "fold + TakeOrderedAndProject, no global sort.",
    headline=True,
)
def p05(spark, sf_dir):
    return cosine_topk(load_table(spark, sf_dir, "embeddings"), query_id=0, k=10)


@register(
    "x15_ivf_topk",
    "similarity",
    f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
      WHERE vec_id BETWEEN 1 AND 8
    ),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             {_duck_cos("e.embedding", "c.cv")} AS cos
      FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, cent_id) AS rn
            FROM scored)
      WHERE rn = 1
    ),
    qcell AS (
      SELECT cent_id AS qc, embedding AS qv FROM assigned WHERE vec_id = 0
    )
    SELECT a.vec_id, {_duck_cos("a.embedding", "qcell.qv")} AS cosine
    FROM assigned a, qcell
    WHERE a.cent_id = qcell.qc AND a.vec_id != 0
    ORDER BY cosine DESC, vec_id LIMIT 5
    """,
    doc="IVF-bucketed approximate top-k: assign to nearest of 8 seed "
    "centroids (broadcast), probe only the query's cell — at scale the "
    "cell id is a partition column and the probe prunes to one cell.",
)
def p06(spark, sf_dir):
    return ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        query_id=0,
        centroid_ids=list(range(1, 9)),
        k=5,
    )


@register(
    "x07_embedding_near_dup",
    "dedup",
    f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
      WHERE vec_id BETWEEN 1 AND 8
    ),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             {_duck_cos("e.embedding", "c.cv")} AS cos
      FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 150
    ),
    cells AS (
      SELECT vec_id, embedding, cent_id
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, cent_id) AS rn
            FROM scored)
      WHERE rn <= 2
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM cells a JOIN cells b
        ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           {_duck_cos("a.embedding", "b.embedding")} AS cosine
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.id_a
    JOIN embeddings b ON b.vec_id = c.id_b
    WHERE {_duck_cos("a.embedding", "b.embedding")} >= 0.35
    ORDER BY id_a, id_b
    """,
    doc="IVF-bucketed embedding near-dup (cosine >= 0.35): multi-probe "
    "cell assignment (2 nearest of 8 centroids, broadcast) -> within-"
    "cell equi-join candidates -> exact cosine filter. O(sum |cell|^2) "
    "work, no CartesianProduct; recall tuned by probes, cells sized "
    "with the corpus at scale.",
)
def p07(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    return cosine_pairs_bucketed(
        emb, threshold=0.35, centroid_ids=list(range(1, 9)), probes=2
    )

# ------------------------------------------------------ text analysis


@register(
    "x16_language_id",
    "text",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(list_filter(toks, x -> list_contains({list(STOPWORDS)!r}, x)))
                AS INTEGER) AS n_stopwords,
           len(list_filter(toks, x -> list_contains({list(STOPWORDS)!r}, x)))
             / len(toks) AS stopword_ratio,
           CASE WHEN len(list_filter(toks, x -> list_contains({list(STOPWORDS)!r}, x)))
                     / len(toks) >= 0.05
                THEN 'en' ELSE 'und' END AS pred_lang
    FROM t ORDER BY doc_id
    """,
    doc="Stopword-ratio language heuristic (n-gram LM stand-in).",
)
def p08(spark, sf_dir):
    return language_id(load_table(spark, sf_dir, "documents"))


@register(
    "x17_quality_score",
    "text",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           length(replace(text, ' ', '')) / len(toks) AS avg_token_len,
           len(list_distinct(toks)) / len(toks) AS distinct_ratio,
           0.5 * (len(list_distinct(toks)) / len(toks))
             + 0.5 * least(1.0, len(toks) / 100.0) AS quality
    FROM t ORDER BY doc_id
    """,
    doc="Heuristic document quality score (length / distinctness).",
)
def p09(spark, sf_dir):
    return quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "x18_token_count",
    "text",
    f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS INTEGER) AS n_re_tokens
    FROM documents ORDER BY doc_id
    """,
    doc="Whitespace + regex (BPE-ish word unit) token counting.",
)
def p10(spark, sf_dir):
    return token_counts(load_table(spark, sf_dir, "documents"))


@register(
    "x19_fingerprint",
    "text",
    f"""
    SELECT doc_id, {_DUCK_POLY_FP.format(col="text")} AS fp
    FROM documents ORDER BY doc_id
    """,
    doc="Portable rolling-hash document fingerprint (dedup key that "
    "matches across engines, unlike builtin hash()).",
)
def p11(spark, sf_dir):
    return fingerprint(load_table(spark, sf_dir, "documents"))

# --------------------------------------------------------- multimodal


@register(
    "x20_multimodal_features",
    "multimodal",
    f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           {_DUCK_POLY_FP.format(col="text")} AS byte_fp
    FROM documents ORDER BY doc_id
    """,
    doc="Binary-column plumbing: text->blob table, Arrow-batched "
    "mapInPandas feature extraction (deterministic stand-in for "
    "image/audio decode, which is stubbed — libs not in container).",
)
def p12(spark, sf_dir):
    blobs = to_blob_table(load_table(spark, sf_dir, "documents"))
    return extract_features(blobs).orderBy("doc_id")


@register(
    "x21_frame_sample",
    "multimodal",
    f"""
    WITH fr AS (
      SELECT doc_id,
             unnest(list_filter(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT)),
                                i -> i % 2 = 0)) AS frame_idx,
             text
      FROM documents
    )
    SELECT doc_id,
           CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(length(substr(text, frame_idx * 64 + 1, 64)) AS BIGINT) AS frame_bytes,
           {_DUCK_POLY_FP.format(col="substr(text, frame_idx * 64 + 1, 64)")} AS frame_fp
    FROM fr ORDER BY doc_id, frame_idx
    """,
    doc="Video-style frame sampling plumbing: every-2nd 64-byte frame "
    "per blob via one-to-many mapInPandas (real decoder is stubbed; "
    "fan-out/batching/schema contract is real).",
)
def p13(spark, sf_dir):
    from etsd_time_series_database_spark.operators.multimodal import sample_frames

    blobs = to_blob_table(load_table(spark, sf_dir, "documents"))
    return sample_frames(blobs, every_n=2).orderBy("doc_id", "frame_idx")


@register(
    "x09_near_dup_clusters",
    "dedup",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    e(src, dst) AS (
      SELECT doc_a, doc_b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id
    )
    SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
    FROM reach GROUP BY id ORDER BY doc_id
    """,
    doc="Near-duplicate clustering: connected components over the "
    "MinHash-LSH candidate pairs via iterative min-label propagation "
    "(the Spark shape for iterative graph algorithms); oracle = "
    "recursive-CTE transitive closure.",
)
def p14(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import cluster_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, rows_per_band=2, hash_mode="poly")
    return cluster_pairs(pairs)


@register(
    "x22_chunk_documents",
    "text",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    st AS (
      SELECT doc_id, toks,
             unnest(list_filter(range(0, len(toks), 24),
                                s -> s = 0 OR s + 8 < len(toks))) AS start
      FROM tok WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(start / 24 AS INTEGER) AS chunk_idx,
           CAST(len(list_slice(toks, start + 1, start + 32)) AS INTEGER) AS n_chunk_tokens,
           array_to_string(list_slice(toks, start + 1, start + 32), ' ') AS chunk_text
    FROM st ORDER BY doc_id, chunk_idx
    """,
    doc="Corpus chunking: overlapping 32-token windows with stride 24 "
    "(overlap 8) via tokenize -> sequence -> slice -> posexplode; pure "
    "JVM, zero shuffle — chunks at scan speed.",
    headline=True,
)
def p15(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


def _clean_gate(docs):
    """Fused clean-corpus gate (semantics identical to chaining
    x11+x16+x17+x27, hash-verified): exact-dedup canonical selection,
    then every gate feature is computed from EXPLODED tokens/3-grams
    so each heavy array expression is consumed exactly once by a
    Generate — higher-order array lambdas are interpreted
    (CodegenFallback), and keeping them as per-row projection
    expressions lets filter pushdown + projection collapse re-evaluate
    the tokenizer many times per row (the chained per-operator x10
    form measured 10.4 s at sf0.1; this form ~1.5 s). Token counts,
    distinct counts and stopword occurrences come from ONE
    (doc, token) hash-agg that the TF-IDF metadata branch reuses;
    duplicate-3-gram fractions from one exploded-gram agg. All
    shuffles are map-side-combinable and bounded by token counts.
    Returns (gated keep set with n_tokens/quality, the shared token
    counts, the deduped corpus)."""
    from etsd_time_series_database_spark.operators.dedup import shingle_expr
    from etsd_time_series_database_spark.operators.textstats import _tokens

    canon = exact_dedup(docs).select(F.col("canonical_id").alias("doc_id"))
    kept = docs.join(canon, "doc_id", "left_semi")
    t = kept.select("doc_id", _tokens("text").alias("__toks"))
    cnt = (
        t.select("doc_id", F.explode("__toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    stopset = list(STOPWORDS)
    tokstats = cnt.groupBy("doc_id").agg(
        F.sum("__c").cast("int").alias("n_tokens"),
        F.count(F.lit(1)).alias("__ndis"),
        F.coalesce(
            F.sum(F.when(F.col("token").isin(stopset), F.col("__c"))),
            F.lit(0),
        ).alias("__nstop"),
        F.max("__c").alias("__top"),
    )
    grams = (
        t.select("doc_id", F.explode(shingle_expr("__toks", 3)).alias("__g"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("__ng"),
            F.count_distinct(F.col("__g")).alias("__ngd"),
        )
    )
    n_tok = F.col("n_tokens")
    gated = (
        tokstats.join(grams, "doc_id", "left")
        .withColumn(
            "quality",
            F.lit(0.5) * F.try_divide(F.col("__ndis"), n_tok)
            + F.lit(0.5) * F.least(F.lit(1.0), n_tok / F.lit(100.0)),
        )
        .filter(
            (
                F.coalesce(
                    F.try_divide(F.col("__ng") - F.col("__ngd"), F.col("__ng")),
                    F.lit(0.0),
                )
                <= F.lit(REP_MAX_DUP3)
            )
            & (
                F.coalesce(
                    F.try_divide(F.col("__top"), n_tok), F.lit(0.0)
                )
                <= F.lit(REP_MAX_TOP)
            )
            & (F.try_divide(F.col("__nstop"), n_tok) >= 0.05)
            & (F.col("quality") >= 0.5)
        )
        .select("doc_id", "n_tokens", "quality")
    )
    return gated, cnt, kept


@register(
    "x10_clean_corpus",
    "text",
    f"""
    WITH canon AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    ),
    t AS (
      SELECT d.doc_id, d.text, {_TOKS.replace('text', 'd.text')} AS toks
      FROM documents d JOIN canon USING (doc_id)
    ),
    feats AS (
      SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             len(list_filter(toks, x -> list_contains({list(STOPWORDS)!r}, x)))
               / len(toks) AS stop_ratio,
             0.5 * (len(list_distinct(toks)) / len(toks))
               + 0.5 * least(1.0, len(toks) / 100.0) AS quality
      FROM t WHERE len(toks) > 0
    ),
    repfrac AS (
      SELECT doc_id,
             CASE WHEN len(g3) > 0 THEN
               CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
             END AS dup_3gram_frac
      FROM (SELECT doc_id, {_SHINGLES} AS g3 FROM t)
    ),
    cnt AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(toks) AS token FROM t)
      GROUP BY doc_id, token
    ),
    top AS (
      SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT)
               AS top_token_frac
      FROM cnt GROUP BY doc_id
    ),
    repkeep AS (
      SELECT r.doc_id
      FROM repfrac r LEFT JOIN top USING (doc_id)
      WHERE coalesce(dup_3gram_frac, 0) <= {REP_MAX_DUP3}
        AND coalesce(top_token_frac, 0) <= {REP_MAX_TOP}
    ),
    dfq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS doc_freq
      FROM (SELECT DISTINCT doc_id, token FROM cnt)
      GROUP BY token HAVING count(*) >= {TFIDF_MIN_DF}
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM t),
    rk AS (
      SELECT doc_id, token,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY CAST(c * nd AS DOUBLE) / doc_freq DESC, token
             ) AS rk
      FROM cnt JOIN dfq USING (token) CROSS JOIN nn
    ),
    terms AS (
      SELECT doc_id, string_agg(token, ',' ORDER BY rk) AS top_terms
      FROM rk WHERE rk <= {TFIDF_K} GROUP BY doc_id
    )
    SELECT f.doc_id, n_tokens, quality,
           coalesce(tm.top_terms, '') AS top_terms
    FROM feats f
    JOIN repkeep USING (doc_id)
    LEFT JOIN terms tm USING (doc_id)
    WHERE stop_ratio >= 0.05 AND quality >= 0.5
    ORDER BY f.doc_id
    """,
    doc="Clean-corpus composite (Gopher-style filter chain): exact-dup "
    "canonical selection + language gate (stopword ratio) + quality "
    "gate + within-document repetition keep-gate (x27 thresholds), "
    "with per-doc TF-IDF top-terms (x26, over the deduped corpus) "
    "attached as metadata.",
)
def p16(spark, sf_dir):
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    gated, cnt, kept = _clean_gate(docs)
    # TF-IDF over the DEDUPED corpus (doc_freq / N change once exact
    # copies collapse), top-k tokens flattened to one metadata string;
    # reuses the gate's (doc, token) counts
    dfreq = (
        cnt.groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= F.lit(TFIDF_MIN_DF))
    )
    n_docs = kept.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        cnt.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("__c") * F.col("__n")).cast("double") / F.col("doc_freq"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    terms = (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= TFIDF_K)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "token"))),
                    lambda s: s["token"],
                ),
                ",",
            ).alias("top_terms")
        )
    )
    return (
        gated.join(terms, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "quality",
            F.coalesce("top_terms", F.lit("")).alias("top_terms"),
        )
        .orderBy("doc_id")
    )


# -------------------------------------------- contamination / scrub / SQ8

TEST_SOURCES = ("src0", "src1")
DECON_N = 5


def _duck_shingles(n: int) -> str:
    parts = " || ' ' || ".join(f"toks[i+{k}]" for k in range(n))
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"list_transform(range(1, len(toks) - {n - 2}), i -> {parts}) "
        f"ELSE [] END"
    )


@register(
    "x08_decontaminate",
    "contamination",
    f"""
    WITH tok AS (
      SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, source, shingle
      FROM (SELECT doc_id, source, unnest({_duck_shingles(DECON_N)}) AS shingle
            FROM tok)
    ),
    te AS (SELECT doc_id AS test_id, shingle FROM sh
           WHERE source IN {TEST_SOURCES}),
    tr AS (SELECT doc_id AS train_id, shingle FROM sh
           WHERE source NOT IN {TEST_SOURCES})
    SELECT train_id, test_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tr JOIN te USING (shingle)
    GROUP BY train_id, test_id
    HAVING count(*) >= 1
    ORDER BY train_id, test_id
    """,
    doc="Train/test contamination: shared 5-gram shingles between the "
    "held-out sources and the training corpus; the test side "
    "broadcasts, so the train corpus never shuffles.",
)
def p17(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    test = docs.filter(F.col("source").isin(*TEST_SOURCES))
    train = docs.filter(~F.col("source").isin(*TEST_SOURCES))
    return decontaminate(train, test, n=DECON_N, min_overlap=1, hash_mode="raw")


_DUCK_SCRUB = (
    f"regexp_replace(regexp_replace(regexp_replace(text, "
    f"'{PII_EMAIL_RE}', '<EMAIL>', 'g'), "
    f"'{PII_URL_RE}', '<URL>', 'g'), "
    f"'{PII_ID_RE}', '<ID>', 'g')"
)


@register(
    "x23_pii_scrub",
    "scrub",
    f"""
    WITH s AS (SELECT doc_id, text, {_DUCK_SCRUB} AS sc FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_URL_RE}')) AS INT) AS n_urls,
           CAST(len(regexp_extract_all(text, '{PII_ID_RE}')) AS INT) AS n_ids,
           {_DUCK_POLY_FP.format(col="sc")} AS clean_fp
    FROM s ORDER BY doc_id
    """,
    doc="PII redaction (emails/URLs/SSN-style ids) with per-doc counts "
    "and a post-scrub dedup fingerprint; pure JVM regexp — zero "
    "shuffle.",
)
def p18(spark, sf_dir):
    return pii_scrub(load_table(spark, sf_dir, "documents"))


@register(
    "x01_normalize_quantize",
    "similarity",
    """
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_reduce(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                  (a, b) -> a + b)) AS norm
      FROM embeddings
    )
    SELECT vec_id, norm,
           array_to_string(
             CASE WHEN norm > 0 THEN
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) / norm * 127.0 + 0.5) AS INT))
             ELSE list_transform(embedding, x -> 0) END, ',') AS q8
    FROM n ORDER BY vec_id
    """,
    doc="SQ8 vector preprocessing: L2-normalize + int8 scalar "
    "quantization (IVF-SQ8 style, 4x byte reduction); floor(x+0.5) "
    "rounding is engine-portable where round() is not. The catalog "
    "entry exports q8 as a comma-joined string (scalar columns only "
    "in catalog outputs — see tests/test_catalog_schema.py).",
)
def p19(spark, sf_dir):
    out = normalize_quantize(load_table(spark, sf_dir, "embeddings"))
    return out.withColumn(
        "q8",
        F.array_join(F.transform("q8", lambda x: x.cast("string")), ","),
    )


@register(
    "x24_corpus_stats",
    "profile",
    f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
           CAST(sum(CAST(CAST(length(text) AS DOUBLE) AS DECIMAL(18,6)))
                AS DOUBLE) / count(length(text)) AS avg_chars,
           CAST(max(length(text)) AS BIGINT) AS max_chars
    FROM documents GROUP BY source ORDER BY source
    """,
    doc="Per-source corpus profile (doc/lang/token/char totals) — the "
    "summary read before choosing sampling weights; one hash-agg.",
)
def p20(spark, sf_dir):
    return corpus_stats(load_table(spark, sf_dir, "documents"))


# ------------------------------------- sampling / sharding / indexing

# Portable LCG row hash shared by the sampling oracles (see
# operators/sampling.py key_hash): exact BIGINT modular arithmetic.
# The key is reduced mod 2^31 before the multiply so the intermediate
# never overflows INT64 for any BIGINT doc_id (same form as key_hash).
# The inner residue mirrors Spark's pmod — ((x % m) + m) % m — so a
# NEGATIVE doc_id hashes identically in both engines (DuckDB's % keeps
# the dividend sign); every later residue then sees a non-negative
# operand and plain % is safe.
_DUCK_H = (
    "(((((doc_id % 2147483648) + 2147483648) % 2147483648)"
    " * 1103515245 + 12345) % 2147483648)"
)
SAMPLE_PERMILLE = 200
STRATA_CAP = 10
N_SHARDS = 16


@register(
    "x03_hash_sample",
    "sampling",
    f"""
    SELECT doc_id, source, lang FROM documents
    WHERE {_DUCK_H} % 1000 < {SAMPLE_PERMILLE}
    ORDER BY doc_id
    """,
    doc="Deterministic ~20% corpus sample by key hash: membership is a "
    "pure function of doc_id, so re-runs and resumes pick the same "
    "subset; zero shuffle (scan-side filter).",
)
def p21(spark, sf_dir):
    return (
        hash_sample(load_table(spark, sf_dir, "documents"), SAMPLE_PERMILLE)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


@register(
    "x04_stratified_sample",
    "sampling",
    f"""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_DUCK_H}, doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, source FROM r WHERE rk <= {STRATA_CAP} ORDER BY doc_id
    """,
    doc="Per-source cap via rank-by-hash (rendezvous sampling): keeps "
    "the N smallest-hash docs per stratum, deterministic across runs "
    "and engines; one shuffle keyed by the stratum.",
)
def p22(spark, sf_dir):
    return (
        stratified_sample(load_table(spark, sf_dir, "documents"), STRATA_CAP)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@register(
    "x05_shard_balance",
    "sampling",
    f"""
    WITH s AS (
      SELECT CAST({_DUCK_H} % {N_SHARDS} AS INT) AS shard, doc_id, text
      FROM documents
    )
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
           min(doc_id) AS min_key, max(doc_id) AS max_key
    FROM s GROUP BY shard ORDER BY shard
    """,
    doc="Balanced shard split for data-parallel loaders: shard = "
    "key-hash mod N (zero-shuffle assignment) plus the per-shard "
    "balance report (one map-side-combinable hash-agg).",
)
def p23(spark, sf_dir):
    return shard_balance(load_table(spark, sf_dir, "documents"), N_SHARDS)


@register(
    "x25_token_topk",
    "vocab",
    f"""
    WITH tf AS (
      SELECT token, CAST(count(*) AS BIGINT) AS term_freq
      FROM (SELECT unnest({_TOKS}) AS token FROM documents)
      GROUP BY token
    ),
    dfq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS doc_freq
      FROM (SELECT DISTINCT doc_id, token
            FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents))
      GROUP BY token
    )
    SELECT token, term_freq, doc_freq
    FROM tf JOIN dfq USING (token)
    ORDER BY term_freq DESC, token LIMIT 50
    """,
    doc="Corpus heavy hitters (vocabulary induction): top-50 tokens by "
    "term frequency with document frequency; map-side-combinable "
    "hash-aggs + TakeOrderedAndProject — no global sort.",
)
def p24(spark, sf_dir):
    return token_topk(load_table(spark, sf_dir, "documents"), k=50)


IDX_N = 2
IDX_MIN_DF = 2
IDX_MAX_DF = 150


@register(
    "x02_inverted_index",
    "retrieval",
    f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    pairs AS (
      SELECT DISTINCT doc_id, token FROM
        (SELECT doc_id, unnest({_duck_shingles(IDX_N)}) AS token FROM tok)
    )
    SELECT token, CAST(count(*) AS BIGINT) AS doc_freq,
           array_to_string(list_sort(list(doc_id)), ',') AS postings
    FROM pairs GROUP BY token
    HAVING count(*) BETWEEN {IDX_MIN_DF} AND {IDX_MAX_DF}
    ORDER BY token
    """,
    doc="Bigram-phrase inverted index for retrieval: term -> sorted "
    "posting list, df-bounded [2,150] so no posting array can blow an "
    "executor; one shuffle keyed by term. The catalog entry exports "
    "postings as a comma-joined string (scalar columns only in "
    "catalog outputs — see tests/test_catalog_schema.py).",
)
def p25(spark, sf_dir):
    out = inverted_index(
        load_table(spark, sf_dir, "documents"),
        min_df=IDX_MIN_DF,
        max_df=IDX_MAX_DF,
        n=IDX_N,
    )
    return out.withColumn(
        "postings",
        F.array_join(F.transform("postings", lambda x: x.cast("string")), ","),
    )


# ------------------------------------------- term weighting / quality
# (TFIDF_K / TFIDF_MIN_DF / REP_MAX_DUP3 / REP_MAX_TOP live in the
# shared-fragments section above — x10 interpolates them too)


@register(
    "x26_tfidf_topterms",
    "retrieval",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    dfq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS doc_freq
      FROM (SELECT DISTINCT doc_id, token FROM tok)
      GROUP BY token HAVING count(*) >= {TFIDF_MIN_DF}
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
    s AS (
      SELECT doc_id, token, tf, doc_freq,
             CAST(tf * nd AS DOUBLE) / doc_freq AS score
      FROM tf JOIN dfq USING (token) CROSS JOIN n
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rk
      FROM s
    )
    SELECT doc_id, CAST(rk AS INT) AS rk, token, tf, doc_freq, score
    FROM r WHERE rk <= {TFIDF_K} ORDER BY doc_id, rk
    """,
    doc="Per-document top-3 characteristic terms by TF-IDF with the "
    "log-free rational weight tf*N/df (single IEEE division of exact "
    "BIGINTs — bit-portable where ln() drifts by ulps). Two "
    "map-side-combinable hash-aggs + vocabulary join (AQE-broadcast) "
    "+ per-doc top-k window; no global sort.",
)
def p26(spark, sf_dir):
    return tfidf_topterms(
        load_table(spark, sf_dir, "documents"), k=TFIDF_K, min_df=TFIDF_MIN_DF
    )


_G2 = (
    "CASE WHEN len(toks) >= 2 THEN "
    "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) "
    "ELSE [] END"
)


@register(
    "x27_repetition_profile",
    "quality",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
      SELECT doc_id, len(toks) AS n_tokens,
             {_G2} AS g2, {_SHINGLES} AS g3
      FROM tok
    ),
    base AS (
      SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
             CASE WHEN len(g2) > 0 THEN
               CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
             END AS dup_2gram_frac,
             CASE WHEN len(g3) > 0 THEN
               CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
             END AS dup_3gram_frac
      FROM g
    ),
    cnt AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(toks) AS token FROM tok)
      GROUP BY doc_id, token
    ),
    top AS (
      SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT)
               AS top_token_frac
      FROM cnt GROUP BY doc_id
    )
    SELECT b.doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac,
           top_token_frac,
           CAST(coalesce(dup_3gram_frac, 0) <= {REP_MAX_DUP3}
                AND coalesce(top_token_frac, 0) <= {REP_MAX_TOP} AS INT)
             AS keep
    FROM base b LEFT JOIN top USING (doc_id) ORDER BY b.doc_id
    """,
    doc="Gopher-style within-document repetition quality signals: "
    "duplicate 2/3-gram fractions (pure array expressions, scan "
    "speed), most-frequent-token dominance (bounded hash-agg), and "
    "the keep flag applying the filter thresholds.",
)
def p27(spark, sf_dir):
    out = repetition_profile(
        load_table(spark, sf_dir, "documents"),
        max_dup_3gram=REP_MAX_DUP3,
        max_top_token=REP_MAX_TOP,
    )
    return out.withColumn("keep", F.col("keep").cast("int"))


# --------------------------------------------- training-batch assembly

PACK_CTX = 128
PACK_SHARDS = 8


@register(
    "x28_pack_sequences",
    "packing",
    f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(doc_id % {PACK_SHARDS} AS INT) AS shard,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    p AS (
      SELECT shard, doc_id, n_tokens,
             CAST(floor(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / {PACK_CTX}) AS BIGINT) AS pack_idx
      FROM tok
    )
    SELECT shard, pack_idx, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM p GROUP BY shard, pack_idx ORDER BY shard, pack_idx
    """,
    doc="Sequence packing for training batches: concat-then-split "
    "assignment of whole documents to fixed-token-budget packs via a "
    "per-shard running token count (pmod(doc_id) sharding keeps the "
    "window sort parallel at corpus scale).",
    headline=True,
)
def p28(spark, sf_dir):
    return pack_sequences(
        load_table(spark, sf_dir, "documents"),
        ctx_tokens=PACK_CTX,
        n_shards=PACK_SHARDS,
    )


@register(
    "x29_domain_mix",
    "packing",
    f"""
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_TOKS})) AS BIGINT) AS src_tokens
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT CAST(sum(src_tokens) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS nsrc
      FROM per
    )
    SELECT source, n_docs, src_tokens,
           CAST(src_tokens AS DOUBLE) / total AS token_share,
           CAST(total AS DOUBLE) / nsrc / src_tokens AS weight
    FROM per CROSS JOIN t ORDER BY source
    """,
    doc="Domain mixture accounting: per-source token share plus the "
    "uniform-target resampling weight (static domain reweighting). "
    "One bounded hash-agg + a one-row totals broadcast; weights are "
    "sequential IEEE divisions of exact BIGINTs.",
)
def p29(spark, sf_dir):
    return domain_mix(load_table(spark, sf_dir, "documents"))


# ------------------------------------------------- k-means refinement

KM_SEEDS = [0, 100, 200, 300]
KM_ITER = 2


def _kmeans_oracle(seed_ids: list[int], n_iter: int) -> str:
    """Unrolled-CTE Lloyd iteration: assignment = row_number over the
    same sequential-fold cosine Spark computes; update = exact
    DECIMAL(38,12) mean cast to REAL (matching kmeans_refine's
    float32 centroid storage). One closing assignment yields cell
    sizes."""
    cos = _duck_cos("d.v", "c.cv")
    ids = ", ".join(str(i) for i in seed_ids)
    sql = f"""
    WITH d AS (SELECT vec_id, embedding AS v FROM embeddings),
    c0 AS (
      SELECT vec_id AS cent_id, embedding AS cv
      FROM embeddings WHERE vec_id IN ({ids})
    )"""
    for i in range(1, n_iter + 1):
        sql += f""",
    s{i} AS (
      SELECT d.vec_id, d.v, c.cent_id, {cos} AS cos
      FROM d CROSS JOIN c{i - 1} c
    ),
    a{i} AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rk
        FROM s{i}
      ) WHERE rk = 1
    ),
    e{i} AS (
      SELECT cent_id, unnest(v) AS val,
             unnest(range(1, len(v) + 1)) AS pos
      FROM a{i}
    ),
    u{i} AS (
      SELECT cent_id, pos,
             CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(38,12)))
                  AS DOUBLE) / count(*) AS cval
      FROM e{i} GROUP BY cent_id, pos
    ),
    c{i} AS (
      SELECT cent_id, list(CAST(cval AS REAL) ORDER BY pos) AS cv
      FROM u{i} GROUP BY cent_id
    )"""
    sql += f""",
    sfin AS (
      SELECT d.vec_id, c.cent_id, {cos} AS cos
      FROM d CROSS JOIN c{n_iter} c
    ),
    afin AS (
      SELECT vec_id, cent_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rk
        FROM sfin
      ) WHERE rk = 1
    ),
    sz AS (
      SELECT cent_id, CAST(count(*) AS BIGINT) AS cluster_n
      FROM afin GROUP BY cent_id
    )
    SELECT u.cent_id, CAST(u.pos - 1 AS INT) AS dim,
           CAST(CAST(u.cval AS REAL) AS DOUBLE) AS centroid,
           coalesce(sz.cluster_n, 0) AS cluster_n
    FROM u{n_iter} u LEFT JOIN sz USING (cent_id)
    ORDER BY cent_id, dim
    """
    return sql


@register(
    "x30_kmeans_cells",
    "similarity",
    _kmeans_oracle(KM_SEEDS, KM_ITER),
    doc="Lloyd k-means refinement of the IVF centroids as an "
    "oracle-gated iterative pipeline: per-iteration broadcast "
    "assignment (max-cosine, sequential fold) + exact-decimal "
    "centroid means, exploded to scalar (cent_id, dim, centroid, "
    "cluster_n) rows; oracle = the same iteration unrolled as CTEs.",
)
def p30(spark, sf_dir):
    from etsd_time_series_database_spark.sources.store import load_table as _lt

    return kmeans_cells(
        _lt(spark, sf_dir, "embeddings"), KM_SEEDS, n_iter=KM_ITER
    )


# ------------------------------------------- segment-level dedup

SEG_TOKENS = 8
SEG_MAX_DOCS = 1


@register(
    "x31_segment_dedup",
    "dedup",
    f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    seg AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(ceil(len(toks) / {SEG_TOKENS}.0) AS BIGINT)),
               i -> array_to_string(
                 list_slice(toks, i*{SEG_TOKENS}+1, i*{SEG_TOKENS}+{SEG_TOKENS}),
                 ' '))) AS seg_txt,
             unnest(list_transform(
               range(0, CAST(ceil(len(toks) / {SEG_TOKENS}.0) AS BIGINT)),
               i -> len(list_slice(toks, i*{SEG_TOKENS}+1,
                                   i*{SEG_TOKENS}+{SEG_TOKENS})))) AS seg_len
      FROM tok WHERE len(toks) > 0
    ),
    cnt AS (
      SELECT seg_txt, count(DISTINCT doc_id) AS n_docs
      FROM seg GROUP BY seg_txt
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(CASE WHEN n_docs > {SEG_MAX_DOCS} THEN 1 ELSE 0 END)
                AS BIGINT) AS removed_segments,
           CAST(sum(CASE WHEN n_docs > {SEG_MAX_DOCS} THEN 0 ELSE seg_len END)
                AS BIGINT) AS kept_tokens
    FROM seg JOIN cnt USING (seg_txt)
    GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Exact-substring (8-token segment) dedup accounting: segments "
    "repeated across documents are flagged for inline removal "
    "(C4-style boilerplate pass; span-level complement to MinHash "
    "document near-dup). Segment explode is scan-speed JVM transform; "
    "shuffles are one segment-count hash agg + per-doc rollup.",
)
def p31(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import segment_dedup

    return segment_dedup(
        load_table(spark, sf_dir, "documents"),
        seg_tokens=SEG_TOKENS,
        max_docs=SEG_MAX_DOCS,
    )


@register(
    "x32_segment_rewrite",
    "dedup",
    f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    seg AS (
      SELECT doc_id,
             unnest(range(0, CAST(ceil(len(toks) / {SEG_TOKENS}.0) AS BIGINT)))
               AS i,
             unnest(list_transform(
               range(0, CAST(ceil(len(toks) / {SEG_TOKENS}.0) AS BIGINT)),
               i -> array_to_string(
                 list_slice(toks, i*{SEG_TOKENS}+1, i*{SEG_TOKENS}+{SEG_TOKENS}),
                 ' '))) AS seg_txt,
             unnest(list_transform(
               range(0, CAST(ceil(len(toks) / {SEG_TOKENS}.0) AS BIGINT)),
               i -> len(list_slice(toks, i*{SEG_TOKENS}+1,
                                   i*{SEG_TOKENS}+{SEG_TOKENS})))) AS seg_len
      FROM tok WHERE len(toks) > 0
    ),
    cnt AS (
      SELECT seg_txt, count(DISTINCT doc_id) AS n_docs
      FROM seg GROUP BY seg_txt
    ),
    keep AS (
      SELECT doc_id, i, seg_txt, seg_len
      FROM seg JOIN cnt USING (seg_txt)
      WHERE n_docs <= {SEG_MAX_DOCS}
    ),
    rebuilt AS (
      SELECT doc_id,
             string_agg(seg_txt, ' ' ORDER BY i) AS clean_text,
             CAST(sum(seg_len) AS BIGINT) AS kept_tokens
      FROM keep GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           coalesce(r.kept_tokens, 0) AS kept_tokens
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="Actionable segment dedup: documents rebuilt with over-shared "
    "8-token segments removed, surviving segments re-concatenated in "
    "original order (empty text when everything was boilerplate). "
    "The rewrite side of x31's accounting.",
)
def p32(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import segment_rewrite

    return segment_rewrite(
        load_table(spark, sf_dir, "documents"),
        seg_tokens=SEG_TOKENS,
        max_docs=SEG_MAX_DOCS,
    )


# ------------------------------------------- novelty / importance ops

NOVELTY_N = 3  # word n-gram width, shared with the x08 shingle width
WSAMPLE_CHARS_PER_PERMILLE = 4  # weight = n_chars / 4, clamped to 1000
SRC_TOPK_K = 5


@register(
    "x34_ngram_novelty",
    "quality",
    f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, unnest(list_distinct({_SHINGLES})) AS gram FROM tok
    ),
    firsts AS (
      SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram
    ),
    per AS (
      SELECT g.doc_id,
             count(*) AS n_ngrams,
             sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
               AS n_novel
      FROM g JOIN firsts f USING (gram) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN coalesce(p.n_ngrams, 0) > 0
                THEN (p.n_novel * 1.0) / p.n_ngrams END AS novelty
    FROM documents d LEFT JOIN per p USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="Per-document novelty: share of the doc's distinct 3-gram spans "
    "whose first corpus occurrence (lowest doc_id) is this document — "
    "the online redundancy rank for crawl snapshots. Attribution "
    "groups on an 8-byte xxhash64 fingerprint (raw-string twin is the "
    "equivalence oracle); all aggs map-side combinable.",
    headline=True,
)
def p34(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import (
        ngram_novelty,
    )

    return ngram_novelty(load_table(spark, sf_dir, "documents"), n=NOVELTY_N)


@register(
    "x35_weighted_sample",
    "sampling",
    f"""
    WITH w AS (
      SELECT doc_id, source, n_chars,
             least(1000, greatest(0, n_chars // {WSAMPLE_CHARS_PER_PERMILLE}))
               AS weight_permille
      FROM documents
    )
    SELECT doc_id, source, n_chars,
           CAST(weight_permille AS BIGINT) AS weight_permille
    FROM w WHERE {_DUCK_H} % 1000 < weight_permille
    ORDER BY doc_id
    """,
    doc="Deterministic importance sampling: keep probability is the "
    "row's own length-derived weight (n_chars/4 permille, clamped), "
    "membership a pure function of (doc_id, weight) — stable across "
    "runs/partitionings/engines like x03, still a zero-shuffle "
    "scan-side predicate.",
)
def p35(spark, sf_dir):
    from etsd_time_series_database_spark.operators.sampling import (
        weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "weight_permille",
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(1000),
                F.expr(f"n_chars div {WSAMPLE_CHARS_PER_PERMILLE}"),
            ),
        ).cast("bigint"),
    )
    return (
        weighted_sample(docs, "weight_permille")
        .select("doc_id", "source", "n_chars", "weight_permille")
        .orderBy("doc_id")
    )


@register(
    "x36_source_token_topk",
    "vocab",
    f"""
    WITH ex AS (
      SELECT source, unnest({_TOKS}) AS token FROM documents
    ),
    tf AS (
      SELECT source, token, count(*) AS term_freq
      FROM ex GROUP BY source, token
    ),
    r AS (
      SELECT source, token, term_freq,
             row_number() OVER (PARTITION BY source
                                ORDER BY term_freq DESC, token) AS rnk
      FROM tf
    )
    SELECT source, CAST(rnk AS INTEGER) AS rnk, token,
           CAST(term_freq AS BIGINT) AS term_freq
    FROM r WHERE rnk <= {SRC_TOPK_K} ORDER BY source, rnk
    """,
    doc="Per-source top-5 tokens (source-conditional vocabulary): one "
    "map-side-combinable (source, token) hash-agg, then a per-source "
    "rank window over the aggregated vocabulary-sized histogram — "
    "never the corpus. Ties lexicographic.",
)
def p36(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import (
        source_token_topk,
    )

    return source_token_topk(
        load_table(spark, sf_dir, "documents"), k=SRC_TOPK_K
    )


@register(
    "x37_ann_recall",
    "similarity",
    f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
      WHERE vec_id BETWEEN 1 AND 8
    ),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             {_duck_cos("e.embedding", "c.cv")} AS cos
      FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, cent_id) AS rn
            FROM scored)
      WHERE rn = 1
    ),
    qcell AS (
      SELECT cent_id AS qc, embedding AS qv FROM assigned WHERE vec_id = 0
    ),
    approx AS (
      SELECT a.vec_id, {_duck_cos("a.embedding", "qcell.qv")} AS cosine
      FROM assigned a, qcell
      WHERE a.cent_id = qcell.qc AND a.vec_id != 0
      ORDER BY cosine DESC, vec_id LIMIT 5
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    exact AS (
      SELECT e.vec_id, {_duck_cos("e.embedding", "q.qv")} AS cosine
      FROM embeddings e, q WHERE e.vec_id != 0
      ORDER BY cosine DESC, vec_id LIMIT 5
    ),
    hits AS (
      SELECT count(*) AS n_hits FROM exact e JOIN approx a USING (vec_id)
    )
    SELECT CAST(5 AS INTEGER) AS k, CAST(n_hits AS BIGINT) AS n_hits,
           (n_hits * 1.0) / 5 AS recall
    FROM hits
    """,
    doc="Recall@5 of the IVF single-cell probe vs the exact scan — the "
    "ANN index-config acceptance metric. Both sides are TakeOrdered "
    "top-k's; the comparison joins two k-row relations (driver-scale "
    "regardless of corpus size).",
)
def p37(spark, sf_dir):
    from etsd_time_series_database_spark.operators.similarity import ann_recall

    return ann_recall(
        load_table(spark, sf_dir, "embeddings"),
        query_id=0,
        centroid_ids=list(range(1, 9)),
        k=5,
    )


@register(
    "x38_cluster_reduction",
    "dedup",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    e(src, dst) AS (
      SELECT doc_a, doc_b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id
    ),
    comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
    tok AS (SELECT doc_id, len({_TOKS}) AS nt FROM documents),
    lab AS (
      SELECT t.doc_id, coalesce(c.component, t.doc_id) AS component, t.nt
      FROM tok t LEFT JOIN comp c USING (doc_id)
    )
    SELECT component,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id != component THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN doc_id = component THEN nt ELSE 0 END)
                AS BIGINT) AS kept_tokens,
           CAST(sum(nt) - sum(CASE WHEN doc_id = component THEN nt ELSE 0 END)
                AS BIGINT) AS saved_tokens
    FROM lab GROUP BY component ORDER BY component
    """,
    doc="Near-dup corpus-reduction report: per connected component "
    "(singletons included, so components partition the corpus), the "
    "canonical min-id representative and the docs/tokens dropping the "
    "rest would save — the actionable rollup of x09's clustering, as "
    "x32 is to x31.",
)
def p38(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import (
        cluster_reduction,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, rows_per_band=2, hash_mode="poly")
    return cluster_reduction(docs, pairs)


SPLIT_PERMILLE = (980, 10, 10)
_DUCK_SPLIT = (
    f"CASE WHEN {{h}} % 1000 < 980 THEN 'train' "
    f"WHEN {{h}} % 1000 < 990 THEN 'val' ELSE 'test' END"
)


@register(
    "x39_split_assign",
    "sampling",
    f"""
    WITH s AS (
      SELECT doc_id, {_TOKS} AS toks,
             {_DUCK_SPLIT.format(h=_DUCK_H)} AS split
      FROM documents
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(toks)) AS BIGINT) AS n_tokens
    FROM s GROUP BY split ORDER BY split
    """,
    doc="Deterministic 98/1/1 train/val/test assignment by key hash "
    "(zero-shuffle chained-when; membership stable across runs and "
    "engines, and late-arriving docs never move existing ones between "
    "splits), rolled up to a per-split balance report.",
)
def p39(spark, sf_dir):
    from etsd_time_series_database_spark.operators.sampling import (
        split_assign,
    )
    from etsd_time_series_database_spark.operators.textstats import _tokens

    return (
        split_assign(load_table(spark, sf_dir, "documents"), SPLIT_PERMILLE)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(_tokens("text"))).cast("bigint").alias("n_tokens"),
        )
        .orderBy("split")
    )


@register(
    "x40_leakage_safe_split",
    "sampling",
    f"""
    WITH canon AS (
      SELECT text, min(doc_id) AS c FROM documents GROUP BY text
    ),
    s AS (
      SELECT d.doc_id, {_TOKS} AS toks, canon.c,
             {_DUCK_SPLIT.format(h=_DUCK_H.replace("doc_id", "c"))} AS split
      FROM documents d JOIN canon USING (text)
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT c) AS BIGINT) AS n_groups,
           CAST(sum(len(toks)) AS BIGINT) AS n_tokens
    FROM s GROUP BY split ORDER BY split
    """,
    doc="Leakage-safe split: assignment hashes the exact-dedup CANONICAL "
    "id, so copies of one document can never straddle train and test. "
    "Canonical map is a fingerprint-keyed agg + equi-join (bodies never "
    "shuffle); per-split balance report with distinct-group counts.",
)
def p40(spark, sf_dir):
    from etsd_time_series_database_spark.operators.sampling import (
        leakage_safe_split,
    )
    from etsd_time_series_database_spark.operators.textstats import _tokens

    return (
        leakage_safe_split(
            load_table(spark, sf_dir, "documents"), SPLIT_PERMILLE
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("canonical_id")).alias("n_groups"),
            F.sum(F.size(_tokens("text"))).cast("bigint").alias("n_tokens"),
        )
        .orderBy("split")
    )


@register(
    "x41_image_features",
    "multimodal",
    """
    WITH d AS (
      SELECT doc_id,
             8 + doc_id % 9 AS h,
             8 + (doc_id * 3) % 9 AS w
      FROM documents WHERE doc_id < 200
    ),
    cell AS (
      SELECT doc_id, h, w, yo, xo, c,
             (doc_id * 7 + ((yo * h) // 4) * 3
              + ((xo * w) // 4) * 5 + c * 11) % 256 AS pix
      FROM d, range(0, 4) t1(yo), range(0, 4) t2(xo), range(0, 3) t3(c)
    ),
    agg AS (
      SELECT doc_id,
             CAST(max(h) AS INTEGER) AS height,
             CAST(max(w) AS INTEGER) AS width,
             sum(CASE WHEN c = 0 THEN pix END) / 16.0 AS mean_r,
             sum(CASE WHEN c = 1 THEN pix END) / 16.0 AS mean_g,
             sum(CASE WHEN c = 2 THEN pix END) / 16.0 AS mean_b,
             CAST(list_reduce(list(pix ORDER BY yo, xo, c),
                              (a, b) -> (a * 31 + b) % 1000000007)
                  AS BIGINT) AS thumb_fp
      FROM cell GROUP BY doc_id
    )
    SELECT * FROM agg ORDER BY doc_id
    """,
    doc="REAL multimodal decode path: RAW1 gradient images are encoded "
    "to actual bytes, then decoded (header parse + shape validation), "
    "nearest-neighbor resized to a 4x4 thumbnail, and featurized "
    "(exact per-channel means + polynomial fingerprint) in an "
    "Arrow-batched mapInPandas — verified against a closed-form "
    "integer SQL oracle that recomputes the same pixels without ever "
    "touching bytes. Unlike x20/x21 (library decode stubbed), nothing "
    "here is stubbed.",
)
def p41(spark, sf_dir):
    from etsd_time_series_database_spark.operators.multimodal import (
        image_features,
        synth_raw_images,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return image_features(synth_raw_images(docs)).orderBy("doc_id")


@register(
    "x42_audio_features",
    "multimodal",
    """
    WITH d AS (
      SELECT doc_id FROM documents WHERE doc_id < 200
    ),
    w AS (
      SELECT doc_id,
             list_transform(range(0, 50 + doc_id % 50),
                            i -> ((doc_id * 13 + i * 7) % 4001) - 2000) AS s
      FROM d
    )
    SELECT doc_id,
           CAST(len(s) AS INTEGER) AS n_samples,
           CAST(16000 AS INTEGER) AS sample_rate,
           CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT) AS peak,
           list_sum(list_transform(s, x -> x * x)) * 1.0 / len(s) AS mean_sq,
           CAST(list_sum(list_transform(range(1, len(s)),
                                        i -> CASE WHEN s[i] * s[i + 1] < 0
                                             THEN 1 ELSE 0 END))
                AS BIGINT) AS zero_crossings
    FROM w ORDER BY doc_id
    """,
    doc="REAL audio decode path (PCM1 analog of x41): int16 waveforms "
    "encoded to real bytes, decoded with header/count validation, and "
    "featurized with transcendental-free math (peak, exact mean "
    "square, strict zero crossings) in Arrow-batched mapInPandas — "
    "verified against a closed-form integer SQL oracle.",
)
def p42(spark, sf_dir):
    from etsd_time_series_database_spark.operators.multimodal import (
        audio_features,
        synth_raw_audio,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return audio_features(synth_raw_audio(docs)).orderBy("doc_id")


_GOPHER = dict(
    min_tokens=20,
    max_tokens=100_000,
    min_word_len=3.0,
    max_word_len=10.0,
    min_alpha_frac=0.80,
    max_symbol_ratio=0.10,
    min_stopwords=2,
)


@register(
    "x43_gopher_rules",
    "text",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             CASE WHEN len(toks) = 0 THEN NULL
                  ELSE length(replace(text, ' ', '')) / len(toks) END AS mwl,
             CASE WHEN len(toks) = 0 THEN NULL
                  ELSE len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                       / len(toks) END AS af,
             CASE WHEN length(text) = 0 THEN NULL
                  ELSE length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                       / length(text) END AS sr,
             len(list_filter(list_distinct(toks),
                             x -> list_contains({list(STOPWORDS)!r}, x))) AS nstop
      FROM t
    ),
    r AS (
      SELECT doc_id, n_tok, mwl, af, sr, nstop,
             (n_tok >= {_GOPHER["min_tokens"]}
              AND n_tok <= {_GOPHER["max_tokens"]}) AS rule_len,
             coalesce(mwl >= {_GOPHER["min_word_len"]!r}
                      AND mwl <= {_GOPHER["max_word_len"]!r}, FALSE) AS rule_word_len,
             coalesce(af >= {_GOPHER["min_alpha_frac"]!r}, FALSE) AS rule_alpha,
             coalesce(sr <= {_GOPHER["max_symbol_ratio"]!r}, TRUE) AS rule_symbol,
             (nstop >= {_GOPHER["min_stopwords"]}) AS rule_stop
      FROM s
    )
    SELECT doc_id,
           CAST(n_tok AS INTEGER) AS n_tokens,
           mwl AS mean_word_len,
           af AS alpha_frac,
           sr AS symbol_ratio,
           CAST(nstop AS INTEGER) AS n_stopwords,
           rule_len, rule_word_len, rule_alpha, rule_symbol, rule_stop,
           CAST((CASE WHEN rule_len THEN 0 ELSE 1 END)
                + (CASE WHEN rule_word_len THEN 0 ELSE 1 END)
                + (CASE WHEN rule_alpha THEN 0 ELSE 1 END)
                + (CASE WHEN rule_symbol THEN 0 ELSE 1 END)
                + (CASE WHEN rule_stop THEN 0 ELSE 1 END) AS INTEGER) AS n_failed,
           (rule_len AND rule_word_len AND rule_alpha
            AND rule_symbol AND rule_stop) AS keep
    FROM r ORDER BY doc_id
    """,
    doc="Gopher-style quality-rule battery (token-count bounds, mean "
    "word length, alpha-token fraction, symbol ratio, stopword "
    "presence) with per-rule flags and a composite keep verdict — "
    "complements x27, which owns the repetition rules. Zero-shuffle "
    "Catalyst column expressions: the whole battery is a map-only "
    "pass at any corpus size.",
)
def p43(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import gopher_rules

    return gopher_rules(load_table(spark, sf_dir, "documents"), **_GOPHER)


BPE_MERGES = 8


def _bpe_chain(k: int) -> str:
    """Generate the k-round DuckDB CTE chain mirroring bpe_train():
    same pair counting, same (cnt DESC, l, r) argmax, same greedy
    left-fold merge (list_reduce over a chr(31)-joined accumulator —
    symbols never contain the separator, so ends_with identifies the
    last element exactly). Ends with CTEs b1..bk (the merges) and wk
    (the final symbol table)."""
    parts = [
        f"""
    WITH w0 AS (
      SELECT tok AS w, CAST(count(*) AS BIGINT) AS freq,
             list_transform(range(1, length(tok) + 1),
                            i -> substr(tok, i, 1)) AS syms
      FROM documents, unnest({_TOKS}) AS u(tok)
      GROUP BY tok
    )"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
    p{i} AS (
      SELECT syms[j] AS l, syms[j+1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
      FROM w{i - 1}, unnest(range(1, len(syms))) AS t(j)
      GROUP BY 1, 2
    ),
    b{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
    w{i} AS (
      SELECT w, freq,
        CASE WHEN b.l IS NULL OR len(syms) = 1 THEN syms
        ELSE string_split(
          list_reduce(syms, (acc, x) ->
            CASE WHEN (acc = b.l OR ends_with(acc, chr(31) || b.l))
                      AND x = b.r
                 THEN acc || x
                 ELSE acc || chr(31) || x END),
          chr(31))
        END AS syms
      FROM w{i - 1} LEFT JOIN b{i} b ON TRUE
    )"""
        )
    return "".join(parts)


def _bpe_oracle(k: int) -> str:
    sel = "\n      UNION ALL ".join(
        f"SELECT {i} AS rank, l AS lhs, r AS rhs, l || r AS merged, "
        f"cnt AS pair_count FROM b{i}"
        for i in range(1, k + 1)
    )
    return _bpe_chain(k) + f"\n    SELECT * FROM ({sel}) ORDER BY rank"


@register(
    "x45_bpe_vocab",
    "text",
    _bpe_oracle(BPE_MERGES),
    doc="Distributed BPE vocabulary induction (tokenizer training): "
    "collapse the corpus to a distinct-word frequency table (the only "
    "corpus-sized pass), then per merge round one vocab-bounded "
    "pair-count hash-agg, a deterministic TakeOrdered(1) argmax and a "
    "declarative greedy array-fold merge — no .collect() anywhere, "
    "localCheckpoint truncates the iterative lineage. Hash-gated "
    "against a generated k-round DuckDB CTE chain (fold included), so "
    "even the iterative path is oracle-verified.",
    headline=True,
)
def p45(spark, sf_dir):
    from etsd_time_series_database_spark.operators.bpe import bpe_merges

    return bpe_merges(load_table(spark, sf_dir, "documents"), BPE_MERGES)


SEM_TAU = 0.4


def _semdedup_oracle(seed_ids: list[int], tau: float) -> str:
    cos_dc = _duck_cos("d.v", "c.cv")
    cos_xy = _duck_cos("x.v", "y.v")
    ids = ", ".join(str(i) for i in seed_ids)
    return f"""
    WITH d AS (SELECT vec_id, embedding AS v FROM embeddings),
    c0 AS (
      SELECT vec_id AS cent_id, embedding AS cv
      FROM embeddings WHERE vec_id IN ({ids})
    ),
    s AS (
      SELECT d.vec_id, d.v, c.cent_id, {cos_dc} AS cos
      FROM d CROSS JOIN c0 c
    ),
    a AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rk
        FROM s
      ) WHERE rk = 1
    ),
    pm AS (
      SELECT y.vec_id, max({cos_xy}) AS mp
      FROM a x JOIN a y ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
      GROUP BY y.vec_id
    )
    SELECT a.vec_id, a.cent_id,
           round(coalesce(pm.mp, -2.0), 6) AS max_prior_cos,
           coalesce(pm.mp >= {tau!r}, FALSE) AS dropped
    FROM a LEFT JOIN pm USING (vec_id)
    ORDER BY a.vec_id
    """


@register(
    "x46_semantic_dedup",
    "dedup",
    _semdedup_oracle(KM_SEEDS, SEM_TAU),
    doc="SemDeDup-style semantic dedup: nearest-centroid cells, then "
    "drop any vector whose cosine to an earlier cell member reaches "
    "tau (keep-the-earliest). Broadcast assignment + one max_by "
    "shuffle; the pairwise term is bounded by cell size (k ~ "
    "n/target_cell_size at production scale), the same cap discipline "
    "as the LSH bands.",
)
def p46(spark, sf_dir):
    from etsd_time_series_database_spark.operators.similarity import (
        semantic_dedup,
    )

    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"), KM_SEEDS, SEM_TAU
    )


@register(
    "x47_bpe_compression",
    "text",
    _bpe_chain(BPE_MERGES)
    + f""",
    dt AS (
      SELECT doc_id, tok FROM documents, unnest({_TOKS}) AS u(tok)
    ),
    j AS (
      SELECT dt.doc_id, length(dt.tok) AS nc, len(w.syms) AS nb
      FROM dt JOIN w{BPE_MERGES} w ON dt.tok = w.w
    ),
    g AS (
      SELECT doc_id, count(*) AS nw, sum(nc) AS nc, sum(nb) AS nb
      FROM j GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(g.nw, 0) AS BIGINT) AS n_words,
           CAST(coalesce(g.nc, 0) AS BIGINT) AS n_char_syms,
           CAST(coalesce(g.nb, 0) AS BIGINT) AS n_bpe_syms,
           CAST(coalesce(g.nc, 0) AS BIGINT)
             / nullif(CAST(coalesce(g.nb, 0) AS BIGINT), 0) AS compression
    FROM documents d LEFT JOIN g USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="Declarative BPE encoding: per-document char-vs-BPE symbol "
    "counts and compression ratio, computed by joining corpus tokens "
    "against the trained symbol table (the deployment shape of a "
    "tokenizer — small model table vs big corpus, AQE-broadcast while "
    "it fits). Shares the x45 training chain; no collect anywhere.",
)
def p47(spark, sf_dir):
    from etsd_time_series_database_spark.operators.bpe import (
        bpe_compression,
    )

    return bpe_compression(load_table(spark, sf_dir, "documents"), BPE_MERGES)


EPOCH_SEED = 1


@register(
    "x48_epoch_shuffle",
    "sampling",
    f"""
    WITH s AS (
      SELECT doc_id,
             {_DUCK_H.replace("doc_id", f"(doc_id + {EPOCH_SEED})")} AS hk
      FROM documents
    )
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY hk, doc_id) - 1 AS BIGINT)
             AS epoch_pos
    FROM s ORDER BY doc_id
    """,
    doc="Deterministic training-epoch shuffle: every row's 0-based "
    "position in the seed-keyed pseudorandom global order, computed "
    "WITHOUT a global sort — order-aligned hash buckets, a bounded "
    "bucket-offset table broadcast back, and per-bucket rank windows "
    "(parallelism = n_buckets). The oracle states the same order as "
    "one global window.",
)
def p48(spark, sf_dir):
    from etsd_time_series_database_spark.operators.sampling import (
        epoch_shuffle,
    )

    return epoch_shuffle(
        load_table(spark, sf_dir, "documents"), EPOCH_SEED
    ).select("doc_id", "epoch_pos")


@register(
    "x50_surprisal_score",
    "text",
    f"""
    WITH tk AS (
      SELECT doc_id, tok FROM documents, unnest({_TOKS}) AS u(tok)
    ),
    v AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM tk GROUP BY tok),
    t AS (SELECT CAST(sum(f) AS BIGINT) AS n FROM v),
    r AS (
      SELECT tk.doc_id, t.n // v.f AS rar
      FROM tk JOIN v USING (tok) CROSS JOIN t
    ),
    g AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nt,
             round(CAST(sum(rar) AS DOUBLE) / count(*), 6) AS mean_rarity,
             CAST(max(rar) AS BIGINT) AS max_rarity
      FROM r GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(g.nt, 0) AS BIGINT) AS n_tokens,
           g.mean_rarity, g.max_rarity
    FROM documents d LEFT JOIN g USING (doc_id)
    ORDER BY d.doc_id
    """,
    doc="Unigram rarity scoring (transcendental-free perplexity "
    "proxy, CCNet-style quality bucketing): rarity = corpus_tokens "
    "div token_freq — exact BIGINT, so sums/max/mean are integer "
    "arithmetic plus one IEEE division on every engine. One vocab "
    "hash-agg + one-row total broadcast + vocab-sized equi-join.",
)
def p50(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import (
        surprisal_score,
    )

    return surprisal_score(load_table(spark, sf_dir, "documents"))


@register(
    "x51_contamination_score",
    "contamination",
    f"""
    WITH tok AS (
      SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ),
    trs AS (
      SELECT doc_id, unnest(list_distinct({_duck_shingles(DECON_N)})) AS sh
      FROM tok WHERE source NOT IN {TEST_SOURCES}
    ),
    tes AS (
      SELECT DISTINCT sh FROM (
        SELECT unnest(list_distinct({_duck_shingles(DECON_N)})) AS sh
        FROM tok WHERE source IN {TEST_SOURCES}
      )
    ),
    g AS (
      SELECT trs.doc_id, CAST(count(*) AS BIGINT) AS ns,
             CAST(count(tes.sh) AS BIGINT) AS shd
      FROM trs LEFT JOIN tes ON trs.sh = tes.sh
      GROUP BY trs.doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(g.ns, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(g.shd, 0) AS BIGINT) AS n_shared,
           CAST(coalesce(g.shd, 0) AS BIGINT)
             / nullif(CAST(coalesce(g.ns, 0) AS BIGINT), 0) AS contamination
    FROM (SELECT doc_id FROM tok WHERE source NOT IN {TEST_SOURCES}) t
    LEFT JOIN g USING (doc_id)
    ORDER BY t.doc_id
    """,
    doc="Graded train/test contamination: per training document, the "
    "fraction of its distinct 5-gram shingles found anywhere in the "
    "held-out sources — the thresholdable form of x08's pairwise "
    "report. Test shingle set distinct-reduced and AQE-broadcast; the "
    "train corpus shuffles only shingle keys.",
)
def p51(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    test = docs.filter(F.col("source").isin(*TEST_SOURCES))
    train = docs.filter(~F.col("source").isin(*TEST_SOURCES))
    from etsd_time_series_database_spark.operators.dedup import (
        contamination_score,
    )

    return contamination_score(train, test, n=DECON_N)


@register(
    "x52_neardup_safe_split",
    "sampling",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    e(src, dst) AS (
      SELECT doc_a, doc_b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id
    ),
    comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
    lab AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS g,
             {_TOKS} AS toks
      FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    s AS (
      SELECT g, toks, {_DUCK_SPLIT.format(h=_DUCK_H.replace("doc_id", "g"))} AS split
      FROM lab
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT g) AS BIGINT) AS n_groups,
           CAST(sum(len(toks)) AS BIGINT) AS n_tokens
    FROM s GROUP BY split ORDER BY split
    """,
    doc="Near-dup-safe split: MinHash+LSH candidate pairs collapse to "
    "connected components (x09 min-label propagation) and the split "
    "hashes the COMPONENT representative — not even a NEAR duplicate "
    "can straddle train and test. The composition x40's docstring "
    "promises, per-split balance rollup with distinct-group counts.",
)
def p52(spark, sf_dir):
    from etsd_time_series_database_spark.operators.sampling import (
        neardup_safe_split,
    )
    from etsd_time_series_database_spark.operators.textstats import _tokens

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, rows_per_band=2, hash_mode="poly")
    return (
        neardup_safe_split(docs, pairs, SPLIT_PERMILLE)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("component")).alias("n_groups"),
            F.sum(F.size(_tokens("text"))).cast("bigint").alias("n_tokens"),
        )
        .orderBy("split")
    )


HN_QUERIES = [0, 1, 2, 3, 4]
HN_K = 3


@register(
    "x53_hard_negatives",
    "similarity",
    f"""
    WITH q AS (
      SELECT vec_id AS q_vec_id, embedding AS qv, label AS ql
      FROM embeddings WHERE vec_id IN ({", ".join(str(i) for i in HN_QUERIES)})
    ),
    s AS (
      SELECT q.q_vec_id, e.vec_id AS neg_vec_id,
             {_duck_cos("e.embedding", "q.qv")} AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.label != q.ql
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                   ORDER BY cosine DESC, neg_vec_id) AS rank
      FROM s
    )
    SELECT q_vec_id, CAST(rank AS INTEGER) AS rank, neg_vec_id, cosine
    FROM r WHERE rank <= {HN_K}
    ORDER BY q_vec_id, rank
    """,
    doc="Hard-negative mining for contrastive training: per query "
    "vector, the k most-similar DIFFERENT-label vectors (near-boundary "
    "negatives; same-label false negatives excluded by construction). "
    "Broadcast query set, one corpus scan with the codegen cosine, "
    "WindowGroupLimit-bounded per-query top-k.",
)
def p53(spark, sf_dir):
    from etsd_time_series_database_spark.operators.similarity import (
        hard_negatives,
    )

    return hard_negatives(
        load_table(spark, sf_dir, "embeddings"), HN_QUERIES, HN_K
    )


@register(
    "x54_training_batches",
    "packing",
    f"""
    WITH canon AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    ),
    t AS (
      SELECT d.doc_id, d.text, {_TOKS.replace('text', 'd.text')} AS toks
      FROM documents d JOIN canon USING (doc_id)
    ),
    feats AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             len(list_filter(toks, x -> list_contains({list(STOPWORDS)!r}, x)))
               / len(toks) AS stop_ratio,
             0.5 * (len(list_distinct(toks)) / len(toks))
               + 0.5 * least(1.0, len(toks) / 100.0) AS quality
      FROM t WHERE len(toks) > 0
    ),
    repfrac AS (
      SELECT doc_id,
             CASE WHEN len(g3) > 0 THEN
               CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
             END AS dup_3gram_frac
      FROM (SELECT doc_id, {_SHINGLES} AS g3 FROM t)
    ),
    cnt AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(toks) AS token FROM t)
      GROUP BY doc_id, token
    ),
    top AS (
      SELECT doc_id, CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT)
               AS top_token_frac
      FROM cnt GROUP BY doc_id
    ),
    repkeep AS (
      SELECT r.doc_id
      FROM repfrac r LEFT JOIN top USING (doc_id)
      WHERE coalesce(dup_3gram_frac, 0) <= {REP_MAX_DUP3}
        AND coalesce(top_token_frac, 0) <= {REP_MAX_TOP}
    ),
    kept AS (
      SELECT f.doc_id, f.n_tokens
      FROM feats f JOIN repkeep USING (doc_id)
      WHERE stop_ratio >= 0.05 AND quality >= 0.5
    ),
    tr AS (
      SELECT doc_id, n_tokens FROM kept
      WHERE {_DUCK_SPLIT.format(h=_DUCK_H)} = 'train'
    ),
    tok AS (
      SELECT doc_id, CAST(doc_id % {PACK_SHARDS} AS INT) AS shard, n_tokens
      FROM tr
    ),
    p AS (
      SELECT shard, doc_id, n_tokens,
             CAST(floor(coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / {PACK_CTX}) AS BIGINT) AS pack_idx
      FROM tok
    )
    SELECT shard, pack_idx, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM p GROUP BY shard, pack_idx ORDER BY shard, pack_idx
    """,
    doc="END-TO-END training-batch assembly, the engine's whole "
    "pipeline in one verified plan: exact-dedup canonical selection + "
    "language/quality/repetition gates (x10's chain) -> deterministic "
    "train split (x39's hash cut) -> fixed-token sequence packing "
    "(x28's per-shard running count) -> per-pack manifest. Every "
    "stage is the same bucketed/broadcast shape its standalone entry "
    "ships; the composite proves they COMPOSE without a collect or an "
    "extra shuffle between stages.",
    headline=True,
)
def p54(spark, sf_dir):
    from etsd_time_series_database_spark.operators.packing import (
        pack_from_counts,
    )
    from etsd_time_series_database_spark.operators.sampling import (
        split_assign as _sa,
    )

    docs = load_table(spark, sf_dir, "documents")
    # gate set only — the TF-IDF metadata branch is not re-computed
    kept, _, _ = _clean_gate(docs)
    # the gate's n_tokens IS size(tokens) (sum of the per-token counts),
    # and the split is a pure function of doc_id — so the pack stage
    # runs on the gate output directly instead of semi-joining back to
    # the corpus and re-tokenizing every surviving document (round-14
    # optimization: one documents scan + Generate fewer, manifest
    # bit-identical)
    train = (
        _sa(kept.select("doc_id", "n_tokens"), SPLIT_PERMILLE)
        .filter(F.col("split") == "train")
        .drop("split")
    )
    toks = train.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).cast("int").alias("shard"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
    )
    return pack_from_counts(toks, ctx_tokens=PACK_CTX)


PQ_M = 8       # subspaces (64-dim embedding -> 8-dim subvectors)
PQ_CENTS = 16  # codebook size per subspace (seed vectors 1..16)


def _duck_sq_l2(a: str, b: str) -> str:
    """Sequential-fold squared-L2 in DuckDB — bit-identical to Spark's
    functions.exprs.sq_l2_distance (same left-to-right shape; the 0.0
    init vs first-element fold differ only by +0.0, which is exact)."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) "
        f"* (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), "
        f"(p, q) -> p + q)"
    )


@register(
    "x56_pq_topk",
    "similarity",
    f"""
    WITH subs AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s),
    cents AS (
      SELECT e.vec_id AS cent_id, subs.s,
             list_slice(e.embedding, subs.s * 8 + 1, subs.s * 8 + 8) AS cvs
      FROM embeddings e CROSS JOIN subs
      WHERE e.vec_id BETWEEN 1 AND {PQ_CENTS}
    ),
    codes AS (
      SELECT vec_id, s, cent_id FROM (
        SELECT b.vec_id, c.s, c.cent_id,
               row_number() OVER (
                 PARTITION BY b.vec_id, c.s
                 ORDER BY CAST({_duck_sq_l2(
                     "list_slice(b.embedding, c.s * 8 + 1, c.s * 8 + 8)",
                     "c.cvs")} AS DECIMAL(19,6)), c.cent_id) AS rn
        FROM embeddings b CROSS JOIN cents c
        WHERE b.vec_id != 0
      ) WHERE rn = 1
    ),
    qd AS (
      SELECT c.s, c.cent_id,
             {_duck_sq_l2(
                 "list_slice(q.embedding, c.s * 8 + 1, c.s * 8 + 8)",
                 "c.cvs")} AS qd2
      FROM embeddings q CROSS JOIN cents c
      WHERE q.vec_id = 0
    )
    SELECT vec_id,
           round(CAST(sum(CAST(qd2 AS DECIMAL(18,6))) AS DOUBLE), 6) AS adc_d2
    FROM codes JOIN qd USING (s, cent_id)
    GROUP BY vec_id
    ORDER BY sum(CAST(qd2 AS DECIMAL(18,6))), vec_id
    LIMIT 10
    """,
    doc="Product-quantization ANN (Jégou 2011): per-subspace codebook "
    "encode (one min-struct hash agg — the pass that materializes "
    "8-byte codes at 100 TB) + asymmetric-distance top-k against the "
    "broadcast query table. Complements IVF (x15: prune WHICH vectors "
    "to score) by compressing HOW each vector is scored.",
    headline=True,
)
def p56(spark, sf_dir):
    from etsd_time_series_database_spark.operators.similarity import pq_topk

    return pq_topk(
        load_table(spark, sf_dir, "embeddings"),
        query_id=0,
        k=10,
        m=PQ_M,
        n_cents=PQ_CENTS,
    )


DSIR_B = 2048
DSIR_TARGET = "src0"


@register(
    "x57_dsir_weights",
    "selection",
    f"""
    WITH tok AS (
      SELECT doc_id, source = '{DSIR_TARGET}' AS is_target, {_TOKS} AS toks
      FROM documents
    ),
    feats AS (
      SELECT doc_id, is_target, unnest(toks) AS feat FROM tok
      UNION ALL
      SELECT doc_id, is_target, unnest({_duck_shingles(2)}) AS feat FROM tok
    ),
    fb AS (
      SELECT doc_id, is_target,
             {_DUCK_POLY_FP.format(col="feat")} % {DSIR_B} AS bucket
      FROM feats
    ),
    cnts AS (
      SELECT doc_id, is_target, bucket, CAST(count(*) AS BIGINT) AS c
      FROM fb GROUP BY doc_id, is_target, bucket
    ),
    bt AS (
      SELECT bucket,
             sum(CASE WHEN is_target THEN c ELSE 0 END) AS nt,
             sum(CASE WHEN NOT is_target THEN c ELSE 0 END) AS nr
      FROM cnts GROUP BY bucket
    ),
    tot AS (SELECT sum(nt) AS t_total, sum(nr) AS r_total FROM bt)
    SELECT doc_id, is_target,
           CAST(sum(c) AS BIGINT) AS n_feats,
           round(CAST(sum(CAST(CAST(c AS DOUBLE)
                 * (CAST(nt + 1 AS DOUBLE) / CAST(t_total + {DSIR_B} AS DOUBLE)
                    - CAST(nr + 1 AS DOUBLE) / CAST(r_total + {DSIR_B} AS DOUBLE))
                 * 1000000.0 AS DECIMAL(18,6))) AS DOUBLE), 6) AS dsir_ppm
    FROM cnts JOIN bt USING (bucket) CROSS JOIN tot
    GROUP BY doc_id, is_target
    ORDER BY doc_id
    """,
    doc="DSIR importance weights (Xie 2023): hashed unigram+bigram "
    "feature distributions, target-vs-raw contrast per doc in ppm — "
    "the data-selection scorer that resamples a raw corpus toward a "
    "target domain. Bucket table is KB-sized and broadcast; text "
    "never shuffles.",
)
def p57(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import dsir_weights

    return dsir_weights(
        load_table(spark, sf_dir, "documents"),
        target_source=DSIR_TARGET,
        n_buckets=DSIR_B,
        # the catalog opts into the portable fingerprint so the DuckDB
        # oracle reproduces the exact bucketing (dedup hash_mode
        # convention); operators default to codegen'd xxhash64
        hash_mode="poly",
    )


@register(
    "x58_ivfpq_topk",
    "similarity",
    f"""
    WITH subs AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s),
    cents AS (
      SELECT e.vec_id AS cent_id, subs.s,
             list_slice(e.embedding, subs.s * 8 + 1, subs.s * 8 + 8) AS cvs
      FROM embeddings e CROSS JOIN subs
      WHERE e.vec_id BETWEEN 1 AND {PQ_CENTS}
    ),
    coarse AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
      WHERE vec_id BETWEEN 1 AND 8
    ),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             {_duck_cos("e.embedding", "c.cv")} AS cos
      FROM embeddings e CROSS JOIN coarse c
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, cent_id) AS rn
            FROM scored)
      WHERE rn = 1
    ),
    qcell AS (SELECT cent_id AS qc FROM assigned WHERE vec_id = 0),
    members AS (
      SELECT a.vec_id, a.embedding FROM assigned a, qcell
      WHERE a.cent_id = qcell.qc
    ),
    codes AS (
      SELECT vec_id, s, cent_id FROM (
        SELECT b.vec_id, c.s, c.cent_id,
               row_number() OVER (
                 PARTITION BY b.vec_id, c.s
                 ORDER BY CAST({_duck_sq_l2(
                     "list_slice(b.embedding, c.s * 8 + 1, c.s * 8 + 8)",
                     "c.cvs")} AS DECIMAL(19,6)), c.cent_id) AS rn
        FROM members b CROSS JOIN cents c
        WHERE b.vec_id != 0
      ) WHERE rn = 1
    ),
    qd AS (
      SELECT c.s, c.cent_id,
             {_duck_sq_l2(
                 "list_slice(q.embedding, c.s * 8 + 1, c.s * 8 + 8)",
                 "c.cvs")} AS qd2
      FROM embeddings q CROSS JOIN cents c
      WHERE q.vec_id = 0
    )
    SELECT vec_id,
           round(CAST(sum(CAST(qd2 AS DECIMAL(18,6))) AS DOUBLE), 6) AS adc_d2
    FROM codes JOIN qd USING (s, cent_id)
    GROUP BY vec_id
    ORDER BY sum(CAST(qd2 AS DECIMAL(18,6))), vec_id
    LIMIT 10
    """,
    doc="IVF-PQ composite (the FAISS serving layout): coarse cell "
    "prunes WHICH vectors are scored (1/nlist of the corpus; on disk "
    "= partition pruning), PQ codes decide HOW (m bytes/vector in "
    "executor memory). Composes x15's coarse quantizer with x56's "
    "encode+ADC — every stage broadcast/hash-agg shaped.",
)
def p58(spark, sf_dir):
    from etsd_time_series_database_spark.operators.similarity import ivfpq_topk

    return ivfpq_topk(
        load_table(spark, sf_dir, "embeddings"),
        query_id=0,
        k=10,
        m=PQ_M,
        n_cents=PQ_CENTS,
    )


@register(
    "x59_source_overlap",
    "dedup",
    f"""
    WITH tok AS (SELECT source, {_TOKS} AS toks FROM documents),
    sh AS (
      SELECT DISTINCT source AS src, shingle
      FROM (SELECT source, unnest({_SHINGLES}) AS shingle FROM tok)
    ),
    sizes AS (SELECT src, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY src),
    shared AS (
      SELECT a.src AS source_a, b.src AS source_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.src < b.src
      GROUP BY a.src, b.src
    )
    SELECT source_a, source_b, n_shared,
           round(CAST(n_shared AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - n_shared), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.src = source_a
    JOIN sizes sb ON sb.src = source_b
    ORDER BY source_a, source_b
    """,
    doc="Cross-source duplication matrix: distinct-shingle overlap + "
    "Jaccard per source pair — the provenance view that finds feeds "
    "copying from each other. Posting lists bounded by the SOURCE "
    "count after the distinct, so the shingle self-join is "
    "C(sources,2)-per-shingle at worst, never O(rows²).",
)
def p59(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import source_overlap

    return source_overlap(load_table(spark, sf_dir, "documents"), n=3)


@register(
    "x60_corpus_datacard",
    "text",
    f"""
    WITH d AS (
      SELECT source, text, {_TOKS} AS toks FROM documents
    ),
    per AS (
      SELECT source, text,
             len(toks) AS n_tok,
             len(list_filter(toks,
                 x -> x IN ('the','a','of','and','to','in','is'))) AS n_stop,
             len(list_distinct(toks)) AS n_dis
      FROM d
    ),
    q AS (
      SELECT source, text, n_tok,
             CASE WHEN n_tok > 0
                       AND CAST(n_stop AS DOUBLE) / n_tok >= 0.05
                  THEN 1 ELSE 0 END AS is_en,
             round(0.5 * (CAST(n_dis AS DOUBLE) / nullif(n_tok, 0))
                   + 0.5 * least(1.0, n_tok / 100.0), 6) AS quality
      FROM per
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(CAST(sum(is_en) AS DOUBLE) / count(*), 6) AS english_frac,
           round(CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(count(quality) AS DOUBLE), 6) AS mean_quality,
           round(1.0 - CAST(count(DISTINCT text) AS DOUBLE) / count(*), 6)
             AS dup_rate
    FROM q GROUP BY source ORDER BY source
    """,
    doc="Per-source corpus DATA CARD: docs, token volume, English "
    "fraction (x16 rule), mean quality (x17 composite), exact-dup "
    "rate (x11 fingerprint grouping) — the per-feed datasheet row, "
    "five signals in ONE map-side hash-agg with no joins between the "
    "component operators.",
)
def p60(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import (
        corpus_datacard,
    )

    return corpus_datacard(load_table(spark, sf_dir, "documents"))


@register(
    "x61_keep_best_canonical",
    "dedup",
    f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle()}),
    e(src, dst) AS (
      SELECT doc_a, doc_b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM e
      UNION
      SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.id
    ),
    comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
    qual AS (
      SELECT doc_id,
             coalesce(round(
               0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                      / nullif(len(toks), 0))
               + 0.5 * least(1.0, len(toks) / 100.0), 6), -1.0) AS q6
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    lab AS (
      SELECT coalesce(c.component, q.doc_id) AS component, q.doc_id, q.q6
      FROM qual q LEFT JOIN comp c USING (doc_id)
    ),
    sel AS (
      SELECT component, doc_id, q6,
             row_number() OVER (PARTITION BY component
                                ORDER BY q6 DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY component) AS nm
      FROM lab
    )
    SELECT component, doc_id AS best_doc, CAST(nm AS BIGINT) AS n_members,
           max(q6) OVER (PARTITION BY component) AS best_quality
    FROM sel WHERE rn = 1 ORDER BY component
    """,
    doc="Keep-BEST near-dup canonicals: LSH pairs -> connected "
    "components (x09 propagation) -> per-cluster argmax by x17 "
    "quality (round-6 quantized, packed-decimal max_by hash-agg; "
    "lowest id on ties) — the production dedup policy of keeping the "
    "best copy rather than the earliest id.",
)
def p61(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import (
        keep_best_canonical,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, rows_per_band=2, hash_mode="poly")
    return keep_best_canonical(docs, pairs)


@register(
    "x62_normalize_dedup_lift",
    "dedup",
    """
    WITH per AS (
      SELECT text AS raw,
             trim(regexp_replace(lower(text), '[ ]{2,}', ' ', 'g')) AS norm
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN norm != raw THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(count(DISTINCT raw) AS BIGINT) AS distinct_raw,
           CAST(count(DISTINCT norm) AS BIGINT) AS distinct_norm,
           CAST(count(DISTINCT raw) - count(DISTINCT norm) AS BIGINT)
             AS extra_dups_found
    FROM per
    """,
    doc="Normalization-aware dedup lift (CCNet-style normalize-before-"
    "dedup): lowercase + whitespace-collapse + trim, then distinct-"
    "text counts before/after in one global hash-agg — quantifies the "
    "duplicate mass that case/spacing variants hide from exact dedup.",
)
def p62(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import (
        normalize_dedup_lift,
    )

    return normalize_dedup_lift(load_table(spark, sf_dir, "documents"))


@register(
    "x63_centroid_similarity",
    "similarity",
    f"""
    WITH dims AS (
      SELECT label, d.dim,
             round(CAST(sum(CAST(embedding[d.dim + 1] AS DECIMAL(38,12)))
                        AS DOUBLE) / count(*), 6) AS m
      FROM embeddings
      CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) d
      GROUP BY label, d.dim
    ),
    cents AS (
      SELECT label, list(m ORDER BY dim) AS cv FROM dims GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round({_duck_cos("a.cv", "b.cv")}, 6) AS centroid_cosine
    FROM cents a JOIN cents b ON a.label < b.label
    ORDER BY label_a, label_b
    """,
    doc="Label-centroid separability matrix: exact-decimal mean "
    "embedding per label class (one Generate + hash-agg; labels x dim "
    "KB output) and pairwise centroid cosine — the embedding-quality "
    "check run before training on labeled vectors (centroids at "
    "cosine ~1 = classes a probe cannot separate).",
)
def p63(spark, sf_dir):
    from etsd_time_series_database_spark.operators.similarity import (
        centroid_similarity,
    )

    return centroid_similarity(load_table(spark, sf_dir, "embeddings"))


@register(
    "x64_corpus_diff",
    "text",
    """
    WITH old AS (SELECT doc_id, text FROM documents),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 89 = 0 THEN text || ' [rev]' ELSE text END
               AS text
      FROM documents WHERE doc_id % 97 != 0
    ),
    j AS (
      SELECT o.doc_id AS od, n.doc_id AS nd, o.text AS ot, n.text AS nt
      FROM old o FULL OUTER JOIN new n USING (doc_id)
    )
    SELECT
      CAST(sum(CASE WHEN od IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
      CAST(sum(CASE WHEN nd IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      CAST(sum(CASE WHEN od IS NULL AND nd IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_added,
      CAST(sum(CASE WHEN od IS NOT NULL AND nd IS NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_removed,
      CAST(sum(CASE WHEN od IS NOT NULL AND nd IS NOT NULL AND ot != nt
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      CAST(sum(CASE WHEN ot = nt THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
    FROM j
    """,
    doc="Dataset version diff (added/removed/changed/unchanged between "
    "two corpus snapshots): one fingerprint-keyed full-outer join + a "
    "global conditional-counter hash-agg; the catalog entry diffs the "
    "corpus against a deterministic synthetic refresh (3%% of ids "
    "dropped, ~1%% of texts revised).",
)
def p64(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import corpus_diff

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 97 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 89 == 0, F.concat(F.col("text"), F.lit(" [rev]"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(docs, new)


STYLE_B = 1024


@register(
    "x65_source_style_distance",
    "text",
    f"""
    WITH toks AS (
      SELECT source AS src, unnest({_TOKS}) AS tok FROM documents
    ),
    cnt AS (
      SELECT src, {_DUCK_POLY_FP.format(col="tok")} % {STYLE_B} AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY src, {_DUCK_POLY_FP.format(col="tok")} % {STYLE_B}
    ),
    tot AS (SELECT src, sum(c) AS t FROM cnt GROUP BY src),
    withp AS (
      SELECT cnt.src, cnt.bucket,
             CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p
      FROM cnt JOIN tot USING (src)
    ),
    pairs AS (
      SELECT a.src AS source_a, b.src AS source_b,
             abs(a.p - b.p) AS term, a.p AS pa, b.p AS pb
      FROM withp a JOIN withp b USING (bucket)
      WHERE a.src < b.src
    ),
    agg AS (
      SELECT source_a, source_b,
             CAST(sum(CAST(round(term, 9) AS DECIMAL(18,9))) AS DOUBLE)
               AS sab,
             CAST(sum(CAST(round(pa, 9) AS DECIMAL(18,9))) AS DOUBLE) AS spa,
             CAST(sum(CAST(round(pb, 9) AS DECIMAL(18,9))) AS DOUBLE) AS spb
      FROM pairs GROUP BY source_a, source_b
    )
    , allp AS (
      SELECT a.src AS source_a, b.src AS source_b
      FROM tot a CROSS JOIN tot b WHERE a.src < b.src
    )
    SELECT allp.source_a, allp.source_b,
           round(0.5 * (coalesce(sab, 0.0)
                        + greatest(1.0 - coalesce(spa, 0.0), 0.0)
                        + greatest(1.0 - coalesce(spb, 0.0), 0.0)), 6)
             AS tv_distance
    FROM allp LEFT JOIN agg USING (source_a, source_b)
    ORDER BY source_a, source_b
    """,
    doc="Pairwise source STYLE distance: total-variation between "
    "hashed token distributions (x59 finds sources that COPY each "
    "other, this finds sources that WRITE alike). One corpus-sized "
    "hash-agg of counts; pairs and TV close on the KB bucket tables "
    "with one-sided buckets handled algebraically (Σp = 1).",
)
def p65(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import (
        source_style_distance,
    )

    return source_style_distance(
        load_table(spark, sf_dir, "documents"),
        n_buckets=STYLE_B,
        hash_mode="poly",
    )


EVAL_K = 2
EVAL_BANDS = 4


@register(
    "x66_eval_slice",
    "sampling",
    f"""
    WITH per AS (
      SELECT source AS src, doc_id, text,
             len({_TOKS}) AS n_tok,
             len(list_distinct({_TOKS})) AS n_dis
      FROM documents
    ),
    q AS (
      SELECT src, doc_id, text,
             least(CAST(floor(coalesce(
                 0.5 * (CAST(n_dis AS DOUBLE) / nullif(n_tok, 0))
                 + 0.5 * least(1.0, n_tok / 100.0), 0.0)
               * {EVAL_BANDS}) AS INTEGER), {EVAL_BANDS - 1}) AS band
      FROM per
    ),
    r AS (
      SELECT src, band, doc_id,
             row_number() OVER (PARTITION BY src, band
                                ORDER BY {_DUCK_POLY_FP.format(col="text")},
                                         doc_id) AS rank
      FROM q
    )
    SELECT src, band, CAST(rank AS INTEGER) AS rank, doc_id
    FROM r WHERE rank <= {EVAL_K}
    ORDER BY src, band, rank
    """,
    doc="Balanced eval-slice builder: k docs per (source × quality "
    "band), hash-ranked for deterministic pseudorandomness — equal "
    "representation for every feed and quality regime where a uniform "
    "sample over-weights the modal stratum. WindowGroupLimit rank; "
    "one scan at any corpus size.",
)
def p66(spark, sf_dir):
    from etsd_time_series_database_spark.operators.sampling import eval_slice

    return eval_slice(
        load_table(spark, sf_dir, "documents"), k=EVAL_K, n_bands=EVAL_BANDS
    )


# ----------------------------------------------------- mixture planning


@register(
    "x67_mixture_plan",
    "sampling",
    f"""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens,
             CAST(CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS BIGINT)
               AS weight
      FROM documents GROUP BY source
    ),
    p AS (
      SELECT *, sum(weight) OVER () AS w_all,
             sum(n_tokens) OVER () AS t_all,
             n_tokens * sum(weight) OVER () // weight AS cap
      FROM s
    ),
    m AS (SELECT *, min(cap) OVER () AS nstar FROM p)
    SELECT source, n_docs, n_tokens, weight,
           round(CAST(n_tokens AS DOUBLE) / t_all, 6) AS natural_share,
           round(CAST(weight AS DOUBLE) / w_all, 6) AS target_share,
           CAST(weight * nstar // w_all AS BIGINT) AS take_tokens,
           round(CAST(weight * nstar // w_all AS DOUBLE) / n_tokens, 6)
             AS sampling_rate,
           CAST(cap = nstar AS INT) AS limiting
    FROM m ORDER BY source
    """,
    doc="Training-mixture planner: per-source token supply vs target "
    "weights -> the largest no-upsampling corpus (N* = min over "
    "sources of supply x total-weight / weight), each source's token "
    "take, sampling rate, and the limiting-source flag. Integer "
    "sizing end-to-end; planning windows ride the one-row-per-source "
    "table.",
)
def p67(spark, sf_dir):
    from etsd_time_series_database_spark.operators.sampling import mixture_plan

    # the 1..4 weight spread is derived from the testdata's srcN
    # naming — fixture-coupled, so it is passed HERE, explicitly;
    # the library default is lit(1) (natural mix)
    srcn_weight = F.substring(F.col("source"), 4, 10).cast("bigint") % 4 + 1
    return mixture_plan(
        load_table(spark, sf_dir, "documents"), weight=srcn_weight
    )


@register(
    "x68_pii_scan",
    "quality",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(text,
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text,
             '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_idnum,
           CAST((len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(text,
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
             + len(regexp_extract_all(text,
             '\b\d{3}-\d{2}-\d{4}\b'))) > 0 AS INT) AS has_pii
    FROM documents ORDER BY doc_id
    """,
    doc="Per-document PII pattern counts (emails, phone-shaped, "
    "SSN-shaped) + has_pii flag — the pre-training redaction gate. "
    "Scan-side regexp_count only (no shuffle, no UDF); patterns "
    "restricted to syntax with identical Java-regex/RE2 semantics.",
)
def p68(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import pii_scan

    return pii_scan(load_table(spark, sf_dir, "documents"))


@register(
    "x69_quality_percentile",
    "text",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             round(0.5 * (len(list_distinct({_TOKS})) / len({_TOKS}))
                   + 0.5 * least(1.0, len({_TOKS}) / 100.0), 6) AS quality
      FROM documents
    )
    SELECT doc_id, source, quality,
           round(percent_rank() OVER (PARTITION BY source
                                      ORDER BY quality), 6) AS quality_pct
    FROM t ORDER BY doc_id
    """,
    doc="Rank-based quality calibration: x17 quality mapped to its "
    "percent rank WITHIN source — the cross-source comparable score "
    "when feeds have incomparable raw-quality scales. Exact "
    "percent_rank with no per-source global sort: value-bucketed "
    "counts + per-source offset table (the x48 order-aligned "
    "pattern), min-rank ties — parallelism sources x buckets.",
)
def p69(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import (
        quality_percentile,
    )

    return quality_percentile(load_table(spark, sf_dir, "documents"))


@register(
    "x70_bigram_surprisal",
    "text",
    f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    bg AS (
      SELECT doc_id, p[1] AS prev, p[2] AS cur
      FROM (SELECT doc_id, unnest(list_zip(t[:len(t)-1], t[2:])) AS p
            FROM tok)
    ),
    v AS (
      SELECT prev, cur, CAST(count(*) AS BIGINT) AS bf
      FROM bg GROUP BY prev, cur
    ),
    c AS (SELECT prev, CAST(sum(bf) AS BIGINT) AS cf FROM v GROUP BY prev),
    r AS (
      SELECT bg.doc_id, c.cf // v.bf AS rar
      FROM bg JOIN v USING (prev, cur) JOIN c USING (prev)
    ),
    g AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS nb,
             round(CAST(sum(rar) AS DOUBLE) / count(*), 6)
               AS mean_cond_rarity,
             CAST(max(rar) AS BIGINT) AS max_cond_rarity
      FROM r GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(g.nb, 0) AS BIGINT) AS n_bigrams,
           g.mean_cond_rarity, g.max_cond_rarity
    FROM documents d LEFT JOIN g USING (doc_id)
    ORDER BY d.doc_id
    """,
    headline=True,
    doc="Bigram conditional-rarity scoring: rarity = context_freq div "
    "bigram_freq (exact BIGINT, monotone in -log P(cur|prev)) — the "
    "order-sensitive perplexity proxy that catches shuffled/gibberish "
    "text unigram rarity cannot. Bigrams shuffle as xxhash64 keys "
    "(raw strings never leave the scan stage); context totals "
    "re-aggregate from the bigram vocab, one corpus pass total.",
)
def p70(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import (
        bigram_surprisal,
    )

    return bigram_surprisal(load_table(spark, sf_dir, "documents"))


@register(
    "x71_label_dispersion",
    "similarity",
    """
    WITH nrm AS (
      SELECT label, vec_id,
             sqrt(list_reduce(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (p, q) -> p + q)) AS nv,
             embedding
      FROM embeddings
    ),
    u AS (
      SELECT label, vec_id,
             list_transform(embedding,
               x -> round(CAST(x AS DOUBLE) / nv, 6)) AS uv
      FROM nrm WHERE nv > 0
    ),
    d AS (
      SELECT label, generate_subscripts(uv, 1) AS dim,
             unnest(uv) AS ud
      FROM u
    ),
    dims AS (
      SELECT label, dim,
             sum(CAST(ud AS DECIMAL(18,6))) AS s,
             sum(CAST(ud * ud AS DECIMAL(28,12))) AS q,
             CAST(count(*) AS BIGINT) AS cnt
      FROM d GROUP BY label, dim
    )
    SELECT label,
           CAST(max(cnt) AS BIGINT) AS n_vecs,
           CASE WHEN max(cnt) > 1 THEN
             round((sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    - CAST(sum(q) AS DOUBLE))
                   / (CAST(max(cnt) AS DOUBLE)
                      * (CAST(max(cnt) AS DOUBLE) - 1.0)), 6)
           END AS mean_pairwise_cos,
           round(sqrt(sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
                 / CAST(max(cnt) AS DOUBLE), 6) AS centroid_norm
    FROM dims GROUP BY label ORDER BY label
    """,
    doc="Within-label embedding dispersion: mean pairwise cosine among "
    "a class's unit-normalized members WITHOUT a pairs table — for "
    "unit vectors sum-of-pairwise-cos closes from per-dimension "
    "component sums ((||sum u||^2 - sum ||u||^2) / n(n-1)), so one "
    "posexplode pass + one (label, dim) DECIMAL hash-agg replaces an "
    "impossible n^2 join. The intra-class dual of x63's separability "
    "matrix.",
)
def p71(spark, sf_dir):
    from etsd_time_series_database_spark.operators.similarity import (
        label_dispersion,
    )

    return label_dispersion(load_table(spark, sf_dir, "embeddings"))


@register(
    "x72_integrity_audit",
    "audit",
    """
    WITH j AS (
      SELECT d.doc_id AS id, d.source, e.vec_id AS vid
      FROM documents d FULL OUTER JOIN embeddings e
        ON d.doc_id = e.vec_id
    )
    SELECT coalesce(source, '__dangling__') AS source,
           CAST(count(id) AS BIGINT) AS n_docs,
           CAST(count(CASE WHEN id IS NOT NULL AND vid IS NOT NULL
                           THEN 1 END) AS BIGINT) AS n_with_vec,
           CAST(count(CASE WHEN vid IS NULL THEN 1 END) AS BIGINT)
             AS n_missing_vec,
           CAST(count(CASE WHEN id IS NULL THEN 1 END) AS BIGINT)
             AS n_dangling_vec,
           CASE WHEN count(id) > 0 THEN
             round(CAST(count(CASE WHEN id IS NOT NULL
                                    AND vid IS NOT NULL THEN 1 END)
                        AS DOUBLE) / count(id), 6)
           END AS coverage_pct
    FROM j GROUP BY coalesce(source, '__dangling__')
    ORDER BY source
    """,
    doc="Referential-integrity audit documents <-> embeddings: per "
    "source the embedding coverage fraction, missing-vector and "
    "dangling-vector counts (dangling under '__dangling__'). One "
    "id-only full-outer join (text and vectors never travel) + one "
    "hash-agg; the pre-training join-health gate.",
)
def p72(spark, sf_dir):
    from etsd_time_series_database_spark.operators.sampling import (
        integrity_audit,
    )

    return integrity_audit(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )


def _band_cte(docs_filter: str) -> str:
    """The x06 MinHash band pipeline as a reusable CTE body, over a
    filtered slice of documents (portable poly-hash shingle ids)."""
    hp_rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_PARAMS)
    )
    sid = _DUCK_POLY_FP.format(col="sh.shingle")
    return f"""
      SELECT doc_id, j // 2 AS band,
             string_agg(CAST(h AS VARCHAR), ',' ORDER BY j) AS sig
      FROM (
        SELECT sh.doc_id, hp.j,
               MIN((hp.a * ({sid}) + hp.b) % {MINHASH_P}) AS h
        FROM (
          SELECT DISTINCT doc_id, shingle
          FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle
                FROM (SELECT doc_id, {_TOKS} AS toks FROM documents
                      WHERE {docs_filter}))
        ) sh CROSS JOIN (VALUES {hp_rows}) hp(j, a, b)
        GROUP BY sh.doc_id, hp.j
      ) mh GROUP BY doc_id, band
    """


@register(
    "x73_incremental_dedup_probe",
    "dedup",
    f"""
    WITH idx AS ({_band_cte("doc_id % 3 != 0")}),
    newb AS ({_band_cte("doc_id % 3 = 0")})
    SELECT n.doc_id AS new_id, i.doc_id AS index_id,
           CAST(count(*) AS BIGINT) AS n_shared_bands
    FROM newb n JOIN idx i ON n.band = i.band AND n.sig = i.sig
    GROUP BY n.doc_id, i.doc_id
    ORDER BY new_id, index_id
    """,
    doc="Cross-run dedup probe: a NEW shard's MinHash band table "
    "joined against the persisted corpus index (here simulated as a "
    "doc_id split: corpus = id%3!=0, shard = id%3=0) — which incoming "
    "docs near-dup-collide with history, without recomputing corpus "
    "signatures. One (band, sig) equi-join; the shard side broadcasts "
    "so the corpus-sized index never shuffles. The persisted layout "
    "(write/append/probe under a band-partitioned parquet index) is "
    "CLI- and pytest-driven; this entry pins the join semantics.",
)
def p73(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import (
        minhash_band_table,
        new_vs_index_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = minhash_band_table(
        docs.filter(F.col("doc_id") % 3 != 0), hash_mode="poly"
    )
    new = minhash_band_table(
        docs.filter(F.col("doc_id") % 3 == 0), hash_mode="poly"
    )
    return new_vs_index_candidates(new, idx).orderBy("new_id", "index_id")


@register(
    "x74_incremental_dedup_survivors",
    "dedup",
    f"""
    WITH idx AS ({_band_cte("doc_id % 3 != 0")}),
    newb AS ({_band_cte("doc_id % 3 = 0")}),
    cross_hits AS (
      SELECT DISTINCT n.doc_id
      FROM newb n JOIN idx i ON n.band = i.band AND n.sig = i.sig
    ),
    in_run_hits AS (
      SELECT DISTINCT x.doc_id
      FROM newb x JOIN newb y
        ON x.band = y.band AND x.sig = y.sig AND x.doc_id > y.doc_id
    )
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.doc_id % 3 = 0
      AND d.doc_id NOT IN (SELECT doc_id FROM cross_hits)
      AND d.doc_id NOT IN (SELECT doc_id FROM in_run_hits)
    ORDER BY d.doc_id
    """,
    doc="The full incremental-dedup decision for a shard: drop docs "
    "that collide with the persisted index OR with an earlier-keyed "
    "doc inside the shard (keep-lowest-key), emit the survivors that "
    "would be appended to the index. Ids-only anti-joins; text never "
    "shuffles. Same simulated corpus/shard split as x73. Since round "
    "12 this is the PAIR-FORM mirror (the verification formulation); "
    "the production pair-free path is x85, which carries the headline "
    "bench number — this entry keeps the pair join on purpose as the "
    "cross-check of the bucket-statistics rewrite.",
)
def p74(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import (
        minhash_band_table,
        new_vs_index_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = minhash_band_table(
        docs.filter(F.col("doc_id") % 3 != 0), hash_mode="poly"
    )
    shard = docs.filter(F.col("doc_id") % 3 == 0)
    new = minhash_band_table(shard, hash_mode="poly")
    cross_hits = (
        new_vs_index_candidates(new, idx)
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    x, y = new.alias("x"), new.alias("y")
    in_run_hits = (
        x.join(
            y,
            on=(F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.doc_id") > F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_id"))
        .distinct()
    )
    drop = cross_hits.unionByName(in_run_hits).distinct()
    return (
        shard.join(drop, on="doc_id", how="left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _x75_oracle() -> str:
    hp_rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_PARAMS)
    )
    sid = _DUCK_POLY_FP.format(col="sh.shingle")
    return f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle
      FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents))
    ),
    hp(j, a, b) AS (VALUES {hp_rows}),
    mh AS (
      SELECT sh.doc_id, hp.j, MIN((hp.a * ({sid}) + hp.b) % {MINHASH_P}) AS h
      FROM sh CROSS JOIN hp GROUP BY sh.doc_id, hp.j
    ),
    bands AS (
      SELECT doc_id, j // 2 AS band,
             string_agg(CAST(h AS VARCHAR), ',' ORDER BY j) AS sig
      FROM mh GROUP BY doc_id, band
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
    ),
    est AS (
      SELECT c.doc_a, c.doc_b,
             avg(CASE WHEN a.h = b.h THEN 1.0 ELSE 0.0 END) AS est_jaccard
      FROM cand c
      JOIN mh a ON a.doc_id = c.doc_a
      JOIN mh b ON b.doc_id = c.doc_b AND b.j = a.j
      GROUP BY c.doc_a, c.doc_b
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle
      JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT e.doc_a, e.doc_b, e.est_jaccard,
           coalesce(n_common / (sa.n_sh + sb.n_sh - n_common), 0.0)
             AS true_jaccard,
           abs(e.est_jaccard
               - coalesce(n_common / (sa.n_sh + sb.n_sh - n_common), 0.0))
             AS abs_err
    FROM est e
    LEFT JOIN common USING (doc_a, doc_b)
    JOIN sizes sa ON sa.doc_id = e.doc_a
    JOIN sizes sb ON sb.doc_id = e.doc_b
    ORDER BY e.doc_a, e.doc_b
    """


@register(
    "x75_minhash_estimate_audit",
    "dedup",
    _x75_oracle(),
    doc="Sketch-quality audit: for every LSH candidate pair, the "
    "signature-estimated Jaccard (fraction of agreeing MinHash "
    "values) vs the EXACT shingle Jaccard and the absolute error — "
    "quantifies on real data how trustworthy the sketch driving "
    "x06/x73/x74 is. Everything is candidate-bounded: signatures "
    "join 8 rows/doc, shingle tables semi-join down to candidate "
    "docs before the shared-shingle join.",
)
def p75(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import (
        minhash_estimate_audit,
    )

    return minhash_estimate_audit(
        load_table(spark, sf_dir, "documents"), hash_mode="poly"
    )


def _x76_oracle() -> str:
    fp = _DUCK_POLY_FP.format(col="text")
    winner_filter = (
        f"doc_id IN (SELECT min(doc_id) FROM documents GROUP BY {fp})"
    )
    return f"""
    WITH base AS (
      SELECT doc_id, source, len({_TOKS}) AS ntok, {fp} AS tfp
      FROM documents
    ),
    w AS (SELECT min(doc_id) AS doc_id FROM base GROUP BY tfp),
    winners AS (SELECT b.* FROM base b JOIN w USING (doc_id)),
    bands AS ({_band_cte(winner_filter)}),
    nd AS (
      SELECT DISTINCT x.doc_id
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.sig = y.sig AND x.doc_id > y.doc_id
    ),
    kept AS (
      SELECT * FROM winners WHERE doc_id NOT IN (SELECT doc_id FROM nd)
    ),
    all_s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS n_tokens
      FROM base GROUP BY source
    ),
    win_s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_exact_kept
      FROM winners GROUP BY source
    ),
    kept_s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(ntok) AS BIGINT) AS tokens_kept
      FROM kept GROUP BY source
    )
    SELECT a.source, a.n_docs, a.n_tokens,
           CAST(coalesce(w.n_exact_kept, 0) AS BIGINT) AS n_exact_kept,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(k.tokens_kept, 0) AS BIGINT) AS tokens_kept,
           round(CAST(coalesce(k.n_kept, 0) AS DOUBLE) / a.n_docs, 6)
             AS pct_docs_kept
    FROM all_s a
    LEFT JOIN win_s w USING (source)
    LEFT JOIN kept_s k USING (source)
    ORDER BY a.source
    """


@register(
    "x76_dedup_funnel",
    "dedup",
    _x76_oracle(),
    doc="Per-source dedup funnel data card: documents and tokens "
    "surviving exact dedup (keep-lowest per identical text, "
    "fingerprint-keyed so bodies never shuffle) and then near dedup "
    "over the winners (x74's keep-lowest band-collision rule) — what "
    "dedup costs each source before a training mix is committed. "
    "Drop decisions are corpus-global; reporting is per source.",
)
def p76(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import dedup_funnel

    return dedup_funnel(
        load_table(spark, sf_dir, "documents"), hash_mode="poly"
    )


@register(
    "x77_source_near_overlap",
    "dedup",
    f"""
    WITH bands AS ({_band_cte("TRUE")}),
    lab AS (
      SELECT b.doc_id, b.band, b.sig, d.source AS src
      FROM bands b JOIN documents d USING (doc_id)
    ),
    p AS (
      SELECT DISTINCT
             least(x.src, y.src) AS source_a,
             greatest(x.src, y.src) AS source_b,
             CASE WHEN x.src < y.src THEN x.doc_id ELSE y.doc_id END
               AS doc_a,
             CASE WHEN x.src < y.src THEN y.doc_id ELSE x.doc_id END
               AS doc_b
      FROM lab x JOIN lab y
        ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
      WHERE x.src != y.src
    )
    SELECT source_a, source_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT doc_a) AS BIGINT) AS n_docs_a,
           CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_b
    FROM p GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """,
    doc="Cross-source NEAR-dup matrix: per source pair, the LSH "
    "band-colliding document pairs crossing the boundary and the "
    "distinct docs involved on each side — x59's exact shingle "
    "overlap says two feeds share phrasing; this says they share "
    "near-identical documents (the decontamination/down-weighting "
    "signal). One band table + id-only source join + the "
    "collision-bounded self-join; text never travels.",
)
def p77(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import (
        source_near_overlap,
    )

    return source_near_overlap(
        load_table(spark, sf_dir, "documents"), hash_mode="poly"
    )


WATERFILL_BUDGET = 25_000  # < sf0.01's ~27k total supply, so the
# level lands between the source supplies and both regimes (saturated
# small sources, level-capped large ones) appear at the oracle scale


@register(
    "x78_waterfill_budget",
    "sampling",
    f"""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    r AS (
      SELECT *,
             row_number() OVER (ORDER BY n_tokens, source) AS k,
             coalesce(sum(n_tokens) OVER (ORDER BY n_tokens, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS pfx,
             count(*) OVER () AS n
      FROM s
    ),
    fk AS (
      SELECT min(CASE WHEN pfx + (n - k + 1) * n_tokens
                           >= {WATERFILL_BUDGET}
                 THEN k END) AS first_k
      FROM r
    ),
    lvl AS (
      SELECT coalesce(
               max(CASE WHEN r.k = fk.first_k
                   THEN ({WATERFILL_BUDGET} - r.pfx) // (r.n - r.k + 1)
                   END),
               greatest((SELECT max(n_tokens) FROM s), 0)) AS l
      FROM r, fk
    )
    SELECT r.source, r.n_docs, r.n_tokens,
           CAST(least(r.n_tokens, lvl.l) AS BIGINT) AS take_tokens,
           CASE WHEN r.n_tokens > 0
                THEN round(CAST(least(r.n_tokens, lvl.l) AS DOUBLE)
                           / r.n_tokens, 6)
           END AS sampling_rate,
           CAST(least(r.n_tokens, lvl.l) >= r.n_tokens AS INT)
             AS saturated
    FROM r, lvl ORDER BY r.source
    """,
    doc="Cap-aware token budgeting (water-filling): allocate a total "
    "budget max-min-fairly — every source gets the same level except "
    "those whose whole supply fits under it (they saturate and the "
    "leftover raises the level for the rest) — the constrained "
    "counterpart of x67's proportional mixture. Closed form on the "
    "supply-sorted per-source table: level = (budget - prefix) DIV "
    "slots at the first feasible rank; integer floor, remainder "
    "deliberately unallocated (deterministic on any engine). One "
    "corpus hash-agg, then KB-sized planning windows (the x67 shape).",
)
def p78(spark, sf_dir):
    from etsd_time_series_database_spark.operators.sampling import (
        waterfill_budget,
    )

    return waterfill_budget(
        load_table(spark, sf_dir, "documents"), WATERFILL_BUDGET
    )


# x79's parameters, shared by engine and oracle. Alpha is PINNED at
# 0.5: the power is then sqrt — IEEE-exact on both engines — while a
# general pow() differs by a ulp between libms (the library supports
# any alpha; only the gated entry needs bit-exactness).
TEMP_MIX_BUDGET = 100_000


@register(
    "x79_temperature_mixture",
    "sampling",
    f"""
    WITH s AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    t AS (SELECT *, sum(n_tokens) OVER () AS t_all FROM s),
    m AS (
      SELECT *,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)
                             / CAST(t_all AS DOUBLE)) * 1e12)
                  AS BIGINT) AS micro
      FROM t
    ),
    w AS (SELECT *, sum(micro) OVER () AS w_all FROM m)
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / CAST(t_all AS DOUBLE), 6)
             AS natural_share,
           round(CAST(micro AS DOUBLE) / CAST(w_all AS DOUBLE), 6)
             AS temp_share,
           round((CAST(micro AS DOUBLE) / CAST(w_all AS DOUBLE))
                 / (CAST(n_tokens AS DOUBLE) / CAST(t_all AS DOUBLE)), 6)
             AS boost,
           CAST(floor(CAST({TEMP_MIX_BUDGET} AS DOUBLE)
                      * CAST(micro AS DOUBLE)
                      / CAST(w_all AS DOUBLE)) AS BIGINT) AS take_tokens,
           round(CAST(floor(CAST({TEMP_MIX_BUDGET} AS DOUBLE)
                            * CAST(micro AS DOUBLE)
                            / CAST(w_all AS DOUBLE)) AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE), 6) AS epochs
    FROM w ORDER BY source
    """,
    doc="Temperature-based mixture reweighting (sample sources "
    "proportional to p^alpha, alpha=0.5): the standard "
    "multilingual/LLM data-mixing move that flattens the mix toward "
    "small sources and — unlike x67's largest no-upsampling corpus "
    "or x78's max-min-fair cap — deliberately upsamples them "
    "(epochs > 1). Determinism: alpha=0.5 makes the power an "
    "IEEE-exact sqrt, and the weight is quantized to integer "
    "micro-units so every downstream share/take is integer or "
    "identical-operand double arithmetic. One corpus hash-agg, then "
    "KB-sized planning windows (the x67 shape).",
)
def p79(spark, sf_dir):
    from etsd_time_series_database_spark.operators.sampling import (
        temperature_mixture,
    )

    return temperature_mixture(
        load_table(spark, sf_dir, "documents"),
        alpha=0.5,
        budget_tokens=TEMP_MIX_BUDGET,
    )


# x80's candidate context lengths, shared by engine and oracle —
# chosen to straddle the testdata's token distribution (10..99,
# median ~56) so truncation and padding both bite.
CTX_LENGTHS = (32, 64, 128)
_CTX_VALUES = ", ".join(f"({L})" for L in CTX_LENGTHS)


@register(
    "x80_context_length_plan",
    "packing",
    f"""
    WITH d AS (
      SELECT source, coalesce(len({_TOKS}), 0) AS tok FROM documents
    ),
    l AS (SELECT * FROM (VALUES {_CTX_VALUES}) t(ctx_len)),
    j AS (SELECT l.ctx_len, d.source, d.tok FROM d CROSS JOIN l)
    SELECT CAST(ctx_len AS BIGINT) AS ctx_len, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           CAST(count(CASE WHEN tok > ctx_len THEN 1 END) AS BIGINT)
             AS n_truncated,
           CAST(sum(least(tok, ctx_len)) AS BIGINT) AS tokens_kept,
           CAST(sum(greatest(tok - ctx_len, 0)) AS BIGINT)
             AS tokens_lost,
           round(CAST(sum(least(tok, ctx_len)) AS DOUBLE)
                 / CAST(count(*) * ctx_len AS DOUBLE), 6)
             AS pad_utilization,
           CAST((sum(least(tok, ctx_len)) + ctx_len - 1) // ctx_len
                AS BIGINT) AS packed_bins
    FROM j GROUP BY ctx_len, source ORDER BY ctx_len, source
    """,
    doc="Context-length planning sweep: per candidate L and source, "
    "documents truncated, tokens kept/lost at truncate-at-L, naive "
    "padding utilization, and the ideal packed-bin lower bound — the "
    "table read to pick a training context length before committing "
    "to the x28 packing run. Engine shape: ONE corpus hash-agg with "
    "per-L conditional columns, L unpivoted via stack on the "
    "per-source result (the corpus is never exploded |L|-fold; the "
    "oracle's CROSS JOIN is the semantic statement, not the plan).",
)
def p80(spark, sf_dir):
    from etsd_time_series_database_spark.operators.packing import (
        context_length_plan,
    )

    return context_length_plan(
        load_table(spark, sf_dir, "documents"), lengths=CTX_LENGTHS
    )


@register(
    "x81_vocab_concentration",
    "textstats",
    f"""
    WITH tf AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest({_TOKS}) AS token FROM documents)
      GROUP BY source, token
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY source
                                ORDER BY c DESC, token) AS rk
      FROM tf
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(c) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS hapax_share,
           round(CAST(sum(CASE WHEN rk <= 1 THEN c ELSE 0 END) AS DOUBLE)
                 / sum(c), 6) AS top1_cov,
           round(CAST(sum(CASE WHEN rk <= 10 THEN c ELSE 0 END) AS DOUBLE)
                 / sum(c), 6) AS top10_cov,
           round(CAST(sum(CASE WHEN rk <= 100 THEN c ELSE 0 END)
                        AS DOUBLE)
                 / sum(c), 6) AS top100_cov
    FROM r GROUP BY source ORDER BY source
    """,
    doc="Per-source vocabulary concentration — the log-free Zipf "
    "signal: vocab size, total tokens, hapax share (diverse/noisy "
    "vs templated), and top-1/10/100 token-mass coverage (steep "
    "head = boilerplate). The log-log slope would say the same "
    "through ln(), banned from gated outputs (libm ulp drift); "
    "these are rational BIGINT divisions rounded at 6. One explode "
    "+ hash-agg to (source, token) counts, one rank window over the "
    "VOCABULARY-cardinality table, one final hash-agg — text never "
    "shuffles, the window never sees corpus volume.",
)
def p81(spark, sf_dir):
    from etsd_time_series_database_spark.operators.textstats import (
        vocab_concentration,
    )

    return vocab_concentration(load_table(spark, sf_dir, "documents"))


@register(
    "x82_band_load_profile",
    "dedup",
    f"""
    WITH {_minhash_bands_ctes()},
    pb AS (
      SELECT band, sig, count(*) AS nb FROM bands GROUP BY band, sig
    )
    SELECT band,
           CAST(sum(nb) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(nb) AS BIGINT) AS max_bucket_docs,
           CAST(sum(CASE WHEN nb > 1 THEN nb ELSE 0 END) AS BIGINT)
             AS docs_in_colliding_buckets,
           CAST(sum(nb * (nb - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM pb GROUP BY band ORDER BY band
    """,
    doc="Per-band LSH bucket-load profile — the observability half of "
    "the hot-band guard: distinct buckets, the largest bucket (a "
    "degenerate corpus = one bucket holding thousands), rows in "
    "colliding buckets, and the EXACT pair-join output size "
    "candidate_pairs = sum C(bucket, 2), read BEFORE any pairwise "
    "stage runs. All-integer; two map-side-combinable hash-aggs over "
    "the band table, output = band count.",
)
def p82(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import (
        band_load_profile,
    )

    docs = load_table(spark, sf_dir, "documents")
    return band_load_profile(docs, hash_mode="poly")


@register(
    "x83_cell_balance_profile",
    "similarity",
    f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
      WHERE vec_id BETWEEN 1 AND 8
    ),
    scored AS (
      SELECT e.vec_id, c.cent_id,
             {_duck_cos("e.embedding", "c.cv")} AS cos
      FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, cent_id
      FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY cos DESC, cent_id) AS rn
            FROM scored)
      WHERE rn = 1
    ),
    counts AS (
      SELECT cent_id, CAST(count(*) AS BIGINT) AS n_vecs
      FROM assigned GROUP BY cent_id
    )
    SELECT cent_id, n_vecs,
           round(CAST(n_vecs AS DOUBLE) / sum(n_vecs) OVER (), 6)
             AS pct_corpus
    FROM counts ORDER BY cent_id
    """,
    doc="Per-cell IVF load profile — the ANN twin of x82's band-load "
    "view: vector count and corpus share per cell, read before "
    "serving. A probe of nprobe cells scans the sum of their n_vecs, "
    "so a hot cell IS the latency tail; a near-empty cell wastes a "
    "centroid. One broadcast argmax assignment + a window over the "
    "nlist-cardinality cell table (config-constant, never corpus "
    "volume).",
)
def p83(spark, sf_dir):
    from etsd_time_series_database_spark.operators.similarity import (
        cell_balance_profile,
    )

    return cell_balance_profile(
        load_table(spark, sf_dir, "embeddings"),
        centroid_ids=list(range(1, 9)),
    )


# Shared by x84 (CLI batch lifecycle) and s18 (streaming foreachBatch
# lifecycle): the ordered-arrival shard-dedup recursion unrolled.
ORDERED_SHARD_DEDUP_SQL = f"""
    WITH {_minhash_bands_ctes()},
    b1 AS (SELECT * FROM bands WHERE doc_id % 3 = 1),
    b2 AS (SELECT * FROM bands WHERE doc_id % 3 = 2),
    d2 AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
    s2_drop AS (
      SELECT DISTINCT x.doc_id FROM b2 x
      JOIN b1 i ON x.band = i.band AND x.sig = i.sig
      UNION
      SELECT DISTINCT x.doc_id FROM b2 x
      JOIN b2 y ON x.band = y.band AND x.sig = y.sig
               AND x.doc_id > y.doc_id
    ),
    s2 AS (SELECT doc_id FROM d2
           WHERE doc_id NOT IN (SELECT doc_id FROM s2_drop)),
    idx2 AS (
      SELECT * FROM b1
      UNION ALL
      SELECT b2.* FROM b2 JOIN s2 USING (doc_id)
    ),
    b0 AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
    d0 AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
    s0_drop AS (
      SELECT DISTINCT x.doc_id FROM b0 x
      JOIN idx2 i ON x.band = i.band AND x.sig = i.sig
      UNION
      SELECT DISTINCT x.doc_id FROM b0 x
      JOIN b0 y ON x.band = y.band AND x.sig = y.sig
               AND x.doc_id > y.doc_id
    ),
    s0 AS (SELECT doc_id FROM d0
           WHERE doc_id NOT IN (SELECT doc_id FROM s0_drop))
    SELECT CAST(2 AS INTEGER) AS arrival, doc_id FROM s2
    UNION ALL
    SELECT CAST(3 AS INTEGER) AS arrival, doc_id FROM s0
    ORDER BY arrival, doc_id
    """


@register(
    "x84_ordered_shard_dedup",
    "dedup",
    ORDERED_SHARD_DEDUP_SQL,
    doc="The cross-run dedup index's ORDERED-ARRIVAL lifecycle on the "
    "oracle gate, end-to-end THROUGH THE CLI (the x73/x74 semantics "
    "s14 gave the watch daemon): shard 1 (doc_id%3=1) seeds the "
    "persisted index via `dedup-index`, then shards 2 and 0 arrive "
    "in order through `dedup-probe --survivors-out` — each drops "
    "against the index AS LEFT BY THE PREVIOUS ARRIVALS (survivors' "
    "signatures only; dropped docs never pollute the index) plus the "
    "in-shard keep-lowest rule, and appends its survivors. Oracle = "
    "the recursion unrolled: stage-2 survivors from b1 collisions, "
    "stage-3 from b1 UNION stage-2-survivor bands. Pins exactly the "
    "property a daily pipeline relies on: arrival order determines "
    "the survivor set deterministically, and only kept documents "
    "gate future shards.",
)
def p84(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from etsd_time_series_database_spark import cli

    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="x84_dedup_")
    try:
        paths = {}
        for k in (1, 2, 0):
            p = os.path.join(work, f"shard{k}")
            docs.filter(F.col("doc_id") % 3 == k).write.parquet(p)
            paths[k] = p
        idx = os.path.join(work, "index")
        assert cli.main(
            ["dedup-index", paths[1], idx, "--hash-mode", "poly"],
            spark=spark,
        ) == 0
        out2 = os.path.join(work, "surv2")
        out0 = os.path.join(work, "surv0")
        assert cli.main(
            ["dedup-probe", paths[2], idx, "--survivors-out", out2],
            spark=spark,
        ) == 0
        assert cli.main(
            ["dedup-probe", paths[0], idx, "--survivors-out", out0],
            spark=spark,
        ) == 0
        res = (
            spark.read.parquet(out2)
            .select(F.lit(2).cast("int").alias("arrival"), "doc_id")
            .unionByName(
                spark.read.parquet(out0).select(
                    F.lit(3).cast("int").alias("arrival"), "doc_id"
                )
            )
            .orderBy("arrival", "doc_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return res


@register(
    "x85_pairfree_shard_dedup",
    "dedup",
    f"""
    WITH idx AS ({_band_cte("doc_id % 3 != 0")}),
    newb AS ({_band_cte("doc_id % 3 = 0")}),
    cross_hits AS (
      SELECT DISTINCT n.doc_id
      FROM newb n JOIN idx i ON n.band = i.band AND n.sig = i.sig
    ),
    in_run_hits AS (
      SELECT DISTINCT x.doc_id
      FROM newb x JOIN newb y
        ON x.band = y.band AND x.sig = y.sig AND x.doc_id > y.doc_id
    )
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.doc_id % 3 = 0
      AND d.doc_id NOT IN (SELECT doc_id FROM cross_hits)
      AND d.doc_id NOT IN (SELECT doc_id FROM in_run_hits)
    ORDER BY d.doc_id
    """,
    headline=True,
    doc="x74's shard-dedup decision computed by the PRODUCTION "
    "pair-free path — the code `dedup-probe` actually runs "
    "(round-11 verdict #2: the headline bench number must track it): "
    "cross-run drops from per-bucket (count, min) statistics of only "
    "the index rows whose signatures the shard touches "
    "(operators.dedup.index_collision_ids — shard signatures "
    "broadcast, the corpus-sized index never shuffles raw rows), "
    "in-run keep-lowest from the bucket-min window form "
    "(keep_lowest_drop_ids) — no pair enumeration anywhere, so a "
    "degenerate hot band costs linear work (33x/6.6x measured at a "
    "forced 20k-doc band, scripts/bench_band_hotspot.py). Same "
    "corpus split, same survivors, same oracle as x74, which stays "
    "registered as the pair-form mirror.",
)
def p85(spark, sf_dir):
    from etsd_time_series_database_spark.operators.dedup import (
        index_collision_ids,
        keep_lowest_drop_ids,
        minhash_band_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = minhash_band_table(
        docs.filter(F.col("doc_id") % 3 != 0), hash_mode="poly"
    )
    shard = docs.filter(F.col("doc_id") % 3 == 0)
    new = minhash_band_table(shard, hash_mode="poly")
    cross_hits, _already = index_collision_ids(new, idx)
    in_run_hits = keep_lowest_drop_ids(new)
    drop = cross_hits.unionByName(in_run_hits).distinct()
    return (
        shard.join(drop, on="doc_id", how="left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _rebalance_oracle(nlist: int = 8, n_iter: int = 2) -> str:
    """x86's oracle: the targeted IVF rebalance unrolled in SQL.
    Initial assignment over the seed centroids, hot cells by the
    all-integer rule 80*n > 11*total (= n > 1.1x the mean cell size,
    no float threshold), then the per-hot-cell local Lloyd split
    (seeds = each hot cell's two lowest keys) run GROUPED by home
    cell — the relational form of the operator's per-cell loop — and
    fresh sub-cell ids allocated exactly like the operator: hot cells
    ascending, sub-seeds ascending, starting at max(cent_id) + 1.
    Same sequential-fold cosine and exact-decimal means as x30."""
    cos0 = _duck_cos("d.v", "c.cv")
    cosh = _duck_cos("h.v", "c.cv")
    sql = f"""
    WITH d AS (SELECT vec_id, embedding AS v FROM embeddings),
    cents AS (
      SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
      WHERE vec_id BETWEEN 1 AND {nlist}
    ),
    s0 AS (
      SELECT d.vec_id, d.v, c.cent_id, {cos0} AS cos
      FROM d CROSS JOIN cents c
    ),
    a0 AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, cent_id) AS rk
        FROM s0) WHERE rk = 1
    ),
    counts AS (SELECT cent_id, count(*) AS n FROM a0 GROUP BY cent_id),
    hot AS (
      SELECT cent_id FROM counts
      WHERE 80 * n > 11 * (SELECT sum(n) FROM counts)
    ),
    hd AS (SELECT a0.vec_id, a0.v, a0.cent_id AS home FROM a0
           JOIN hot ON a0.cent_id = hot.cent_id),
    c0 AS (
      SELECT home, vec_id AS scid, v AS cv, srk FROM (
        SELECT home, vec_id, v, row_number() OVER (
          PARTITION BY home ORDER BY vec_id) AS srk
        FROM hd) t WHERE srk <= 2
    )"""
    for i in range(1, n_iter + 1):
        sql += f""",
    t{i} AS (
      SELECT h.vec_id, h.v, h.home, c.scid, {cosh} AS cos
      FROM hd h JOIN c{i - 1} c ON h.home = c.home
    ),
    b{i} AS (
      SELECT vec_id, v, home, scid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, scid) AS rk
        FROM t{i}) WHERE rk = 1
    ),
    e{i} AS (
      SELECT home, scid, unnest(v) AS val,
             unnest(range(1, len(v) + 1)) AS pos
      FROM b{i}
    ),
    u{i} AS (
      SELECT home, scid, pos,
             CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(38,12)))
                  AS DOUBLE) / count(*) AS cval
      FROM e{i} GROUP BY home, scid, pos
    ),
    c{i} AS (
      SELECT home, scid, list(CAST(cval AS REAL) ORDER BY pos) AS cv
      FROM u{i} GROUP BY home, scid
    )"""
    sql += f""",
    tf AS (
      SELECT h.vec_id, c.home, c.scid, {cosh} AS cos
      FROM hd h JOIN c{n_iter} c ON h.home = c.home
    ),
    bf AS (
      SELECT vec_id, home, scid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY cos DESC, scid) AS rk
        FROM tf) WHERE rk = 1
    ),
    hm AS (SELECT cent_id AS home, row_number() OVER (ORDER BY cent_id)
             AS hrk FROM hot),
    idmap AS (
      SELECT c0.home, c0.scid,
             {nlist} + (hm.hrk - 1) * 2 + c0.srk AS new_id
      FROM c0 JOIN hm ON c0.home = hm.home
    )
    SELECT CAST(bf.vec_id AS BIGINT) AS vec_id,
           CAST(idmap.new_id AS INTEGER) AS cent_id
    FROM bf JOIN idmap ON bf.home = idmap.home AND bf.scid = idmap.scid
    UNION ALL
    SELECT CAST(a0.vec_id AS BIGINT) AS vec_id,
           CAST(a0.cent_id AS INTEGER) AS cent_id
    FROM a0 WHERE a0.cent_id NOT IN (SELECT cent_id FROM hot)
    ORDER BY vec_id
    """
    return sql


@register(
    "x86_ivf_rebalance",
    "similarity",
    _rebalance_oracle(),
    doc="Targeted IVF rebalance end-to-end through the PARTITIONED "
    "LAYOUT (round-11 verdict #3 — x83 observes the hot cell, this "
    "acts on it): build the cell-partitioned index from seed "
    "centroids 1..8, find cells over 1.1x the mean size (all-integer "
    "rule 80*n > 11*total), split ONLY those via a local 2-iteration "
    "Lloyd over each hot cell's own directory (seeds = the cell's "
    "two lowest keys; sub-cells get fresh ids max+1.. in hot-cell/"
    "seed order), install through the staged-rename swap, and emit "
    "the full post-rebalance (vec_id, cent_id) assignment. Untouched "
    "cells are never read or rewritten (operators.similarity."
    "rebalance_cells; pinned in tests/test_scale_layout.py); the "
    "corpus-wide alternative this replaces is a full re-cluster. "
    "Oracle = the same operation unrolled: grouped local Lloyd CTEs "
    "+ the id-allocation rule. Reference analog: none (the ANN "
    "serving half of the brief).",
)
def p86(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from etsd_time_series_database_spark.operators.similarity import (
        rebalance_cells,
        write_ivf_partitioned,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    work = tempfile.mkdtemp(prefix="x86_ivf_")
    try:
        path = os.path.join(work, "index")
        write_ivf_partitioned(
            emb, centroid_ids=list(range(1, 9)), path=path
        )
        total = spark.read.parquet(path).count()
        # n > 11*total/80  <=>  80*n > 11*total (the oracle's rule)
        rebalance_cells(
            spark, path,
            hot_threshold=11 * total // 80,
            empty_threshold=-1,  # split-only: retirement is pytest-gated
        )
        res = (
            spark.read.parquet(path)
            .select("vec_id", "cent_id")
            .orderBy("vec_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return res


def _rebalance_full_oracle(nlist: int = 8, n_iter: int = 2) -> str:
    """x87's oracle: the COMPLETE rebalance_cells contract unrolled —
    x86's split CTEs (hot cells via the all-integer 80*n > 11*total
    rule, per-hot-cell local Lloyd, fresh-id allocation) PLUS the
    retirement side x86 deliberately left out: cells at the minimum
    occupancy (and not hot) retire, and their stragglers reassign by
    max-cosine (ties: lowest id) against the NEW geometry — surviving
    seed centroids union the freshly split sub-centroids — exactly the
    engine's post-split ivf_append pass. Zero-occupancy seed cells
    (absent from the grouped counts) are covered by the LEFT JOIN
    (n = 0 <= min) so both sides retire them identically."""
    cos0 = _duck_cos("d.v", "c.cv")
    cosh = _duck_cos("h.v", "c.cv")
    coss = _duck_cos("s.v", "g.cv")
    split = _rebalance_oracle(nlist=nlist, n_iter=n_iter)
    # reuse the split oracle's WITH-chain verbatim; extend it past
    # `idmap` and replace the final SELECT with the three-way union
    head, _tail = split.rsplit("    SELECT CAST(bf.vec_id", 1)
    return head + f""",
    ccounts AS (
      SELECT c.cent_id, COALESCE(cnt.n, 0) AS n
      FROM cents c LEFT JOIN counts cnt ON c.cent_id = cnt.cent_id
    ),
    ret AS (
      SELECT cent_id FROM ccounts
      WHERE n <= (SELECT min(n) FROM counts)
        AND cent_id NOT IN (SELECT cent_id FROM hot)
    ),
    newgeo AS (
      SELECT idmap.new_id AS cent_id, c.cv
      FROM c{n_iter} c
      JOIN idmap ON c.home = idmap.home AND c.scid = idmap.scid
      UNION ALL
      SELECT cent_id, cv FROM cents
      WHERE cent_id NOT IN (SELECT cent_id FROM hot)
        AND cent_id NOT IN (SELECT cent_id FROM ret)
    ),
    strag AS (
      SELECT a0.vec_id, a0.v FROM a0
      JOIN ret ON a0.cent_id = ret.cent_id
    ),
    sre AS (
      SELECT vec_id, cent_id FROM (
        SELECT s.vec_id, g.cent_id, {coss} AS cos,
               row_number() OVER (PARTITION BY s.vec_id
                                  ORDER BY {coss} DESC, g.cent_id) AS rk
        FROM strag s CROSS JOIN newgeo g) t WHERE rk = 1
    )
    SELECT CAST(bf.vec_id AS BIGINT) AS vec_id,
           CAST(idmap.new_id AS INTEGER) AS cent_id
    FROM bf JOIN idmap ON bf.home = idmap.home AND bf.scid = idmap.scid
    UNION ALL
    SELECT CAST(a0.vec_id AS BIGINT) AS vec_id,
           CAST(a0.cent_id AS INTEGER) AS cent_id
    FROM a0 WHERE a0.cent_id NOT IN (SELECT cent_id FROM hot)
      AND a0.cent_id NOT IN (SELECT cent_id FROM ret)
    UNION ALL
    SELECT CAST(sre.vec_id AS BIGINT) AS vec_id,
           CAST(sre.cent_id AS INTEGER) AS cent_id
    FROM sre
    ORDER BY vec_id
    """


@register(
    "x87_ivf_rebalance_retire",
    "similarity",
    _rebalance_full_oracle(),
    doc="The FULL rebalance_cells contract oracle-gated in one entry "
    "(round-12 verdict #3 — x86 models the split side only): same "
    "seed-1..8 layout and hot rule, plus empty_threshold = the "
    "minimum cell occupancy, so the smallest cell(s) RETIRE and "
    "their stragglers reassign by max-cosine against the "
    "post-split geometry (surviving seeds + fresh sub-cells) through "
    "the engine's ivf_append path — the fixture forces >= 1 retired "
    "cell with stragglers at every SF (probed: sf0.001 retires cell "
    "7, sf0.01 cell 4, sf0.1 cell 8). Oracle = x86's split CTEs "
    "extended with retire + nearest-survivor reassignment. Untouched "
    "dirs byte-identical and _centroids swapped atomically as "
    "before (tests/test_scale_layout.py). Reference analog: none "
    "(the ANN serving half of the brief).",
)
def p87(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from etsd_time_series_database_spark.operators.similarity import (
        rebalance_cells,
        write_ivf_partitioned,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    work = tempfile.mkdtemp(prefix="x87_ivf_")
    try:
        path = os.path.join(work, "index")
        write_ivf_partitioned(
            emb, centroid_ids=list(range(1, 9)), path=path
        )
        occ = (
            spark.read.parquet(path)
            .groupBy("cent_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.sum("n").alias("total"), F.min("n").alias("mn")
            )
            .collect()[0]
        )
        stats = rebalance_cells(
            spark, path,
            hot_threshold=11 * int(occ["total"]) // 80,
            empty_threshold=int(occ["mn"]),
        )
        assert stats["retired"] and stats["reassigned"] > 0, stats
        res = (
            spark.read.parquet(path)
            .select("vec_id", "cent_id")
            .orderBy("vec_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return res
