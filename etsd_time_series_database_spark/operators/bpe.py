"""Distributed BPE vocabulary induction — the tokenizer-training step
of an LLM data pipeline (Sennrich et al. 2016 byte-pair encoding),
run as an iterative sequence of bounded Spark aggregations.

The corpus is first collapsed to its *distinct-word frequency table*
(one shuffle over the raw tokens, map-side combinable), after which
every Lloyd-style merge round touches only vocabulary-sized data:

  1. adjacent symbol-pair counts — ``explode`` of per-word pair
     structs, one hash-agg keyed by (l, r); input is the vocab table,
     so the shuffle is O(vocab x symbols), never O(corpus);
  2. argmax pair — ``TakeOrderedAndProject(limit=1)`` with a total
     (count DESC, l, r) tie-break, so the merge choice is
     deterministic on any engine and any partitioning;
  3. merge application — a left-fold over each word's symbol array
     (``F.aggregate`` JVM lambda): greedy left-to-right non-overlap,
     the classic BPE semantics (counting, per BPE convention, still
     sees overlapping pairs — "aaa" counts (a,a) twice but merges
     once). The 1-row winner joins in via a broadcast-able
     ``LEFT JOIN ON TRUE`` — **no ``.collect()`` anywhere**; control
     flow stays declarative and the driver never sees data.

Each round ends with ``localCheckpoint`` on the (small) vocab table:
without it the plan doubles per iteration (the table feeds both the
pair count and the merge), which is the standard iterative-lineage
trap (same policy as the x09 label-propagation and x30 k-means
loops). The 1-row winner is deliberately NOT checkpointed: it is
deterministic (total tie-break) and re-derives from the checkpointed
previous vocab, so skipping its eager job saves ~12% wall per
training run while lineage stays bounded.

At 100 TB the only corpus-sized work is the initial word count; BPE
rounds run on the vocabulary (millions of rows at web scale) and are
independent of corpus size — exactly why tokenizer training is
feasible at all.

Verification: the whole induction, fold included, is expressible in
ANSI-ish SQL (DuckDB ``list_reduce`` with a separator-string
accumulator), so the catalog entry is hash-gated against a DuckDB
oracle like every other operator — see ``plans/pipeline.py``
(x45_bpe_vocab) for the generated k-round CTE chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etsd_time_series_database_spark.operators.textstats import _tokens


def _char_syms(word: Column) -> Column:
    """Split a word into single-character symbols (JVM split + filter;
    Java regex split keeps a trailing empty element under limit=-1,
    hence the filter)."""
    return F.filter(F.split(word, ""), lambda x: x != "")


def _pair_structs(syms: str) -> Column:
    """Adjacent (l, r) symbol pairs as an array of structs; empty for
    single-symbol words (guarded — Spark's sequence(1, 0) would count
    DOWN, not return empty)."""
    return F.expr(
        f"CASE WHEN size({syms}) < 2 THEN array() "
        f"ELSE transform(sequence(1, size({syms}) - 1), "
        f"i -> struct({syms}[i-1] AS l, {syms}[i] AS r)) END"
    )


def _apply_merge(syms: Column, l: Column, r: Column) -> Column:
    """Greedy left-to-right merge of adjacent (l, r) -> l||r via an
    array left-fold. Non-overlap falls out of the fold: once a pair
    merges, the new last element is l||r which can never equal l
    again (r is non-empty), so "aaa" under (a,a) becomes [aa, a]."""
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (x == r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(l, r))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freq(df: DataFrame, text: str = "text") -> DataFrame:
    """Distinct-word frequency table with char-symbol arrays — the
    one corpus-sized pass of BPE training."""
    return (
        df.select(F.explode(_tokens(text)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", _char_syms(F.col("w")))
    )


def bpe_merges(
    df: DataFrame,
    n_merges: int = 8,
    text: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    merge table (rank, lhs, rhs, merged, pair_count) in merge order —
    the artifact a tokenizer ships.

    Deterministic: pair argmax tie-breaks on (count DESC, lhs, rhs);
    word counting and merge application are order-independent.
    """
    return bpe_train(df, n_merges, text, with_words=False)[0]


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text: str = "text",
    with_words: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """Full BPE training state: ``(merges, words)`` where ``merges``
    is the rank-ordered merge table and ``words`` is the vocab table
    with each distinct word's FINAL symbolization after all merges —
    the lookup a declarative encoder joins against (see
    :func:`bpe_compression`). ``with_words=False`` (the
    :func:`bpe_merges` path) skips the LAST round's merge application
    and checkpoint — the final argmax needs only the previous vocab,
    so a merges-only caller saves one full eager round — and returns
    ``(merges, None)``.

    Oracle note: the DuckDB twin encodes the symbol fold with a
    chr(31)-joined string accumulator, so cross-engine verification
    assumes no TOKEN contains that control character (the Spark fold
    itself is an array fold with no such assumption)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words = word_freq(df, text).localCheckpoint(eager=True)
    merge_rows = []
    for rank in range(1, n_merges + 1):
        pairs = words.select(
            "freq", F.explode(_pair_structs("syms")).alias("p")
        ).select("freq", "p.l", "p.r")
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .select(
                F.col("l").alias("__ml"),
                F.col("r").alias("__mr"),
                F.col("cnt").alias("__mc"),
            )
        )
        if rank == n_merges and not with_words:
            # the last round's argmax has no checkpoint to ride — the
            # merge table is complete and applying the merge is waste
            # (the :func:`bpe_merges` path) — so it stays the ONE
            # argmax the final collect computes live
            merge_rows.append(
                best.select(
                    F.lit(rank).alias("rank"),
                    F.col("__ml").alias("lhs"),
                    F.col("__mr").alias("rhs"),
                    F.concat("__ml", "__mr").alias("merged"),
                    F.col("__mc").alias("pair_count"),
                )
            )
            break
        ml, mr = F.col("__ml"), F.col("__mr")
        words_ck = (
            words.join(best, F.lit(True), "left")
            .select(
                "w",
                "freq",
                F.when(
                    ml.isNull() | (F.size("syms") < 2), F.col("syms")
                )
                .otherwise(_apply_merge(F.col("syms"), ml, mr))
                .alias("syms"),
                # carry the merge just applied on every row: the
                # eager checkpoint below then holds it, so the final
                # merge table reads ONE checkpointed row per round
                # instead of re-running each round's pair aggregation
                # + argmax (and re-building its broadcast) a second
                # time inside the collecting action (round-14
                # optimization; all-null when the vocab had no pairs,
                # filtered below exactly like the old empty argmax)
                F.col("__ml"),
                F.col("__mr"),
                F.col("__mc"),
            )
            .localCheckpoint(eager=True)
        )
        merge_rows.append(
            words_ck.filter(F.col("__ml").isNotNull())
            .limit(1)
            .select(
                F.lit(rank).alias("rank"),
                F.col("__ml").alias("lhs"),
                F.col("__mr").alias("rhs"),
                F.concat("__ml", "__mr").alias("merged"),
                F.col("__mc").alias("pair_count"),
            )
        )
        words = words_ck.drop("__ml", "__mr", "__mc")
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out.orderBy("rank"), (words if with_words else None)


def bpe_compression(
    df: DataFrame,
    n_merges: int = 8,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Per-document BPE compression accounting, fully declarative:
    train on the corpus (``bpe_train``), then join every document
    token against the trained symbol table — char symbols before,
    BPE symbols after, and the rational compression ratio (IEEE
    division of exact BIGINTs, engine-portable).

    The encode side is one shuffle of the corpus tokens joined against
    the vocab-sized symbol table (AQE broadcasts it while it fits —
    the deployment shape of a tokenizer: model table small, corpus
    big). Documents with no tokens report zero counts and a NULL
    ratio."""
    _, words = bpe_train(df, n_merges, text)
    toks = df.select(F.col(key), F.explode_outer(_tokens(text)).alias("__w"))
    joined = toks.join(words.withColumnRenamed("w", "__w"), "__w", "left")
    return (
        joined.groupBy(key)
        .agg(
            F.count("__w").cast("bigint").alias("n_words"),
            F.coalesce(F.sum(F.length("__w")), F.lit(0))
            .cast("bigint")
            .alias("n_char_syms"),
            F.coalesce(F.sum(F.size("syms")), F.lit(0))
            .cast("bigint")
            .alias("n_bpe_syms"),
        )
        .withColumn(
            "compression",
            F.try_divide(F.col("n_char_syms"), F.col("n_bpe_syms")),
        )
        .orderBy(key)
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list (rank-ordered (lhs, rhs) pairs — the
    *model*, a driver-side literal like any deployed tokenizer, not
    data) to a corpus: per document, the BPE symbol count before and
    after — the compression-accounting view used to size a vocab.
    Encoding is the same greedy fold as training, unrolled once per
    merge rank into a single codegen'd expression chain: zero shuffle
    until the per-doc rollup, no Python in the loop."""
    ranked = list(merges)
    syms = _char_syms(F.col("__w"))
    # explode_outer: token-less documents keep a row (zero counts),
    # matching bpe_compression
    toks = df.select(F.col(key), F.explode_outer(_tokens(text)).alias("__w"))
    col = syms
    for lhs, rhs in ranked:
        col = _apply_merge(col, F.lit(lhs), F.lit(rhs))
    zero_if_null = lambda c: F.when(F.col("__w").isNull(), 0).otherwise(
        F.size(c)
    )
    return (
        toks.select(
            F.col(key),
            zero_if_null(syms).alias("__n0"),
            zero_if_null(col).alias("__n1"),
        )
        .groupBy(key)
        .agg(
            F.sum("__n0").cast("bigint").alias("n_char_syms"),
            F.sum("__n1").cast("bigint").alias("n_bpe_syms"),
        )
        .orderBy(key)
    )
