"""Training-batch assembly operators: sequence packing and domain
mixture weighting.

Both are corpus-preparation steps a pre-training pipeline runs after
cleaning/dedup (operators.dedup, operators.textstats): packing turns
variable-length documents into fixed-token-budget training sequences
(the concat-then-split scheme GPT-style pipelines use), and domain
mixture computes per-source token shares plus the resampling weight
that would equalize them (the static form of domain-reweighting
schemes).

This extends the reference's scope: the reference is a numeric TSDB
(SURVEY.md §2 extension set); no reference analog exists.

Scale notes
-----------
* ``pack_sequences`` shards the corpus by ``pmod(doc_id, n_shards)``
  and runs the running-token-count window per shard — parallelism is
  ``n_shards``, one shuffle, and each sort task holds one shard. The
  default (``n_shards=None``) is the cluster's
  ``defaultParallelism``, so a big run never silently caps at a small
  fixed sort-task count; pass an explicit int for a reproducible
  layout (shard count is part of the packing contract — the catalog
  oracle pins it). Packing is deterministic given (doc order, shard
  count): doc order is the stable doc_id, never engine partitioning.
* ``domain_mix`` is one map-side-combinable hash-agg over sources
  (bounded cardinality) plus a one-row total broadcast — scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etsd_time_series_database_spark.operators.textstats import _tokens


def pack_sequences(
    df: DataFrame,
    ctx_tokens: int = 128,
    n_shards: int | None = None,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-budget training sequences ("packs")
    by the concat-then-split rule: within a shard, documents are laid
    end-to-end in ``key`` order and a document belongs to the pack
    where its FIRST token lands (``floor(exclusive-cumulative-tokens /
    ctx_tokens)``) — so packs hold whole documents and long documents
    may overflow their pack, exactly like sequence packing before a
    tokenizer-level split.

    ``n_shards=None`` (default) uses the session's
    ``defaultParallelism`` so the packing window scales with the
    cluster; the result is still deterministic FOR THAT SHARD COUNT
    (and the shard count is visible in the output), but a reproducible
    layout across clusters needs an explicit ``n_shards`` — the
    catalog oracle pins one.

    Returns one row per (shard, pack): document count, total tokens,
    and the first/last doc ids for traceability.
    """
    if n_shards is None:
        n_shards = df.sparkSession.sparkContext.defaultParallelism
    toks = df.select(
        F.col(key),
        F.pmod(F.col(key), F.lit(n_shards)).cast("int").alias("shard"),
        F.size(_tokens(text)).cast("bigint").alias("n_tokens"),
    )
    return pack_from_counts(toks, ctx_tokens, key=key)


def pack_from_counts(
    toks: DataFrame, ctx_tokens: int = 128, key: str = "doc_id"
) -> DataFrame:
    """The windowed packing core of :func:`pack_sequences` over an
    already-counted (key, shard, n_tokens BIGINT) table — for
    composites whose upstream gates have ALREADY tokenized (x54's
    clean-gate carries exact per-doc token counts), so the pack stage
    needn't re-read and re-tokenize the corpus text a second time
    (round-14 optimization; bit-identical manifest, since the gate's
    n_tokens == size(tokens) by construction)."""
    w = (
        Window.partitionBy("shard")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "pack_idx",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            / F.lit(ctx_tokens)
        ),
    )
    return (
        packed.groupBy("shard", "pack_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min(key).alias("first_doc"),
            F.max(key).alias("last_doc"),
        )
        .orderBy("shard", "pack_idx")
    )


def domain_mix(
    df: DataFrame,
    text: str = "text",
    source: str = "source",
) -> DataFrame:
    """Per-source corpus share and the uniform-target resampling
    weight: ``weight = (total_tokens / n_sources) / source_tokens`` —
    multiply a source's sampling probability by it and every source
    contributes equal tokens.

    All shares/weights are sequential IEEE divisions of exact BIGINT
    token counts, so both engines produce bit-identical doubles (the
    catalog's no-transcendentals policy).
    """
    per = df.groupBy(source).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens(text)).cast("bigint")).alias("src_tokens"),
    )
    totals = per.select(
        F.sum("src_tokens").alias("__total"),
        F.count(F.lit(1)).alias("__nsrc"),
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            source,
            "n_docs",
            "src_tokens",
            (F.col("src_tokens").cast("double") / F.col("__total")).alias(
                "token_share"
            ),
            (
                F.col("__total").cast("double")
                / F.col("__nsrc")
                / F.col("src_tokens")
            ).alias("weight"),
        )
        .orderBy(source)
    )


def context_length_plan(
    df: DataFrame,
    lengths: tuple[int, ...] = (32, 64, 128),
    text: str = "text",
    source: str = "source",
) -> DataFrame:
    """Context-length planning sweep: for each candidate training
    context length L, per source — documents truncated (tok > L),
    tokens kept/lost under truncate-at-L, the padding utilization of
    the naive one-doc-per-sequence layout (kept / (n_docs * L)), and
    the ideal packed-bin lower bound (ceil(kept / L)) — the table a
    pipeline reads to pick L before committing to a packing run
    (:func:`pack_sequences` then executes the chosen L).

    Scale shape: ONE map-side-combinable hash-agg over the corpus
    computing per-L conditional aggregates as parallel columns
    (token counting is a scan-side expression; text never shuffles),
    then the L dimension is unpivoted with ``stack`` on the
    one-row-per-source result — the corpus is NEVER exploded
    len(lengths)-fold. Everything integer except utilization
    (integer-operand division, rounded — cross-engine exact).
    """
    from etsd_time_series_database_spark.operators.sampling import (
        whitespace_token_count,
    )

    # NULL text counts as a zero-token document; without the coalesce,
    # least(NULL, L) returns L on BOTH engines (least skips NULLs), so
    # a NULL-text doc would be credited L phantom kept tokens
    tok = F.coalesce(whitespace_token_count(text), F.lit(0))
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(tok).cast("bigint").alias("n_tokens"),
    ]
    for L in lengths:
        aggs += [
            F.count(F.when(tok > L, 1)).cast("bigint").alias(f"__tr_{L}"),
            F.sum(F.least(tok, F.lit(L))).cast("bigint").alias(f"__kp_{L}"),
            F.sum(F.greatest(tok - F.lit(L), F.lit(0)))
            .cast("bigint")
            .alias(f"__ls_{L}"),
        ]
    per_src = df.groupBy(source).agg(*aggs)
    stack_args = ", ".join(
        f"{L}, __tr_{L}, __kp_{L}, __ls_{L}" for L in lengths
    )
    unpivoted = per_src.selectExpr(
        source,
        "n_docs",
        "n_tokens",
        f"stack({len(lengths)}, {stack_args}) AS "
        "(ctx_len, n_truncated, tokens_kept, tokens_lost)",
    )
    return unpivoted.select(
        F.col("ctx_len").cast("bigint").alias("ctx_len"),
        source,
        "n_docs",
        "n_tokens",
        "n_truncated",
        "tokens_kept",
        "tokens_lost",
        F.round(
            F.col("tokens_kept").cast("double")
            / (F.col("n_docs") * F.col("ctx_len")).cast("double"),
            6,
        ).alias("pad_utilization"),
        F.expr("(tokens_kept + ctx_len - 1) div ctx_len")
        .cast("bigint")
        .alias("packed_bins"),
    ).orderBy("ctx_len", source)
