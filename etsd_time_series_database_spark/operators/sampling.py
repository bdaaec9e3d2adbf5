"""Deterministic sampling and sharding for training-data pipelines.

A 100 TB corpus is never trained on whole: pipelines subsample,
stratify per source, and split into balanced shards for data-parallel
loaders. All three operators here are *deterministic* — membership is
a pure function of the row key, so re-running the pipeline (or
resuming a failed job) selects the identical subset. That property is
what `df.sample()` (seeded per-partition RNG, partition-layout
dependent) cannot give you, and why real pipelines sample by hash.

Scale shapes:
  * `hash_sample` is a pure scan-side filter — zero shuffle, and the
    predicate is cheap integer arithmetic inside whole-stage codegen;
  * `stratified_sample` shuffles once on the stratum key; per-stratum
    caps use rank-by-hash, so the kept subset is again layout-free;
  * `shard_assign` is zero-shuffle for assignment, one hash-agg for
    the balance report.

Portability: the row hash is a splitmix-style LCG step in exact
BIGINT modular arithmetic — the key is reduced mod 2^31 *before* the
multiply, so the widest intermediate is (2^31-1)*1103515245 < 2^62 and
the expression is overflow-free for ANY BIGINT key (an unreduced
key*1103515245 would wrap silently in Spark and raise in ANSI engines
at keys >= ~2^33). Spark and any ANSI oracle therefore compute
identical membership. The engine builtin (xxhash64) is the preferred
mixer at scale when cross-engine verification isn't needed; both are
exposed via ``hash_mode``, and all modulo arithmetic goes through
``pmod`` so xxhash64's signed outputs can't produce negative residues.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# LCG multiplier/increment (glibc rand constants) over modulus 2^31;
# the key is pre-reduced mod 2^31 so the product stays < 2^62 — exact
# in BIGINT for ANY key, and expressible in ANSI SQL.
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2_147_483_648


def whitespace_token_count(text: str = "text") -> Column:
    """Whitespace-split non-empty token count — the engine half of the
    shared ``_TOKS`` oracle fragment (plans/pipeline.py); every
    operator that sizes sources in tokens MUST use this one helper so
    the tokenization cannot drift between engine copies and the
    DuckDB oracle."""
    return F.size(F.filter(F.split(F.col(text), " "), lambda x: x != ""))


def key_hash(key: Column | str, hash_mode: str = "lcg") -> Column:
    """Deterministic per-row hash of an integer key column.

    'lcg' (portable, oracle-checkable):
    ((key mod 2^31) * a + c) mod 2^31, every mod non-negative (pmod).
    'xxhash64' (scale path): engine-native avalanche mixer, strictly
    better dispersion but engine-specific and SIGNED — consumers must
    take residues with pmod, never %.
    """
    c = F.col(key) if isinstance(key, str) else key
    if hash_mode == "xxhash64":
        return F.xxhash64(c)
    reduced = F.pmod(c.cast("bigint"), F.lit(LCG_M))
    return F.pmod(reduced * F.lit(LCG_A) + F.lit(LCG_C), F.lit(LCG_M))


def hash_sample(
    df: DataFrame,
    rate_permille: int,
    key: str = "doc_id",
    hash_mode: str = "lcg",
) -> DataFrame:
    """Keep rows whose key-hash falls in the lowest ``rate_permille``
    thousandths of hash space — a deterministic ~rate_permille/1000
    sample, stable across runs, partitionings, and engines.

    Zero shuffle: the membership predicate evaluates inside the scan
    stage, so at 100 TB this costs one pass and prunes everything
    downstream (the reference has no sampling; this is part of the
    pipeline extension surface).
    """
    h = key_hash(key, hash_mode)
    # pmod, not %: xxhash64 is signed and Spark's % keeps the dividend
    # sign, which would admit ~half of all rows regardless of rate.
    return df.filter(F.pmod(h, F.lit(1000)) < F.lit(rate_permille))


def stratified_sample(
    df: DataFrame,
    cap_per_stratum: int,
    stratum: str = "source",
    key: str = "doc_id",
    hash_mode: str = "lcg",
) -> DataFrame:
    """Per-stratum cap: keep the ``cap_per_stratum`` rows with the
    smallest key-hash in each stratum (rendezvous/priority sampling).
    Deterministic and engine-portable; ties broken by the key itself.

    One shuffle keyed by the stratum column. Stratum counts are
    typically modest (sources, languages); if one stratum dominates,
    AQE's skew handling splits it, and the rank window only ever
    materializes ``cap`` rows per task after the partial top-k.
    """
    h = key_hash(key, hash_mode)
    w = Window.partitionBy(stratum).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.lit(cap_per_stratum))
        .drop("__rk")
    )


def shard_assign(
    df: DataFrame,
    n_shards: int,
    key: str = "doc_id",
    hash_mode: str = "lcg",
) -> DataFrame:
    """Assign each row a shard id = key_hash mod ``n_shards`` — the
    deterministic split a data-parallel training loader consumes.
    Pure projection (zero shuffle); writers then
    ``partitionBy("shard")`` to lay the corpus out shard-per-directory.
    """
    return df.withColumn(
        "shard", F.pmod(key_hash(key, hash_mode), F.lit(n_shards)).cast("int")
    )


def shard_balance(
    df: DataFrame,
    n_shards: int,
    key: str = "doc_id",
    text: str = "text",
    hash_mode: str = "lcg",
) -> DataFrame:
    """Shard-level balance report: per shard, row count and total
    text bytes — the check a pipeline runs before declaring a split
    usable (loader throughput is gated by the largest shard).
    One map-side-combinable hash-agg on the shard id.
    """
    return (
        shard_assign(df, n_shards, key, hash_mode)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(text)).cast("bigint").alias("total_chars"),
            F.sum(whitespace_token_count(text)).cast("bigint")
            .alias("total_tokens"),
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
        )
        .orderBy("shard")
    )


def weighted_sample(
    df: DataFrame,
    weight_permille: Column | str,
    key: str = "doc_id",
    hash_mode: str = "lcg",
) -> DataFrame:
    """Deterministic importance sampling: keep a row iff its key-hash
    residue mod 1000 falls below the row's OWN weight in permille
    (clamped to [0, 1000]) — quality- or length-proportional retention
    with every property of :func:`hash_sample`: membership is a pure
    function of (key, weight), stable across runs, partitionings, and
    engines, and the expected kept fraction is mean(weight)/1000.

    Zero shuffle — the predicate (integer hash compare against a
    per-row column) evaluates inside the scan stage, so at 100 TB
    this is one codegen'd pass like the uniform sampler.
    """
    w = (
        F.col(weight_permille)
        if isinstance(weight_permille, str)
        else weight_permille
    )
    w = F.greatest(F.lit(0), F.least(F.lit(1000), w.cast("bigint")))
    return df.filter(F.pmod(key_hash(key, hash_mode), F.lit(1000)) < w)


def split_assign(
    df: DataFrame,
    permille: tuple[int, ...] = (980, 10, 10),
    names: tuple[str, ...] = ("train", "val", "test"),
    key: str = "doc_id",
    hash_mode: str = "lcg",
) -> DataFrame:
    """Deterministic train/val/test assignment: the key-hash residue
    mod 1000 is cut at the cumulative ``permille`` boundaries (must sum
    to 1000). Membership is a pure function of the key — re-runs,
    resumes, and engines agree, and adding documents later never moves
    an existing document between splits (the property random split
    lacks that matters most for eval integrity).

    Zero shuffle: a chained-when projection evaluated in the scan
    stage.
    """
    if sum(permille) != 1000 or len(permille) != len(names):
        raise ValueError("permille must sum to 1000 and pair with names")
    h = F.pmod(key_hash(key, hash_mode), F.lit(1000))
    # nested whens from the last boundary inward: split i owns
    # [cum(permille[:i]), cum(permille[:i+1]))
    expr = F.lit(names[-1])
    cum = 1000 - permille[-1]
    for i in range(len(names) - 2, -1, -1):
        expr = F.when(h < F.lit(cum), F.lit(names[i])).otherwise(expr)
        cum -= permille[i]
    return df.withColumn("split", expr)


def leakage_safe_split(
    df: DataFrame,
    permille: tuple[int, ...] = (980, 10, 10),
    names: tuple[str, ...] = ("train", "val", "test"),
    text: str = "text",
    key: str = "doc_id",
    hash_mode: str = "lcg",
) -> DataFrame:
    """Split-by-canonical: every exact copy of a document shares the
    canonical id (min key per distinct text), and the split is a
    function of the CANONICAL key — so duplicates can never straddle
    train and test, the eval-contamination hole a per-document split
    leaves open. (Near-dup-safe splitting composes the same way with
    cluster_pairs components in place of the canonical map.)

    One fingerprint-keyed aggregation builds the canonical map (8-byte
    shuffle key, document bodies never move) and one equi-join
    attaches it (AQE broadcasts the map while it fits); the split
    itself is the zero-shuffle chained-when of :func:`split_assign`.
    Adds ``canonical_id`` and ``split`` columns.
    """
    fp = F.xxhash64(F.col(text))
    canon = (
        df.select(fp.alias("__fp"), F.col(key))
        .groupBy("__fp")
        .agg(F.min(key).alias("canonical_id"))
    )
    labeled = df.withColumn("__fp", fp).join(canon, "__fp").drop("__fp")
    return split_assign(
        labeled, permille, names, key="canonical_id", hash_mode=hash_mode
    )


def epoch_shuffle(
    df: DataFrame,
    seed: int = 0,
    n_buckets: int = 1024,
    key: str = "doc_id",
    hash_mode: str = "lcg",
    sort_output: bool = True,
) -> DataFrame:
    """Deterministic training-epoch shuffle: assign every row its
    0-based position in a pseudorandom-but-reproducible global order
    (order by ``hash(key + seed)``, ties by key). Changing ``seed``
    re-shuffles; the same seed always yields the same order on any
    engine and any partitioning — the property a resumable training
    run needs from its data loader.

    The global ordinal is computed WITHOUT a global sort or a
    single-partition window: the hash space is cut into ``n_buckets``
    order-aligned ranges, positions are ``bucket_offset + rank within
    bucket``, where the offsets come from a bucket-count table
    (n_buckets rows — the only single-partition window, bounded by
    construction) broadcast back, and the within-bucket rank windows
    on the bucket key with parallelism = n_buckets. Same stitching
    discipline as operators/scalable_window.py.

    ``lcg`` hash mode is the oracle-checkable ANSI form; ``xxhash64``
    is the scale path (better dispersion) and requires power-of-two
    ``n_buckets``. Input columns are preserved (annotation, like the
    module's other assigners). A NULL key raises at runtime: silently
    dropping it would both lose the row and shift every later
    ordinal, the worst possible failure for a data loader.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    h_ok = key_hash((F.col(key).cast("bigint") + F.lit(seed)), hash_mode)
    h = F.when(
        F.col(key).isNull(),
        F.raise_error(F.lit("epoch_shuffle: NULL key")),
    ).otherwise(h_ok)
    if hash_mode == "lcg":
        span = -(-LCG_M // n_buckets)  # ceil: buckets align with hash order
        bkt = (h / F.lit(span)).cast("bigint")
    else:
        bits = n_buckets.bit_length() - 1
        if 1 << bits != n_buckets:
            raise ValueError("xxhash64 mode needs power-of-two n_buckets")
        # arithmetic shift keeps signed order monotone; offset to >= 0
        bkt = F.shiftright(h, 64 - bits) + F.lit(1 << (bits - 1)) if bits else F.lit(0)
    hashed = df.withColumn("__hk", h).withColumn("__bkt", bkt)
    counts = hashed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__bkt", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    w_rank = Window.partitionBy("__bkt").orderBy("__hk", key)
    out = (
        hashed.join(offsets, "__bkt")
        .withColumn(
            "epoch_pos",
            (F.col("__off") + F.row_number().over(w_rank) - 1).cast("bigint"),
        )
        .drop("__hk", "__bkt", "__off")
    )
    # presentation sort only; writers that re-shard by epoch_pos (the
    # real consumer) should skip it
    return out.orderBy(key) if sort_output else out


def neardup_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    permille: tuple[int, ...] = (980, 10, 10),
    names: tuple[str, ...] = ("train", "val", "test"),
    key: str = "doc_id",
    hash_mode: str = "lcg",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Split-by-near-dup-component: the composition
    :func:`leakage_safe_split`'s docstring promises — candidate
    near-dup ``pairs`` (e.g. MinHash+LSH) collapse to connected
    components, and the split hashes the COMPONENT representative, so
    not even a *near* duplicate can straddle train and test.
    Singletons are their own component. Adds ``component`` and
    ``split`` columns.

    The component map is the x09 iterative min-label propagation
    (vocab-bounded, localCheckpoint per round); attaching it is one
    equi-join (AQE-broadcast while it fits); the split itself stays
    the zero-shuffle chained-when of :func:`split_assign`.
    ``pair_a``/``pair_b`` name the pair columns, so a non-default
    ``key`` (e.g. vec_id with embedding near-dup pairs) works
    end-to-end.
    """
    from etsd_time_series_database_spark.operators.dedup import cluster_pairs

    comp = cluster_pairs(pairs, a=pair_a, b=pair_b).withColumnRenamed(
        "doc_id", key
    )
    labeled = (
        df.join(comp, key, "left")
        .withColumn("component", F.coalesce(F.col("component"), F.col(key)))
    )
    return split_assign(
        labeled, permille, names, key="component", hash_mode=hash_mode
    )


def eval_slice(
    df,
    k: int = 2,
    n_bands: int = 4,
    text: str = "text",
    key: str = "doc_id",
    source: str = "source",
):
    """Balanced eval-set construction: k documents per (source ×
    quality band), picked pseudorandomly-but-deterministically — the
    held-out slice builder that gives every feed and every quality
    regime equal representation (a uniform random sample
    over-represents the biggest source and the modal quality band).

    Quality is x17's composite banded into ``n_bands`` equal cuts;
    within each stratum documents rank by the portable polynomial
    fingerprint of their text (pseudorandom, engine-reproducible —
    the hash-rank idiom of x04's stratified sampler) with id
    tiebreak. The rank ≤ k filter plans as WindowGroupLimit: k rows
    per stratum survive each task before the exchange, so the slice
    costs one scan regardless of corpus size.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etsd_time_series_database_spark.functions.exprs import (
        poly_fingerprint,
    )
    from etsd_time_series_database_spark.operators.textstats import quality_expr

    quality = quality_expr(text)
    band = F.least(
        F.floor(F.coalesce(quality, F.lit(0.0)) * n_bands).cast("int"),
        F.lit(n_bands - 1),
    )
    ranked = df.select(
        F.col(source).alias("src"),
        band.alias("band"),
        F.col(key),
        poly_fingerprint(F.col(text)).alias("__fp"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("src", "band").orderBy("__fp", key)
        ),
    )
    return (
        ranked.filter(F.col("rank") <= k)
        .select("src", "band", "rank", key)
        .orderBy("src", "band", "rank")
    )


def mixture_plan(
    df: DataFrame,
    weight: Column | None = None,
    text: str = "text",
    source: str = "source",
) -> DataFrame:
    """Training-mixture planner: given per-source token supplies and
    target mixture weights, compute the LARGEST corpus achievable
    WITHOUT upsampling any source, and each source's token take and
    sampling rate toward it (the planning step behind domain-weighted
    pretraining mixes à la DoReMi/The Pile — deterministic arithmetic,
    not the optimizer).

    With integer weights ``w_s`` (relative, need not sum to anything)
    and supplies ``T_s``: feasible corpus size
    ``N* = min_s floor(T_s * W / w_s)`` with ``W = sum(w_s)``; then
    ``take_s = floor(w_s * N* / W)`` and ``rate_s = take_s / T_s``.
    The source(s) attaining the min are flagged ``limiting`` — adding
    data there (or lowering their weight) is what grows the corpus.
    All sizing is 64-bit integer math (engine/oracle exact); only the
    reported shares/rates are rounded doubles.

    ``weight`` defaults to ``lit(1)`` — the natural mix (every source
    weighted equally); pass any integer Column to encode real mixture
    targets. A weight that evaluates to NULL for some source raises at
    runtime instead of silently producing a NULL plan (the catalog's
    x67 entry derives a 1..4 spread from the testdata's ``srcN``
    naming and passes it explicitly — that coupling lives with the
    fixture, not in the library default).

    Scale shape: one map-side-combinable hash-agg over the corpus
    (token counting is a scan-side expression; text never shuffles),
    then all planning runs on the per-source table (one row per
    source) via unpartitioned windows — KB-sized by construction.
    """
    if weight is None:
        weight = F.lit(1)
    # coalesce is lazy: raise_error fires only for NULL weights
    weight = F.coalesce(
        weight.cast("bigint"),
        F.raise_error(
            F.concat(
                F.lit("mixture_plan: weight is NULL for source "),
                F.col(source),
            )
        ).cast("bigint"),
    )
    n_tok = whitespace_token_count(text)
    per_src = (
        df.groupBy(source)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("n_tokens"),
        )
        .withColumn("weight", weight)
    )
    w_all = Window.partitionBy()
    tot_w = F.sum("weight").over(w_all)
    tot_t = F.sum("n_tokens").over(w_all)
    cap = F.expr("n_tokens * __w div weight")  # this source's max corpus
    planned = (
        per_src.withColumn("__w", tot_w)
        .withColumn("__t", tot_t)
        .withColumn("__cap", cap)
        .withColumn("__nstar", F.min("__cap").over(w_all))
    )
    take = F.expr("weight * __nstar div __w")
    return planned.select(
        source,
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("weight").cast("bigint").alias("weight"),
        F.round(F.col("n_tokens") / F.col("__t"), 6).alias("natural_share"),
        F.round(F.col("weight") / F.col("__w"), 6).alias("target_share"),
        take.cast("bigint").alias("take_tokens"),
        F.round(take / F.col("n_tokens"), 6).alias("sampling_rate"),
        (F.col("__cap") == F.col("__nstar")).cast("int").alias("limiting"),
    ).orderBy(source)


def waterfill_budget(
    df: DataFrame,
    budget_tokens: int,
    text: str = "text",
    source: str = "source",
) -> DataFrame:
    """Cap-aware token budgeting across sources (water-filling): given
    a TOTAL token budget, allocate every source the same level L,
    except sources whose whole supply fits under L, which contribute
    everything — the max-min-fair allocation (no source is favored
    beyond its supply) that :func:`mixture_plan`'s proportional
    weights cannot express. Small sources saturate; the budget left
    over raises the level for the rest.

    Closed form on the per-source table sorted by supply ascending:
    at the first rank k where ``prefix(k-1) + (n-k+1) * T_k`` reaches
    the budget, the level is ``(budget - prefix(k-1)) DIV (n-k+1)``
    (integer floor; the sub-token remainder is deliberately left
    unallocated rather than tie-broken — deterministic on any
    engine). take = min(supply, L); ``saturated`` marks sources that
    contribute everything. If total supply <= budget, every source
    saturates. A non-positive budget allocates zero everywhere.

    Scale shape: ONE map-side-combinable hash-agg over the corpus
    (token counting is a scan-side expression; text never shuffles);
    everything after runs on the per-source table (one row per
    source) via unpartitioned windows — KB-sized by construction
    (the x67 shape).
    """
    budget = int(budget_tokens)
    n_tok = whitespace_token_count(text)
    per_src = df.groupBy(source).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(n_tok).cast("bigint").alias("n_tokens"),
    )
    w_ord = Window.orderBy("n_tokens", source)
    w_all = Window.partitionBy()
    ranked = (
        per_src.withColumn("__k", F.row_number().over(w_ord))
        .withColumn(
            "__prefix",
            F.sum("n_tokens").over(
                Window.orderBy("n_tokens", source).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
    )
    # the level comes from the FIRST rank k where filling every
    # remaining source to T_k meets the budget (the water line lands
    # in (T_{k-1}, T_k] there); later ranks also satisfy the
    # inequality but their candidates undershoot — taking any of them
    # would underallocate
    prefix = F.coalesce(F.col("__prefix"), F.lit(0))
    slots = F.col("__n") - F.col("__k") + 1
    feasible = prefix + slots * F.col("n_tokens") >= F.lit(budget)
    ranked = ranked.withColumn(
        "__first_k", F.min(F.when(feasible, F.col("__k"))).over(w_all)
    )
    cand = F.when(
        F.col("__k") == F.col("__first_k"),
        F.expr(f"({budget} - coalesce(__prefix, 0)) div (__n - __k + 1)"),
    )
    level = F.max(cand).over(w_all)
    leveled = ranked.withColumn(
        "__level",
        F.coalesce(level, F.greatest(F.max("n_tokens").over(w_all), F.lit(0))),
    )
    take = F.when(F.lit(budget) <= 0, F.lit(0)).otherwise(
        F.least(F.col("n_tokens"), F.col("__level"))
    )
    return leveled.select(
        source,
        "n_docs",
        "n_tokens",
        take.cast("bigint").alias("take_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(take / F.col("n_tokens"), 6),
        ).alias("sampling_rate"),
        (take >= F.col("n_tokens")).cast("int").alias("saturated"),
    ).orderBy(source)


def integrity_audit(
    documents: DataFrame,
    embeddings: DataFrame,
    key: str = "doc_id",
    vec_key: str = "vec_id",
    source: str = "source",
) -> DataFrame:
    """Referential-integrity audit between the text corpus and its
    embedding table: per source, how many documents exist, how many
    have an embedding row, and the coverage fraction; vectors with no
    document at all report under the ``__dangling__`` pseudo-source —
    the join-health check every two-table pipeline (text + vectors,
    text + scores, ...) runs before training, because a silent 3%
    embedding gap skews every downstream similarity dedup.

    One full-outer equi-join on the 8-byte id (ids only — neither
    text nor vectors travel) and one hash-agg; output cardinality =
    sources + 1. The ANSI divide guard emits NULL coverage for the
    dangling row instead of raising.
    """
    d = documents.select(F.col(key).alias("__id"), F.col(source))
    e = embeddings.select(F.col(vec_key).alias("__vid"))
    j = d.join(e, d["__id"] == e["__vid"], "full_outer")
    grp = F.coalesce(F.col(source), F.lit("__dangling__"))
    n_docs = F.count("__id")
    return (
        j.groupBy(grp.alias(source))
        .agg(
            n_docs.cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("__id").isNotNull()
                           & F.col("__vid").isNotNull(), 1))
            .cast("bigint")
            .alias("n_with_vec"),
            F.count(F.when(F.col("__vid").isNull(), 1))
            .cast("bigint")
            .alias("n_missing_vec"),
            F.count(F.when(F.col("__id").isNull(), 1))
            .cast("bigint")
            .alias("n_dangling_vec"),
            F.when(
                n_docs > 0,
                F.round(
                    F.count(
                        F.when(F.col("__id").isNotNull()
                               & F.col("__vid").isNotNull(), 1)
                    ).cast("double")
                    / n_docs,
                    6,
                ),
            ).alias("coverage_pct"),
        )
        .orderBy(source)
    )


def temperature_mixture(
    df: DataFrame,
    alpha: float = 0.5,
    budget_tokens: int = 100_000,
    text: str = "text",
    source: str = "source",
) -> DataFrame:
    """Temperature-based mixture reweighting: resample sources with
    probability proportional to ``p_s ** alpha`` (``p_s`` = natural
    token share) — the standard multilingual/LLM data-mixing move
    (alpha < 1 flattens the mix toward small sources, alpha = 1 is
    the natural mix). Unlike :func:`mixture_plan`, which computes the
    largest NO-upsampling corpus, temperature sampling deliberately
    upsamples small sources (epochs > 1), which is why both planners
    exist.

    Per source: natural share, temperature share, boost (temperature
    share / natural share), token take toward ``budget_tokens``, and
    the implied epochs over the source's supply.

    Determinism: for ``alpha == 0.5`` the power is computed with
    ``sqrt`` (IEEE-exact, bit-identical on any engine — the catalog
    entry pins this) rather than ``pow`` (libm-dependent by a ulp);
    the weight is then quantized to integer micro-units
    (``floor(sqrt(p) * 1e12)``) so every share/take downstream is
    integer or identical-operand double arithmetic. Other alphas use
    ``pow`` and carry the cross-engine ulp caveat.

    Scale shape: ONE map-side-combinable hash-agg over the corpus
    (token counting is a scan-side expression; text never shuffles);
    everything after runs on the one-row-per-source table via
    unpartitioned windows — KB-sized by construction (the x67 shape).
    """
    budget = float(int(budget_tokens))
    n_tok = whitespace_token_count(text)
    per_src = df.groupBy(source).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(n_tok).cast("bigint").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    p_nat = F.col("n_tokens").cast("double") / F.col("__t").cast("double")
    raw_w = (
        F.sqrt(p_nat) if float(alpha) == 0.5 else F.pow(p_nat, F.lit(alpha))
    )
    staged = (
        per_src.withColumn("__t", F.sum("n_tokens").over(w_all))
        .withColumn(
            "__micro",
            F.floor(raw_w * F.lit(1e12)).cast("bigint"),
        )
        .withColumn("__w", F.sum("__micro").over(w_all))
    )
    micro_d = F.col("__micro").cast("double")
    w_d = F.col("__w").cast("double")
    take = F.floor(F.lit(budget) * micro_d / w_d)
    return staged.select(
        source,
        "n_docs",
        "n_tokens",
        F.round(p_nat, 6).alias("natural_share"),
        F.round(micro_d / w_d, 6).alias("temp_share"),
        F.round((micro_d / w_d) / p_nat, 6).alias("boost"),
        take.cast("bigint").alias("take_tokens"),
        F.round(take.cast("double") / F.col("n_tokens").cast("double"), 6)
        .alias("epochs"),
    ).orderBy(source)
