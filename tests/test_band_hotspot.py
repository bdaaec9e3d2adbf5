"""Hot-band guard (round-10 verdict finding #2): LSH's collision bound
fails on a degenerate corpus where one band signature is shared by N
near-identical documents — the pair self-join's bucket goes N²/2. The
fix has two prongs, both pinned here against the ORIGINAL pair-join
formulations (inlined below as brute-force references, the same
quarantine pattern as the other property tests):

  * drop-DECISION paths (incremental_dedup's in-run + cross-run
    probes, dedup_funnel's near stage) are now pair-free: bucket-min /
    bucket-statistics forms that must produce the IDENTICAL drop set
    on any input, degenerate or not;
  * the pair-ENUMERATING report (minhash_lsh_candidates) gained an
    optional ``max_bucket_docs`` star-sparsification cap: identical
    output while every bucket fits the cap, connectivity-preserving
    (same cluster_pairs components) on degenerate buckets.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from etsd_time_series_database_spark.operators.dedup import (
    cluster_pairs,
    incremental_dedup,
    keep_lowest_drop_ids,
    minhash_band_table,
    minhash_lsh_candidates,
    write_minhash_index,
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa"]


def _corpus(spark, seed: int, n_unique: int, n_degenerate: int):
    """n_unique random docs plus n_degenerate documents sharing ONE
    text (every band signature identical -> one hot bucket per band)."""
    rng = random.Random(seed)
    rows = [
        (i, " ".join(rng.choices(WORDS, k=rng.randint(4, 12))), "src_a")
        for i in range(n_unique)
    ]
    hot = "omega omega omega repeated boilerplate banner text"
    rows += [
        (n_unique + j, hot, "src_b") for j in range(n_degenerate)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _pairjoin_drop_ids(bands, key="doc_id"):
    """The ORIGINAL quadratic keep-lowest form: drop every id that
    pair-joins with a lower-keyed id over shared (band, sig) buckets."""
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            on=(F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col(f"x.{key}") > F.col(f"y.{key}")),
        )
        .select(F.col(f"x.{key}").alias(key))
        .distinct()
    )


def test_bucket_min_drop_set_equals_pair_join(spark):
    """keep_lowest_drop_ids == the pair-join drop set, including on a
    forced degenerate band (60 identical docs -> one hot bucket)."""
    for seed, n_u, n_d in [(1, 40, 0), (2, 30, 60), (3, 0, 25)]:
        docs = _corpus(spark, seed, n_u, n_d)
        bands = minhash_band_table(docs, hash_mode="poly")
        fast = {r.doc_id for r in keep_lowest_drop_ids(bands).collect()}
        ref = {r.doc_id for r in _pairjoin_drop_ids(bands).collect()}
        assert fast == ref, f"seed={seed}: {fast ^ ref}"
    # the degenerate case actually drops all-but-one of the hot docs
    assert len(fast) >= 24


def test_capped_lsh_identical_below_cap(spark):
    """max_bucket_docs >= the largest real bucket -> byte-identical
    candidate pairs (the x06 hash-stability property)."""
    docs = _corpus(spark, 7, 50, 0)
    uncapped = minhash_lsh_candidates(docs, hash_mode="poly").collect()
    capped = minhash_lsh_candidates(
        docs, hash_mode="poly", max_bucket_docs=1000
    ).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))


def test_capped_lsh_star_preserves_components(spark):
    """On a degenerate corpus the cap sparsifies hot buckets to star
    pairs: pair count collapses from O(N²) to O(N) while the connected
    components (what dedup clustering consumes) stay identical."""
    docs = _corpus(spark, 11, 25, 40)
    full = minhash_lsh_candidates(docs, hash_mode="poly")
    star = minhash_lsh_candidates(docs, hash_mode="poly", max_bucket_docs=8)
    n_full, n_star = full.count(), star.count()
    # the hot bucket alone is C(40,2) = 780 pairs in the full form
    assert n_full >= 780
    assert n_star < n_full / 5
    comp_full = {
        (r.doc_id, r.component) for r in cluster_pairs(full).collect()
    }
    comp_star = {
        (r.doc_id, r.component) for r in cluster_pairs(star).collect()
    }
    assert comp_full == comp_star


def test_incremental_dedup_pair_free_probe_on_degenerate_band(spark, tmp_path):
    """The cross-run probe's bucket-statistics form on a degenerate
    index (40 identical docs under one signature): a shard that shares
    the hot text is fully dropped, unique shard docs survive, and the
    drop set equals the brute-force (new x index) pair logic."""
    docs = _corpus(spark, 13, 30, 40)
    path = str(tmp_path / "hot_index")
    write_minhash_index(docs, path, hash_mode="poly")

    shard = _corpus(spark, 99, 10, 5).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    survivors = incremental_dedup(shard, path)
    ids = {r.doc_id for r in survivors.collect()}

    # brute force: shard doc drops iff it shares any (band, sig) with
    # ANY indexed doc, or with a lower-keyed in-shard doc
    idx_bands = minhash_band_table(docs, hash_mode="poly")
    sh_bands = minhash_band_table(shard, hash_mode="poly")
    cross = {
        r.doc_id
        for r in sh_bands.alias("s")
        .join(idx_bands.alias("i"), ["band", "sig"])
        .select(F.col("s.doc_id").alias("doc_id"))
        .distinct()
        .collect()
    }
    in_run = {r.doc_id for r in _pairjoin_drop_ids(sh_bands).collect()}
    want = {
        r.doc_id for r in shard.collect()
    } - cross - in_run
    assert ids == want
    # the degenerate shard docs (5 copies of the hot text) all died to
    # the index's hot bucket
    assert all(i < 10_030 for i in ids)


def test_probe_plan_broadcasts_shard_and_never_pairs(spark, tmp_path):
    """Plan shape of the REAL probe helper (index_collision_ids, the
    code path incremental_dedup runs inside its checkpointed
    subplans): the shard's signature set rides the broadcast side of
    the touched-bucket semi-join, and nothing joins index rows
    pairwise — no CartesianProduct anywhere, and the only join
    touching two corpus-scale sides is the broadcast semi-join."""
    from etsd_time_series_database_spark.operators.dedup import (
        index_collision_ids,
        read_minhash_index,
    )

    docs = _corpus(spark, 17, 40, 10)
    path = str(tmp_path / "plan_index")
    write_minhash_index(docs, path, hash_mode="poly")
    index_bands, meta = read_minhash_index(spark, path)
    shard = _corpus(spark, 23, 8, 2).withColumn(
        "doc_id", F.col("doc_id") + 5_000
    )
    sh_bands = minhash_band_table(shard, hash_mode="poly")
    cross, already = index_collision_ids(sh_bands, index_bands)
    for df in (cross, already):
        df.collect()  # let AQE finalize the executed plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
    cross_plan = cross._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in cross_plan
    # and the final survivors plan still never goes cartesian
    out = incremental_dedup(shard, path)
    assert "CartesianProduct" not in (
        out._jdf.queryExecution().executedPlan().toString()
    )


def test_band_load_profile_flags_degenerate_bucket(spark):
    """x82's operator: the profile's max_bucket_docs and
    candidate_pairs expose a degenerate band BEFORE any pairwise
    stage runs — the observability half of the guard."""
    from etsd_time_series_database_spark.operators.dedup import (
        band_load_profile,
    )

    docs = _corpus(spark, 31, 20, 50)
    prof = {r.band: r for r in band_load_profile(docs).collect()}
    assert prof, "no bands profiled"
    for r in prof.values():
        # the 50 identical docs share one signature in EVERY band
        assert r.max_bucket_docs >= 50
        assert r.candidate_pairs >= 50 * 49 // 2
        assert r.docs_in_colliding_buckets >= 50
        # bounded by corpus size (short docs may not shingle at all)
        assert r.n_docs <= 70


def test_bucket_min_and_profile_plan_shapes(spark):
    """Physical-shape pins for the round's new forms:
    keep_lowest_drop_ids is window-over-(band,sig) + distinct — no
    join of any kind in its plan; band_load_profile is two
    hash-aggregates — no join, no window, no pair stage."""
    docs = _corpus(spark, 41, 30, 20)
    bands = minhash_band_table(docs, hash_mode="poly")

    drop_plan = (
        keep_lowest_drop_ids(bands)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in drop_plan and "CartesianProduct" not in drop_plan
    assert "Window" in drop_plan

    from etsd_time_series_database_spark.operators.dedup import (
        band_load_profile,
    )

    prof_plan = (
        band_load_profile(docs, hash_mode="poly")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in prof_plan and "Window" not in prof_plan
    assert "HashAggregate" in prof_plan


def test_x85_headline_runs_the_pairfree_forms(spark):
    """Round-11 verdict #2: the headline bench's dedup number must
    execute the production pair-free code (index_collision_ids +
    keep_lowest_drop_ids), not x74's pair-enumeration mirror. Pinned
    on the catalog entry itself: the physical plan carries the
    bucket-statistics aggregate (partial_min over the index side) and
    window bucket-min, and NO join predicate ever compares two doc_id
    columns (the pair join's x.doc_id > y.doc_id / < shape), while
    the output stays byte-equal to x74's."""
    from etsd_time_series_database_spark.plans import catalog

    from tests.conftest import SF_SMOKE

    sf = SF_SMOKE
    a = catalog()["x85_pairfree_shard_dedup"].build(spark, sf)
    rows_a = a.collect()
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    import re

    # any join condition relating doc_id to doc_id = pair enumeration
    assert not re.search(r"doc_id#\d+L? [<>] doc_id#\d+L?", plan), plan
    b = catalog()["x74_incremental_dedup_survivors"].build(spark, sf)
    assert sorted(map(tuple, rows_a)) == sorted(map(tuple, b.collect()))


def test_band_table_is_single_wide_hash_agg(spark):
    """Round-14 optimization: the band table must be ONE map-side
    combinable hash aggregation — shingle explode, stateless sid hash,
    a (key)-keyed agg with k min columns, post-agg band explode.
    Pins: exactly one hashpartitioning exchange, partial_min before
    it, no shuffle of shingle strings (the old doc_shingles distinct),
    no collect_list band agg — and the output is row-identical to the
    original three-shuffle formulation, rebuilt inline."""
    from etsd_time_series_database_spark.operators.dedup import (
        MINHASH_P,
        MINHASH_PARAMS,
        _shingle_ids,
        doc_shingles,
    )

    docs = _corpus(spark, 77, 40, 6)
    bands = minhash_band_table(docs, hash_mode="poly")
    plan = bands._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_min" in plan, plan
    assert "collect_list" not in plan, plan
    assert "SortAggregate" not in plan, plan

    # the original formulation: distinct shingles -> explode x k ->
    # groupBy(key, j) min -> groupBy(key, band) collect_list
    sh = _shingle_ids(doc_shingles(docs), "poly")
    params = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), F.lit(a).alias("a"), F.lit(b).alias("b")
            )
            for j, (a, b) in enumerate(MINHASH_PARAMS)
        ]
    )
    mh = (
        sh.select("doc_id", "sid", F.explode(params).alias("p"))
        .groupBy("doc_id", F.col("p.j").alias("j"))
        .agg(
            F.min(
                (F.col("p.a") * F.col("sid") + F.col("p.b"))
                % F.lit(MINHASH_P)
            ).alias("h")
        )
    )
    legacy = (
        mh.withColumn("band", F.expr("j div 2"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "h"))),
                    lambda s: s["h"].cast("string"),
                ),
            ).alias("sig")
        )
    )
    # nullability flags differ (post-agg literals are non-null);
    # names and types must match exactly
    assert [(f.name, f.dataType) for f in bands.schema] == [
        (f.name, f.dataType) for f in legacy.schema
    ]
    assert sorted(map(tuple, bands.collect())) == sorted(
        map(tuple, legacy.collect())
    )
