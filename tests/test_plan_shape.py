"""Physical-plan shape assertions (SURVEY.md §4): the properties that
make the engine scale — predicate pushdown into the Parquet scan,
broadcast joins for dims, whole-stage codegen — verified on the real
testdata files, not assumed.

These are the Spark equivalents of the reference's physical tricks:
ts pushdown == the block-skip search (code/etsdRead.c:300-353), column
pruning == per-stream offset arithmetic (code/etsdRead.c:191-223).
"""

from __future__ import annotations

import pytest

from etsd_time_series_database_spark.sources.store import load_table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ts_range_reaches_parquet_pushed_filters(spark):
    df = load_table(
        spark, SF_SMOKE, "events",
        ts_range=("2026-01-01T00:00:00", "2026-01-02T00:00:00"),
    )
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    # the raw int64 ts predicate must actually be pushed, not just listed empty
    assert "PushedFilters: []" not in plan.replace(" ", "")


def test_projection_prunes_columns(spark):
    df = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    # only the two projected columns reach the scan
    assert "l_orderkey" in read_schema[0] and "l_quantity" in read_schema[0]
    assert "l_comment" not in read_schema[0]


def test_dim_join_broadcasts(spark):
    """q20/q21/q22 carry NO hard broadcast hint (part/customer grow with
    scale factor — a hard hint OOMs the driver at 100 TB); the optimizer
    must still pick broadcast-hash on its own while the dim side fits."""
    from etsd_time_series_database_spark.plans import catalog

    df = catalog()["q20_broadcast_join"].build(spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dim_join_has_no_hard_broadcast_hint():
    """The source of the relational plans must not hint-broadcast any
    scale-growing dimension: broadcast selection is AQE's call."""
    import pathlib

    import etsd_time_series_database_spark.plans.relational as rel

    src = pathlib.Path(rel.__file__).read_text()
    assert "F.broadcast" not in src.split('"""', 2)[2], (
        "plans/relational.py reintroduced a hard broadcast hint"
    )


def test_dim_join_broadcasts_at_sf01(spark):
    """Without hints, AQE/autoBroadcastJoinThreshold must still choose
    broadcast-hash for part (q20) and customer (q21) at sf0.1 — the
    per-round bench scale factor."""
    import os

    from etsd_time_series_database_spark.plans import catalog

    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf01):
        import pytest

        pytest.skip("sf0.1 testdata not present")
    for name in ("q20_broadcast_join", "q21_multiway_join_agg"):
        df = catalog()[name].build(spark, sf01)
        df.collect()  # let AQE finalize
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan, name


def test_whole_stage_codegen_covers_aggregation(spark):
    from etsd_time_series_database_spark.plans import catalog

    df = catalog()["q04_range_aggregate"].build(spark, SF_SMOKE)
    df.collect()  # let AQE finalize the physical plan
    plan = _plan(df)
    # codegen'd operators carry the *(N) whole-stage-codegen stage marker
    assert "*(1)" in plan and "HashAggregate" in plan
    assert "partial_" in plan  # map-side combine before the shuffle
    # aggregation stays JVM-side: no Python eval in the hot path
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_no_python_udf_in_relational_catalog(spark):
    """Q01-Q28 must be pure JVM plans (UDFs only allowed in the p* pipeline
    ops where semantics require them)."""
    from etsd_time_series_database_spark.plans import catalog

    for name, q in sorted(catalog().items()):
        if not name.startswith("q"):
            continue
        plan = _plan(q.build(spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


@pytest.mark.slow
def test_asof_join_uses_broadcast_not_cartesian(spark):
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q23_asof_join"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_embedding_near_dup_has_no_cartesian_product(spark):
    """p07 must stay bucketed: candidate pairs come from a within-cell
    equi-join, never an all-pairs CartesianProduct. The only nested-loop
    allowed is the bounded 8-row centroid broadcast (same as p06)."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["x07_embedding_near_dup"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_summarize_extracts_plan_facts(spark):
    from etsd_time_series_database_spark.plans import catalog
    from etsd_time_series_database_spark.plans.inspect import lint, summarize

    df = catalog()["q20_broadcast_join"].build(spark, SF_SMOKE)
    s = summarize(df)
    assert "BroadcastHashJoin" in s.joins
    assert s.scans == 2 and s.broadcast_exchanges >= 1
    assert lint(df) == []

    # a deliberately bad plan lints dirty: cartesian product
    a = spark.range(3)
    b = spark.range(3)
    bad = a.crossJoin(b)
    assert any("Cartesian" in w or "NestedLoop" in w for w in lint(bad))


def test_lint_clean_for_all_headline_queries(spark):
    from etsd_time_series_database_spark.plans import catalog
    from etsd_time_series_database_spark.plans.inspect import lint

    for name, q in sorted(catalog().items()):
        if not q.headline:
            continue
        warnings = [
            w
            for w in lint(q.build(spark, SF_SMOKE))
            # documented exceptions: the multimodal pipeline ops use
            # Arrow-batched Python; x14 probes against a ONE-ROW broadcast
            # query vector, for which nested-loop is the right plan
            if not (
                name in ("x20_multimodal_features", "x21_frame_sample",
                         "x22_chunk_documents")
                and "Python eval" in w
            )
            and not (name == "x14_ann_cosine_topk" and "NestedLoop" in w)
            # x56 probes a ONE-ROW query vector and broadcasts the
            # 128-row subspace codebook — nested-loop is the right plan
            and not (name == "x56_pq_topk" and "NestedLoop" in w)
        ]
        assert warnings == [], f"{name}: {warnings}"


def test_ohlc_is_hash_agg_no_sort_aggregate(spark):
    """OHLC must stay a map-side-combinable HashAggregate: the packed
    min_by/max_by ordering exists precisely to avoid the SortAggregate
    fallback a min(struct) formulation triggers."""
    from etsd_time_series_database_spark.plans import catalog

    df = catalog()["q35_ohlc_bars"].build(spark, SF_SMOKE)
    plan = _plan(df)
    assert "HashAggregate" in plan and "partial_" in plan
    assert "SortAggregate" not in plan
    assert "Window" not in plan


def test_zscore_broadcasts_stats(spark):
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q37_zscore_anomalies"].build(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_resample_has_no_cartesian_or_range_join(spark):
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q40_resample_interpolate"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hash_sample_is_scan_side_filter(spark):
    """p21 membership must evaluate in the scan stage: no shuffle
    (Exchange) anywhere before the output sort, no Python eval."""
    from etsd_time_series_database_spark.operators.sampling import hash_sample

    df = hash_sample(load_table(spark, SF_SMOKE, "documents"), 200)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_token_topk_uses_take_ordered_not_global_sort(spark):
    """p24's final top-k must be TakeOrderedAndProject — a global Sort
    of the full token histogram is the plan that dies at scale."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["x25_token_topk"].build(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan


def test_twa_ewma_resample_windows_are_bucket_stitched(spark):
    """In stitched mode the big-table windows must run at (channel,
    bucket) parallelism: no window over the full fact table may
    partition by channel alone (that caps parallelism at channel
    cardinality — the q07/q08 skew). Channel-only windows are legal
    only on the tiny per-bucket boundary tables, which order by __bkt,
    never by us."""
    import re

    from etsd_time_series_database_spark.operators.trends import (
        ewma_truncated,
        resample_interpolate,
        time_weighted_avg,
    )

    df = load_table(spark, SF_SMOKE, "events")
    t0, t1 = "2024-01-01 00:00:00", "2024-03-01 00:00:00"
    builds = {
        "twa": time_weighted_avg(df, t0, t1, mode="stitched"),
        "ewma": ewma_truncated(df, mode="stitched"),
        "resample": resample_interpolate(df, t0, t1, 3600, mode="stitched"),
    }
    for name, out in builds.items():
        plan = _plan(out)
        # big-table window partitioned by (event_type, __bkt) exists
        assert re.search(
            r"windowspecdefinition\(event_type#\d+, __bkt#\d+L, us#", plan
        ), f"{name}: no (channel, bucket) window over the fact table"
        # and no fact-table window partitioned by event_type alone
        assert not re.search(
            r"windowspecdefinition\(event_type#\d+, us#", plan
        ), f"{name}: found a channel-global window over the fact table"


def test_stitch_auto_mode_picks_form_by_input_size(spark):
    """mode='auto' must choose the global window on a small input (the
    boundary machinery costs more than it saves) and the stitched one
    once the Catalyst size estimate crosses STITCH_AUTO_MIN_ROWS —
    zero jobs either way."""
    import re

    from pyspark.sql import functions as F

    from etsd_time_series_database_spark.operators.trends import (
        STITCH_AUTO_MIN_ROWS,
        _use_stitched,
        ewma_truncated,
    )

    small = load_table(spark, SF_SMOKE, "events")
    assert not _use_stitched(small, "auto")
    plan = _plan(ewma_truncated(small))  # mode defaults to auto
    assert re.search(r"windowspecdefinition\(event_type#\d+, us#", plan)
    assert "__bkt" not in plan

    # a wide synthetic input whose size estimate exceeds the threshold
    big = spark.range(4 * STITCH_AUTO_MIN_ROWS).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias(
            "event_type"
        ),
        F.col("id").cast("double").alias("value"),
    )
    assert _use_stitched(big, "auto")
    plan = _plan(ewma_truncated(big))
    assert re.search(
        r"windowspecdefinition\(event_type#\d+, __bkt#\d+L, us#", plan
    )


def test_channel_correlation_no_cartesian(spark):
    """q41's pair generation must be a bucket-keyed equi-join, never a
    channel cross join."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q41_channel_correlation"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_window_is_shard_parallel(spark):
    """x28's running token count must window on the shard key —
    a hash exchange on shard, never a single-partition global sort —
    and stay entirely JVM-side."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["x28_pack_sequences"].build(spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "hashpartitioning(shard" in plan


def test_kmeans_cells_no_cartesian_product(spark):
    """x30's per-iteration assignment scores against a broadcast
    centroid table (bounded k rows); the corpus side must never enter
    a CartesianProduct."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["x30_kmeans_cells"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_cell_assignment_is_single_shuffle(spark):
    """assign_cells (the Lloyd assignment step) must shuffle the corpus
    exactly once — one max_by hash aggregation — not the old
    scored->argmax->join-back shape, which re-shuffled the n x k scored
    relation a second time per iteration."""
    from etsd_time_series_database_spark.operators.similarity import (
        assign_cells,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    df = assign_cells(emb, [0, 1, 2, 3])
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    n_hash_exchanges = plan.count("Exchange hashpartitioning")
    assert n_hash_exchanges == 1, plan
    # map-side partial combine before that one exchange
    assert "partial_max_by" in plan or "partial_" in plan, plan


def test_rank_filters_get_window_group_limit(spark):
    """Every per-group top-k in the catalog (rank window + rk <= k
    filter) must trigger Spark's WindowGroupLimit: a map-side partial
    top-k runs BEFORE the shuffle, so a billion-row stratum/source
    ships at most k rows per input partition instead of sorting the
    whole group in one task."""
    from etsd_time_series_database_spark.plans import catalog

    for name in (
        "q09_topk_per_channel",
        "x04_stratified_sample",
        "x26_tfidf_topterms",
        "x36_source_token_topk",
    ):
        plan = _plan(catalog()[name].build(spark, SF_SMOKE))
        assert "WindowGroupLimit" in plan, name


def test_linear_trend_is_single_hash_agg(spark):
    """q43 must stay ONE partial+final HashAggregate pair: six decimal
    sums per channel, no window, no sort-aggregate fallback."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q43_linear_trend"].build(spark, SF_SMOKE))
    assert "SortAggregate" not in plan
    assert "Window" not in plan
    assert plan.count("Scan parquet") == 1 or plan.count("FileScan") == 1
    assert "partial_" in plan


def test_lttb_single_window_two_scans(spark):
    """q44's role-keyed form exists to avoid the per-role UNION that
    re-scanned the fact 6x: assert 2 scans, a WindowGroupLimit top-1,
    and broadcast grid joins (raw rows never hash-shuffle)."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q44_lttb_downsample"].build(spark, SF_SMOKE))
    n_scans = max(plan.count("Scan parquet"), plan.count("FileScan"))
    assert n_scans == 2, f"expected 2 fact scans, saw {n_scans}"
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_pq_encode_is_hash_agg(spark):
    """x56's packed-decimal argmin exists to keep the PQ encode a
    map-side-combinable HashAggregate — min(struct)/min_by(struct)
    would fall back to SortAggregate over the n*m*k scored rows."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["x56_pq_topk"].build(spark, SF_SMOKE))
    assert "SortAggregate" not in plan
    assert "partial_min_by" in plan or "min_by" in plan


def test_quality_percentile_rank_window_is_bucket_parallel(spark):
    """x69's exact percent_rank must never run a source-global sort
    over the documents fact table: the rank window partitions by
    (source, __qb) so per-partition sort state is corpus/n_buckets;
    source-only windows are legal only on the tiny (source x bucket)
    counts table, which orders by __qb, never by quality."""
    import re

    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["x69_quality_percentile"].build(spark, SF_SMOKE))
    assert re.search(
        r"windowspecdefinition\(source#\d+, __qb#\d+, quality#", plan
    ), "no (source, bucket) rank window over the fact table"
    assert not re.search(
        r"windowspecdefinition\(source#\d+, quality#", plan
    ), "found a source-global window ordered by quality (unbounded sort)"


def test_hysteresis_episodes_auto_picks_form_by_density(spark):
    """q62's default is scalable='auto' since round 12 (round-11
    verdict #5): the decisive-density rollup picks the PLAIN
    channel-global window when the busiest channel's decisive rows fit
    a single sort task (the measured crossover — this data), and the
    stitched (channel, __bkt) form past the threshold (forced here via
    auto_plain_max=0). The stitched plan must never window the
    decisive table by channel alone; channel-only specs are legal only
    on the tiny boundary tables, which order by __bkt."""
    import re

    from etsd_time_series_database_spark.operators.range_stats import (
        hysteresis_episodes,
    )

    df = load_table(spark, SF_SMOKE, "events")
    # small data: auto resolves to the plain form (channel-global
    # window present, no bucket stitch machinery)
    plan = _plan(hysteresis_episodes(df, 250.0, 50.0))
    assert re.search(
        r"windowspecdefinition\(event_type#\d+, (ts|us|__us)#", plan
    ), "auto under the crossover must pick the plain form"
    assert "__bkt" not in plan
    # past the threshold: auto resolves to the stitched form
    plan = _plan(
        hysteresis_episodes(df, 250.0, 50.0, auto_plain_max=0)
    )
    assert re.search(
        r"windowspecdefinition\(event_type#\d+, __bkt#\d+L, ts#", plan
    ), "no (channel, bucket) window over the decisive table"
    assert not re.search(
        r"windowspecdefinition\(event_type#\d+, (ts|us|__us)#", plan
    ), "found a channel-global window over the decisive table"
    # explicit bool stays lazy and stitched (the pre-round-12 default)
    plan = _plan(hysteresis_episodes(df, 250.0, 50.0, scalable=True))
    assert re.search(
        r"windowspecdefinition\(event_type#\d+, __bkt#\d+L, ts#", plan
    )


def test_rle_profile_windows_are_bucket_stitched(spark):
    """q63's default path: run detection and numbering at (channel,
    __bkt) parallelism; no channel-global window over the fact
    table."""
    import re

    from etsd_time_series_database_spark.operators.range_stats import (
        rle_profile,
    )

    plan = _plan(rle_profile(load_table(spark, SF_SMOKE, "events")))
    assert re.search(
        r"windowspecdefinition\(event_type#\d+, __bkt#\d+L, ts#", plan
    )
    assert not re.search(
        r"windowspecdefinition\(event_type#\d+, (ts|us|__us)#", plan
    )


def test_alarm_coverage_union_window_is_bucket_partitioned(spark):
    """q57's default path must never globally sort the episode table:
    the interval-union window partitions by the time bucket __b (a
    chattering channel makes every sample its own episode — the union
    input is data-dependent, so the global window that used to ride
    it was the one unstitched sort left in the catalog). Unpartitioned
    windows are legal only on the boundary table, whose spec orders by
    (m_s, m_e, __b) and whose cardinality is <= 2 rows per bucket —
    set by time-span / bucket_s, independent of data volume."""
    import re

    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q57_alarm_coverage"].build(spark, SF_SMOKE))
    assert re.search(
        r"windowspecdefinition\(__b#\d+L, __s#\d+L", plan
    ), "no bucket-partitioned union window over the segment table"
    assert not re.search(
        r"windowspecdefinition\(start_us#\d+L", plan
    ), "found the unpartitioned global window over the episode table"


def test_label_dispersion_no_pairs_join(spark):
    """x71 must close from per-dimension sums: no join of any kind in
    the plan (a pairs-table formulation would need a self-join or a
    cartesian product)."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["x71_label_dispersion"].build(spark, SF_SMOKE))
    for bad in ("CartesianProduct", "SortMergeJoin", "BroadcastHashJoin",
                "ShuffledHashJoin", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"x71 plan contains {bad}"
    assert "HashAggregate" in plan


def test_co_alarm_matrix_overlap_join_is_bucket_equi(spark):
    """q65's overlap theta-join must hash on the time bucket, never
    degrade to a nested-loop/cartesian over the episode tables: the
    equality on __b makes it a real equi-join with the range predicate
    as a residual filter."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q65_co_alarm_matrix"].build(spark, SF_SMOKE))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"q65 plan contains {bad}"
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_coverage_timeline_union_window_is_bucket_partitioned(spark):
    """q66 shares q57's split-and-merge stage: the union window must
    partition by the day bucket, and with no cross-bucket stitch
    needed there must be NO unpartitioned window anywhere in the
    plan."""
    import re

    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q66_coverage_timeline"].build(spark, SF_SMOKE))
    assert re.search(r"windowspecdefinition\(__b#\d+L, __s#\d+L", plan)
    assert not re.search(r"windowspecdefinition\(start_us#\d+L", plan)
    assert not re.search(r"windowspecdefinition\(m_s#\d+L", plan)


def test_m4_downsample_stays_hash_aggregate(spark):
    """q73's first/last ride the packed-decimal min_by/max_by (the
    q35 pattern) precisely so the fact-table aggregate hash-combines
    map-side; a struct min/max regression would silently flip the
    whole scan into SortAggregate."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q73_m4_downsample"].build(spark, SF_SMOKE))
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan
    assert "Window" not in plan


def test_bucketed_twa_window_is_bucket_parallel(spark):
    """q74's lead() must partition by (channel, bucket) — never by
    channel alone (the q07/q08 skew cap) — and the downstream
    hash-agg reuses that partitioning: exactly one hash Exchange."""
    import re

    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q74_bucketed_twa"].build(spark, SF_SMOKE))
    assert re.search(
        r"windowspecdefinition\(event_type#\d+, bucket_us#\d+L", plan
    ), "lead window is not (channel, bucket)-partitioned"
    assert plan.count("Exchange hashpartitioning") == 1


def test_topk_per_channel_uses_window_group_limit(spark):
    """q09's rank-filter must keep Catalyst's two-phase
    WindowGroupLimit (map-side Partial top-k before the per-channel
    shuffle, Final after): only <= k rows per channel per map task
    cross the wire, so the 3-channel window is NOT the q07-style
    skew cap. A refactor that hides the rn <= k filter from the
    optimizer (e.g. materializing rn first) would silently revert to
    the full per-channel sort."""
    from etsd_time_series_database_spark.plans import catalog

    plan = _plan(catalog()["q09_topk_per_channel"].build(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan


def test_amend_cross_day_probe_prunes_and_broadcasts(spark, tmp_path):
    """amend's key→day probe (the cross-day delete side, round-11
    verdict #1) must stay a key-column scan + broadcast join at 100 TB:
    the store scan's ReadSchema carries ONLY the key column (dt is a
    directory value, value/props bytes never read) and the tiny
    correction side rides the broadcast — no store-side shuffle."""
    import re

    import pyspark.sql.functions as F

    from etsd_time_series_database_spark.sources.store import (
        cross_day_probe,
    )

    events = load_table(spark, SF_SMOKE, "events")
    store = str(tmp_path / "probe_store")
    events.withColumn("dt", F.to_date("ts")).repartition(
        "dt"
    ).write.partitionBy("dt").parquet(store)
    corr = events.limit(3).withColumn(
        "ts", F.to_timestamp(F.lit("2033-01-01 00:00:00"))
    ).localCheckpoint()
    probe = cross_day_probe(spark, store, corr, ["event_id"])
    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan.split(
        "BroadcastHashJoin"
    )[0], "store side must not shuffle before the broadcast join"
    # the STORE scan reads only the key column beside the dt partition
    # value (plan paths truncate, so identify it by its column list)
    m = re.search(
        r"FileScan parquet \[event_id#\d+L,dt#\d+\].*?"
        r"ReadSchema: struct<([^>]*)>",
        plan,
        re.DOTALL,
    )
    assert m, plan
    assert m.group(1) == "event_id:bigint", m.group(1)


def test_day_scoped_store_scan_prunes_partitions(spark, tmp_path):
    """Round-12 verdict #1: the day-scoped refresh paths
    (refresh_downsample / refresh_digest_tier, both via
    sources.store.day_scoped) must filter on the dt PARTITION column
    so Catalyst prunes the scan to the one amended day's directory.
    The empirical probe from the verdict, pinned: a to_date(ts)
    predicate alone (the pre-round-13 form) carries ZERO
    PartitionFilters — at 100x scale a "refresh one day" would plan
    tasks over every day's files. A flat (unpartitioned) table falls
    back to the ts predicate."""
    import pyspark.sql.functions as F

    from etsd_time_series_database_spark.plans.inspect import summarize
    from etsd_time_series_database_spark.sources.store import day_scoped

    events = load_table(spark, SF_SMOKE, "events")
    store = str(tmp_path / "pruned_store")
    events.withColumn("dt", F.to_date("ts")).repartition(
        "dt"
    ).write.partitionBy("dt").parquet(store)
    raw = spark.read.parquet(store)
    day = sorted(
        r.dt.isoformat() for r in raw.select("dt").distinct().collect()
    )[1]

    scoped = day_scoped(raw, day)
    s = summarize(scoped)
    assert s.partition_filters, "day_scoped must emit a PartitionFilter"
    assert any("dt" in pf and day in pf for pf in s.partition_filters), (
        s.partition_filters
    )
    assert "dt" not in scoped.columns  # flat-path schema parity

    # runtime witness: the executed scan reads exactly the named
    # day's files (inputFiles() is listing-level, so count via the
    # populated scan metrics instead)
    import glob
    import os

    from etsd_time_series_database_spark.plans.metrics import (
        collect_plan_metrics,
    )

    scoped.collect()
    day_files = len(glob.glob(os.path.join(store, f"dt={day}", "*.parquet")))
    assert collect_plan_metrics(scoped)["scan_files"] == day_files

    # negative control — the exact shape the round-12 verdict flagged:
    # a data-column predicate cannot prune dt= directories
    naive = raw.filter(F.to_date("ts") == F.lit(day))
    assert not summarize(naive).partition_filters
    naive.collect()
    all_files = len(glob.glob(os.path.join(store, "dt=*", "*.parquet")))
    assert collect_plan_metrics(naive)["scan_files"] == all_files > day_files

    # flat store: falls back to the ts predicate, same row set
    flat = str(tmp_path / "flat_store")
    events.write.parquet(flat)
    flat_scoped = day_scoped(spark.read.parquet(flat), day)
    assert flat_scoped.count() == scoped.count() > 0


def test_fetch_from_tier_scans_only_the_routed_tier(spark, tmp_path):
    """Round-13 verdict #1 'done' criterion: the materialized-tier
    fetch (q80 / CLI `fetch`) must read ONLY the routed tier's files —
    the raw store and the losing ladder tiers appear nowhere in the
    plan, and the executed scan's file count equals the routed sink's
    parquet population. Routing itself is driver-side sidecar metadata
    (KB reads), so at 100 TB the query cost is the tier slice,
    independent of raw volume. A bounded fetch additionally prunes the
    tier's dt= partitions."""
    import glob
    import os

    from etsd_time_series_database_spark.operators.trends import (
        fetch_from_tier,
    )
    from etsd_time_series_database_spark.plans.metrics import (
        collect_plan_metrics,
    )
    from etsd_time_series_database_spark.sources.store import (
        create_events_table,
    )
    from etsd_time_series_database_spark.streaming.ingest import (
        refresh_downsample,
    )

    events = load_table(spark, SF_SMOKE, "events")
    raw = str(tmp_path / "fetch_raw")
    create_events_table(events, raw, mode="overwrite")
    fine = str(tmp_path / "fetch_w60")
    coarse = str(tmp_path / "fetch_w3600")
    refresh_downsample(spark, raw, fine, width_s=60)
    refresh_downsample(spark, raw, coarse, width_s=3600)

    out = fetch_from_tier(spark, [fine, coarse], 43200)
    # which relations the plan reads (inputFiles is listing-level —
    # right for "is this table in the plan at all"; the executed file
    # COUNT is asserted via scan metrics below)
    in_files = out.inputFiles()
    assert in_files and all("fetch_w3600" in f for f in in_files)
    assert not any("fetch_w60/" in f or "fetch_raw" in f for f in in_files)
    out.collect()
    tier_files = len(glob.glob(os.path.join(coarse, "dt=*", "*.parquet")))
    fine_files = len(glob.glob(os.path.join(fine, "dt=*", "*.parquet")))
    assert tier_files > 0 and fine_files > 0
    assert collect_plan_metrics(out)["scan_files"] == tier_files

    # bounded fetch: dt partition pruning inside the routed tier —
    # executed scan strictly smaller than the whole tier
    days = sorted(
        os.path.basename(p).split("=", 1)[1]
        for p in glob.glob(os.path.join(coarse, "dt=*"))
    )
    assert len(days) >= 3
    mid = days[len(days) // 2]
    import datetime as _dt

    lo = int(
        _dt.datetime.fromisoformat(f"{mid}T00:00:00+00:00").timestamp()
        * 1_000_000
    )
    hi = lo + 86_400 * 1_000_000
    bounded = fetch_from_tier(spark, [fine, coarse], 43200,
                              start_us=lo, end_us=hi)
    bounded.collect()
    assert 0 < collect_plan_metrics(bounded)["scan_files"] < tier_files


def test_ladder_fetch_prunes_to_the_routed_tier_partition(spark, tmp_path):
    """materialize_tier_ladder + fetch: tier_s is a PARTITION column,
    so the routed fetch must carry a tier_s PartitionFilter and its
    EXECUTED scan must read exactly the routed tier's files (inputFiles
    is listing-level and does not reflect partition pruning — the
    metrics are the witness, per the day_scoped test)."""
    import glob
    import os
    import re

    from etsd_time_series_database_spark.operators.trends import (
        fetch_from_tier,
        materialize_tier_ladder,
    )
    from etsd_time_series_database_spark.plans.metrics import (
        collect_plan_metrics,
    )

    events = load_table(spark, SF_SMOKE, "events")
    lad = str(tmp_path / "ladder_prune")
    materialize_tier_ladder(events, lad, tiers_s=(3600, 21600, 86400))

    out = fetch_from_tier(spark, lad, 43200)
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "tier_s" in m.group(1) and "21600" in m.group(1), plan
    out.collect()
    tier_files = len(
        glob.glob(os.path.join(lad, "tier_s=21600", "*.parquet"))
    )
    all_files = len(
        glob.glob(os.path.join(lad, "tier_s=*", "*.parquet"))
    )
    assert 0 < tier_files < all_files
    assert collect_plan_metrics(out)["scan_files"] == tier_files
