"""Integration round trips (SURVEY.md §5 layer 3):

  * ingest -> query == query-over-raw: writing through the partitioned
    store and querying back gives identical results to querying the
    in-memory frame (the reference's ingest/read symmetry,
    code/etsdSave.c vs code/etsdRead.c);
  * as-of join against a brute-force per-row reference implementation
    on seeded random series;
  * dedup helper edge cases (short docs, empty-ish text).
"""

from __future__ import annotations

import importlib
import random

from pyspark.sql import functions as F

from etsd_time_series_database_spark.operators import asof_join
from etsd_time_series_database_spark.sources.store import (
    create_events_table,
    read_events_table,
)

ops = importlib.import_module("etsd_time_series_database_spark.operators.range_stats")
dd = importlib.import_module("etsd_time_series_database_spark.operators.dedup")


def test_ingest_then_query_equals_query_over_raw(spark, tmp_path):
    rnd = random.Random(7)
    rows = [
        (
            f"2026-01-{1 + i // 1000:02d} {(i // 60) % 24:02d}:{i % 60:02d}:00",
            rnd.choice(["a", "b", "c"]),
            float(rnd.randint(0, 10_000)),
            i,
        )
        for i in range(3000)
    ]
    raw = spark.createDataFrame(
        rows, "ts string, event_type string, value double, event_id bigint"
    ).withColumn("ts", F.to_timestamp("ts"))

    path = str(tmp_path / "tbl")
    create_events_table(raw, path, mode="overwrite")
    stored = read_events_table(spark, path)

    def stats(df):
        return sorted(
            map(
                tuple,
                ops.range_stats(df, "2026-01-01", "2026-01-04").collect(),
            )
        )

    assert stats(stored) == stats(raw)
    # and the window/sequential path too (same ordering keys available)
    assert sorted(map(tuple, ops.rate(stored).collect())) == sorted(
        map(tuple, ops.rate(raw).collect())
    )


def test_asof_join_matches_bruteforce(spark):
    rnd = random.Random(13)
    right_rows = [
        (f"2026-01-01 00:{m:02d}:00", k, float(rnd.randint(0, 100)))
        for k in ("x", "y")
        for m in sorted(rnd.sample(range(60), 12))
    ]
    left_rows = [
        (f"2026-01-01 00:{m:02d}:30", k, i)
        for i, (k, m) in enumerate(
            (rnd.choice(["x", "y"]), rnd.randrange(60)) for _ in range(40)
        )
    ]
    right = spark.createDataFrame(
        right_rows, "ts string, k string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    left = spark.createDataFrame(
        left_rows, "ts string, k string, lid bigint"
    ).withColumn("ts", F.to_timestamp("ts"))

    got = {
        r.lid: r.v_asof
        for r in asof_join(left, right, on="k", value_cols=["v"]).collect()
    }

    rmap: dict[str, list] = {}
    for ts, k, v in right_rows:
        rmap.setdefault(k, []).append((ts, v))
    want = {}
    for ts, k, lid in left_rows:
        prior = [(t, v) for t, v in rmap.get(k, []) if t <= ts]
        want[lid] = max(prior)[1] if prior else None
    assert got == want


def test_shingles_short_doc_is_empty(spark):
    df = spark.createDataFrame(
        [(1, "only two"), (2, "a b c"), (3, "")], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r.shingle for r in dd.doc_shingles(df).collect()
    }
    # doc 1 (<3 tokens) and doc 3 (empty) produce no shingles
    assert set(got) == {2} and got[2] == "a b c"


def test_exact_dedup_groups_identical_texts(spark):
    df = spark.createDataFrame(
        [(1, "same"), (5, "same"), (3, "other")], "doc_id bigint, text string"
    )
    rows = {r.canonical_id: r.n_copies for r in dd.exact_dedup(df).collect()}
    assert rows == {1: 2, 3: 1}


def test_minhash_signature_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 w5")], "doc_id bigint, text string"
    )
    sig = dd.minhash_signatures(df, hash_mode="hash64").collect()
    by_doc: dict[int, dict[int, int]] = {}
    for r in sig:
        by_doc.setdefault(r.doc_id, {})[r.j] = r.h
    # 8 hash functions per doc; identical docs -> identical signatures
    assert len(by_doc[1]) == len(dd.MINHASH_PARAMS)
    assert by_doc[1] == by_doc[2]


def test_cluster_pairs_connected_components(spark):
    # components: {1,2,3} (chain), {10,11}, singletons never appear
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    got = {r.doc_id: r.component for r in dd.cluster_pairs(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chunk_documents_edges(spark):
    import importlib

    ts = importlib.import_module(
        "etsd_time_series_database_spark.operators.textstats"
    )
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 2 chunks (stride 6)
            (2, "a b"),  # single short chunk
            (3, ""),  # no chunks
            (4, " ".join(f"t{i}" for i in range(12))),  # exactly 2 strides: no trailing overlap-only chunk
        ],
        "doc_id bigint, text string",
    )
    rows = ts.chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_chunk_tokens, r.chunk_text))
    assert [c[:2] for c in by_doc[1]] == [(0, 8), (1, 4)]
    assert by_doc[1][1][2] == "t6 t7 t8 t9"  # overlap of 2 with chunk 0
    assert by_doc[2] == [(0, 2, "a b")]
    assert 3 not in by_doc
    assert [c[:2] for c in by_doc[4]] == [(0, 8), (1, 6)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ts.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_cosine_topk_arrow_matches_jvm_fold(spark):
    import importlib

    sim = importlib.import_module(
        "etsd_time_series_database_spark.operators.similarity"
    )
    from etsd_time_series_database_spark.sources.store import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    jvm = sim.cosine_topk(emb, query_id=0, k=10).collect()
    arrow = sim.cosine_topk_arrow(emb, qv, query_id=0, k=10).collect()
    assert [r.vec_id for r in jvm] == [r.vec_id for r in arrow]
    for a, b in zip(jvm, arrow):
        # numpy matmul vs sequential fold: equal to accumulation round-off
        assert abs(a.cosine - b.cosine) < 1e-12


def test_kmeans_refine_converges_on_separable_data(spark):
    import importlib

    sim = importlib.import_module(
        "etsd_time_series_database_spark.operators.similarity"
    )
    # two obvious clusters around e1 and e2 axes
    rows = []
    for i in range(10):
        rows.append((i, [10.0 + (i % 3), 1.0, 0.0]))
        rows.append((100 + i, [1.0, 10.0 + (i % 3), 0.0]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = sim.kmeans_refine(emb, centroid_ids=[0, 100], n_iter=3)
    got = {r.cent_id: list(r.cent_vec) for r in cents.collect()}
    assert set(got) == {0, 100}
    # centroid 0 stays x-dominant, centroid 100 y-dominant
    assert got[0][0] > got[0][1] and got[100][1] > got[100][0]
    # every vector assigns to its own cluster's centroid
    assigned = sim.assign_cells(emb, [0, 100])
    cells = {r.vec_id: r.cent_id for r in assigned.collect()}
    assert all(cells[i] == 0 for i in range(10))
    assert all(cells[100 + i] == 100 for i in range(10))


def test_deployed_layout_serves_queries_with_pruning(spark, tmp_path):
    """Deploy-shape e2e: write real events through the engine's own
    partitioned store, then (a) range stats over the copy equal those
    over the original and (b) a date-restricted scan prunes partitions."""
    from etsd_time_series_database_spark.sources.store import load_table
    from tests.conftest import SF_SMOKE

    src = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "deployed")
    create_events_table(src, path, mode="overwrite")
    stored = read_events_table(spark, path)

    a, b = "2024-01-05 00:00:00", "2024-01-20 00:00:00"
    want = sorted(map(tuple, ops.range_stats(src, a, b).collect()))
    got = sorted(map(tuple, ops.range_stats(stored, a, b).collect()))
    assert got == want

    pruned = spark.read.parquet(path).filter(
        F.col("dt").between("2024-01-05", "2024-01-06")
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan
    n_days = pruned.select("dt").distinct().count()
    assert n_days == 2


def test_pq_topk_retrieves_query_cluster(spark):
    import importlib

    from pyspark.sql import Row

    sim = importlib.import_module(
        "etsd_time_series_database_spark.operators.similarity"
    )

    # Four well-separated clusters in 64-d: cluster c lives on dims
    # [16c, 16c+16) with small deterministic per-vector jitter.  PQ with
    # seed codebook ids 1..16 (four seeds per cluster) must quantize
    # every vector into its own cluster\'s region, so ADC top-k for a
    # cluster-0 query returns only cluster-0 vectors.
    def vec(cluster, j):
        v = [0.0] * 64
        for d in range(16 * cluster, 16 * cluster + 16):
            v[d] = 1.0 + 0.01 * ((j * 7 + d) % 5)
        return v

    rows = []
    vid = 0
    for j in range(10):            # ids 0..39 interleave clusters so
        for c in range(4):         # seeds 1..16 cover all four clusters
            rows.append(Row(vec_id=vid, embedding=vec(c, j), label=c))
            vid += 1
    emb = spark.createDataFrame(rows)
    label = {r.vec_id: r.label for r in rows}
    got = sim.pq_topk(emb, query_id=0, k=5).collect()
    assert len(got) == 5
    assert all(label[r.vec_id] == label[0] for r in got)
    # ADC distances come back sorted ascending with the exact-decimal
    # ordering applied before the round
    assert [r.adc_d2 for r in got] == sorted(r.adc_d2 for r in got)


def test_pq_topk_smoke_on_store(spark):
    import importlib

    sim = importlib.import_module(
        "etsd_time_series_database_spark.operators.similarity"
    )
    from etsd_time_series_database_spark.sources.store import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = sim.pq_topk(emb, query_id=0, k=10).collect()
    assert len(got) == 10
    assert all(r.adc_d2 >= 0.0 for r in got)
    assert [r.adc_d2 for r in got] == sorted(r.adc_d2 for r in got)


def test_ivfpq_results_subset_of_query_cell(spark):
    import importlib

    sim = importlib.import_module(
        "etsd_time_series_database_spark.operators.similarity"
    )
    from pyspark.sql import functions as F
    from etsd_time_series_database_spark.sources.store import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = list(range(1, 9))
    cells = sim.assign_cells(emb, cents)
    qcell = cells.filter(F.col("vec_id") == 0).collect()[0].cent_id
    members = {
        r.vec_id
        for r in cells.filter(F.col("cent_id") == qcell).collect()
    }
    got = sim.ivfpq_topk(emb, query_id=0, centroid_ids=cents, k=10).collect()
    assert 0 < len(got) <= 10
    # every hit comes from the query's coarse cell, never elsewhere
    assert all(r.vec_id in members and r.vec_id != 0 for r in got)
    # and the ADC ordering is ascending with vec_id tiebreak
    assert [(r.adc_d2, r.vec_id) for r in got] == sorted(
        (r.adc_d2, r.vec_id) for r in got
    )


def test_centroid_similarity_separable_clusters(spark):
    import importlib

    from pyspark.sql import Row

    sim = importlib.import_module(
        "etsd_time_series_database_spark.operators.similarity"
    )

    # two orthogonal clusters + one cluster aligned with the first:
    # the separability matrix must read ~0 for orthogonal pairs and
    # ~1 for the aligned pair
    def vec(active, n=64, jitter=0):
        v = [0.0] * n
        for d in active:
            v[d] = 1.0 + 0.001 * jitter
        return v

    rows = []
    vid = 0
    for j in range(5):
        rows.append(Row(vec_id=vid, embedding=vec(range(0, 8), jitter=j), label=0)); vid += 1
        rows.append(Row(vec_id=vid, embedding=vec(range(32, 40), jitter=j), label=1)); vid += 1
        rows.append(Row(vec_id=vid, embedding=vec(range(0, 8), jitter=j + 3), label=2)); vid += 1
    out = {
        (r.label_a, r.label_b): r.centroid_cosine
        for r in sim.centroid_similarity(spark.createDataFrame(rows)).collect()
    }
    assert out[(0, 1)] < 0.01 and out[(1, 2)] < 0.01
    assert out[(0, 2)] > 0.999
