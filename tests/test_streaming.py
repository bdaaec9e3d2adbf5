"""Streaming-module tests (SURVEY.md §5 layer 4).

The windowed/session operators are tested deterministically in batch
mode (watermark is a no-op on batch DataFrames, window/session_window
semantics are identical), plus one true micro-batch smoke through the
rate-based sim source and the memory sink.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from etsd_time_series_database_spark.streaming import ingest


def _events(spark, rows):
    return spark.createDataFrame(
        [(ts, "s", ch, float(v) if v is not None else None, st) for ts, ch, v, st in rows],
        "ts string, source string, channel string, value double, status int",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_windowed_aggregate_batch_semantics(spark):
    df = _events(
        spark,
        [
            ("2026-01-01 00:00:05", "a", 1, 0),
            ("2026-01-01 00:00:55", "a", 3, 0),
            ("2026-01-01 00:01:05", "a", 10, 0),
            ("2026-01-01 00:00:10", "b", 7, 0),
        ],
    )
    out = {
        (r.channel, str(r.bucket_ts)): (r.n, r.min_value, r.max_value, r.avg_value)
        for r in ingest.windowed_aggregate(df, width_s=60).collect()
    }
    assert out[("a", "2026-01-01 00:00:00")] == (2, 1.0, 3.0, 2.0)
    assert out[("a", "2026-01-01 00:01:00")] == (1, 10.0, 10.0, 10.0)
    assert out[("b", "2026-01-01 00:00:00")] == (1, 7.0, 7.0, 7.0)


def test_session_gaps_batch_semantics(spark):
    df = _events(
        spark,
        [
            ("2026-01-01 00:00:00", "a", 1, 0),
            ("2026-01-01 00:01:00", "a", 1, 0),
            # > 300 s of silence -> new session
            ("2026-01-01 00:10:00", "a", 1, 0),
        ],
    )
    rows = sorted(
        ingest.session_gaps(df, gap_s=300).collect(), key=lambda r: r.session_start
    )
    assert len(rows) == 2
    assert rows[0].n_events == 2 and rows[1].n_events == 1


def test_carry_forward_batch_fills_and_updates_state(spark):
    b = _events(
        spark,
        [
            ("2026-01-01 00:00:02", "a", None, 0),
            ("2026-01-01 00:00:03", "a", 9, 0),
            ("2026-01-01 00:00:04", "a", None, 0),
        ],
    )
    state = spark.createDataFrame(
        [("s", "a", "2026-01-01 00:00:01", 7.5)],
        "source string, channel string, last_ts string, last_value double",
    ).withColumn("last_ts", F.to_timestamp("last_ts"))

    filled, new_state = ingest.carry_forward_batch(b, state)
    vals = [r.value_filled for r in filled.orderBy("ts").collect()]
    # NULL at :02 takes the seeded 7.5; :03 reads 9; NULL at :04 carries 9.
    assert vals == [7.5, 9.0, 9.0]
    ns = new_state.collect()[0]
    assert ns.last_value == 9.0 and str(ns.last_ts).startswith("2026-01-01 00:00:04")


def test_carry_forward_without_state(spark):
    b = _events(
        spark,
        [("2026-01-01 00:00:01", "a", None, 0), ("2026-01-01 00:00:02", "a", 4, 0)],
    )
    filled, new_state = ingest.carry_forward_batch(b, None)
    vals = [r.value_filled for r in filled.orderBy("ts").collect()]
    assert vals == [None, 4.0]
    assert new_state.collect()[0].last_value == 4.0


def test_source_registry_and_union(spark):
    assert "sim" in ingest.SOURCE_REGISTRY
    a = _events(spark, [("2026-01-01 00:00:01", "a", 1, 0)])
    b = _events(spark, [("2026-01-01 00:00:02", "b", 2, 0)])
    assert ingest.union_sources([a, b]).count() == 2


@pytest.mark.slow
def test_sim_source_micro_batch_smoke(spark):
    """One true streaming run: sim source -> windowed agg -> memory sink."""
    src = ingest.sim_source(spark, rows_per_second=50, n_channels=3)
    assert src.isStreaming
    agg = ingest.windowed_aggregate(src, width_s=2, watermark="0 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("sim_smoke")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("select count(*) c from sim_smoke").collect()[0][0]
            if n > 0:
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination()
    assert n > 0


def test_sliding_window_batch_semantics(spark):
    df = _events(
        spark,
        [
            ("2026-01-01 00:00:10", "a", 2, 0),
            ("2026-01-01 00:00:50", "a", 4, 0),
        ],
    )
    out = {
        str(r.bucket_ts): r.n
        for r in ingest.windowed_aggregate(df, width_s=60, slide_s=30).collect()
    }
    # 60s windows sliding by 30s: :10 falls in [23:59:30, 00:00:30) and
    # [00:00:00, 00:01:00); :50 in [00:00:00,...) and [00:00:30,...)
    assert out["2025-12-31 23:59:30"] == 1
    assert out["2026-01-01 00:00:00"] == 2
    assert out["2026-01-01 00:00:30"] == 1


def test_enrich_join_stream_batch_semantics(spark):
    readings = _events(
        spark,
        [
            ("2026-01-01 00:01:00", "a", 10, 0),
            ("2026-01-01 00:05:00", "a", 20, 0),
            ("2026-01-01 00:01:00", "b", 30, 0),
        ],
    )
    anns = _events(
        spark,
        [
            ("2026-01-01 00:00:30", "a", 99, 0),   # 30 s before reading 1
            ("2026-01-01 00:03:00", "a", 77, 0),   # 120 s before reading 2
        ],
    )
    out = ingest.enrich_join_stream(readings, anns, band_s=60).collect()
    # only reading (a, 00:01) has an annotation within its 60 s band;
    # reading 2's annotation is 120 s old, channel b has none
    assert len(out) == 1
    r = out[0]
    assert (r.channel, r.value, r.ann_value) == ("a", 10.0, 99.0)


def test_enrich_join_stream_true_streaming_smoke(spark, tmp_path):
    """Exercise the REAL stream-stream join (not the batch degenerate):
    two file streams, availableNow trigger, memory sink."""
    import uuid

    rdir, adir = tmp_path / "r", tmp_path / "a"
    rdir.mkdir(), adir.mkdir()
    _events(
        spark, [("2026-01-01 00:01:00", "a", 10, 0)]
    ).write.parquet(str(rdir / "p"))
    _events(
        spark, [("2026-01-01 00:00:30", "a", 99, 0)]
    ).write.parquet(str(adir / "p"))
    schema = "ts timestamp, source string, channel string, value double, status int"
    rs = spark.readStream.schema(schema).parquet(str(rdir / "p"))
    as_ = spark.readStream.schema(schema).parquet(str(adir / "p"))
    joined = ingest.enrich_join_stream(rs, as_, band_s=60)
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert len(rows) == 1 and rows[0].ann_value == 99.0


def test_enrich_static_stream_batch_semantics(spark):
    readings = _events(
        spark,
        [
            ("2026-01-01 00:01:00", "a", 10, 0),
            ("2026-01-01 00:02:00", "b", 20, 0),
            ("2026-01-01 00:03:00", "c", 30, 0),
        ],
    ).withColumn(
        "owner_id",
        F.when(F.col("channel") == "a", 1)
        .when(F.col("channel") == "b", 2)
        .otherwise(99),  # no dim row -> dropped (inner)
    )
    dim = spark.createDataFrame(
        [(1, "GOLD"), (2, "SILVER")], "cust_id int, tier string"
    )
    out = {
        r.channel: r.tier
        for r in ingest.enrich_static_stream(
            readings, dim, on="owner_id", dim_key="cust_id"
        ).collect()
    }
    assert out == {"a": "GOLD", "b": "SILVER"}


def test_enrich_static_stream_true_streaming(spark, tmp_path):
    """The REAL stream-static join: file stream x in-memory dim,
    availableNow trigger, memory sink. Stateless, so no watermark."""
    import uuid

    rdir = tmp_path / "r"
    rdir.mkdir()
    _events(
        spark,
        [
            ("2026-01-01 00:01:00", "a", 10, 0),
            ("2026-01-01 00:02:00", "b", 20, 0),
        ],
    ).withColumn(
        "owner_id", F.when(F.col("channel") == "a", 1).otherwise(7)
    ).write.parquet(str(rdir / "p"))
    schema = (
        "ts timestamp, source string, channel string, value double, "
        "status int, owner_id int"
    )
    rs = spark.readStream.schema(schema).parquet(str(rdir / "p"))
    dim = spark.createDataFrame([(1, "GOLD")], "cust_id int, tier string")
    joined = ingest.enrich_static_stream(
        rs, dim, on="owner_id", dim_key="cust_id"
    )
    name = f"static_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # channel b's owner 7 has no dim row: inner join drops it
    assert len(rows) == 1
    assert (rows[0].channel, rows[0].tier) == ("a", "GOLD")


def test_enrich_static_stream_broadcasts_dim(spark):
    """Plan shape: the KB-sized static dim must build a broadcast-hash
    join — the stream side never shuffles per micro-batch. Uses the
    s11 shapes (parquet-backed customer dim, so the optimizer has real
    size stats, exactly as in the replay entry)."""
    from etsd_time_series_database_spark.sources.store import load_table
    from tests.conftest import SF_SMOKE

    readings = load_table(spark, SF_SMOKE, "events").select(
        F.col("ts"),
        F.col("event_type").alias("channel"),
        F.col("value"),
        F.col("user_id").cast("long").alias("owner_id"),
    )
    dim = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").cast("long").alias("c_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    joined = ingest.enrich_static_stream(
        readings, dim, on="owner_id", dim_key="c_custkey"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_stream_stream_join_is_symmetric_hash(spark):
    """s10's physical shape: a real StreamingSymmetricHashJoin keyed on
    (source, channel), with per-side state-cleanup predicates derived
    from watermark + band — state stays bounded by the time horizon,
    not stream length."""
    from etsd_time_series_database_spark.plans.streaming_replay import (
        _S10_BAND_S,
        _S10_THR,
        _source_rows,
    )
    from tests.conftest import SF_SMOKE

    rows = _source_rows(spark, SF_SMOKE, inject_nulls=False)
    alerts = rows.filter(F.col("value") >= _S10_THR)
    joined = ingest.enrich_join_stream(rows, alerts, band_s=_S10_BAND_S)
    # NB: queryExecution().toString() does NOT render the streaming
    # physical plan (incremental planning happens at query start);
    # explain(True) does — capture its stdout.
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain(True)
    plan = buf.getvalue()
    assert "StreamingSymmetricHashJoin" in plan, plan
    assert "state cleanup" in plan, plan


@pytest.mark.slow
def test_stream_stream_join_state_is_watermark_bounded(spark, tmp_path):
    """The scale property that makes s10 deployable on an unbounded
    stream: join state is evicted past watermark + band, so the state
    row count tracks the TIME HORIZON, not the stream length. Replays
    a month of events in 8 chronological micro-batches and asserts
    the final state holds a small fraction of the rows seen."""
    import uuid

    from pyspark.sql.window import Window

    src = tmp_path / "src"
    src.mkdir()
    schema = (
        "ts timestamp, source string, channel string, value double, "
        "status int"
    )
    from etsd_time_series_database_spark.sources.store import load_table
    from tests.conftest import SF_SMOKE

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            F.col("ts"),
            F.lit("events").alias("source"),
            F.col("event_type").alias("channel"),
            F.col("value").cast("double").alias("value"),
            F.lit(0).alias("status"),
        )
        .withColumn("__b", F.ntile(8).over(Window.orderBy("ts")))
    )
    for i in range(1, 9):  # chronological arrival, one file per batch
        ev.filter(F.col("__b") == i).drop("__b").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    rs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    alerts = rs.filter(F.col("value") >= 150.0)
    joined = ingest.enrich_join_stream(rs, alerts, band_s=600)
    name = f"bounded_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    progress = [p for p in q.recentProgress if p.get("stateOperators")]
    assert progress, "no stateful progress recorded"
    n_in = sum(p["numInputRows"] for p in q.recentProgress)
    final_state = progress[-1]["stateOperators"][0]["numRowsTotal"]
    assert n_in >= 900  # the whole table streamed through
    # a month of data, a ~12.6 min state horizon (2 min watermark +
    # 600 s band): final state must be a small fraction of the stream
    assert final_state < 0.10 * n_in, (final_state, n_in)
