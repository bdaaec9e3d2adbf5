"""True stateful-streaming test: applyInPandasWithState carry-forward
across MICRO-BATCH boundaries — two parquet files fed one per trigger
(maxFilesPerTrigger=1), so the second batch can only fill its NULL from
persisted group state, not from anything in its own batch."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from etsd_time_series_database_spark.streaming.stateful import carry_forward_stream

SCHEMA = "ts timestamp, source string, channel string, value double, status int"


def _write_batch(spark, path, rows, mtime):
    df = spark.createDataFrame(
        [(ts, "s", ch, v, 0) for ts, ch, v in rows],
        "ts string, source string, channel string, value double, status int",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


@pytest.mark.slow
def test_carry_forward_state_survives_micro_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    b1 = os.path.join(src, "b1")
    b2 = os.path.join(src, "b2")
    now = time.time()
    # batch 1 establishes state: last value 42 on channel a
    _write_batch(spark, b1, [("2026-01-01 00:00:01", "a", 42.0)], now - 100)
    # batch 2 has only a NULL for channel a: fill must come from state
    _write_batch(spark, b2, [("2026-01-01 00:00:02", "a", None)], now - 50)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = carry_forward_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("cf_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the fill MUST have crossed a micro-batch boundary: if both files
    # landed in one batch, in-batch carry would mask missing state
    assert len(q.recentProgress) >= 2
    rows = {
        r.ts_us: (r.value, r.value_filled, r.n_missed)
        for r in spark.sql("select * from cf_state").collect()
    }
    assert len(rows) == 2
    by_time = [rows[k] for k in sorted(rows)]
    assert by_time[0] == (42.0, 42.0, 0)
    # NULL in the later micro-batch filled from carried state
    assert by_time[1][0] is None
    assert by_time[1][1] == 42.0 and by_time[1][2] == 1


@pytest.mark.slow
def test_hysteresis_alarm_spans_micro_batches(spark, tmp_path):
    """An episode opened in micro-batch 1 must close in micro-batch 2
    with the exact span — opened_ts_us lives in group state. In-band
    samples emit nothing."""
    from etsd_time_series_database_spark.streaming.stateful import (
        hysteresis_alarm_stream,
    )

    src = str(tmp_path / "alarm_src")
    now = time.time()
    # batch 1: in-band (no event), cross hi (open), in-band carry
    _write_batch(
        spark,
        os.path.join(src, "b1"),
        [
            ("2026-01-01 00:00:00", "a", 100.0),
            ("2026-01-01 00:00:10", "a", 260.0),
            ("2026-01-01 00:00:20", "a", 200.0),
        ],
        now - 100,
    )
    # batch 2: still high (no event, already active), reset (close)
    _write_batch(
        spark,
        os.path.join(src, "b2"),
        [
            ("2026-01-01 00:00:30", "a", 300.0),
            ("2026-01-01 00:00:40", "a", 40.0),
        ],
        now - 50,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = hysteresis_alarm_stream(stream, hi=250.0, lo=50.0)
    q = (
        out.writeStream.format("memory")
        .queryName("hyst_alarm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2
    rows = sorted(
        spark.sql("select * from hyst_alarm").collect(),
        key=lambda r: r.ts_us,
    )
    assert [(r.event, r.value, r.span_us) for r in rows] == [
        ("open", 260.0, None),
        ("close", 40.0, 30 * 1_000_000),
    ]


@pytest.mark.slow
def test_freshness_stream_detects_stale_and_recovery(spark, tmp_path):
    """q64's live dual: channel b goes silent after batch 1; once the
    watermark passes b's last_ts + SLA (advanced by later batches of
    channel a), the group timeout fires a single 'stale' row; when b
    speaks again it emits 'recovered' with the silence span."""
    from etsd_time_series_database_spark.streaming.stateful import (
        freshness_stream,
    )

    src = str(tmp_path / "fresh_src")
    now = time.time()
    _write_batch(
        spark,
        os.path.join(src, "b1"),
        [("2026-01-01 00:00:00", "a", 1.0), ("2026-01-01 00:00:00", "b", 1.0)],
        now - 100,
    )
    # only a keeps speaking: advances the watermark past b's SLA
    _write_batch(
        spark, os.path.join(src, "b2"),
        [("2026-01-01 00:10:00", "a", 1.0)], now - 80,
    )
    _write_batch(
        spark, os.path.join(src, "b3"),
        [("2026-01-01 00:20:00", "a", 1.0)], now - 60,
    )
    # b recovers
    _write_batch(
        spark, os.path.join(src, "b4"),
        [("2026-01-01 00:30:00", "b", 1.0)], now - 40,
    )
    _write_batch(
        spark, os.path.join(src, "b5"),
        [("2026-01-01 00:40:00", "a", 1.0)], now - 20,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = freshness_stream(stream, stale_after_s=60.0)
    q = (
        out.writeStream.format("memory")
        .queryName("freshness")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 4
    rows = spark.sql("select * from freshness").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r.source, r.channel), []).append(r)
    a_events = [r.status for r in sorted(by_key[("s", "a")], key=lambda r: r.ts_us)]
    b_rows = sorted(by_key[("s", "b")], key=lambda r: r.ts_us)
    b_events = [r.status for r in b_rows]
    # a never went silent for >60s relative to the final watermark? it
    # DID stop after 00:40 but the watermark never passes 00:41, so no
    # stale fires for a
    assert a_events == ["first_seen"]
    # b re-arms its SLA on recovery at 00:30, then goes silent AGAIN;
    # batch 5 (a at 00:40) pushes the watermark past 00:31, so a
    # second stale fires — each silence is its own incident
    assert b_events == ["first_seen", "stale", "recovered", "stale"]
    base_us = 1767225600000000  # 2026-01-01 00:00:00 UTC in micros
    stale = b_rows[1]
    assert stale.last_ts_us == base_us
    assert stale.ts_us == base_us + 60_000_000  # last + SLA
    assert stale.silent_us > 0
    rec = b_rows[2]
    assert rec.silent_us == 30 * 60 * 1_000_000  # silent 00:00 -> 00:30
    assert b_rows[3].last_ts_us == base_us + 30 * 60 * 1_000_000


@pytest.mark.slow
def test_site_alarm_stream_unions_transitions(spark, tmp_path):
    """q57's live dual: overlapping per-channel episodes union via the
    open-count; covered time accrues only while ANY channel is open,
    across micro-batch boundaries, and touching close/open at the same
    ts does not split coverage."""
    from pyspark.sql import functions as F

    from etsd_time_series_database_spark.streaming.stateful import (
        site_alarm_stream,
    )

    def write_transitions(path, rows, mtime):
        df = spark.createDataFrame(
            rows, "ts_us bigint, source string, channel string, "
                  "event string, value double, span_us bigint",
        )
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    src = str(tmp_path / "site_src")
    now = time.time()
    M = 1_000_000
    # batch 1: a opens at t=100, b opens at t=200 (overlap)
    write_transitions(
        os.path.join(src, "b1"),
        [(100 * M, "s", "a", "open", 300.0, None),
         (200 * M, "s", "b", "open", 310.0, None)],
        now - 100,
    )
    # batch 2: a closes at t=300 (b still open), b closes at t=400;
    # c opens at t=400 touching b's close -> coverage must not split
    write_transitions(
        os.path.join(src, "b2"),
        [(300 * M, "s", "a", "close", 10.0, 200 * M),
         (400 * M, "s", "b", "close", 20.0, 200 * M),
         (400 * M, "s", "c", "open", 400.0, None)],
        now - 50,
    )
    # batch 3: c closes at t=500
    write_transitions(
        os.path.join(src, "b3"),
        [(500 * M, "s", "c", "close", 5.0, 100 * M)],
        now - 20,
    )
    stream = (
        spark.readStream.schema(
            "ts_us bigint, source string, channel string, "
            "event string, value double, span_us bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = site_alarm_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("site_alarm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 3
    rows = sorted(
        spark.sql("select * from site_alarm").collect(),
        key=lambda r: (r.ts_us, -r.open_channels),
    )
    got = [(r.ts_us // M, r.open_channels, r.site_in_alarm, r.covered_us // M)
           for r in rows]
    # one continuous alarm interval [100, 500]: open at 100 (a), 200
    # (b), a closes 300, at 400 open-before-close keeps the union
    # unbroken (c opens, then b closes), c closes 500 -> covered 400s
    assert got == [
        (100, 1, 1, 0),
        (200, 2, 1, 100),
        (300, 1, 1, 200),
        (400, 2, 1, 300),
        (400, 1, 1, 300),
        (500, 0, 0, 400),
    ]


@pytest.mark.slow
def test_site_alarm_sorts_across_arrow_chunks(spark, tmp_path):
    """Regression (r8 review): a micro-batch delivered as MULTIPLE
    Arrow chunks must fold in global time order — per-chunk sorting
    corrupted open-count and covered time whenever unordered
    transitions spanned chunks (any catch-up replay). Forced here
    with maxRecordsPerBatch=2 and a deliberately unordered file."""
    from etsd_time_series_database_spark.streaming.stateful import (
        site_alarm_stream,
    )

    M = 1_000_000
    # one batch, written in SHUFFLED order: a[100,200], b[300,400] —
    # disjoint intervals, correct union = 200 s, never 2 channels open
    rows = [
        (400 * M, "s", "b", "close", 1.0, 100 * M),
        (100 * M, "s", "a", "open", 99.0, None),
        (300 * M, "s", "b", "open", 99.0, None),
        (200 * M, "s", "a", "close", 1.0, 100 * M),
    ]
    src = str(tmp_path / "chunked")
    spark.createDataFrame(
        rows, "ts_us bigint, source string, channel string, "
              "event string, value double, span_us bigint",
    ).coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = (
            spark.readStream.schema(
                "ts_us bigint, source string, channel string, "
                "event string, value double, span_us bigint"
            ).parquet(src)
        )
        q = (
            site_alarm_stream(stream)
            .writeStream.format("memory")
            .queryName("site_chunks")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    got = sorted(
        (r.ts_us // M, r.open_channels, r.covered_us // M)
        for r in spark.sql("select * from site_chunks").collect()
    )
    assert got == [
        (100, 1, 0), (200, 0, 100), (300, 1, 100), (400, 0, 200),
    ]


def _run_chunked_stream(spark, src_rows, schema, src, make_query, name):
    """Write one deliberately-unordered parquet batch, stream it with
    Arrow chunks forced to 2 rows, return the memory-sink rows."""
    spark.createDataFrame(src_rows, schema).coalesce(1).write.parquet(src)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            make_query(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    return spark.sql(f"select * from {name}").collect()


@pytest.mark.slow
def test_rate_stream_sorts_across_arrow_chunks(spark, tmp_path):
    """Regression (r8 verdict #1): _rate_fn sorted each Arrow chunk
    independently, so a batch spanning chunks folded readings out of
    time order — negative dt masked to None and stale last_value.
    Values are non-linear so a wrong pairing cannot coincide."""
    from etsd_time_series_database_spark.streaming.stateful import (
        counter_rate_stream,
    )

    base = "2026-01-01 00:00:"
    # true order t=10..40 with values 0,10,40,90 -> rates None,1,3,5
    rows = [
        (base + "30", "s", "a", 40.0, 0),
        (base + "10", "s", "a", 0.0, 0),
        (base + "40", "s", "a", 90.0, 0),
        (base + "20", "s", "a", 10.0, 0),
    ]
    got = _run_chunked_stream(
        spark,
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows],
        "ts string, source string, channel string, value double, status int",
        str(tmp_path / "rate_chunks"),
        lambda s: counter_rate_stream(s.withColumn("ts", F.to_timestamp("ts"))),
        "rate_chunks",
    )
    by_time = sorted((r.ts_us, r.rate_per_s) for r in got)
    assert [r for _, r in by_time] == [None, 1.0, 3.0, 5.0]


@pytest.mark.slow
def test_carry_forward_sorts_across_arrow_chunks(spark, tmp_path):
    """Regression (r8 verdict #1): _carry_forward_fn's per-chunk sort
    filled NULLs from the wrong carried value and inflated the miss
    counter when a batch spanned Arrow chunks."""
    base = "2026-01-01 00:00:"
    # true order: 5.0, NULL(fill 5), 7.0, NULL(fill 7); per-chunk fold
    # of shuffled chunks fills t=20 with 7 and double-counts misses
    rows = [
        (base + "30", "s", "a", 7.0, 0),
        (base + "10", "s", "a", 5.0, 0),
        (base + "40", "s", "a", None, 0),
        (base + "20", "s", "a", None, 0),
    ]
    got = _run_chunked_stream(
        spark,
        rows,
        "ts string, source string, channel string, value double, status int",
        str(tmp_path / "cf_chunks"),
        lambda s: carry_forward_stream(s.withColumn("ts", F.to_timestamp("ts"))),
        "cf_chunks",
    )
    by_time = sorted((r.ts_us, r.value_filled, r.n_missed) for r in got)
    assert [(f, m) for _, f, m in by_time] == [
        (5.0, 0), (5.0, 1), (7.0, 0), (7.0, 1),
    ]


@pytest.mark.slow
def test_hysteresis_sorts_across_arrow_chunks(spark, tmp_path):
    """Regression (r8 verdict #1): _make_hysteresis_fn's per-chunk sort
    could merge two episodes into one (the second open lands in an
    earlier-sorted chunk while state is already active), corrupting the
    transition stream that feeds site_alarm_stream."""
    from etsd_time_series_database_spark.streaming.stateful import (
        hysteresis_alarm_stream,
    )

    base = "2026-01-01 00:00:"
    # true order: open@10, close@20, open@30, close@40 (two episodes);
    # per-chunk fold sees [10,30] then [20,40] and drops episode two
    rows = [
        (base + "30", "s", "a", 150.0, 0),
        (base + "10", "s", "a", 150.0, 0),
        (base + "40", "s", "a", -5.0, 0),
        (base + "20", "s", "a", -5.0, 0),
    ]
    got = _run_chunked_stream(
        spark,
        rows,
        "ts string, source string, channel string, value double, status int",
        str(tmp_path / "hyst_chunks"),
        lambda s: hysteresis_alarm_stream(
            s.withColumn("ts", F.to_timestamp("ts")), hi=100.0, lo=0.0
        ),
        "hyst_chunks",
    )
    events = [(r.event, r.span_us) for r in sorted(got, key=lambda r: r.ts_us)]
    assert events == [
        ("open", None),
        ("close", 10 * 1_000_000),
        ("open", None),
        ("close", 10 * 1_000_000),
    ]


@pytest.mark.slow
def test_site_alarm_stream_equals_batch_interval_union(spark, tmp_path):
    """Operator-to-operator dual pin (r8 verdict #4): the streaming
    site-alarm fold over open/close transitions must accrue EXACTLY
    the covered time the q57 batch interval-union machinery computes
    over the same episode table — not a hand-computed expectation."""
    import random

    from etsd_time_series_database_spark.operators.range_stats import (
        _interval_union_stitched,
    )
    from etsd_time_series_database_spark.streaming.stateful import (
        site_alarm_stream,
    )

    M = 1_000_000
    rng = random.Random(42)
    episodes = []  # (channel, start_us, end_us), non-overlapping per channel
    for ch in ("a", "b", "c"):
        t = rng.randint(0, 50)
        for _ in range(15):
            start = t + rng.randint(1, 40)
            end = start + rng.randint(1, 60)
            episodes.append((ch, start * M, end * M))
            t = end
    transitions = []
    for ch, s, e in episodes:
        transitions.append((s, "s", ch, "open", 99.0, None))
        transitions.append((e, "s", ch, "close", 1.0, e - s))
    transitions.sort()  # event-time order, the documented stream contract
    # three time-ordered micro-batches
    src = str(tmp_path / "dual_src")
    now = time.time()
    cut = len(transitions) // 3
    schema = ("ts_us bigint, source string, channel string, "
              "event string, value double, span_us bigint")
    for i, chunk in enumerate(
        (transitions[:cut], transitions[cut:2 * cut], transitions[2 * cut:])
    ):
        df = spark.createDataFrame(chunk, schema)
        p = os.path.join(src, f"b{i}")
        df.coalesce(1).write.parquet(p)
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (now - 100 + i, now - 100 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        site_alarm_stream(stream)
        .writeStream.format("memory")
        .queryName("site_dual")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 3
    out = spark.sql("select * from site_dual").collect()
    stream_covered = max(r.covered_us for r in out)

    eps = spark.createDataFrame(
        [(c, s, e) for c, s, e in episodes],
        "channel string, start_us bigint, end_us bigint",
    )
    union = _interval_union_stitched(eps, "channel", bucket_s=60)
    batch_covered = union.agg(
        F.sum(F.col("i_end") - F.col("i_start"))
    ).collect()[0][0]
    assert stream_covered == batch_covered
    # the union's merged-interval count equals the stream's number of
    # closing 1->0 transitions (each merged interval closes exactly
    # once; touching open-at-close keeps the count open, so no close
    # row is emitted at a merge point)
    closings = sum(1 for r in out if r.open_channels == 0)
    assert closings == union.count() >= 1


@pytest.mark.slow
def test_freshness_stream_cadence_mode_matches_q64(spark, tmp_path):
    """Operator-to-operator dual pin (r8 verdict #4): with cadence-
    derived SLAs (overdue_factor x median gap, from cadence_slas over
    the SAME history), the channels the stream flags 'stale' are
    exactly the channels q64's freshness_report flags overdue."""
    from etsd_time_series_database_spark.operators.range_stats import (
        freshness_report,
    )
    from etsd_time_series_database_spark.streaming.stateful import (
        cadence_slas,
        freshness_stream,
    )

    rows = []  # (ts_str, channel)
    # a: every 60s through minute 40 (never silent)
    for m in range(0, 41):
        rows.append((f"2026-01-01 00:{m:02d}:00", "a"))
    # b: every 60s, stops at minute 10 (silent 30 min >> 3x60s SLA)
    for m in range(0, 11):
        rows.append((f"2026-01-01 00:{m:02d}:00", "b"))
    # c: every 30s, stops at minute 39 (silent 60s <= 3x30s SLA)
    for m in range(0, 39):
        rows.append((f"2026-01-01 00:{m:02d}:00", "c"))
        rows.append((f"2026-01-01 00:{m:02d}:30", "c"))
    rows.append(("2026-01-01 00:39:00", "c"))

    history = spark.createDataFrame(
        [(ts, ch, float(i), i) for i, (ts, ch) in enumerate(sorted(rows))],
        "ts string, event_type string, value double, event_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    rep = {
        r["event_type"]: r["overdue"]
        for r in freshness_report(history, overdue_factor=3.0).collect()
    }
    assert rep == {"a": False, "b": True, "c": False}
    slas = cadence_slas(history, overdue_factor=3.0)
    assert slas["a"] == 180.0 and slas["c"] == 90.0

    # stream the same rows, four time-ordered files
    src = str(tmp_path / "cad_src")
    now = time.time()
    ordered = sorted(rows)
    cuts = [len(ordered) * i // 4 for i in range(5)]
    for i in range(4):
        _write_batch(
            spark,
            os.path.join(src, f"b{i}"),
            [(ts, ch, 1.0) for ts, ch in ordered[cuts[i]:cuts[i + 1]]],
            now - 100 + i,
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        freshness_stream(stream, slas, watermark_delay="0 seconds")
        .writeStream.format("memory")
        .queryName("cad_fresh")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from cad_fresh").collect()
    stale_channels = {r.channel for r in out if r.status == "stale"}
    overdue_channels = {ch for ch, o in rep.items() if o}
    assert stale_channels == overdue_channels == {"b"}
    assert {r.channel for r in out if r.status == "first_seen"} == {
        "a", "b", "c",
    }


@pytest.mark.slow
def test_carry_forward_miss_reset_at_256(spark, tmp_path):
    """The >=256-miss reset (reference code/etsdSave.c:451-454): after
    255 carried fills the carried value is DROPPED — fill #256 onward
    is NULL and the miss counter restarts — exactly the arithmetic the
    s01 oracle encodes (filled = base while pos <= 255, n_missed =
    pos % 256). sf data never has runs that long, so this pins the
    reset on synthetic data."""
    from etsd_time_series_database_spark.streaming.stateful import (
        MISS_RESET,
    )

    n_nulls = 300
    rows = [("2026-01-01 00:00:00", "a", 42.0)] + [
        (f"2026-01-01 {1 + i // 3600:02d}:{(i // 60) % 60:02d}:{i % 60:02d}",
         "a", None)
        for i in range(n_nulls)
    ]
    src = str(tmp_path / "reset_src")
    _write_batch(spark, os.path.join(src, "b1"), rows, time.time() - 50)
    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(f"{src}/*")
    )
    q = (
        carry_forward_stream(stream)
        .writeStream.format("memory")
        .queryName("cf_reset")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = sorted(
        spark.sql("select * from cf_reset").collect(),
        key=lambda r: r.ts_us,
    )
    assert len(out) == n_nulls + 1
    assert (out[0].value_filled, out[0].n_missed) == (42.0, 0)
    for p in range(1, n_nulls + 1):
        r = out[p]
        want_fill = 42.0 if p <= MISS_RESET - 1 else None
        assert r.value_filled == want_fill, (p, r.value_filled)
        assert r.n_missed == p % MISS_RESET, (p, r.n_missed)


@pytest.mark.slow
def test_carry_forward_seq_tiebreak_on_equal_timestamps(spark, tmp_path):
    """Equal timestamps fold in seq order when the source provides a
    seq column (registry determinism contract: ties broken by unique
    columns). Two same-(channel, ts) rows — NULL first by seq — must
    fill from the PREVIOUS value, then the non-null row resets;
    nothing in sf data pins this (it has no ts ties), so pin it here."""
    rows = [
        ("2026-01-01 00:00:00", "a", 10.0, 1),
        ("2026-01-01 00:00:10", "a", None, 2),   # tie, seq 2: fill 10
        ("2026-01-01 00:00:10", "a", 30.0, 3),   # tie, seq 3: reset
        ("2026-01-01 00:00:20", "a", None, 4),   # fills 30, not 10
    ]
    df = spark.createDataFrame(
        rows,
        "ts string, channel string, value double, seq long",
    ).selectExpr(
        "to_timestamp(ts) AS ts", "'s' AS source", "channel",
        "value", "0 AS status", "seq",
    )
    src = str(tmp_path / "tie_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, source string, channel string, value double, "
        "status int, seq long"
    ).parquet(src)
    q = (
        carry_forward_stream(stream)
        .writeStream.format("memory")
        .queryName("cf_ties")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r.ts_us, r.value, r.value_filled, r.n_missed)
        for r in sorted(
            spark.sql("select * from cf_ties").collect(),
            key=lambda r: (r.ts_us, r.value is not None),
        )
    ]
    base = 1767225600000000
    assert got == [
        (base, 10.0, 10.0, 0),
        (base + 10_000_000, None, 10.0, 1),
        (base + 10_000_000, 30.0, 30.0, 0),
        (base + 20_000_000, None, 30.0, 1),
    ]


@pytest.mark.slow
def test_running_zscore_flags_only_past_3_sigma(spark, tmp_path):
    """s12 semantics: after a 30-reading warm-up (15x9, 15x11 -> mean
    10, std ~1.017), a reading at 20 flags (~9.8 sigma), 13 does not
    (~2.95 sigma), and nothing inside the warm-up flags. The exact
    integer inequality decides the boundary — the same arithmetic the
    DuckDB oracle runs."""
    from etsd_time_series_database_spark.streaming.stateful import (
        running_zscore_stream,
    )

    rows = []
    for i in range(30):
        rows.append(
            (f"2026-01-01 00:{i:02d}:00", "s", "a",
             9.0 if i % 2 == 0 else 11.0, 0)
        )
    rows.append(("2026-01-01 00:30:00", "s", "a", 20.0, 0))  # ~9.8 sigma
    rows.append(("2026-01-01 00:31:00", "s", "a", 13.0, 0))  # ~2.95 sigma
    src = str(tmp_path / "z")
    spark.createDataFrame(
        rows,
        "ts string, source string, channel string, value double, status int",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "ts string, source string, channel string, value double, status int"
    ).parquet(src)
    q = (
        running_zscore_stream(
            stream.withColumn("ts", F.to_timestamp("ts"))
        )
        .writeStream.format("memory")
        .queryName("z_flags")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.sql("select * from z_flags").collect()
    assert len(got) == 1
    assert (got[0].value, got[0].n_prev) == (20.0, 30)


@pytest.mark.slow
def test_running_zscore_sorts_across_arrow_chunks(spark, tmp_path):
    """Chunk-ordering regression for the new fold: prefix statistics
    are order-dependent, so folding shuffled Arrow chunks out of time
    order flags the wrong rows. True order 10,10,10,100 with min_n=2
    must flag exactly the trailing 100."""
    from etsd_time_series_database_spark.streaming.stateful import (
        running_zscore_stream,
    )

    base = "2026-01-01 00:00:"
    rows = [
        (base + "40", "s", "a", 100.0, 0),
        (base + "10", "s", "a", 10.0, 0),
        (base + "30", "s", "a", 10.0, 0),
        (base + "20", "s", "a", 10.0, 0),
    ]
    got = _run_chunked_stream(
        spark,
        rows,
        "ts string, source string, channel string, value double, status int",
        str(tmp_path / "z_chunks"),
        lambda s: running_zscore_stream(
            s.withColumn("ts", F.to_timestamp("ts")), min_n=2
        ),
        "z_chunks",
    )
    assert [(r.value, r.n_prev) for r in got] == [(100.0, 3)]


@pytest.mark.slow
def test_running_zscore_state_carries_across_batches(spark, tmp_path):
    """The warm-up accumulated in micro-batch 1 must judge the outlier
    arriving in micro-batch 2 (integer prefix state persists in the
    state store across batches)."""
    from etsd_time_series_database_spark.streaming.stateful import (
        running_zscore_stream,
    )

    schema = (
        "ts string, source string, channel string, value double, "
        "status int"
    )
    src = tmp_path / "z_batches"
    src.mkdir()
    warm = [
        (f"2026-01-01 00:{i:02d}:00", "s", "a",
         9.0 if i % 2 == 0 else 11.0, 0)
        for i in range(30)
    ]
    spark.createDataFrame(warm, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame(
        [("2026-01-01 00:30:00", "s", "a", 20.0, 0)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        running_zscore_stream(
            stream.withColumn("ts", F.to_timestamp("ts"))
        )
        .writeStream.format("memory")
        .queryName("z_batches")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.sql("select * from z_batches").collect()
    assert [(r.value, r.n_prev) for r in got] == [(20.0, 30)]


@pytest.mark.slow
def test_running_zscore_skips_nonfinite_readings(spark, tmp_path):
    """Regression (review): math.floor(inf) raises OverflowError —
    an infinite reading from a faulty feed must be SKIPPED (like
    NULL), not kill the monitor query."""
    from etsd_time_series_database_spark.streaming.stateful import (
        running_zscore_stream,
    )

    rows = [
        ("2026-01-01 00:00:00", "s", "a", 10.0, 0),
        ("2026-01-01 00:01:00", "s", "a", 10.0, 0),
        ("2026-01-01 00:02:00", "s", "a", float("inf"), 0),
        ("2026-01-01 00:03:00", "s", "a", float("-inf"), 0),
        ("2026-01-01 00:04:00", "s", "a", 10.0, 0),
        ("2026-01-01 00:05:00", "s", "a", 99.0, 0),
    ]
    src = str(tmp_path / "z_inf")
    spark.createDataFrame(
        rows,
        "ts string, source string, channel string, value double, status int",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "ts string, source string, channel string, value double, status int"
    ).parquet(src)
    q = (
        running_zscore_stream(
            stream.withColumn("ts", F.to_timestamp("ts")), min_n=3
        )
        .writeStream.format("memory")
        .queryName("z_inf")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = spark.sql("select * from z_inf").collect()
    # the infs are invisible: stats are the three 10.0 readings
    # (variance 0), so only the 99.0 deviates
    assert [(r.value, r.n_prev) for r in got] == [(99.0, 3)]


@pytest.mark.slow
def test_running_zscore_batch_equals_stream(spark, tmp_path):
    """Operator-to-operator dual pin: the q71 JVM-window batch form
    and the s12 Python-fold stream must emit IDENTICAL rows on the
    same data — including non-finite readings, which both sides null
    out of stats and flags."""
    from etsd_time_series_database_spark.operators.trends import (
        running_zscore_batch,
    )
    from etsd_time_series_database_spark.streaming.stateful import (
        running_zscore_stream,
    )

    rows = []
    for i in range(40):
        v = [9.0, 11.0, 10.0, 12.0][i % 4]
        if i == 17:
            v = float("inf")
        rows.append((i, "a", f"2026-01-01 00:{i:02d}:00", v))
        rows.append((i + 100, "b", f"2026-01-01 00:{i:02d}:30", v * 3))
    rows.append((200, "a", "2026-01-01 00:40:00", 77.0))
    rows.append((201, "b", "2026-01-01 00:40:30", 500.0))
    schema = "event_id long, event_type string, ts string, value double"
    batch_df = (
        spark.createDataFrame(rows, schema)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    want = sorted(
        map(tuple, running_zscore_batch(batch_df, min_n=10).collect())
    )

    src = str(tmp_path / "dual")
    batch_df.select(
        "ts",
        F.lit("events").alias("source"),
        F.col("event_type").alias("channel"),
        "value",
        F.lit(0).alias("status"),
        F.col("event_id").alias("seq"),
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, source string, channel string, value double, "
        "status int, seq long"
    ).parquet(src)
    q = (
        running_zscore_stream(stream, min_n=10)
        .writeStream.format("memory")
        .queryName("z_dual")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql(
            "select ts_us, source, channel, value, n_prev from z_dual"
        ).collect())
    )
    assert got == want
    assert len(got) >= 2  # the planted outliers actually flagged
