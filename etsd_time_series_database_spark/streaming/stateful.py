"""Custom stateful streaming operators (SURVEY.md §2.2 streaming set,
§7 M7): the reference's per-channel LastReading/MissedUpdate arrays
(reference code/etsd.h:114-121, maintained code/etsdSave.c:396-458)
as real Structured-Streaming state via ``applyInPandasWithState``.

Per (source, channel) group the state is ``(last_ts_us, last_value,
n_missed)``; each micro-batch's rows are sorted by event time, NULL
readings are filled with the carried value (the reference's
averaged-delta backfill degenerates to carry-forward when raw readings
are stored, code/etsdSave.c:445-447), and the miss counter mirrors the
reference's >=256-miss reset (code/etsdSave.c:451-454).

State is keyed by (source, channel): Spark shards it across executors
by key hash. For few huge channels, the carry chain is inherently
sequential per channel — the state row is O(1) and the per-batch work
is a vectorized pandas fill, so a single key's throughput is bounded
by arrival rate, not history size.

The deterministic, replayable alternative for batch-incremental jobs
is streaming.ingest.carry_forward_batch (state in a table).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MISS_RESET = 256  # reference: >=256 consecutive misses reset the counter

OUTPUT_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("source", StringType()),
        StructField("channel", StringType()),
        StructField("value", DoubleType()),
        StructField("value_filled", DoubleType()),
        StructField("n_missed", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_value", DoubleType()),
        StructField("n_missed", IntegerType()),
    ]
)


def _concat_batch(
    pdfs: Iterable[pd.DataFrame], sort_cols: list[str] | None = None
) -> pd.DataFrame:
    """A micro-batch arrives as MULTIPLE Arrow chunks; sorting each
    chunk independently folds rows out of time order whenever a batch
    spans chunks (any catch-up replay) — concat the whole batch, sort
    ONCE, fold once. Same pattern as _site_alarm_fn below.

    When the input carries a ``__seq`` tie-break column (the stream
    builders forward an optional ``seq`` column from the source),
    equal timestamps fold in (ts_us, __seq) order — the registry's
    determinism contract ("ties broken by unique columns"). Without
    it, equal-timestamp order is unspecified (sort_values is not a
    stable sort)."""
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return pd.DataFrame()
    pdf = pd.concat(chunks, ignore_index=True)
    if not len(pdf):
        return pdf
    if sort_cols is None:
        sort_cols = (
            ["ts_us", "__seq"] if "__seq" in pdf.columns else ["ts_us"]
        )
    return pdf.sort_values(sort_cols)


def _carry_forward_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    last_ts, last_value, n_missed = (
        state.get if state.exists else (None, None, 0)
    )
    source, channel = key
    pdf = _concat_batch(pdfs)
    if len(pdf):
        filled = []
        missed = []
        for v in pdf["value"]:
            if pd.isna(v):
                n_missed += 1
                if n_missed >= MISS_RESET:
                    # reference reset path: drop the carried reading
                    last_value, n_missed = None, 0
                filled.append(last_value)
            else:
                last_value, n_missed = float(v), 0
                filled.append(last_value)
            missed.append(n_missed)
        last_ts = int(pdf["ts_us"].iloc[-1])
        yield pd.DataFrame(
            {
                "ts_us": pdf["ts_us"],
                "source": source,
                "channel": channel,
                "value": pdf["value"],
                "value_filled": pd.array(filled, dtype="float64"),
                "n_missed": pd.array(missed, dtype="int32"),
            }
        )
    state.update((last_ts, last_value, n_missed))


RATE_OUTPUT_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("source", StringType()),
        StructField("channel", StringType()),
        StructField("value", DoubleType()),
        StructField("rate_per_s", DoubleType()),
    ]
)

RATE_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_value", DoubleType()),
    ]
)


def _rate_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    last_ts, last_value = state.get if state.exists else (None, None)
    source, channel = key
    pdf = _concat_batch(pdfs)
    if len(pdf):
        rates = []
        for ts_us, v in zip(pdf["ts_us"], pdf["value"]):
            if pd.isna(v) or last_value is None or last_ts is None:
                rates.append(None)
            else:
                dt = (int(ts_us) - last_ts) / 1_000_000.0
                rates.append((float(v) - last_value) / dt if dt > 0 else None)
            if not pd.isna(v):
                last_ts, last_value = int(ts_us), float(v)
        yield pd.DataFrame(
            {
                "ts_us": pdf["ts_us"],
                "source": source,
                "channel": channel,
                "value": pdf["value"],
                "rate_per_s": pd.array(rates, dtype="float64"),
            }
        )
    state.update((last_ts, last_value))


def _row_cols(stream: DataFrame) -> list:
    """Canonical stateful-fold input columns; an optional ``seq``
    source column rides along as the ``__seq`` equal-timestamp
    tie-break (see _concat_batch)."""
    from pyspark.sql import functions as F

    cols = [
        F.unix_micros("ts").alias("ts_us"), F.col("source"),
        F.col("channel"), F.col("value"),
    ]
    if "seq" in stream.columns:
        cols.append(F.col("seq").alias("__seq"))
    return cols


def counter_rate_stream(stream: DataFrame) -> DataFrame:
    """Streaming counter -> rate: the ingest-side delta computation of
    the reference (code/etsdSave.c:396-398) as stateful streaming —
    each reading emits (value - last)/(dt) against the per-channel
    persisted last reading; the batch equivalent is operators.rate."""
    from pyspark.sql import functions as F

    rows = stream.select(*_row_cols(stream))
    return rows.groupBy("source", "channel").applyInPandasWithState(
        _rate_fn,
        outputStructType=RATE_OUTPUT_SCHEMA,
        stateStructType=RATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def carry_forward_stream(stream: DataFrame) -> DataFrame:
    """Streaming carry-forward over the canonical row schema
    ``(ts, source, channel, value, status)``; emits each row with its
    filled value and the running miss counter. Works on any streaming
    DataFrame; grouping key is (source, channel)."""
    from pyspark.sql import functions as F

    rows = stream.select(*_row_cols(stream))
    return rows.groupBy("source", "channel").applyInPandasWithState(
        _carry_forward_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ALARM_OUTPUT_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("source", StringType()),
        StructField("channel", StringType()),
        StructField("event", StringType()),
        StructField("value", DoubleType()),
        StructField("span_us", LongType()),
    ]
)

ALARM_STATE_SCHEMA = StructType(
    [
        StructField("active", IntegerType()),
        StructField("opened_ts_us", LongType()),
    ]
)


def _make_hysteresis_fn(hi: float, lo: float):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        active, opened = state.get if state.exists else (0, None)
        source, channel = key
        pdf = _concat_batch(pdfs)
        out = {k: [] for k in ("ts_us", "event", "value", "span_us")}
        if len(pdf):
            for ts_us, v in zip(pdf["ts_us"], pdf["value"]):
                if pd.isna(v):
                    continue
                v = float(v)
                if v >= hi and not active:
                    active, opened = 1, int(ts_us)
                    out["ts_us"].append(int(ts_us))
                    out["event"].append("open")
                    out["value"].append(v)
                    out["span_us"].append(None)
                elif v <= lo and active:
                    out["ts_us"].append(int(ts_us))
                    out["event"].append("close")
                    out["value"].append(v)
                    out["span_us"].append(int(ts_us) - opened)
                    active, opened = 0, None
        yield pd.DataFrame(
            {
                "ts_us": pd.array(out["ts_us"], dtype="int64"),
                "source": source,
                "channel": channel,
                "event": out["event"],
                "value": pd.array(out["value"], dtype="float64"),
                "span_us": pd.array(out["span_us"], dtype="Int64"),
            }
        )
        state.update((active, opened))

    return fn


def hysteresis_alarm_stream(
    stream: DataFrame, hi: float, lo: float
) -> DataFrame:
    """Streaming two-threshold alarm: emits an ``open`` event when a
    channel's value crosses ``hi`` while inactive and a ``close``
    event (with the episode span) when it falls to ``lo`` or below —
    in-band samples emit nothing and state carries, so the alert
    stream cannot chatter. The batch equivalent over the historical
    store is operators.range_stats.hysteresis_episodes (q62); this is
    its live-alerting dual: state is two scalars per (source,
    channel), outputs only on transitions (a tiny fraction of input),
    and an episode spanning any number of micro-batches closes with
    the exact span because ``opened_ts_us`` persists in group state.
    """
    from pyspark.sql import functions as F

    rows = stream.select(*_row_cols(stream))
    return rows.groupBy("source", "channel").applyInPandasWithState(
        _make_hysteresis_fn(hi, lo),
        outputStructType=ALARM_OUTPUT_SCHEMA,
        stateStructType=ALARM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FRESH_OUTPUT_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("source", StringType()),
        StructField("channel", StringType()),
        StructField("status", StringType()),
        StructField("last_ts_us", LongType()),
        StructField("silent_us", LongType()),
    ]
)

FRESH_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("is_stale", IntegerType()),
    ]
)


def cadence_slas(
    history: DataFrame,
    overdue_factor: float = 3.0,
    channel: str = "event_type",
    ts: str = "ts",
    seq: str = "event_id",
) -> dict:
    """Derive per-channel staleness SLAs from HISTORY: each feed's SLA
    is ``overdue_factor`` x its median inter-sample gap — exactly the
    q64 batch freshness_report judgment, packaged for the live
    monitor (pass the dict as :func:`freshness_stream`'s
    ``stale_after_s``). The collect is one row per channel — a
    driver-side KB, not a data path."""
    from etsd_time_series_database_spark.operators.range_stats import (
        freshness_report,
    )

    rep = freshness_report(
        history,
        channel=channel,
        ts=ts,
        seq=seq,
        overdue_factor=overdue_factor,
    )
    return {
        r[channel]: r["median_gap_us"] * overdue_factor / 1e6
        for r in rep.collect()
        if r["median_gap_us"] is not None
    }


def _make_freshness_fn(stale_after_s, default_stale_after_s=None):
    from collections.abc import Mapping

    def _sla_ms(source, channel):
        if isinstance(stale_after_s, Mapping):
            v = stale_after_s.get(
                (source, channel),
                stale_after_s.get(channel, default_stale_after_s),
            )
            return None if v is None else int(float(v) * 1000)
        return int(float(stale_after_s) * 1000)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        source, channel = key
        stale_after_ms = _sla_ms(source, channel)
        if state.hasTimedOut:
            last, _ = state.get
            wm_us = state.getCurrentWatermarkMs() * 1000
            yield pd.DataFrame(
                {
                    "ts_us": pd.array([last + stale_after_ms * 1000],
                                      dtype="int64"),
                    "source": source,
                    "channel": channel,
                    "status": ["stale"],
                    "last_ts_us": pd.array([last], dtype="int64"),
                    "silent_us": pd.array([max(0, wm_us - last)],
                                          dtype="int64"),
                }
            )
            # emit once; no re-arm — the next arrival recovers the feed
            state.update((last, 1))
            return
        out = {k: [] for k in
               ("ts_us", "status", "last_ts_us", "silent_us")}
        prev_last, was_stale = (
            state.get if state.exists else (None, 0)
        )
        # concat the batch's Arrow chunks before taking min/max: a
        # key whose batch spans chunks could otherwise report a
        # first_seen/recovered timestamp from whichever chunk came
        # first, not the batch's true earliest sample
        parts = [pdf["ts_us"].dropna() for pdf in pdfs]
        parts = [p for p in parts if not p.empty]
        if parts:
            ts = pd.concat(parts, ignore_index=True)
            first, last = int(ts.min()), int(ts.max())
            if prev_last is None:
                out["ts_us"].append(first)
                out["status"].append("first_seen")
                out["last_ts_us"].append(first)
                out["silent_us"].append(0)
            elif was_stale:
                out["ts_us"].append(first)
                out["status"].append("recovered")
                out["last_ts_us"].append(prev_last)
                out["silent_us"].append(max(0, first - prev_last))
            prev_last = last if prev_last is None else max(prev_last, last)
            was_stale = 0
        if prev_last is not None:
            state.update((prev_last, was_stale))
            # a late batch can put last+SLA behind the watermark, and
            # Spark rejects a timeout at/before it — clamp forward so
            # the (already overdue) timeout fires at the next batch.
            # A key with no SLA (mapping mode, no entry, no default)
            # never times out — it is monitored for first_seen only.
            if stale_after_ms is not None:
                wm_ms = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max(prev_last // 1000 + stale_after_ms, wm_ms + 1)
                )
        yield pd.DataFrame(
            {
                "ts_us": pd.array(out["ts_us"], dtype="int64"),
                "source": source,
                "channel": channel,
                "status": out["status"],
                "last_ts_us": pd.array(out["last_ts_us"], dtype="int64"),
                "silent_us": pd.array(out["silent_us"], dtype="int64"),
            }
        )

    return fn


def freshness_stream(
    stream: DataFrame,
    stale_after_s,
    watermark_delay: str = "10 seconds",
    default_stale_after_s: float | None = None,
) -> DataFrame:
    """Live feed-freshness monitor: which (source, channel) feeds have
    gone SILENT — the streaming dual of the q64 batch freshness report.

    ``stale_after_s`` is either one operational SLA in seconds for
    every feed, or a mapping (``{channel: seconds}`` or ``{(source,
    channel): seconds}``; unmapped keys fall back to
    ``default_stale_after_s``, or never time out when that is None).
    The cadence-derived mode — :func:`cadence_slas` over history —
    makes this judge staleness exactly the way q64 does: a feed is
    stale when silent for ``overdue_factor`` x its own median
    inter-sample gap.

    Emits a row only on STATE CHANGES, never per sample: ``first_seen``
    when a key appears, ``stale`` when the event-time watermark passes
    ``last_ts + stale_after_s`` with no new data (fired by a group
    timeout — no poller, no per-key scan), and ``recovered`` (with the
    silence span) when a stale feed speaks again. The reference
    forwards live per-interval data to an external monitor
    (code/edd.c:333-346); this is the Spark-native equivalent of the
    "is anything down" half of that view.

    State is two scalars per key, sharded by key hash; output volume
    is proportional to feed outages, not traffic. Uses event-time
    timeouts, so silence is judged by the data's own clock (replays
    behave identically), not wall-clock.
    """
    from pyspark.sql import functions as F

    rows = stream.withWatermark("ts", watermark_delay).select(
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"),
        "source",
        "channel",
    )
    return rows.groupBy("source", "channel").applyInPandasWithState(
        _make_freshness_fn(stale_after_s, default_stale_after_s),
        outputStructType=FRESH_OUTPUT_SCHEMA,
        stateStructType=FRESH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


SITE_OUTPUT_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("open_channels", IntegerType()),
        StructField("site_in_alarm", IntegerType()),
        StructField("covered_us", LongType()),
    ]
)

SITE_STATE_SCHEMA = StructType(
    [
        StructField("open_count", IntegerType()),
        StructField("since_us", LongType()),
        StructField("covered_us", LongType()),
    ]
)


def _site_alarm_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    count, since, covered = state.get if state.exists else (0, None, 0)
    # a micro-batch arrives as MULTIPLE Arrow chunks; sorting each
    # chunk independently would fold transitions out of time order
    # whenever a batch spans chunks (any catch-up replay) — concat
    # the whole batch, sort ONCE, fold once
    chunks = [pdf for pdf in pdfs if len(pdf)]
    pdf = (
        pd.concat(chunks, ignore_index=True)
        if chunks
        else pd.DataFrame({"ts_us": [], "event": []})
    )
    # opens before closes at equal ts: touching intervals merge
    # (the q57 touch-merge rule), so coverage never splits on a
    # zero-length gap
    pdf = pdf.sort_values(["ts_us", "event"], ascending=[True, False])
    out = {k: [] for k in
           ("ts_us", "open_channels", "site_in_alarm", "covered_us")}
    # Ordering is guaranteed WITHIN a micro-batch (the sort above), not
    # across batches: a transition arriving in a later batch with an
    # earlier event time folds late. Accruals are clamped at 0 so a
    # late close can never drive covered_us backwards; the exact batch
    # reconciliation for replayed history is q57 alarm_coverage.
    for ts_us, ev in zip(pdf["ts_us"], pdf["event"]):
        ts_us = int(ts_us)
        if ev == "open":
            count += 1
            if count == 1:
                since = ts_us
        elif ev == "close" and count > 0:
            count -= 1
            if count == 0:
                covered += max(0, ts_us - since)
                since = None
        running = covered + (
            max(0, ts_us - since) if since is not None else 0
        )
        out["ts_us"].append(ts_us)
        out["open_channels"].append(count)
        out["site_in_alarm"].append(1 if count > 0 else 0)
        out["covered_us"].append(running)
    yield pd.DataFrame(
        {
            "ts_us": pd.array(out["ts_us"], dtype="int64"),
            "open_channels": pd.array(out["open_channels"],
                                      dtype="int32"),
            "site_in_alarm": pd.array(out["site_in_alarm"],
                                      dtype="int32"),
            "covered_us": pd.array(out["covered_us"], dtype="int64"),
        }
    )
    state.update((count, since, covered))


def site_alarm_stream(transitions: DataFrame) -> DataFrame:
    """Live fleet-level alarm coverage: the streaming dual of the q57
    batch interval union ("is the site in alarm NOW, and how much
    wall-clock has been covered so far"). Consumes the open/close
    TRANSITION stream that :func:`hysteresis_alarm_stream` emits —
    the standard two-query topology (transitions persist to a sink
    between queries; Structured Streaming does not allow two chained
    applyInPandasWithState operators in one query) and exactly the
    reference's shape of forwarding interval events to a monitor
    process (code/edd.c:333-346, code/plugins/edoRRD.c:44-74).

    A running count of currently-open channels (+1 per open, -1 per
    close) IS the interval union: the site is in alarm while the count
    is positive, and covered time accrues from each 0->1 crossing to
    the matching 1->0. Single-group state (three scalars) is safe
    BECAUSE the input is transitions, not samples — hysteresis already
    reduced volume to state changes, so one group sees alarms, not
    traffic. Emits one row per transition with the running union view.
    """
    from pyspark.sql import functions as F

    rows = transitions.select(
        "ts_us", "event", F.lit(1).alias("__site")
    )
    return rows.groupBy("__site").applyInPandasWithState(
        _site_alarm_fn,
        outputStructType=SITE_OUTPUT_SCHEMA,
        stateStructType=SITE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ZSCORE_OUTPUT_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("source", StringType()),
        StructField("channel", StringType()),
        StructField("value", DoubleType()),
        StructField("n_prev", LongType()),
    ]
)

ZSCORE_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s1", LongType()),
        StructField("s2", LongType()),
    ]
)


def _make_running_z_fn(z: int, min_n: int, quant: int):
    import math

    z2 = z * z

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, s1, s2 = state.get if state.exists else (0, 0, 0)
        # Python ints: the comparison below is EXACT big-int
        # arithmetic — (q*n - s1)^2 overflows int64 but never a
        # Python int (the oracle side uses HUGEINT for the same
        # products)
        n, s1, s2 = int(n), int(s1), int(s2)
        source, channel = key
        pdf = _concat_batch(pdfs)
        out = {k: [] for k in ("ts_us", "value", "n_prev")}
        if len(pdf):
            for ts_us, v in zip(pdf["ts_us"], pdf["value"]):
                # NULL and non-finite readings join neither stats nor
                # flags (math.floor(inf) would raise and kill the
                # query; a live feed CAN deliver inf — sensor faults,
                # upstream divide-by-zero)
                if pd.isna(v) or not math.isfinite(float(v)):
                    continue
                q = math.floor(float(v) * quant)
                if n >= min_n:
                    d = q * n - s1
                    if d * d * (n - 1) > z2 * n * (n * s2 - s1 * s1):
                        out["ts_us"].append(int(ts_us))
                        out["value"].append(float(v))
                        out["n_prev"].append(n)
                n += 1
                s1 += q
                s2 += q * q
        yield pd.DataFrame(
            {
                "ts_us": pd.array(out["ts_us"], dtype="int64"),
                "source": source,
                "channel": channel,
                "value": pd.array(out["value"], dtype="float64"),
                "n_prev": pd.array(out["n_prev"], dtype="int64"),
            }
        )
        state.update((n, s1, s2))

    return fn


def running_zscore_stream(
    stream: DataFrame, z: int = 3, min_n: int = 30, quant: int = 1000
) -> DataFrame:
    """Live anomaly monitor: flag each reading more than ``z`` standard
    deviations from its channel's RUNNING (strictly preceding) mean —
    the causal dual of the batch z-score scan (q37), which judges
    every point against full-history stats a live monitor cannot see.
    The reference streams per-interval values to its monitor daemon
    (code/edd.c:333-346); this is the "is this reading wild" judgment
    on that feed.

    Bit-exact across engines by construction: readings quantize to
    integer ``1/quant`` units (``floor(value * quant)`` — floor of a
    double product, identical on any IEEE engine), state is the
    integer prefix (count, sum, sum-of-squares) per (source, channel),
    and the z-test is the cross-multiplied ALL-INTEGER comparison

        (q*n - s1)^2 * (n-1)  >  z^2 * n * (n*s2 - s1^2)

    — no division, no sqrt, no float accumulation, so the DuckDB
    oracle (HUGEINT arithmetic) matches hash-exactly (Python ints
    never overflow engine-side). Warm-up: a channel flags nothing
    until ``min_n`` prior readings exist. NULL readings join neither
    the statistics nor the flags.

    State is three 64-bit scalars per key, sharded by key hash;
    output volume is proportional to anomalies, not traffic. The
    int64 state bounds the supported volume: |value| * quant < ~1e15
    and n * (value * quant)^2 < 2^63 — at quant=1000 and |value| <=
    1e6 that is ~9e6 readings per channel; production deployments
    with bigger channels should widen the accumulators to
    DecimalType(38,0) (same fold, wider state schema).
    """
    from pyspark.sql import functions as F

    # same domain rule as the q71/q72 batch twins: rows with no
    # channel or no timestamp are out of scope (engines disagree on
    # NULL-key ordering/grouping, so the family excludes them)
    rows = stream.select(*_row_cols(stream)).filter(
        F.col("channel").isNotNull() & F.col("ts_us").isNotNull()
    )
    return rows.groupBy("source", "channel").applyInPandasWithState(
        _make_running_z_fn(z, min_n, quant),
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
