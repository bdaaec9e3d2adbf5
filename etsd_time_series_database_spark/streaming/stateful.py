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


def _carry_forward_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    last_ts, last_value, n_missed = (
        state.get if state.exists else (None, None, 0)
    )
    source, channel = key
    for pdf in pdfs:
        pdf = pdf.sort_values("ts_us")
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
        if len(pdf):
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
    for pdf in pdfs:
        pdf = pdf.sort_values("ts_us")
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


def counter_rate_stream(stream: DataFrame) -> DataFrame:
    """Streaming counter -> rate: the ingest-side delta computation of
    the reference (code/etsdSave.c:396-398) as stateful streaming —
    each reading emits (value - last)/(dt) against the per-channel
    persisted last reading; the batch equivalent is operators.rate."""
    from pyspark.sql import functions as F

    rows = stream.select(
        F.unix_micros("ts").alias("ts_us"), "source", "channel", "value"
    )
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

    rows = stream.select(
        F.unix_micros("ts").alias("ts_us"), "source", "channel", "value"
    )
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
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_us")
            out = {k: [] for k in ("ts_us", "event", "value", "span_us")}
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

    rows = stream.select(
        F.unix_micros("ts").alias("ts_us"), "source", "channel", "value"
    )
    return rows.groupBy("source", "channel").applyInPandasWithState(
        _make_hysteresis_fn(hi, lo),
        outputStructType=ALARM_OUTPUT_SCHEMA,
        stateStructType=ALARM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
