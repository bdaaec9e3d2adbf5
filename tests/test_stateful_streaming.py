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
