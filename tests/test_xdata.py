"""xData side-table round-trip (reference per-block opaque blob,
code/etsd.h:102-103 / code/etsdSave.c:138-140): blobs committed by the
ingest foreachBatch come back byte-identical and join to the readings
of the same micro-batch."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from etsd_time_series_database_spark.streaming import ingest

SCHEMA = ingest.CANONICAL_SCHEMA


def _rows_df(spark, rows):
    return spark.createDataFrame(
        [(t, "s", c, v, 0) for (t, c, v) in rows], SCHEMA.replace("timestamp", "string", 1)
    ).withColumn("ts", F.to_timestamp("ts"))


def _xdata_fn(batch, epoch_id):
    # a deterministic, engine-opaque blob per source: the plugin's view
    # of the batch (here: digest of the channel set + max ts)
    return (
        batch.groupBy("source")
        .agg(
            F.max("ts").alias("batch_ts"),
            F.to_binary(
                F.sha2(F.concat_ws(",", F.sort_array(F.collect_set("channel"))), 256),
                F.lit("hex"),
            ).alias("payload"),
        )
        .select("batch_ts", "source", "payload")
    )


def test_xdata_roundtrip_byte_identical(spark, tmp_path):
    raw = str(tmp_path / "raw")
    xd = str(tmp_path / "xd")
    b = _rows_df(
        spark,
        [
            ("2026-01-01 00:00:05", "a", 1.0),
            ("2026-01-01 00:00:06", "b", 2.0),
        ],
    )
    want = {
        (r.source,): bytes(r.payload) for r in _xdata_fn(b, 0).collect()
    }
    ingest.write_ingest_epoch(b, 0, raw)
    ingest.write_xdata_epoch(_xdata_fn(b, 0), 0, xd)

    got = {(r.source,): bytes(r.payload) for r in ingest.read_xdata(spark, xd).collect()}
    assert got == want and all(len(v) == 32 for v in got.values())

    # retry of the same epoch: no duplicate blob rows
    ingest.write_xdata_epoch(_xdata_fn(b, 0), 0, xd)
    assert ingest.read_xdata(spark, xd).count() == 1


def test_xdata_joins_to_events_of_same_epoch(spark, tmp_path):
    raw = str(tmp_path / "raw")
    xd = str(tmp_path / "xd")
    b0 = _rows_df(spark, [("2026-01-01 00:00:05", "a", 1.0)])
    b1 = _rows_df(spark, [("2026-01-01 00:00:06", "a", 9.0)])
    for i, b in enumerate([b0, b1]):
        ingest.write_ingest_epoch(b, i, raw)
        ingest.write_xdata_epoch(_xdata_fn(b, i), i, xd)

    joined = ingest.events_with_xdata(spark, raw, xd)
    rows = {r.value: (r.epoch, bytes(r.payload)) for r in joined.collect()}
    assert set(rows) == {1.0, 9.0}
    assert rows[1.0][0] == 0 and rows[9.0][0] == 1
    # each reading carries ITS batch's blob
    assert rows[1.0][1] == bytes(
        _xdata_fn(b0, 0).collect()[0].payload
    )
    assert rows[9.0][1] == bytes(_xdata_fn(b1, 1).collect()[0].payload)


@pytest.mark.slow
def test_xdata_through_streaming_ingest(spark, tmp_path):
    """End-to-end: the streaming foreachBatch commits blobs alongside
    readings."""
    src = str(tmp_path / "src")
    df = _rows_df(
        spark,
        [
            ("2026-01-01 00:00:05", "a", 1.0),
            ("2026-01-01 00:00:55", "b", 3.0),
        ],
    )
    df.coalesce(1).write.parquet(f"{src}/b0")
    now = time.time()
    for root, _, files in os.walk(src):
        for f in files:
            os.utime(os.path.join(root, f), (now - 60, now - 60))
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/*")
    raw, xd = str(tmp_path / "raw"), str(tmp_path / "xd")
    q = ingest.ingest_to_parquet(
        stream,
        raw,
        checkpoint=str(tmp_path / "ckpt"),
        available_now=True,
        xdata_fn=_xdata_fn,
        xdata_to=xd,
    )
    q.awaitTermination(120)
    out = ingest.events_with_xdata(spark, raw, xd)
    assert out.filter(F.col("payload").isNotNull()).count() == 2
