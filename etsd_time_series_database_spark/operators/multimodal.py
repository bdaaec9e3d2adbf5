"""Multimodal (binary) column plumbing: decode / feature-extract over
opaque blobs with typed metadata.

Pattern: image/audio/video payloads live in a ``binary`` column next
to a metadata struct; per-batch processing runs through
``mapInPandas`` (Arrow-batched — the only sane way to move MBs of
bytes between JVM and Python). The actual media decoding libraries
(Pillow/librosa/av) are NOT in this container, so the decode step is
stubbed behind ``NotImplementedError`` with a deterministic fake for
tests; everything Spark-side — schema, batch iteration, partitioning,
output shape — is real.

At 100 TB: blobs should be size-bucketed (``repartitionByRange`` on
n_bytes) so Arrow batches stay bounded; metadata-only queries must
never touch the blob column (columnar pruning does this for free as
long as the blob is a top-level column, which is why meta is NOT
packed inside the blob).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, byte_fp bigint"
FP_MOD = 1_000_000_007


def to_blob_table(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Build a blob-column table from a text table (stand-in for real
    media ingestion): payload = utf-8 bytes, typed metadata struct."""
    return df.select(
        key,
        F.encode(F.col(text), "utf-8").alias("payload"),
        F.struct(
            F.length(F.col(text)).cast("bigint").alias("n_chars"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Decode an image blob to HxWxC array. STUB: Pillow/cv2 are not in
    this container."""
    raise NotImplementedError("image decode requires Pillow/cv2 (not installed)")


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """Decode an audio blob to a waveform array. STUB: librosa/soundfile
    are not in this container."""
    raise NotImplementedError("audio decode requires librosa/soundfile (not installed)")


def fake_decode(payload: bytes) -> list[int]:
    """Deterministic stand-in decoder: the raw byte values."""
    return list(payload)


def extract_features(blobs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the blob column via
    mapInPandas: byte length + rolling byte fingerprint (the
    deterministic stand-in for an image/audio feature vector).

    The iterator-of-batches shape is the real contract: each pdf is
    one Arrow batch, so memory stays bounded regardless of partition
    size."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = []
            for payload in pdf["payload"]:
                h = 0
                for byte in fake_decode(bytes(payload)):
                    h = (h * 31 + byte) % FP_MOD
                fps.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[key],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "byte_fp": fps,
                }
            )

    return blobs.select(key, "payload").mapInPandas(batches, FEATURE_SCHEMA)


def resize_image(payload: bytes, width: int, height: int):  # pragma: no cover - stub
    """Resize an image blob. STUB: Pillow/cv2 are not in this container."""
    raise NotImplementedError("image resize requires Pillow/cv2 (not installed)")


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes bigint, frame_fp bigint"
FRAME_SIZE = 64  # stand-in 'frame' = 64-byte slice of the payload


def sample_frames(
    blobs: DataFrame, every_n: int = 2, key: str = "doc_id"
) -> DataFrame:
    """Frame sampling over video-like blobs: emit every Nth frame as its
    own row — the one-to-many mapInPandas shape (each input blob fans
    out to multiple output rows, batches stay Arrow-bounded).

    Real video decode (av/ffmpeg) is not in this container; the
    deterministic stand-in treats the payload as FRAME_SIZE-byte
    frames. The Spark-side contract — schema, fan-out, batch
    iteration — is exactly what a real decoder plugs into.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_key, out_idx, out_len, out_fp = [], [], [], []
            for k, payload in zip(pdf[key], pdf["payload"]):
                raw = bytes(payload)
                frames = [
                    raw[i : i + FRAME_SIZE] for i in range(0, len(raw), FRAME_SIZE)
                ]
                for idx in range(0, len(frames), every_n):
                    fr = frames[idx]
                    h = 0
                    for byte in fr:
                        h = (h * 31 + byte) % FP_MOD
                    out_key.append(k)
                    out_idx.append(idx)
                    out_len.append(len(fr))
                    out_fp.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out_key, dtype="int64"),
                    "frame_idx": pd.array(out_idx, dtype="int32"),
                    "frame_bytes": pd.array(out_len, dtype="int64"),
                    "frame_fp": pd.array(out_fp, dtype="int64"),
                }
            )

    return blobs.select(key, "payload").mapInPandas(batches, FRAME_SCHEMA)
