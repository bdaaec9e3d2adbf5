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


# ------------------------------------------------------------------
# RAW1: a real, dependency-free image container (magic + u16 height +
# u16 width + u8 channels, then H*W*C uint8 pixels, row-major). The
# media libraries (Pillow/cv2) stay stubbed above, but THIS path is a
# genuine decode: bytes are parsed, shape-validated, resized with
# real nearest-neighbor index math, and featurized — the full
# encode -> decode -> transform -> feature lifecycle a production
# pipeline runs, just on an uncompressed format numpy can handle.

import struct

import numpy as np

RAW_MAGIC = b"RAW1"
RAW_HEADER = struct.Struct(">4sHHB")


def encode_raw_image(arr: "np.ndarray") -> bytes:
    """Serialize an HxWxC uint8 array into the RAW1 container."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3:
        raise ValueError(f"expected HxWxC array, got shape {a.shape}")
    h, w, c = a.shape
    return RAW_HEADER.pack(RAW_MAGIC, h, w, c) + a.tobytes()


def decode_raw_image(payload: bytes) -> "np.ndarray":
    """REAL decode of a RAW1 blob to an HxWxC uint8 array — parses the
    header, validates magic and byte count, reshapes the pixel
    buffer. Raises ValueError on corrupt input (truncated payloads,
    wrong magic) exactly like a real decoder."""
    raw = bytes(payload)
    if len(raw) < RAW_HEADER.size:
        raise ValueError("RAW1: truncated header")
    magic, h, w, c = RAW_HEADER.unpack_from(raw)
    if magic != RAW_MAGIC:
        raise ValueError(f"RAW1: bad magic {magic!r}")
    body = raw[RAW_HEADER.size:]
    if len(body) != h * w * c:
        raise ValueError(f"RAW1: expected {h*w*c} pixel bytes, got {len(body)}")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)


def resize_nearest(arr: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Nearest-neighbor resize with floor index math
    (src = (dst * src_dim) // dst_dim) — deterministic, and exactly
    reproducible in integer SQL for the oracle."""
    h, w, _ = arr.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


THUMB_H = 4
THUMB_W = 4
IMG_FEATURE_SCHEMA = (
    "doc_id bigint, height int, width int, "
    "mean_r double, mean_g double, mean_b double, thumb_fp bigint"
)


def synth_raw_images(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic RAW1 ingestion stand-in: one gradient image per
    key — size 8..16 px per side from the key, pixel(y, x, c) =
    (key*7 + y*3 + x*5 + c*11) % 256 — ENCODED into real RAW1 bytes
    via an Arrow-batched mapInPandas (the shape real media ingestion
    uses)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for k in pdf[key]:
                k = int(k)
                h, w = 8 + k % 9, 8 + (k * 3) % 9
                y = np.arange(h).reshape(h, 1, 1)
                x = np.arange(w).reshape(1, w, 1)
                c = np.arange(3).reshape(1, 1, 3)
                img = ((k * 7 + y * 3 + x * 5 + c * 11) % 256).astype(np.uint8)
                payloads.append(encode_raw_image(img))
            yield pd.DataFrame({"doc_id": pdf[key], "payload": payloads})

    return df.select(key).mapInPandas(batches, "doc_id bigint, payload binary")


def image_features(blobs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Real decode -> resize -> featurize over RAW1 blobs: per image,
    the decoded dimensions, per-channel mean over the 4x4
    nearest-neighbor thumbnail (exact integer sum / 16 — bit-portable)
    and a polynomial fingerprint over the thumbnail bytes in (y, x, c)
    order. Arrow-batched mapInPandas; blobs never leave the executor."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "height", "width", "mean_r", "mean_g", "mean_b",
                "thumb_fp")}
            for k, payload in zip(pdf[key], pdf["payload"]):
                img = decode_raw_image(payload)
                h, w, _ = img.shape
                thumb = resize_nearest(img, THUMB_H, THUMB_W)
                sums = thumb.astype(np.int64).sum(axis=(0, 1))
                fp = 0
                for byte in thumb.reshape(-1):
                    fp = (fp * 31 + int(byte)) % FP_MOD
                rows["doc_id"].append(int(k))
                rows["height"].append(h)
                rows["width"].append(w)
                rows["mean_r"].append(sums[0] / (THUMB_H * THUMB_W))
                rows["mean_g"].append(sums[1] / (THUMB_H * THUMB_W))
                rows["mean_b"].append(sums[2] / (THUMB_H * THUMB_W))
                rows["thumb_fp"].append(fp)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(rows["doc_id"], dtype="int64"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "width": pd.array(rows["width"], dtype="int32"),
                    "mean_r": rows["mean_r"],
                    "mean_g": rows["mean_g"],
                    "mean_b": rows["mean_b"],
                    "thumb_fp": pd.array(rows["thumb_fp"], dtype="int64"),
                }
            )

    return blobs.select(key, "payload").mapInPandas(batches, IMG_FEATURE_SCHEMA)


# PCM1: the audio analog of RAW1 — magic + u32 sample count + u16
# sample rate, then big-endian int16 samples. Again a REAL decode
# (header parse, count validation, dtype interpretation), with
# transcendental-free features so the whole path is oracle-exact:
# peak amplitude, mean square (exact integer sum / n), and strict
# sign-change zero crossings.

PCM_MAGIC = b"PCM1"
PCM_HEADER = struct.Struct(">4sIH")


def encode_raw_audio(samples: "np.ndarray", rate: int = 16000) -> bytes:
    s = np.ascontiguousarray(samples, dtype=">i2")
    return PCM_HEADER.pack(PCM_MAGIC, len(s), rate) + s.tobytes()


def decode_raw_audio(payload: bytes) -> tuple["np.ndarray", int]:
    """REAL decode of a PCM1 blob to (int16 waveform, sample_rate);
    raises ValueError on corrupt input."""
    raw = bytes(payload)
    if len(raw) < PCM_HEADER.size:
        raise ValueError("PCM1: truncated header")
    magic, n, rate = PCM_HEADER.unpack_from(raw)
    if magic != PCM_MAGIC:
        raise ValueError(f"PCM1: bad magic {magic!r}")
    body = raw[PCM_HEADER.size:]
    if len(body) != 2 * n:
        raise ValueError(f"PCM1: expected {2*n} sample bytes, got {len(body)}")
    return np.frombuffer(body, dtype=">i2").astype(np.int64), rate


AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, n_samples int, sample_rate int, "
    "peak bigint, mean_sq double, zero_crossings bigint"
)


def synth_raw_audio(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic PCM1 ingestion stand-in: waveform[i] =
    ((key*13 + i*7) % 4001) - 2000, 50..99 samples per key, encoded
    into real PCM1 bytes via Arrow-batched mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for k in pdf[key]:
                k = int(k)
                n = 50 + k % 50
                i = np.arange(n)
                wave = ((k * 13 + i * 7) % 4001) - 2000
                payloads.append(encode_raw_audio(wave.astype(np.int16)))
            yield pd.DataFrame({"doc_id": pdf[key], "payload": payloads})

    return df.select(key).mapInPandas(batches, "doc_id bigint, payload binary")


def audio_features(blobs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Real decode -> featurize over PCM1 blobs: peak |amplitude|,
    exact mean square (integer sum of squares / n), strict sign-change
    zero crossings. All integer arithmetic until one final division —
    bit-portable across engines."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "n_samples", "sample_rate", "peak", "mean_sq",
                "zero_crossings")}
            for k, payload in zip(pdf[key], pdf["payload"]):
                wave, rate = decode_raw_audio(payload)
                n = len(wave)
                out["doc_id"].append(int(k))
                out["n_samples"].append(n)
                out["sample_rate"].append(rate)
                out["peak"].append(int(np.abs(wave).max()) if n else 0)
                out["mean_sq"].append(
                    int((wave * wave).sum()) / n if n else 0.0
                )
                out["zero_crossings"].append(
                    int((wave[:-1] * wave[1:] < 0).sum()) if n > 1 else 0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out["doc_id"], dtype="int64"),
                    "n_samples": pd.array(out["n_samples"], dtype="int32"),
                    "sample_rate": pd.array(out["sample_rate"], dtype="int32"),
                    "peak": pd.array(out["peak"], dtype="int64"),
                    "mean_sq": out["mean_sq"],
                    "zero_crossings": pd.array(
                        out["zero_crossings"], dtype="int64"
                    ),
                }
            )

    return blobs.select(key, "payload").mapInPandas(batches, AUDIO_FEATURE_SCHEMA)
