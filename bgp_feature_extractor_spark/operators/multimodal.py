"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque ``binary`` columns + typed metadata structs; the
Spark-side plumbing (schema, partition strategy, Arrow batch shape, UDF
signatures) is real and tested. The actual codec step is stubbed — the
image/audio libraries are not in this container — behind
``DecodeUnavailable`` plus a deterministic fake decoder so downstream
feature extraction is exercisable end-to-end.

Scale notes: media rows are orders of magnitude wider than text rows, so
  * batch size is capped via spark.sql.execution.arrow.maxRecordsPerBatch
    (set ~64 for >1MB payloads),
  * decode runs in ``mapInPandas`` (no shuffle — embarrassingly parallel),
  * heavy payloads should be scanned with spark.read.format("binaryFile")
    and joined to metadata by path, never collected.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_bytes", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path: codec libraries (PIL/av/librosa)
    are not installed in this image."""


def real_decode(payload: bytes, kind: str, meta) -> np.ndarray:  # pragma: no cover
    raise DecodeUnavailable(
        "media decoding requires PIL/av/librosa — not available in this "
        "container; use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes, kind: str, meta) -> np.ndarray:
    """Deterministic stand-in: a fixed-length float vector derived from the
    payload digest — same shape contract as a real embedding/decode step."""
    digest = hashlib.sha256(payload or b"").digest()
    vals = struct.unpack(">8I", digest[:32])
    return np.array([v % 1000 / 1000.0 for v in vals], dtype=np.float32)


def extract_media_features(
    media: DataFrame, decoder=fake_decode, batch_hint: int = 64
) -> DataFrame:
    """mapInPandas decode/feature-extract over binary payload batches."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                hashes.append(hashlib.sha256(b).hexdigest())
                feats.append(decoder(b, kind, meta).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": pd.array(sizes, dtype="int32"),
                    "sha256": hashes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def synth_media(spark: SparkSession, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes)."""
    rows = []
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 30 if kind == "video" else None,
            "mime": f"{kind}/fake",
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.FloatType()), True),
    ]
)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, decoder=fake_decode
) -> DataFrame:
    """Image-resize plumbing (mapInPandas, no shuffle): decode -> pixel
    grid -> nearest-neighbor resample to (width, height) -> flat float
    array. The decode is the stubbed step; the resample itself is real
    numpy (index-grid gather), so swapping in a real decoder yields real
    resized images with the same schema, batching, and partitioning."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            ids, pixels = [], []
            for media_id, payload, kind, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["kind"], pdf["meta"]
            ):
                b = bytes(payload) if payload is not None else b""
                vec = decoder(b, kind, meta)
                # interpret the decoded vector as a square-ish source grid
                side = max(1, int(np.sqrt(vec.size)))
                src = np.resize(vec, (side, side))
                yi = np.minimum((np.arange(height) * side) // height, side - 1)
                xi = np.minimum((np.arange(width) * side) // width, side - 1)
                out = src[np.ix_(yi, xi)]
                ids.append(media_id)
                pixels.append(out.ravel().astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "width": pd.array([width] * len(ids), dtype="int32"),
                    "height": pd.array([height] * len(ids), dtype="int32"),
                    "pixels": pixels,
                }
            )

    return media.mapInPandas(kernel, RESIZE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode frame indices 0..n_frames-1
    step every_n (decode of individual frames is the stubbed part)."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
