"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque ``binary`` columns + typed metadata structs; the
Spark-side plumbing (schema, partition strategy, Arrow batch shape, UDF
signatures) is real and tested. Decoding is real for the pure-numpy
formats — binary PPM images, uncompressed 24-bit BMP, 16-bit PCM WAV
(``real_decode``) — and raises ``DecodeUnavailable`` only for compressed
codecs (JPEG/PNG/MP4-class) whose libraries are not in this container;
``fake_decode`` remains as the deterministic stand-in for those.

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
    """Raised by the real decode path for formats that need codec
    libraries (JPEG/PNG/MP4-class) — PIL/av are not in this image.
    PPM/BMP/WAV are decoded with pure numpy (see real_decode)."""


def _ppm_tokens(b: bytes, n: int) -> tuple[list[bytes], int]:
    """First n whitespace-separated PPM header tokens (with '#' comment
    support, per the netpbm spec) + offset of the byte after the single
    whitespace that terminates the last token."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        toks.append(b[i:j])
        i = j
    return toks, i + 1  # skip exactly one whitespace after maxval


def _decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6): header 'P6 <w> <h> <maxval>' then raw RGB bytes.
    Returns the grayscale (channel-mean) pixel grid flattened, in [0, 1]."""
    toks, off = _ppm_tokens(b, 4)
    if toks[0] != b"P6":
        raise DecodeUnavailable(f"not a binary PPM: magic {toks[0]!r}")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if maxval > 255:
        raise DecodeUnavailable("16-bit PPM not supported")
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=off)
    return (px.reshape(h, w, 3).mean(axis=2) / maxval).astype(np.float32).ravel()


def _decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): rows are
    bottom-up and padded to 4 bytes. Returns grayscale flat array, [0, 1],
    in top-down row order."""
    if b[:2] != b"BM":
        raise DecodeUnavailable("not a BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise DecodeUnavailable(f"BMP header size {hdr_size} unsupported")
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise DecodeUnavailable(f"only 24-bit BI_RGB BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return (rows.mean(axis=2) / 255.0).astype(np.float32).ravel()


def _decode_wav(b: bytes) -> np.ndarray:
    """RIFF/WAVE, 16-bit PCM: walk the chunk list for 'fmt ' and 'data'.
    Returns mono (channel-mean) float samples in [-1, 1]."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise DecodeUnavailable("not a RIFF/WAVE file")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack_from("<I", b, i + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", b, i + 8)
        elif cid == b"data":
            data = b[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise DecodeUnavailable("WAV missing fmt/data chunk")
    audio_format, n_channels, _rate, _bps, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise DecodeUnavailable(f"only 16-bit PCM WAV supported (fmt={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    if n_channels > 1:
        samples = samples[: len(samples) - len(samples) % n_channels]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return (samples / 32768.0).astype(np.float32)


def real_decode(payload: bytes, kind: str, meta) -> np.ndarray:
    """Decode real media bytes with pure numpy — no codec libraries.

    Supported (public, trivially-parseable formats): binary PPM (P6),
    uncompressed 24-bit BMP, 16-bit PCM WAV. Compressed formats
    (JPEG/PNG/MP3/MP4-class) genuinely need PIL/av, which this image
    lacks, and raise DecodeUnavailable."""
    try:
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:4] == b"RIFF":
            return _decode_wav(payload)
    except DecodeUnavailable:
        raise
    except (ValueError, struct.error, IndexError) as exc:
        # truncated/corrupt payloads that pass the magic-byte sniff must
        # surface as the documented fallback signal, not crash the
        # executor task (ADVICE r3)
        raise DecodeUnavailable(f"malformed {kind} payload: {exc}") from exc
    raise DecodeUnavailable(
        "payload is not PPM/BMP/WAV; compressed codecs (JPEG/PNG/MP4) "
        "require PIL/av — not available in this container"
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
