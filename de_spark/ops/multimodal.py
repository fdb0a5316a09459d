"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schema, partition-friendly batching, Arrow
UDF signatures, frame-sampling math) is real and tested.  Decode
kernels: PPM (P6) images and PCM WAV audio are decoded FOR REAL
(numpy + stdlib ``wave`` — no external codec library needed), so the
decode→feature path is exercised end-to-end on actual pixels/samples.
Compressed formats (JPEG/PNG/MP4) are the honest stub — this container
has no PIL/ffmpeg — raising NotImplementedError in strict mode or
producing a deterministic fake behind the same interface.  Swapping in
PIL/ffmpeg on a real cluster changes only those kernel bodies, not the
plan.
"""

from __future__ import annotations

import hashlib
import io
import wave
import zlib
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
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("payload_sha", T.StringType(), False),
    ]
)


# -- real codecs (no external libs: numpy + stdlib wave) --------------------


def make_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic P6 PPM image: a seeded RGB gradient."""
    x = np.arange(width, dtype=np.uint32)
    y = np.arange(height, dtype=np.uint32)[:, None]
    r = (x + seed) % 256
    g = (y * 3 + seed * 7) % 256
    b = (x[None, :] + y + seed * 13) % 256
    arr = np.stack(
        [np.broadcast_to(r, (height, width)), np.broadcast_to(g, (height, width)), b],
        axis=-1,
    ).astype(np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + arr.tobytes()


def decode_ppm(data: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary P6 PPM → (width, height, HxWx3 uint8 array)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval — whitespace separated,
    # '#' comments allowed; pixel data starts after the single
    # whitespace byte following maxval
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    arr = np.frombuffer(data, dtype=np.uint8, count=width * height * 3, offset=i)
    return width, height, arr.reshape(height, width, 3)


def make_wav(duration_ms: int, freq_hz: float = 440.0, rate: int = 8000, seed: int = 0) -> bytes:
    """Deterministic 16-bit mono PCM WAV: a sine with seeded phase."""
    n = max(int(rate * duration_ms / 1000), 1)
    t = np.arange(n, dtype=np.float64) / rate
    samples = (np.sin(2 * np.pi * freq_hz * t + seed) * 0.5 * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Parse a PCM WAV → (sample_rate, float32 mono samples in [-1, 1])."""
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return rate, samples


def synthetic_media(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic media table: REAL PPM images and PCM WAVs, plus
    opaque fake video payloads (mp4 decode needs ffmpeg — the stub)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        w = 64 + (i % 8) * 16
        h = 48 + (i % 8) * 16
        dur = 1000 * (1 + i % 30)
        if kind == "image":
            mime, payload = "image/x-portable-pixmap", make_ppm(w, h, seed=i)
        elif kind == "audio":
            mime, payload = "audio/wav", make_wav(min(dur, 3000), 200.0 + 10 * i, seed=i)
        else:
            mime, payload = "video/mp4", hashlib.sha256(f"media{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                mime,
                bytearray(payload),
                w if kind != "audio" else None,
                h if kind != "audio" else None,
                dur if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


def _fake_decode_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for kernels needing absent codecs (mp4)."""
    return [
        (zlib.crc32(payload[i::dim]) % 10_000) / 10_000.0 for i in range(dim)
    ]


def _image_features(data: bytes) -> list[float]:
    """Real pixel features from a decoded PPM: per-channel means, gray
    std, brightness extremes, geometry."""
    w, h, arr = decode_ppm(data)
    f = arr.astype(np.float32) / 255.0
    gray = f.mean(axis=-1)
    return [
        float(f[..., 0].mean()), float(f[..., 1].mean()), float(f[..., 2].mean()),
        float(gray.std()), float(gray.min()), float(gray.max()),
        min(w, 4096) / 4096.0, min(h, 4096) / 4096.0,
    ]


def _audio_features(data: bytes) -> list[float]:
    """Real sample features from a decoded WAV: RMS, peak, zero-crossing
    rate, mean, duration, rate."""
    rate, s = decode_wav(data)
    zc = float(np.mean(np.abs(np.diff(np.signbit(s).astype(np.int8))))) if len(s) > 1 else 0.0
    return [
        float(np.sqrt(np.mean(s**2))), float(np.abs(s).max(initial=0.0)),
        zc, float(s.mean()),
        min(len(s) / rate, 3600.0) / 3600.0, rate / 48000.0,
        float(np.percentile(np.abs(s), 90)) if len(s) else 0.0,
        0.0,
    ]


def extract_features(media: DataFrame, strict: bool = False, dim: int = 8) -> DataFrame:
    """Batch feature extraction over the binary payload column.

    mapInPandas: whole Arrow batches cross the boundary once.  PPM
    images and PCM WAV audio decode for real (numpy/stdlib); payloads
    needing absent codec libraries (mp4, jpeg, png) raise
    NotImplementedError in strict mode or take the deterministic fake.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for mime, p in zip(pdf["mime"], pdf["payload"]):
                data = bytes(p)
                if mime == "image/x-portable-pixmap" or data.startswith(b"P6"):
                    feats.append(_image_features(data))
                    oks.append(True)
                elif mime == "audio/wav" and data.startswith(b"RIFF"):
                    feats.append(_audio_features(data))
                    oks.append(True)
                elif strict:
                    raise NotImplementedError(
                        f"decode for {mime} requires PIL/ffmpeg — not in this container"
                    )
                else:
                    feats.append(_fake_decode_feature(data, dim))
                    oks.append(True)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "decode_ok": oks}
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling plan for video rows: one row per sampled frame.

    The sampling math (which timestamps to pull) is exact; the frame
    payload is stubbed as a sha over (media_id, ts)."""
    video = media.where(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    exploded = video.select(
        "media_id", F.posexplode(ts).alias("frame_idx", "ts_ms")
    )
    return exploded.select(
        "media_id",
        F.col("frame_idx").cast("int"),
        F.col("ts_ms").cast("long"),
        F.sha2(F.concat_ws(":", "media_id", "ts_ms"), 256).alias("payload_sha"),
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize geometry (pure column math; the pixel work is the stub)."""
    img = media.where(F.col("kind") == "image")
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return img.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("out_width"),
        F.round(F.col("height") * scale).cast("int").alias("out_height"),
    )
