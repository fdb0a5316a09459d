"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schema, partition-friendly batching, Arrow
UDF signatures, frame-sampling math) is real and tested; the actual
codec work is STUBBED — this container has no image/audio libraries,
so decode kernels either raise NotImplementedError (strict mode) or
produce a deterministic fake (test mode) behind the same interface.
Swapping in PIL/ffmpeg on a real cluster changes only the kernel body,
not the plan.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

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


def synthetic_media(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                mime,
                bytearray(payload),
                64 + (i % 8) * 16 if kind != "audio" else None,
                48 + (i % 8) * 16 if kind != "audio" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


def _fake_decode_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode→embed kernel."""
    return [
        (zlib.crc32(payload[i::dim]) % 10_000) / 10_000.0 for i in range(dim)
    ]


def extract_features(media: DataFrame, strict: bool = False, dim: int = 8) -> DataFrame:
    """Batch feature extraction over the binary payload column.

    mapInPandas: whole Arrow batches cross the boundary once; the
    kernel is the only stub (NotImplementedError in strict mode)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg — not in this container"
                )
            feats = [_fake_decode_feature(bytes(p), dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_ok": True,
                }
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
