"""Multimodal columns for the training-data pipeline (M7): image/audio/video
as opaque ``binary`` payloads + typed metadata, with decode / feature /
frame-sample operators as Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schema, partition sizing, UDF signatures, batch
iteration — is real and tested; the codec step itself is stubbed behind
import-try (image/audio libraries are not in this container): with a codec
present ``decode_image`` would return pixel arrays, without one it computes a
deterministic byte-level profile so downstream stages stay testable.

At 100 TB: payloads ride executor-side only (never collected); batches are
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``; feature
extraction is embarrassingly parallel (no shuffle); frame sampling is a pure
column expression (sequence/explode, JVM-side).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def _have_image_codec() -> bool:
    try:  # pragma: no cover - container has no codec libs
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(payload: bytes) -> object:
    """Decode an image payload to a pixel array. STUB: no codec library is
    available in this container; callers use ``byte_profile`` instead."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use extract_features (byte-profile fallback) instead"
    )


def byte_profile(payload: bytes) -> list[float]:
    """Deterministic FEATURE_DIM-dim profile of a payload: sha256-seeded so
    it is reproducible across processes (the stand-in for a real embedding)."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "little") / 4294967295.0
        for i in range(FEATURE_DIM)
    ]


def synthesize_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media corpus for tests (payload = repeated sha256
    stream seeded by media_id)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        seed = hashlib.sha256(f"media-{i}".encode()).digest()
        payload = (seed * ((64 + i) // len(seed) + 1))[: 64 + i]
        rows.append(
            (
                i,
                kind,
                payload,
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                16000 if kind == "audio" else None,
                1000 * (i % 7 + 1) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes (mapInPandas).

    With a codec installed this is where decode→embed would run; the
    byte-profile fallback keeps the identical batch shape either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [byte_profile(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


U32_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature_u32", ArrayType(LongType()), False),
    ]
)


def feature_u32_slots(media: DataFrame) -> DataFrame:
    """byte_profile's integer core as exact u32 slots (no float division) —
    the oracle-checkable face of the feature extractor: same mapInPandas
    batch shape, payload bytes never leave the executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            slots = []
            sizes = []
            for p in pdf["payload"]:
                b = bytes(p)
                digest = hashlib.sha256(b).digest()
                slots.append(
                    [
                        int.from_bytes(digest[4 * i : 4 * i + 4], "little")
                        for i in range(FEATURE_DIM)
                    ]
                )
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "feature_u32": slots,
                }
            )

    return media.mapInPandas(run, U32_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled timestamp —
    pure column expressions (sequence/explode), no Python in the hot path.
    The actual frame decode at each timestamp is the stubbed codec step."""
    vids = media.filter(F.col("kind") == "video").select("media_id", "duration_ms")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (target dims preserving aspect ratio) as column
    arithmetic; the pixel work itself is the stubbed codec step."""
    img = media.filter(F.col("kind") == "image")
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return img.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )
