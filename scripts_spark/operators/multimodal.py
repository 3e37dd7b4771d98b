"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested; the actual media
decoding is STUBBED (this container has no image/audio libs): decode
functions raise NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (content-hash-derived features)
stands in so the distributed plumbing can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
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
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real image/audio feature extractor:
    16 floats derived from the payload digest."""
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    raise NotImplementedError(
        "image decode requires pillow/opencv (not in this container); "
        "use extract_features(..., fake=True) for the plumbing path"
    )


def decode_audio(payload: bytes):  # pragma: no cover - stub by design
    raise NotImplementedError("audio decode requires soundfile/ffmpeg")


def extract_features(media: DataFrame, fake: bool = False,
                     batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Real deployment swaps `_fake_features` for a model inference call;
    everything else (mapInPandas iterator, schema, salted repartition
    upstream) is the production shape. Batches arrive as pandas
    DataFrames with `payload` as bytes objects.
    """
    if not fake:
        # fail fast on the driver, not inside executors
        raise NotImplementedError(
            "real media decode not available in this environment; pass fake=True"
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = b["payload"]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest() if p is not None else None
                    ),
                    "features": payloads.map(
                        lambda p: _fake_features(p) if p is not None else None
                    ),
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_positions(duration_ms, every_ms: int = 1000):
    """Deterministic frame-sampling positions for a video column —
    pure expression (no decode needed): [0, every, 2*every, ...]."""
    return F.sequence(
        F.lit(0).cast("long"), F.greatest(duration_ms - 1, F.lit(0)), F.lit(every_ms).cast("long")
    )


def attach_media_stats(media: DataFrame) -> DataFrame:
    """Pure-expression metadata pass: byte length, aspect ratio —
    stays JVM-side, no UDF."""
    return media.withColumn("n_bytes", F.length("payload").cast("long")).withColumn(
        "aspect",
        F.when(
            (F.col("height").isNotNull()) & (F.col("height") > 0),
            F.col("width").cast("double") / F.col("height"),
        ),
    )
