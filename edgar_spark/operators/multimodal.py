"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, partition-friendly
UDF signatures) is real and tested; the actual media decode is STUBBED —
this container ships no image/audio libraries — behind
``NotImplementedError`` plus a deterministic fake feature extractor so the
pipeline shape is exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode requires an image library not present in this container.
    The Spark plumbing around this call (batching, schema, partitioning) is
    what the engine owns; swap this for PIL/torchvision on a real cluster."""
    raise NotImplementedError(
        "image decode stub: no image codec libraries in this environment"
    )


def fake_features(payload: bytes, n: int = 8) -> np.ndarray:
    """Deterministic stand-in feature extractor: byte-histogram moments.
    Same contract (binary → float vector) as a real embedding model."""
    if not payload:
        return np.zeros(n, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % n, minlength=n).astype(np.float32)
    return hist / hist.sum()


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id", n: int = 8
) -> DataFrame:
    """binary → array<float> features via Arrow-batched mapInPandas (the
    real-model call site; batch shape = one media blob per row)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p, n).tolist() for p in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema=f"{id_col} long, features array<float>"
    )


def byte_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata pass that never leaves the JVM: payload length and a
    stable content hash — the pruning/pre-filter stage before any decode."""
    return df.select(
        "*",
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
    )


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, duration_col: str = "duration_ms"
) -> DataFrame:
    """Video frame-sampling *plan*: one row per planned frame timestamp
    (explode of a sequence — pure JVM). The decode of each frame is the
    stubbed call above; the plan is what partitions/distributes."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )
