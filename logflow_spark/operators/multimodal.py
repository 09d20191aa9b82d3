"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-friendly batch shape,
Arrow-batched mapInPandas UDF signatures — while the actual codec work is
stubbed (the sandbox ships no image/audio libraries):

- ``decode_images``          → NotImplementedError (clearly-marked stub); at
                               deploy time swap in PIL/ffmpeg inside the same
                               mapInPandas body — the plan shape is unchanged.
- ``fake_feature_extract``   → deterministic md5-derived feature vectors with
                               the exact schema/batching a real extractor
                               would have; used by tests to pin the plumbing.

Design notes for 100 TB: binary payloads stay in their parquet row groups
until the mapInPandas stage (column pruning keeps them out of every other
scan); the stage is embarrassingly parallel (no shuffle); output feature
vectors are small → the downstream shuffle moves features, not media bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
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
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def decode_images(df: DataFrame) -> DataFrame:
    """REAL-DECODE STUB: image bytes → pixel arrays.

    The container has no imaging libraries; the deploy-time implementation
    replaces the body of ``_decode`` with e.g. PIL.Image.open over each
    payload — the mapInPandas plan, schema and batch shape stay identical.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "environment; use fake_feature_extract for plumbing tests"
        )

    return df.mapInPandas(_decode, schema=FEATURE_SCHEMA)


def _fake_feature(payload: bytes | None) -> list[float] | None:
    if payload is None:
        return None
    digest = hashlib.md5(payload).digest()
    # 16 deterministic floats in [0,1) from the digest bytes
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 256.0
    return arr[:FEATURE_DIM].tolist()


def fake_feature_extract(df: DataFrame) -> DataFrame:
    """Deterministic stand-in feature extractor (schema-true, Arrow-batched).

    Batch-columnar over each Arrow chunk (Series.map / vectorized length) —
    no per-row Python loop; a real codec would decode the same Series the
    same way.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payload = b["payload"]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": payload.map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int64"),
                    "feature": payload.map(
                        lambda p: None if p is None else _fake_feature(bytes(p))
                    ),
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling STUB: emits (media_id, frame_ts_ms) plan rows.

    Real frame extraction needs ffmpeg; the sampling schedule itself is a
    pure JVM-side computation and is implemented for real.
    """
    from pyspark.sql import functions as F

    n_frames = (F.col("duration_ms") / every_ms).cast("long")
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ).alias("frame_ts_ms"),
        )
    )
