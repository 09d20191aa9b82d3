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
    """Image bytes → mean-pixel feature rows, gated on an optional PIL.

    The sandbox container ships no imaging libraries, so without PIL the
    stage raises ``NotImplementedError`` (clearly-marked stub). When PIL is
    importable (deploy time) the SAME mapInPandas plan decodes for real:
    per-image ``Image.open`` + one numpy reduction per decoded array — the
    plan shape, schema and Arrow batching are identical either way, so the
    operator upgrades transparently outside the sandbox.
    """
    try:
        from PIL import Image  # type: ignore
    except ImportError:
        Image = None

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if Image is None:
            raise NotImplementedError(
                "image decode requires PIL, not present in this environment; "
                "use fake_feature_extract for plumbing tests"
            )
        import io

        for b in batches:
            feats, n_bytes = [], []
            for p in b["payload"]:
                if p is None:
                    feats.append(None)
                    n_bytes.append(0)
                    continue
                img = np.asarray(Image.open(io.BytesIO(p)).convert("RGB"))
                # per-channel mean + a coarse 13-bin luminance histogram
                lum = img.mean(axis=2)
                hist = np.histogram(lum, bins=FEATURE_DIM - 3, range=(0, 255))[0]
                vec = np.concatenate(
                    [img.mean(axis=(0, 1)) / 255.0, hist / max(1, lum.size)]
                )
                feats.append(vec.astype(np.float32).tolist())
                n_bytes.append(len(p))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "feature": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        _decode, schema=FEATURE_SCHEMA
    )


def fake_feature_extract(df: DataFrame) -> DataFrame:
    """Deterministic stand-in feature extractor (schema-true, Arrow-batched).

    The only per-element work is the md5 call itself (exactly like a real
    codec's per-image decode); ALL derived math is one numpy expression over
    the whole batch: the fixed-width digests concatenate into a single
    buffer, ``np.frombuffer(...).reshape(n, 16)`` turns them into a (n, 16)
    uint8 matrix, and one vectorized divide yields every feature vector.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for b in batches:
            payload = b["payload"].to_numpy()
            null = np.array([p is None for p in payload])
            digests = b"".join(
                b"\x00" * 16 if p is None else md5(bytes(p)).digest()
                for p in payload
            )
            mat = (
                np.frombuffer(digests, dtype=np.uint8)
                .reshape(-1, 16)[:, :FEATURE_DIM]
                .astype(np.float32)
                / 256.0
            )
            n_bytes = np.fromiter(
                (0 if p is None else len(p) for p in payload),
                dtype=np.int64,
                count=len(payload),
            )
            # row views of the batch matrix, not per-row list conversion;
            # Arrow serializes ndarray elements directly
            feats = pd.Series(list(mat), dtype=object, index=b.index)
            feats[null] = None
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "feature": feats,
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
