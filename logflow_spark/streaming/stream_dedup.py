"""Streaming exact deduplication — the online twin of operators/dedup.py.

A training-data ingest pipeline dedups AT INGEST, not in a nightly batch:
the first document with a given content digest passes, replays and
re-crawls are dropped. Spark-native: digest map-side (16 bytes/row through
the dedup state, never the document), then
``dropDuplicatesWithinWatermark`` — keyed state holds one entry per digest
and is EVICTED once the watermark passes (bounded state for unbounded
streams; plain dropDuplicates would grow state forever at 10^12 docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logflow_spark.operators.dedup import md5_60bit


def streaming_distinct_digests(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "73 hours",
) -> DataFrame:
    """First occurrence per content digest within the watermark horizon.

    Output carries the digest only — which concrete duplicate row arrives
    first is an arrival-order artifact, the digest set is deterministic.
    """
    digested = stream_df.select(
        F.col(ts_col), md5_60bit(F.col(text_col)).alias("digest")
    ).filter(F.col("digest").isNotNull())
    return (
        digested.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
        .select("digest")
    )
