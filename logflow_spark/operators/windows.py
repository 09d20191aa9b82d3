"""Event-time windowed aggregation (SURVEY.md §2.6).

The reference's time buckets are placeholder constants
(transformer/flink_optimized_log_transform.py:98-101 — always 0) and its
served query hand-rolls 10-minute buckets in ClickHouse SQL
(QUERY_OPTIMIZATION_ANALYSIS.md:352-370). Here they are real event-time
windows computed by Spark's native windowed aggregation, which:

- runs partial (map-side) aggregation before the shuffle,
- shuffles once on (window, keys),
- in streaming mode keeps per-window state in RocksDB evicted by watermark.

The same builders serve batch (oracle) and streaming (production) frames.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logflow_spark.functions.text import host_expr


def with_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Derive the grouping key host(url) — JVM-side regexp, no UDF."""
    return df.withColumn("host", host_expr(url_col))


def _flatten_window(df: DataFrame, extra: Sequence[str]) -> DataFrame:
    cols = [
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(c) for c in extra],
    ]
    agg_cols = [c for c in df.columns if c not in ("window", *extra)]
    return df.select(*cols, *[F.col(c) for c in agg_cols])


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "warc_ts",
    duration: str = "10 minutes",
    keys: Sequence[str] = ("lang", "host"),
    start_time: str | None = None,
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """count(*) per tumbling window per key.

    ``start_time`` supports the reference's offset-anchored buckets
    (toStartOfInterval(ts - offset) + offset, QUERY_OPTIMIZATION_ANALYSIS.md:362)
    via window()'s native startTime argument.
    """
    w = (
        F.window(F.col(ts_col), duration, duration, start_time)
        if start_time
        else F.window(F.col(ts_col), duration)
    )
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("cnt")]
    out = df.groupBy(w.alias("window"), *[F.col(k) for k in keys]).agg(*aggs)
    return _flatten_window(out, keys)


def sliding_counts(
    df: DataFrame,
    ts_col: str = "warc_ts",
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    keys: Sequence[str] = ("lang", "host"),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """count(*) per sliding window per key (each row lands in d/s windows)."""
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("cnt")]
    out = df.groupBy(
        F.window(F.col(ts_col), duration, slide).alias("window"),
        *[F.col(k) for k in keys],
    ).agg(*aggs)
    return _flatten_window(out, keys)


def session_counts(
    df: DataFrame,
    ts_col: str = "warc_ts",
    gap: str = "30 minutes",
    keys: Sequence[str] = ("lang", "host"),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Gap-based session windows per key (session_window merges on overlap)."""
    aggs = list(aggs) if aggs else [F.count(F.lit(1)).alias("cnt")]
    out = df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("window"),
        *[F.col(k) for k in keys],
    ).agg(*aggs)
    return _flatten_window(out, keys)


def top_k_windows(df: DataFrame, k: int = 10000, order_col: str = "window_start") -> DataFrame:
    """ORDER BY bucket DESC LIMIT k — the reference's served-query tail
    (QUERY_OPTIMIZATION_ANALYSIS.md:366-370). Catalyst compiles this to
    TakeOrderedAndProject: per-partition top-k then a driver merge — no
    global sort even at 10^12 rows."""
    return df.orderBy(F.desc(order_col)).limit(k)
