"""Batch as-of join: each page row ⋈ latest enrichment row with ts <= warc_ts.

The reference has no joins (SURVEY.md §2.4); the north_rule requires a
stateful page⋈enrichment join. This module is the BATCH oracle/equivalent of
the streaming stateful join (streaming/stateful_join.py), built as a single
shuffle on the join key:

  union(tag pages, tag enrichment) → window over (host) ordered by
  (time, tag) → last non-null enrichment values seen so far → keep page rows.

Compared to the naive inequality join (pages × enrichment WHERE ts <= warc_ts
then max-per-page — a quadratic blowup on hot hosts), this is O(n log n) per
host with exactly one shuffle, and survives a 100× scale-up because per-host
data is streamed through the window operator, never materialized per-pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_pages_enrichment(
    pages: DataFrame,
    enrichment: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """Returns pages columns + (enrich_ts, category, score) of the as-of row.

    Pages with no enrichment at-or-before warc_ts get nulls (left outer
    semantics). Ties (enrichment.ts == warc_ts) join — enrichment sorts
    before the page at equal time via the tag ordering.
    """
    p = pages.select(
        F.col(host_col).alias("host"),
        F.col("warc_ts").alias("_t"),
        F.lit(1).alias("_is_page"),
        F.struct(*[F.col(c) for c in pages.columns]).alias("_page"),
        F.lit(None).cast("timestamp").alias("enrich_ts"),
        F.lit(None).cast("string").alias("category"),
        F.lit(None).cast("double").alias("score"),
    )
    e = enrichment.select(
        F.col("host"),
        F.col("ts").alias("_t"),
        F.lit(0).alias("_is_page"),
        F.lit(None).cast(p.schema["_page"].dataType).alias("_page"),
        F.col("ts").alias("enrich_ts"),
        F.col("category"),
        F.col("score"),
    )
    u = p.unionByName(e)
    # enrichment (tag 0) sorts before pages (tag 1) at equal _t → inclusive asof.
    w = (
        Window.partitionBy("host")
        .orderBy(F.col("_t").asc(), F.col("_is_page").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        u.withColumn("enrich_ts", F.last("enrich_ts", ignorenulls=True).over(w))
        .withColumn("category", F.last("category", ignorenulls=True).over(w))
        .withColumn("score", F.last("score", ignorenulls=True).over(w))
        .filter(F.col("_is_page") == 1)
    )
    page_cols = [F.col(f"_page.{c}").alias(c) for c in pages.columns]
    return joined.select(*page_cols, "enrich_ts", "category", "score")


def interval_join(
    pages: DataFrame,
    enrichment: DataFrame,
    lookback: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Time-bounded equi-join: enrichment within [warc_ts - lookback, warc_ts].

    This exact plan also runs as a watermarked stream-stream join (the bound
    is what lets Spark evict join state); in batch it is the oracle for the
    streaming variant. Returns ALL matching enrichment rows in the interval.
    """
    e = enrichment.select(
        F.col("host").alias("e_host"),
        F.col("ts").alias("enrich_ts"),
        "category",
        "score",
    )
    cond = (
        (pages["host"] == e["e_host"])
        & (e["enrich_ts"] <= pages["warc_ts"])
        & (e["enrich_ts"] >= pages["warc_ts"] - F.expr(f"INTERVAL {lookback}"))
    )
    return pages.join(e, cond, how).drop("e_host")
