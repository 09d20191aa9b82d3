"""Stateful stream-stream join (north_rule): page events ⋈ per-host
enrichment stream, flatMapGroupsWithState-style via applyInPandasWithState.

Two implementations, complementary:

1. ``watermarked_interval_join`` — Spark's NATIVE stream-stream join with a
   time-range condition. Both sides watermarked; the range bound lets Spark
   evict join state (SURVEY.md §7.4 item 4). Emits every enrichment row in
   the lookback interval — relational semantics, fully engine-managed state.

2. ``AsofEnrichJoin`` — CEP-style custom state: per host, keep a bounded
   buffer of the most recent enrichment rows; every page row is enriched
   with the latest enrichment at-or-before its warc_ts ("latest state
   wins"). This is the semantics the reference's topology implies but never
   implemented (it has no joins at all — SURVEY.md §2.4). State lives in the
   RocksDB state store; per-batch work is Arrow-batched pandas (no per-row
   Python boundary crossings).

The batch oracle for #2 is operators/asof_join.py (same semantics, window
function over a single shuffle).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

JOIN_OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("lang", StringType(), True),
        StructField("enrich_ts", TimestampType(), True),
        StructField("category", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)

# Bounded per-host buffer of recent enrichment rows (parallel arrays).
JOIN_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", ArrayType(LongType()), True),
        StructField("category", ArrayType(StringType()), True),
        StructField("score", ArrayType(DoubleType()), True),
    ]
)

MERGED_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("t", TimestampType(), False),
        StructField("is_page", LongType(), False),
        StructField("url", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("category", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)

MAX_STATE_ROWS = 64  # per-host enrichment history bound


def tag_and_merge(pages: DataFrame, enrichment: DataFrame) -> DataFrame:
    """Union the two sides into one tagged stream keyed by host.

    pages must already carry `host` (operators.windows.with_host).
    """
    p = pages.select(
        "host",
        F.col("warc_ts").alias("t"),
        F.lit(1).cast("long").alias("is_page"),
        "url",
        "lang",
        F.lit(None).cast("string").alias("category"),
        F.lit(None).cast("double").alias("score"),
    )
    e = enrichment.select(
        "host",
        F.col("ts").alias("t"),
        F.lit(0).cast("long").alias("is_page"),
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("string").alias("lang"),
        "category",
        "score",
    )
    return p.unionByName(e)


def _asof_join_fn(
    key: Tuple[str],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: int = 0,
) -> Iterator[pd.DataFrame]:
    host = key[0]
    if ttl_ms and state.hasTimedOut:
        # idle host: watermark passed last activity + TTL → evict state.
        # At 10^8 hosts this is what keeps RocksDB state bounded.
        state.remove()
        return
    if state.exists:
        ts_us, cats, scores = state.get
        ts_us, cats, scores = list(ts_us), list(cats), list(scores)
    else:
        ts_us, cats, scores = [], [], []

    # Materialize the group's whole micro-batch before touching state: Spark
    # gives no intra-group ordering across Arrow chunks, so folding chunk-by-
    # chunk would hide enrichment delivered in a later chunk from pages in an
    # earlier one (nondeterministic once a group spans >1 chunk). One concat
    # makes the batch semantics chunk-layout-independent: every page sees ALL
    # same-batch enrichment with enrich_ts <= warc_ts.
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    pdf = (
        pd.concat(chunks, ignore_index=True)
        if chunks
        else pd.DataFrame(columns=[f.name for f in MERGED_SCHEMA.fields])
    )

    max_seen_ms = 0
    if len(pdf):
        max_seen_ms = int(pdf["t"].astype("int64").max() // 1_000_000)
    # fold this batch's enrichment rows into state (sorted by ts)
    enr = pdf[pdf["is_page"] == 0]
    if len(enr):
        for t, c, s in zip(
            enr["t"].astype("int64") // 1000,  # ns → us
            enr["category"],
            enr["score"],
        ):
            ts_us.append(int(t))
            cats.append(None if pd.isna(c) else str(c))
            scores.append(None if pd.isna(s) else float(s))
        order = sorted(range(len(ts_us)), key=ts_us.__getitem__)
        ts_us = [ts_us[i] for i in order][-MAX_STATE_ROWS:]
        cats = [cats[i] for i in order][-MAX_STATE_ROWS:]
        scores = [scores[i] for i in order][-MAX_STATE_ROWS:]

    pages = pdf[pdf["is_page"] == 1]
    if len(pages):
        # vectorized as-of lookup: searchsorted over the sorted state
        import numpy as np

        st = np.asarray(ts_us, dtype="int64")
        pts = pages["t"].astype("int64").to_numpy() // 1000
        pos = np.searchsorted(st, pts, side="right") - 1
        hit = pos >= 0
        out = pd.DataFrame(
            {
                "host": host,
                "url": pages["url"].to_numpy(),
                "warc_ts": pages["t"].to_numpy(),
                "lang": pages["lang"].to_numpy(),
                "enrich_ts": pd.Series(
                    [
                        pd.Timestamp(ts_us[p] * 1000) if h else pd.NaT
                        for p, h in zip(pos, hit)
                    ]
                ),
                "category": [
                    cats[p] if h else None for p, h in zip(pos, hit)
                ],
                "score": [
                    scores[p] if h else None for p, h in zip(pos, hit)
                ],
            }
        )
        yield out

    state.update((ts_us, cats, scores))
    if ttl_ms and max_seen_ms:
        state.setTimeoutTimestamp(max_seen_ms + ttl_ms)


class AsofEnrichJoin:
    """Builder for the CEP-style as-of enrichment join."""

    @staticmethod
    def apply(
        merged: DataFrame,
        watermark: str = "1 hour",
        state_ttl_ms: int = 0,
    ) -> DataFrame:
        """merged = tag_and_merge(...) stream; returns enriched page rows.

        ``state_ttl_ms`` > 0 evicts a host's state once the watermark passes
        its last activity + TTL (EventTimeTimeout) — bounded state for
        unbounded host cardinality. 0 keeps state forever (small keyspaces).
        """
        wm = merged.withWatermark("t", watermark)
        if state_ttl_ms:
            fn = lambda key, it, st: _asof_join_fn(key, it, st, state_ttl_ms)  # noqa: E731
            timeout = GroupStateTimeout.EventTimeTimeout
        else:
            fn = _asof_join_fn
            timeout = GroupStateTimeout.NoTimeout
        return wm.groupBy("host").applyInPandasWithState(
            fn,
            outputStructType=JOIN_OUTPUT_SCHEMA,
            stateStructType=JOIN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )


def watermarked_interval_join(
    pages: DataFrame,
    enrichment: DataFrame,
    page_watermark: str = "30 minutes",
    enrich_watermark: str = "30 minutes",
    lookback: str = "1 hour",
) -> DataFrame:
    """Native watermarked stream-stream join, time-range bounded.

    Batch oracle: operators/asof_join.py:interval_join (identical plan shape).
    """
    p = pages.withWatermark("warc_ts", page_watermark)
    e = (
        enrichment.withWatermark("ts", enrich_watermark)
        .select(
            F.col("host").alias("e_host"),
            F.col("ts").alias("enrich_ts"),
            "category",
            "score",
        )
    )
    cond = (
        (p["host"] == e["e_host"])
        & (e["enrich_ts"] <= p["warc_ts"])
        & (e["enrich_ts"] >= p["warc_ts"] - F.expr(f"INTERVAL {lookback}"))
    )
    return p.join(e, cond, "inner").drop("e_host")
