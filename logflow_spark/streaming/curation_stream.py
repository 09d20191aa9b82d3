"""Streaming corpus curation — the online composition of the batch
curation pipeline (operators/curation.py), shaped for ingest-time use:

    stream → per-doc profile (digest / tokens / lang-ID / quality, all
    map-side JVM expressions from operators/textstats) → quality + language
    gate (BEFORE dedup: rejected rows never enter keyed state) → exact
    first-wins dedup via dropDuplicatesWithinWatermark (bounded state: one
    16-byte digest per doc inside the watermark horizon, evicted after) →
    exactly-once sink.

Emitted columns are pure functions of the document text, so the output set
is deterministic even though WHICH physical duplicate row wins is an
arrival-order artifact — the same contract as streaming_distinct_digests.

At 10^12 docs/day the gate typically rejects 40-70% of a web crawl before
the dedup shuffle, which is why it sits upstream of the stateful operator:
state size and shuffle volume scale with SURVIVORS, not arrivals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logflow_spark.operators.dedup import md5_60bit
from logflow_spark.operators.textstats import (
    profile_score_cols,
    staged_profile_exprs,
    tokens_col,
)


def streaming_curate(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "73 hours",
    min_quality_e6: int = 450_000,
    min_tokens: int = 30,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Kept-document stream: (digest, n_tokens, lang_pred, quality_e6).

    ``langs=None`` skips the language gate (the synthetic pages corpus is
    stopword-free word soup → every doc scores 'und'); pass a tuple to
    enforce an allowlist as curate_corpus does.
    """
    # stage the token array once; the profile expressions reuse it instead
    # of re-splitting the text per derived column (textstats staging note)
    exprs = staged_profile_exprs(text_col)
    profiled = stream_df.select(
        F.col(ts_col), F.col(text_col), tokens_col(text_col).alias("_toks")
    ).select(
        F.col(ts_col),
        F.col(text_col),
        F.col("_toks"),
        *[c.alias(n) for n, c in profile_score_cols().items()],
    ).select(
        F.col(ts_col),
        md5_60bit(F.col(text_col)).alias("digest"),
        exprs["n_tokens"].alias("n_tokens"),
        exprs["lang_pred"].alias("lang_pred"),
        exprs["quality_e6"].alias("quality_e6"),
    ).filter(F.col("digest").isNotNull())
    gated = profiled.filter(
        (F.col("quality_e6") >= min_quality_e6) & (F.col("n_tokens") >= min_tokens)
    )
    if langs is not None:
        gated = gated.filter(F.col("lang_pred").isin(list(langs)))
    return (
        gated.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
        .select("digest", "n_tokens", "lang_pred", "quality_e6")
    )
