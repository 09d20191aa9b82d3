"""Streaming benchmark decontamination — the ingest-time twin of
operators/decontam.decontaminate, shaped so a crawl is scored against the
eval set AS IT ARRIVES instead of by a later batch sweep.

Topology (everything before the final aggregation is stateless):

    stream → per-row lowercased word n-gram hash ARRAY (staged JVM
    expressions, distinct within the row, a -1 dummy element guarantees
    short docs still emit) → explode → stream-static LEFT join against the
    broadcast eval-gram set (the eval side is tiny by construction — see
    the batch module's scale notes; the corpus never shuffles to meet it)
    → watermarked tumbling-window + doc aggregation counting hits.

The windowed aggregation exists only to re-collapse the exploded grams to
one row per document under append-mode semantics: a document's grams all
carry its single ingest_ts, so it lands in exactly one (window, doc)
group, and the fixture's far-future flush sentinel advances the watermark
past every data window (the sentinel's OWN window stays open forever, so
it never reaches the sink — by construction, not by filter).

State per group is one partial sum — bytes, not grams; at 10^12 docs/day
the state store holds only the windows inside the watermark horizon.

Output (doc_id, lang, n_hits, contaminated) matches the batch operator's
per-document report (n_hits = DISTINCT shared n-grams: the row-local
array_distinct before explode makes the streaming-legal sum() equal the
batch countDistinct — streaming aggs cannot use count(DISTINCT)).

Reference has no decontamination; part of the training-data surface the
engine adds (README §extras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logflow_spark.operators.dedup import md5_60bit
from logflow_spark.operators.textstats import tokens_col


def streaming_decontaminate(
    stream_df: DataFrame,
    bench_hashes: DataFrame,
    id_col: str = "doc_id",
    ts_col: str = "ingest_ts",
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 8,
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Per-document contamination report stream.

    ``bench_hashes``: STATIC frame with one ``gh`` (md5-60bit lowercased
    n-gram hash) column — e.g. decontam._gram_hashes(eval_snippets(...)).
    Gram construction is expression-identical to the batch operator
    (lowercase whitespace tokens, space-joined n-grams, md5-60bit).
    """
    toks = F.transform(tokens_col(text_col), F.lower)
    s1 = stream_df.select(
        F.col(id_col), F.col(ts_col), F.col(lang_col), toks.alias("_tk")
    )
    # staged projections: _tk then _gr are attributes when consumed
    # element-wise, so nothing non-cheap re-evaluates per element
    # (dedup.shingles_df staging note)
    idxs = F.when(
        F.size("_tk") >= n, F.sequence(F.lit(0), F.size("_tk") - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idxs, lambda i: F.concat_ws(" ", F.slice(F.col("_tk"), i + 1, n))
    )
    s2 = s1.select(F.col(id_col), F.col(ts_col), F.col(lang_col), grams.alias("_gr"))
    gh_arr = F.array_union(
        F.array(F.lit(-1).cast("long")),  # never a real md5-60bit (>= 0)
        F.array_distinct(F.transform(F.col("_gr"), lambda g: md5_60bit(g))),
    )
    exploded = s2.select(
        F.col(id_col), F.col(ts_col), F.col(lang_col), gh_arr.alias("_gh")
    ).select(
        F.col(id_col), F.col(ts_col), F.col(lang_col),
        F.explode("_gh").alias("gh"),
    )
    marked = exploded.join(
        F.broadcast(
            bench_hashes.select("gh").distinct().withColumn("_hit", F.lit(1))
        ),
        "gh",
        "left",
    )
    # Round 6: non-hit gram rows contribute nothing to sum(_hit) and every
    # document's presence is already guaranteed by its -1 dummy row (same
    # ts → same group), so drop them BEFORE the windowed aggregation. The
    # agg's shuffle and its state-store writes shrink from one row per
    # corpus gram (~tokens x docs) to one row per doc plus one per actual
    # eval hit — contamination is rare by construction, so that is ~docs.
    # Output-identical: sum over fewer all-null rows, same groups.
    marked = marked.filter(F.col("_hit").isNotNull() | (F.col("gh") == -1))
    agg = (
        marked.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), F.col(id_col), F.col(lang_col))
        .agg(F.sum("_hit").alias("_h"))
    )
    return agg.select(
        F.col(id_col),
        F.col(lang_col),
        F.coalesce(F.col("_h"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("_h"), F.lit(0)) > 0).alias("contaminated"),
    )
