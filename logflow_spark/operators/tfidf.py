"""Per-group distinctive-term ranking via grouped-map applyInPandas.

Covers the grouped-map UDF surface (SURVEY §2.13): token counting and the
document-frequency join stay JVM-side (one shuffle each); only the per-group
top-k ranking — genuinely per-group imperative logic — crosses into pandas,
receiving one (group → pandas frame) at a time through Arrow.

Scoring is rational-number "TF-IDF without the log" so the DuckDB oracle is
bit-exact: score_e6 = tf * n_groups * 1_000_000 // df (integer arithmetic;
a float idf would risk cross-engine ulp differences flipping ranks).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from logflow_spark.functions.joins import broadcast_singleton_join
from logflow_spark.operators.textstats import tokens_col

TOPK_SCHEMA = StructType(
    [
        StructField("source", StringType(), False),
        StructField("token", StringType(), False),
        StructField("rank", LongType(), False),
        StructField("score_e6", LongType(), False),
    ]
)


def top_terms_per_source(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k tokens per group by tf * (n_groups/df), ties → token asc."""
    toks = df.select(
        F.col(group_col).alias("source"),
        F.explode(tokens_col(text_col)).alias("token"),
    )
    tf = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        toks.select("source", "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # group count stays inside the plan (broadcast of a 1-row agg) — a
    # driver-side .count() here would force an extra blocking job per call
    # and break single-DAG composition; broadcast_singleton_join keeps the
    # 1-row attach a BroadcastHashJoin (no BNLJ in any servable plan).
    ng = df.agg(F.count_distinct(group_col).alias("n_groups"))
    scored = (
        broadcast_singleton_join(tf.join(dfreq, "token"), ng)
        .withColumn(
            "score_e6",
            # explicit floor: Spark's double→long cast truncates but DuckDB's
            # rounds — floor() agrees in both (operands stay < 2^53, exact)
            F.floor(
                F.col("tf") * F.col("n_groups") * F.lit(1_000_000) / F.col("df")
            ).cast("long"),
        )
        .drop("n_groups")
    )

    def rank(pdf: pd.DataFrame) -> pd.DataFrame:
        top = pdf.sort_values(
            ["score_e6", "token"], ascending=[False, True], kind="mergesort"
        ).head(k)
        top = top.reset_index(drop=True)
        top["rank"] = (top.index + 1).astype("int64")
        return top[["source", "token", "rank", "score_e6"]]

    return scored.groupBy("source").applyInPandas(rank, schema=TOPK_SCHEMA)
