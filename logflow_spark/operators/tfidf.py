"""Per-group distinctive-term ranking — fully JVM-side.

Token counting and the document-frequency join are one shuffle each; the
per-group top-k is a ``row_number()`` window + filter, which stays inside
whole-stage codegen (top-k per group IS SQL-expressible — per SURVEY §2.13
the grouped-map Arrow surface is reserved for ops a built-in can't express;
that surface now lives in ``operators/packing.py pack_sequences_ffd``).

Scoring is rational-number "TF-IDF without the log" so the DuckDB oracle is
bit-exact: score_e6 = tf * n_groups * 1_000_000 // df (integer arithmetic;
a float idf would risk cross-engine ulp differences flipping ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logflow_spark.functions.joins import broadcast_singleton_join
from logflow_spark.operators.textstats import tokens_col


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
    w = Window.partitionBy("source").orderBy(
        F.desc("score_e6"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("source", "token", "rank", "score_e6")
    )
