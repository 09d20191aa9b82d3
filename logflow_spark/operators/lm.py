"""Corpus-frequency commonness scoring — the integer-exact proxy for
LM-perplexity quality filtering.

CCNet/C4-style pipelines score documents with a language-model perplexity
and drop the tails. The cheap first-stage proxy is a UNIGRAM corpus model:
documents whose tokens are mostly rare in the corpus (OOV-heavy, garbled,
boilerplate-coded) score low, stopword-rich running prose scores high.
This operator computes, per document,

    commonness_e6 = floor( 1e6 * mean(corpus_count(token)) )
    rare_frac_e6  = floor( 1e6 * |{tokens with corpus_count <= r}| / n )

as exact bigints — a true unigram log-prob needs transcendental log(),
whose last-ulp differences across engines (Java StrictMath vs C libm)
break exact cross-engine comparison; the count-mean and rare-token
fraction carry the same ranking signal with integer-only arithmetic (all
intermediates < 2^53 → exact in both engines). A production deployment
can add `F.log` of the same counts on top — the plan shape is unchanged.

Scale shape (10^12 docs): two shuffles, both with map-side partials —
(1) corpus vocab aggregation on token, (2) re-aggregation by doc id after
the occurrence→vocab equi-join. The vocab side of the join is naturally
co-partitioned by the same token key Catalyst just aggregated on, so no
extra exchange is inserted for it. Token OCCURRENCES (not docs) dominate
the join input; at web scale cap the vocab with min_count to keep the
long unigram tail (hapaxes ≈ half the vocab) out of the join — dropped
tokens are exactly the `corpus_count <= r` set the rare-fraction already
counts, so the score semantics stay closed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logflow_spark.operators.textstats import SQL_JAVA_WS, tokens_col


def token_commonness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_threshold: int = 2,
) -> DataFrame:
    """(doc_id, n_tokens, commonness_e6, rare_frac_e6) — exact bigints.

    Empty documents are excluded (no tokens → no distribution to score);
    the curation gate's min_tokens drops them anyway.
    """
    occ = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("token")
    )
    vocab = occ.groupBy("token").agg(F.count(F.lit(1)).alias("corpus_count"))
    scored = (
        occ.join(vocab, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("corpus_count").alias("_sum_c"),
            F.sum(
                F.when(F.col("corpus_count") <= rare_threshold, 1).otherwise(0)
            ).alias("_n_rare"),
        )
    )
    return scored.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(F.col("_sum_c") * 1_000_000 / F.col("n_tokens"))
        .cast("long")
        .alias("commonness_e6"),
        F.floor(F.col("_n_rare") * 1_000_000 / F.col("n_tokens"))
        .cast("long")
        .alias("rare_frac_e6"),
    )


def sql_token_commonness(
    table: str = "documents", rare_threshold: int = 2
) -> str:
    """DuckDB twin (same integer arithmetic, same explicit Java-\\s class)."""
    toks = (
        f"list_filter(regexp_split_to_array(text, '[{SQL_JAVA_WS}]+'),"
        " x -> x <> '')"
    )
    return f"""
WITH occ AS (
  SELECT doc_id, unnest({toks}) AS token FROM {table}
),
vocab AS (SELECT token, count(*) AS corpus_count FROM occ GROUP BY token),
scored AS (
  SELECT doc_id, count(*) AS n_tokens, sum(corpus_count) AS sum_c,
         sum(CASE WHEN corpus_count <= {rare_threshold} THEN 1 ELSE 0 END) AS n_rare
  FROM occ JOIN vocab USING (token)
  GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(sum_c * 1000000 / n_tokens) AS BIGINT) AS commonness_e6,
       CAST(floor(n_rare * 1000000 / n_tokens) AS BIGINT) AS rare_frac_e6
FROM scored
"""
