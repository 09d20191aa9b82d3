"""Benchmark decontamination: flag training documents whose text overlaps
an evaluation set by shared word n-grams (the GPT-3/Llama-style 13-gram
decontamination pass, run here with configurable n).

Scale shape (the part that must survive 100 TB):

- The EVAL side is tiny (benchmarks are thousands of documents, not
  billions). Its distinct n-gram hash set is broadcast — the corpus side
  never shuffles to meet it.
- The CORPUS side explodes to (doc_id, gram_hash) WITHOUT a distinct:
  de-duplicating the full gram stream would shuffle ~tokens × 8 B per doc.
  Instead the broadcast join FILTERS first; `count(DISTINCT hash)` runs on
  the surviving hits only (contamination is rare by construction), so the
  one shuffle in the plan moves hit rows, not the corpus.
- Output is one row per input document (left join on the tiny hit set), so
  the operator composes with curation gates downstream.

Hashes are md5-60-bit (dedup.md5_60bit) over lowercase whitespace-token
n-grams — identical construction on the DuckDB oracle side, so overlap
counts are pinned cross-engine. Reference has no decontamination operator;
this is part of the training-data surface the engine adds (README §extras).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logflow_spark.operators.dedup import md5_60bit, shingles_df
from logflow_spark.operators.textstats import tokens_col


def _gram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gh): one row per word n-gram occurrence, lowercased, md5-60bit.

    Reuses dedup.shingles_df (same short-doc guard + staged-token plan);
    no distinct here — see module docstring (the consumer filters first).
    """
    grams = shingles_df(df, id_col, text_col, n=n, distinct=False, lowercase=True)
    return grams.select(F.col(id_col), md5_60bit(F.col("shingle")).alias("gh"))


def eval_snippets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    every: int = 29,
    first_tokens: int = 30,
) -> DataFrame:
    """Deterministic stand-in eval set: every ``every``-th doc's first
    ``first_tokens`` tokens. Exists so tests/oracles can derive a benchmark
    with guaranteed corpus overlap from the corpus itself; production use
    passes a real benchmark table to ``decontaminate`` instead."""
    toks = F.transform(tokens_col(text_col), F.lower)
    return docs.filter(F.col(id_col) % every == 0).select(
        F.col(id_col).alias("eval_id"),
        F.concat_ws(" ", F.slice(toks, 1, first_tokens)).alias("eval_text"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "eval_id",
    bench_text_col: str = "eval_text",
    n: int = 8,
) -> DataFrame:
    """Per-document benchmark-overlap report: (id, n_hits, contaminated).

    n_hits = number of DISTINCT word n-grams the document shares with the
    benchmark set; contaminated = n_hits > 0. One output row per input doc.
    """
    bench_hashes = (
        _gram_hashes(bench, bench_id_col, bench_text_col, n)
        .select("gh")
        .distinct()
    )
    hits = (
        _gram_hashes(docs, id_col, text_col, n)
        .join(F.broadcast(bench_hashes), "gh")
        .groupBy(id_col)
        .agg(F.countDistinct("gh").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB twin (kept adjacent so drift is visible in review)
# ---------------------------------------------------------------------------

def sql_decontaminate(
    table: str = "documents", every: int = 29, first_tokens: int = 30, n: int = 8
) -> str:
    from logflow_spark.operators.textstats import SQL_JAVA_WS

    toks = (
        f"list_filter(regexp_split_to_array(lower(text), '[{SQL_JAVA_WS}]+'),"
        " x -> x <> '')"
    )
    gram = f"array_to_string(toks[i+1:i+{n}], ' ')"
    h = "CAST(('0x' || substring(md5(g), 1, 15)) AS UBIGINT)::BIGINT"
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS toks FROM {table}),
bench_tok AS (
  SELECT doc_id, toks[1:{first_tokens}] AS toks FROM tok WHERE doc_id % {every} = 0
),
bench AS (
  SELECT DISTINCT {h} AS gh
  FROM (SELECT {gram} AS g
        FROM bench_tok, unnest(range(greatest(len(toks)-{n - 1}, 0))) AS t(i))
),
grams AS (
  SELECT doc_id, {h} AS gh
  FROM (SELECT doc_id, {gram} AS g
        FROM tok, unnest(range(greatest(len(toks)-{n - 1}, 0))) AS t(i))
),
hits AS (
  SELECT doc_id, count(DISTINCT gh) AS n_hits
  FROM grams JOIN bench USING (gh) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM {table} d LEFT JOIN hits h USING (doc_id)
"""
