"""Sequence packing for LLM training: concatenate documents in a
deterministic order and cut the token stream into fixed-length context
windows (GPT-style concat-and-chunk), reporting each document's span.

Scale shape: a single global concatenation order needs a global running
sum — an orderBy-without-partitionBy window, which Spark executes in ONE
task (the classic packing scale-killer). Instead documents are hashed into
``n_shards`` independent shards and packed within each shard: the window
is partitioned by shard, so the cumulative sums run as ``n_shards``
parallel streams after one shuffle. That is also what a real training
pipeline does — each data-loader worker packs its own shard; there is no
global order requirement, only determinism, which (shard = doc_id mod S,
order by doc_id) provides at any cluster size / partition layout.

Output: one row per non-empty document with its token span in the shard's
stream and the first/last context-window index it lands in — everything a
downstream chunk-builder needs to cut windows without re-tokenizing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from logflow_spark.operators.textstats import token_count_ws


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """(shard, id, n_tokens, start_off, end_off, chunk_first, chunk_last).

    Offsets are 0-based token positions in the shard's concatenated stream;
    chunk_k = floor(offset / seq_len). A doc crossing a window boundary
    spans chunk_first..chunk_last (training-time choice of split vs drop is
    downstream policy). Empty docs are excluded — they occupy no tokens.
    """
    staged = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        token_count_ws(text_col).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum("n_tokens").over(w)
    return staged.select(
        "shard",
        F.col(id_col),
        "n_tokens",
        (end - F.col("n_tokens")).cast("long").alias("start_off"),
        end.cast("long").alias("end_off"),
        F.floor((end - F.col("n_tokens")) / seq_len).cast("long").alias("chunk_first"),
        F.floor((end - 1) / seq_len).cast("long").alias("chunk_last"),
    )


FFD_SCHEMA = StructType(
    [
        StructField("shard", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("bin_id", LongType(), False),
        StructField("bin_fill", LongType(), False),
    ]
)


def pack_sequences_ffd(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """First-fit-decreasing bin packing per shard (grouped-map Arrow UDF).

    Unlike ``pack_sequences`` (concat-and-chunk: documents may straddle a
    window boundary), FFD packs each document WHOLE into the first bin with
    room, visiting docs by (n_tokens desc, doc_id asc) — far fewer padding
    tokens, the classic separator-free packing used for SFT-style training
    data. The greedy first-fit scan is inherently sequential per shard (bin
    state mutates at every step) — NOT expressible as window/agg SQL — so
    it is the repo's genuine grouped-map ``applyInPandas`` surface (SURVEY
    §2.13): one Arrow batch per shard, everything upstream (tokenize,
    shard, filter) JVM-side.

    Docs longer than ``seq_len`` get a singleton oversized bin (downstream
    truncation policy). ``bin_fill`` is the final fill of the doc's bin,
    replicated per member row. Deterministic at any parallelism: shard
    assignment and visit order depend only on ids and token counts.

    Output: (shard, doc_id, n_tokens, bin_id, bin_fill).
    """
    staged = df.select(
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        token_count_ws(text_col).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        fills: list[int] = []
        bin_ids: list[int] = []
        for n in pdf["n_tokens"].astype("int64"):
            n = int(n)
            placed = -1
            for b, fill in enumerate(fills):
                if fill + n <= seq_len:
                    placed = b
                    break
            if placed < 0:
                placed = len(fills)
                fills.append(0)
            fills[placed] += n
            bin_ids.append(placed)
        out = pdf.copy()
        out["bin_id"] = pd.array(bin_ids, dtype="int64")
        out["bin_fill"] = out["bin_id"].map(lambda b: fills[b]).astype("int64")
        return out[["shard", "doc_id", "n_tokens", "bin_id", "bin_fill"]]

    return staged.groupBy("shard").applyInPandas(pack, schema=FFD_SCHEMA)


# ---------------------------------------------------------------------------
# DuckDB twin
# ---------------------------------------------------------------------------

def sql_pack_sequences_ffd(
    table: str = "documents", seq_len: int = 512, n_shards: int = 8
) -> str:
    """EXACT DuckDB twin of ``pack_sequences_ffd`` — the greedy first-fit
    scan is sequential per shard, but a recursive CTE can REPLAY it
    deterministically: the recursion steps one document per shard per
    iteration in the same (n_tokens desc, doc_id asc) visit order,
    carrying the bin-fill array as list state; the first-fit probe is a
    two-arg-lambda list scan (first index whose fill + n ≤ seq_len).
    Recursion depth = max docs per shard — fine at oracle SFs, which is all
    an oracle needs. This closes the one `no_oracle` driver row (round-3
    verdict #8): the operator's output is now hash-compared cross-engine,
    not just property-tested against the Python replay."""
    from logflow_spark.operators.textstats import SQL_JAVA_WS

    toks = (
        f"len(list_filter(regexp_split_to_array(text, '[{SQL_JAVA_WS}]+'),"
        " x -> x <> ''))"
    )
    return f"""
WITH RECURSIVE staged AS (
  SELECT doc_id % {n_shards} AS shard, doc_id, {toks} AS n_tokens FROM {table}
),
ordered AS (
  SELECT shard, doc_id, n_tokens,
         row_number() OVER (PARTITION BY shard ORDER BY n_tokens DESC, doc_id) AS rn
  FROM staged WHERE n_tokens > 0
),
ffd AS (
  SELECT shard, 0 AS rn, CAST([] AS BIGINT[]) AS fills, CAST([] AS BIGINT[]) AS bins
  FROM (SELECT DISTINCT shard FROM ordered)
  UNION ALL
  SELECT f.shard, f.rn + 1,
    CASE WHEN fit.pos IS NULL THEN list_append(f.fills, o.n_tokens)
         ELSE list_transform(f.fills, (x,i) -> CASE WHEN i = fit.pos THEN x + o.n_tokens ELSE x END)
    END AS fills,
    list_append(f.bins, CAST(coalesce(fit.pos, len(f.fills) + 1) - 1 AS BIGINT)) AS bins
  FROM ffd f
  JOIN ordered o ON o.shard = f.shard AND o.rn = f.rn + 1
  LEFT JOIN LATERAL (
    SELECT list_filter(list_transform(f.fills,
             (x,i) -> CASE WHEN x + o.n_tokens <= {seq_len} THEN i ELSE NULL END),
           y -> y IS NOT NULL)[1] AS pos
  ) fit ON TRUE
),
final AS (
  SELECT f.shard AS shard, f.fills AS fills, f.bins AS bins
  FROM ffd f JOIN (SELECT shard, max(rn) AS n FROM ordered GROUP BY shard) c
    ON c.shard = f.shard AND f.rn = c.n
)
SELECT o.shard AS shard, o.doc_id AS doc_id, CAST(o.n_tokens AS BIGINT) AS n_tokens,
       fin.bins[o.rn] AS bin_id,
       fin.fills[fin.bins[o.rn] + 1] AS bin_fill
FROM ordered o JOIN final fin ON fin.shard = o.shard
"""


def sql_pack_sequences(
    table: str = "documents", seq_len: int = 512, n_shards: int = 8
) -> str:
    from logflow_spark.operators.textstats import SQL_JAVA_WS

    toks = (
        f"len(list_filter(regexp_split_to_array(text, '[{SQL_JAVA_WS}]+'),"
        " x -> x <> ''))"
    )
    return f"""
WITH staged AS (
  SELECT doc_id, doc_id % {n_shards} AS shard, {toks} AS n_tokens
  FROM {table}
),
packed AS (
  SELECT shard, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS end_off
  FROM staged WHERE n_tokens > 0
)
SELECT CAST(shard AS BIGINT) AS shard, doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(end_off - n_tokens AS BIGINT) AS start_off,
       CAST(end_off AS BIGINT) AS end_off,
       CAST(floor((end_off - n_tokens) / {seq_len}) AS BIGINT) AS chunk_first,
       CAST(floor((end_off - 1) / {seq_len}) AS BIGINT) AS chunk_last
FROM packed
"""
