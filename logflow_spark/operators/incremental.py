"""Incremental deduplication: verdict a NEW ingest batch against the
EXISTING corpus without re-clustering the corpus.

Production crawl pipelines never re-dedup 100 TB when a day's ingest
arrives; they keep two indexes over the accumulated corpus — an exact
content-digest index and an LSH band→bucket index — and join the (small)
new batch against them. This operator expresses that join-shape in one
plan: the "existing corpus" vs "new batch" split is derived here from a
deterministic id hash (``mod``/``bucket``) so tests and oracles are
reproducible; production passes two real tables and materializes the two
index frames as Iceberg tables that the exactly-once sink appends to.

Scale shape:

- Exact: digest-equality join, 8-byte keys, batch side tiny → AQE
  broadcasts it; the corpus never shuffles its text.
- Near: minhash signatures are computed ONCE over the union (one shuffle,
  output-sized — see dedup.minhash_signatures), then the batch's band keys
  join the corpus bucket index per (band, bucket) — linear-ish in bucket
  collisions, never batch × corpus.
- Verify: exact shingle-Jaccard on the surviving candidate pairs only
  (dedup.jaccard_pairs with ``candidates=``), so the quadratic step is
  bounded by the LSH hit count.

Oracle note: the DuckDB twin states near-dups as ALL batch↔corpus pairs
with exact Jaccard >= threshold; parity therefore relies on the (16-hash,
8x2-band) LSH catching every such pair in this corpus — the same property
the minhash_dedup_pairs oracle rests on, asserted empirically in
tests/test_dedup_similarity.py (planted pairs sit at j ≈ 0.97 where the
detection probability is ≈ 1-3e-10).

Reference has no incremental dedup; this is part of the training-data
surface the engine adds (README §extras).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logflow_spark.operators.dedup import (
    BAND_ROWS,
    N_BANDS,
    jaccard_pairs,
    md5_60bit,
    minhash_signatures,
)


def _is_new(id_col: str, mod: int, bucket: int) -> Column:
    return (md5_60bit(F.col(id_col).cast("string")) % mod) == bucket


def incremental_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mod: int = 10,
    bucket: int = 0,
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Deterministic-split form: the ``mod``/``bucket`` id-hash carves the
    batch out of one table (the reproducible shape tests and oracles use).
    See incremental_dedup_frames for the two-table production form."""
    tagged = df.withColumn("_new", _is_new(id_col, mod, bucket))
    return _incremental_dedup_tagged(tagged, id_col, text_col, threshold, n)


def incremental_dedup_frames(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
) -> DataFrame:
    """Two-table production form: verdict every ``batch`` doc against
    ``corpus``. Ids must be disjoint across the two tables (they are
    distinct ingest generations of one corpus)."""
    tagged = batch.select(id_col, text_col).withColumn(
        "_new", F.lit(True)
    ).unionByName(
        corpus.select(id_col, text_col).withColumn("_new", F.lit(False))
    )
    return _incremental_dedup_tagged(tagged, id_col, text_col, threshold, n)


def _incremental_dedup_tagged(
    tagged: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n: int,
) -> DataFrame:
    """Per-batch-doc verdict: (id, verdict, dup_of).

    verdict ∈ {'exact_dup', 'near_dup', 'new'} — exact (identical text in
    the corpus) takes precedence; dup_of is the minimum matching corpus id,
    -1 for genuinely new documents. Batch-internal duplicates are NOT
    flagged (they are the next batch's corpus); compose with exact_dedup
    on the batch alone for that.
    """
    df = tagged
    dig = tagged.select(
        F.col(id_col), F.col("_new"), md5_60bit(F.col(text_col)).alias("dg")
    )
    exact = (
        dig.filter(F.col("_new"))
        .select(id_col, "dg")
        .join(
            dig.filter(~F.col("_new")).select(
                F.col(id_col).alias("_cid"), "dg"
            ),
            "dg",
        )
        .groupBy(id_col)
        .agg(F.min("_cid").alias("_exact_of"))
    )

    # one signature pass over the union; band keys from the SAME 8x2 layout
    # as the batch LSH path (dedup.lsh_candidate_pairs)
    sigs = minhash_signatures(tagged, id_col, text_col, n).join(
        tagged.select(id_col, "_new"), id_col
    )
    banded = sigs.select(
        F.col(id_col),
        F.col("_new"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.col(f"mh_{b * BAND_ROWS + r}")
                                for r in range(BAND_ROWS)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "_new", "bb.band", "bb.bucket").persist()
    # ^ persisted: referenced by both sides of the band join below
    cand = (
        banded.filter(F.col("_new"))
        .select(F.col(id_col).alias("_bid"), "band", "bucket")
        .join(
            banded.filter(~F.col("_new")).select(
                F.col(id_col).alias("_cid"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .select("_bid", "_cid")
        .distinct()
        .persist()
    )
    norm = cand.select(
        F.least("_bid", "_cid").alias("id_a"),
        F.greatest("_bid", "_cid").alias("id_b"),
    ).distinct()
    verified = jaccard_pairs(
        df, id_col, text_col, n=n, threshold=threshold, candidates=norm
    )
    near = (
        verified.join(
            cand.select(
                F.least("_bid", "_cid").alias("id_a"),
                F.greatest("_bid", "_cid").alias("id_b"),
                "_bid",
                "_cid",
            ),
            ["id_a", "id_b"],
        )
        .groupBy("_bid")
        .agg(F.min("_cid").alias("_near_of"))
        .withColumnRenamed("_bid", id_col)
    )
    out = (
        tagged.filter(F.col("_new"))
        .select(id_col)
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("_exact_of").isNotNull(), F.lit("exact_dup"))
            .when(F.col("_near_of").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
            F.coalesce(F.col("_exact_of"), F.col("_near_of"), F.lit(-1))
            .cast("long")
            .alias("dup_of"),
        )
    )
    # persisted frames above are released by the caller's per-query
    # spark.catalog.clearCache() (house protocol — see ADVICE r4 fix)
    return out


# ---------------------------------------------------------------------------
# DuckDB twin (kept adjacent so drift is visible in review)
# ---------------------------------------------------------------------------

def sql_incremental_dedup(
    jaccard_base_sql: str,
    table: str = "documents",
    mod: int = 10,
    bucket: int = 0,
) -> str:
    """``jaccard_base_sql`` is the entry file's shared exact-Jaccard pair
    query (id_a, id_b, jacc_e6 at the operator threshold) — passed in so
    the two stay literally identical."""
    hid = (
        "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
        " AS UBIGINT)::BIGINT"
    )
    hdg = "CAST(('0x' || substring(md5(text), 1, 15)) AS UBIGINT)::BIGINT"
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, text, {hid} % {mod} = {bucket} AS is_new FROM {table}),
dig AS (SELECT doc_id, is_new, {hdg} AS dg FROM base),
exact AS (SELECT b.doc_id, min(c.doc_id) AS dup_of
          FROM dig b JOIN dig c ON b.dg = c.dg AND b.is_new AND NOT c.is_new
          GROUP BY b.doc_id),
pairs AS MATERIALIZED ({jaccard_base_sql}),
sided AS (
  SELECT p.id_a AS bid, p.id_b AS cid FROM pairs p
    JOIN base x ON x.doc_id = p.id_a
    JOIN base y ON y.doc_id = p.id_b
  WHERE x.is_new AND NOT y.is_new
  UNION ALL
  SELECT p.id_b, p.id_a FROM pairs p
    JOIN base x ON x.doc_id = p.id_a
    JOIN base y ON y.doc_id = p.id_b
  WHERE y.is_new AND NOT x.is_new),
near AS (SELECT bid AS doc_id, min(cid) AS dup_of FROM sided GROUP BY bid)
SELECT b.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'new' END AS verdict,
       CAST(coalesce(e.dup_of, nr.dup_of, -1) AS BIGINT) AS dup_of
FROM base b
LEFT JOIN exact e USING (doc_id)
LEFT JOIN near nr USING (doc_id)
WHERE b.is_new
"""
