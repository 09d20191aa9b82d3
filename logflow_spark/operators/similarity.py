"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. The query side is broadcast (it is
  small by construction); the corpus side is scanned once, partition-local
  top-k via TakeOrderedAndProject per query — no corpus shuffle.
- lsh_topk: random-hyperplane LSH — corpus and queries hashed to sign-bit
  buckets; candidates share a bucket in ≥1 of n_tables tables. This is the
  10^12-row path: the join is bucket-co-partitioned, never all-pairs.

Hyperplanes are generated from a fixed seed (deterministic across runs and
engines' retries). Dot products run JVM-side via zip_with/aggregate in
double precision, sequential order — bit-identical to the DuckDB oracle's
list_dot_product on the same values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from logflow_spark.functions.joins import broadcast_singleton_join


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def cosine_cols(va: str = "va", vb: str = "vb"):
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    na = F.sqrt(F.aggregate(va, F.lit(0.0), lambda a, x: a + x * x))
    nb = F.sqrt(F.aggregate(vb, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (na * nb)


def score_pairs_arrow(
    df: DataFrame,
    id_a: str = "query_id",
    id_b: str = "neighbor_id",
    va: str = "v_q",
    vb: str = "v_n",
) -> DataFrame:
    """(id_a, id_b, cos): exact cosine per attached vector pair, vectorized.

    Replays the JVM fold of ``cosine_cols`` — acc = acc + x_d*y_d in array
    order, then dot/(sqrt(na)*sqrt(nb)) with the same association, all in
    float64 — vectorized across the Arrow batch instead of across dims, so
    the result is bit-equal to the interpreted expression while running
    ~10x faster (interpreted higher-order folds never enter codegen; the
    CLAUDE.md round-5 note measured the same 3.5x+ gap on the streaming
    signature chain). Only candidate rows cross the Python boundary, and
    only their two vectors + ids."""
    import pyarrow as pa

    def _mat(col, n):
        # zero-copy: ListArray values -> (n, dim) view (flatten() respects
        # offsets; to_pylist() here cost more than the math it fed)
        arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False
        )
        return flat.reshape(n, -1)

    def gen(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ma = _mat(b.column(va), n)
            mb = _mat(b.column(vb), n)
            dot = np.zeros(n, dtype=np.float64)
            na_ = np.zeros(n, dtype=np.float64)
            nb_ = np.zeros(n, dtype=np.float64)
            for d in range(ma.shape[1]):
                dot = dot + ma[:, d] * mb[:, d]
                na_ = na_ + ma[:, d] * ma[:, d]
                nb_ = nb_ + mb[:, d] * mb[:, d]
            cos = dot / (np.sqrt(na_) * np.sqrt(nb_))
            yield pa.RecordBatch.from_arrays(
                [b.column(id_a), b.column(id_b), pa.array(cos, type=pa.float64())],
                names=[id_a, id_b, "cos"],
            )

    return df.select(id_a, id_b, va, vb).mapInArrow(
        gen, f"{id_a} long, {id_b} long, cos double"
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (excluding self-match).

    Output: (query_id, neighbor_id, rank, cos_e6). Ties broken by neighbor
    id ascending — fully deterministic.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("vb")
    )
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("va"))
    # every corpus row must meet every query (that IS brute force); expressed
    # via broadcast_singleton_join so the plan states the real shape — a
    # BroadcastHashJoin with the corpus never shuffling and the small query
    # side broadcast — and the no-CartesianProduct/BNLJ sweep over queries()
    # stays assertable.
    scored = score_pairs_arrow(
        broadcast_singleton_join(c, q).filter(
            F.col("query_id") != F.col("neighbor_id")
        ),
        va="va",
        vb="vb",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.floor(F.col("cos") * 1000000.0 + 0.5).cast("long").alias("cos_e6"),
        )
    )


def make_hyperplanes(dim: int, n_bits: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_tables, n_bits, dim).astype(np.float64)


def _buckets_udf(planes: np.ndarray):
    """Arrow pandas UDF: vector → [bucket_id per table] via one matmul.

    planes has shape (n_tables, n_bits, dim); per Arrow batch this is a
    single (T*B, dim) x (dim, n) matrix product — the vectorized path a
    per-dimension expression tree cannot match (and the expression tree
    bloats the plan to MBs at dim=64).
    """
    n_tables, n_bits, dim = planes.shape
    flat = planes.reshape(n_tables * n_bits, dim)  # (T*B, D)
    powers = (2 ** np.arange(n_bits)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def f(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy()).astype(np.float64)  # (n, D)
        signs = (m @ flat.T) > 0  # (n, T*B)
        bits = signs.reshape(len(m), n_tables, n_bits)
        buckets = (bits * powers).sum(axis=2).astype(np.int64)  # (n, T)
        return pd.Series(list(buckets))

    return f


def _cells_udf(centroids: np.ndarray, n_out: int):
    """Arrow pandas UDF: vector → its n_out nearest centroid ids (cosine,
    ties to the lower cid). One matmul per Arrow batch — the row norm is a
    positive per-row factor, so it never changes the ranking and is skipped.
    """
    cent = centroids.astype(np.float64)
    cnorm = np.linalg.norm(cent, axis=1)

    @pandas_udf(ArrayType(LongType()))
    def f(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy()).astype(np.float64)  # (n, D)
        sims = (m @ cent.T) / cnorm  # (n, K)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_out]
        return pd.Series(list(order.astype(np.int64)))

    return f


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors live in their nearest
    centroid's cell; each query probes its n_probes nearest cells and
    re-ranks the candidates by exact cosine.

    The 10^12-row shape: the codebook is tiny and broadcast inside the UDF
    closure; cell assignment is one matmul per Arrow batch; the
    candidate join is a cell-id equi-join (co-partitioned, ids only); only
    surviving candidates re-attach vectors. At scale the corpus side is
    written bucketed/partitioned BY cell id so a probe prunes cells at the
    scan (partition pruning), not at the join.
    """
    cassign = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(_cells_udf(centroids, 1)(F.col(vec_col)), 1).alias("cid"),
    )
    qprobe = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(_cells_udf(centroids, n_probes)(F.col(vec_col))).alias("cid"),
    )
    cand = (
        qprobe.join(cassign, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("v_q")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("v_n")
    )
    # IVF candidate sets are small by construction (n_probes/K of the
    # corpus per query), so the Arrow scorer's fixed boundary cost exceeds
    # the interpreted fold here (measured worse at BOTH sf0.1 and the
    # 20k-vector proxy) — IVF keeps the JVM fold; brute/LSH, whose scored
    # sets scale with the corpus, use score_pairs_arrow.
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", cosine_cols("v_q", "v_n"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.floor(F.col("cos") * 1000000.0 + 0.5).cast("long").alias("cos_e6"),
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 table.

    Candidate generation is a bucket-key equi-join (shuffle on (table,
    bucket)); exact cosine re-rank on candidates only. Recall is tested vs
    brute_force_topk in tests/test_similarity.py.
    """
    planes = make_hyperplanes(dim, n_bits, n_tables, seed)
    budf = _buckets_udf(planes)

    def bucketize(df: DataFrame, idname: str) -> DataFrame:
        """One scan: vector → per-table buckets → posexplode to (tbl, bucket).

        IDs only — vectors never enter the bucket shuffle or the pair
        dedup (at 10^12 rows that difference is the whole game: 8 bytes/row
        per table instead of dim*8).
        """
        return df.select(
            F.col(id_col).alias(idname),
            budf(F.col(vec_col)).alias("buckets"),
        ).select(idname, F.posexplode("buckets").alias("tbl", "bucket"))

    cb = bucketize(corpus, "neighbor_id")
    qb = bucketize(queries, "query_id")
    cand = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # re-attach vectors only for the surviving candidates; the query side is
    # small → broadcast, the corpus side joins on its id (one shuffle)
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("v_q")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("v_n")
    )
    scored = score_pairs_arrow(
        cand.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id"),
        va="v_q",
        vb="v_n",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.floor(F.col("cos") * 1000000.0 + 0.5).cast("long").alias("cos_e6"),
        )
    )
