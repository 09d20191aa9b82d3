"""Materialized IVF centroid codebook.

IVF-style ANN partitions the corpus into K cells around trained centroids;
queries probe only the top-P nearest cells. The codebook is trained ONCE
(seeded Lloyd's k-means on a deterministic sample, driver-side numpy) and
persisted, so (a) assignment is a broadcast matmul at scan time with no
training job in the query path, and (b) DuckDB can recompute the identical
cell assignment + probe + re-rank — a full SQL oracle for the approximate
structure itself (the oracle replays the same algorithm, so it is exact
regardless of the recall vs brute force).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def train_kmeans(
    sample: np.ndarray, k: int = 16, seed: int = 42, n_iters: int = 10
) -> np.ndarray:
    """Deterministic Lloyd's k-means (cosine geometry: rows L2-normalized).

    Seeded init, fixed iteration count, ties to the lower centroid id —
    bit-reproducible for a given sample.
    """
    x = sample.astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(n_iters):
        sims = x @ cent.T / np.linalg.norm(cent, axis=1)
        # argmax with ties to the lower cid: stable argsort on -sims
        assign = np.argsort(-sims, axis=1, kind="stable")[:, 0]
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ensure_ivf_centroids(
    path: str,
    train_parquet: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_max_id: int = 512,
    k: int = 16,
    seed: int = 42,
    n_iters: int = 10,
) -> str:
    if os.path.exists(path):
        return path
    import pandas as pd

    df = pd.read_parquet(train_parquet, columns=[id_col, vec_col])
    df = df[df[id_col] < sample_max_id].sort_values(id_col)
    sample = np.stack(df[vec_col].to_numpy())
    cent = train_kmeans(sample, k=k, seed=seed, n_iters=n_iters)
    table = pa.table(
        {
            "cid": pa.array(range(k), type=pa.int64()),
            "vec": pa.array([list(c) for c in cent], type=pa.list_(pa.float64())),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    os.rename(tmp, path)
    return path
