"""Materialized LSH hyperplanes fixture.

The ANN-LSH operator (operators/similarity.py) generates its random
hyperplanes from a fixed seed at plan-build time. Persisting the identical
planes to parquet makes the whole construction SQL-expressible: DuckDB can
recompute the sign-bit buckets (list_dot_product > 0) and the exact-cosine
re-rank from the same numbers, giving the driver gate a real oracle instead
of a rows-only check.

Layout: one row per (tbl, bit) with the plane's coefficients as
list<double> — 16 tables x 4 bits = 64 rows at the defaults.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def ensure_hyperplanes_fixture(
    path: str,
    dim: int = 64,
    n_bits: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> str:
    if os.path.exists(path):
        return path
    from logflow_spark.operators.similarity import make_hyperplanes

    planes = make_hyperplanes(dim, n_bits, n_tables, seed)  # (T, B, D)
    tbl, bit, coeff = [], [], []
    for t in range(n_tables):
        for b in range(n_bits):
            tbl.append(t)
            bit.append(b)
            coeff.append(planes[t, b, :].astype(np.float64))
    table = pa.table(
        {
            "tbl": pa.array(tbl, type=pa.int64()),
            "bit": pa.array(bit, type=pa.int64()),
            "plane": pa.array([list(c) for c in coeff], type=pa.list_(pa.float64())),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    os.rename(tmp, path)
    return path
