"""Skew-aware aggregation: salted repartition + two-phase aggregation.

north_rule: "skew from hot hosts is handled with salted repartitioning +
two-phase aggregation". AQE's skew handling only applies to batch joins, so
hot-key aggregation in streaming (one host = 50% of traffic) needs an
explicit rewrite:

  phase 1: groupBy(key, salt) — hot key's rows spread over ``n_salts``
           reducers, each computing a partial aggregate;
  phase 2: groupBy(key)       — merge the ≤ n_salts partials per key.

Phase 2 input is tiny (n_keys * n_salts rows), so the second shuffle is
negligible; total work ≈ one balanced shuffle instead of one reducer
receiving 50% of the data.

Only algebraic aggregates decompose this way — count/sum/min/max + avg via
(sum, count). That is exactly the window-agg surface of the engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_counts(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """count(*) per key, two-phase over a salt derived from row content.

    ``salt_source`` defaults to a hash of all columns (any high-cardinality
    expression works; url is ideal for pages). Deterministic — no rand() —
    so retried tasks produce identical partials (required for exactly-once).
    """
    if salt_source is None:
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    else:
        c = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.hash(c), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*[F.col(k) for k in keys], F.col("_salt"))
        .agg(F.count(F.lit(1)).alias("_partial_cnt"))
    )
    return (
        partial.groupBy(*[F.col(k) for k in keys])
        .agg(F.sum("_partial_cnt").alias("cnt"))
    )


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """sum(value) per key via salted two-phase (same shape as salted_counts)."""
    if salt_source is None:
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    else:
        c = F.col(salt_source) if isinstance(salt_source, str) else salt_source
        salt = F.pmod(F.hash(c), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*[F.col(k) for k in keys], F.col("_salt"))
        .agg(F.sum(F.col(value_col)).alias("_partial_sum"))
    )
    return (
        partial.groupBy(*[F.col(k) for k in keys])
        .agg(F.sum("_partial_sum").alias(f"sum_{value_col}"))
    )
