"""Relational / OLAP surface beyond the reference's served queries.

The reference delegates every ad-hoc analytical query to its downstream
store (SURVEY.md §2.9 — the engine only pre-shapes columns). A user
switching to this repo runs those queries in the same engine, so the
common OLAP shapes are first-class, each with a DuckDB oracle twin:

- rollup_counts: GROUP BY ROLLUP hierarchy totals (date → hour subtotals +
  grand total). One shuffle: Spark expands grouping sets map-side.
- semi/anti joins: EXISTS / NOT EXISTS cohorts without materializing the
  right side into the output (the broadcast form ships only the key set).
- disc_quantiles: exact discrete quantiles (DuckDB quantile_disc
  definition: smallest element whose CDF ≥ q, i.e. index ceil(q*n)-1 in
  sort order) via one window rank — deterministic selection, no
  interpolation arithmetic to diverge across engines. For 100 TB pipelines this is the shape used to audit
  e.g. per-service latency percentiles; the approximate twin is Spark's
  approx_percentile (same plan, sketch-based, no exact oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_counts(
    df: DataFrame, cols: tuple[str, ...], agg_col: str | None = None
) -> DataFrame:
    """GROUP BY ROLLUP(cols): per-level subtotals + grand total.

    Null grouping markers are made explicit ('<all>') so the output is
    engine-portable (Spark and DuckDB both emit NULL for rolled-up levels,
    but NULL sort/hash semantics differ across drivers).
    """
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if agg_col is not None:
        aggs.append(
            F.sum(F.col(agg_col).cast("decimal(18,2)")).cast("double").alias("sum_v")
        )
    out = df.rollup(*cols).agg(*aggs)
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c).cast("string"), F.lit("<all>")))
    return out


def semi_join_keys(
    left: DataFrame, right: DataFrame, on: str, broadcast_right: bool = True
) -> DataFrame:
    """LEFT SEMI: rows of `left` whose key EXISTS in `right` (key set only
    crosses the wire — broadcast when the right side is dimension-sized)."""
    r = right.select(on).distinct()
    if broadcast_right:
        r = F.broadcast(r)
    return left.join(r, on, "left_semi")


def anti_join_keys(
    left: DataFrame, right: DataFrame, on: str, broadcast_right: bool = True
) -> DataFrame:
    """LEFT ANTI: rows of `left` whose key does NOT exist in `right` —
    the orphan / referential-integrity audit shape."""
    r = right.select(on).distinct()
    if broadcast_right:
        r = F.broadcast(r)
    return left.join(r, on, "left_anti")


def _funnel_next(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    then: str,
    within: str,
    id_col: str,
) -> DataFrame:
    """Shared CEP core: every event annotated with `_next_us` = earliest
    `then` event-time by the same key within `within` (closed forward RANGE
    frame). One shuffle (window partitioned by key), one sorted pass per
    key — no self-join, so the cost is O(events log events-per-key), not
    O(pairs). Event times travel as microsecond bigints (unix_micros /
    epoch_us) so cross-engine comparison is exact; ties at the same
    microsecond match."""
    from pyspark.sql import Window

    count, unit = within.split()
    n_us = int(count) * {
        "seconds": 1_000_000,
        "minutes": 60 * 1_000_000,
        "hours": 3_600 * 1_000_000,
    }[unit]
    staged = df.select(
        F.col(key_col),
        F.col(id_col),
        F.col(type_col),
        # parquet files may carry TIMESTAMP or TIMESTAMP_NTZ; the session
        # timezone is pinned UTC, so the cast matches DuckDB's naive-as-UTC
        # epoch_us on both physical types
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_us"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_ts_us").asc())
        .rangeBetween(0, n_us)
    )
    nxt = F.min(F.when(F.col(type_col) == then, F.col("_ts_us"))).over(w)
    return staged.withColumn("_next_us", nxt)


def funnel_pairs(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    first: str = "view",
    then: str = "purchase",
    within: str = "30 minutes",
    id_col: str = "event_id",
) -> DataFrame:
    """Sequence-pattern (CEP funnel) batch twin: for every `first` event,
    the earliest `then` event by the same key within `within` after it
    (plan properties: see _funnel_next).

    Output: (key, first event id, first_ts_us, then_ts_us, gap_us).
    """
    return (
        _funnel_next(df, key_col, ts_col, type_col, then, within, id_col)
        .filter((F.col(type_col) == first) & F.col("_next_us").isNotNull())
        .select(
            F.col(key_col),
            F.col(id_col).alias("first_event_id"),
            F.col("_ts_us").alias("first_ts_us"),
            F.col("_next_us").alias("then_ts_us"),
            (F.col("_next_us") - F.col("_ts_us")).alias("gap_us"),
        )
    )


def funnel_absence(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    first: str = "view",
    then: str = "purchase",
    within: str = "30 minutes",
    id_col: str = "event_id",
) -> DataFrame:
    """CEP ABSENCE pattern: `first` events NOT followed by a `then` event
    by the same key within `within` — abandonment / timeout detection. The
    complement filter over the identical single-pass forward frame
    (_funnel_next): no self-join, no NOT-EXISTS subquery.

    A `then` at the SAME microsecond as the `first` counts as followed
    (closed frame), mirroring funnel_pairs exactly: every `first` event
    appears in exactly one of the two outputs.

    Output: (key, first event id, first_ts_us).
    """
    return (
        _funnel_next(df, key_col, ts_col, type_col, then, within, id_col)
        .filter((F.col(type_col) == first) & F.col("_next_us").isNull())
        .select(
            F.col(key_col),
            F.col(id_col).alias("first_event_id"),
            F.col("_ts_us").alias("first_ts_us"),
        )
    )


def disc_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Exact discrete quantiles per group: element at index ceil(q*n)-1 of
    the ascending sort — the smallest value with CDF ≥ q (DuckDB
    quantile_disc definition, verified empirically).

    Selection, not interpolation — the returned values are actual column
    values, so the cross-engine comparison is exact. One shuffle (window
    over keys); rows carry (keys..., q_e2, value).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(value_col).asc()
    )
    ranked = df.select(
        *keys,
        F.col(value_col),
        (F.row_number().over(w) - 1).alias("_idx"),
        F.count(F.lit(1)).over(Window.partitionBy(*[F.col(k) for k in keys])).alias(
            "_n"
        ),
    )
    picks = None
    for q in qs:
        sel = ranked.filter(
            F.col("_idx") == F.ceil(F.col("_n") * F.lit(q)) - 1
        ).select(
            *keys,
            F.lit(int(round(q * 100))).cast("long").alias("q_e2"),
            F.col(value_col).alias("value"),
        )
        picks = sel if picks is None else picks.unionByName(sel)
    return picks
