"""Physical-plan regression tests: the scale properties claimed in
BENCH/BASELINE.md and README must hold in the actual Catalyst output.

These guard against silent plan regressions (a refactor that breaks filter
pushdown or drops map-side partial aggregation still returns correct rows —
only the plan shows the 100x cost at 100 TB).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _explain(df, mode: str = "extended") -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _plan(df) -> str:
    # formatted mode renders the physical tree incl. Exchanges under AQE
    return _explain(df, "formatted")


def _full_plan(df) -> str:
    return _explain(df, "formatted")


def test_filter_pushdown_and_column_pruning(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    q = ev.filter(
        (F.col("ts") >= "2024-01-10") & (F.col("event_type") == "error")
    ).select("event_id", "user_id")
    s = _full_plan(q)
    assert "PushedFilters: [IsNotNull(ts), IsNotNull(event_type)" in s
    assert "EqualTo(event_type,error)" in s
    # pruned read schema: the untouched props/value columns never leave parquet
    assert "props" not in s.split("ReadSchema")[1].splitlines()[0]


def test_window_agg_is_two_phase(spark):
    """Map-side partial_count before the shuffle — one shuffle total."""
    from logflow_spark.operators.windows import tumbling_counts

    import re

    ev = spark.read.parquet(f"{SF}/events.parquet")
    s = _plan(tumbling_counts(ev, ts_col="ts", keys=("event_type",)))
    assert "partial_count" in s
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 1


def test_broadcast_join_chosen(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    j = orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    assert "BroadcastHashJoin" in _plan(j)
    assert "SortMergeJoin" not in _plan(j)


def test_topk_uses_take_ordered(spark):
    """ORDER BY+LIMIT must compile to TakeOrderedAndProject (per-partition
    top-k + driver merge), never a global sort."""
    from logflow_spark.operators.windows import top_k_windows, tumbling_counts

    ev = spark.read.parquet(f"{SF}/events.parquet")
    s = _plan(top_k_windows(tumbling_counts(ev, ts_col="ts", keys=()), k=100))
    assert "TakeOrderedAndProject" in s
    assert "Sort [" not in s  # no global sort operator


def test_extraction_prunable_when_unused(spark):
    """Column pruning must delete the (expensive) extraction UDF from plans
    that never consume text — and keep it when they do."""
    from logflow_spark.fixtures.pages import pages_spark_df
    from logflow_spark.streaming.topology import (
        TopologyConfig,
        build_windowed_topology,
    )

    pages = pages_spark_df(spark, 100, num_partitions=1)
    no_text = build_windowed_topology(
        pages, TopologyConfig(sum_text_chars=False), streaming=False
    )
    with_text = build_windowed_topology(
        pages, TopologyConfig(sum_text_chars=True), streaming=False
    )
    assert "extract_text" not in _plan(no_text)
    assert "extract_text" in _plan(with_text)


def test_salted_agg_spreads_hot_key(spark):
    """Phase-1 exchange partitions on (key, salt) — the hot key's rows land
    on n_salts reducers, not one."""
    from logflow_spark.operators.skew import salted_counts
    from logflow_spark.operators.windows import with_host
    from logflow_spark.fixtures.pages import pages_spark_df

    import re

    # multi-partition input: a 1-partition child lets Catalyst elide the
    # exchanges entirely (correct, but then there is no shuffle to inspect)
    df = with_host(pages_spark_df(spark, 1000, num_partitions=4, n_hosts=10, skew_frac=0.5))
    s = _plan(salted_counts(df, ["host"], n_salts=8, salt_source="url"))
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 2  # salted + merge
    first_exchange = s.split("Arguments: hashpartitioning")[1].splitlines()[0]
    assert "_salt" in first_exchange  # phase 1 partitions on (key, salt)


def test_lsh_candidate_join_carries_ids_only(spark):
    """The LSH bucket join must not shuffle embedding vectors."""
    from logflow_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    s = _plan(lsh_topk(emb, q, k=3))
    # the distinct over candidates must be on bare ids (no vector columns)
    dedup_part = s.split("partial_first")[0]
    for frag in dedup_part.split("HashAggregate(keys=[")[1:2]:
        keyline = frag.splitlines()[0]
        assert "query_id" in keyline and "neighbor_id" in keyline
        assert "v_" not in keyline


def test_bucketed_neardup_has_no_cartesian_product(spark):
    """The scale path for embedding near-dup must be the LSH bucket join —
    never a cartesian product (the brute twin keeps crossJoin as the
    small-scale oracle only)."""
    from logflow_spark.operators.dedup import embedding_neardup_pairs_bucketed

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    s = _plan(embedding_neardup_pairs_bucketed(emb, threshold=0.35))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    # candidate dedup aggregates bare ids, not vectors
    key_lines = [ln for ln in s.splitlines() if ln.startswith("Keys [")]
    assert key_lines, s
    for ln in key_lines:
        assert "id_a" in ln and "id_b" in ln
        assert "va#" not in ln and "vb#" not in ln


def test_simhash_banded_join_no_cartesian(spark):
    """SimHash near-dup candidates come from the band equi-join."""
    from logflow_spark.operators.dedup import simhash_neardup_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s = _plan(simhash_neardup_pairs(docs, max_hamming=3))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "SortMergeJoin" in s or "ShuffledHashJoin" in s or "BroadcastHashJoin" in s


def test_no_servable_query_plan_has_cartesian(spark):
    """Sweep EVERY batch queries() entry: no CartesianProduct and no
    BroadcastNestedLoopJoin anywhere in any servable physical plan — every
    all-pairs-shaped op must either be bucketed (LSH/band equi-join) or a
    constant-key BroadcastHashJoin whose broadcast side is provably tiny
    (1-row agg / query set). Streaming-drain entries are excluded: calling
    them executes a full drain and the frame they return is a plain sink
    read — their topology plans are asserted by the streaming tests."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    checked = 0
    for name, fn in entry.queries().items():
        if "_stream_" in name:
            continue
        s = _plan(fn(spark, SF))
        assert "CartesianProduct" not in s, name
        assert "BroadcastNestedLoopJoin" not in s, name
        checked += 1
    assert checked >= 50  # the batch family really was swept


@pytest.mark.parametrize("n_salts", [4, 16])
def test_salted_counts_partition_distribution(spark, n_salts):
    """End-to-end skew evidence: with salting, no single shuffle partition
    holds more than ~(1/n_salts + slack) of the hot key's rows in phase 1."""
    from logflow_spark.operators.skew import salted_counts
    from logflow_spark.operators.windows import with_host
    from logflow_spark.fixtures.pages import pages_spark_df

    df = with_host(pages_spark_df(spark, 2000, n_hosts=10, skew_frac=0.5))
    partial = (
        df.withColumn("_salt", F.pmod(F.hash("url"), F.lit(n_salts)))
        .filter(F.col("host") == "h0.example-0.com")
        .groupBy("_salt")
        .count()
    )
    counts = [r["count"] for r in partial.collect()]
    assert len(counts) == n_salts  # hot key genuinely split n_salts ways
    assert max(counts) < 0.5 * sum(counts)  # no residual single-bucket skew


def test_bucketed_tables_join_without_exchange(spark):
    """Co-located joins via bucketing (the 100 TB repeated-join shape): two
    tables bucketed on the join key must SortMergeJoin with ZERO Exchange —
    the shuffle happened once at write time and is amortized across every
    subsequent join — while the unbucketed twin plan carries two."""
    import re

    # warehouse.dir is a static conf — managed tables land in the session's
    # default warehouse; DROP TABLE below removes their files
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_orders")
    )
    (
        cust.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("b_customer")
    )
    try:
        # disable auto-broadcast so the join shape is decided by layout
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        s = _plan(j)
        assert "SortMergeJoin" in s
        assert len(re.findall(r"\(\d+\) Exchange", s)) == 0, s

        plain = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        s2 = _plan(plain)
        assert len(re.findall(r"\(\d+\) Exchange", s2)) == 2

        # correctness identical to the unbucketed join
        assert j.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
