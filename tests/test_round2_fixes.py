"""Round-2 regression tests: short-doc shingles, stranded DAG steps,
single-DAG tfidf, and Arrow-chunk-independent stateful as-of join."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import CACHE


# -- shingles_df short-doc guard ---------------------------------------------
def test_shingles_short_docs_no_crash(spark):
    """Docs with < n tokens must yield ZERO shingles, not throw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT (Spark sequence(0,-1) counts DOWN)."""
    from logflow_spark.operators.dedup import (
        jaccard_pairs,
        minhash_signatures,
        shingles_df,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": ["", "one", "one two", "one two three", "a b c d"],
            }
        )
    )
    sh = shingles_df(df).toPandas()
    per_doc = sh.groupby("doc_id").size().to_dict()
    assert per_doc.get(0, 0) == 0
    assert per_doc.get(1, 0) == 0
    assert per_doc.get(2, 0) == 0
    assert per_doc.get(3, 0) == 1
    assert per_doc.get(4, 0) == 2
    # the downstream operators must also survive short docs
    sigs = minhash_signatures(df).collect()
    assert {r["doc_id"] for r in sigs} == {3, 4}  # shingle-less docs drop out
    jaccard_pairs(df, threshold=0.1).collect()  # no crash


def test_shingles_short_docs_match_duckdb(spark):
    """Short docs diverged from the oracle before the guard; now both sides
    agree doc-for-doc."""
    import duckdb

    texts = ["", "x", "x y", "x y z", "x y z w v"]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    from logflow_spark.operators.dedup import shingles_df

    got = {
        (r["doc_id"], r["shingle"]) for r in shingles_df(df).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    exp = {
        tuple(r)
        for r in con.execute(
            """
            WITH tok AS (SELECT doc_id,
                  list_filter(regexp_split_to_array(text,'\\s+'), x -> x <> '') AS toks
                  FROM documents)
            SELECT DISTINCT doc_id, toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS sh
            FROM tok, unnest(range(greatest(len(toks)-2,0))) AS t(i)
            """
        ).fetchall()
    }
    assert got == exp


# -- DAG runner: stranded steps must raise ------------------------------------
def test_run_dag_raises_on_missing_dependency():
    from logflow_spark.pipeline.runner import run_dag

    dag = {"a": {"pipeline": "noop", "depends_on": ["ghost"]}}
    with pytest.raises(RuntimeError, match="never became runnable.*'a'"):
        run_dag(dag)


def test_run_dag_raises_on_cycle():
    from logflow_spark.pipeline.runner import run_dag

    dag = {
        "a": {"pipeline": "noop", "depends_on": ["b"]},
        "b": {"pipeline": "noop", "depends_on": ["a"]},
    }
    with pytest.raises(RuntimeError, match="never became runnable"):
        run_dag(dag)


# -- tfidf: no driver-side action while building the plan ----------------------
def test_top_terms_builds_without_running_a_job(spark):
    from logflow_spark.operators.tfidf import top_terms_per_source

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["s1", "s1", "s2"],
                "text": ["alpha beta beta", "alpha gamma", "delta delta delta"],
            }
        )
    )
    sc = spark.sparkContext
    sc.setJobGroup("tfidf_build_only", "plan construction must not submit jobs")
    try:
        df = top_terms_per_source(docs, k=2)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert sc.statusTracker().getJobIdsForGroup("tfidf_build_only") == []
    # and the plan still computes the right distinctive terms
    rows = {(r["source"], r["rank"]): r["token"] for r in df.collect()}
    assert rows[("s2", 1)] == "delta"


# -- stateful as-of join: output independent of Arrow chunking ----------------
def test_stateful_asof_join_chunk_independent(spark):
    """With tiny Arrow batches a group's micro-batch spans many chunks; the
    join must still equal the batch oracle (state folded over the WHOLE batch
    before the as-of lookup, not chunk-by-chunk)."""
    from logflow_spark.fixtures.enrichment import enrichment_pandas
    from logflow_spark.fixtures.merged_join import ensure_merged_join_fixture
    from logflow_spark.fixtures.pages import pages_spark_df
    from logflow_spark.operators.asof_join import asof_join_pages_enrichment
    from logflow_spark.operators.windows import with_host
    from logflow_spark.sources.replay import replay_stream
    from logflow_spark.streaming.stateful_join import MERGED_SCHEMA, AsofEnrichJoin

    n_pages, n_hosts = 1500, 5  # ~300 rows/host/batch >> 50-row Arrow chunks
    merged_dir = ensure_merged_join_fixture(
        os.path.join(CACHE, f"merged_join_chunky_{n_pages}_{n_hosts}"),
        n_pages=n_pages,
        n_hosts=n_hosts,
        n_chunks=2,
    )
    ckpt = os.path.join(CACHE, "asof_chunky_ckpt")
    out_dir = os.path.join(CACHE, "asof_chunky_out")
    for p in (ckpt, out_dir):
        shutil.rmtree(p, ignore_errors=True)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        stream = replay_stream(spark, merged_dir, MERGED_SCHEMA, max_files_per_trigger=1)
        joined = AsofEnrichJoin.apply(stream, watermark="73 hours")
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = {
        (r["url"], r["enrich_ts"], r["category"], r["score"])
        for r in spark.read.parquet(out_dir).collect()
    }
    pages = with_host(pages_spark_df(spark, n_pages, n_hosts=n_hosts))
    enr = spark.createDataFrame(enrichment_pandas(n_hosts))
    exp = {
        (r["url"], r["enrich_ts"], r["category"], r["score"])
        for r in asof_join_pages_enrichment(pages, enr).collect()
    }
    assert got == exp
