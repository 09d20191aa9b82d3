"""CLI / registry / DAG-runner parity (reference main.py + runner/)."""

from __future__ import annotations

import os

import pytest

from logflow_spark.pipeline.registry import PIPELINES, get_pipeline
from logflow_spark.pipeline.runner import parse_kv_params, run_dag, run_pipeline

from tests.conftest import CACHE


def test_registry_has_builtins():
    assert {"pages_stream_to_table", "pages_generate", "log_events_enrich"} <= set(
        PIPELINES
    )
    with pytest.raises(KeyError, match="unknown pipeline"):
        get_pipeline("nope")


def test_parse_kv_params():
    assert parse_kv_params(["a=1", "b=x=y"]) == {"a": "1", "b": "x=y"}
    with pytest.raises(ValueError):
        parse_kv_params(["noequals"])


def test_build_validates_required():
    cls = get_pipeline("pages_stream_to_table")
    with pytest.raises(ValueError, match="missing required"):
        cls.build(input_dir="/tmp/x")


def test_dag_runner_respects_dependencies_and_retries(spark):
    """generate → stream-to-table DAG, end to end on tiny data."""
    gen_dir = os.path.join(CACHE, "dag_pages")
    table_dir = os.path.join(CACHE, "dag_table")
    import shutil

    shutil.rmtree(table_dir, ignore_errors=True)
    dag = {
        "gen": {
            "pipeline": "pages_generate",
            "params": {
                "out_dir": gen_dir,
                "n_rows": "500",
                "n_chunks": "2",
                "flush_row": "true",
            },
        },
        "stream": {
            "pipeline": "pages_stream_to_table",
            "depends_on": ["gen"],
            "retries": 1,
            "params": {
                "input_dir": gen_dir,
                "table_dir": table_dir,
                "watermark": "73 hours",
                "cores": "4",
            },
        },
    }
    results = run_dag(dag, max_workers=2)
    assert results["stream"]["total_rows"] > 0


def test_dag_runner_raises_on_permanent_failure():
    dag = {
        "bad": {"pipeline": "pages_generate", "params": {}, "retries": 1},
    }
    with pytest.raises(RuntimeError, match="failed permanently"):
        run_dag(dag)


def test_run_pipeline_generate(tmp_path):
    out = run_pipeline(
        "pages_generate",
        {"out_dir": str(tmp_path / "p"), "n_rows": "100", "n_chunks": "1"},
    )
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_corpus_curate_pipeline(spark, tmp_path):
    out = run_pipeline(
        "corpus_curate",
        {
            "input_path": "/root/testdata/sf0.01/documents.parquet",
            "output_dir": str(tmp_path / "kept"),
        },
    )
    assert out["n_in"] == 500
    assert 0 < out["n_kept"] < out["n_in"]
    assert os.path.exists(os.path.join(str(tmp_path / "kept"), "_SUCCESS"))


def test_decontaminate_and_scrub_pipelines(spark, tmp_path):
    out = run_pipeline(
        "corpus_decontaminate",
        {
            "input_path": "/root/testdata/sf0.01/documents.parquet",
            "output_dir": str(tmp_path / "decon"),
        },
    )
    assert out["n_docs"] == 500
    assert 0 < out["n_contaminated"] < 500
    out = run_pipeline(
        "pii_scrub",
        {
            "input_path": "/root/testdata/sf0.01/documents.parquet",
            "output_dir": str(tmp_path / "scrubbed"),
        },
    )
    # the synthetic corpus carries no PII — the pipeline must say so
    assert out == {"n_docs": 500, "n_emails": 0, "n_ipv4": 0,
                   "n_digit_runs": 0, "sink": "parquet"}


def test_span_dedup_pipeline(spark, tmp_path):
    out = run_pipeline(
        "span_dedup",
        {
            "input_path": "/root/testdata/sf0.01/documents.parquet",
            "output_dir": str(tmp_path / "spans"),
        },
    )
    assert out["n_docs"] == 500
    assert 0 < out["spans_dropped"] < out["spans_kept"]
    # chainable docs mode: cleaned corpus has one text row per doc
    out2 = run_pipeline(
        "span_dedup",
        {
            "input_path": "/root/testdata/sf0.01/documents.parquet",
            "output_dir": str(tmp_path / "spans_docs"),
            "emit": "docs",
        },
    )
    cleaned = spark.read.parquet(str(tmp_path / "spans_docs"))
    assert cleaned.columns == ["doc_id", "text"]
    assert cleaned.count() == 500


def test_incremental_dedup_pipeline(spark, tmp_path):
    import pandas as pd

    docs = pd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    )
    corpus = docs[docs.doc_id < 400]
    batch = docs[docs.doc_id >= 400].copy()
    # plant one exact dup of a corpus doc inside the batch
    batch.loc[batch.index[0], "text"] = corpus.iloc[0]["text"]
    corpus_p, batch_p = str(tmp_path / "corpus.parquet"), str(tmp_path / "batch.parquet")
    corpus.to_parquet(corpus_p)
    batch.to_parquet(batch_p)
    out = run_pipeline(
        "incremental_dedup",
        {
            "input_path": batch_p,
            "corpus_path": corpus_p,
            "output_dir": str(tmp_path / "verdicts"),
        },
    )
    assert out["n_batch"] == len(batch)
    assert out["n_exact_dup"] >= 1
    assert out["n_new"] + out["n_exact_dup"] + out["n_near_dup"] == len(batch)
    # docs mode keeps only the genuinely-new documents
    out2 = run_pipeline(
        "incremental_dedup",
        {
            "input_path": batch_p,
            "corpus_path": corpus_p,
            "output_dir": str(tmp_path / "new_docs"),
            "emit": "docs",
        },
    )
    kept = spark.read.parquet(str(tmp_path / "new_docs"))
    assert kept.count() == out["n_new"]


def test_table_read_time_travel_pipeline(spark, tmp_path):
    from pyspark.sql import functions as F

    from logflow_spark.sinks.exactly_once import ExactlyOnceParquetSink

    td = str(tmp_path / "table")
    sink = ExactlyOnceParquetSink(td)
    for b in range(2):
        sink.write_batch(
            spark.range(100 * b, 100 * (b + 1)).select(F.col("id")), batch_id=b
        )
    out0 = run_pipeline(
        "table_read", {"table_dir": td, "out_dir": str(tmp_path / "s0"), "as_of": "0"}
    )
    out1 = run_pipeline("table_read", {"table_dir": td, "out_dir": str(tmp_path / "s1")})
    assert out0["n_rows"] == 100 and out1["n_rows"] == 200
    assert out0["batches_visible"] == [0]


def test_cep_detect_pipeline_funnel_absence_partition(spark, tmp_path):
    """CLI surface for the CEP family: generate the clickstream, run the
    funnel and absence pipelines against it, and check the two outputs
    partition the view set (the batch-twin complement contract)."""
    import duckdb

    fx = run_pipeline(
        "funnel_generate",
        {"out_dir": str(tmp_path / "fx"), "n_rows": "800", "n_chunks": "3",
         "n_users": "19"},
    )
    assert os.path.exists(os.path.join(fx, "_SUCCESS"))

    got_f = run_pipeline(
        "cep_detect",
        {"input_dir": fx, "table_dir": str(tmp_path / "funnel"),
         "pattern": "funnel", "cores": "8"},
    )
    got_a = run_pipeline(
        "cep_detect",
        {"input_dir": fx, "table_dir": str(tmp_path / "absence"),
         "pattern": "absence", "cores": "8"},
    )
    n_views = duckdb.execute(
        f"SELECT count(*) FROM read_parquet('{fx}/*.parquet') "
        "WHERE event_type = 'view'"
    ).fetchone()[0]
    assert got_f["total_rows"] + got_a["total_rows"] == n_views
    assert got_f["total_rows"] > 0 and got_a["total_rows"] > 0

    # bad pattern fails fast at build time
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pattern"):
        run_pipeline("cep_detect", {"input_dir": fx, "table_dir": "x",
                                    "pattern": "nope"})
