"""The full LLM training-data pipeline, two ways that must agree exactly:

1. as ONE declarative Spark plan (operators/curation.py:llm_pipeline_pack) —
   the composition the `llm_pipeline_packed` driver query pins against a
   recursive-CTE DuckDB oracle;
2. as a DAG of separately-committed pipeline steps (main.py dag /
   config/llm_pipeline.yaml shape): curate → decontaminate → pii_scrub →
   pack, every step writing through the exactly-once sink (sink_mode=table)
   so each stage leaves a lineage manifest and a retry replays idempotently.

Step-composed == single-plan is the DAG correctness contract: materializing
intermediate tables must not change the result.
"""

from __future__ import annotations

import os
import shutil

import yaml
from pyspark.sql import functions as F

from logflow_spark.pipeline.runner import run_dag
from logflow_spark.sinks.exactly_once import ExactlyOnceParquetSink
from tests.conftest import CACHE

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def _planted(spark):
    """documents with the deterministic doc_id-derived PII suffix (the same
    construction as the pii_scrub / llm_pipeline_packed driver queries)."""
    return spark.read.parquet(SF_DOCS).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ref "),
            (F.col("doc_id") * 1234567 + 10000000).cast("string"),
        ).alias("text"),
    )


def test_llm_dag_matches_single_plan_with_lineage(spark):
    from logflow_spark.operators.curation import llm_pipeline_pack

    base = os.path.join(CACHE, "llm_dag_test")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    input_path = os.path.join(base, "input")
    _planted(spark).write.mode("overwrite").parquet(input_path)

    dirs = {s: os.path.join(base, s) for s in ("curated", "deconned", "scrubbed", "packed")}
    dag = {
        "curate": {
            "pipeline": "corpus_curate",
            "params": {
                "input_path": input_path,
                "output_dir": dirs["curated"],
                "emit": "docs",
                "sink_mode": "table",
            },
        },
        "decontaminate": {
            "pipeline": "corpus_decontaminate",
            "depends_on": ["curate"],
            "params": {
                "input_path": dirs["curated"],
                "output_dir": dirs["deconned"],
                "drop_contaminated": "true",
                "sink_mode": "table",
            },
        },
        "scrub": {
            "pipeline": "pii_scrub",
            "depends_on": ["decontaminate"],
            "params": {
                "input_path": dirs["deconned"],
                "output_dir": dirs["scrubbed"],
                "sink_mode": "table",
            },
        },
        "pack": {
            "pipeline": "corpus_pack",
            "depends_on": ["scrub"],
            "params": {
                "input_path": dirs["scrubbed"],
                "output_dir": dirs["packed"],
                "text_col": "clean_text",
                "sink_mode": "table",
            },
        },
    }
    results = run_dag(dag, max_workers=2)
    for step, res in results.items():
        assert not isinstance(res, Exception), f"{step} failed: {res}"
        assert res["sink"] == "exactly_once", step

    # every step left an exactly-once lineage manifest with row counts
    for name, d in dirs.items():
        sink = ExactlyOnceParquetSink(d)
        ms = sink.visible_manifests()
        assert len(ms) == 1 and ms[0]["n_rows"] > 0, name
        assert "partition_counts" in ms[0], name

    # the scrub step actually scrubbed the planted PII
    assert results["scrub"]["n_emails"] > 0
    assert results["scrub"]["n_ipv4"] > 0

    # step-composed result == the single declarative plan, row for row
    packed_dag = {
        tuple(r) for r in ExactlyOnceParquetSink(dirs["packed"]).read(spark).collect()
    }
    packed_plan = {tuple(r) for r in llm_pipeline_pack(_planted(spark)).collect()}
    assert packed_dag == packed_plan
    assert len(packed_dag) > 100

    # idempotent retry: re-running a step against its committed table is a
    # no-op (batch 0 already in the commit log), not a duplicate write
    rerun = run_dag(
        {"pack": {"pipeline": "corpus_pack", "params": dag["pack"]["params"]}},
        max_workers=1,
    )
    assert not isinstance(rerun["pack"], Exception)
    assert {
        tuple(r) for r in ExactlyOnceParquetSink(dirs["packed"]).read(spark).collect()
    } == packed_dag


def test_llm_pipeline_yaml_is_valid():
    """config/llm_pipeline.yaml references only registered pipelines, forms
    a DAG over declared steps, and every step's params build() cleanly."""
    from logflow_spark.pipeline.registry import get_pipeline

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "config", "llm_pipeline.yaml")) as f:
        dag = yaml.safe_load(f)
    assert set(dag) == {"curate", "decontaminate", "scrub", "pack"}
    for step, spec in dag.items():
        cls = get_pipeline(spec["pipeline"])
        cls.build(**(spec.get("params") or {}))  # validates required params
        for dep in spec.get("depends_on", []) or []:
            assert dep in dag, f"{step} depends on undeclared {dep}"
