"""The incremental crawl-ingest DAG (config/crawl_ingest.yaml shape):
span_dedup (emit docs) → incremental_dedup vs the existing corpus (emit
docs) → pack, every step committed through the exactly-once sink. Pins
the chain contract: step outputs are readable by the next step, and the
admitted-docs count flows through to packing."""

from __future__ import annotations

import os

import yaml

from logflow_spark.pipeline.runner import run_dag
from logflow_spark.sinks.exactly_once import ExactlyOnceParquetSink

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_crawl_ingest_dag(spark, tmp_path):
    with open(os.path.join(REPO, "config", "crawl_ingest.yaml")) as f:
        dag = yaml.safe_load(f)
    for step in dag.values():
        p = step["params"]
        p["output_dir"] = str(tmp_path / os.path.basename(p["output_dir"]))
        for key in ("input_path", "corpus_path"):
            if p.get(key, "").startswith(".cache/ingest_dag/"):
                p[key] = str(tmp_path / os.path.basename(p[key]))
    results = run_dag(dag, max_workers=2)
    assert set(results) == {"despan", "admit", "pack"}
    assert results["despan"]["n_docs"] == 500
    admit = results["admit"]
    # the where/corpus_where predicates carve generations out of one table
    assert admit["n_batch"] == 100
    assert admit["n_new"] + admit["n_exact_dup"] + admit["n_near_dup"] == 100
    assert admit["n_new"] > 0  # most of the new generation is admitted
    assert results["pack"]["n_docs"] == admit["n_new"]
    # every stage left an exactly-once lineage manifest
    for name in ("despanned", "admitted", "packed"):
        t = ExactlyOnceParquetSink(str(tmp_path / name))
        assert t.metrics()["total_rows"] > 0
