"""Unit tests for the training-pipeline extras added in round 2:
benchmark decontamination, repetition quality, PII scrubbing, sequence
packing. Exact-value assertions on tiny hand-computable fixtures plus
plan-shape checks for the scale claims (the DuckDB oracle gate in
test_entry_oracle.py covers the sf0.01 cross-engine comparison).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


# -- decontamination ---------------------------------------------------------

def test_decontaminate_flags_planted_eval_docs(spark):
    from logflow_spark.operators.decontam import decontaminate, eval_snippets

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = decontaminate(docs, eval_snippets(docs), n=8).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == docs.count()  # one row per input doc
    eval_ids = [r["doc_id"] for r in docs.filter(F.col("doc_id") % 29 == 0).collect()]
    assert eval_ids, "fixture must contain eval docs"
    for i in eval_ids:  # a doc trivially overlaps its own snippet
        assert by_id[i]["contaminated"], f"eval doc {i} not flagged"
        assert by_id[i]["n_hits"] > 0
    # decontamination must not flag the whole corpus
    n_clean = sum(1 for r in out if not r["contaminated"])
    assert n_clean > len(out) // 2


def test_decontaminate_n_hits_exact_on_tiny_fixture(spark):
    from logflow_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # contains eval 4-grams "a b c d","b c d e","c d e f"
            (2, "x y z w q r"),  # no overlap
            (3, "c d e f g h"),  # shares "c d e f" only
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c d e f")], "eval_id long, eval_text string"
    )
    got = _rows(decontaminate(docs, bench, n=4), "doc_id", "n_hits", "contaminated")
    assert got == {(1, 3, True), (2, 0, False), (3, 1, True)}


def test_decontaminate_broadcasts_bench_side(spark):
    from logflow_spark.operators.decontam import decontaminate, eval_snippets

    from tests.test_plan_properties import _plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s = _plan(decontaminate(docs, eval_snippets(docs), n=8))
    assert "BroadcastHashJoin" in s  # the corpus never shuffles to meet the bench


# -- repetition profile ------------------------------------------------------

def test_repetition_profile_exact_values(spark):
    from logflow_spark.operators.textstats import repetition_profile

    docs = spark.createDataFrame(
        [
            (1, "a a b"),      # dup_tok 1/3, bigrams [a a, a b] distinct, mode 2/3
            (2, "x y z"),      # no repetition, mode 1/3
            (3, "a a a a"),    # dup_tok 3/4, bigrams [a a]x3 dup 2/3, mode 1
            (4, ""),           # empty → all zeros
        ],
        "doc_id long, text string",
    )
    got = _rows(
        repetition_profile(docs),
        "doc_id", "n_tokens", "dup_token_frac_e6", "dup_bigram_frac_e6",
        "top_token_frac_e6",
    )
    assert got == {
        (1, 3, 333333, 0, 666667),
        (2, 3, 0, 0, 333333),
        (3, 4, 750000, 666667, 1000000),
        (4, 0, 0, 0, 0),
    }


# -- PII scrub ---------------------------------------------------------------

def test_pii_scrub_redacts_and_counts(spark):
    from logflow_spark.operators.scrub import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail bob@x.com or al.b+1@sub.dom.org; ip 10.1.2.3 ref 12345678"),
            (2, "clean text, short number 123 stays"),
            (3, "digits inside email a12345678b@x.io count once"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_ipv4"] == 1
    assert out[1]["n_digit_runs"] == 1
    assert out[1]["clean_text"] == "mail <EMAIL> or <EMAIL>; ip <IP> ref <NUM>"
    assert out[2]["clean_text"] == "clean text, short number 123 stays"
    assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_digit_runs"]) == (0, 0, 0)
    # the digit run inside the email is redacted as <EMAIL>, not double-counted
    assert out[3]["n_emails"] == 1 and out[3]["n_digit_runs"] == 0
    assert out[3]["clean_text"] == "digits inside email <EMAIL> count once"


# -- stratified sampling -----------------------------------------------------

def test_stratified_hash_sample_rates_and_determinism(spark):
    from logflow_spark.operators.curation import stratified_hash_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rates = {"src1": 100, "src2": 0}
    out = stratified_hash_sample(docs, rates, default_pct=40)
    kept = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in kept}
    n_src1 = docs.filter(F.col("source") == "src1").count()
    assert by_src.get("src1") == n_src1  # 100% kept
    assert "src2" not in by_src  # 0% kept
    # default strata keep ~40% (25 docs each — loose band)
    others = {k: v for k, v in by_src.items() if k != "src1"}
    assert others and all(1 <= v <= 24 for v in others.values())
    # layout-independence: a repartitioned input keeps the identical id set
    ids_a = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids_b = {
        r["doc_id"]
        for r in stratified_hash_sample(docs.repartition(17), rates, default_pct=40)
        .select("doc_id")
        .collect()
    }
    assert ids_a == ids_b


# -- sequence packing --------------------------------------------------------

def test_pack_sequences_spans_and_chunks(spark):
    from logflow_spark.operators.packing import pack_sequences

    # one shard (n_shards=1) so the stream is globally ordered by doc_id
    docs = spark.createDataFrame(
        [(1, "t " * 300), (2, "t " * 300), (3, "t " * 100), (4, "")],
        "doc_id long, text string",
    )
    got = _rows(
        pack_sequences(docs, seq_len=512, n_shards=1),
        "doc_id", "start_off", "end_off", "chunk_first", "chunk_last",
    )
    assert got == {
        (1, 0, 300, 0, 0),
        (2, 300, 600, 0, 1),   # crosses the 512 boundary
        (3, 600, 700, 1, 1),
        # doc 4 is empty → excluded
    }


def test_pack_sequences_shards_are_independent(spark):
    from logflow_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pack_sequences(docs, seq_len=512, n_shards=8)
    # per shard: offsets are contiguous (start of doc k = end of doc k-1)
    pdf = out.toPandas().sort_values(["shard", "doc_id"])
    for _, g in pdf.groupby("shard"):
        starts = g["start_off"].to_numpy()
        ends = g["end_off"].to_numpy()
        assert starts[0] == 0
        assert (starts[1:] == ends[:-1]).all()
        assert (g["chunk_first"] == g["start_off"] // 512).all()


def test_pack_sequences_single_exchange_by_shard(spark):
    from logflow_spark.operators.packing import pack_sequences

    import re

    from tests.test_plan_properties import _plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s = _plan(pack_sequences(docs, seq_len=512, n_shards=8))
    # exactly one shuffle, keyed by shard — the parallel-packing shape
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 1
    assert "hashpartitioning(shard" in s
