"""First-fit-decreasing packing: exact compare vs an independent Python
implementation, packing invariants, and layout independence."""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
SEQ_LEN = 512


def _reference_ffd(docs: pd.DataFrame, seq_len: int, n_shards: int) -> set:
    """Independent FFD reference: dict-of-lists bins, per shard."""
    out = set()
    docs = docs.copy()
    docs["n_tokens"] = docs["text"].map(lambda t: len((t or "").split()))
    docs = docs[docs["n_tokens"] > 0]
    docs["shard"] = docs["doc_id"] % n_shards
    for shard, grp in docs.groupby("shard"):
        order = sorted(
            grp[["doc_id", "n_tokens"]].itertuples(index=False),
            key=lambda r: (-r.n_tokens, r.doc_id),
        )
        bins: list[int] = []
        assign: dict[int, int] = {}
        for r in order:
            placed = next(
                (b for b, fill in enumerate(bins) if fill + r.n_tokens <= seq_len),
                None,
            )
            if placed is None:
                placed = len(bins)
                bins.append(0)
            bins[placed] += r.n_tokens
            assign[r.doc_id] = placed
        for r in order:
            b = assign[r.doc_id]
            out.add((int(shard), int(r.doc_id), int(r.n_tokens), int(b), int(bins[b])))
    return out


@pytest.fixture(scope="module")
def docs_pdf():
    return pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_ffd_matches_independent_reference(spark, docs_pdf):
    from logflow_spark.operators.packing import pack_sequences_ffd

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r["shard"], r["doc_id"], r["n_tokens"], r["bin_id"], r["bin_fill"])
        for r in pack_sequences_ffd(docs, seq_len=SEQ_LEN, n_shards=8).collect()
    }
    assert got == _reference_ffd(docs_pdf, SEQ_LEN, 8)
    assert len(got) > 100


def test_ffd_invariants_and_beats_naive(spark):
    """Bins never exceed capacity (except oversized singletons), docs are
    whole (one row per doc), and FFD's bin count is within the classic
    11/9·OPT+1 bound of the fill lower bound per shard."""
    from pyspark.sql import functions as F

    from logflow_spark.operators.packing import pack_sequences_ffd

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pack_sequences_ffd(docs, seq_len=SEQ_LEN, n_shards=8).cache()
    try:
        assert out.groupBy("doc_id").count().filter("count > 1").count() == 0
        over = out.filter(F.col("bin_fill") > SEQ_LEN)
        # oversized bins must be singleton long docs
        assert over.filter(F.col("n_tokens") <= SEQ_LEN).count() == 0
        per_bin = over.groupBy("shard", "bin_id").count()
        assert per_bin.filter("count > 1").count() == 0

        stats = (
            out.filter(F.col("n_tokens") <= SEQ_LEN)
            .groupBy("shard")
            .agg(
                F.count_distinct("bin_id").alias("n_bins"),
                F.sum("n_tokens").alias("total"),
            )
            .collect()
        )
        for r in stats:
            lower = -(-r["total"] // SEQ_LEN)  # ceil: fill lower bound
            assert r["n_bins"] <= (11 * lower) // 9 + 1
    finally:
        out.unpersist()


def test_ffd_layout_independent(spark):
    """Repartitioning the input must not change any assignment (determinism
    depends only on ids and token counts, not partition layout)."""
    from logflow_spark.operators.packing import pack_sequences_ffd

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {
        tuple(r)
        for r in pack_sequences_ffd(docs, seq_len=SEQ_LEN, n_shards=8).collect()
    }
    b = {
        tuple(r)
        for r in pack_sequences_ffd(
            docs.repartition(17, "text"), seq_len=SEQ_LEN, n_shards=8
        ).collect()
    }
    assert a == b
