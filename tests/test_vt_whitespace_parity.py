"""Cross-engine whitespace parity on the vertical tab (U+000B).

Java's \\s includes \\x0B; RE2's (DuckDB's regex engine) does not. Every
oracle regex therefore spells the Java set explicitly (SQL_JAVA_WS). These
tests pin the agreement on documents that actually contain VT — the input
class where the engines would otherwise drift on token counts, punct
counts, quality scores, fingerprints and shingle hashes."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

VT_DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the quick\x0bbrown fox and the lazy dog in a field of it",
            "a\x0b\x0bb of the and to in is it!!",
            "\x0bleading and trailing\x0b",
            "no vertical tab here, just the usual and of to in",
        ],
    }
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("documents", VT_DOCS)
    return con


def _compare_sets(spark_df, duck_rows, cols):
    got = {tuple(r[c] for c in cols) for r in spark_df.collect()}
    exp = {tuple(r) for r in duck_rows}
    assert got == exp


def test_text_profile_agrees_on_vt(spark, duck):
    from logflow_spark.operators.textstats import sql_text_profile, text_profile

    docs = spark.createDataFrame(VT_DOCS)
    cols = ["doc_id", "n_tokens", "n_bpe_tokens", "lang_pred", "quality_e6", "fingerprint"]
    _compare_sets(
        text_profile(docs).select(cols),
        duck.execute(sql_text_profile()).fetchall(),
        cols,
    )


def test_minhash_signatures_agree_on_vt(spark, duck):
    """Shingle tokenization must split on VT identically (Java \\s does)."""
    import __spark_entry__ as entry
    from logflow_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(VT_DOCS)
    sig = minhash_signatures(docs)
    cols = sig.columns
    _compare_sets(sig, duck.execute(entry._sql_minhash()).fetchall(), cols)


def test_pack_sequences_agrees_on_vt(spark, duck):
    from logflow_spark.operators.packing import pack_sequences, sql_pack_sequences

    docs = spark.createDataFrame(VT_DOCS)
    out = pack_sequences(docs, seq_len=8, n_shards=2)
    cols = out.columns
    _compare_sets(
        out, duck.execute(sql_pack_sequences(seq_len=8, n_shards=2)).fetchall(), cols
    )
