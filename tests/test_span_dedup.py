"""Span-level (C4-style) dedup: window shapes, corpus-wide removal rule,
order-preserving reassembly, and left-join totals for empty docs."""

from __future__ import annotations

import hashlib

from logflow_spark.operators.spandedup import span_dedup, spans_df


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _docs(spark):
    shared = " ".join(f"s{k}" for k in range(10))  # one full shared span
    rows = [
        (1, shared + " k"),            # spans: shared, "k"
        (2, shared + " z"),            # spans: shared, "z"
        (3, " ".join(f"u{k}" for k in range(12))),  # unique: 10-tok + 2-tok
        (4, ""),                       # no tokens -> no spans
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_spans_windows_and_partial_tail(spark):
    got = {
        (r["doc_id"], r["pos"]): r["span"]
        for r in spans_df(_docs(spark), span_tokens=10).collect()
    }
    shared = " ".join(f"s{k}" for k in range(10))
    assert got[(1, 0)] == shared and got[(1, 1)] == "k"
    assert got[(3, 1)] == "u10 u11"  # partial tail kept
    assert (4, 0) not in got  # empty doc yields zero spans


def test_span_dedup_removes_corpus_wide_repeats(spark):
    out = {r["doc_id"]: r for r in span_dedup(_docs(spark)).collect()}
    assert len(out) == 4  # every input doc gets a row
    # the shared span is dropped from BOTH docs; the unique tails survive
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (1, 1)
    assert out[1]["clean_digest"] == _md5("k")
    assert out[2]["clean_digest"] == _md5("z")
    # doc 3 untouched: both spans unique, reassembled in order
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (2, 0)
    assert out[3]["clean_digest"] == _md5(
        " ".join(f"u{k}" for k in range(12))
    )
    # empty doc: zero spans, digest of ''
    assert (out[4]["n_kept"], out[4]["n_dropped"]) == (0, 0)
    assert out[4]["clean_digest"] == _md5("")


def test_span_dedup_min_dup_3_keeps_twice_repeated(spark):
    out = {r["doc_id"]: r for r in span_dedup(_docs(spark), min_dup=3).collect()}
    assert out[1]["n_dropped"] == 0  # count 2 < 3 -> kept
