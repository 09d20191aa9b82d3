"""Deterministic scaling-corpus generator (fixtures/docs_corpus.py):
shape, planted-boilerplate fraction, non-degeneracy (the avalanche mix —
a plain affine hash made ids congruent mod |vocab| identical documents),
and fingerprint-keyed idempotent rebuild."""

from __future__ import annotations

import glob
import os

import duckdb

from logflow_spark.fixtures.docs_corpus import TOKENS_PER_DOC, ensure_docs_corpus
from tests.conftest import CACHE


def _q(path: str, sql: str):
    return duckdb.connect().execute(
        sql.replace("{T}", f"read_parquet('{path}/*.parquet')")
    ).fetchone()


def test_corpus_shape_and_boilerplate():
    p = ensure_docs_corpus(
        os.path.join(CACHE, "docs_corpus_unit"), n_rows=5000, n_chunks=2
    )
    n, lo, hi = _q(p, "SELECT count(*), min(len(string_split(text,' '))), max(len(string_split(text,' '))) FROM {T}")
    assert (n, lo, hi) == (5000, TOKENS_PER_DOC, TOKENS_PER_DOC)
    (n_boiler,) = _q(p, "SELECT count(*) FROM {T} WHERE text LIKE '%b00 b01 b02%'")
    assert n_boiler == 1000  # every 5th doc
    # non-degenerate: all non-boilerplate docs are distinct
    (n_distinct,) = _q(p, "SELECT count(DISTINCT text) FROM {T}")
    assert n_distinct == 5000


def test_corpus_idempotent_and_param_rebuild():
    out = os.path.join(CACHE, "docs_corpus_unit2")
    p = ensure_docs_corpus(out, n_rows=1000, n_chunks=2)
    mtimes = {f: os.path.getmtime(f) for f in glob.glob(p + "/*.parquet")}
    assert ensure_docs_corpus(out, n_rows=1000, n_chunks=2) == p
    assert mtimes == {f: os.path.getmtime(f) for f in glob.glob(p + "/*.parquet")}
    ensure_docs_corpus(out, n_rows=1500, n_chunks=2)  # param change -> rebuild
    (n,) = _q(p, "SELECT count(*) FROM {T}")
    assert n == 1500
