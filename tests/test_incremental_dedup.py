"""Incremental dedup (operators/incremental.py): batch-vs-corpus verdicts
with planted exact and near duplicates, exact-precedence, and the
batch-internal-duplicates-not-flagged contract."""

from __future__ import annotations

import hashlib

import pytest

from logflow_spark.operators.incremental import incremental_dedup

MOD, BUCKET = 10, 0


def _is_new(i: int) -> bool:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % MOD == BUCKET


@pytest.fixture(scope="module")
def ids():
    new = [i for i in range(400) if _is_new(i)]
    old = [i for i in range(400) if not _is_new(i)]
    assert len(new) >= 4 and len(old) >= 4
    return new, old


def _base(tag: int) -> str:
    return " ".join(f"t{tag}w{k}" for k in range(30))


def test_incremental_verdicts(spark, ids):
    new, old = ids
    rows = [
        (new[0], _base(1)),            # exact dup of old[0]
        (old[0], _base(1)),
        (new[1], _base(2) + " edited"),  # near dup of old[1] (j ≈ 0.87)
        (old[1], _base(2) + " orig"),
        (new[2], _base(3)),            # genuinely new
        (old[2], _base(4)),            # unrelated corpus doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in incremental_dedup(df).collect()}
    assert set(out) == {new[0], new[1], new[2]}  # corpus rows absent
    assert out[new[0]]["verdict"] == "exact_dup"
    assert out[new[0]]["dup_of"] == old[0]
    assert out[new[1]]["verdict"] == "near_dup"
    assert out[new[1]]["dup_of"] == old[1]
    assert out[new[2]]["verdict"] == "new"
    assert out[new[2]]["dup_of"] == -1


def test_exact_precedence_and_min_dup_of(spark, ids):
    new, old = ids
    # new[0] is exact-dup of TWO corpus docs -> dup_of = min corpus id;
    # it is also trivially a near-dup (j = 1.0) -> exact verdict wins
    rows = [
        (new[0], _base(7)),
        (old[2], _base(7)),
        (old[3], _base(7)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in incremental_dedup(df).collect()}
    assert out[new[0]]["verdict"] == "exact_dup"
    assert out[new[0]]["dup_of"] == min(old[2], old[3])


def test_batch_internal_dups_not_flagged(spark, ids):
    new, old = ids
    rows = [(new[0], _base(9)), (new[1], _base(9)), (old[0], _base(5))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in incremental_dedup(df).collect()}
    assert out[new[0]]["verdict"] == "new"
    assert out[new[1]]["verdict"] == "new"
