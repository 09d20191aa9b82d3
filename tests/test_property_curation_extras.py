"""Property-based checks (hypothesis) for the round-2 training-pipeline
operators, against brute-force pure-Python oracles on randomized corpora.
Complements the fixed-fixture tests in test_curation_extras.py and the
sf0.01 DuckDB gate: these explore short/empty/repetitive documents where
off-by-one shingle/window bugs live.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = ["a", "b", "cc", "ddd", "e1", "zz"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _grams(text: str, n: int) -> set[str]:
    toks = [t.lower() for t in text.split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(max_examples=12, deadline=None)
@given(texts=doc_strategy, n=st.integers(min_value=1, max_value=4))
def test_decontaminate_matches_python_oracle(spark, texts, n):
    from logflow_spark.operators.decontam import decontaminate

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # benchmark = first doc's text (may be empty → zero grams → no hits)
    bench = spark.createDataFrame([(0, texts[0])], "eval_id long, eval_text string")
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate(docs, bench, n=n).collect()
    }
    bench_grams = _grams(texts[0], n)
    for i, t in enumerate(texts):
        hits = len(_grams(t, n) & bench_grams)
        assert got[i] == (hits, hits > 0), (i, t, texts[0], n)


@settings(max_examples=12, deadline=None)
@given(texts=doc_strategy, seq_len=st.integers(min_value=1, max_value=16))
def test_pack_sequences_conserves_tokens(spark, texts, seq_len):
    from logflow_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = pack_sequences(docs, seq_len=seq_len, n_shards=2).collect()
    n_tok = {i: len([w for w in t.split() if w]) for i, t in enumerate(texts)}
    # only non-empty docs appear; token counts and spans agree
    assert {r["doc_id"] for r in rows} == {i for i, c in n_tok.items() if c > 0}
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r["n_tokens"] == n_tok[r["doc_id"]]
        assert r["end_off"] - r["start_off"] == r["n_tokens"]
        assert r["chunk_first"] == r["start_off"] // seq_len
        assert r["chunk_last"] == (r["end_off"] - 1) // seq_len
        by_shard.setdefault(r["shard"], []).append(r)
    for srows in by_shard.values():
        srows.sort(key=lambda r: r["doc_id"])
        # contiguous: the shard's stream has no gaps and no overlaps
        assert srows[0]["start_off"] == 0
        for prev, cur in zip(srows, srows[1:]):
            assert cur["start_off"] == prev["end_off"]


@settings(max_examples=12, deadline=None)
@given(texts=doc_strategy)
def test_repetition_profile_matches_python_oracle(spark, texts):
    from logflow_spark.operators.textstats import repetition_profile

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in repetition_profile(docs).collect()}

    def e6(num: int, den: int) -> int:
        import math

        return math.floor(num / den * 1e6 + 0.5) if den > 0 else 0

    for i, t in enumerate(texts):
        toks = [w for w in t.split() if w]
        bgs = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        mode = max((toks.count(w) for w in set(toks)), default=0)
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert r["dup_token_frac_e6"] == e6(len(toks) - len(set(toks)), len(toks))
        assert r["dup_bigram_frac_e6"] == e6(len(bgs) - len(set(bgs)), len(bgs))
        assert r["top_token_frac_e6"] == e6(mode, len(toks))
