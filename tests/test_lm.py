"""Token-commonness (unigram perplexity proxy): semantics + plan shape."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def test_commonness_semantics(spark):
    """Hand-computable corpus: 'the' appears 4x, 'zq' once."""
    from logflow_spark.operators.lm import token_commonness

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "the the cat",  # the=4, cat=1 → mean (4+4+1)/3 = 3
                    "the dog",  # (4+1)/2 = 2.5
                    "the zq",  # (4+1)/2 = 2.5 ; zq rare
                ],
            }
        )
    )
    got = {
        r["doc_id"]: r
        for r in token_commonness(docs, rare_threshold=1).collect()
    }
    assert got[0]["commonness_e6"] == 3_000_000
    assert got[1]["commonness_e6"] == 2_500_000
    assert got[0]["n_tokens"] == 3
    # rare_frac with threshold 1: doc0 has cat (1/3), doc2 has zq (1/2)
    assert got[0]["rare_frac_e6"] == 333_333
    assert got[2]["rare_frac_e6"] == 500_000


def test_commonness_ranks_prose_above_garble(spark):
    from logflow_spark.operators.lm import token_commonness

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prof = token_commonness(docs)
    # garbled singleton-token docs must score below the corpus median:
    # check the correlation direction via the extremes
    rows = prof.orderBy(F.desc("commonness_e6")).collect()
    assert rows[0]["rare_frac_e6"] <= rows[-1]["rare_frac_e6"]


def test_commonness_plan_two_shuffles_with_partials(spark):
    import contextlib
    import io
    import re

    from logflow_spark.operators.lm import token_commonness

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        token_commonness(docs).explain("formatted")
    s = buf.getvalue()
    # vocab agg on token + final agg on doc_id — and nothing else
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 2
    assert "partial_count" in s and "partial_sum" in s
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s
