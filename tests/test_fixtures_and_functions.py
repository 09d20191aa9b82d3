"""Determinism of fixtures + the per-row extraction invariant (byte identity)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from logflow_spark.fixtures.pages import pages_pandas, pages_spark_df
from logflow_spark.functions.text import (
    _extract_text_series,
    extract_text_py,
    extract_text_udf,
    host_py,
)
from logflow_spark.operators.windows import with_host


def test_pages_pandas_deterministic():
    a = pages_pandas(0, 500)
    b = pages_pandas(0, 500)
    pd.testing.assert_frame_equal(a, b)
    # text column IS extract_text_py(html) — the invariant at generation time
    for h, t in zip(a["html"], a["text"]):
        assert extract_text_py(h) == t


def test_pages_spark_matches_pandas(spark):
    sdf = pages_spark_df(spark, 300, num_partitions=4).orderBy("url")
    got = sdf.toPandas().sort_values("url").reset_index(drop=True)
    exp = pages_pandas(0, 300).sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(exp["url"])
    assert list(got["text"]) == list(exp["text"])
    assert [bytes(x) for x in got["html"]] == list(exp["html"])
    assert list(got["warc_ts"]) == list(exp["warc_ts"])


def test_vectorized_extraction_matches_pure_python():
    df = pages_pandas(0, 1000)
    got = _extract_text_series(df["html"])
    for g, h in zip(got, df["html"]):
        assert g == extract_text_py(h)


def test_extract_text_udf_byte_identity(spark):
    """Engine UDF output == stored text column, for every url (input_hint)."""
    sdf = pages_spark_df(spark, 1000, num_partitions=4)
    mismatches = (
        sdf.withColumn("extracted", extract_text_udf(F.col("html")))
        .filter(~(F.col("extracted") == F.col("text")))
        .count()
    )
    assert mismatches == 0


def test_host_expr_matches_python(spark):
    sdf = with_host(pages_spark_df(spark, 500, num_partitions=2))
    rows = sdf.select("url", "host").collect()
    assert len(rows) == 500
    for r in rows:
        assert r["host"] == host_py(r["url"])
        assert r["host"].startswith("h")


def test_null_html_handled(spark):
    from logflow_spark.schema import PAGES_SCHEMA

    from datetime import datetime

    df = spark.createDataFrame(
        [("https://a.com/1", datetime(2025, 1, 15), None, None, "en")],
        schema=PAGES_SCHEMA,
    )
    out = df.select(extract_text_udf(F.col("html")).alias("t")).collect()
    assert out[0]["t"] is None
