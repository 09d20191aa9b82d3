"""Streaming curation drain: gate + first-wins dedup with PLANTED
duplicates — the one test in the suite where dropDuplicatesWithinWatermark
must actually DROP rows (the shared pages fixtures are all-distinct, so
every other dedup test would stay green even if the state key were wrong).
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import CACHE


@pytest.fixture(scope="module")
def dup_pages_dir(spark):
    """3 replay chunks; chunk 1 and 2 repeat half of chunk 0's texts (new
    urls, later timestamps) — re-crawl shape. Plus low-quality rows that
    must die at the gate, and the flush sentinel."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logflow_spark.fixtures.pages import (
        ARROW_SCHEMA,
        BASE_TS_US,
        flush_sentinel_table,
    )

    out = os.path.join(CACHE, "pages_curate_dups")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)

    good = [
        "the quality of a corpus is measured in the tokens it keeps and the "
        "noise it is able to drop during curation of the crawl " + str(i)
        for i in range(40)
    ]  # ≥30 tokens, stopword-rich → passes the gate
    bad = ["junk !!! ###"] * 5  # fails min_tokens and quality

    def chunk(texts, ts0, c):
        n = len(texts)
        tbl = pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "url": [f"https://h{c}.example.com/p/{i}" for i in range(n)],
                    "warc_ts": pd.Series(
                        np.array(
                            [BASE_TS_US + (ts0 + i) * 1_000_000 for i in range(n)],
                            dtype="int64",
                        ).view("datetime64[us]")
                    ),
                    "html": pd.Series([None] * n, dtype="object"),
                    "text": pd.Series(texts, dtype="object"),
                    "lang": ["en"] * n,
                }
            ),
            schema=ARROW_SCHEMA,
            preserve_index=False,
        )
        path = os.path.join(out, f"chunk-{c:05d}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + c, 1_700_000_000 + c))

    chunk(good + bad, 0, 0)
    chunk(good[:20] + bad, 600, 1)  # 20 exact re-crawls + more junk
    chunk(good[10:30], 1200, 2)  # 20 more re-crawls
    flush = os.path.join(out, "chunk-00003-flush.parquet")
    pq.write_table(flush_sentinel_table(), flush)
    os.utime(flush, (1_700_000_003, 1_700_000_003))
    return out


def test_streaming_curate_drops_planted_dups_and_junk(spark, dup_pages_dir):
    from logflow_spark.sources.replay import pages_replay_stream
    from logflow_spark.streaming.curation_stream import streaming_curate

    ckpt = os.path.join(CACHE, "curate_ckpt")
    out_dir = os.path.join(CACHE, "curate_out")
    for p in (ckpt, out_dir):
        shutil.rmtree(p, ignore_errors=True)

    stream = pages_replay_stream(spark, dup_pages_dir, max_files_per_trigger=1)
    q = (
        streaming_curate(stream, watermark="73 hours", min_tokens=20)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # raise on timeout instead of reading a partial snapshot (a throttled
    # host would otherwise surface as a confusing row-count diff)
    assert q.awaitTermination(300), "streaming drain still running after 300s"
    got = spark.read.parquet(out_dir)
    rows = got.collect()
    # 80 good arrivals (90 incl. junk) collapse to exactly the 40 texts:
    # the 40 re-crawled duplicates are dropped by keyed state ACROSS
    # micro-batches, the 10 junk rows die at the gate
    assert len(rows) == 40
    assert len({r["digest"] for r in rows}) == 40
    assert all(r["n_tokens"] >= 20 for r in rows)
    assert all(r["quality_e6"] >= 450_000 for r in rows)
    assert all(r["lang_pred"] == "en" for r in rows)  # stopword-rich fixture


def test_streaming_curate_gate_precedes_stateful_dedup(spark, dup_pages_dir):
    """Plan shape: the quality/token filter must sit BELOW (upstream of)
    the dropDuplicatesWithinWatermark state operator, so rejected rows
    never enter keyed state."""
    from logflow_spark.schema import PAGES_SCHEMA
    from logflow_spark.streaming.curation_stream import streaming_curate

    from tests.test_plan_properties import _explain

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(dup_pages_dir)
    plan = _explain(streaming_curate(stream), "extended")
    analyzed = plan.split("== Analyzed Logical Plan ==")[1]
    dedup_at = analyzed.find("DeduplicateWithinWatermark")
    filter_at = analyzed.find("Filter ((quality_e6")
    assert dedup_at != -1 and filter_at != -1
    # in the printed tree, downstream operators appear FIRST: the dedup
    # node must print before (above) the gate filter it consumes
    assert dedup_at < filter_at
