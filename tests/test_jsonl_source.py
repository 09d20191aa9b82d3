"""JSONL page source (sources/jsonl.py): typed projection, base64 html
round-trip, corrupt-line and missing-url drop contract, and
batch == streaming frame parity."""

from __future__ import annotations

import base64
import json
import os
import shutil

from logflow_spark.sources.jsonl import pages_jsonl, pages_jsonl_stream
from tests.conftest import CACHE


def _fixture(name: str) -> tuple[str, bytes]:
    html = b"<html><body>\x00\xff binary ok</body></html>"
    rows = [
        {
            "url": "https://a.example/x",
            "warc_ts": "2025-01-01 00:00:00",
            "html_b64": base64.b64encode(html).decode(),
            "text": "hello world",
            "lang": "en",
        },
        {
            "url": "https://b.example/y",
            "warc_ts": "2025-01-01 01:00:00",
            "html_b64": None,
            "text": "zweite seite",
            "lang": "de",
        },
        # missing url -> dropped
        {"warc_ts": "2025-01-01 02:00:00", "text": "orphan", "lang": "en"},
    ]
    d = os.path.join(CACHE, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    with open(os.path.join(d, "part-000.jsonl"), "w") as f:
        for r in rows[:2]:
            f.write(json.dumps(r) + "\n")
        f.write("{this is not json\n")  # corrupt -> dropped
        f.write(json.dumps(rows[2]) + "\n")
    return d, html


def test_batch_read_contract(spark):
    d, html = _fixture("jsonl_src_batch")
    got = {r["url"]: r for r in pages_jsonl(spark, d).collect()}
    assert set(got) == {"https://a.example/x", "https://b.example/y"}
    a = got["https://a.example/x"]
    assert bytes(a["html"]) == html  # base64 round-trip, binary-exact
    assert a["lang"] == "en" and a["warc_ts"].year == 2025
    assert got["https://b.example/y"]["html"] is None


def test_stream_matches_batch(spark):
    d, _ = _fixture("jsonl_src_stream")
    ckpt = os.path.join(CACHE, "jsonl_src_stream_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    rows: list = []
    q = (
        pages_jsonl_stream(spark, d, max_files_per_trigger=8)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    batch = pages_jsonl(spark, d).collect()
    key = lambda r: (r["url"], r["text"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, batch))
    assert len(rows) == 2
