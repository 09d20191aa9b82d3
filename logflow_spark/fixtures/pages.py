"""`pages` — Common-Crawl-style web-page fixture (FIXTURES.md §1).

Columns (url string, warc_ts timestamp[us], html binary, text string,
lang string). Deterministic in the row index i:

- url      = https://{host}/p/{i}, host drawn from a pool of H hosts
             ``h{k}.example-{k%37}.com``; the skew variant routes
             ``skew_frac`` of rows to host 0 (hot host).
- warc_ts  = 2025-01-15T00:00:00Z + (i*137) % 72h  (out-of-order in row
             order); the late variant shifts every ``late_every``-th row
             back by ``late_by_s`` seconds.
- html     = <html><head><title>doc {i}</title></head><body><p>s0</p>
             <p>s1</p></body></html>, sentences from a fixed 256-word vocab.
- text     = exactly extract_text_py(html) — the per-row invariant.
- lang     = [en de fr es hi zh][i % 6].

Generation is replicated in three places that MUST agree byte-for-byte:
`pages_pandas` (driver/oracle path), `pages_spark_df` (distributed
mapInPandas path calling the same function per index range), and the
chunked-parquet writer used for stream replay.
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import datetime, timezone
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = tuple(f"word{k:03d}" for k in range(256))
BASE_TS_US = int(
    datetime(2025, 1, 15, 0, 0, 0, tzinfo=timezone.utc).timestamp() * 1_000_000
)
SPAN_S = 72 * 3600
LANGS = ("en", "de", "fr", "es", "hi", "zh")
ARROW_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us"), nullable=False),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def sentence(i: int, j: int) -> str:
    start = (i * 31 + j * 17) % 256
    length = 8 + ((i * 7 + j * 13) % 17)  # 8..24 words
    return " ".join(VOCAB[(start + m * 11) % 256] for m in range(length))


def host_for(i: int, n_hosts: int = 1000, skew_frac: float = 0.0) -> str:
    # Skew variant: a deterministic skew_frac share of rows hits host 0.
    if skew_frac > 0.0 and (i % 1000) < int(skew_frac * 1000):
        k = 0
    else:
        k = i % n_hosts
    return f"h{k}.example-{k % 37}.com"


def ts_us_for(i: int, late_every: int = 0, late_by_s: int = 2700) -> int:
    off = (i * 137) % SPAN_S
    if late_every and i % late_every == 0 and i > 0:
        off = max(0, off - late_by_s)
    return BASE_TS_US + off * 1_000_000


def pages_pandas(
    start: int,
    end: int,
    n_hosts: int = 1000,
    skew_frac: float = 0.0,
    late_every: int = 0,
    late_by_s: int = 2700,
) -> pd.DataFrame:
    """Rows [start, end) as a pandas frame — the canonical generator."""
    idx = range(start, end)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in idx:
        host = host_for(i, n_hosts, skew_frac)
        s0, s1 = sentence(i, 0), sentence(i, 1)
        title = f"doc {i}"
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{s0}</p><p>{s1}</p></body></html>"
        ).encode("utf-8")
        urls.append(f"https://{host}/p/{i}")
        tss.append(ts_us_for(i, late_every, late_by_s))
        htmls.append(html)
        texts.append(f"{title}\n{s0}\n{s1}")
        langs.append(LANGS[i % 6])
    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="object"),
            "warc_ts": pd.Series(
                np.array(tss, dtype="int64").view("datetime64[us]")
            ),
            "html": pd.Series(htmls, dtype="object"),
            "text": pd.Series(texts, dtype="object"),
            "lang": pd.Series(langs, dtype="object"),
        }
    )


def pages_arrow(start: int, end: int, **kw) -> pa.Table:
    return pa.Table.from_pandas(
        pages_pandas(start, end, **kw), schema=ARROW_SCHEMA, preserve_index=False
    )


def pages_spark_df(spark, n_rows: int, num_partitions: int | None = None, **kw):
    """Distributed generation: spark.range → mapInPandas(pages_pandas).

    Each partition generates its own contiguous index range — no driver-side
    materialization, scales to any n_rows. Byte-identical to pages_pandas.
    """
    from logflow_spark.schema import PAGES_SCHEMA

    if num_partitions is None:
        num_partitions = max(1, min(64, n_rows // 50_000 + 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            ids = b["id"].to_numpy()
            yield pages_pandas(int(ids.min()), int(ids.max()) + 1, **kw)

    rng = spark.range(0, n_rows, 1, num_partitions)
    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def _atomic_dir_write(final_dir: str, write_fn) -> None:
    """Write into a tmp dir then atomically rename; idempotent via _SUCCESS."""
    if os.path.exists(os.path.join(final_dir, "_SUCCESS")):
        return
    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    write_fn(tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("")
    os.rename(tmp, final_dir)


FLUSH_LANG = "xx"  # sentinel rows are tagged with this lang
FLUSH_TS_US = BASE_TS_US + (SPAN_S + 75 * 3600) * 1_000_000


def flush_sentinel_table() -> pa.Table:
    """One far-future row appended as the final replay chunk.

    Append-mode windowed aggregation only emits a window once the watermark
    passes its end; with a drain-style run the last windows would otherwise
    never close. The sentinel advances the watermark beyond every real
    window (75h past span vs. the 73h max test watermark) — the streaming
    analog of an end-of-stream flush marker. Filter lang == FLUSH_LANG
    downstream.
    """
    return pa.Table.from_pandas(
        pd.DataFrame(
            {
                "url": ["https://flush.internal/p/-1"],
                "warc_ts": pd.Series(
                    np.array([FLUSH_TS_US], dtype="int64").view("datetime64[us]")
                ),
                "html": pd.Series([None], dtype="object"),
                "text": pd.Series([None], dtype="object"),
                "lang": [FLUSH_LANG],
            }
        ),
        schema=ARROW_SCHEMA,
        preserve_index=False,
    )


def ensure_pages_fixture(
    out_dir: str,
    n_rows: int,
    n_chunks: int = 1,
    n_hosts: int = 1000,
    skew_frac: float = 0.0,
    late_every: int = 0,
    late_by_s: int = 2700,
    flush_row: bool = False,
    drop_text: bool = False,
) -> str:
    """Materialize the fixture as n_chunks ordered parquet files (idempotent).

    Chunk c holds rows [c*sz, (c+1)*sz): row order is arrival order for the
    stream-replay source (maxFilesPerTrigger=1 → one chunk per micro-batch),
    so watermark progression is reproducible. File mtimes are set strictly
    increasing because Spark's file stream source orders by mtime.
    """

    def write(tmp: str) -> None:
        sz = (n_rows + n_chunks - 1) // n_chunks
        base = time.time() - n_chunks - 10
        for c in range(n_chunks):
            lo, hi = c * sz, min((c + 1) * sz, n_rows)
            if lo >= hi:
                break
            path = os.path.join(tmp, f"chunk-{c:05d}.parquet")
            tbl = pages_arrow(
                lo,
                hi,
                n_hosts=n_hosts,
                skew_frac=skew_frac,
                late_every=late_every,
                late_by_s=late_by_s,
            )
            if drop_text:
                # force the engine's extraction path: text arrives null and
                # must be recovered from html by the vectorized UDF
                tbl = tbl.set_column(
                    tbl.schema.get_field_index("text"),
                    ARROW_SCHEMA.field("text"),
                    pa.nulls(len(tbl), pa.string()),
                )
            pq.write_table(tbl, path, compression="zstd")
            os.utime(path, (base + c, base + c))
        if flush_row:
            path = os.path.join(tmp, f"chunk-{n_chunks:05d}-flush.parquet")
            pq.write_table(flush_sentinel_table(), path, compression="zstd")
            os.utime(path, (base + n_chunks, base + n_chunks))

    _atomic_dir_write(out_dir, write)
    return out_dir
