"""Merged tagged stream fixture for the stateful as-of join test.

Pages and enrichment rows are unioned into the MERGED_SCHEMA shape, globally
sorted by (event time, tag) with enrichment-before-page at equal times, and
chunked. Replayed with maxFilesPerTrigger=1 this gives a deterministic,
time-ordered arrival — the regime in which the bounded-state as-of join is
exact (every page's matching enrichment has already arrived).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from logflow_spark.fixtures.enrichment import enrichment_pandas
from logflow_spark.fixtures.pages import _atomic_dir_write, pages_pandas
from logflow_spark.functions.text import host_py

MERGED_ARROW_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string(), nullable=False),
        pa.field("t", pa.timestamp("us"), nullable=False),
        pa.field("is_page", pa.int64(), nullable=False),
        pa.field("url", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("category", pa.string()),
        pa.field("score", pa.float64()),
    ]
)


def merged_join_pandas(n_pages: int, n_hosts: int) -> pd.DataFrame:
    pages = pages_pandas(0, n_pages, n_hosts=n_hosts)
    enr = enrichment_pandas(n_hosts)
    p = pd.DataFrame(
        {
            "host": pages["url"].map(host_py),
            "t": pages["warc_ts"],
            "is_page": np.int64(1),
            "url": pages["url"],
            "lang": pages["lang"],
            "category": pd.Series([None] * len(pages), dtype="object"),
            "score": pd.Series([np.nan] * len(pages), dtype="float64"),
        }
    )
    e = pd.DataFrame(
        {
            "host": enr["host"],
            "t": enr["ts"],
            "is_page": np.int64(0),
            "url": pd.Series([None] * len(enr), dtype="object"),
            "lang": pd.Series([None] * len(enr), dtype="object"),
            "category": enr["category"],
            "score": enr["score"],
        }
    )
    m = pd.concat([p, e], ignore_index=True)
    return m.sort_values(["t", "is_page", "host", "url"], kind="mergesort").reset_index(
        drop=True
    )


def ensure_merged_join_fixture(
    out_dir: str, n_pages: int = 2000, n_hosts: int = 200, n_chunks: int = 6
) -> str:
    def write(tmp: str) -> None:
        df = merged_join_pandas(n_pages, n_hosts)
        sz = (len(df) + n_chunks - 1) // n_chunks
        base = time.time() - n_chunks - 10
        for c in range(n_chunks):
            part = df.iloc[c * sz : (c + 1) * sz]
            if len(part) == 0:
                break
            path = os.path.join(tmp, f"chunk-{c:05d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(
                    part, schema=MERGED_ARROW_SCHEMA, preserve_index=False
                ),
                path,
                compression="zstd",
            )
            os.utime(path, (base + c, base + c))

    _atomic_dir_write(out_dir, write)
    return out_dir
