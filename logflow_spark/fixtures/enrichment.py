"""`host_enrichment` — per-host enrichment stream fixture (FIXTURES.md §2).

For host k, updates arrive at t0 + k*61s + m*3600s (m = update index within
the 72h span), category cycles a 5-value list, score = ((k*m) % 1000)/1000.
Multiple updates per host exercise "latest state wins" in the stateful join.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from logflow_spark.fixtures.pages import BASE_TS_US, SPAN_S, _atomic_dir_write

CATEGORIES = ("news", "shop", "blog", "docs", "social")

ARROW_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string(), nullable=False),
        pa.field("ts", pa.timestamp("us"), nullable=False),
        pa.field("category", pa.string()),
        pa.field("score", pa.float64()),
    ]
)


def enrichment_pandas(n_hosts: int = 1000) -> pd.DataFrame:
    """All enrichment rows for hosts 0..n_hosts-1, sorted by ts (arrival order)."""
    hosts, tss, cats, scores = [], [], [], []
    for k in range(n_hosts):
        m = 0
        while True:
            off = k * 61 + m * 3600
            if off >= SPAN_S:
                break
            hosts.append(f"h{k}.example-{k % 37}.com")
            tss.append(BASE_TS_US + off * 1_000_000)
            cats.append(CATEGORIES[(k + m) % 5])
            scores.append(round(((k * m) % 1000) / 1000, 3))
            m += 1
    df = pd.DataFrame(
        {
            "host": pd.Series(hosts, dtype="object"),
            "ts": pd.Series(np.array(tss, dtype="int64").view("datetime64[us]")),
            "category": pd.Series(cats, dtype="object"),
            "score": pd.Series(scores, dtype="float64"),
        }
    )
    return df.sort_values(["ts", "host"], kind="mergesort").reset_index(drop=True)


def ensure_enrichment_fixture(
    out_dir: str, n_hosts: int = 1000, n_chunks: int = 1
) -> str:
    """Materialize as n_chunks ts-ordered parquet files (stream replay)."""

    def write(tmp: str) -> None:
        df = enrichment_pandas(n_hosts)
        sz = (len(df) + n_chunks - 1) // n_chunks
        base = time.time() - n_chunks - 10
        for c in range(n_chunks):
            part = df.iloc[c * sz : (c + 1) * sz]
            if len(part) == 0:
                break
            path = os.path.join(tmp, f"chunk-{c:05d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(part, schema=ARROW_SCHEMA, preserve_index=False),
                path,
                compression="zstd",
            )
            os.utime(path, (base + c, base + c))

    _atomic_dir_write(out_dir, write)
    return out_dir
