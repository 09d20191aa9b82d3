"""`funnel_events` — deterministic clickstream for the streaming CEP twins.

Schema (event_id:int64, ts:timestamp[us], user_id:int64, event_type:string)
— the column subset of the driver `events` table the funnel operators read.

Rows are strictly time-ordered in the row index (ts = BASE + i*7s + jitter<6s,
monotone), so chunk-per-micro-batch replay arrives in event-time order and a
small watermark never drops rows — the condition under which the streaming
absence detector must equal the batch ``funnel_absence`` oracle exactly.

Type mix is a fixed multiplicative-hash of the index (≈45% view / 30%
purchase / 25% click) over ``n_users`` interleaved users, which plants all
the interesting cases: views purchased within the horizon, views whose next
purchase falls outside it, views never purchased, purchases with no view.

The final replay chunk is a flush sentinel: ONE far-future `purchase` for
user -1. It passes the view/purchase type filter, so it advances the event
-time watermark past every real view's deadline (closing the absence
timers), while matching nothing — purchases are never emitted and user -1
has no views.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from logflow_spark.fixtures.pages import _atomic_dir_write

BASE_TS_US = 1_740_787_200_000_000  # 2025-03-01T00:00:00Z
STEP_US = 7 * 1_000_000
FLUSH_USER = -1

ARROW_SCHEMA = pa.schema(
    [
        pa.field("event_id", pa.int64(), nullable=False),
        pa.field("ts", pa.timestamp("us"), nullable=False),
        pa.field("user_id", pa.int64(), nullable=False),
        pa.field("event_type", pa.string(), nullable=False),
    ]
)


def events_spark_schema():
    """The Spark twin of ARROW_SCHEMA — single source of truth for every
    replay reader of this fixture (entry queries, CLI pipeline, tests)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    return StructType(
        [
            StructField("event_id", LongType(), True),
            StructField("ts", TimestampType(), True),
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
        ]
    )


def funnel_events_pandas(n: int, n_users: int = 37) -> pd.DataFrame:
    i = np.arange(n, dtype=np.int64)
    r = (i * 2654435761) % 100
    etype = np.where(r < 45, "view", np.where(r < 75, "purchase", "click"))
    ts = BASE_TS_US + i * STEP_US + (i * 13) % 6_000_000
    return pd.DataFrame(
        {
            "event_id": i,
            "ts": ts.view("datetime64[us]"),
            "user_id": i % n_users,
            "event_type": etype,
        }
    )


def flush_sentinel_pandas(n: int) -> pd.DataFrame:
    flush_us = BASE_TS_US + n * STEP_US + 10 * 24 * 3600 * 1_000_000
    return pd.DataFrame(
        {
            "event_id": np.array([-1], dtype=np.int64),
            "ts": np.array([flush_us], dtype="int64").view("datetime64[us]"),
            "user_id": np.array([FLUSH_USER], dtype=np.int64),
            "event_type": ["purchase"],
        }
    )


def ensure_funnel_events_fixture(
    out_dir: str, n_rows: int, n_chunks: int = 4, n_users: int = 37
) -> str:
    """Materialize time-ordered replay chunks + flush sentinel (idempotent)."""

    def write(tmp: str) -> None:
        pdf = funnel_events_pandas(n_rows, n_users=n_users)
        sz = (n_rows + n_chunks - 1) // n_chunks
        base = time.time() - n_chunks - 10
        for c in range(n_chunks):
            part = pdf.iloc[c * sz : min((c + 1) * sz, n_rows)]
            if not len(part):
                break
            path = os.path.join(tmp, f"chunk-{c:05d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(
                    part, schema=ARROW_SCHEMA, preserve_index=False
                ),
                path,
                compression="zstd",
            )
            os.utime(path, (base + c, base + c))
        path = os.path.join(tmp, f"chunk-{n_chunks:05d}-flush.parquet")
        pq.write_table(
            pa.Table.from_pandas(
                flush_sentinel_pandas(n_rows),
                schema=ARROW_SCHEMA,
                preserve_index=False,
            ),
            path,
            compression="zstd",
        )
        os.utime(path, (base + n_chunks, base + n_chunks))

    _atomic_dir_write(out_dir, write)
    return out_dir
