"""Chunked replay fixture derived from the driver's `documents` table:
the same corpus the batch dedup operators are oracled on, with a
deterministic ingest timestamp per doc, split into chunk files plus a
far-future flush row — the input shape the streaming near-dup operator
drains. Deriving (rather than synthesizing a new corpus) keeps the
streaming operator oracled against the SAME documents the batch twins
are: the DuckDB twin reads the `documents` view directly, because with a
horizon covering the ingest span the emitted pair set is independent of
the timestamps.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

# same 72h event-time span + base instant as the pages fixture
BASE_TS_US = 1735689600000000  # 2025-01-01 00:00:00 UTC
SPAN_S = 72 * 3600

ARROW_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64(), nullable=False),
        pa.field("ingest_ts", pa.timestamp("us"), nullable=False),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)


def doc_ts_us(doc_id: int) -> int:
    return BASE_TS_US + ((doc_id * 137) % SPAN_S) * 1_000_000


def ensure_docs_stream_fixture(
    out_dir: str, documents_parquet: str, n_chunks: int = 4
) -> str:
    """Idempotently materialize the replay chunks for one SF's documents."""
    import pandas as pd

    # idempotency is keyed on a fingerprint of the SOURCE parquet, not a
    # bare marker: if the driver regenerates documents.parquet, a stale
    # derived fixture would silently feed the stream while the oracle reads
    # the new table — a confusing row diff instead of a rebuild.
    st = os.stat(documents_parquet)
    fingerprint = f"{documents_parquet}|{st.st_size}|{st.st_mtime_ns}|{n_chunks}"
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        with open(done) as f:
            if f.read() == fingerprint:
                return out_dir
        # source changed — rebuild from scratch
        for name in os.listdir(out_dir):
            if name.endswith(".parquet") or name == "_SUCCESS":
                os.remove(os.path.join(out_dir, name))
    os.makedirs(out_dir, exist_ok=True)
    docs = pd.read_parquet(documents_parquet, columns=["doc_id", "text", "lang"])
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    docs["ingest_ts"] = pd.to_datetime(
        [doc_ts_us(int(i)) for i in docs["doc_id"]], unit="us"
    )
    n = len(docs)
    per = -(-n // n_chunks)
    for c in range(n_chunks):
        part = docs.iloc[c * per:(c + 1) * per]
        tbl = pa.Table.from_pydict(
            {
                "doc_id": part["doc_id"].astype("int64"),
                "ingest_ts": pa.Array.from_pandas(part["ingest_ts"]).cast(
                    pa.timestamp("us")
                ),
                "text": part["text"],
                "lang": part["lang"],
            },
            schema=ARROW_SCHEMA,
        )
        pq.write_table(
            tbl, os.path.join(out_dir, f"chunk-{c:03d}.parquet"),
            compression="zstd",
        )
    # far-future flush sentinel advances the watermark past every timer
    flush = pa.Table.from_pydict(
        {
            "doc_id": [-1],
            "ingest_ts": pa.array(
                [BASE_TS_US + 10 * 24 * 3600 * 1_000_000], pa.timestamp("us")
            ),
            "text": ["flush"],
            "lang": ["xx"],
        },
        schema=ARROW_SCHEMA,
    )
    pq.write_table(
        flush, os.path.join(out_dir, f"chunk-{n_chunks:03d}-flush.parquet"),
        compression="zstd",
    )
    with open(done, "w") as f:
        f.write(fingerprint)
    return out_dir
