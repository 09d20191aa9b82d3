"""Large deterministic documents corpus for batch-operator scaling runs.

The driver's documents.parquet tops out at 5k rows — three orders short of
a scaling measurement. This generator synthesizes a corpus with the same
(doc_id, text) shape at millions of rows, fully deterministic (id-keyed
affine PRNG, no RNG state), with planted boilerplate: every
``boilerplate_every``-th document carries one shared 10-token span, so a
span-dedup pass has a realistic repeated-content fraction (~20%) instead
of a degenerate all-unique or all-dup corpus.

Vectorized generation (numpy token-index matrix → vocab lookup → row
join), chunked parquet writes, idempotent via a parameter-fingerprint
marker.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 1000
TOKENS_PER_DOC = 40
BOILER = ["b%02d" % i for i in range(10)]  # the shared 10-token span


def ensure_docs_corpus(
    out_dir: str,
    n_rows: int,
    n_chunks: int = 16,
    boilerplate_every: int = 5,
) -> str:
    fingerprint = f"{n_rows}|{n_chunks}|{boilerplate_every}|{TOKENS_PER_DOC}"
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        with open(done) as f:
            if f.read() == fingerprint:
                return out_dir
        for name in os.listdir(out_dir):
            os.remove(os.path.join(out_dir, name))
    os.makedirs(out_dir, exist_ok=True)
    vocab = np.array(["w%03d" % i for i in range(VOCAB_SIZE)])
    per = -(-n_rows // n_chunks)
    for c in range(n_chunks):
        lo, hi = c * per, min((c + 1) * per, n_rows)
        if lo >= hi:
            break
        ids = np.arange(lo, hi, dtype=np.uint64)
        # splitmix-style avalanche per (id, pos) -> token index. A plain
        # affine (id*K + pos*J) % V is degenerate: ids congruent mod V
        # yield IDENTICAL documents, making every span a duplicate.
        h = (
            ids[:, None] * np.uint64(6364136223846793005)
            + np.arange(TOKENS_PER_DOC, dtype=np.uint64)[None, :]
            * np.uint64(1442695040888963407)
        )
        h ^= h >> np.uint64(31)
        h *= np.uint64(2685821657736338717)
        idx = ((h >> np.uint64(20)) % np.uint64(VOCAB_SIZE)).astype(np.int64)
        ids = ids.astype(np.int64)
        words = vocab[idx]
        boiler_mask = ids % boilerplate_every == 0
        words[boiler_mask, 20:30] = BOILER
        texts = [" ".join(row) for row in words]
        tbl = pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        pq.write_table(
            tbl, os.path.join(out_dir, f"chunk-{c:03d}.parquet"),
            compression="zstd",
        )
    with open(done, "w") as f:
        f.write(fingerprint)
    return out_dir
