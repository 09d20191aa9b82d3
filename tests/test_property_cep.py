"""Property-based CEP: random event streams, random chunking — the drained
absence and sequence outputs must equal the DuckDB forward-RANGE oracles
and exactly partition the view set, for ANY generated scenario.

Catches what fixed fixtures can't: microsecond ties between views and
purchases, multiple open views per user saved by one purchase, purchases
exactly on the closed +30min edge, users with purchase-only histories,
interleavings across chunk boundaries.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import CACHE
from tests.test_streaming_absence import ORACLE_SQL, _drain, _write_chunks
from tests.test_streaming_sequence import PAIRS_ORACLE_SQL, _drain_seq

BASE_US = 1_740_787_200_000_000  # 2025-03-01T00:00:00Z
MIN_US = 60 * 1_000_000


def _events(seed: int, n: int) -> pd.DataFrame:
    """Deterministic random scenario: ~8 users, events inside 3 hours with
    deliberate collision-prone timestamps (multiples of 30s plus 0/1µs
    jitter → ties and exact-boundary gaps are common)."""
    rng = np.random.RandomState(seed)
    user = rng.randint(0, 8, size=n)
    etype = rng.choice(["view", "purchase", "click"], size=n, p=[0.45, 0.3, 0.25])
    ts = BASE_US + rng.randint(0, 360, size=n) * 30_000_000 + rng.randint(
        0, 2, size=n
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("int64").view("datetime64[us]"),
            "user_id": user.astype("int64"),
            "event_type": etype,
        }
    )


def _sentinel() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_id": np.array([-1], dtype=np.int64),
            "ts": np.array(
                [BASE_US + 30 * 24 * 3600 * 1_000_000], dtype="int64"
            ).view("datetime64[us]"),
            "user_id": np.array([-1], dtype=np.int64),
            "event_type": ["purchase"],
        }
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_cep_random_streams_match_oracles_and_partition(spark, seed):
    rng = np.random.RandomState(seed ^ 0xC0FFEE)
    pdf = _events(seed, n=120)
    shuffled = pdf.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    n_chunks = int(rng.randint(2, 5))
    chunks = [
        shuffled.iloc[i::n_chunks].reset_index(drop=True) for i in range(n_chunks)
    ]
    chunks.append(_sentinel())
    fx = _write_chunks(f"cep_prop_{seed}", chunks)
    try:
        got_abs, _, _ = _drain(
            spark, fx, f"cep_prop_abs_{seed}", watermark="73 hours"
        )
        got_seq = _drain_seq(
            spark, fx, f"cep_prop_seq_{seed}", watermark="73 hours"
        )

        con = duckdb.connect()
        con.register("p", pdf)
        exp_abs = {tuple(r) for r in con.execute(ORACLE_SQL).fetchall()}
        exp_seq = {tuple(r) for r in con.execute(PAIRS_ORACLE_SQL).fetchall()}
        assert got_abs == exp_abs
        assert got_seq == exp_seq

        # complement contract: every view in exactly one output
        seq_views = {(u, i, v) for u, i, v, _, _ in got_seq}
        assert seq_views.isdisjoint(got_abs)
        n_views = int((pdf["event_type"] == "view").sum())
        assert len(seq_views) + len(got_abs) == n_views
    finally:
        shutil.rmtree(fx, ignore_errors=True)
        for name in (f"cep_prop_abs_{seed}_ckpt", f"cep_prop_seq_{seed}_ckpt"):
            shutil.rmtree(os.path.join(CACHE, name), ignore_errors=True)
