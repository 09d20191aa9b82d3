"""CEP-style burst detection (custom keyed streaming state).

Pattern: a host "bursts" at event time t when ≥ ``n_events`` pages land in
the closed interval [t - window, t]. The detector maintains per-host state
(the event-time multiset + the set of already-emitted burst times) in the
state store and emits each burst time EXACTLY ONCE.

Determinism under out-of-order arrival: burst-ness is MONOTONE in the event
multiset (adding events never un-bursts a time), so emitting a time when it
first qualifies and remembering it yields, after a full drain, exactly the
set a batch RANGE-window oracle computes over all data — regardless of
arrival order or batch boundaries. This is the property the DuckDB twin in
__spark_entry__ checks.

API note: Spark 4's transformWithStateInPandas would be the natural home
(ListState per state variable, timers for eviction), but its Python driver
worker requires the ``google.protobuf`` package, which this sandbox does
not ship — so the operator runs on applyInPandasWithState (GroupState),
the same engine surface the as-of join uses (stateful_join.py).

Scale note: state keeps the full per-host time multiset — fine for bounded
fixtures; at 10^12 docs add an event-time TTL (EventTimeTimeout) that
drops times older than watermark - window, keeping state O(events in
window) per host.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BURST_OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("burst_ts_us", LongType(), False),
    ]
)

# (event-time multiset, already-emitted burst times) as parallel arrays
BURST_STATE_SCHEMA = StructType(
    [
        StructField("times_us", ArrayType(LongType()), True),
        StructField("emitted_us", ArrayType(LongType()), True),
    ]
)


def _burst_fn(n_events: int, window_us: int):
    def fn(
        key: Tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        new: list[int] = []
        for pdf in pdf_iter:
            if len(pdf):
                new.extend(int(t) for t in pdf["t_us"].astype("int64"))
        if not new:
            return
        if state.exists:
            times, emitted = state.get
            times, emitted = list(times), list(emitted)
        else:
            times, emitted = [], []

        allt = np.sort(np.array(times + new, dtype=np.int64))
        seen = set(emitted)
        uniq = np.unique(allt)
        lo = np.searchsorted(allt, uniq - window_us, side="left")
        hi = np.searchsorted(allt, uniq, side="right")
        bursts = uniq[(hi - lo) >= n_events]
        fresh = [int(t) for t in bursts if int(t) not in seen]

        state.update(([int(t) for t in allt], emitted + fresh))
        if fresh:
            yield pd.DataFrame({"host": host, "burst_ts_us": fresh})

    return fn


def detect_bursts(
    pages: DataFrame,
    n_events: int = 20,
    window: str = "30 minutes",
    host_col: str = "host",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """pages stream (with host) → (host, burst_ts) append stream."""
    parts = window.split()
    assert parts[1].startswith("minute"), "window in minutes"
    window_us = int(parts[0]) * 60 * 1_000_000
    keyed = pages.select(
        F.col(host_col).alias("host"),
        F.unix_micros(F.col(ts_col)).alias("t_us"),  # exact, no double detour
    ).filter(F.col("host").isNotNull())
    out = keyed.groupBy("host").applyInPandasWithState(
        _burst_fn(n_events, window_us),
        outputStructType=BURST_OUTPUT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return out.select(
        "host", F.timestamp_micros(F.col("burst_ts_us")).alias("burst_ts")
    )
