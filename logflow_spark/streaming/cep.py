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

Bounded state (the 10^12-doc requirement): with ``watermark`` set, every
invocation prunes event times and emitted-burst times below
``watermark - window``, and an EventTimeTimeout timer fires once the
watermark passes ``max(times) + window`` to flush idle hosts' state
entirely (state.remove()). Pruning is safe because a burst candidate time t
is FROZEN once watermark > t: its window [t - window, t] can only gain
events with event-time ≤ t, and rows below the watermark are dropped before
the operator — so events below watermark - window only contribute to
already-frozen, already-evaluated candidates. Per-host state is therefore
O(events inside one window horizon), not O(stream length).

API note: Spark 4's transformWithStateInPandas would be the natural home
(ListState per state variable, timers for eviction), but its Python driver
worker requires the ``google.protobuf`` package, which this sandbox does
not ship — so the operator runs on applyInPandasWithState (GroupState),
the same engine surface the as-of join uses (stateful_join.py).
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


def _burst_fn(n_events: int, window_us: int, use_watermark: bool):
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
        # event-time horizon: nothing below watermark - window can change
        # any still-open burst candidate (candidates below the watermark
        # are frozen — see module docstring)
        horizon = (
            state.getCurrentWatermarkMs() * 1000 - window_us
            if use_watermark
            else -(1 << 62)
        )

        if state.hasTimedOut:
            # idle-host flush: the timer fires only once the watermark
            # passes max(times) + window, at which point EVERY retained
            # time is below the horizon (any newer event would have re-armed
            # the timer via the data branch) — the key is simply dropped
            state.remove()
            return

        if not new:
            return
        if state.exists:
            times, emitted = state.get
            times, emitted = list(times), list(emitted)
        else:
            times, emitted = [], []

        allt = np.sort(np.array(times + new, dtype=np.int64))
        allt = allt[allt >= horizon]
        seen = set(e for e in emitted if e >= horizon)
        uniq = np.unique(allt)
        lo = np.searchsorted(allt, uniq - window_us, side="left")
        hi = np.searchsorted(allt, uniq, side="right")
        bursts = uniq[(hi - lo) >= n_events]
        fresh = [int(t) for t in bursts if int(t) not in seen]

        state.update(([int(t) for t in allt], sorted(seen) + fresh))
        if use_watermark and len(allt):
            # fires once the watermark passes the newest event + window —
            # at that point every retained time is below the next horizon
            # and the timeout branch removes the key
            state.setTimeoutTimestamp((int(allt[-1]) + window_us) // 1000 + 1)
        if fresh:
            yield pd.DataFrame({"host": host, "burst_ts_us": fresh})

    return fn


def detect_bursts(
    pages: DataFrame,
    n_events: int = 20,
    window: str = "30 minutes",
    host_col: str = "host",
    ts_col: str = "warc_ts",
    watermark: str | None = None,
) -> DataFrame:
    """pages stream (with host) → (host, burst_ts) append stream.

    With ``watermark`` set (streaming input), per-host state is pruned to
    the watermark horizon and idle hosts are evicted via EventTimeTimeout;
    without it (bounded fixtures / batch-like replay) state grows with the
    replay — fine for tests, wrong at 10^12 docs.
    """
    from logflow_spark.streaming.durations import duration_us

    window_us = duration_us(window)
    keyed = pages.select(
        F.col(host_col).alias("host"),
        F.col(ts_col).alias("_wm_ts"),  # watermark anchor must survive select
        F.unix_micros(F.col(ts_col)).alias("t_us"),  # exact, no double detour
    ).filter(F.col("host").isNotNull())
    if watermark is not None:
        keyed = keyed.withWatermark("_wm_ts", watermark)
    out = keyed.groupBy("host").applyInPandasWithState(
        _burst_fn(n_events, window_us, watermark is not None),
        outputStructType=BURST_OUTPUT_SCHEMA,
        stateStructType=BURST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if watermark is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    return out.select(
        "host", F.timestamp_micros(F.col("burst_ts_us")).alias("burst_ts")
    )
