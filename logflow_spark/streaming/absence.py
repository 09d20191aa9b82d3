"""Streaming CEP ABSENCE: `first` events with NO `then` within a horizon.

The canonical stateful-timeout pattern: for every `first` (e.g. view) event,
an event-time timer is armed at ``first_ts + within``; if no `then` (e.g.
purchase) by the same key lands in the CLOSED interval [first_ts,
first_ts + within] before the watermark passes the deadline, the `first`
event is emitted exactly once. Matching mirrors the batch twin
``operators/relational.py funnel_absence`` exactly (a `then` at the same
microsecond counts as followed), so after a full drain the emitted set
equals the batch oracle for any arrival order the watermark admits.

Why emission can never race a saving purchase: a pending view v is emitted
only when watermark > v + within; any purchase able to match it has
p ≤ v + within < watermark and would be dropped by the late-row filter
before reaching the operator. Conversely a purchase is pruned from state
only when p ≤ watermark - within, at which point every view it could match
(v ≥ p - within... v ≤ p) is already resolved or emitted — so state holds
O(events in one horizon) per key:

- pending views:  v + within ≥ watermark (younger than one horizon)
- purchases:      p > watermark - within

Idle keys are evicted by the EventTimeTimeout timer: armed at the earliest
pending deadline (or the last purchase's death time when no views are
pending); when it fires with everything pruned, ``state.remove()`` drops
the key. Runs on applyInPandasWithState — the same GroupState surface as
the as-of join and the burst detector (transformWithStateInPandas needs
google.protobuf, absent in this sandbox).

Scale note: state is keyed per user directly. applyInPandasWithState pays
a fixed ~4 ms per TOUCHED group per batch (measured — see CLAUDE.md), so
at crawl-scale key cardinality (10^8+ users touched per batch) this key
should be SHARDED with the entity id kept in the state payload and
per-entity deadlines resolved in-function — the exact pattern
streaming/neardup_stream.py implements (512-shard key, min-deadline
timer, entity-exact grouping inside the shard). Kept per-user here: the
fixture cardinality (~150 keys) makes the direct form strictly faster
and the simpler reference implementation of the timer semantics.
"""

from __future__ import annotations

import bisect
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from logflow_spark.streaming.durations import duration_us

ABSENCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("first_event_id", LongType(), False),
        StructField("first_ts_us", LongType(), False),
    ]
)

# pending `first` events (parallel id/ts arrays) + unmatched `then` times
ABSENCE_STATE_SCHEMA = StructType(
    [
        StructField("view_ids", ArrayType(LongType()), True),
        StructField("view_ts", ArrayType(LongType()), True),
        StructField("purch_ts", ArrayType(LongType()), True),
    ]
)


def _absence_fn(within_us: int):
    def fn(
        key: Tuple[int],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        new_views: list[tuple[int, int]] = []
        new_purch: list[int] = []
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            isv = pdf["is_first"].to_numpy()
            ids = pdf["event_id"].astype("int64").to_numpy()
            ts = pdf["t_us"].astype("int64").to_numpy()
            new_views.extend(
                (int(a), int(b)) for a, b in zip(ids[isv == 1], ts[isv == 1])
            )
            new_purch.extend(int(t) for t in ts[isv == 0])

        if state.exists:
            vids, vts, pts = state.get
            views = list(zip(vids, vts)) + new_views
            purch = list(pts) + new_purch
        else:
            views, purch = new_views, new_purch
        if not views and not purch:
            if state.hasTimedOut:
                state.remove()
            return

        wm_us = state.getCurrentWatermarkMs() * 1000

        # resolve: drop views with a `then` in [v, v + within] (closed)
        purch_sorted = sorted(purch)

        def matched(v: int) -> bool:
            j = bisect.bisect_left(purch_sorted, v)
            return j < len(purch_sorted) and purch_sorted[j] <= v + within_us

        open_views = [(i, v) for i, v in views if not matched(v)]
        # emit: deadline strictly passed — no admissible purchase can save it
        expired = [(i, v) for i, v in open_views if v + within_us < wm_us]
        pending = [(i, v) for i, v in open_views if v + within_us >= wm_us]
        # purchases below the horizon can no longer match any pending or
        # future view: every candidate view has v ≥ watermark - within
        # (pending: v + within ≥ wm; future arrivals: v ≥ wm), and a match
        # needs p ≥ v — so keeping p ≥ watermark - within (closed, ties at
        # the same microsecond match) is exact
        live_purch = [p for p in purch_sorted if p >= wm_us - within_us]

        if pending or live_purch:
            state.update(
                (
                    [i for i, _ in pending],
                    [v for _, v in pending],
                    live_purch,
                )
            )
            if pending:
                deadline_ms = (min(v for _, v in pending) + within_us) // 1000 + 1
            else:
                # purchases die once watermark passes p + within
                deadline_ms = (max(live_purch) + within_us) // 1000 + 1
            state.setTimeoutTimestamp(max(deadline_ms, wm_us // 1000 + 1))
        else:
            state.remove()

        if expired:
            expired.sort(key=lambda t: t[1])
            yield pd.DataFrame(
                {
                    "user_id": uid,
                    "first_event_id": [i for i, _ in expired],
                    "first_ts_us": [v for _, v in expired],
                }
            )

    return fn


def detect_absence(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    first: str = "view",
    then: str = "purchase",
    within: str = "30 minutes",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """events stream → (user_id, first_event_id, first_ts_us) append stream.

    Output schema/encoding matches the batch ``funnel_absence`` exactly so
    the two are directly comparable after a full drain.
    """
    within_us = duration_us(within)
    keyed = (
        events.select(
            F.col(key_col).alias("user_id"),
            F.col(id_col).alias("event_id"),
            F.col(ts_col).cast("timestamp").alias("_wm_ts"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t_us"),
            F.when(F.col(type_col) == first, F.lit(1))
            .when(F.col(type_col) == then, F.lit(0))
            .alias("is_first"),
        )
        # irrelevant event types never reach the state store (scan-level
        # filter; at 10^12 rows this is most of the stream)
        .filter(F.col("is_first").isNotNull())
        .withWatermark("_wm_ts", watermark)
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _absence_fn(within_us),
        outputStructType=ABSENCE_OUTPUT_SCHEMA,
        stateStructType=ABSENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
