"""Streaming CEP SEQUENCE (funnel): `first` followed by `then` within T.

The positive twin of streaming/absence.py: for every `first` (view) event,
emit the EARLIEST `then` (purchase) by the same key in the CLOSED interval
[first_ts, first_ts + within] — exactly the batch ``funnel_pairs`` contract
(operators/relational.py), so a full drain equals the batch oracle.

Emission safety (why results are final): the current best candidate p_min
for a pending view v can only be displaced by a purchase p' < p_min, and
every arriving row has event time ≥ watermark — so once watermark > p_min
no earlier purchase can arrive and (v, p_min) is emitted exactly once.
Views whose deadline passes with no candidate (watermark > v + within) are
dropped silently — that complement set is the absence operator's output;
every view is emitted by exactly one of the two operators, mirroring the
batch pair funnel_pairs / funnel_absence.

State per key is one horizon, as in absence.py:
- pending views (id, ts, current-best candidate or none):
  alive while their emission/expiry condition is still open
- unmatched purchase times ≥ watermark - within (closed-boundary ties kept)

EventTimeTimeout timers fire at the earliest pending decision point
(min over views of min(p_min, v + within)); idle keys are removed.
"""

from __future__ import annotations

import bisect
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from logflow_spark.streaming.durations import duration_us

SEQUENCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("first_event_id", LongType(), False),
        StructField("first_ts_us", LongType(), False),
        StructField("then_ts_us", LongType(), False),
        StructField("gap_us", LongType(), False),
    ]
)

SEQUENCE_STATE_SCHEMA = StructType(
    [
        StructField("view_ids", ArrayType(LongType()), True),
        StructField("view_ts", ArrayType(LongType()), True),
        StructField("purch_ts", ArrayType(LongType()), True),
    ]
)


def _sequence_fn(within_us: int):
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
        purch_sorted = sorted(purch)

        def best(v: int) -> int | None:
            """Earliest purchase in [v, v + within], None if none yet."""
            j = bisect.bisect_left(purch_sorted, v)
            if j < len(purch_sorted) and purch_sorted[j] <= v + within_us:
                return purch_sorted[j]
            return None

        emit: list[tuple[int, int, int]] = []  # (id, v, p)
        pending: list[tuple[int, int]] = []
        deadlines: list[int] = []  # decision points of still-open views
        for i, v in views:
            p = best(v)
            if p is not None and wm_us > p:
                emit.append((i, v, p))  # final: no earlier p' can arrive
            elif p is None and v + within_us < wm_us:
                pass  # expired unmatched — the absence operator's row
            else:
                pending.append((i, v))
                deadlines.append(min(p, v + within_us) if p is not None else v + within_us)

        # purchases below the horizon can no longer match any pending or
        # future view (closed boundary: keep p ≥ watermark - within)
        live_purch = [p for p in purch_sorted if p >= wm_us - within_us]

        if pending or live_purch:
            state.update(
                ([i for i, _ in pending], [v for _, v in pending], live_purch)
            )
            if deadlines:
                deadline_ms = min(deadlines) // 1000 + 1
            else:
                deadline_ms = (max(live_purch) + within_us) // 1000 + 1
            state.setTimeoutTimestamp(max(deadline_ms, wm_us // 1000 + 1))
        else:
            state.remove()

        if emit:
            emit.sort(key=lambda t: t[1])
            yield pd.DataFrame(
                {
                    "user_id": uid,
                    "first_event_id": [i for i, _, _ in emit],
                    "first_ts_us": [v for _, v, _ in emit],
                    "then_ts_us": [p for _, _, p in emit],
                    "gap_us": [p - v for _, v, p in emit],
                }
            )

    return fn


def detect_sequence(
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
    """events stream → (user_id, first_event_id, first_ts_us, then_ts_us,
    gap_us) append stream — column-identical to batch ``funnel_pairs``."""
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
        .filter(F.col("is_first").isNotNull())
        .withWatermark("_wm_ts", watermark)
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _sequence_fn(within_us),
        outputStructType=SEQUENCE_OUTPUT_SCHEMA,
        stateStructType=SEQUENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
