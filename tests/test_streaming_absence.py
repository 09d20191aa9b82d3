"""Streaming CEP absence (view with no purchase within horizon) must equal
the batch funnel_absence oracle after a full drain, independent of arrival
order and batch boundaries, with per-key state bounded to one horizon."""

from __future__ import annotations

import os
import shutil
import time as _time

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from logflow_spark.fixtures.funnel_events import events_spark_schema
from logflow_spark.sources.replay import replay_stream
from logflow_spark.streaming.absence import detect_absence
from tests.conftest import CACHE

EVENTS_SPARK_SCHEMA = events_spark_schema()

ARROW_SCHEMA = pa.schema(
    [
        pa.field("event_id", pa.int64()),
        pa.field("ts", pa.timestamp("us")),
        pa.field("user_id", pa.int64()),
        pa.field("event_type", pa.string()),
    ]
)

ORACLE_SQL = """
SELECT user_id, event_id AS first_event_id, epoch_us(ts) AS first_ts_us
FROM (
  SELECT user_id, event_id, event_type, ts,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN CURRENT ROW AND 1800000000 FOLLOWING) AS then_ts_us
  FROM p)
WHERE event_type = 'view' AND then_ts_us IS NULL
"""


def _write_chunks(name: str, chunks: list[pd.DataFrame]) -> str:
    fx = os.path.join(CACHE, name)
    shutil.rmtree(fx, ignore_errors=True)
    os.makedirs(fx)
    t0 = _time.time() - len(chunks) - 5
    for c, pdf in enumerate(chunks):
        p = os.path.join(fx, f"chunk-{c:05d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=ARROW_SCHEMA, preserve_index=False), p
        )
        os.utime(p, (t0 + c, t0 + c))
    return fx


def _drain(spark, fx: str, name: str, watermark: str):
    """Drain via a driver-side foreachBatch collector: returns the emitted
    set, the progress records, and rows-emitted-per-micro-batch (file sinks
    report numOutputRows = -1, so the collector is the observable)."""
    ckpt = os.path.join(CACHE, f"{name}_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    stream = replay_stream(spark, fx, EVENTS_SPARK_SCHEMA, max_files_per_trigger=1)
    rows: list = []
    batch_counts: dict[int, int] = {}

    def fb(df, bid):
        got = df.collect()
        batch_counts[int(bid)] = len(got)
        rows.extend(got)

    q = (
        detect_absence(stream, watermark=watermark)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(fb)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    return (
        {(r["user_id"], r["first_event_id"], r["first_ts_us"]) for r in rows},
        q.recentProgress,
        batch_counts,
    )


def _oracle(pdf: pd.DataFrame) -> set:
    con = duckdb.connect()
    con.register("p", pdf)
    return {tuple(r) for r in con.execute(ORACLE_SQL).fetchall()}


def _mk(event_id, ts, user, etype):
    return {
        "event_id": event_id,
        "ts": pd.Timestamp(ts),
        "user_id": user,
        "event_type": etype,
    }


BASE = pd.Timestamp("2025-03-01 00:00:00")
MIN = pd.Timedelta(minutes=1)


def _scenario() -> pd.DataFrame:
    rows = []
    eid = 0
    # u1: view purchased 10 min later → followed
    rows += [_mk(0, BASE, 1, "view"), _mk(1, BASE + 10 * MIN, 1, "purchase")]
    # u2: view purchased 45 min later → ABSENT (outside 30 min)
    rows += [_mk(2, BASE, 2, "view"), _mk(3, BASE + 45 * MIN, 2, "purchase")]
    # u3: view never purchased → ABSENT
    rows += [_mk(4, BASE + 5 * MIN, 3, "view")]
    # u4: purchase with no view → nothing
    rows += [_mk(5, BASE + 2 * MIN, 4, "purchase")]
    # u5: two views, one purchase at +20min saves BOTH (closed window)
    rows += [
        _mk(6, BASE, 5, "view"),
        _mk(7, BASE + 15 * MIN, 5, "view"),
        _mk(8, BASE + 20 * MIN, 5, "purchase"),
    ]
    # u6: purchase at the SAME microsecond as the view → followed (ties match)
    rows += [_mk(9, BASE + 3 * MIN, 6, "view"), _mk(10, BASE + 3 * MIN, 6, "purchase")]
    # u7: view at +1h, purchase exactly 30 min later (closed upper edge) → followed
    rows += [
        _mk(11, BASE + 60 * MIN, 7, "view"),
        _mk(12, BASE + 90 * MIN, 7, "purchase"),
    ]
    # clicks everywhere (must be filtered before state)
    rows += [_mk(13, BASE + i * MIN, 1 + (i % 7), "click") for i in range(5)]
    for k, r in enumerate(rows):
        r["event_id"] = k
    return pd.DataFrame(rows)


def test_absence_arrival_order_independent(spark):
    """Rows shuffled adversarially across chunks under a watermark wide
    enough to admit any order: drained output == batch oracle, and the
    planted ABSENT cases are exactly the emitted ones."""
    pdf = _scenario()
    shuffled = pdf.sample(frac=1.0, random_state=11).reset_index(drop=True)
    chunks = [shuffled.iloc[i::3].reset_index(drop=True) for i in range(3)]
    # flush: far-future purchase for user -1 closes every timer
    chunks.append(
        pd.DataFrame([_mk(99, BASE + pd.Timedelta(days=10), -1, "purchase")])
    )
    fx = _write_chunks("absence_oo_fixture", chunks)
    got, _, _ = _drain(spark, fx, "absence_oo", watermark="73 hours")
    exp = _oracle(pdf)
    assert got == exp
    assert {u for u, _, _ in got} == {2, 3}  # the planted absent users


def test_absence_incremental_emission_and_bounded_state(spark):
    """Time-ordered replay with a tight watermark: abandonments must emit
    MID-stream (timer-driven, before the flush chunk arrives), the final
    state store must be near-empty (keys evicted once resolved), and the
    total output must still equal the batch oracle."""
    from logflow_spark.fixtures.funnel_events import (
        ensure_funnel_events_fixture,
        funnel_events_pandas,
    )

    fx = os.path.join(CACHE, "absence_fx_n1200")
    shutil.rmtree(fx, ignore_errors=True)
    ensure_funnel_events_fixture(fx, n_rows=1200, n_chunks=6, n_users=23)
    got, progress, batch_counts = _drain(
        spark, fx, "absence_inc", watermark="5 minutes"
    )

    pdf = funnel_events_pandas(1200, n_users=23)
    exp = _oracle(pdf)
    assert got == exp
    assert len(exp) > 10  # scenario is non-trivial

    # emission happened across multiple micro-batches (timer/watermark
    # driven), not one final flush after the sentinel
    emitting = [b for b, n in batch_counts.items() if n > 0]
    assert len(emitting) >= 2, batch_counts
    n_chunks_batch = max(batch_counts)
    assert any(b < n_chunks_batch for b in emitting), batch_counts
    # state after the flush chunk: only the sentinel key remains — the 23
    # user keys were evicted by their EventTimeTimeout timers
    final_state = [
        p["stateOperators"][0]["numRowsTotal"] for p in progress if p["stateOperators"]
    ][-1]
    assert final_state <= 3


def test_absence_operator_output_matches_batch_operator(spark):
    """The streaming operator and the batch funnel_absence operator agree on
    the SAME input frame (read as a replay), column-for-column."""
    from logflow_spark.fixtures.funnel_events import (
        ensure_funnel_events_fixture,
        funnel_events_pandas,
    )
    from logflow_spark.operators.relational import funnel_absence

    fx = os.path.join(CACHE, "absence_fx_n800")
    shutil.rmtree(fx, ignore_errors=True)
    ensure_funnel_events_fixture(fx, n_rows=800, n_chunks=4, n_users=19)
    got, _, _ = _drain(spark, fx, "absence_batchcmp", watermark="10 minutes")

    batch = spark.createDataFrame(funnel_events_pandas(800, n_users=19))
    exp = {
        (r["user_id"], r["first_event_id"], r["first_ts_us"])
        for r in funnel_absence(batch).collect()
    }
    assert got == exp


def test_absence_crash_resume_exactly_once(spark):
    """ST2 parity for the CEP absence operator: crash after 2 committed
    micro-batches, restart from the same checkpoint — the stateful timers
    and pending-view state recover from the state store, the failed batch
    replays idempotently, and the final emitted set still equals the batch
    oracle with no duplicates."""
    import pytest as _pytest

    from logflow_spark.fixtures.funnel_events import (
        ensure_funnel_events_fixture,
        funnel_events_pandas,
    )
    from logflow_spark.sinks.exactly_once import ExactlyOnceParquetSink

    fx = os.path.join(CACHE, "absence_resume_fx")
    shutil.rmtree(fx, ignore_errors=True)
    ensure_funnel_events_fixture(fx, n_rows=1000, n_chunks=5, n_users=23)
    ckpt = os.path.join(CACHE, "absence_resume_ckpt")
    table = os.path.join(CACHE, "absence_resume_table")
    for p in (ckpt, table):
        shutil.rmtree(p, ignore_errors=True)
    sink = ExactlyOnceParquetSink(table)

    calls = {"n": 0}

    def crashing(df, bid):
        if calls["n"] >= 2:
            raise RuntimeError("injected crash")
        sink.write_batch(df, bid)
        calls["n"] += 1

    def stream():
        return replay_stream(spark, fx, EVENTS_SPARK_SCHEMA, max_files_per_trigger=1)

    q = (
        detect_absence(stream(), watermark="5 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(crashing)
        .trigger(availableNow=True)
        .start()
    )
    with _pytest.raises(Exception):
        q.awaitTermination(300)
    assert len(sink.committed_batches()) >= 1

    q2 = (
        detect_absence(stream(), watermark="5 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300)

    got = {
        (r["user_id"], r["first_event_id"], r["first_ts_us"])
        for r in sink.read(spark).collect()
    }
    n_rows = sum(m["n_rows"] for m in sink.visible_manifests())
    assert n_rows == len(got)  # exactly-once: no duplicate emissions
    assert got == _oracle(funnel_events_pandas(1000, n_users=23))
