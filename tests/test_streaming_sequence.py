"""Streaming CEP sequence (funnel) must equal the batch funnel_pairs oracle
after a drain, and together with the absence operator must partition the
view set exactly (every view in exactly one output)."""

from __future__ import annotations

import os
import shutil

import duckdb
import pandas as pd

from logflow_spark.streaming.sequence import detect_sequence
from tests.conftest import CACHE
from tests.test_streaming_absence import (
    EVENTS_SPARK_SCHEMA,
    _mk,
    _scenario,
    _write_chunks,
)
from logflow_spark.sources.replay import replay_stream

BASE = pd.Timestamp("2025-03-01 00:00:00")

PAIRS_ORACLE_SQL = """
SELECT user_id, event_id AS first_event_id, epoch_us(ts) AS first_ts_us,
       then_ts_us, then_ts_us - epoch_us(ts) AS gap_us
FROM (
  SELECT user_id, event_id, event_type, ts,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN CURRENT ROW AND 1800000000 FOLLOWING) AS then_ts_us
  FROM p)
WHERE event_type = 'view' AND then_ts_us IS NOT NULL
"""


def _drain_seq(spark, fx: str, name: str, watermark: str):
    ckpt = os.path.join(CACHE, f"{name}_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    stream = replay_stream(spark, fx, EVENTS_SPARK_SCHEMA, max_files_per_trigger=1)
    rows: list = []
    q = (
        detect_sequence(stream, watermark=watermark)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    return {
        (r["user_id"], r["first_event_id"], r["first_ts_us"], r["then_ts_us"], r["gap_us"])
        for r in rows
    }


def test_sequence_arrival_order_independent_vs_oracle(spark):
    pdf = _scenario()
    shuffled = pdf.sample(frac=1.0, random_state=5).reset_index(drop=True)
    chunks = [shuffled.iloc[i::3].reset_index(drop=True) for i in range(3)]
    chunks.append(
        pd.DataFrame([_mk(98, BASE + pd.Timedelta(days=10), -1, "purchase")])
    )
    fx = _write_chunks("sequence_oo_fixture", chunks)
    got = _drain_seq(spark, fx, "sequence_oo", watermark="73 hours")

    con = duckdb.connect()
    con.register("p", pdf)
    exp = {tuple(r) for r in con.execute(PAIRS_ORACLE_SQL).fetchall()}
    assert got == exp
    # planted followed users: 1 (10min), 5 (both views saved), 6 (same-µs
    # tie), 7 (closed upper edge at exactly +30min)
    assert {u for u, *_ in got} == {1, 5, 6, 7}


def test_sequence_crash_resume_exactly_once(spark):
    """ST2 parity for the CEP sequence operator (mirror of
    test_absence_crash_resume_exactly_once): crash after 2 committed
    micro-batches, restart from the same checkpoint — pending-view state
    and watermark-driven finalization recover from the state store, the
    failed batch replays idempotently, and the emitted (view, purchase)
    pairs equal the batch funnel_pairs oracle with no duplicates."""
    import pytest as _pytest

    from logflow_spark.fixtures.funnel_events import (
        ensure_funnel_events_fixture,
        funnel_events_pandas,
    )
    from logflow_spark.sinks.exactly_once import ExactlyOnceParquetSink

    fx = os.path.join(CACHE, "sequence_resume_fx")
    shutil.rmtree(fx, ignore_errors=True)
    ensure_funnel_events_fixture(fx, n_rows=1000, n_chunks=5, n_users=23)
    ckpt = os.path.join(CACHE, "sequence_resume_ckpt")
    table = os.path.join(CACHE, "sequence_resume_table")
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
        detect_sequence(stream(), watermark="5 minutes")
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
        detect_sequence(stream(), watermark="5 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink.foreach_batch())
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300)

    got = {
        (r["user_id"], r["first_event_id"], r["first_ts_us"],
         r["then_ts_us"], r["gap_us"])
        for r in sink.read(spark).collect()
    }
    n_rows = sum(m["n_rows"] for m in sink.visible_manifests())
    assert n_rows == len(got)  # exactly-once: no duplicate emissions
    con = duckdb.connect()
    con.register("p", funnel_events_pandas(1000, n_users=23))
    exp = {tuple(r) for r in con.execute(PAIRS_ORACLE_SQL).fetchall()}
    assert got == exp


def test_sequence_and_absence_partition_views(spark):
    """Every view appears in exactly one of (funnel, absence) — the same
    complement contract the batch twins satisfy by construction."""
    from logflow_spark.fixtures.funnel_events import (
        ensure_funnel_events_fixture,
        funnel_events_pandas,
    )
    from tests.test_streaming_absence import _drain as drain_abs

    fx = os.path.join(CACHE, "seqabs_fx_n1000")
    shutil.rmtree(fx, ignore_errors=True)
    ensure_funnel_events_fixture(fx, n_rows=1000, n_chunks=5, n_users=29)
    got_seq = _drain_seq(spark, fx, "seqabs_seq", watermark="5 minutes")
    got_abs, _, _ = drain_abs(spark, fx, "seqabs_abs", watermark="5 minutes")

    seq_views = {(u, i, v) for u, i, v, _, _ in got_seq}
    abs_views = got_abs
    assert seq_views.isdisjoint(abs_views)
    pdf = funnel_events_pandas(1000, n_users=29)
    all_views = {
        (int(r.user_id), int(r.event_id), int(r.ts.value // 1000))
        for r in pdf[pdf["event_type"] == "view"].itertuples(index=False)
    }
    assert seq_views | abs_views == all_views
    assert len(seq_views) > 10 and len(abs_views) > 10
