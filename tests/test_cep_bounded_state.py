"""Bounded CEP burst state: horizon pruning + idle-host eviction.

The burst detector (streaming/cep.py) must keep per-host state
O(events inside one window horizon) when a watermark is present, and must
still emit exactly the batch RANGE-window oracle's burst set.
"""

from __future__ import annotations

import os
import shutil
import time as _time

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import CACHE

US = 1_000_000
MIN = 60 * US


class FakeGroupState:
    """Minimal stand-in for pyspark GroupState driving _burst_fn directly."""

    def __init__(self) -> None:
        self._value = None
        self._wm_ms = 0
        self.timeout_ms: int | None = None
        self._timed_out = False

    # surface used by _burst_fn
    @property
    def exists(self) -> bool:
        return self._value is not None

    @property
    def get(self):
        return self._value

    @property
    def hasTimedOut(self) -> bool:
        return self._timed_out

    def update(self, v) -> None:
        self._value = v

    def remove(self) -> None:
        self._value = None

    def getCurrentWatermarkMs(self) -> int:
        return self._wm_ms

    def setTimeoutTimestamp(self, ms: int) -> None:
        assert ms > self._wm_ms, "timer must be beyond the watermark"
        self.timeout_ms = ms


def _drive(fn, state, times_us, wm_ms):
    state._wm_ms = wm_ms
    state._timed_out = False
    out = list(fn(("h",), iter([pd.DataFrame({"t_us": times_us})]), state))
    return [int(t) for o in out for t in o["burst_ts_us"]]


def test_burst_state_is_pruned_to_window_horizon():
    """Hot host streaming for 6 simulated hours at 10 events/min: retained
    state must track the watermark horizon (~window + lag of events), never
    the full history — while the emitted set equals the batch oracle."""
    from logflow_spark.streaming.cep import _burst_fn

    window_us = 30 * MIN
    fn = _burst_fn(20, window_us, use_watermark=True)
    state = FakeGroupState()

    all_events: list[int] = []
    emitted: list[int] = []
    batch_min = 10  # one call per 10 simulated minutes
    rate = 10  # events per minute
    for b in range(36):  # 6 hours
        lo = b * batch_min * MIN
        batch = [lo + i * (MIN // rate) for i in range(batch_min * rate)]
        all_events.extend(batch)
        wm_ms = max(0, (max(batch) - 5 * MIN) // 1000)  # 5 min lag
        emitted.extend(_drive(fn, state, batch, wm_ms))
        times, kept_emitted = state.get
        horizon = wm_ms * 1000 - window_us
        # exact bound: retained == events at/after the horizon
        assert len(times) == sum(1 for t in all_events if t >= horizon)
        # never the whole history once past the first hour
        if b >= 6:
            assert len(times) <= (window_us + 6 * MIN) // (MIN // rate) + rate
            assert len(times) < len(all_events)
        assert all(e >= horizon for e in kept_emitted)

    con = duckdb.connect()
    con.register("e", pd.DataFrame({"t": all_events}))
    oracle = {
        r[0]
        for r in con.execute(
            """SELECT DISTINCT t FROM (
                 SELECT t, count(*) OVER (ORDER BY t RANGE BETWEEN 1800000000
                        PRECEDING AND CURRENT ROW) c FROM e) WHERE c >= 20"""
        ).fetchall()
    }
    assert set(emitted) == oracle
    assert len(emitted) == len(set(emitted))  # exactly-once


def test_burst_timeout_branch_removes_empty_key():
    from logflow_spark.streaming.cep import _burst_fn

    window_us = 30 * MIN
    fn = _burst_fn(5, window_us, use_watermark=True)
    state = FakeGroupState()
    _drive(fn, state, [i * MIN for i in range(10)], wm_ms=0)
    assert state.exists and state.timeout_ms is not None

    # watermark far past max(times) + window → timeout prunes everything
    state._wm_ms = (10 * MIN + 2 * window_us) // 1000
    state._timed_out = True
    out = list(fn(("h",), iter([pd.DataFrame({"t_us": []})]), state))
    assert out == []
    assert not state.exists  # key fully evicted


def test_e2e_idle_host_state_evicted(spark):
    """Host A bursts early then goes idle; host B's later activity advances
    the watermark past A's horizon. The state store must end with only B's
    key (numRowsTotal from the progress metrics), and the emitted set must
    still equal the batch oracle."""
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from logflow_spark.sources.replay import replay_stream
    from logflow_spark.streaming.cep import detect_bursts

    base = pd.Timestamp("2025-03-01 00:00:00")
    chunks = [
        # A: 25 events in 12 min → bursts from the 20th on
        pd.DataFrame(
            [("a.com", base + pd.Timedelta(seconds=30 * i)) for i in range(25)],
            columns=["host", "warc_ts"],
        ),
        # B at +2h advances watermark (1-min delay) past A's timer (+42.5min)
        pd.DataFrame(
            [("b.com", base + pd.Timedelta(hours=2, seconds=i)) for i in range(3)],
            columns=["host", "warc_ts"],
        ),
        # a batch in which A has no data while wm > its timer: timeout fires
        pd.DataFrame(
            [("b.com", base + pd.Timedelta(hours=2, minutes=5))],
            columns=["host", "warc_ts"],
        ),
    ]
    fx = os.path.join(CACHE, "cep_ttl_fixture")
    shutil.rmtree(fx, ignore_errors=True)
    os.makedirs(fx)
    schema = pa.schema(
        [pa.field("host", pa.string()), pa.field("warc_ts", pa.timestamp("us"))]
    )
    t0 = _time.time() - 20
    for c, pdf in enumerate(chunks):
        p = os.path.join(fx, f"chunk-{c:05d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), p
        )
        os.utime(p, (t0 + c, t0 + c))

    ckpt = os.path.join(CACHE, "cep_ttl_ckpt")
    out_dir = os.path.join(CACHE, "cep_ttl_out")
    for p in (ckpt, out_dir):
        shutil.rmtree(p, ignore_errors=True)
    spark_schema = StructType(
        [
            StructField("host", StringType(), True),
            StructField("warc_ts", TimestampType(), True),
        ]
    )
    stream = replay_stream(spark, fx, spark_schema, max_files_per_trigger=1)
    q = (
        detect_bursts(
            stream, n_events=20, window="30 minutes", watermark="1 minute"
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    state_rows = [
        pr["stateOperators"][0]["numRowsTotal"]
        for pr in q.recentProgress
        if pr["stateOperators"]
    ]
    # A's key held state mid-stream; after its EventTimeTimeout fired only
    # B's key remains
    assert max(state_rows) >= 2
    assert state_rows[-1] == 1

    got = {
        (r["host"], r["burst_ts"])
        for r in spark.read.parquet(out_dir).collect()
    }
    allpdf = pd.concat(chunks, ignore_index=True)
    con = duckdb.connect()
    con.register("p", allpdf)
    exp = {
        (h, pd.Timestamp(t))
        for h, t in con.execute(
            """SELECT DISTINCT host, warc_ts FROM (
                 SELECT host, warc_ts,
                        count(*) OVER (PARTITION BY host ORDER BY warc_ts
                          RANGE BETWEEN INTERVAL '30 minutes' PRECEDING
                          AND CURRENT ROW) AS c
                 FROM p) WHERE c >= 20"""
        ).fetchall()
    }
    assert got == exp
