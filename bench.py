#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "extra": {...}}

Measurement protocol (round 4 — the shared host has intermittent multi-minute
throttle windows, 10-30x slowdowns observed, which made the round-3
embeddings-family numbers regress with zero code change):

  1. a multi-core CPU probe calibrates before the suite; the bench WAITS
     (up to $BENCH_MAX_WAIT s, default 120) for a quiet window,
  2. every batch query is timed best-of-$BENCH_RUNS (default 2) in the same
     session — a run landing in a throttle window can't poison the number,
  3. probe readings (start/end, ratio to baseline) land in extra so a
     regression can be attributed to the host rather than the code.

The flagship number is the end-to-end STREAMING drain of the pages topology
(replay source → vectorized html→text extraction → host keying → watermarked
10-min tumbling aggregation → exactly-once sink) under the TUNED drain
protocol from BENCH/BASELINE.md (fixture staged on tmpfs, scan-split cap
8 MB so tasks >> cores inside the one fat micro-batch, Arrow batches of
5000 rows, python worker reuse off, maxFilesPerTrigger=64). Reported as
wall-clock docs/sec (extra.stream_docs_per_sec, comparable to rounds 1-3)
AND as steady-state docs/sec over the data micro-batches only
(extra.stream_docs_per_sec_steady — the scaling-bench metric, excludes JVM
startup and the state-flush tail). extra.drain_config names the knobs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
BENCH_RUNS = int(os.environ.get("BENCH_RUNS", 2))
MAX_WAIT_S = int(os.environ.get("BENCH_MAX_WAIT", 120))

# streaming-bench pages rows per sf tier
PAGES_ROWS = {"sf0.001": 20_000, "sf0.01": 100_000, "sf0.1": 1_000_000}

DRAIN_CONFIG = {
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    "spark.sql.execution.arrow.maxRecordsPerBatch": "5000",
}
DRAIN_MFPT = 64


def _sf_label() -> str:
    return os.path.basename(os.path.normpath(SF_DIR))


def _sf_value() -> float:
    lbl = _sf_label()
    try:
        return float(lbl.replace("sf", ""))
    except ValueError:
        return -1.0


# -- host-throttle probe (protocol from scripts/scaling_bench.py) -----------
def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def _calibrate_once(procs: int = 8) -> float:
    """Multi-core probe: throttling budgets AGGREGATE cpu, so a
    single-threaded probe can read fast while the parallel budget is gone."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        pool.map(_burn, [3_000_000] * procs)
    return time.perf_counter() - t0


def _wait_for_quiet(baseline: float, timeout_s: int) -> float:
    """Block until the probe runs within 1.5x of baseline; returns the last
    probe reading either way."""
    deadline = time.time() + timeout_s
    last = _calibrate_once()
    while last >= 1.5 * baseline and time.time() < deadline:
        time.sleep(10)
        last = _calibrate_once()
    return last


def _historical_best() -> dict[str, float]:
    """Best per-query seconds across all prior BENCH_r*.json rounds — the
    reference point for the post-suite quiet-window retime (a query >25%
    above its own history under a hot probe is throttle-contaminated, not
    regressed; VERDICT r4 found the ANN family flagged exactly this way)."""
    import glob

    best: dict[str, float] = {}
    for fn in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(fn) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        # driver rounds wrap the bench line under "parsed"; a locally
        # saved line is flat — accept both shapes
        if isinstance(data.get("parsed"), dict):
            data = data["parsed"]
        if data.get("sf") != _sf_value():
            continue  # only same-scale rounds are comparable
        for k, v in (data.get("queries") or {}).items():
            if isinstance(v, (int, float)) and v > 0:
                best[k] = min(best.get(k, float(v)), float(v))
    return best


def bench_stream(spark, n_rows: int, extract_mode: str = "udf"):
    """End-to-end streaming drain under the tuned protocol; returns
    (wall seconds, docs, steady-state data-batch seconds, data-batch docs)."""
    from pyspark.sql import functions as F

    from logflow_spark.fixtures.pages import ensure_pages_fixture
    from logflow_spark.sinks.exactly_once import ExactlyOnceParquetSink
    from logflow_spark.sources.replay import pages_replay_stream
    from logflow_spark.streaming.topology import TopologyConfig, run_streaming_to_sink

    n_chunks = 64
    # 100 hosts → docs >> hosts (the web-scale regime); at H=1000 and bench
    # row counts nearly every row is its own (window,host,lang) group and
    # state-store churn, not the pipeline, dominates the measurement
    fixture = ensure_pages_fixture(
        os.path.join(CACHE, f"pages_bench_n{n_rows}_h100"),
        n_rows=n_rows,
        n_chunks=n_chunks,
        n_hosts=100,
        flush_row=True,
        drop_text=True,  # force html→text extraction on every row
    )
    # stage on tmpfs: the sandbox drops page cache aggressively and disk
    # reads mid-run add seconds of noise to the timed region
    shm = "/dev/shm/logflow_bench"
    os.makedirs(shm, exist_ok=True)
    staged = os.path.join(shm, os.path.basename(fixture))
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        shutil.rmtree(staged, ignore_errors=True)
        shutil.copytree(fixture, staged)
    fixture = staged

    work = tempfile.mkdtemp(prefix="bench_stream_", dir=CACHE)
    sink = ExactlyOnceParquetSink(os.path.join(work, "table"))
    cfg = TopologyConfig(
        window_kind="tumbling",
        watermark="73 hours",
        sum_text_chars=True,
        extract_mode=extract_mode,
    )
    prev = {k: spark.conf.get(k) for k in DRAIN_CONFIG}
    for k, v in DRAIN_CONFIG.items():
        spark.conf.set(k, v)
    try:
        t0 = time.time()
        # 64 = all data chunks in ONE micro-batch (the sentinel lands in the
        # next): the large-micro-batch cadence a 100 TB deployment runs, and
        # the regime where per-batch constant costs (planning, WAL, state
        # commit) are amortized instead of dominating a 1M-row measurement.
        # The 8 MB split cap keeps scan tasks >> cores INSIDE that one fat
        # batch (without it, openCost packing yields a handful of fat splits
        # and a straggler tail — BENCH/BASELINE.md round-3 decomposition).
        stream = pages_replay_stream(
            spark, fixture, max_files_per_trigger=DRAIN_MFPT
        )
        q = run_streaming_to_sink(
            stream, cfg, sink, os.path.join(work, "ckpt"), available_now=True
        )
        q.awaitTermination()
        dt = time.time() - t0
        data_ms, data_rows = 0, 0
        for p in q.recentProgress:
            pj = json.loads(p.json)
            if pj["numInputRows"] > 1:
                data_ms += pj["durationMs"]["triggerExecution"]
                data_rows += pj["numInputRows"]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    docs = (
        sink.read(spark).filter(F.col("lang") != "xx").agg(F.sum("cnt")).collect()[0][0]
    )
    shutil.rmtree(work, ignore_errors=True)
    return dt, int(docs), data_ms / 1000.0, data_rows


def main() -> None:
    import __spark_entry__ as entrymod
    from logflow_spark.session import get_spark

    # floor the baseline at the known quiet-window reading for this probe
    # (~175 ms for 8 procs x 3M loops): if calibration itself lands in a
    # throttle window, min-of-3 would read high and quiet-detection would
    # wave through a throttled suite. Worst case on a genuinely slower
    # machine: one bounded MAX_WAIT_S wait, then proceed.
    floor = float(os.environ.get("BENCH_PROBE_FLOOR_MS", 175)) / 1000.0
    measured = min(_calibrate_once() for _ in range(3))
    # clamp to the known quiet floor ONLY when the measurement is in the
    # same regime (<=3x floor: this host, possibly mid-throttle). On
    # genuinely slower hardware (>3x) trust the measured baseline — a
    # hardcoded unattainable floor would otherwise make every quiet-wait
    # time out and read host_throttle_ratio off an impossible target.
    baseline = min(measured, 1.2 * floor) if measured <= 3.0 * floor else measured
    probe_start = _wait_for_quiet(baseline, MAX_WAIT_S)

    # shuffle partitions = cores: streaming state instances scale with
    # shuffle partitions, and at bench scale extra partitions are pure
    # per-batch state-store overhead (measured 2x on the drain)
    spark = get_spark(
        app_name="logflow_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={
            # worker reuse ON anti-scales above ~16 concurrent Python
            # workers in one local JVM (BENCH/BASELINE.md control); real
            # clusters have per-executor pools
            "spark.python.worker.reuse": "false",
        },
    )

    timings: dict[str, float] = {}
    extra: dict = {}

    # warm up the JVM / Python workers before timing
    entrymod.entry(spark).collect()

    qs = entrymod.queries()
    headline = [
        "tumbling_counts_10m",
        "sliding_counts_10m_5m",
        "session_counts_30m",
        "topk_buckets",
        "filtered_time_range",
        "pricing_summary",
        "broadcast_join_revenue",
        "orders_window_rank",
        "salted_group_counts",
        "text_profile",
        "exact_dedup",
        "minhash_dedup_pairs",
        "minhash_dedup_clusters",
        "funnel_view_purchase",
        "simhash_signatures",
        "simhash_neardup_pairs",
        "embedding_neardup",
        "decontaminate_8gram",
        "repetition_profile",
        "pack_sequences_512",
        "pack_sequences_ffd_512",
        "top_terms_per_source",
        "served_query_full",
        "events_stream_absence",
        "ann_brute_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "pages_flagship_tumbling",
        "pages_asof_enrichment",
        "pages_salted_skew_counts",
        "span_dedup_10tok",
        "incremental_dedup_batch",
    ]
    # clearCache before EVERY timed run: several operators persist() their
    # multiply-referenced frames, and Spark's cache manager dedups by
    # logical plan — without the clear, a best-of-2 second run would reuse
    # the first run's caches and report warm-cache numbers incomparable to
    # the single-run rounds 1-3 (and to a first production run)
    # every query row is stamped with the CPU-probe reading taken right
    # after its timed runs (extra.query_probe_ms): a regression vs history
    # is then attributable in-band to the host window it ran under, per
    # VERDICT r4 task #2 — the round-4 ANN rows could only be adjudicated
    # from the single suite-end probe
    query_probe_ms: dict[str, float] = {}
    for name in headline:
        best = None
        for _ in range(max(1, BENCH_RUNS)):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        query_probe_ms[name] = round(_calibrate_once() * 1000, 1)

    # heavyweight composed queries run ONCE (like the stream drains): a
    # best-of-2 on a ~15s pipeline would cost more wall than the noise it
    # removes, and its stage families are already best-of-2'd above.
    # Order matters: docs_stream_neardup pays the streaming drain (the
    # r1-r4-comparable number); the _verified twin then reuses the
    # process-memoized drained table, so ITS row measures exactly the
    # incremental candidates→exact-Jaccard verify cost.
    for name in (
        "llm_pipeline_packed",
        "docs_stream_neardup",
        "docs_stream_neardup_verified",
        "docs_stream_decontam",
    ):
        spark.catalog.clearCache()
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        query_probe_ms[name] = round(_calibrate_once() * 1000, 1)

    # quiet-window retime (VERDICT r4 task #2): any batch query >25% above
    # its best historical number gets ONE more run behind a fresh
    # wait-for-quiet; keep the better time and record the attribution. The
    # two heavyweights are excluded on cost (their probe stamp suffices).
    hist = _historical_best()
    retimed: dict[str, dict] = {}
    flagged = sorted(
        (
            n
            for n, t in timings.items()
            if n in hist
            and hist[n] < 6.0
            and t > 1.25 * hist[n]
            and n not in ("llm_pipeline_packed", "docs_stream_neardup")
        ),
        key=lambda n: timings[n] / hist[n],
        reverse=True,  # worst throttle-inflation first — the cap below
    )
    for name in flagged[:8]:
        probe = _wait_for_quiet(baseline, 60)
        spark.catalog.clearCache()
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        retimed[name] = {
            "first_pass": timings[name],
            "quiet_rerun": dt,
            "historical_best": hist[name],
            "probe_ms": round(probe * 1000, 1),
        }
        if dt < timings[name]:
            timings[name] = dt
            query_probe_ms[name] = round(probe * 1000, 1)
    if retimed:
        extra["quiet_retimed"] = retimed

    def drained(mode: str):
        """One drain, re-run ONCE if the post-drain probe shows the run
        landed in a throttle window (keep the better run) — the drain is
        the suite's single biggest number, so one bad window otherwise
        dominates the whole bench."""
        out = bench_stream(spark, n_rows, extract_mode=mode)
        if _calibrate_once() >= 1.5 * baseline:
            _wait_for_quiet(baseline, 60)
            retry = bench_stream(spark, n_rows, extract_mode=mode)
            if retry[0] < out[0]:
                out = retry
        return out

    n_rows = PAGES_ROWS.get(_sf_label(), 200_000)
    stream_sec, docs, steady_sec, steady_rows = drained("udf")
    timings["pages_stream_e2e"] = round(stream_sec, 3)
    extra["stream_docs"] = docs
    extra["stream_docs_per_sec"] = round(docs / stream_sec, 1)
    if steady_sec > 0:
        extra["stream_docs_per_sec_steady"] = round(steady_rows / steady_sec, 1)
    # same topology with the JVM-expression extraction twin (byte-identical
    # output; the scale path measured in BENCH/BASELINE.md)
    jvm_sec, jvm_docs, jvm_steady_sec, jvm_steady_rows = drained("jvm")
    timings["pages_stream_e2e_jvm"] = round(jvm_sec, 3)
    extra["stream_docs_per_sec_jvm"] = round(jvm_docs / jvm_sec, 1)
    if jvm_steady_sec > 0:
        extra["stream_docs_per_sec_jvm_steady"] = round(
            jvm_steady_rows / jvm_steady_sec, 1
        )
    # protocol-core-count drain rows (VERDICT r4 task #7): the in-session
    # headline drain runs at local[CPUS] (32 = the pinned bandwidth-
    # saturation regime); BENCH/BASELINE.md's scaling protocol measures at
    # 16 cores quiet. Re-run the same tuned drain in a FRESH subprocess at
    # the protocol core count, stamped with its own probe readings, so
    # BENCH_rN and BENCH/BASELINE.md carry directly comparable rows.
    import re
    import subprocess

    fixture_src = os.path.join(CACHE, f"pages_bench_n{n_rows}_h100")
    proto: dict[str, dict] = {}
    for mode in ("jvm", "udf"):
        probe_before = _wait_for_quiet(baseline, 60)
        env = {
            **os.environ,
            "DRAIN_EXTRACT": mode,
            "DRAIN_MFPT": str(DRAIN_MFPT),
            "DRAIN_MPB": str(8 * 1024 * 1024),
            "DRAIN_ARROW_BATCH": "5000",
            "DRAIN_STATE": "hdfs",
        }
        try:
            run = subprocess.run(
                [
                    sys.executable,
                    os.path.join(REPO, "scripts", "drain_once.py"),
                    "16",
                    fixture_src,
                ],
                env=env,
                capture_output=True,
                text=True,
                timeout=600,
            )
            m = re.search(
                r"RESULT cores=\d+ extract=\w+ seconds=([0-9.]+) "
                r"data_seconds=([0-9.]+) data_rows=(\d+)",
                run.stdout,
            )
        except subprocess.TimeoutExpired:
            m = None
        if m is None:
            proto[f"c16_{mode}"] = {"error": "drain_once failed or timed out"}
            continue
        wall, data_s, data_rows_p = float(m[1]), float(m[2]), int(m[3])
        proto[f"c16_{mode}"] = {
            "cores": 16,
            "seconds": wall,
            "data_seconds": data_s,
            "docs": data_rows_p,
            "docs_per_sec_steady": round(data_rows_p / data_s, 1)
            if data_s > 0
            else None,
            "probe_ms_before": round(probe_before * 1000, 1),
            "probe_ms_after": round(_calibrate_once() * 1000, 1),
        }
    extra["protocol_drains"] = proto

    extra["query_probe_ms"] = query_probe_ms
    extra["cpus"] = CPUS
    extra["drain_config"] = {
        **DRAIN_CONFIG,
        "maxFilesPerTrigger": DRAIN_MFPT,
        "spark.python.worker.reuse": "false",
        "fixture_staged_on": "/dev/shm",
    }
    probe_end = _calibrate_once()
    extra["cpu_probe_ms"] = {
        "baseline": round(baseline * 1000, 1),
        "suite_start": round(probe_start * 1000, 1),
        "suite_end": round(probe_end * 1000, 1),
    }
    extra["host_throttle_ratio"] = round(
        max(probe_start, probe_end) / baseline, 2
    )
    extra["timing_protocol"] = f"best-of-{max(1, BENCH_RUNS)} per batch query"

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query suite wall time (incl. streaming e2e drain)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_value(),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
