#!/usr/bin/env python
"""Per-query noop-sink isolation bench (guide §1.4) — round-6 optimization aid.

NOT the driver contract (bench.py is frozen for measurement). This harness
times individual queries() entries through the noop sink in ONE session,
best-of-N with clearCache between runs, exactly like bench.py's per-query
protocol, but for an arbitrary subset — so a single expensive query can be
iterated on without paying the full suite.

Usage:
    python bench_extra.py <query> [<query> ...]       # best-of-2 each
    BENCH_RUNS=3 SPARK_GRAFT_SF_DIR=... python bench_extra.py <query>
    EXPLAIN=1 python bench_extra.py <query>           # also dump explain to
                                                      # plans/r06/<query>_cur.txt
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
RUNS = int(os.environ.get("BENCH_RUNS", 2))


def main() -> None:
    import __spark_entry__ as entrymod
    from logflow_spark.session import get_spark

    spark = get_spark(
        app_name="logflow_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.python.worker.reuse": "false"},
    )
    entrymod.entry(spark).collect()  # warm up JVM / python workers
    qs = entrymod.queries()
    names = sys.argv[1:] or list(qs)
    total = 0.0
    for name in names:
        if name not in qs:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        if os.environ.get("EXPLAIN"):
            os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
            df = qs[name](spark, SF_DIR)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(REPO, "plans", "r06", f"{name}_cur.txt"), "w"
            ) as f:
                f.write(txt)
        best = None
        for _ in range(max(1, RUNS)):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        total += best
        print(f"{best:8.2f}s  {name}", flush=True)
    print(f"{total:8.2f}s  TOTAL", flush=True)


if __name__ == "__main__":
    main()
