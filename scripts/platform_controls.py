#!/usr/bin/env python
"""Hardware controls behind BENCH/BASELINE.md's 4→16 saturation analysis.

Three measurements, no Spark involved:

1. cpu:       pure-Python integer burn at 4 vs 16 processes — does the
              host grant 4x the CYCLES? (measured 0.93 eff)
2. bandwidth: warmed 100MB numpy copyto at 2/4/8/16 processes — does the
              host grant 4x the MEMORY TRAFFIC? (measured 0.73 eff 4→16,
              0.91 eff 2→8 — the platform ceiling for parquet+extract)
3. sample:    /proc/stat busy%/steal% timeline to run alongside a drain
              (usage: `python scripts/platform_controls.py sample 120 &`)
              — distinguishes cycle-starvation (busy% drops) from
              bandwidth throttling (busy% constant, throughput drops).
"""

from __future__ import annotations

import sys
import time


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_control() -> None:
    import multiprocessing as mp

    for procs in (4, 16):
        t0 = time.perf_counter()
        with mp.Pool(procs) as pool:
            pool.map(_burn, [20_000_000] * procs)
        dt = time.perf_counter() - t0
        print(f"{procs} procs: {procs * 20 / dt:.1f} Mloops/s aggregate")


def _burn_mem(q) -> None:
    import numpy as np

    a = np.ones(12_500_000, dtype=np.float64)  # 100MB
    b = np.empty_like(a)
    np.copyto(b, a)  # fault-in pages BEFORE timing — a cold first pass
    # measures THP/page-fault cost (or a hypervisor throttle response),
    # not steady bandwidth
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < 5:
        np.copyto(b, a)
        n += 1
    q.put(n * a.nbytes * 2 / 1e9)


def bandwidth_control() -> None:
    import multiprocessing as mp

    for procs in (2, 4, 8, 16):
        q = mp.Queue()
        ps = [mp.Process(target=_burn_mem, args=(q,)) for _ in range(procs)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        total = sum(q.get() for _ in ps)
        print(f"{procs} procs: {total / 5:.1f} GB/s aggregate", flush=True)
        time.sleep(10)


def sample(duration_s: int) -> None:
    prev = None
    t0 = time.time()
    while time.time() - t0 < duration_s:
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:]))
        if prev:
            dt = [a - b for a, b in zip(vals, prev)]
            tot = sum(dt)
            if tot:
                busy = 100 * (tot - dt[3] - dt[4]) / tot
                steal = 100 * dt[7] / tot
                print(
                    f"t+{time.time()-t0:6.1f}s busy%={busy:5.1f} "
                    f"steal%={steal:4.1f}",
                    flush=True,
                )
        prev = vals
        time.sleep(2)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("cpu", "all"):
        cpu_control()
    if which in ("bandwidth", "all"):
        bandwidth_control()
    if which == "sample":
        sample(int(sys.argv[2]) if len(sys.argv) > 2 else 120)
