#!/usr/bin/env python
"""Time the driver correctness gate's per-query cost (Spark run + DuckDB
oracle) at sf0.01 in queries() dict order — the profile that decides whether
all entries fit the driver's wall budget in ONE round. Prints a sorted
table + cumulative time.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("GATE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    import __spark_entry__ as m
    from logflow_spark.session import get_spark

    spark = get_spark(
        app_name="time_gate", master="local[32]", shuffle_partitions=32
    )
    m.entry(spark).collect()  # warm up

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = m.queries()
    oracles = m.oracle_sql()
    rows = []
    t_start = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        n_spark = len(fn(spark, SF).collect())
        t_spark = time.time() - t0
        t1 = time.time()
        n_oracle = -1
        if name in oracles:
            n_oracle = len(con.execute(oracles[name]).fetchall())
        t_oracle = time.time() - t1
        rows.append((name, t_spark, t_oracle, n_spark, n_oracle))
        print(
            f"{name:35s} spark {t_spark:6.2f}s  oracle {t_oracle:6.2f}s  "
            f"rows {n_spark}/{n_oracle}  cum {time.time()-t_start:7.1f}s",
            flush=True,
        )

    total = time.time() - t_start
    print(f"\nTOTAL {total:.1f}s for {len(rows)} queries")
    print("\nTop 15 by combined cost:")
    for name, ts, to, *_ in sorted(rows, key=lambda r: -(r[1] + r[2]))[:15]:
        print(f"  {name:35s} {ts+to:6.2f}s (spark {ts:.2f} oracle {to:.2f})")
    spark.stop()


if __name__ == "__main__":
    main()
