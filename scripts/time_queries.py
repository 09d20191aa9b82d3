"""Time every __spark_entry__ query at the driver SF (Spark side only).

Ad-hoc profiling aid for ordering/trimming the driver correctness budget:
prints one line per query with wall seconds for build + action.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    only = sys.argv[1:]
    total = 0.0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF)
            n = df.count()
            dt = time.time() - t0
            total += dt
            print(f"{dt:8.2f}s  {name}  rows={n}", flush=True)
        except Exception as e:  # noqa: BLE001
            dt = time.time() - t0
            total += dt
            print(f"{dt:8.2f}s  {name}  ERROR {e}", flush=True)
    print(f"{total:8.2f}s  TOTAL", flush=True)


if __name__ == "__main__":
    main()
