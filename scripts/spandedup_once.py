#!/usr/bin/env python
"""Single batch span-dedup pass in a fresh JVM (scaling measurement unit
for the third topology: the batch shuffle-shaped LLM-data operator).

Usage: spandedup_once.py <cores> <corpus_dir> [scratch_dir]
Prints: RESULT cores=<n> seconds=<wall> rows=<docs> dropped=<spans_dropped>

Protocol matches curate_once.py: corpus staged on tmpfs, fresh JVM, input
pre-read (warm page cache, untimed), the timed region is the operator plan
through a noop write. rows/dropped are asserted level-independent by the
orchestrator.
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from logflow_spark.operators.spandedup import span_dedup
from logflow_spark.session import get_spark

cores = int(sys.argv[1])
fx = sys.argv[2]
scratch = sys.argv[3] if len(sys.argv) > 3 else "/dev/shm/logflow_bench"
os.makedirs(scratch, exist_ok=True)

staged = os.path.join(scratch, "fx_" + os.path.basename(os.path.normpath(fx)))
if not os.path.exists(os.path.join(staged, "_SUCCESS")):
    shutil.rmtree(staged, ignore_errors=True)
    shutil.copytree(fx, staged)
fx = staged

spark = get_spark(
    master=f"local[{cores}]",
    shuffle_partitions=cores,
    app_name=f"spandedup{cores}",
    extra_conf={
        "spark.local.dir": os.path.join(scratch, "sl"),
        "spark.driver.memory": "12g",
    },
)
docs = spark.read.parquet(fx)
n_docs = docs.count()  # warm cache, untimed

t0 = time.time()
rep = span_dedup(docs, span_tokens=10, min_dup=2)
rep.write.format("noop").mode("overwrite").save()
dt = time.time() - t0

# level-independence stats OUTSIDE the timed region (they re-run the plan)
stats = rep.agg(
    F.count(F.lit(1)).alias("n"), F.sum("n_dropped").alias("d")
).collect()[0]
print(
    f"RESULT cores={cores} seconds={round(dt, 3)} "
    f"rows={stats['n']} dropped={stats['d']}"
)
