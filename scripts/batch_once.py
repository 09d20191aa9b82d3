import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from logflow_spark.session import get_spark
from logflow_spark.schema import PAGES_SCHEMA
from logflow_spark.streaming.topology import TopologyConfig, build_windowed_topology
cores, fx = int(sys.argv[1]), sys.argv[2]
cfg = TopologyConfig(window_kind="tumbling", watermark="73 hours", sum_text_chars=True,
                     extract_mode=os.environ.get("DRAIN_EXTRACT", "udf"))
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores, app_name=f"b{cores}",
    extra_conf={"spark.local.dir": "/dev/shm/logflow_bench/sl",
                "spark.python.worker.reuse": os.environ.get("DRAIN_REUSE", "false")})
df = spark.read.schema(PAGES_SCHEMA).parquet(fx)
df.count()
t0=time.time()
build_windowed_topology(df, cfg, streaming=False).write.format("noop").mode("overwrite").save()
print(f"RESULT batch cores={cores} seconds={round(time.time()-t0,3)}")
