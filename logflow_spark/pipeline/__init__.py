"""Pipeline orchestration parity with the reference (SURVEY.md §2.11).

Same user-facing contract as the reference's main.py / runner/:
  name → class registry, `k=v` CLI params, build()/run() protocol,
  YAML DAG with depends_on + retries executed on a thread pool.
Each pipeline's run() drives a Spark job instead of a Flink/consumer loop.
"""

from logflow_spark.pipeline.registry import PIPELINES, get_pipeline, register  # noqa: F401
