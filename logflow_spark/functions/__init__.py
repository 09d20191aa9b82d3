"""Vectorized scalar-function surface of the engine.

All per-record logic crosses the Python boundary ONLY as Arrow-batched pandas
UDFs (input_hint: "no per-row Python"); everything expressible with built-in
``pyspark.sql.functions`` stays JVM-side in whole-stage codegen.
"""

from logflow_spark.functions.text import (  # noqa: F401
    extract_text_py,
    extract_text_udf,
    host_expr,
    host_py,
)
