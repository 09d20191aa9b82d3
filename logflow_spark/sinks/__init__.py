"""Sinks (SURVEY.md §2.10)."""

from logflow_spark.sinks.exactly_once import ExactlyOnceParquetSink  # noqa: F401
