"""logflow_spark — a PySpark-native streaming analytics engine.

A from-scratch rebuild of the capabilities of the reference log-ingestion
framework (``ankur334/logflow``: Kafka → transform → partitioned Parquet with a
PyFlink streaming engine and a pure-Python micro-batch engine), re-expressed
Spark-first:

- sources   → Structured Streaming (file-replay / kafka / rate) DataFrames
- transforms → declarative DataFrame expressions compiled by Catalyst
- windows   → tumbling / sliding / session event-time windows with watermarks
- joins     → watermarked stream-stream interval joins + stateful as-of joins
              via ``applyInPandasWithState``
- sinks     → exactly-once idempotent commit-log Parquet table (Iceberg-style
              semantics: atomic manifest commit, per-partition lineage+metrics)
- per-record logic → Arrow-vectorized pandas UDFs only (no per-row Python)

See SURVEY.md for the full operator mapping to the reference implementation.
"""

__version__ = "0.1.0"
