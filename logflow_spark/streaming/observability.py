"""Streaming metrics + multi-sink fan-out + graceful shutdown.

Reference parity:
- A2 counter aggregation (transformer/log_enricher.py:117-128 keeps Python
  counters of processed/dropped + success rate) → here `with_observed_metrics`
  attaches engine-computed per-batch metrics via DataFrame.observe, and
  `MetricsListener` accumulates them from StreamingQueryProgress (no
  hand-rolled counters in the data path).
- MS1 statement-set fan-out (pipeline/flink_kafka_to_parquet.py:271-309: one
  job, print + parquet INSERTs over a shared source) → `fanout_foreach_batch`
  persists each micro-batch once and writes it to every sink.
- MS4 graceful shutdown (pipeline/kafka_to_parquet.py:51-58 SIGINT → flush)
  → `stop_gracefully`: Structured Streaming checkpoints make flush implicit;
  stop() + restart from checkpoint loses nothing (tested in
  tests/test_streaming_windows.py::test_exactly_once_replay_and_resume).
"""

from __future__ import annotations

import threading
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery, StreamingQueryListener


def with_observed_metrics(df: DataFrame, name: str = "logflow_metrics") -> DataFrame:
    """Attach per-batch row/null-text/late-candidate counters (engine-side)."""
    cols = [F.count(F.lit(1)).alias("n_rows")]
    if "text" in df.columns:
        cols.append(F.sum(F.col("text").isNull().cast("long")).alias("n_null_text"))
    if "warc_ts" in df.columns:
        cols.append(F.min("warc_ts").alias("min_ts"))
        cols.append(F.max("warc_ts").alias("max_ts"))
    return df.observe(name, *cols)


class MetricsListener(StreamingQueryListener):
    """Accumulates observed metrics + engine progress per micro-batch."""

    def __init__(self) -> None:
        self.batches: list[dict] = []
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "observed": dict(p.observedMetrics.get("logflow_metrics").asDict())
            if "logflow_metrics" in p.observedMetrics
            else {},
        }
        with self._lock:
            self.batches.append(row)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def totals(self) -> dict:
        with self._lock:
            n = sum(b["num_input_rows"] for b in self.batches)
            obs = sum(b["observed"].get("n_rows", 0) or 0 for b in self.batches)
        return {"num_input_rows": int(n), "observed_rows": int(obs)}


def fanout_foreach_batch(
    sinks: Sequence[Callable[[DataFrame, int], None]],
) -> Callable[[DataFrame, int], None]:
    """One micro-batch, many sinks, one upstream computation (persist once)."""

    def write(df: DataFrame, batch_id: int) -> None:
        df = df.persist()
        try:
            for sink in sinks:
                sink(df, batch_id)
        finally:
            df.unpersist()

    return write


def console_debug_sink(n: int = 5) -> Callable[[DataFrame, int], None]:
    """Reference K3/P7: print sink with map→string casts for readability."""

    def write(df: DataFrame, batch_id: int) -> None:
        printable = df.select(
            *[
                F.to_json(F.col(c)).alias(c)
                if str(t).startswith(("MapType", "ArrayType", "StructType"))
                else F.col(c)
                for c, t in [(f.name, f.dataType) for f in df.schema.fields]
            ]
        )
        print(f"--- batch {batch_id} ---")
        printable.show(n, truncate=False)

    return write


def stop_gracefully(query: StreamingQuery, timeout_s: float = 60.0) -> bool:
    """Stop a streaming query; state is safe in the checkpoint (restart
    resumes from the last committed offsets — no flush step needed)."""
    query.stop()
    return query.awaitTermination(timeout_s)
