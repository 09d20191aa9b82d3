"""Exactly-once idempotent table sink with per-partition lineage + metrics.

The reference gets exactly-once from Flink's checkpoint barriers plus the
filesystem sink's partition-commit protocol (pipeline/flink_kafka_to_parquet.py:216-222,
sink/flink_optimized_parquet_sink.py:102-112). In Spark, Structured Streaming
checkpoints source offsets per micro-batch and REPLAYS a batch_id after a
crash — so end-to-end exactly-once requires the sink to be idempotent per
batch_id. That is Iceberg's model (atomic snapshot commit); this class is the
same protocol self-contained on a filesystem, because the sandbox ships no
Iceberg runtime jar:

  table_dir/
    data/batch_id=<b>/<part_cols...>/*.parquet   (batch-scoped data dirs)
    _commits/<b>.json                            (atomic manifest = commit)

Commit protocol per micro-batch:
  1. already committed? → return (idempotent replay no-op)
  2. write data files under data/batch_id=<b>/ (overwrite → crash debris
     from a previous half-write of the same batch is clobbered, not added)
  3. collect per-partition row counts (lineage + metrics) with one tiny agg
  4. write manifest to _commits/.<b>.json.tmp, fsync, atomic rename to
     _commits/<b>.json  — the rename IS the commit point

Readers (``read``) take the union of committed manifests' files only, so a
crash between 2 and 4 leaves invisible orphans, never duplicates. On a real
cluster the same class works on any rename-atomic store; for S3-class stores
the production target is the Iceberg catalog (`df.writeTo(...).append()`)
with this manifest carried as snapshot summary properties.
"""

from __future__ import annotations

import json
import os
import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(
        self,
        table_dir: str,
        partition_by: Sequence[str] = (),
        compression: str = "zstd",
    ) -> None:
        self.table_dir = table_dir
        self.partition_by = list(partition_by)
        self.compression = compression
        self.data_dir = os.path.join(table_dir, "data")
        self.commits_dir = os.path.join(table_dir, "_commits")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.commits_dir, exist_ok=True)

    # -- commit log --------------------------------------------------------
    def _commit_path(self, batch_id: int) -> str:
        return os.path.join(self.commits_dir, f"{batch_id}.json")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._commit_path(batch_id))

    def committed_batches(self) -> list[int]:
        return sorted(
            int(f[:-5])
            for f in os.listdir(self.commits_dir)
            if f.endswith(".json") and not f.startswith(".")
        )

    def manifests(self) -> list[dict]:
        out = []
        for b in self.committed_batches():
            with open(self._commit_path(b)) as f:
                out.append(json.load(f))
        return out

    # -- write path --------------------------------------------------------
    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch body. Idempotent per batch_id."""
        if self.is_committed(batch_id):
            return
        batch_dir = os.path.join(self.data_dir, f"batch_id={batch_id}")

        # Lineage/metrics in the same pass as the write: cache once, one
        # tiny agg on partition columns (or a global count) after the write.
        # Only unpersist if WE cached it — a fan-out wrapper may have cached
        # the batch for other sinks (evicting theirs forces a source re-read).
        was_cached = df.is_cached
        if not was_cached:
            df = df.persist()
        try:
            writer = df.write.mode("overwrite").option(
                "compression", self.compression
            )
            if self.partition_by:
                writer = writer.partitionBy(*self.partition_by)
            writer.parquet(batch_dir)

            if self.partition_by:
                pc = (
                    df.groupBy(*self.partition_by)
                    .agg(F.count(F.lit(1)).alias("rows"))
                    .collect()
                )
                partition_counts = {
                    "/".join(f"{k}={r[k]}" for k in self.partition_by): r["rows"]
                    for r in pc
                }
                n_rows = sum(partition_counts.values())
            else:
                n_rows = df.count()
                partition_counts = {"": n_rows}
        finally:
            if not was_cached:
                df.unpersist()

        files = []
        for root, _dirs, names in os.walk(batch_dir):
            for name in sorted(names):
                if name.endswith(".parquet"):
                    p = os.path.join(root, name)
                    files.append(
                        {
                            "path": os.path.relpath(p, self.table_dir),
                            "bytes": os.path.getsize(p),
                        }
                    )
        manifest = {
            "batch_id": batch_id,
            "n_rows": n_rows,
            "n_files": len(files),
            "partition_counts": partition_counts,
            "files": files,
            "committed_at_unix": time.time(),
        }
        tmp = os.path.join(self.commits_dir, f".{batch_id}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._commit_path(batch_id))  # commit point

    def foreach_batch(self):
        """Adapter for writeStream.foreachBatch."""
        return lambda df, batch_id: self.write_batch(df, batch_id)

    # -- read path ---------------------------------------------------------
    def committed_files(self) -> list[str]:
        return [
            os.path.join(self.table_dir, f["path"])
            for m in self.manifests()
            for f in m["files"]
        ]

    def read(self, spark: SparkSession) -> DataFrame:
        """Snapshot read: committed files only (uncommitted debris invisible).

        basePath keeps hive-style partition columns; batch_id is dropped
        (physical bookkeeping, not table schema).
        """
        files = self.committed_files()
        if not files:
            raise FileNotFoundError(f"no committed batches in {self.table_dir}")
        df = spark.read.option("basePath", self.data_dir).parquet(*files)
        return df.drop("batch_id")

    def metrics(self) -> dict:
        ms = self.manifests()
        total = sum(m["n_rows"] for m in ms)
        per_partition: dict[str, int] = {}
        for m in ms:
            for k, v in m["partition_counts"].items():
                per_partition[k] = per_partition.get(k, 0) + v
        return {
            "n_batches": len(ms),
            "total_rows": total,
            "per_partition_rows": per_partition,
        }
