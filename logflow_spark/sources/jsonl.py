"""JSONL (newline-delimited JSON) page source — the interchange shape a
Common-Crawl-style ingest actually arrives in when it is not already
parquet: one JSON object per line with (url, warc_ts, html_b64, text,
lang). Binary html travels base64 (JSON has no bytes type) and is decoded
to the engine's `binary` column on read.

Contract matches the Kafka JSON source (replay.parse_kafka_payload /
reference 'json.ignore-parse-errors'): corrupt lines are DROPPED, not
failed — Spark's PERMISSIVE mode lands them in a corrupt-record column we
filter on. Rows missing the required `url` are dropped with them (a page
without a key is unusable downstream).

Batch and streaming readers share one schema + projection, so a backfill
over historical JSONL and the live file stream produce identical frames.
At scale the JSON scan is the expensive part (no column pruning inside a
text row) — land JSONL to parquet once at ingest (exactly-once sink) and
run everything downstream on the columnar copy; this source exists for
that first hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# read-side schema: all strings (+ the corrupt-record sink column);
# typing happens in the shared projection below
PAGES_JSONL_READ_SCHEMA = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", StringType(), True),
        StructField("html_b64", StringType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("_corrupt", StringType(), True),
    ]
)


def _project(df: DataFrame) -> DataFrame:
    return (
        df.filter(F.col("_corrupt").isNull() & F.col("url").isNotNull())
        .select(
            F.col("url"),
            F.to_timestamp("warc_ts").alias("warc_ts"),
            F.unbase64(F.col("html_b64")).alias("html"),
            F.col("text"),
            F.col("lang"),
        )
    )


def pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Batch read: (url, warc_ts, html, text, lang), corrupt lines dropped."""
    df = (
        spark.read.schema(PAGES_JSONL_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return _project(df)


def pages_jsonl_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming read of a JSONL directory — same projection and drop
    contract as the batch reader, so backfill == live."""
    df = (
        spark.readStream.schema(PAGES_JSONL_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .json(path)
    )
    return _project(df)
