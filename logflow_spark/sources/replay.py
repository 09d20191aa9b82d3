"""Deterministic stream sources.

The reference's source is a Kafka topic consumed either by Flink's Kafka
connector (extractor/flink_kafka_extractor.py:49-106) or a hand-rolled
confluent_kafka poll loop with manual offset commits
(extractor/kafka_extractor.py:52-92). In Spark both collapse to
``spark.readStream``:

- production: ``kafka_stream`` below — format("kafka"); offset tracking,
  commit cadence and replay are owned by the streaming checkpoint (the
  reference's manual commit-every-1000-msgs logic is not reimplemented).
- sandbox/tests: ``replay_stream`` — a chunked-parquet file stream with
  maxFilesPerTrigger=1, giving byte-reproducible micro-batch boundaries and
  therefore reproducible watermark progression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from logflow_spark.schema import HOST_ENRICHMENT_SCHEMA, PAGES_SCHEMA


def replay_stream(
    spark: SparkSession,
    chunk_dir: str,
    schema: StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(chunk_dir)
    )


def pages_replay_stream(spark: SparkSession, chunk_dir: str, **kw) -> DataFrame:
    return replay_stream(spark, chunk_dir, PAGES_SCHEMA, **kw)


def enrichment_replay_stream(spark: SparkSession, chunk_dir: str, **kw) -> DataFrame:
    return replay_stream(spark, chunk_dir, HOST_ENRICHMENT_SCHEMA, **kw)


def parse_kafka_payload(raw: DataFrame, schema: StructType) -> DataFrame:
    """value bytes → typed columns; unparseable JSON rows dropped.

    The reference drops bad rows via 'json.ignore-parse-errors'
    (extractor/flink_kafka_extractor.py:87) and its Python twin skips them
    with a warning (extractor/kafka_extractor.py:69-74); here from_json
    yields null for unparseable payloads and the filter drops them —
    testable on any frame with (value, topic, partition, offset, timestamp).
    """
    parsed = raw.select(
        F.col("value").cast("string").alias("_raw"),
        F.from_json(F.col("value").cast("string"), schema).alias("payload"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_ts"),
    )
    # Spark 4 PERMISSIVE from_json yields a null-fielded struct (not null)
    # for malformed input, so validity is checked on the raw text instead
    return parsed.filter(
        F.get_json_object(F.col("_raw"), "$").isNotNull()
    ).select("payload.*", "topic", "partition", "offset", "kafka_ts")


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: StructType,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Kafka JSON source (reference S1/S2) — value bytes → typed columns.

    Parse-error drop (reference 'json.ignore-parse-errors') falls out of
    from_json returning null: rows with null payload are filtered. Kafka
    metadata (the reference's optional ``_meta``) is exposed as built-in
    columns. Not exercisable in the sandbox (no broker) — covered by the
    replay source which shares every downstream operator.
    """
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return parse_kafka_payload(r.load(), schema)
