"""The flagship streaming topology (north_rule):

  source (chunked replay / kafka)
    → parse   (html → text via Arrow pandas UDF, only where text is null)
    → enrich  (host(url) JVM-side; optional as-of host enrichment)
    → window-aggregate (tumbling / sliding / session, watermarked)
    → sink    (exactly-once commit-log parquet table)

The transformation chain is ONE function (`build_windowed_topology`) applied
to either a batch frame (oracle) or a streaming frame (production) — the
streaming-vs-batch equivalence the reference never had (its watermark
parameter was accepted but never wired: extractor/flink_kafka_extractor.py:17,33).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from logflow_spark.functions.text import extract_text_udf
from logflow_spark.operators import windows as W
from logflow_spark.sinks.exactly_once import ExactlyOnceParquetSink


@dataclass
class TopologyConfig:
    window_kind: str = "tumbling"  # tumbling | sliding | session
    duration: str = "10 minutes"
    slide: str = "5 minutes"
    gap: str = "30 minutes"
    watermark: str = "30 minutes"
    keys: tuple[str, ...] = ("lang", "host")
    ts_col: str = "warc_ts"
    extract_when_missing: bool = True
    # aggregate over the EXTRACTED text so the parse stage is load-bearing:
    # without a consumer, Catalyst's column pruning deletes the html→text
    # UDF from the plan entirely (correct, but then the topology no longer
    # contains its parse stage)
    sum_text_chars: bool = False
    extra_aggs: list = field(default_factory=list)
    # how html→text runs: 'udf' = Arrow pandas UDF (default), 'arrow' =
    # mapInArrow (no pandas wrapper), 'jvm' = built-in-expression twin
    # (whole-stage codegen, zero Python boundary). All three are
    # byte-identical per url (tests/test_property_extraction.py).
    extract_mode: str = "udf"


def parse_and_enrich(df: DataFrame, cfg: TopologyConfig) -> DataFrame:
    """html→text (vectorized, only for rows missing text) + host key."""
    if cfg.extract_when_missing and "html" in df.columns:
        if cfg.extract_mode == "jvm":
            from logflow_spark.functions.text import extract_text_expr

            extracted = extract_text_expr(F.col("html"))
        elif cfg.extract_mode == "arrow":
            from pyspark.sql.types import StructType

            from logflow_spark.functions.text import extract_text_arrow_iter

            out_schema = StructType(
                [f for f in df.schema.fields if f.name != "html"]
            )
            df = df.mapInArrow(extract_text_arrow_iter, schema=out_schema)
            return W.with_host(df)
        else:
            extracted = extract_text_udf(F.col("html"))
        df = df.withColumn("text", F.coalesce(F.col("text"), extracted))
    return W.with_host(df)


def windowed_agg(df: DataFrame, cfg: TopologyConfig) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("cnt")] + list(cfg.extra_aggs)
    if cfg.sum_text_chars:
        aggs.append(F.sum(F.length("text")).alias("sum_chars"))
    if cfg.window_kind == "tumbling":
        return W.tumbling_counts(df, cfg.ts_col, cfg.duration, cfg.keys, aggs=aggs)
    if cfg.window_kind == "sliding":
        return W.sliding_counts(
            df, cfg.ts_col, cfg.duration, cfg.slide, cfg.keys, aggs=aggs
        )
    if cfg.window_kind == "session":
        return W.session_counts(df, cfg.ts_col, cfg.gap, cfg.keys, aggs=aggs)
    raise ValueError(f"unknown window kind {cfg.window_kind}")


def build_windowed_topology(
    df: DataFrame, cfg: TopologyConfig, streaming: bool
) -> DataFrame:
    out = parse_and_enrich(df, cfg)
    if streaming:
        out = out.withWatermark(cfg.ts_col, cfg.watermark)
    return windowed_agg(out, cfg)


def run_streaming_to_sink(
    stream_df: DataFrame,
    cfg: TopologyConfig,
    sink: ExactlyOnceParquetSink,
    checkpoint_dir: str,
    available_now: bool = True,
    output_mode: str = "append",
) -> StreamingQuery:
    """Wire the topology to the exactly-once sink.

    append mode + watermark → a window's row is emitted exactly once, when
    the watermark passes its end (late rows beyond the watermark are
    dropped). availableNow drains a replay fixture to completion and stops —
    the deterministic test/bench mode; omit for a long-running query.
    """
    agg = build_windowed_topology(stream_df, cfg, streaming=True)
    w = (
        agg.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink.foreach_batch())
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
