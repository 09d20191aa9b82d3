"""Reference-parity log enrichment (SURVEY.md §2.2/§2.3).

Re-expresses the reference's two transform paths as ONE declarative
projection compiled by Catalyst:

- hot-key promotion  attributes['msg'/'url'] → columns
  (transformer/flink_log_transform.py:10-23)
- JSON path + COALESCE fallback for mobile
  (transformer/flink_log_transform.py:18, transformer/log_enricher.py:81-94)
- quality flags is_valid_json / has_data_mobile / is_getotp_url as 0/1
  (transformer/flink_optimized_log_transform.py:77-94) — computed from real
  JSON parses (get_json_object), not LIKE-pattern approximations
- partition columns log_date / log_hour from proper timestamp ops, not
  string slicing (transformer/flink_optimized_log_transform.py:56-57)
- validity filters: timestamp-parse filter (transformer/log_enricher.py:30-62)
  and require-mobile filter (:104-109) as null-safe built-in expressions

Everything stays inside whole-stage codegen — zero Python per record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GETOTP_PATTERN = ".*/auth/v3/getOtp.*"


def promote_and_flag(df: DataFrame) -> DataFrame:
    """LOG_EVENTS_SCHEMA frame → ENRICHED_LOG_SCHEMA frame."""
    # try_to_timestamp: Spark 4 ANSI mode makes to_timestamp THROW on
    # malformed input — dirty rows must yield null, not kill the job
    ts = F.try_to_timestamp(F.col("timestamp"), F.lit("yyyy-MM-dd'T'HH:mm:ssX"))
    mobile = F.coalesce(
        F.get_json_object(F.col("body"), "$.data.mobile"),
        F.col("attributes")["mobile"],
    )
    return df.select(
        "*",
        F.col("attributes")["msg"].alias("msg"),
        F.col("attributes")["url"].alias("url"),
        mobile.alias("mobile"),
        # real JSON validity, not LIKE '{%}' (reference approximation)
        F.when(F.get_json_object(F.col("body"), "$").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_valid_json"),
        F.when(F.get_json_object(F.col("body"), "$.data.mobile").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("has_data_mobile"),
        F.when(F.col("attributes")["url"].rlike(GETOTP_PATTERN), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_getotp_url"),
        F.date_format(ts, "yyyy-MM-dd").alias("log_date"),
        F.hour(ts).cast("long").alias("log_hour"),
        # P9: schema-stable flatten of the non-promoted map — downstream
        # consumers get a plain string column regardless of future keys
        # (reference sink/sample_data_parquet_sink.py:61-63 `<k>_json`)
        F.to_json(F.col("resources")).alias("resources_json"),
        # P8: processing-time stamp, distinct from event time
        # (reference transformer/sample_data_transformer.py:43-44)
        F.current_timestamp().alias("proc_ts"),
    )


def served_query(
    df: DataFrame,
    service: str = "falcon-mec",
    msg: str = "proxy-request",
    t_lo_epoch: int = 1754439000,  # 2025-08-06 00:10:00 UTC
    t_hi_epoch: int = 1754442600,  # 2025-08-06 01:10:00 UTC
    bucket: str = "10 minutes",
    limit: int = 10000,
) -> DataFrame:
    """The reference's served query end-to-end, one declarative plan
    (reference QUERY_OPTIMIZATION_ANALYSIS.md:306-439): time-range +
    service/msg/url predicates + JSON validity + map-merge enrichment
    ``mapConcat(mapFromArrays(['mobile'], [...]), attributes)`` + 10-minute
    buckets + ORDER BY DESC LIMIT.

    All five CTE stages collapse into one Catalyst plan: the filters reach
    the scan (partition pruning on log_date/log_hour when the table is laid
    out that way), the map merge is a JVM expression, and the final top-k
    compiles to TakeOrderedAndProject.
    """
    ts = F.try_to_timestamp(F.col("timestamp"), F.lit("yyyy-MM-dd'T'HH:mm:ssX"))
    # time bounds arrive as epoch seconds and go through FROM_UNIXTIME,
    # exactly as the reference's served query receives them
    # (QUERY_OPTIMIZATION_ANALYSIS.md:431); correct under the UTC session
    # timezone that tune_for_runtime pins
    t_lo = F.from_unixtime(F.lit(t_lo_epoch)).cast("timestamp")
    t_hi = F.from_unixtime(F.lit(t_hi_epoch)).cast("timestamp")
    p1 = df.withColumn("ts", ts).filter((F.col("ts") >= t_lo) & (F.col("ts") < t_hi))
    p2 = p1.filter(
        (F.col("serviceName") == service)
        & (F.col("attributes")["msg"] == msg)
        & F.col("attributes")["url"].rlike(GETOTP_PATTERN)
    )
    json_mobile = F.get_json_object(F.col("body"), "$.data.mobile")
    p3_1 = p2.filter(
        F.get_json_object(F.col("body"), "$").isNotNull() & json_mobile.isNotNull()
    )
    # the reference's mapConcat(mapFromArrays([...]), attributes) resolves
    # key collisions in favor of the JSON-extracted value (ClickHouse map[]
    # returns the first match); Spark's LAST_WIN dedup policy (set in
    # session.tune_for_runtime) + reversed operand order picks the same
    # winner
    enriched = F.map_concat(
        F.col("attributes"),
        F.map_from_arrays(F.array(F.lit("mobile")), F.array(json_mobile)),
    )
    p3 = p3_1.withColumn("attributes", enriched)
    p4 = p3.filter(F.col("attributes")["mobile"] != "")
    return (
        p4.groupBy(F.window("ts", bucket).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
        .orderBy(F.desc("window_start"))
        .limit(limit)
    )


def filter_valid_timestamp(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """F1: drop rows whose timestamp fails ISO parse (to_timestamp → null)."""
    return df.filter(
        F.try_to_timestamp(
            F.col(ts_col), F.lit("yyyy-MM-dd'T'HH:mm:ssX")
        ).isNotNull()
    )


def filter_require_mobile(df: DataFrame, mobile_col: str = "mobile") -> DataFrame:
    """F2: drop rows with null/empty mobile."""
    return df.filter(
        F.col(mobile_col).isNotNull() & (F.length(F.trim(F.col(mobile_col))) > 0)
    )


def prefilter_services(df: DataFrame, services: list[str]) -> DataFrame:
    """F3: ingest-time service pre-filter (designed-but-commented-out in the
    reference, transformer/flink_optimized_log_transform.py:110-111)."""
    return df.filter(F.col("serviceName").isin(services))
