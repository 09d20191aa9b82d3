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
