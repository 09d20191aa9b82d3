"""Kafka-payload parse semantics, validity filters, partitioned enrich write."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from logflow_spark.fixtures.log_events import log_event
from logflow_spark.operators.log_enrich import (
    filter_require_mobile,
    filter_valid_timestamp,
    prefilter_services,
    promote_and_flag,
)
from logflow_spark.schema import LOG_EVENTS_SCHEMA
from logflow_spark.sources.replay import parse_kafka_payload

from tests.conftest import CACHE


def test_kafka_payload_parse_drops_bad_json(spark):
    """S1 semantics: unparseable value → dropped; valid → typed columns +
    kafka metadata (the reference's optional _meta enrichment)."""
    from datetime import datetime

    good = json.dumps(log_event(1))
    rows = [
        (good.encode(), "logs", 0, 100, datetime(2025, 8, 6)),
        (b"not json at all", "logs", 0, 101, datetime(2025, 8, 6)),
        (b"{}", "logs", 1, 102, datetime(2025, 8, 6)),  # parseable, all-null fields
    ]
    raw = spark.createDataFrame(
        rows, schema="value binary, topic string, partition int, offset long, timestamp timestamp"
    )
    out = parse_kafka_payload(raw, LOG_EVENTS_SCHEMA).collect()
    offsets = sorted(r["offset"] for r in out)
    assert offsets == [100, 102]  # bad JSON dropped, empty object kept
    full = [r for r in out if r["offset"] == 100][0]
    assert full["serviceName"] == log_event(1)["serviceName"]
    assert full["attributes"]["msg"] == "proxy-request"
    assert full["topic"] == "logs" and full["partition"] == 0


def test_validity_filters(spark):
    rows = [log_event(i) for i in range(40)]
    rows[3]["timestamp"] = "garbage"
    df = spark.createDataFrame(rows, schema=LOG_EVENTS_SCHEMA)
    assert filter_valid_timestamp(df).count() == 39  # F1 drops the bad row

    enriched = promote_and_flag(df)
    with_mobile = filter_require_mobile(enriched)
    # body JSON carries mobile except every 11th (not json) and 13th ({});
    # attributes carry it except every 13th → rows where BOTH miss: i % 13 == 0
    missing = sum(1 for i in range(40) if i % 13 == 0)
    assert with_mobile.count() == 40 - missing

    only_auth = prefilter_services(df, ["auth-service"])
    assert only_auth.count() == sum(
        1 for i in range(40) if log_event(i)["serviceName"] == "auth-service"
    )


def test_log_enrich_pipeline_partitioned_write(spark):
    """K2 parity: enrich + partitionBy(log_date, log_hour) round-trips."""
    import __spark_entry__ as m

    m._ensure_log_events()
    out = os.path.join(CACHE, "enrich_out")
    shutil.rmtree(out, ignore_errors=True)

    from logflow_spark.pipeline.runner import run_pipeline

    n = run_pipeline(
        "log_events_enrich",
        {"input_path": m.LOG_EVENTS_PATH, "output_dir": out},
    )
    assert n == m.LOG_EVENTS_N
    # hive-style partition dirs exist and the partition column round-trips
    dates = [d for d in os.listdir(out) if d.startswith("log_date=")]
    assert dates, "expected log_date=... partition directories"
    back = spark.read.parquet(out)
    assert back.filter(F.col("is_getotp_url") == 1).count() > 0
    assert set(back.columns) >= {"msg", "url", "mobile", "log_date", "log_hour"}
