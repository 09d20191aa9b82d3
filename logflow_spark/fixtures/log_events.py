"""`log_events` — reference-parity log records (FIXTURES.md §3).

Schema mirrors the reference source DDL (extractor/flink_kafka_extractor.py:71-77);
values mirror its sample generator (extractor/sample_data_generator_extractor.py:38-64)
but fully deterministic in the row index:

- every 13th row omits attributes['mobile']   → exercises COALESCE fallback
- every 11th row body = "not json"            → is_valid_json = 0
- every 13th row body = "{}"                  → has_data_mobile = 0
"""

from __future__ import annotations

import json

import pandas as pd

SERVICES = ("falcon-mec", "auth-service", "payment-gateway", "user-service")
SEVERITIES = ("INFO", "WARN", "ERROR", "DEBUG")
URLS = ("/auth/v3/getOtp", "/api/v1/users", "/payments/process", "/health/check")
ENVS = ("prod", "staging", "dev")


def log_event(i: int) -> dict:
    hh, mm, ss = (i // 3600) % 24, (i // 60) % 60, i % 60
    mobile = f"98765{43210 + i:05d}"
    attributes = {"msg": "proxy-request", "url": URLS[i % 4]}
    if i % 13 != 0:
        attributes["mobile"] = mobile
    if i % 11 == 0:
        body = "not json"
    elif i % 13 == 0:
        body = "{}"
    else:
        body = json.dumps({"data": {"mobile": mobile}})
    return {
        "timestamp": f"2025-08-06T{hh:02d}:{mm:02d}:{ss:02d}Z",
        "serviceName": SERVICES[i % 4],
        "severityText": SEVERITIES[i % 4],
        "attributes": attributes,
        "resources": {"host": f"ip-10-10-10-{10 + i % 3}", "env": ENVS[i % 3]},
        "body": body,
    }


def log_events_pandas(n: int) -> pd.DataFrame:
    return pd.DataFrame([log_event(i) for i in range(n)])


def log_events_spark_df(spark, n: int):
    from logflow_spark.schema import LOG_EVENTS_SCHEMA

    return spark.createDataFrame(log_events_pandas(n), schema=LOG_EVENTS_SCHEMA)
