"""URL canonicalization: hand-built cases covering every rule, plus
cross-engine parity against the DuckDB twin."""

from __future__ import annotations

import duckdb
import pandas as pd

CASES = [
    # (raw, expected)
    ("HTTP://WWW.Example.COM/Path", "http://www.example.com/Path"),  # path case kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),  # non-default kept
    ("http://example.com:443/a", "http://example.com:443/a"),  # wrong-scheme port kept
    ("http://example.com/a/", "http://example.com/a"),
    ("http://example.com/", "http://example.com"),
    ("http://example.com", "http://example.com"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?utm_source=x&utm_medium=y", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?fbclid=1&z=9&gclid=2&ref=h", "http://example.com/a?z=9"),
    ("http://example.com/a?keep=utm_not_prefix", "http://example.com/a?keep=utm_not_prefix"),
    ("http://User:Pw@example.com/a", "http://user:pw@example.com/a"),  # authority lowered
    ("http://example.com//", "http://example.com"),  # strip THEN root-collapse
]


def test_trailing_newline_cross_engine_parity(spark):
    """Java's $ matches before a final newline, RE2's does not — the \\z
    anchor must keep both engines grouping a trailing-\\n url identically."""
    import duckdb as _duckdb

    from logflow_spark.operators.urlnorm import (
        canonicalize_urls,
        sql_canonical_url,
    )

    pdf = pd.DataFrame({"i": [0], "url": ["http://h/p#f\n"]})
    con = _duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(f"SELECT {sql_canonical_url('url')} FROM t").fetchone()[0]
    got = canonicalize_urls(spark.createDataFrame(pdf)).collect()[0]["canonical_url"]
    assert got == exp


def test_duration_parser_accepts_singular_units():
    import pytest as _pytest

    from logflow_spark.streaming.durations import duration_us

    assert duration_us("1 hour") == 3_600_000_000
    assert duration_us("30 minutes") == 1_800_000_000
    assert duration_us("45 seconds") == 45_000_000
    assert duration_us("2 hours") == 7_200_000_000
    with _pytest.raises(ValueError):
        duration_us("5 fortnights")
    with _pytest.raises(ValueError):
        duration_us("30minutes")


def test_canonical_url_cases(spark):
    from logflow_spark.operators.urlnorm import canonicalize_urls

    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(CASES)), "url": [c[0] for c in CASES]})
    )
    got = {
        r["i"]: r["canonical_url"] for r in canonicalize_urls(df).collect()
    }
    for i, (raw, exp) in enumerate(CASES):
        assert got[i] == exp, f"{raw!r}: {got[i]!r} != {exp!r}"


def test_canonical_url_duckdb_parity(spark):
    from logflow_spark.operators.urlnorm import (
        canonicalize_urls,
        sql_canonical_url,
    )

    pdf = pd.DataFrame({"i": range(len(CASES)), "url": [c[0] for c in CASES]})
    con = duckdb.connect()
    con.register("t", pdf)
    exp = {
        i: c
        for i, c in con.execute(
            f"SELECT i, {sql_canonical_url('url')} AS c FROM t"
        ).fetchall()
    }
    df = spark.createDataFrame(pdf)
    got = {r["i"]: r["canonical_url"] for r in canonicalize_urls(df).collect()}
    assert got == exp
