"""PII / identifier scrubbing for training corpora: redact emails, IPv4
addresses, and long digit runs with typed placeholder tokens, reporting
per-category counts.

Pure JVM `regexp_replace` / `regexp_extract_all` chain — map-side only,
whole-stage-codegen, zero shuffle, so it composes into any scan at 100 TB
for free. Patterns are restricted to the syntax Java regex and RE2 (the
DuckDB oracle) interpret identically: no backreferences, no lookaround.

Stage semantics: each category counts and replaces on the text AS LEFT BY
THE PREVIOUS STAGE (email → ipv4 → digit-run), so a digit run inside an
email is redacted once as <EMAIL> and never double-counted. The staged
intermediates are materialized as projected columns; Catalyst keeps each
regex evaluation single (same CollapseProject note as dedup.shingles_df).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
DIGIT_RUN_RE = "[0-9]{7,}"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, clean_text, n_emails, n_ipv4, n_digit_runs) — one row per doc."""

    def n_matches(col, pat):
        return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long")

    s1 = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t0"),
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>").alias("_t1"),
    )
    s2 = s1.select(
        F.col(id_col),
        "_t0",
        "_t1",
        F.regexp_replace(F.col("_t1"), IPV4_RE, "<IP>").alias("_t2"),
    )
    return s2.select(
        F.col(id_col),
        F.regexp_replace(F.col("_t2"), DIGIT_RUN_RE, "<NUM>").alias("clean_text"),
        n_matches(F.col("_t0"), EMAIL_RE).alias("n_emails"),
        n_matches(F.col("_t1"), IPV4_RE).alias("n_ipv4"),
        n_matches(F.col("_t2"), DIGIT_RUN_RE).alias("n_digit_runs"),
    )


# ---------------------------------------------------------------------------
# DuckDB twin (RE2; 'g' flag = global replace, matching Spark's default)
# ---------------------------------------------------------------------------

def sql_pii_scrub(table: str = "documents", text: str = "text") -> str:
    # the Python constants hold single backslashes; DuckDB's standard
    # single-quoted literals pass them through to RE2 untouched
    email, ipv4, run = EMAIL_RE, IPV4_RE, DIGIT_RUN_RE
    return f"""
WITH s1 AS (
  SELECT doc_id, {text} AS t0,
         regexp_replace({text}, '{email}', '<EMAIL>', 'g') AS t1
  FROM {table}
),
s2 AS (
  SELECT doc_id, t0, t1, regexp_replace(t1, '{ipv4}', '<IP>', 'g') AS t2 FROM s1
)
SELECT doc_id,
       regexp_replace(t2, '{run}', '<NUM>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(t0, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{ipv4}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t2, '{run}')) AS BIGINT) AS n_digit_runs
FROM s2
"""
