"""URL canonicalization for web-crawl dedup.

Re-crawls of one page arrive under many spellings: tracking params
(utm_*, fbclid, gclid...), fragments, host case, default ports, trailing
slashes. Canonicalizing BEFORE url-level dedup collapses them — the
standard first stage of crawl dedup (content dedup catches the rest).

Everything is built-in expressions (split / filter / array_sort /
array_join / regexp_replace) in whole-stage codegen — no UDF — and every
step has an exact DuckDB twin (list_* functions), so the operator is
oracle-checkable bit-for-bit:

  1. scheme and the whole authority (including any userinfo) lower-cased
  2. default ports dropped (:80 for http, :443 for https)
  3. fragment (#...) dropped
  4. tracking params dropped (utm_* prefix + a fixed denylist)
  5. remaining query params SORTED (param order is not semantic)
  6. trailing '/' dropped from non-root paths; bare host → no slash

Scale: map-side only, zero shuffle; feeds exact_dedup/groupBy downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref", "igshid")
# regex fragments shared with the DuckDB twin (RE2- and Java-compatible).
# Anchored with \z, not $: Java's $ matches BEFORE a final newline while
# RE2's is end-of-text only — with $ a trailing-\n url matches in Java but
# not in RE2; \z means end-of-input in both, so grouping stays identical.
_SPLIT_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)\??([^#]*)(#.*)?\z"


def _canon_query(q: Column) -> Column:
    """Drop tracking params, sort the rest, rejoin with '&'."""
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~F.split(p, "=")[0].isin(*TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(parts), "&")


def canonical_url(url_col: str = "url") -> Column:
    # pure Column API throughout — the regex must never pass through a SQL
    # string literal (F.expr would unescape its backslashes)
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _SPLIT_RE, 1))
    raw_auth = F.lower(F.regexp_extract(u, _SPLIT_RE, 2))
    # default ports: exact ':80'/':443' suffix by scheme
    authority = (
        F.when(
            (scheme == "http") & raw_auth.endswith(":80"),
            raw_auth.substr(F.lit(1), F.length(raw_auth) - 3),
        )
        .when(
            (scheme == "https") & raw_auth.endswith(":443"),
            raw_auth.substr(F.lit(1), F.length(raw_auth) - 4),
        )
        .otherwise(raw_auth)
    )
    raw_path = F.regexp_extract(u, _SPLIT_RE, 3)
    # trailing slash off non-root paths
    path = F.when(
        (F.length(raw_path) > 1) & raw_path.endswith("/"),
        raw_path.substr(F.lit(1), F.length(raw_path) - 1),
    ).otherwise(raw_path)
    path = F.when(path == "/", F.lit("")).otherwise(path)
    query = _canon_query(F.regexp_extract(u, _SPLIT_RE, 4))
    return F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("canonical_url", canonical_url(url_col))


def sql_canonical_url(url_expr: str = "url") -> str:
    """DuckDB twin of canonical_url (same regex, same list pipeline)."""
    re = _SPLIT_RE
    scheme = f"lower(regexp_extract({url_expr}, '{re}', 1))"
    rawauth = f"regexp_extract({url_expr}, '{re}', 2)"
    auth = f"lower({rawauth})"
    authority = f"""CASE
      WHEN {scheme} = 'http' AND {auth} LIKE '%:80'
        THEN substring({auth}, 1, length({auth}) - 3)
      WHEN {scheme} = 'https' AND {auth} LIKE '%:443'
        THEN substring({auth}, 1, length({auth}) - 4)
      ELSE {auth} END"""
    rawpath = f"regexp_extract({url_expr}, '{re}', 3)"
    # two SEQUENTIAL steps exactly like the Spark side (a single CASE would
    # stop after the first branch: path '//' must strip to '/' AND then
    # collapse to '', not stop at '/')
    stripped = f"""(CASE
      WHEN length({rawpath}) > 1 AND {rawpath} LIKE '%/'
        THEN substring({rawpath}, 1, length({rawpath}) - 1)
      ELSE {rawpath} END)"""
    path = f"(CASE WHEN {stripped} = '/' THEN '' ELSE {stripped} END)"
    denylist = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    query = f"""list_aggr(list_sort(list_filter(
        string_split(regexp_extract({url_expr}, '{re}', 4), '&'),
        p -> p <> '' AND NOT starts_with(p, 'utm_')
             AND NOT list_contains([{denylist}], string_split(p, '=')[1]))),
      'string_agg', '&')"""
    return f"""{scheme} || '://' || ({authority}) || ({path}) ||
      (CASE WHEN coalesce({query}, '') <> '' THEN '?' || {query} ELSE '' END)"""
