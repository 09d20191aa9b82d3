"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All JVM-side built-in expressions (split/regexp/md5/conv) — no Python in the
hot path; every operator has an exact ANSI-SQL twin used as the DuckDB oracle
(__spark_entry__.oracle_sql), so the semantics are pinned cross-engine:

- tokens         = regexp-split on \\s+, empty tokens removed
- token_count_bpe = count of BPE-ish units: [A-Za-z]+ | [0-9] | other symbol
- lang_id        = argmax over per-language stopword hit counts (tie → 'und')
- quality        = 0.4*min(1, tokens/100) + 0.3*(1-punct_ratio) + 0.3*stop_ratio,
                   emitted as floor(x*1e6+0.5) scaled int (engine-portable)
- fingerprint64  = first 60 bits of md5 of whitespace-normalized lowercase text
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# per-language stopword lists (tiny n-gram-free heuristic; deterministic)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "en"),
}
LANG_ORDER = ("en", "de", "fr", "es")  # deterministic tie-break order
# DuckDB/RE2 twin of Java's \s ([ \t\n\x0B\f\r]). RE2's \s LACKS \x0B
# (vertical tab), so every oracle regex spells the set explicitly — a
# document containing U+000B must tokenize/count identically in both
# engines (escapes resolve inside the regex engine; SQL strings don't
# interpret backslashes).
SQL_JAVA_WS = "\\t\\n\\x0B\\f\\r "
BPE_TOKEN_REGEX = f"[A-Za-z]+|[0-9]|[^A-Za-z0-9{SQL_JAVA_WS}]"  # oracle-only


def tokens_col(text_col: str = "text") -> Column:
    return F.filter(
        F.split(F.col(text_col), "\\s+"), lambda x: x != F.lit("")
    )


def token_count_ws(text_col: str = "text") -> Column:
    return F.size(tokens_col(text_col)).cast("long")


def token_count_bpe(text_col: str = "text") -> Column:
    """Count of BPE_TOKEN_REGEX matches by unit arithmetic: every char is
    consumed as part of a letter run, a single digit, a single punct char,
    or skipped whitespace — so the match count is

        alpha_runs + digit_chars + punct_chars

    2x the extract_all form (no match array materialized; the digit and
    punct terms are translate arithmetic, see punct_count). Equivalence
    verified against the alternation on punct/digit/run mixes."""
    t = F.col(text_col)
    alpha_runs = F.size(
        F.regexp_extract_all(t, F.lit("[A-Za-z]+"), F.lit(0))
    ).cast("long")
    digit_chars = F.length(t) - F.length(F.translate(t, "0123456789", ""))
    return (alpha_runs + digit_chars + punct_count(text_col)).cast("long")


def stopword_hits(lang: str, text_col: str = "text") -> Column:
    toks = tokens_col(text_col)
    words = list(STOPWORDS[lang])
    return F.size(
        F.filter(toks, lambda x: F.lower(x).isin(words))
    ).cast("long")


def lang_id_col(text_col: str = "text") -> Column:
    """argmax of stopword hits; 'und' when all scores are 0; first-listed
    language wins ties (deterministic)."""
    scores = [stopword_hits(lang, text_col) for lang in LANG_ORDER]
    best = F.greatest(*scores)
    expr = F.lit("und")
    # build reversed so earlier languages take precedence on ties
    for lang, sc in reversed(list(zip(LANG_ORDER, scores))):
        expr = F.when((best > 0) & (sc == best), F.lit(lang)).otherwise(expr)
    return expr


# the exact char sets of the oracle's [^A-Za-z0-9\s] complement (Java \s
# is ASCII-only, matching RE2's): every char is alnum, ws, or "punct"
_ALNUM = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)
_WS = " \t\n\x0b\f\r"


def punct_count(text_col: str = "text") -> Column:
    """Count of chars matching [^A-Za-z0-9\\s], via set arithmetic:

        punct = len(minus_alnum) + len(minus_ws) - len(text)

    with the deletions done by ``translate`` (char-map, no regex). The
    direct forms are pathologically slow in Java regex: any NEGATED class
    containing whitespace costs ~15x a positive class scan (measured 7.9-9s
    vs 0.6s per 200k docs at 4 cores — regexp_extract_all, regexp_replace
    and rlike all hit it); translate does the same work in 2.6s. Exact for
    all inputs incl. non-ASCII (verified vs the negated-class oracle)."""
    t = F.col(text_col)
    return (
        F.length(F.translate(t, _ALNUM, ""))
        + F.length(F.translate(t, _WS, ""))
        - F.length(t)
    ).cast("long")


def quality_score_scaled(text_col: str = "text") -> Column:
    """Composite quality score × 1e6 as bigint (portable across engines)."""
    n_tok = token_count_ws(text_col).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    punct_ratio = F.when(
        n_chars > 0, punct_count(text_col).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0,
        (
            stopword_hits("en", text_col)
            + stopword_hits("de", text_col)
            + stopword_hits("fr", text_col)
            + stopword_hits("es", text_col)
        ).cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * stop_ratio
    )
    return F.floor(score * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def fingerprint64(text_col: str = "text") -> Column:
    """60-bit content fingerprint of normalized text (md5-based, portable)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), "\\s+", " "))
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")


def profile_score_cols(toks_col: str = "_toks") -> dict[str, Column]:
    """Per-language stopword-score columns to stage in a SECOND projection.

    Each score is an interpreted higher-order ``filter`` over the token
    array and is consumed three times downstream (argmax, tie test, total);
    staged as its own column it is evaluated once — interpreted HOFs get no
    codegen common-subexpression elimination, so the old single-projection
    form scanned the token array ~12x per row (round 6; same
    CollapseProject staging rule as the token array itself)."""
    toks = F.col(toks_col)

    def hits(lang: str):
        words = list(STOPWORDS[lang])
        return F.size(F.filter(toks, lambda x: F.lower(x).isin(words))).cast("long")

    return {f"_sc_{lang}": hits(lang) for lang in LANG_ORDER}


def staged_profile_exprs(
    text_col: str = "text", toks_col: str = "_toks"
) -> dict[str, Column]:
    """Profile expressions over PRE-STAGED token-array AND score columns.

    Callers must project ``tokens_col(text_col).alias(toks_col)`` in one
    select, then ``**profile_score_cols(toks_col)`` in a second — staging
    keeps each non-cheap subtree evaluated once (Catalyst CollapseProject
    keeps a staged column materialized when referenced more than once;
    composing everything into one expression re-splits the text ~10x,
    measured ~2.5x slower). Shared by ``text_profile`` and the streaming
    curation gate so both run the single-tokenization plan.
    """
    toks = F.col(toks_col)
    scores = {lang: F.col(f"_sc_{lang}") for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    lang_pred = F.lit("und")
    for lang in reversed(LANG_ORDER):
        lang_pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            lang_pred
        )
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(F.col(text_col)).cast("double")
    punct = punct_count(text_col)
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    total_hits = None
    for lang in LANG_ORDER:
        total_hits = scores[lang] if total_hits is None else total_hits + scores[lang]
    stop_ratio = F.when(
        n_tok > 0, total_hits.cast("double") / n_tok.cast("double")
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tok.cast("double") / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * stop_ratio
    )
    return {
        "n_tokens": n_tok,
        "lang_pred": lang_pred,
        "quality_e6": F.floor(score * F.lit(1000000.0) + F.lit(0.5)).cast("long"),
    }


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass profile: all text-analysis columns from ONE tokenization
    (see staged_profile_exprs for the staging rationale)."""
    exprs = staged_profile_exprs(text_col)
    staged = df.select(
        F.col(id_col), F.col(text_col), tokens_col(text_col).alias("_toks")
    )
    staged = staged.select(
        F.col(id_col),
        F.col(text_col),
        F.col("_toks"),
        *[c.alias(n) for n, c in profile_score_cols().items()],
    )
    return staged.select(
        F.col(id_col),
        exprs["n_tokens"].alias("n_tokens"),
        token_count_bpe(text_col).alias("n_bpe_tokens"),
        exprs["lang_pred"].alias("lang_pred"),
        exprs["quality_e6"].alias("quality_e6"),
        fingerprint64(text_col).alias("fingerprint"),
    )


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals, one row per doc:

      dup_token_frac_e6   1 − distinct_tokens / tokens
      dup_bigram_frac_e6  1 − distinct_word_2grams / word_2grams
      top_token_frac_e6   mode-token frequency / tokens

    All map-side JVM array expressions — zero shuffle, O(tokens·log tokens)
    per doc. The mode frequency is the longest equal-run in the SORTED token
    array, computed with one `aggregate` pass (never the O(distinct×tokens)
    transform/filter nesting, which is quadratic on long documents). High
    values on any of these are the standard pre-training quality cut for
    boilerplate / template / spam pages (Gopher, Rae et al. 2021 §A1.1).
    """
    toks = F.col("_tk")
    n_tok = F.size(toks).cast("long")
    n_dist = F.size(F.array_distinct(toks)).cast("long")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bg = F.size(F.col("_bg")).cast("long")
    n_bg_dist = F.size(F.array_distinct(F.col("_bg"))).cast("long")

    def _run(acc, x):
        run = F.when(x.eqNullSafe(acc.prev), acc.run + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc.best, run).alias("best")
        )

    mode_freq = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        _run,
        lambda acc: acc.best,
    )

    def _e6(num, den):
        return (
            F.when(den > 0, F.floor(num.cast("double") / den * 1e6 + F.lit(0.5)))
            .otherwise(F.lit(0))
            .cast("long")
        )

    staged = df.select(F.col(id_col), tokens_col(text_col).alias("_tk")).select(
        F.col(id_col), toks, bigrams.alias("_bg")
    )
    return staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        _e6(n_tok - n_dist, n_tok).alias("dup_token_frac_e6"),
        _e6(n_bg - n_bg_dist, n_bg).alias("dup_bigram_frac_e6"),
        _e6(mode_freq, n_tok).alias("top_token_frac_e6"),
    )


# ---------------------------------------------------------------------------
# SQL twins (DuckDB dialect) — kept adjacent so drift is visible in review.
# ---------------------------------------------------------------------------

def _sql_tokens(text: str) -> str:
    return (
        f"list_filter(regexp_split_to_array({text}, '[{SQL_JAVA_WS}]+'),"
        " x -> x <> '')"
    )


def _sql_stop_hits(lang: str, text: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter({_sql_tokens(text)}, x -> list_contains([{words}], lower(x))))"
    )


def sql_text_profile(table: str = "documents", text: str = "text") -> str:
    """DuckDB twin of text_profile (identical output schema + semantics)."""
    scores = {lang: _sql_stop_hits(lang, text) for lang in LANG_ORDER}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    lang_case = "CASE "
    for lang in LANG_ORDER:
        lang_case += f"WHEN {best} > 0 AND {scores[lang]} = {best} THEN '{lang}' "
    lang_case += "ELSE 'und' END"
    n_tok = f"len({_sql_tokens(text)})"
    punct = f"len(regexp_extract_all({text}, '[^A-Za-z0-9{SQL_JAVA_WS}]'))"
    stops = " + ".join(_sql_stop_hits(lang, text) for lang in LANG_ORDER)
    punct_ratio = (
        f"CASE WHEN length({text}) > 0 THEN CAST({punct} AS DOUBLE)/length({text}) ELSE 0.0 END"
    )
    stop_ratio = (
        f"CASE WHEN {n_tok} > 0 THEN CAST({stops} AS DOUBLE)/{n_tok} ELSE 0.0 END"
    )
    score = (
        f"0.4 * least(1.0, CAST({n_tok} AS DOUBLE)/100.0)"
        f" + 0.3 * (1.0 - {punct_ratio}) + 0.3 * {stop_ratio}"
    )
    norm = f"lower(regexp_replace(trim({text}), '[{SQL_JAVA_WS}]+', ' ', 'g'))"
    return f"""
SELECT doc_id,
       CAST({n_tok} AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all({text}, '{BPE_TOKEN_REGEX}')) AS BIGINT) AS n_bpe_tokens,
       {lang_case} AS lang_pred,
       CAST(floor(({score}) * 1000000.0 + 0.5) AS BIGINT) AS quality_e6,
       CAST(('0x' || substring(md5({norm}), 1, 15)) AS UBIGINT)::BIGINT AS fingerprint
FROM {table}
"""


def sql_repetition_profile(table: str = "documents", text: str = "text") -> str:
    """DuckDB twin of repetition_profile. Semantics pinned via an explode/
    group construction (the oracle need not mirror the single-pass plan)."""
    toks = _sql_tokens(text)
    bg = "toks[i+1] || ' ' || toks[i+2]"
    e6 = "CAST(floor({x} * 1000000.0 + 0.5) AS BIGINT)"
    dup_tok = e6.format(
        x="CASE WHEN len(toks) > 0 THEN (len(toks) - len(list_distinct(toks))) * 1.0 / len(toks) ELSE 0 END"
    )
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS toks FROM {table}),
bgs AS (
  SELECT doc_id,
         count(*) AS n_bg,
         count(DISTINCT g) AS n_bg_dist
  FROM (SELECT doc_id, {bg} AS g
        FROM tok, unnest(range(greatest(len(toks)-1, 0))) AS t(i))
  GROUP BY doc_id
),
modef AS (
  SELECT doc_id, max(c) AS mode_freq
  FROM (SELECT doc_id, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tk FROM tok)
        GROUP BY doc_id, tk)
  GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       {dup_tok} AS dup_token_frac_e6,
       CAST(CASE WHEN coalesce(b.n_bg, 0) > 0
            THEN floor((b.n_bg - b.n_bg_dist) * 1.0 / b.n_bg * 1000000.0 + 0.5)
            ELSE 0 END AS BIGINT) AS dup_bigram_frac_e6,
       CAST(CASE WHEN len(toks) > 0
            THEN floor(coalesce(m.mode_freq, 0) * 1.0 / len(toks) * 1000000.0 + 0.5)
            ELSE 0 END AS BIGINT) AS top_token_frac_e6
FROM tok t
LEFT JOIN bgs b USING (doc_id)
LEFT JOIN modef m USING (doc_id)
"""
