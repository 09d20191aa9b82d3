"""End-to-end training-corpus curation: the composition a 100 TB data
pipeline actually runs, as ONE declarative plan.

    profile (lang-ID / quality / token counts)        textstats.text_profile
      → quality + language gate                        JVM-expression filter
      → near-dup removal (minhash+LSH → components)    dedup.minhash_dedup_clusters
      → canonical keep-list with provenance columns

Everything stays in the DataFrame plan: the profile and the dedup branch
both scan `documents` once each, the keep-list join is id-only, and the
final output carries the signals downstream curriculum/sampling stages
need. The DuckDB oracle in __spark_entry__ composes the same stages from
their SQL twins (profile CTE + jaccard pairs + recursive components), so
the whole pipeline — not just its pieces — is cross-engine pinned.

Deterministic sampling (`hash_sample`) is the scale-correct way to cut a
training corpus: membership depends only on the doc id (md5-based), never
on partitioning, executor count, or visit order — reproducible at any
cluster size, and cheap (one hash per row, no shuffle, no state). Spark's
`sample()`/`sampleBy()` are partition-order dependent and thus
non-reproducible across layouts; never use them for corpus cuts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logflow_spark.operators.dedup import md5_60bit, minhash_dedup_clusters
from logflow_spark.operators.textstats import text_profile


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    pct: int = 10,
    salt: str = "corpus-v1",
) -> DataFrame:
    """Deterministic ~pct% sample: md5(salt || id) mod 100 < pct.

    Changing ``salt`` draws an independent sample; keeping it fixed makes
    the cut reproducible forever (rerun, re-partition, re-cluster — same
    rows). Map-side only."""
    bucket = md5_60bit(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % 100
    return df.filter(bucket < pct)


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, int],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_pct: int = 0,
    salt: str = "mix-v1",
) -> DataFrame:
    """Domain-mixing cut: per-stratum deterministic sampling rates.

    ``rates`` maps stratum value → keep percentage (0-100); strata not
    listed keep ``default_pct``. Membership is md5(salt ‖ id) mod 100 —
    the same layout/cluster-size-independent draw as ``hash_sample``, so a
    mixing recipe ("80% web, 20% wiki, drop the rest") reproduces exactly
    across reruns and repartitions. Map-side only: one hash per row, no
    shuffle, no per-stratum scan — the standard way a 100 TB pipeline
    realizes domain weights without materializing per-source tables.
    """
    bucket = md5_60bit(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) % 100
    pct = F.lit(default_pct)
    for value, p in sorted(rates.items()):
        pct = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(pct)
    return df.filter(bucket < pct)


def sql_stratified_hash_sample(
    rates: dict[str, int],
    table: str = "documents",
    strata_col: str = "source",
    default_pct: int = 0,
    salt: str = "mix-v1",
) -> str:
    """DuckDB twin of stratified_hash_sample.

    Oracle-only surface, but values/identifiers are interpolated into SQL —
    quote-escape stratum values and pin identifiers to word characters so a
    stray apostrophe can't break (or inject into) the oracle query."""
    assert strata_col.replace("_", "").isalnum(), strata_col
    assert table.replace("_", "").isalnum(), table
    salt = salt.replace("'", "''")
    case = "CASE "
    for value, p in sorted(rates.items()):
        case += f"WHEN {strata_col} = '{value.replace(chr(39), chr(39) * 2)}' THEN {int(p)} "
    case += f"ELSE {int(default_pct)} END"
    bucket = (
        f"CAST(('0x' || substring(md5('{salt}:' || CAST(doc_id AS VARCHAR)),1,15)) "
        "AS UBIGINT)::BIGINT % 100"
    )
    return f"SELECT * FROM {table} WHERE {bucket} < ({case})"


def llm_pipeline_pack(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    n_shards: int = 8,
    min_quality_e6: int = 450_000,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en",),
    neardup_threshold: float = 0.5,
    decontam_n: int = 8,
) -> DataFrame:
    """The FULL training-data pipeline as one declarative plan:

        curate (quality/lang gate + near-dup keep-list)
          → decontaminate (drop docs overlapping the eval set)
          → pii_scrub (redact emails / IPv4 / digit runs)
          → pack_sequences (token offsets into seq_len training windows)

    Composition order is the production order: gates and dedup shrink the
    corpus BEFORE the decontamination gram explosion; scrubbing runs only
    on survivors; packing sees clean text. Everything between the input
    scan and the packing window is joins on doc ids plus map-side
    expressions, so at 100 TB the heavy text column moves only where it
    must (profile scan, gram hashing on the curated subset, scrub on the
    final keep set). The DAG-of-pipelines twin in pipeline/builtin.py runs
    the same stages as separately-committed steps with exactly-once lineage
    per step; tests pin step-composed == single-plan."""
    from logflow_spark.operators.decontam import decontaminate, eval_snippets
    from logflow_spark.operators.packing import pack_sequences
    from logflow_spark.operators.scrub import pii_scrub

    kept, gated_docs = _curate_frames(
        docs,
        id_col,
        text_col,
        min_quality_e6=min_quality_e6,
        min_tokens=min_tokens,
        langs=langs,
        neardup_threshold=neardup_threshold,
    )
    # the survivor subset is referenced by THREE consumers (decontam gram
    # explosion, the eval-snippet derivation, the keep join into scrub);
    # without a persist each reference re-derives the full curation DAG
    # from the source scan (measured 52 parquet scans in the composed
    # plan). Persist the (id, text) survivors once — the 100 TB variant of
    # the same decision is the DAG twin (config/llm_pipeline.yaml), which
    # MATERIALIZES each stage into an exactly-once table between steps.
    # Round 6: survivors derive from curation's already-persisted gated
    # (id, text) frame instead of a THIRD full-corpus scan+join — kept ids
    # are a subset of the gate-passing ids by construction.
    surv = gated_docs.join(kept.select(id_col), id_col).persist()
    flags = decontaminate(
        surv, eval_snippets(surv, id_col, text_col), id_col, text_col, n=decontam_n
    )
    ok = surv.join(
        flags.filter(~F.col("contaminated")).select(id_col), id_col
    )
    scrubbed = pii_scrub(ok, id_col, text_col)
    return pack_sequences(
        scrubbed, id_col, "clean_text", seq_len=seq_len, n_shards=n_shards
    )


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality_e6: int = 450_000,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en",),
    neardup_threshold: float = 0.5,
) -> DataFrame:
    """Curated keep-list: canonical, in-language, above the quality bar.

    Output: (doc_id, lang_pred, n_tokens, quality_e6, cluster_id) — one row
    per KEPT document, carrying the signals later pipeline stages (mixing,
    curriculum, sampling) key on.

    The quality/language gate runs BEFORE clustering (matching
    streaming/curation_stream.py): canonical status is the min id among
    GATE-PASSING members, so a junk near-dup can never absorb canonical
    status and silently drop a keepable document — and at 100 TB the cheap
    JVM gate cuts most of the corpus before the expensive minhash stage.
    """
    keep, _gated = _curate_frames(
        docs,
        id_col,
        text_col,
        min_quality_e6=min_quality_e6,
        min_tokens=min_tokens,
        langs=langs,
        neardup_threshold=neardup_threshold,
    )
    return keep


def _curate_frames(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality_e6: int = 450_000,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en",),
    neardup_threshold: float = 0.5,
):
    """(keep-list, persisted gated (id, text) frame) — the internal form so
    composing pipelines (llm_pipeline_pack) can reuse the gate-passing text
    subset instead of re-scanning and re-joining the corpus."""
    profile = text_profile(docs, id_col, text_col)
    # the gated signals frame is consumed twice (the doc-subset join AND
    # the final keep-list join); it is NARROW (id + three signal columns,
    # no text), so persisting it costs ~30 bytes/surviving doc and saves a
    # full corpus re-scan + re-profile per extra reference
    gated_profile = profile.filter(
        (F.col("quality_e6") >= min_quality_e6)
        & (F.col("n_tokens") >= min_tokens)
        & F.col("lang_pred").isin(list(langs))
    ).select(
        id_col, "lang_pred", "n_tokens", "quality_e6"
    ).persist()
    # gate-passing docs feed the minhash pipeline's multiple consumers
    # (shingles + cluster id-list + jaccard verify); persist like the
    # survivor frame in llm_pipeline_pack so each reference replays the
    # cached subset instead of re-scanning and re-gating the corpus
    gated_docs = docs.select(id_col, text_col).join(
        gated_profile.select(id_col), id_col
    ).persist()
    clusters = minhash_dedup_clusters(
        gated_docs, id_col, text_col, threshold=neardup_threshold
    )
    keep = clusters.filter(F.col("is_canonical")).select(id_col, "cluster_id")
    out = gated_profile.join(keep, id_col).select(
        id_col, "lang_pred", "n_tokens", "quality_e6", "cluster_id"
    )
    return out, gated_docs
