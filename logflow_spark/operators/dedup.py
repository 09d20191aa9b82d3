"""Deduplication for training-data pipelines.

Four families, all shuffle-conscious:

- exact:    hash-groupBy on a content digest — one shuffle on the digest,
            never on the raw text (digest first, so the shuffle moves 16
            bytes/row instead of documents).
- minhash:  word-shingles → 16 minhashes → LSH bands; candidate pairs only
            join within a band bucket (linear-ish), then exact-Jaccard
            verification on the candidates. The band join is the 100 TB
            path: no all-pairs blowup.
- simhash:  32-bit signature; near-dups = small hamming distance. Banding on
            signature bytes gives the scale path.
- ngram-jaccard: exact all-candidate Jaccard via an inverted shingle index
            (doc pairs sharing ≥1 shingle), correct but quadratic in the
            worst case — the verification oracle for minhash, and usable
            standalone at moderate scale.

Determinism: every hash is md5-based (engine-portable); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logflow_spark.operators.textstats import tokens_col

MOD = 1_000_000_007
# fixed affine minhash coefficients (16 functions = 4 bands x 4 rows)
MINHASH_A = (131, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211)
MINHASH_B = (7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67)
N_HASHES = 16
# 8 bands x 2 rows: detection prob at jaccard j is 1-(1-j^2)^8 — ≥ 0.90 for
# j ≥ 0.5, ≈ 1-2e-4 at j = 0.8, ≈ 1-3e-10 at j = 0.97 (the planted dups)
BAND_ROWS = 2
N_BANDS = N_HASHES // BAND_ROWS
SIMHASH_BITS = 32


def md5_60bit(c: Column) -> Column:
    """First 60 bits of md5 as bigint — portable (DuckDB: '0x'||substr cast)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical representative (min id) per exact content digest."""
    return (
        df.select(F.col(id_col), md5_60bit(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingles_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    distinct: bool = True,
    lowercase: bool = False,
) -> DataFrame:
    """Word n-gram shingles per doc: (id, shingle), distinct by default.

    PERFORMANCE: the token array is STAGED as its own projection before the
    shingle lambda touches it. Composing everything into one expression
    re-evaluates the non-cheap `split()` subtree inside every `element_at`
    lambda call — O(tokens²) per doc, measured 11x slower at sf0.1 (7.8s vs
    0.7s). Catalyst's CollapseProject keeps a staged column materialized when
    a non-cheap expression is referenced more than once, so the two-select
    shape is what makes the plan linear.

    ``distinct=False`` skips the dedup shuffle — correct for any
    duplicate-insensitive consumer (minhash: min over shingles).
    """
    toks = tokens_col(text_col)
    if lowercase:
        toks = F.transform(toks, F.lower)
    staged = df.select(F.col(id_col), toks.alias("_tk"))
    # guard: sequence(0, -1) counts DOWN to [0,-1] in Spark, so a doc with
    # fewer than n tokens must yield an empty index list (zero shingles),
    # matching the DuckDB oracle's range(greatest(len-n+1, 0)) semantics
    idxs = F.when(
        F.size("_tk") >= n, F.sequence(F.lit(0), F.size("_tk") - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idxs,
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("_tk"), i + j + 1) for j in range(n)]
        ),
    )
    if distinct:
        # distinct (id, shingle) == per-document distinct shingles, so the
        # dedup is ROW-LOCAL: array_distinct before the explode replaces a
        # corpus-wide exchange+hash-aggregate of every (id, shingle-text)
        # row with a map-side array op (round 6 — this was the single
        # largest shuffle in the minhash/jaccard family)
        sh = F.array_distinct(sh)
    return staged.select(F.col(id_col), F.explode(sh).alias("shingle"))


def hashed_shingles_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, dg): md5-60bit digest per distinct shingle of each doc.

    Round 6: the minhash/jaccard family's joins and aggregations only ever
    COMPARE shingles, never read them back, so they can run on the 8-byte
    digest instead of the ~60-byte shingle string — the verify join's
    shuffle/sort dominated minhash_dedup_pairs. Digest-equality is the
    house standard (exact_dedup groups by the same md5-60bit of the whole
    document); at corpus scale the residual risk is a 60-bit birthday
    collision between distinct shingles (~1e-10 at 2.6M distinct shingles),
    far below the LSH recall assumptions the oracles already rest on.
    tests/test_dedup_similarity.py asserts the test corpora are
    collision-free so a regen that breaks the assumption fails loudly."""
    return shingles_df(df, id_col, text_col, n, distinct=True).select(
        F.col(id_col), md5_60bit(F.col("shingle")).alias("dg")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, mh_0..mh_15): min over shingles of (a*h + b) mod p.

    Shuffle volume is ONE ~136-byte row per doc regardless of shingle count:
    explode keeps a doc's shingles co-located in its input partition, so the
    hash-aggregate's map-side partial min collapses them to a single partial
    row before the exchange — the shuffle moves the output, not the shingle
    set. Standalone (``shingles=None``) the exploded frame skips `distinct`
    entirely (min is duplicate-insensitive), so there is exactly one shuffle
    and it is output-sized.

    An array-native `array_min(transform(...))` "zero-shuffle" variant was
    measured 10-25x SLOWER at sf0.1: non-cheap array expressions consumed
    element-wise by downstream lambdas get re-evaluated per element
    (interpreted higher-order functions, no whole-stage codegen, no CSE).
    The explode → partial-agg shape is the fast AND scale-correct one.
    """
    sh = (
        shingles
        if shingles is not None
        else shingles_df(df, id_col, text_col, n, distinct=False)
    )
    # accept either the string-shingle frame or the hashed (id, dg) frame:
    # hm == md5_60bit(shingle) % MOD either way (dg IS md5_60bit(shingle))
    hm = (
        (F.col("dg") % MOD)
        if "dg" in sh.columns
        else (md5_60bit(F.col("shingle")) % MOD)
    )
    hashed = sh.select(F.col(id_col), hm.alias("hm"))
    aggs = [
        F.min((F.col("hm") * MINHASH_A[j] + MINHASH_B[j]) % MOD).alias(f"mh_{j}")
        for j in range(N_HASHES)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct candidate pairs sharing at least one LSH band bucket.

    Explode each doc into N_BANDS (band, bucket) keys; self-join per
    (band, bucket). At scale the join is on the bucket key → co-partitioned,
    with bucket sizes bounded by collision rate, not corpus size.
    """
    band_cols = [
        F.concat_ws(
            "-", *[F.col(f"mh_{b * BAND_ROWS + r}") for r in range(BAND_ROWS)]
        ).alias(f"band_{b}")
        for b in range(N_BANDS)
    ]
    banded = sigs.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket")
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket").persist()
    # ^ persisted: the self-join below references this frame twice; without
    # it the 16-minhash aggregation upstream runs once per side
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def inverted_index_candidates(
    sh: DataFrame, id_col: str = "doc_id", max_df: int | None = None
) -> DataFrame:
    """Candidate pairs from the inverted shingle index: docs co-occurring in
    ≥1 shingle's posting list.

    ``max_df`` caps posting-list length: shingles present in more than
    ``max_df`` docs are dropped from CANDIDATE GENERATION (the standard
    stop-shingle guard — a ubiquitous shingle contributes O(df²) pairs while
    carrying almost no Jaccard signal). Verification still uses the full
    shingle sets, so surviving pairs keep their exact Jaccard. Pairs whose
    ONLY shared shingles are ubiquitous are missed — the documented
    trade-off that bounds the join at corpus scale.
    """
    key = "dg" if "dg" in sh.columns else "shingle"
    index = sh
    if max_df is not None:
        rare = (
            sh.groupBy(key)
            .agg(F.count(F.lit(1)).alias("df_sh"))
            .filter(F.col("df_sh") <= max_df)
            .select(key)
        )
        index = sh.join(rare, key)
    a = index.select(F.col(id_col).alias("id_a"), key)
    b = index.select(F.col(id_col).alias("id_b"), key)
    return (
        a.join(b, [key])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    shingles: DataFrame | None = None,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact shingle-Jaccard pairs ≥ threshold.

    With ``candidates`` (e.g. from LSH) only those pairs are verified;
    without, an inverted shingle index generates co-shingled pairs, with
    posting lists capped at ``max_df`` docs (see inverted_index_candidates —
    the guard that keeps the standalone path from going quadratic on a
    corpus-wide shingle). Output jaccard is scaled: floor(j*1e6+0.5) as
    bigint (engine-portable).
    """
    if shingles is None:
        # the shingle frame feeds FOUR consumers below (sizes, both join
        # sides, the inverted index); deriving it lazily would re-run the
        # tokenize+explode pipeline per reference (audited: 16 corpus scans
        # in the standalone plan). minhash_dedup_pairs persists its own for
        # the same reason. Hashed form (round 6): every consumer compares
        # shingles, none reads them back — 8-byte digests shuffle/sort ~5x
        # cheaper than the strings (see hashed_shingles_df).
        shingles = hashed_shingles_df(df, id_col, text_col, n).persist()
    sh = shingles
    if "dg" not in sh.columns:
        sh = sh.select(F.col(id_col), md5_60bit(F.col("shingle")).alias("dg"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "dg")
    b = sh.select(F.col(id_col).alias("id_b"), "dg")
    if candidates is None:
        candidates = inverted_index_candidates(sh, id_col, max_df=max_df)
    # verify ONLY candidate pairs: route each pair's two FULL shingle-digest
    # sets together via joins on the pair ids — exact intersection (up to
    # md5-60bit collisions, asserted absent on the test corpora) regardless
    # of how candidates were generated
    inter = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "dg"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    j = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jacc",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jacc") >= threshold)
    )
    return j.select(
        "id_a",
        "id_b",
        F.floor(F.col("jacc") * 1000000.0 + 0.5).cast("long").alias("jacc_e6"),
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH candidates → exact-Jaccard verified pairs (the scale path).

    The distinct shingle frame feeds BOTH the signatures and the
    verification join — persist it once instead of recomputing the
    tokenize+explode+distinct pipeline twice (measured ~2x on the bench).
    """
    sh = hashed_shingles_df(df, id_col, text_col, n).persist()
    sigs = minhash_signatures(df, id_col, text_col, n, shingles=sh)
    cand = lsh_candidate_pairs(sigs, id_col)
    return jaccard_pairs(
        df, id_col, text_col, n, threshold, candidates=cand, shingles=sh
    )


def connected_components(
    pairs: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Connected components over an undirected pair list (id_a, id_b) →
    (id, cluster_id) where cluster_id = min doc id in the component.

    Iterative min-label propagation: each round every vertex takes the min
    of its own label and its neighbors' labels; converges in O(graph
    diameter) rounds. Near-dup graphs have tiny components (a duplicate
    cluster is a handful of docs), so the diameter — and the round count —
    is small and independent of corpus size. Each round is one co-partitioned
    join + one groupBy-min on the id key; `localCheckpoint` truncates the
    lineage so plans stay constant-size across rounds (the same pattern
    GraphFrames/GraphX use). The one driver action per round is the
    convergence test — inherent to any fixpoint algorithm, and it reads a
    1-row count, never data.
    """
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    edges = edges.localCheckpoint(eager=True)
    # round 6: initialize at min(self, neighbors) instead of identity — the
    # same one-shuffle cost as the old distinct-identity init, but the
    # fixpoint starts one propagation hop ahead (typically one fewer
    # join+agg+checkpoint round; the fixpoint itself is unchanged since
    # min-label propagation is monotone from any upper-bound start)
    labels = (
        edges.select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("dst")).alias("cluster_id"),
        )
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
        .localCheckpoint(eager=True)
    )
    # convergence via a MONOTONE invariant instead of a per-round diff join:
    # min-propagation only ever lowers labels, so sum(cluster_id) strictly
    # decreases iff any vertex changed this round — one narrow aggregate on
    # the freshly checkpointed frame replaces join+filter+count (one fewer
    # shuffle per round; the sum is exact in decimal(38,0) at any id scale)
    def _label_sum(frame: DataFrame):
        return frame.agg(
            F.sum(F.col("cluster_id").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        msgs = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("cluster_id")
        )
        labels = (
            labels.union(msgs)
            .groupBy("id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Full-corpus dedup decision from a near-dup pair list.

    Output one row per document: (doc_id, cluster_id, is_canonical) where
    cluster_id is the min doc id of the near-dup component (singletons keep
    their own id) and is_canonical marks the one doc per cluster to KEEP —
    the actual training-data dedup action (filter is_canonical). The
    component labels come from `connected_components`; the final join is a
    broadcast when the paired-doc set is small relative to the corpus (the
    common regime: dup pairs ≪ docs)."""
    labels = connected_components(pairs)
    return (
        docs.select(F.col(id_col))
        .join(labels.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )


def minhash_dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end dedup: minhash+LSH pairs → connected components → keep-list."""
    pairs = minhash_dedup_pairs(df, id_col, text_col, n, threshold)
    return dedup_clusters(df, pairs, id_col)


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """32-bit SimHash over distinct tokens (md5-derived bit votes)."""
    # distinct (id, token) == per-document distinct tokens: row-local
    # array_distinct replaces the corpus-wide distinct exchange (round 6),
    # and the exploded rows stay doc-co-located so the vote aggregation's
    # map-side partials collapse to one row per doc before its shuffle —
    # the signature pass now has exactly ONE output-sized exchange.
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_col(text_col))).alias("tok"),
    ).withColumn("h", md5_60bit(F.col("tok")) % F.lit(2**SIMHASH_BITS))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{bit}")
        for bit in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sim = None
    for bit in range(SIMHASH_BITS):
        term = F.when(F.col(f"v_{bit}") > 0, F.lit(2**bit)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return agg.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming — banded.

    Candidates come from an equi-join on signature bands: with
    ``max_hamming + 1`` bands, any pair within the hamming budget differs in
    at most ``max_hamming`` bit positions, so by pigeonhole at least one band
    is untouched → recall is EXACTLY 1 (not probabilistic, unlike minhash
    LSH). Exact hamming verification then filters the candidates.

    The band join shuffles (band_idx, band_value, id) triples only — at
    10^12 docs the signature table is ~40 B/row and the join is
    co-partitioned on the band key. For web-scale corpora widen the
    signature (64-bit) so band values stay selective; 32 bits matches the
    engine-portable md5 vote construction shared with the DuckDB oracle.

    Output: (id_a, id_b, hamming) for pairs with hamming ≤ max_hamming.
    """
    n_bands = max_hamming + 1
    band_bits = SIMHASH_BITS // n_bands  # 32/4 = 8-bit bands for k=3
    sigs = simhash_signatures(df, id_col, text_col)
    bands = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bval"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", "bb.band", "bb.bval").persist()
    # ^ persisted: BOTH self-join sides reference this frame; unpersisted,
    # the plan duplicates the subtree and the signature aggregation (the
    # expensive token-explode + 32 bit-vote shuffle) runs twice
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "band", "bval"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "band", "bval"
    )
    # Round 6: the candidate `distinct` is GONE. On a small-vocabulary
    # corpus the qualifying pair set is itself ~N^2-sized (measured 2.1M
    # pairs at 5k docs, ~215M at 50k), so shuffling every emitted pair
    # through a distinct dominated the query (the driver measured 55 s at
    # sf1). A pair that matches in k bands would surface k times; instead
    # each pair is emitted ONLY from its first matching band — band b
    # qualifies iff every lower band of sig_a^sig_b is nonzero (the join
    # equality already pins band b's xor byte to zero). That makes the
    # emission exactly-once by construction: a cheap codegen'd predicate on
    # columns already in the row replaces a ~N^2-row exchange + hash
    # aggregate, leaving the band join's shuffles (id+sig rows, 24 B each)
    # as the plan's only exchanges. Output-identical to the old
    # distinct-based form (same set, each pair once).
    xor = F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    mask = F.lit((1 << band_bits) - 1)
    first_band = F.when(F.col("band") == 0, F.lit(True))
    for bi in range(1, n_bands):
        lower_all_differ = None
        for bj in range(bi):
            d = F.shiftright(xor, bj * band_bits).bitwiseAND(mask) != 0
            lower_all_differ = d if lower_all_differ is None else (lower_all_differ & d)
        first_band = first_band.when(F.col("band") == bi, lower_all_differ)
    return (
        a.join(b, ["band", "bval"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(xor).cast("long"))
        .filter((F.col("hamming") <= max_hamming) & first_band.otherwise(F.lit(False)))
        .select("id_a", "id_b", "hamming")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (brute-force verify).

    All-pairs via self-join — correct baseline; at 100 TB run it per
    LSH/IVF bucket (see similarity.py) instead of globally.
    """
    v = emb.select(
        F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    a = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", dot / (na * nb))
        .filter(F.col("cos") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.floor(F.col("cos") * 10000.0 + 0.5).cast("long").alias("cos_e4"),
        )
    )


def embedding_neardup_pairs_bucketed(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    dim: int = 64,
    n_bits: int = 4,
    n_tables: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by embedding cosine — LSH-bucketed (the 100 TB path).

    Candidates are pairs sharing a random-hyperplane bucket in ≥1 of
    ``n_tables`` tables (similarity.py's bucketizer: one Arrow matmul per
    batch, id-only shuffle on the bucket key — never an all-pairs product);
    exact cosine verifies candidates only. The defaults are sized for the
    hard cos≥0.35 regime of the synthetic corpus (miss prob < 1e-7 per pair,
    and deterministic given the fixed seed — recall 1.0 verified against the
    brute-force twin at both test SFs). At production thresholds (≥0.9)
    fewer tables and more bits per table give far smaller buckets.

    Output is identical to ``embedding_neardup_pairs`` when recall is 1:
    (id_a, id_b, cos_e4).
    """
    from logflow_spark.operators.similarity import (
        _as_double,
        _buckets_udf,
        cosine_cols,
        make_hyperplanes,
    )

    planes = make_hyperplanes(dim, n_bits, n_tables, seed)
    budf = _buckets_udf(planes)
    # persist the bucket index: BOTH self-join sides reference it, and an
    # unpersisted plan duplicates the subtree — the Arrow bucketize matmul
    # would run twice over the corpus. At production scale this frame is
    # the LSH index you materialize once (id, table, bucket — ~24 B/entry)
    bucketed = emb.select(
        F.col(id_col).alias("vid"), budf(F.col(vec_col)).alias("buckets")
    ).select("vid", F.posexplode("buckets").alias("tbl", "bucket")).persist()
    a = bucketed.select(F.col("vid").alias("id_a"), "tbl", "bucket")
    b = bucketed.select(F.col("vid").alias("id_b"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), _as_double(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), _as_double(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", cosine_cols("va", "vb"))
        .filter(F.col("cos") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.floor(F.col("cos") * 10000.0 + 0.5).cast("long").alias("cos_e4"),
        )
    )


def embedding_neardup_pairs_blocked(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    margin: float = 1e-6,
    max_rows_collect: int = 2_000_000,
    target_block_rows: int = 1024,
) -> DataFrame:
    """Exact near-dup pairs by embedding cosine — blocked-GEMM candidates.

    The LSH-bucketed path is structurally quadratic at permissive
    thresholds: at cos >= 0.35 the hyperplane tables need so few bits that
    almost every pair shares a bucket in >= 1 of 64 tables (p ~ 0.98 for a
    random pair), so the candidate `distinct` shuffles ~N^2/2 rows and each
    survivor pays an interpreted 64-element fold — the driver measured it at
    1100 s on the sf1 corpus.  The embedding matrix itself is tiny (dim * 8
    B per row — the "decide with small rows" proxy of guide §8): gather it
    once, broadcast it like the build side of a broadcast join, and let each
    task compute an exact cosine block with one float64 GEMM.  Candidates
    come out with a safety ``margin`` below the threshold (f64 GEMM vs the
    JVM's sequential fold differ by ~1e-14 at dim 64, so 1e-6 cannot drop a
    true pair), and the surviving handful of pairs is re-scored by the SAME
    JVM fold expression as the brute twin, so the output is bit-identical to
    ``embedding_neardup_pairs`` by construction — recall 1.0 is a theorem
    here, not a corpus property.

    Scale envelope: the broadcast is 2 * N * dim * 8 bytes (~1 GB at 10^6
    vectors of dim 64) and the GEMM is N^2 * dim flops spread over
    N / ``target_block_rows`` tasks; beyond ``max_rows_collect`` rows the
    caller should fall back to ``embedding_neardup_pairs_bucketed`` with
    production-threshold (>= 0.9) table parameters, where bucket sizes stay
    bounded.  Raises rather than silently degrading.

    Bit-exactness of the final score (no JVM verify join needed — a first
    cut kept the exact-fold re-score join and it dominated the runtime at
    N=20k): the served brute expression is the sequential left fold
    ``aggregate(zip_with(va,vb,*), 0.0, +)`` over the double-cast values.
    The scorer below replays EXACTLY that IEEE-754 operation sequence,
    vectorized across pairs instead of across dims: acc = acc + x_d*y_d for
    d = 0..dim-1 in array order, all in float64, then dot/(na*nb) with the
    same association.  Per-element f64 ops are deterministic and
    order-identical, so the result is bit-equal to the JVM fold (pinned
    empirically against the brute twin at both test SFs by
    tests/test_dedup_similarity.py).
    """
    import numpy as np
    import pyarrow as pa

    spark = emb.sparkSession
    rows = emb.select(F.col(id_col).cast("long"), vec_col).collect()
    if len(rows) > max_rows_collect:
        raise ValueError(
            f"embedding_neardup_pairs_blocked: {len(rows)} rows exceeds "
            f"max_rows_collect={max_rows_collect}; use the bucketed LSH path"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = (
        np.array([r[1] for r in rows], dtype=np.float64)
        if rows
        else np.zeros((0, 1), dtype=np.float64)
    )
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    dim = mat.shape[1]
    # exact per-row norms via the same sequential fold as the JVM
    # expression sqrt(aggregate(va, 0.0, acc+x*x)) — vectorized over rows
    acc = np.zeros(len(ids), dtype=np.float64)
    for d in range(dim):
        acc = acc + mat[:, d] * mat[:, d]
    norms = np.sqrt(acc)
    safe = norms.copy()
    safe[safe == 0.0] = 1.0
    # normalized copy drives the GEMM candidate cut; raw drives the fold
    nmat = mat / safe[:, None]
    bc = spark.sparkContext.broadcast((ids, mat, nmat, norms))
    n = len(ids)
    n_blocks = max(1, -(-n // target_block_rows))
    cut = float(threshold) - float(margin)
    thr = float(threshold)

    def _gen(batches):
        b_ids, b_raw, b_nrm, b_norms = bc.value
        for batch in batches:
            for blk in batch.column("id").to_pylist():
                lo = blk * target_block_rows
                hi = min(lo + target_block_rows, n)
                if lo >= n:
                    continue
                # rows [lo, hi) against all LATER rows only (ids are sorted,
                # so global index order == id order and each pair is emitted
                # exactly once with id_a < id_b); margin-cut candidates from
                # one GEMM on the normalized matrix
                sims = b_nrm[lo:hi] @ b_nrm[lo + 1 :].T
                r_idx, c_idx = np.nonzero(sims >= cut)
                keep = c_idx + 1 > r_idx
                gi = r_idx[keep] + lo
                gj = c_idx[keep] + lo + 1
                if len(gi) == 0:
                    continue
                # exact re-score: replay the JVM fold per candidate pair
                va, vb = b_raw[gi], b_raw[gj]
                dot = np.zeros(len(gi), dtype=np.float64)
                for d in range(va.shape[1]):
                    dot = dot + va[:, d] * vb[:, d]
                cos = dot / (b_norms[gi] * b_norms[gj])
                ok = cos >= thr
                gi, gj, cos = gi[ok], gj[ok], cos[ok]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(b_ids[gi], type=pa.int64()),
                        pa.array(b_ids[gj], type=pa.int64()),
                        pa.array(
                            np.floor(cos * 10000.0 + 0.5).astype(np.int64),
                            type=pa.int64(),
                        ),
                    ],
                    names=["id_a", "id_b", "cos_e4"],
                )

    return (
        spark.range(n_blocks)
        .repartition(min(n_blocks, spark.sparkContext.defaultParallelism * 2))
        .mapInArrow(_gen, "id_a long, id_b long, cos_e4 long")
    )
