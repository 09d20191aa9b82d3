"""Streaming NEAR-dup detection at ingest: minhash-LSH candidate pairs
with bounded keyed state.

The batch near-dup path (operators/dedup.py: signatures → banded LSH
candidates → verify) assumes the whole corpus is present. At ingest time a
crawl pipeline wants the pairs AS DOCUMENTS ARRIVE: "this page is a
near-duplicate of one ingested in the last `horizon`". This operator is
that stream:

    per-row minhash signature (map-side expressions, NO keyed state)
      → explode into (band, band_value) bucket keys
      → applyInPandasWithState keyed by bucket SHARD (pmod(hash(bucket),
        n_shards) — see streaming_lsh_neardup's shard note; pairing stays
        bucket-exact in-function): state holds the members inside the
        horizon; an arriving doc emits one pair per same-bucket member
        within `horizon` of it, then joins the state
      → pairs (id_a, id_b, n_equal) — n_equal = matching signature
        components out of 16 (the minhash Jaccard estimate, scaled /16)

Semantics (arrival-order independent): the unordered pair {a, b} is
emitted exactly once per shared bucket — by whichever doc arrives second —
iff |ts_a − ts_b| ≤ horizon. Pairs sharing several buckets surface once
per bucket; the consumer (or the servable query) applies a distinct.
State is bounded to one horizon per bucket: a member m is evicted once
watermark > ts_m + horizon, and any future arrival d has ts_d ≥ watermark
> ts_m + horizon so no admissible pair is lost (same argument as
streaming/absence.py); idle buckets are removed by EventTimeTimeout.

Signature parity: the per-row ``array_min`` construction produces the
IDENTICAL 16 values as the batch ``minhash_signatures`` explode+groupBy
(min over the same hash multiset), and the same banded keys as
``lsh_candidate_pairs`` (BAND_ROWS-wide concat) — so after a full drain
with a horizon covering the fixture span the emitted distinct pair set
equals the batch banded-candidate SQL exactly (the driver oracle).

Scale shape: signatures are embarrassingly parallel map-side work; the
shuffle moves (band, bval, id, ts, 16 longs) ≈ 160 B/doc/band — never the
text; bucket state is collision-bounded (members of one band value within
one horizon), the same cardinality argument as the batch LSH join.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from logflow_spark.operators.dedup import MINHASH_A, MINHASH_B, MOD, N_HASHES

# 4 bands x 4 rows (vs the batch LSH's 8x2): detection probability at
# jaccard j is 1-(1-j^4)^4 — ≈0.93 at j=0.9, ≈0.22 at j=0.5. Ingest-time
# near-dup flags target HIGH similarity (recrawls, boilerplate clones,
# trivial edits), and the wider bands keep bucket populations — which are
# this operator's state AND its per-arrival pairing cost — collision-
# bounded even on shingle-dense corpora (measured on the pages fixture:
# 2-row bands produced 720k candidate pairs from 4k docs; 4-row bands are
# selective). The batch 8x2 configuration stays optimal for the offline
# threshold-0.5 dedup pass where an exact-Jaccard verify follows.
STREAM_BAND_ROWS = 4
STREAM_N_BANDS = N_HASHES // STREAM_BAND_ROWS
from logflow_spark.operators.textstats import tokens_col
from logflow_spark.streaming.durations import duration_us

PAIRS_OUTPUT_SCHEMA = StructType(
    [
        StructField("id_a", LongType(), False),
        StructField("id_b", LongType(), False),
        StructField("n_equal", LongType(), False),
    ]
)

# shard members: parallel (band, id, ts) arrays + row-major flattened sigs
# (len = 16 * len(ids)) — nested array-of-array state is avoided on purpose.
# A member's BUCKET is (band, sig[band*4 : band*4+4]) — derived exactly
# from what is stored, so sharding adds no state bytes and no hash-merge
# risk (see streaming_lsh_neardup's shard note).
NEARDUP_STATE_SCHEMA = StructType(
    [
        StructField("bands", ArrayType(LongType()), True),
        StructField("ids", ArrayType(LongType()), True),
        StructField("ts", ArrayType(LongType()), True),
        StructField("sigs_flat", ArrayType(LongType()), True),
    ]
)


def _md5_60bit_lambda(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _sig_pandas_udf(n: int):
    """Arrow-vectorized signature twin: tokenize with the EXPLICIT Java
    whitespace class (Python's ``\\s`` is Unicode-wide — NBSP, \\x1c-\\x1f
    — while Java's is the ASCII six; same pitfall as textstats.SQL_JAVA_WS),
    md5 via hashlib, affine mins in numpy (h < MOD ≈ 1e9, a ≤ 211 →
    h*a+b < 2.2e11, no int64 overflow)."""
    import hashlib
    import re

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    java_ws = re.compile("[ \t\n\x0b\f\r]+")

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [x for x in java_ws.split(t or "") if x]
            if len(toks) < n:
                out.append(None)
                continue
            hs = np.fromiter(
                (
                    int(
                        hashlib.md5(
                            " ".join(toks[i:i + n]).encode()
                        ).hexdigest()[:15],
                        16,
                    )
                    % MOD
                    for i in range(len(toks) - n + 1)
                ),
                dtype=np.int64,
                count=len(toks) - n + 1,
            )
            out.append(
                [
                    int(((hs * a + b) % MOD).min())
                    for a, b in zip(MINHASH_A, MINHASH_B)
                ]
            )
        return pd.Series(out)

    return sig_udf


def with_minhash_sig(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "sig",
    n: int = 3,
    mode: str = "udf",
) -> DataFrame:
    """Append ``out_col``: the 16-element minhash signature as array<long>,
    computed entirely map-side (usable on a stream — no groupBy state).

    Two value-identical modes (the extract_mode house pattern;
    equality pinned by tests/test_streaming_neardup.py):

    - ``udf`` (default): Arrow pandas UDF — hashlib md5 + numpy affine
      mins. Measured 3.5x faster than the jvm mode at sf0.1 (1.05s vs
      3.6s warm for 5k docs): 16 interpreted higher-order ``array_min ∘
      transform`` expressions per row never enter codegen, so here the
      Arrow boundary beats the JVM expression path.
    - ``jvm``: built-in expressions only (zero Python boundary) — the
      shingle hash array is STAGED as its own projection so the 16
      ``array_min`` consumers reference a materialized column instead of
      re-evaluating the tokenize+shingle+md5 subtree (CollapseProject
      keeps a non-cheap column referenced >1x materialized — same note
      as dedup.shingles_df).

    Values are IDENTICAL to ``dedup.minhash_signatures`` (min over the same
    shingle-hash multiset under the same affine functions). Docs with
    fewer than ``n`` tokens get NULL (no shingles → no signature),
    matching the batch operator which emits no row for them.
    """
    if mode == "udf":
        return df.withColumn(out_col, _sig_pandas_udf(n)(F.col(text_col)))
    if mode != "jvm":
        raise ValueError(f"mode must be udf|jvm, got {mode!r}")
    toks = tokens_col(text_col)
    staged = df.withColumn("_tk", toks)
    idxs = F.when(
        F.size("_tk") >= n, F.sequence(F.lit(0), F.size("_tk") - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idxs,
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("_tk"), i + j + 1) for j in range(n)]
        ),
    )
    staged = staged.withColumn(
        "_hs", F.transform(sh, lambda s: _md5_60bit_lambda(s) % MOD)
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_hs"),
                    lambda h: (h * MINHASH_A[j] + MINHASH_B[j]) % MOD,
                )
            )
            for j in range(N_HASHES)
        ]
    )
    return staged.withColumn(
        out_col, F.when(F.size("_hs") > 0, sig)
    ).drop("_tk", "_hs")


def band_keys_col(sig_col: str = "sig") -> Column:
    """array<struct<band,bval>> — STREAM_BAND_ROWS-wide band values
    (concat_ws('-') of the band's rows, the lsh_candidate_pairs shape)."""
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.concat_ws(
                    "-",
                    *[
                        F.element_at(
                            F.col(sig_col), b * STREAM_BAND_ROWS + r + 1
                        )
                        for r in range(STREAM_BAND_ROWS)
                    ],
                ).alias("bval"),
            )
            for b in range(STREAM_N_BANDS)
        ]
    )


def _bucket_keys(band: "np.ndarray", sigs: "np.ndarray"):  # noqa: F821
    """(n, 1+BAND_ROWS) exact bucket-identity matrix: the band index plus
    that band's signature rows — recovered from stored data, never hashed,
    so distinct buckets can never merge inside a shard."""
    import numpy as np

    idx = band[:, None] * STREAM_BAND_ROWS + np.arange(STREAM_BAND_ROWS)[None, :]
    return np.concatenate(
        [band[:, None], np.take_along_axis(sigs, idx, axis=1)], axis=1
    )


def _neardup_fn(horizon_us: int):
    def fn(
        key: Tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        batches = [pdf for pdf in pdf_iter if len(pdf)]
        if batches:
            a_band = np.concatenate(
                [p["band"].astype("int64").to_numpy() for p in batches]
            )
            a_ids = np.concatenate(
                [p["doc_id"].astype("int64").to_numpy() for p in batches]
            )
            a_ts = np.concatenate(
                [p["t_us"].astype("int64").to_numpy() for p in batches]
            )
            a_sigs = np.concatenate(
                [np.vstack(p["sig"].to_numpy()).astype("int64") for p in batches]
            )
            # deterministic in-batch order: by (ts, id) — the emitted SET is
            # order-independent anyway (symmetric |diff| ≤ horizon rule; each
            # unordered pair emitted by whichever side is processed second)
            order = np.lexsort((a_ids, a_ts))
            a_band, a_ids, a_ts, a_sigs = (
                a_band[order], a_ids[order], a_ts[order], a_sigs[order]
            )
        else:
            a_band = np.empty(0, dtype="int64")
            a_ids = np.empty(0, dtype="int64")
            a_ts = np.empty(0, dtype="int64")
            a_sigs = np.empty((0, N_HASHES), dtype="int64")

        if state.exists:
            m_band_l, m_ids_l, m_ts_l, m_flat = state.get
            m_band = np.asarray(m_band_l, dtype="int64")
            m_ids = np.asarray(m_ids_l, dtype="int64")
            m_ts = np.asarray(m_ts_l, dtype="int64")
            m_sigs = np.asarray(m_flat, dtype="int64").reshape(-1, N_HASHES)
        else:
            m_band = np.empty(0, dtype="int64")
            m_ids = np.empty(0, dtype="int64")
            m_ts = np.empty(0, dtype="int64")
            m_sigs = np.empty((0, N_HASHES), dtype="int64")

        wm_us = state.getCurrentWatermarkMs() * 1000

        # group the shard's rows into exact buckets, then pair WITHIN each
        # bucket: combined = members ++ arrivals in processed order; arrival
        # k pairs with every EARLIER combined row within the horizon — one
        # broadcast over the per-bucket grid, no per-pair Python. Bucket
        # populations are collision-bounded by the 4-row bands (module
        # docstring), so each grid stays tiny.
        n_arr = len(a_ids)
        outs: list[dict] = []
        if n_arr:
            allk = np.concatenate(
                [_bucket_keys(m_band, m_sigs), _bucket_keys(a_band, a_sigs)]
            )
            _, inv = np.unique(allk, axis=0, return_inverse=True)
            # numpy 2.0.0 returned a non-1-D inverse for axis!=None
            # (reverted in 2.0.1); ravel defends the slicing below
            inv = np.asarray(inv).ravel()
            inv_m, inv_a = inv[: len(m_ids)], inv[len(m_ids):]
            for g in np.unique(inv_a):
                mm, aa = inv_m == g, inv_a == g
                g_mids, g_mts, g_msigs = m_ids[mm], m_ts[mm], m_sigs[mm]
                g_aids, g_ats, g_asigs = a_ids[aa], a_ts[aa], a_sigs[aa]
                m0, na = len(g_mids), len(g_aids)
                if not (m0 or na > 1):
                    continue
                c_ids = np.concatenate([g_mids, g_aids])
                c_ts = np.concatenate([g_mts, g_ats])
                c_sigs = np.concatenate([g_msigs, g_asigs])
                earlier = (
                    np.arange(len(c_ids))[None, :]
                    < (m0 + np.arange(na))[:, None]
                )
                mask = (
                    earlier
                    & (g_aids[:, None] != c_ids[None, :])
                    & (np.abs(g_ats[:, None] - c_ts[None, :]) <= horizon_us)
                )
                ai, ci = np.nonzero(mask)
                if len(ai):
                    neq = (g_asigs[ai] == c_sigs[ci]).sum(axis=1)
                    outs.append(
                        {
                            "id_a": np.minimum(g_aids[ai], c_ids[ci]),
                            "id_b": np.maximum(g_aids[ai], c_ids[ci]),
                            "n_equal": neq.astype("int64"),
                        }
                    )

        # evict members no future arrival can pair with: ts + horizon < wm
        # (future rows have ts ≥ wm — the watermark admission bound)
        l_band = np.concatenate([m_band, a_band])
        l_ids = np.concatenate([m_ids, a_ids])
        l_ts = np.concatenate([m_ts, a_ts])
        l_sigs = np.concatenate([m_sigs, a_sigs])
        keep = l_ts + horizon_us >= wm_us
        if keep.any():
            state.update(
                (
                    l_band[keep].tolist(),
                    l_ids[keep].tolist(),
                    l_ts[keep].tolist(),
                    l_sigs[keep].ravel().tolist(),
                )
            )
            death_ms = (int(l_ts[keep].min()) + horizon_us) // 1000 + 1
            state.setTimeoutTimestamp(max(death_ms, wm_us // 1000 + 1))
        else:
            state.remove()

        if outs:
            yield pd.DataFrame(
                {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
            )

    return fn


def streaming_lsh_neardup(
    stream_df: DataFrame,
    id_col: str = "doc_id",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    horizon: str = "73 hours",
    watermark: str = "73 hours",
    n_shards: int = 512,
    sig_mode: str = "udf",
) -> DataFrame:
    """Docs stream → append stream of LSH near-dup candidate pairs.

    Output may repeat a pair once per shared bucket; apply ``.distinct()``
    on the drained table for the canonical pair set.

    SHARDED STATE KEYING (round 5): the state key is
    ``pmod(hash(band, bval), n_shards)``, not the raw bucket.
    applyInPandasWithState pays a fixed per-group cost every batch
    (Arrow frame + Python call + state ser/de — measured ~4 ms/group:
    19k touched buckets made the sf0.1 drain's addBatch 18 s, ~80 s of
    summed state-update time). Sharding bounds invocations per batch at
    ``n_shards`` per partition set while the in-function numpy work stays
    bucket-exact: members carry their band, and a bucket's identity is
    (band, that band's 4 signature rows) recovered from stored sigs — a
    Spark-hash shard collision can never merge buckets. Per-shard state
    stays horizon-bounded (it is the union of its buckets' horizon-bounded
    member lists); size ``n_shards`` ≈ 16-32× cores so shards stay small
    and skew-free — the same guidance as shuffle partitions.
    """
    horizon_us = duration_us(horizon)
    sigged = with_minhash_sig(stream_df, text_col, mode=sig_mode).filter(
        F.col("sig").isNotNull()
    )
    keyed = (
        sigged.select(
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).cast("timestamp").alias("_wm_ts"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t_us"),
            "sig",
            F.explode(band_keys_col("sig")).alias("bk"),
        )
        .select(
            "doc_id",
            "_wm_ts",
            "t_us",
            "sig",
            F.col("bk.band").alias("band"),
            F.pmod(F.hash("bk.band", "bk.bval"), F.lit(n_shards)).alias(
                "shard"
            ),
        )
        .withWatermark("_wm_ts", watermark)
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _neardup_fn(horizon_us),
        outputStructType=PAIRS_OUTPUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
