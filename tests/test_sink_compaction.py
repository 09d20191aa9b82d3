"""Sink file-sizing (K1 rolling policy) + compaction maintenance.

Reference parity: 128 MB rolling + auto-compaction
(sink/flink_parquet_sink.py:53-55, sink/flink_optimized_parquet_sink.py:108-117),
re-expressed as maxRecordsPerFile on the batch write plus an atomic
manifest-swap compaction generation.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from logflow_spark.sinks.exactly_once import ExactlyOnceParquetSink
from tests.conftest import CACHE


def _rows(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("v"),
    )


@pytest.fixture()
def table_dir():
    d = os.path.join(CACHE, "compact_sink_table")
    shutil.rmtree(d, ignore_errors=True)
    return d


def _read_set(sink, spark):
    return {tuple(r) for r in sink.read(spark).collect()}


def test_max_records_per_file_rolls_files(spark, table_dir):
    sink = ExactlyOnceParquetSink(table_dir, max_records_per_file=100)
    sink.write_batch(_rows(spark, 0, 1000).coalesce(1), batch_id=0)
    m = sink.manifests()[0]
    assert m["n_files"] >= 10  # 1000 rows / 100-row cap, single input task
    assert m["n_rows"] == 1000


def test_compaction_preserves_rows_and_swaps_atomically(spark, table_dir):
    sink = ExactlyOnceParquetSink(table_dir, max_records_per_file=50)
    for b in range(6):
        sink.write_batch(_rows(spark, b * 500, (b + 1) * 500).coalesce(2), batch_id=b)
    before = _read_set(sink, spark)
    n_files_before = len(sink.committed_files())
    assert n_files_before >= 6 * 10  # small-files problem is real

    stats = sink.compact(spark, target_file_bytes=10 * 1024 * 1024)
    assert stats["covers" if "covers" in stats else "gen"] == 0
    assert stats["n_rows"] == 3000
    assert len(sink.committed_files()) < n_files_before
    assert _read_set(sink, spark) == before  # byte-identical table content
    assert sink.metrics()["total_rows"] == 3000

    # idempotent replay of a compacted batch stays a no-op
    sink.write_batch(_rows(spark, 0, 500), batch_id=3)
    assert _read_set(sink, spark) == before

    # a batch committed AFTER compaction is visible alongside the generation
    sink.write_batch(_rows(spark, 3000, 3500).coalesce(1), batch_id=6)
    assert len(_read_set(sink, spark)) == 3500

    # vacuum reclaims only superseded files; the table is unchanged
    deleted = sink.vacuum()
    assert len(deleted) >= 6 * 10 - 1
    assert len(_read_set(sink, spark)) == 3500

    # second generation folds the post-compaction batch in
    stats2 = sink.compact(spark, target_file_bytes=10 * 1024 * 1024)
    assert stats2["gen"] == 1
    assert stats2["n_rows"] == 3500
    assert len(_read_set(sink, spark)) == 3500
    sink.vacuum()
    assert len(_read_set(sink, spark)) == 3500


def test_streaming_cadence_small_files_pressure(spark, table_dir):
    """The reference's rolling/compaction story under actual streaming load:
    a long many-micro-batch drain (12 replay chunks × 8-way fan-out) piles
    up ~100 small files; compact() must converge the visible snapshot to
    ~target-size files with identical row content, historical as_of reads
    must survive compaction untouched, and a full checkpoint-from-scratch
    REPLAY of the same stream into the compacted table must be a no-op
    (idempotent commit log), with vacuum reclaiming only superseded files."""
    import pyarrow.parquet as pq

    from logflow_spark.fixtures.pages import ensure_pages_fixture
    from logflow_spark.schema import PAGES_SCHEMA
    from logflow_spark.sources.replay import pages_replay_stream

    fixture = os.path.join(CACHE, "pressure_pages_12ch")
    ensure_pages_fixture(fixture, n_rows=6000, n_chunks=12)
    sink = ExactlyOnceParquetSink(table_dir)

    def drain(ckpt_name: str):
        ckpt = os.path.join(CACHE, ckpt_name)
        shutil.rmtree(ckpt, ignore_errors=True)
        stream = (
            pages_replay_stream(spark, fixture, max_files_per_trigger=1)
            .select("url", "warc_ts", "lang")
            .repartition(8)
        )
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink.foreach_batch())
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    drain("pressure_ckpt_a")
    assert len(sink.committed_batches()) >= 12  # one commit per micro-batch
    n_small = len(sink.committed_files())
    assert n_small >= 90  # the small-files problem is real under load
    before = _read_set(sink, spark)
    assert len(before) == 6000
    as_of_5_before = {r["url"] for r in sink.read(spark, as_of=5).collect()}

    # compact to a small target so the expected file count is derivable
    total_bytes = sum(
        os.path.getsize(os.path.join(sink.table_dir, m["path"]))
        for man in sink.visible_manifests()
        for m in man["files"]
    )
    target = 64 * 1024
    stats = sink.compact(spark, target_file_bytes=target)
    expect_files = -(-total_bytes // target)  # ceil of byte-derived count
    assert stats["n_files_in"] == n_small
    assert stats["n_files_out"] <= expect_files + 2
    assert stats["n_files_out"] < n_small / 4  # converged, not reshuffled
    # every output file is near target size (compaction wrote big files):
    sizes = [
        os.path.getsize(os.path.join(sink.table_dir, f["path"]))
        for f in sink.visible_manifests()[0]["files"]
    ]
    assert max(sizes) <= 4 * target  # row-group/codec slack only

    assert _read_set(sink, spark) == before  # identical content
    # historical snapshot untouched by compaction (manifests retained)
    assert {r["url"] for r in sink.read(spark, as_of=5).collect()} == as_of_5_before
    # parquet files valid (not half-written) — open each footer
    for f in sink.visible_manifests()[0]["files"]:
        pq.ParquetFile(os.path.join(sink.table_dir, f["path"]))

    # full replay from a FRESH checkpoint: every batch id re-arrives and
    # must hit the idempotent commit log as a no-op
    n_batches = len(sink.committed_batches())
    drain("pressure_ckpt_b")
    assert len(sink.committed_batches()) == n_batches
    assert _read_set(sink, spark) == before

    # vacuum reclaims the superseded small files; the table is unchanged
    deleted = sink.vacuum()
    assert len(deleted) >= n_small - 1
    assert _read_set(sink, spark) == before


def test_compaction_with_partitioned_table(spark, table_dir):
    sink = ExactlyOnceParquetSink(table_dir, partition_by=["k"], max_records_per_file=50)
    for b in range(3):
        sink.write_batch(_rows(spark, b * 300, (b + 1) * 300), batch_id=b)
    before = _read_set(sink, spark)
    per_part_before = sink.metrics()["per_partition_rows"]
    sink.compact(spark, target_file_bytes=10 * 1024 * 1024)
    sink.vacuum()
    got = sink.read(spark)
    assert "k" in got.columns  # partition column survives the rewrite
    assert _read_set(sink, spark) == before
    assert sink.metrics()["per_partition_rows"] == per_part_before


def test_time_travel_snapshots(spark, table_dir):
    """as_of reads reconstruct every historical snapshot; compaction keeps
    history readable; vacuum expires it with a precise error (Iceberg
    expire_snapshots contract)."""
    sink = ExactlyOnceParquetSink(table_dir)
    for b in range(3):
        sink.write_batch(_rows(spark, 100 * b, 100 * (b + 1)), batch_id=b)

    for b in range(3):
        got = {r["id"] for r in sink.read(spark, as_of=b).collect()}
        assert got == set(range(100 * (b + 1)))

    # compact covers batches 0-2; a later batch 3 lands on top
    sink.compact(spark, target_file_bytes=1 << 20)
    sink.write_batch(_rows(spark, 300, 400), batch_id=3)

    # pre-compaction history still readable (nothing vacuumed yet)
    assert {r["id"] for r in sink.read(spark, as_of=1).collect()} == set(range(200))
    # as_of=2 equals the compaction snapshot; as_of=3 includes the new batch
    assert {r["id"] for r in sink.read(spark, as_of=2).collect()} == set(range(300))
    assert {r["id"] for r in sink.read(spark, as_of=3).collect()} == set(range(400))
    # current read unchanged by time-travel plumbing
    assert {r["id"] for r in sink.read(spark).collect()} == set(range(400))

    # vacuum reclaims the pre-compaction files -> expired history raises
    assert sink.vacuum()
    with pytest.raises(FileNotFoundError, match="vacuumed|expired"):
        sink.read(spark, as_of=1)
    # the compacted snapshot and the tip remain readable after vacuum
    assert {r["id"] for r in sink.read(spark, as_of=2).collect()} == set(range(300))
    assert {r["id"] for r in sink.read(spark).collect()} == set(range(400))


def test_schema_evolution_add_column(spark, table_dir):
    """Iceberg-style ADD-COLUMN evolution from the commit log: later
    batches may add columns; reads use the union schema built from
    manifests alone (no footer scan), older files surface nulls,
    time-travel reads see the schema as of that snapshot, and compaction
    collapses the history into homogeneous files."""
    sink = ExactlyOnceParquetSink(table_dir)
    sink.write_batch(
        spark.range(0, 100).select("id", (F.col("id") % 3).alias("k")), 0
    )
    sink.write_batch(
        spark.range(100, 200).select(
            "id", (F.col("id") % 3).alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        ),
        1,
    )

    df = sink.read(spark)
    assert df.columns == ["id", "k", "v"]  # union, first-seen order
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 200
    assert rows[5]["v"] is None  # pre-evolution file reads null
    assert rows[150]["v"] == "v150"

    # time travel: the snapshot as of batch 0 has the OLD schema
    assert sink.read(spark, as_of=0).columns == ["id", "k"]

    before = {tuple(r) for r in df.collect()}
    sink.compact(spark, target_file_bytes=1 << 20)
    assert {tuple(r) for r in sink.read(spark).collect()} == before
    sink.vacuum()
    assert {tuple(r) for r in sink.read(spark).collect()} == before

    # a NON-PROMOTABLE type change on an existing column is rejected at
    # write_batch time, BEFORE the commit rename — the bad batch never
    # lands and the table stays readable (round-3 advisory: a poisoned
    # log had no in-band recovery)
    with pytest.raises(ValueError, match="write_batch rejected.*'k'"):
        sink.write_batch(
            spark.range(200, 210).select(
                "id", F.lit("not-a-long").alias("k"), F.lit("x").alias("v")
            ),
            2,
        )
    assert 2 not in sink.committed_batches()
    assert {tuple(r) for r in sink.read(spark).collect()} == before


def test_schema_evolution_type_widening(spark, table_dir):
    """Iceberg promotable-type evolution: int→long, float→double and
    decimal precision widening are metadata-only — the union schema widens,
    the parquet reader upcasts narrow files at scan time, time travel keeps
    the narrow historical schema, and compaction rewrites history at the
    wide type."""
    sink = ExactlyOnceParquetSink(table_dir)
    sink.write_batch(
        spark.range(0, 50).select(
            F.col("id").cast("int").alias("id"),
            F.col("id").cast("float").alias("x"),
            F.col("id").cast("decimal(5,2)").alias("d"),
        ),
        0,
    )
    sink.write_batch(
        spark.range(50, 100).select(
            F.col("id").cast("long").alias("id"),
            F.col("id").cast("double").alias("x"),
            F.col("id").cast("decimal(12,2)").alias("d"),
        ),
        1,
    )

    df = sink.read(spark)
    assert dict(df.dtypes) == {"id": "bigint", "x": "double", "d": "decimal(12,2)"}
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 100
    assert rows[7]["x"] == 7.0 and rows[99]["x"] == 99.0
    assert float(rows[7]["d"]) == 7.0

    # time travel: snapshot as of batch 0 keeps the NARROW schema
    assert dict(sink.read(spark, as_of=0).dtypes) == {
        "id": "int", "x": "float", "d": "decimal(5,2)"
    }

    # the reverse direction (narrow after wide) also reads widened
    sink.write_batch(
        spark.range(100, 110).select(
            F.col("id").cast("int").alias("id"),
            F.col("id").cast("float").alias("x"),
            F.col("id").cast("decimal(5,2)").alias("d"),
        ),
        2,
    )
    assert sink.read(spark).count() == 110

    before = {tuple(r) for r in sink.read(spark).collect()}
    sink.compact(spark, target_file_bytes=1 << 20)
    sink.vacuum()
    got = sink.read(spark)
    assert dict(got.dtypes) == {"id": "bigint", "x": "double", "d": "decimal(12,2)"}
    assert {tuple(r) for r in got.collect()} == before


def test_promote_type_lattice_properties():
    """The promotable-type relation is a join-semilattice over the types we
    ever record: symmetric, idempotent, and associative where defined —
    so union_schema's left-fold over manifests is order-independent, which
    is what makes the widened schema well-defined regardless of commit
    order."""
    from itertools import product

    from pyspark.sql.types import (
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
    )

    from logflow_spark.sinks.exactly_once import promote_type

    types = [
        IntegerType(), LongType(), FloatType(), DoubleType(), StringType(),
        DecimalType(5, 2), DecimalType(12, 2), DecimalType(12, 3),
    ]
    for a, b in product(types, types):
        assert promote_type(a, a) == a  # idempotent
        assert promote_type(a, b) == promote_type(b, a)  # symmetric
        w = promote_type(a, b)
        if w is not None:
            # the join absorbs both operands: widening further with either
            # side is a no-op (associativity of the defined fragment)
            assert promote_type(w, a) == w and promote_type(w, b) == w
    # spot semantics
    assert promote_type(IntegerType(), LongType()) == LongType()
    assert promote_type(FloatType(), DoubleType()) == DoubleType()
    assert promote_type(DecimalType(5, 2), DecimalType(12, 2)) == DecimalType(12, 2)
    assert promote_type(DecimalType(12, 2), DecimalType(12, 3)) is None
    assert promote_type(IntegerType(), DoubleType()) is None
    assert promote_type(StringType(), LongType()) is None


def test_schema_evolution_across_streaming_drains(spark, table_dir):
    """The evolution story under ACTUAL streaming commits, not hand-called
    write_batch: stream v1 (int metric) drains into the table via
    foreachBatch; a later stream v2 (long metric + a new column) drains
    into the SAME table from its own checkpoint. The union schema widens
    int→long and adds the column; v1-era rows read back upcast with nulls
    for the added column."""
    import shutil

    from pyspark.sql import functions as F

    from tests.conftest import CACHE

    sink = ExactlyOnceParquetSink(table_dir)

    def drain(src_dir: str, ckpt_name: str, batch_offset: int):
        ckpt = os.path.join(CACHE, ckpt_name)
        shutil.rmtree(ckpt, ignore_errors=True)
        stream = (
            spark.readStream.schema(spark.read.parquet(src_dir).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda df, bid: sink.write_batch(df, batch_offset + bid)
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    v1 = os.path.join(CACHE, "evo_stream_v1")
    v2 = os.path.join(CACHE, "evo_stream_v2")
    for p in (v1, v2):
        shutil.rmtree(p, ignore_errors=True)
    spark.range(0, 40).select(
        "id", F.col("id").cast("int").alias("metric")
    ).repartition(2).write.parquet(v1)
    spark.range(40, 80).select(
        "id",
        F.col("id").cast("long").alias("metric"),
        F.concat(F.lit("s"), F.col("id")).alias("source"),
    ).repartition(2).write.parquet(v2)

    drain(v1, "evo_ckpt_v1", 0)
    drain(v2, "evo_ckpt_v2", 100)

    df = sink.read(spark)
    assert dict(df.dtypes) == {"id": "bigint", "metric": "bigint", "source": "string"}
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 80
    assert rows[5]["metric"] == 5 and rows[5]["source"] is None
    assert rows[77]["source"] == "s77"


def test_compact_resolve_types_repairs_poisoned_log(spark, table_dir):
    """A legacy/hand-edited log carrying a NON-promotable conflict (written
    here by bypassing the write_batch gate) makes read() raise; the
    advertised repair path — compact(resolve_types='newest') — must
    actually work: per-schema-group scans, SQL casts to the newest type,
    one homogeneous generation, table readable again."""
    sink = ExactlyOnceParquetSink(table_dir)
    sink.write_batch(
        spark.range(0, 40).select("id", (F.col("id") % 5).alias("k")), 0
    )
    # poison: same column arrives as string (validation bypassed)
    sink._validate_batch_schema = lambda df: None
    sink.write_batch(
        spark.range(40, 60).select(
            "id", F.concat(F.lit("s"), F.col("id") % 5).alias("k")
        ),
        1,
    )
    with pytest.raises(ValueError, match="not a promotable change"):
        sink.read(spark)
    with pytest.raises(ValueError, match="not a promotable change"):
        sink.compact(spark)  # plain compact cannot resolve it either

    stats = sink.compact(spark, resolve_types="newest", target_file_bytes=1 << 20)
    assert stats["n_rows"] == 60
    df = sink.read(spark)
    assert dict(df.dtypes)["k"] == "string"  # newest manifest's type wins
    rows = {r["id"]: r["k"] for r in df.collect()}
    assert rows[3] == "3"  # old long values cast to string
    assert rows[42] == "s2"
    assert len(rows) == 60
    sink.vacuum()
    assert sink.read(spark).count() == 60


def test_schema_evolution_partitioned_table(spark, table_dir):
    sink = ExactlyOnceParquetSink(table_dir, partition_by=["k"])
    sink.write_batch(
        spark.range(0, 60).select("id", (F.col("id") % 2).alias("k")), 0
    )
    sink.write_batch(
        spark.range(60, 120).select(
            "id", (F.col("id") % 2).alias("k"), (F.col("id") * 2).alias("w")
        ),
        1,
    )
    df = sink.read(spark)
    assert set(df.columns) == {"id", "k", "w"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[3]["k"] in (0, 1)  # partition values recovered from dirs
    assert rows[3]["w"] is None and rows[70]["w"] == 140
    assert sink.metrics()["total_rows"] == 120
