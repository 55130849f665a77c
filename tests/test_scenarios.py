"""Scenario integration tests — FIXTURES.md §3, mirroring the reference's ITs.

1. snapshot-then-stream   (SnapshotSourceIT.java:61)
2. tombstone + PK-update  (MySqlConnectorIT.java:408-419,1430,1473)
3. schema-change          (MySqlSchemaMigrationIT)
4. incremental-snapshot race (AbstractIncrementalSnapshotTest)
(5. resume-from-checkpoint lives in test_e2e_replay.py)
"""

import os

import pytest
from pyspark.sql import functions as F

from debezium_spark import CdcEngine, EngineConfig
from debezium_spark.functions import envelope as E
from debezium_spark.sources import snapshot as S
from debezium_spark.sources import wal as W
from tests import oracle


def _run(spark, tmpdir_path, spec, cfg=None, subdir=""):
    wal_dir = os.path.join(tmpdir_path, "wal" + subdir)
    W.write_wal(spark, spec, wal_dir, n_files=4)
    eng = CdcEngine(
        spark,
        cfg or EngineConfig(),
        wal_path=wal_dir,
        target_path=os.path.join(tmpdir_path, "t" + subdir),
        work_dir=os.path.join(tmpdir_path, "w" + subdir),
        schema_changes=W.schema_history(spark, spec),
    )
    eng.run()
    return eng, wal_dir


def test_snapshot_then_stream(spark, tmpdir_path):
    """Snapshot rows ('r', low offsets) seed the table; streamed c/u/d at higher
    offsets mutate it; final state = oracle reduce over the full log."""
    spec = W.WalSpec(n_keys=400, n_events=2000, seed=21)
    eng, wal_dir = _run(spark, tmpdir_path, spec)
    lake = eng.target()
    got = oracle.target_hashes(lake.read().select("repo", "path", "content").toPandas())
    wal_pd = spark.read.parquet(wal_dir).select(
        "offset", "is_tombstone", "op", "repo", "path", "after"
    ).toPandas()
    want = oracle.state_hashes(oracle.reduce_wal(wal_pd))
    assert got == want
    # snapshot rows that were never touched by the stream still carry version-0 content
    untouched = lake.read().where(F.col("content").contains(":0:")).count()
    assert untouched > 0


def test_snapshot_mode_never_skips_seed(spark, tmpdir_path):
    """SNAPSHOT_NEVER (S4): 'r' events ignored; only streamed keys exist."""
    spec = W.WalSpec(n_keys=300, n_events=1200, seed=22, schema_changes=False)
    eng, wal_dir = _run(
        spark, tmpdir_path, spec, EngineConfig(snapshot_mode="never"), subdir="n"
    )
    final = eng.target().read()
    # every surviving row came from the stream (offset >= stream base)
    assert final.where(F.col("_offset") < W.stream_base(spec.n_keys)).count() == 0

    wal_pd = (
        spark.read.parquet(wal_dir)
        .where(F.col("op") != "r")
        .select("offset", "is_tombstone", "op", "repo", "path", "after")
        .toPandas()
    )
    want = oracle.state_hashes(oracle.reduce_wal(wal_pd))
    got = oracle.target_hashes(final.select("repo", "path", "content").toPandas())
    assert got == want


def test_snapshot_mode_initial_only(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=250, n_events=800, seed=23, schema_changes=False)
    eng, _ = _run(
        spark, tmpdir_path, spec, EngineConfig(snapshot_mode="initial_only"), subdir="io"
    )
    final = eng.target().read()
    assert final.count() == spec.n_keys  # exactly the seed, no stream applied
    assert final.where(F.col("_offset") >= W.stream_base(spec.n_keys)).count() == 0


def test_tombstone_and_pk_update(spark, tmpdir_path):
    """PK-changing updates: old key gone, new key present, no duplicates; delete+
    tombstone sequences leave no trace of the key."""
    spec = W.WalSpec(n_keys=300, n_events=2500, seed=24, schema_changes=False)
    eng, wal_dir = _run(spark, tmpdir_path, spec, subdir="pk")
    final = eng.target().read()

    wal = spark.read.parquet(wal_dir)
    # keys moved (pk-change) whose OLD key was never re-created later:
    moved = (
        wal.where(
            (F.col("op") == "u") & (F.col("after.path") != F.col("path"))
        )
        .select("repo", "path", F.col("offset").alias("moff"))
    )
    later_writes = wal.where(F.col("op").isin("c", "u")).select(
        F.col("after.repo").alias("repo"), F.col("after.path").alias("path"),
        F.col("offset").alias("woff"),
    )
    resurrected = moved.join(
        later_writes,
        on=(moved.repo == later_writes.repo)
        & (moved.path == later_writes.path)
        & (later_writes.woff > moved.moff),
        how="left_semi",
    )
    gone_old_keys = moved.join(resurrected, ["repo", "path", "moff"], "left_anti")
    still_present = gone_old_keys.join(final, ["repo", "path"], "left_semi")
    assert still_present.count() == 0
    # no duplicate keys
    assert final.groupBy("repo", "path").count().where("count > 1").count() == 0
    # full-state equality with the oracle (covers tombstones too)
    wal_pd = wal.select("offset", "is_tombstone", "op", "repo", "path", "after").toPandas()
    assert oracle.target_hashes(
        final.select("repo", "path", "content").toPandas()
    ) == oracle.state_hashes(oracle.reduce_wal(wal_pd))


def test_tombstones_disabled_variant(spark, tmpdir_path):
    """MySqlConnectorIT.java:1473 shouldEmitNoTombstoneOnDelete: with tombstones
    filtered out, final state is unchanged (deletes still delete)."""
    spec = W.WalSpec(n_keys=200, n_events=1000, seed=25, schema_changes=False)
    wal_dir = os.path.join(tmpdir_path, "walnt")
    W.write_wal(spark, spec, wal_dir, n_files=2)
    # strip tombstones from the log (tombstones.on.delete=false at the source)
    stripped = spark.read.parquet(wal_dir).where(~F.col("is_tombstone"))
    stripped_dir = os.path.join(tmpdir_path, "walnt2")
    stripped.write.parquet(stripped_dir)
    eng = CdcEngine(
        spark, EngineConfig(tombstones_on_delete=False),
        wal_path=stripped_dir,
        target_path=os.path.join(tmpdir_path, "tnt"),
        work_dir=os.path.join(tmpdir_path, "wnt"),
        schema_changes=W.schema_history(spark, spec),
    )
    eng.run()
    wal_pd = stripped.select(
        "offset", "is_tombstone", "op", "repo", "path", "after"
    ).toPandas()
    got = oracle.target_hashes(
        eng.target().read().select("repo", "path", "content").toPandas()
    )
    assert got == oracle.state_hashes(oracle.reduce_wal(wal_pd))


def test_schema_change_mid_stream(spark, tmpdir_path):
    """MySqlSchemaMigrationIT analogue: v2 adds size_bytes (int), v3 widens to
    bigint; pre-bump rows NULL-filled; final schema = v3."""
    spec = W.WalSpec(n_keys=300, n_events=3000, seed=26, schema_changes=True)
    eng, wal_dir = _run(
        spark, tmpdir_path, spec, EngineConfig(max_offsets_per_batch=6000), subdir="sc"
    )
    lake = eng.target()
    sch = {f.name: f.dataType.simpleString() for f in lake.schema.fields}
    assert sch["size_bytes"] == "bigint"
    final = lake.read()
    sco = spec.schema_change_offsets()
    # rows last written before the v2 bump have NULL size_bytes; after, non-NULL
    pre = final.where(F.col("_offset") < sco[2])
    post = final.where(F.col("_offset") >= sco[2])
    assert pre.where(F.col("size_bytes").isNotNull()).count() == 0
    assert post.where(F.col("size_bytes").isNull()).count() == 0
    # durable history was recorded and replays to v3
    replayed = eng.history.replay()
    assert [c.version for c in replayed] == [2, 3]


def test_incremental_snapshot_race(spark, tmpdir_path):
    """AbstractIncrementalSnapshotTest analogue: a chunked re-read interleaved with
    concurrent updates — streamed keys must win over (stale) chunk rows."""
    spec = W.WalSpec(n_keys=500, n_events=0, seed=27, schema_changes=False)
    seed = W.seed_table(spark, spec)  # the consistent chunk source (stale image)

    # concurrent stream window: updates to 50 keys *after* the chunk was read
    updated = seed.limit(50).select("repo", "path")
    snap_rows, lineage = S.incremental_snapshot(
        seed, updated, chunk_size=64
    )
    # updated keys are absent from the snapshot rows (stream supersedes chunk)
    assert snap_rows.join(updated, ["repo", "path"], "left_semi").count() == 0
    # nothing else was lost
    assert snap_rows.count() == spec.n_keys - 50
    # lineage covers all chunks with correct totals
    lin = lineage.toPandas()
    assert lin["n_rows"].sum() == spec.n_keys - 50
    assert (lin["n_rows"] <= 64).all()
