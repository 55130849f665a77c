"""Signal-driven ad-hoc incremental snapshot (ExecuteSnapshot.java:34,
AbstractIncrementalSnapshotChangeEventSource.java:294-358): an
execute-snapshot signal chunks a re-read of the source table through the
running engine while the stream keeps applying — mirroring
AbstractIncrementalSnapshotTest (inserts racing the chunked snapshot: no key
lost, none duplicated, stream always wins inside the window). Chunk position
is durable, so a crash mid-snapshot resumes without loss; the signal is
consumed exactly once across restarts."""

import json
import os

from pyspark.sql import functions as F

from debezium_spark import CdcEngine, EngineConfig
from debezium_spark.sources import wal as W
from tests import oracle


def _setup(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=300, n_events=900, seed=77, schema_changes=False)
    src_dir = os.path.join(tmpdir_path, "source")
    W.seed_table(spark, spec).write.mode("overwrite").parquet(src_dir)
    wal_dir = os.path.join(tmpdir_path, "wal_sig")
    # stream-only WAL (snapshot.mode=never scenario — the reason ad-hoc
    # snapshots exist): drop the seed READ events
    W.wal_events(spark, spec).where(F.col("op") != "r").write.mode(
        "overwrite"
    ).parquet(wal_dir)
    return spec, src_dir, wal_dir


def _expected(spark, src_dir, wal_dir):
    """Stream state wins for touched keys; untouched keys come from the source."""
    stream = (
        spark.read.parquet(wal_dir)
        .select("offset", "is_tombstone", "op", "repo", "path", "after")
        .toPandas()
    )
    state = oracle.reduce_wal(stream)
    touched = set()
    for r in stream.itertuples(index=False):
        touched.add((r.repo, r.path))
        if r.after is not None:
            a = r.after if isinstance(r.after, dict) else r.after.asDict()
            touched.add((a["repo"], a["path"]))
    for r in spark.read.parquet(src_dir).collect():
        k = (r["repo"], r["path"])
        if k not in touched:
            state[k] = r.asDict()
    return oracle.state_hashes(state)


def _engine(spark, tmpdir_path, wal_dir, src_dir, sub, signal_path, **cfg):
    return CdcEngine(
        spark,
        EngineConfig(
            snapshot_mode="never",
            max_offsets_per_batch=2000,
            incremental_chunk_size=64,
            incremental_chunks_per_batch=2,
            signal_path=signal_path,
            **cfg,
        ),
        wal_path=wal_dir,
        target_path=os.path.join(tmpdir_path, "t" + sub),
        work_dir=os.path.join(tmpdir_path, "w" + sub),
        snapshot_source=src_dir,
    )


def test_execute_snapshot_backfills_without_loss_or_dup(spark, tmpdir_path):
    spec, src_dir, wal_dir = _setup(spark, tmpdir_path)
    sig = os.path.join(tmpdir_path, "signals.jsonl")
    with open(sig, "w") as f:
        f.write(json.dumps({"type": "execute-snapshot"}) + "\n")

    eng = _engine(spark, tmpdir_path, wal_dir, src_dir, "a", sig)
    eng.run()
    got = oracle.target_hashes(
        eng.target().read().select("repo", "path", "content").toPandas()
    )
    assert got == _expected(spark, src_dir, wal_dir)
    # chunk lineage was recorded
    chunks = [
        json.loads(x)
        for x in open(os.path.join(tmpdir_path, "wa", "_metrics.jsonl"))
        if "incremental_chunk" in x
    ]
    assert len(chunks) > 1 and sum(c["n_rows"] for c in chunks) == spec.n_keys


def test_snapshot_resumes_after_crash_and_signal_fires_once(spark, tmpdir_path):
    spec, src_dir, wal_dir = _setup(spark, tmpdir_path)
    sig = os.path.join(tmpdir_path, "signals2.jsonl")
    with open(sig, "w") as f:
        f.write(json.dumps({"type": "execute-snapshot"}) + "\n")

    e1 = _engine(spark, tmpdir_path, wal_dir, src_dir, "b", sig)
    e1.run(max_batches=2)  # "crash" mid-snapshot
    e2 = _engine(spark, tmpdir_path, wal_dir, src_dir, "b", sig)
    e2.run()
    got = oracle.target_hashes(
        e2.target().read().select("repo", "path", "content").toPandas()
    )
    assert got == _expected(spark, src_dir, wal_dir)
    # the signal row was consumed exactly once across both engine lifetimes
    metrics = open(os.path.join(tmpdir_path, "wb", "_metrics.jsonl")).read()
    assert metrics.count('"execute-snapshot"') == 1


def test_stop_snapshot_cancels(spark, tmpdir_path):
    spec, src_dir, wal_dir = _setup(spark, tmpdir_path)
    sig = os.path.join(tmpdir_path, "signals3.jsonl")
    with open(sig, "w") as f:
        f.write(json.dumps({"type": "execute-snapshot"}) + "\n")
        f.write(json.dumps({"type": "stop-snapshot"}) + "\n")

    eng = _engine(spark, tmpdir_path, wal_dir, src_dir, "c", sig)
    eng.run()
    # cancelled before any batch: state is the pure stream reduce
    stream = (
        spark.read.parquet(wal_dir)
        .select("offset", "is_tombstone", "op", "repo", "path", "after")
        .toPandas()
    )
    got = oracle.target_hashes(
        eng.target().read().select("repo", "path", "content").toPandas()
    )
    assert got == oracle.state_hashes(oracle.reduce_wal(stream))


def test_parquet_bounds_sidecar_matches_jsonl_path(spark, tmpdir_path):
    """Big-plan variant: with incremental_bounds_driver_max forced below the
    chunk count, the key bounds land in the range-clustered parquet sidecar
    and every batch reads only its chunk window — final state identical to the
    driver-resident JSONL path, and no JSONL bounds file exists."""
    spec, src_dir, wal_dir = _setup(spark, tmpdir_path)
    sig = os.path.join(tmpdir_path, "signals_pq.jsonl")
    with open(sig, "w") as f:
        f.write(json.dumps({"type": "execute-snapshot"}) + "\n")

    eng = _engine(
        spark, tmpdir_path, wal_dir, src_dir, "pq", sig,
        incremental_bounds_driver_max=2,  # 300 keys / 64-row chunks = 5 chunks
    )
    eng.run()
    got = oracle.target_hashes(
        eng.target().read().select("repo", "path", "content").toPandas()
    )
    assert got == _expected(spark, src_dir, wal_dir)
    work = os.path.join(tmpdir_path, "wpq")
    assert os.path.isdir(os.path.join(work, "_incr_chunks.parquet"))
    assert not os.path.exists(os.path.join(work, "_incr_chunks.jsonl"))
    st = json.load(open(os.path.join(work, "_incr_snapshot.json")))
    assert st["bounds_format"] == "parquet" and st["n_chunks"] == 5
    chunks = [
        json.loads(x)
        for x in open(os.path.join(work, "_metrics.jsonl"))
        if "incremental_chunk" in x
    ]
    assert sum(c["n_rows"] for c in chunks) == spec.n_keys


def test_meters_surface(spark, tmpdir_path):
    """Reference-named monitoring attributes (pipeline/meters/*.java getters)
    derived from the durable files — no Spark job to poll."""
    spec, src_dir, wal_dir = _setup(spark, tmpdir_path)
    sig = os.path.join(tmpdir_path, "signals_m.jsonl")
    with open(sig, "w") as f:
        f.write(json.dumps({"type": "execute-snapshot"}) + "\n")
    eng = _engine(spark, tmpdir_path, wal_dir, src_dir, "m", sig)
    eng.run()
    m = eng.meters()
    assert m["SnapshotCompleted"] and not m["SnapshotRunning"]
    assert not m["SnapshotAborted"] and not m["SnapshotPaused"]
    assert m["RowsScanned"] == {"repos": spec.n_keys}  # config.table_name default
    assert m["NumberOfCommittedTransactions"] >= 1
    assert m["TotalNumberOfEventsSeen"] > 0
    assert m["LastEvent"].startswith("offset=")
    assert m["SourceEventPosition"]["offset"] == str(eng.target().committed_max_offset)
    assert m["RemainingTableCount"] == 0 and m["TotalTableCount"] == 1
    assert "TotalNumberOfCreateEventsSeen" not in m  # opt-in: default is zero-job

    # per-op counters (CommonEventMetricsMXBean:19-23): one pruned scan of the
    # committed WAL range, counts match a direct groupBy over the same range
    mo = eng.meters(per_op_counts=True)
    wal = spark.read.parquet(wal_dir).where(
        F.col("offset") <= eng.target().committed_max_offset
    )
    want = {
        r["op"]: r["n"]
        for r in wal.groupBy("op").agg(F.count("*").alias("n")).collect()
    }
    assert mo["TotalNumberOfCreateEventsSeen"] == want.get("c", 0)
    assert mo["TotalNumberOfUpdateEventsSeen"] == want.get("u", 0)
    assert mo["TotalNumberOfDeleteEventsSeen"] == want.get("d", 0)
    assert (
        mo["TotalNumberOfCreateEventsSeen"]
        + mo["TotalNumberOfUpdateEventsSeen"]
        + mo["TotalNumberOfDeleteEventsSeen"]
        > 0
    )


def test_pause_after_snapshot_halts_chunk_drain(spark, tmpdir_path):
    """A pause consumed during the replay loop must also halt the post-WAL
    chunk drain: the engine may not keep committing snapshot chunks after
    the operator asked it to pause (run_streaming already guarded this;
    run() regression)."""
    spec, src_dir, wal_dir = _setup(spark, tmpdir_path)
    sig = os.path.join(tmpdir_path, "signals_pause.jsonl")
    with open(sig, "w") as f:
        f.write(json.dumps({"type": "execute-snapshot"}) + "\n")

    e1 = _engine(spark, tmpdir_path, wal_dir, src_dir, "p", sig)
    e1.run(max_batches=1)  # snapshot started, chunks pending
    assert e1._incr_state()["active"]
    with open(sig, "a") as f:
        f.write(json.dumps({"type": "pause"}) + "\n")
    e2 = _engine(spark, tmpdir_path, wal_dir, src_dir, "p", sig)
    e2.run()
    # the pause landed during replay -> the chunk drain must NOT have
    # completed the snapshot behind the operator's back
    assert e2._incr_state()["active"], "drain ran past a pause signal"
    # resume: a fresh run() finishes snapshot + stream to the exact oracle
    e3 = _engine(spark, tmpdir_path, wal_dir, src_dir, "p", sig)
    e3.run()
    got = oracle.target_hashes(
        e3.target().read().select("repo", "path", "content").toPandas()
    )
    assert got == _expected(spark, src_dir, wal_dir)
