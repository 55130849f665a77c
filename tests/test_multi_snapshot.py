"""Multi-table incremental snapshots: one signal channel, N per-table chunk
snapshots, routed by the signal's ``data-collections`` array
(ExecuteSnapshot.java:48 — the signal names the collections it addresses;
each collection keeps its own chunk progress in IncrementalSnapshotContext).
The channel is shared — one signal file (or one in-band op='s' WAL row) is
seen by every per-table engine, and each applies only signals whose
data-collections patterns full-match its table id."""

import json
import os

import pytest

from debezium_spark import EngineConfig, MultiTableEngine, TableSpec

REPOS_DDL = "repo string, path string, commit string, content string"
USERS_DDL = "user_id bigint, name string, email string"

WAL_SCHEMA = (
    "offset bigint, ts_ms bigint, op string, table string, key_json string, "
    "before_json string, after_json string, is_tombstone boolean, "
    "tx_id bigint, schema_version int"
)


def _j(**kw):
    return json.dumps(kw)


def _wal_rows():
    """Stream-only (no 'r') interleaved two-table log."""
    rows = []

    def repos(offset, op, repo, path, content=None, tomb=False):
        img = None if content is None else _j(
            repo=repo, path=path, commit=f"c{offset}", content=content
        )
        key = _j(repo=repo, path=path)
        rows.append(
            (offset, offset * 10, op, "repos", key,
             img if op in ("u", "d") and not tomb else None,
             None if (op == "d" or tomb) else img,
             tomb, offset // 8, 1)
        )

    def users(offset, op, uid, name=None, tomb=False):
        img = None if name is None else _j(
            user_id=uid, name=name, email=f"{name}@x.io"
        )
        key = _j(user_id=uid)
        rows.append(
            (offset, offset * 10, op, "users", key,
             img if op in ("u", "d") and not tomb else None,
             None if (op == "d" or tomb) else img,
             tomb, offset // 8, 1)
        )

    repos(1, "c", "r1", "a.py", "v1")
    users(2, "c", 10, "ann")
    repos(3, "u", "r1", "a.py", "v2")
    users(4, "u", 10, "ann2")
    repos(5, "c", "r2", "b.go", "w1")
    users(6, "c", 11, "bob")
    users(7, "d", 11, "bob")  # delete bob
    repos(8, "c", "r3", "c.rs", "x1")
    return rows


def _sources(spark, tmpdir_path):
    """Per-table snapshot sources at consistency position 0 PLUS keys the
    stream never touches (the backfill payload): the stream always wins for
    touched keys, source-only keys appear."""
    repos_src = os.path.join(tmpdir_path, "src_repos")
    spark.createDataFrame(
        [("r1", "a.py", "old", "SRC-stale"), ("r9", "z.py", "s0", "SRC-new")],
        "repo string, path string, commit string, content string",
    ).write.mode("overwrite").parquet(repos_src)
    users_src = os.path.join(tmpdir_path, "src_users")
    spark.createDataFrame(
        [(10, "SRC-stale", "x@x.io"), (99, "newbie", "newbie@x.io")],
        "user_id bigint, name string, email string",
    ).write.mode("overwrite").parquet(users_src)
    return repos_src, users_src


def _mk(spark, tmpdir_path, wal_dir, sub, repos_src, users_src, **cfg):
    return MultiTableEngine(
        spark,
        EngineConfig(
            snapshot_mode="never",
            incremental_chunk_size=8,
            incremental_chunks_per_batch=2,
            **cfg,
        ),
        wal_path=wal_dir,
        target_root=os.path.join(tmpdir_path, "targets" + sub),
        work_root=os.path.join(tmpdir_path, "work" + sub),
        tables={
            "repos": TableSpec(
                payload_ddl=REPOS_DDL, key_columns=("repo", "path"),
                snapshot_source=repos_src,
            ),
            "users": TableSpec(
                payload_ddl=USERS_DDL, key_columns=("user_id",),
                snapshot_source=users_src,
            ),
        },
    )


def _write_wal(spark, tmpdir_path, extra_rows=()):
    wal_dir = os.path.join(tmpdir_path, "mwal_sig")
    spark.createDataFrame(
        _wal_rows() + list(extra_rows), WAL_SCHEMA
    ).repartition(1).write.mode("overwrite").parquet(wal_dir)
    return wal_dir


def test_file_signal_routes_by_data_collections(spark, tmpdir_path):
    """A shared signal file addressing ["repos"] snapshots repos only."""
    wal_dir = _write_wal(spark, tmpdir_path)
    repos_src, users_src = _sources(spark, tmpdir_path)
    sig = os.path.join(tmpdir_path, "signals.jsonl")
    with open(sig, "w") as f:
        f.write(_j(type="execute-snapshot", **{"data-collections": ["repos"]}) + "\n")

    eng = _mk(spark, tmpdir_path, wal_dir, "a", repos_src, users_src,
              signal_path=sig)
    eng.run()

    repos = {(r["repo"], r["path"]): r for r in eng.target("repos").read().collect()}
    # source-only key appears; stream-touched key keeps the STREAM value
    assert ("r9", "z.py") in repos
    assert repos[("r1", "a.py")]["content"] == "v2"
    # users was not addressed: no backfill
    users = {r["user_id"] for r in eng.target("users").read().collect()}
    assert users == {10}


def test_programmatic_regex_addresses_many_tables(spark, tmpdir_path):
    """MultiTableEngine.execute_snapshot with regex data-collections fans out
    to every matching engine; chunk state is per-table."""
    wal_dir = _write_wal(spark, tmpdir_path)
    repos_src, users_src = _sources(spark, tmpdir_path)
    eng = _mk(spark, tmpdir_path, wal_dir, "b", repos_src, users_src)

    addressed = eng.execute_snapshot(["rep.*", "users"])
    assert sorted(addressed) == ["repos", "users"]
    eng.run()

    repos = {(r["repo"], r["path"]) for r in eng.target("repos").read().collect()}
    users = {r["user_id"]: r for r in eng.target("users").read().collect()}
    assert ("r9", "z.py") in repos
    assert 99 in users and users[99]["name"] == "newbie"
    # stream wins over the stale source image for touched keys
    assert users[10]["name"] == "ann2"
    # deleted key is NOT resurrected (source_offset=0 chunk rows lose to the
    # delete at offset 7 under the strict offset guard)
    assert 11 not in users

    with pytest.raises(ValueError):
        eng.execute_snapshot(["nope"])


def test_stop_snapshot_routes(spark, tmpdir_path):
    """stop-snapshot with data-collections cancels only the addressed
    table's in-flight snapshot (StopSnapshot.java optional data-collections)."""
    wal_dir = _write_wal(spark, tmpdir_path)
    repos_src, users_src = _sources(spark, tmpdir_path)
    eng = _mk(spark, tmpdir_path, wal_dir, "c", repos_src, users_src)

    eng.execute_snapshot(["repos", "users"])
    stopped = eng.stop_snapshot(["users"])
    assert stopped == ["users"]
    eng.run()

    repos = {(r["repo"], r["path"]) for r in eng.target("repos").read().collect()}
    users = {r["user_id"] for r in eng.target("users").read().collect()}
    assert ("r9", "z.py") in repos   # repos snapshot ran
    assert 99 not in users           # users snapshot was cancelled


def test_inband_signal_row_routes_at_exact_offset(spark, tmpdir_path):
    """An op='s' WAL row (the captured-signal-table analogue, Signal.java)
    flows through every per-table engine via the dispatcher's ``_signal_data``
    passthrough and triggers a snapshot only on matching tables. The in-band
    signal's offset is the snapshot's low watermark (read-only semantics), so
    the source must reflect state at that offset — here: user 10 at its final
    stream value, no deleted user 11."""
    # users source consistent with offset 9 (= the signal's offset)
    users_src = os.path.join(tmpdir_path, "src_users_ib")
    spark.createDataFrame(
        [(10, "ann2", "ann2@x.io"), (99, "newbie", "newbie@x.io")],
        "user_id bigint, name string, email string",
    ).write.mode("overwrite").parquet(users_src)
    repos_src, _ = _sources(spark, tmpdir_path)

    sig_row = (
        9, 90, "s", "debezium_signal", None, None,
        _j(type="execute-snapshot", **{"data-collections": ["users"]}),
        False, 1, 1,
    )
    wal_dir = _write_wal(spark, tmpdir_path, extra_rows=[sig_row])
    eng = _mk(spark, tmpdir_path, wal_dir, "d", repos_src, users_src,
              signal_data_collection=True, max_offsets_per_batch=4)
    eng.run()

    users = {r["user_id"]: r for r in eng.target("users").read().collect()}
    assert set(users) == {10, 99}
    assert users[10]["name"] == "ann2"
    repos = {(r["repo"], r["path"]) for r in eng.target("repos").read().collect()}
    assert ("r9", "z.py") not in repos  # repos not addressed

    # replay converges: re-running a fresh dispatcher over the same WAL +
    # consumed in-band signal yields the same state (signal re-fires in the
    # new work dir, chunks re-merge idempotently)
    eng2 = _mk(spark, tmpdir_path, wal_dir, "d", repos_src, users_src,
               signal_data_collection=True, max_offsets_per_batch=4)
    eng2.run()
    assert {r["user_id"] for r in eng2.target("users").read().collect()} == set(users)


def test_dispatcher_run_streaming_matches_batch(spark, tmpdir_path):
    """Streaming drive parity: per-table Structured Streaming queries over
    the shared WAL (projection applied inside the query) converge to the
    same per-table lake state as the batch drive, including a routed
    execute-snapshot from the shared signal file."""
    wal_dir = _write_wal(spark, tmpdir_path)
    repos_src, users_src = _sources(spark, tmpdir_path)
    sig = os.path.join(tmpdir_path, "signals_stream.jsonl")
    with open(sig, "w") as f:
        f.write(_j(type="execute-snapshot", **{"data-collections": ["users"]}) + "\n")

    batch = _mk(spark, tmpdir_path, wal_dir, "sb", repos_src, users_src,
                signal_path=sig)
    batch.run()
    stream = _mk(spark, tmpdir_path, wal_dir, "ss", repos_src, users_src,
                 signal_path=sig)
    stream.run_streaming(max_files_per_trigger=1)

    for tbl, key in (("repos", ("repo", "path")), ("users", ("user_id",))):
        want = {
            tuple(r[k] for k in key): r.asDict()
            for r in batch.target(tbl).read().collect()
        }
        got = {
            tuple(r[k] for k in key): r.asDict()
            for r in stream.target(tbl).read().collect()
        }
        assert set(got) == set(want), tbl
    # the routed snapshot backfilled users in BOTH drives
    assert 99 in {r["user_id"] for r in stream.target("users").read().collect()}


def test_data_collections_matching_rules():
    """Routing accepts bare and fully-qualified ids, treats a bare string as
    a one-element list, and never crashes (or matches) on malformed regexes
    — a poisoned durable signal channel must not kill every restart."""
    from debezium_spark.streaming.engine import data_collections_match as m

    assert m(["repos"], "repos", "lake")
    assert m(["lake.repos"], "repos", "lake")       # Debezium-conventional id
    assert m("users", "users", "lake")              # bare string, not a list
    assert not m(["other"], "repos", "lake")
    assert not m(["["], "repos", "lake")            # malformed: no match, no raise
    assert m(["[", "rep.*"], "repos", "lake")       # later valid entry still wins


def test_execute_snapshot_fanout_is_atomic(spark, tmpdir_path):
    """If ANY addressed table lacks a snapshot_source the fan-out raises
    before any engine's durable snapshot state is written."""
    wal_dir = _write_wal(spark, tmpdir_path)
    repos_src, _ = _sources(spark, tmpdir_path)
    eng = MultiTableEngine(
        spark,
        EngineConfig(snapshot_mode="never"),
        wal_path=wal_dir,
        target_root=os.path.join(tmpdir_path, "targets_at"),
        work_root=os.path.join(tmpdir_path, "work_at"),
        tables={
            "repos": TableSpec(payload_ddl=REPOS_DDL, key_columns=("repo", "path"),
                               snapshot_source=repos_src),
            "users": TableSpec(payload_ddl=USERS_DDL, key_columns=("user_id",)),
        },
    )
    with pytest.raises(ValueError, match="snapshot_source"):
        eng.execute_snapshot([".*"])
    # repos' durable snapshot state was never touched
    assert not eng.engines["repos"]._incr_state()["active"]
