"""Multi-table capture: one heterogeneous WAL (table column + JSON payloads)
dispatched to per-table typed pipelines with independent lake targets —
relational/Tables.java registry + EventDispatcher.java:189-196 routing."""

import json
import os

from pyspark.sql import functions as F

from debezium_spark import EngineConfig, MultiTableEngine, TableSpec

REPOS_DDL = "repo string, path string, commit string, content string"
USERS_DDL = "user_id bigint, name string, email string"


def _j(**kw):
    return json.dumps(kw)


def _wal_rows():
    """Interleaved two-table log with creates/updates/deletes/tombstones."""
    rows = []

    def repos(offset, op, repo, path, content=None, tomb=False):
        img = None if content is None else _j(repo=repo, path=path, commit=f"c{offset}", content=content)
        key = _j(repo=repo, path=path)
        rows.append(
            (offset, offset * 10, op, "repos",
             key,
             img if op in ("u", "d") and not tomb else None,
             None if (op == "d" or tomb) else img,
             tomb, offset // 8, 1)
        )

    def users(offset, op, uid, name=None, tomb=False):
        img = None if name is None else _j(user_id=uid, name=name, email=f"{name}@x.io")
        key = _j(user_id=uid)
        rows.append(
            (offset, offset * 10, op, "users",
             key,
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
    repos(7, "d", "r2", "b.go", "w1")          # delete r2/b.go
    rows.append((8, 80, "d", "repos", _j(repo="r2", path="b.go"), None, None,
                 True, 1, 1))                   # its tombstone
    users(9, "c", 12, "cyd")
    users(10, "d", 11, "bob")                   # delete bob
    repos(11, "c", "r3", "c.rs", "x1")
    return rows


WAL_SCHEMA = (
    "offset bigint, ts_ms bigint, op string, table string, key_json string, "
    "before_json string, after_json string, is_tombstone boolean, "
    "tx_id bigint, schema_version int"
)


def _mk(spark, tmpdir_path, wal_dir, sub, **cfg):
    return MultiTableEngine(
        spark,
        EngineConfig(**cfg),
        wal_path=wal_dir,
        target_root=os.path.join(tmpdir_path, "targets" + sub),
        work_root=os.path.join(tmpdir_path, "work" + sub),
        tables={
            "repos": TableSpec(payload_ddl=REPOS_DDL, key_columns=("repo", "path")),
            "users": TableSpec(payload_ddl=USERS_DDL, key_columns=("user_id",)),
        },
    )


def test_two_table_dispatch(spark, tmpdir_path):
    wal_dir = os.path.join(tmpdir_path, "mwal")
    spark.createDataFrame(_wal_rows(), WAL_SCHEMA).repartition(1).write.parquet(wal_dir)

    eng = _mk(spark, tmpdir_path, wal_dir, "a")
    eng.run()

    repos = {(r["repo"], r["path"]): r for r in eng.target("repos").read().collect()}
    assert set(repos) == {("r1", "a.py"), ("r3", "c.rs")}
    assert repos[("r1", "a.py")]["content"] == "v2"

    users = {r["user_id"]: r for r in eng.target("users").read().collect()}
    assert set(users) == {10, 12}
    assert users[10]["name"] == "ann2" and users[10]["email"] == "ann2@x.io"

    # per-table resume watermarks are independent and exact
    assert eng.target("repos").committed_max_offset >= 11
    # replay converges (idempotent)
    eng2 = _mk(spark, tmpdir_path, wal_dir, "a")
    eng2.run()
    assert {(r["repo"], r["path"]) for r in eng2.target("repos").read().collect()} == set(repos)


def test_dispatcher_table_exclude(spark, tmpdir_path):
    wal_dir = os.path.join(tmpdir_path, "mwal2")
    spark.createDataFrame(_wal_rows(), WAL_SCHEMA).repartition(1).write.parquet(wal_dir)

    eng = _mk(spark, tmpdir_path, wal_dir, "b", table_exclude="^users$")
    assert set(eng.engines) == {"repos"}
    eng.run()
    assert eng.target("repos").read().count() == 2
    assert not os.path.exists(os.path.join(tmpdir_path, "targetsb", "users"))


def test_partitioned_offsets_map(spark, tmpdir_path):
    """The dispatcher maintains one PartitionedOffsets map (partition = table,
    sources/gtids.py:241): persisted atomically after run(), monotone across
    replays, and containment-checked so a resume can never regress a table."""
    from debezium_spark.sources.gtids import PartitionedOffsets

    wal_dir = os.path.join(tmpdir_path, "mwal3")
    spark.createDataFrame(_wal_rows(), WAL_SCHEMA).repartition(1).write.parquet(wal_dir)

    eng = _mk(spark, tmpdir_path, wal_dir, "c")
    assert eng.offsets(persisted=True) == PartitionedOffsets()  # nothing yet
    eng.run()
    po = eng.offsets()
    # committed watermark = batch window hi (>= last event offset per table)
    assert po.get("repos") >= 11 and po.get("users") >= 10
    # persisted map matches the live manifests
    assert eng.offsets(persisted=True) == po

    # replay on a fresh dispatcher: same targets, map unchanged (monotone)
    eng2 = _mk(spark, tmpdir_path, wal_dir, "c")
    assert eng2.offsets(persisted=True) == po
    eng2.run()
    assert eng2.offsets(persisted=True) == po
    assert po.is_contained_within(eng2.offsets())

    # merge algebra: a foreign map with a lagging table and an extra partition
    other = PartitionedOffsets({"repos": 5, "audit": 3})
    merged = po.merge(other)
    assert merged.get("repos") == po.get("repos") and merged.get("audit") == 3
    assert other.is_contained_within(merged) and po.is_contained_within(merged)


def test_offsets_survive_table_exclusion_on_restart(spark, tmpdir_path):
    """Narrowing the captured set on restart must not trip the monotonicity
    check: the excluded table's persisted watermark is retained (carried
    through the merge), not compared against a non-existent engine."""
    wal_dir = os.path.join(tmpdir_path, "mwal4")
    spark.createDataFrame(_wal_rows(), WAL_SCHEMA).repartition(1).write.parquet(wal_dir)

    eng = _mk(spark, tmpdir_path, wal_dir, "d")
    eng.run()
    po_full = eng.offsets(persisted=True)
    assert po_full.get("users") >= 10

    eng2 = _mk(spark, tmpdir_path, wal_dir, "d", table_exclude="^users$")
    assert set(eng2.engines) == {"repos"}
    eng2.run()  # must not raise
    po_after = eng2.offsets(persisted=True)
    # excluded table's watermark retained; captured table stayed monotone
    assert po_after.get("users") == po_full.get("users")
    assert po_after.get("repos") >= po_full.get("repos")
