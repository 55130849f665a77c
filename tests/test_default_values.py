"""Column DEFAULT values through DDL -> schema history -> lake backfill
(relational/Column.defaultValue + the DefaultValueConverter surface:
MySqlDefaultValueConverter.java — ADD COLUMN ... DEFAULT materializes the
default into every existing row the moment the DDL runs).

Engine rule mirrored here: rows whose latest write predates the ADD COLUMN
read back the DEFAULT (whether their file was committed pre-DDL or the row
was carried through a copy-on-write rewrite); post-add events that explicitly
write NULL stay NULL."""

import os

from pyspark.sql import types as T

from debezium_spark import CdcEngine, EngineConfig
from debezium_spark.plans.ddl import parse_ddl

PAYLOAD_T = (
    "struct<repo:string,path:string,commit:string,lang:string,content:string,"
    "size_bytes:bigint>"
)


def _row(offset, op, k, content=None, size_bytes=None):
    repo, path = f"r{k % 4}", f"p{k}"
    img = (repo, path, f"c{offset}", "py", content, size_bytes)
    return (
        offset, offset * 1000, op, repo, path,
        img if op in ("u", "d") else None,
        img if op in ("r", "c", "u") else None,
        False, offset // 8, 1,
    )


def _wal_df(spark):
    rows = []
    # phase A (offsets 1..10, pre-DDL): create keys 0..9 — size_bytes is
    # physically null (the column does not exist yet at the source)
    for k in range(10):
        rows.append(_row(1 + k, "c", k, content=f"a:{k}"))
    # ADD COLUMN size_bytes DEFAULT 7 lands at offset 30
    # phase B (offsets 31..): post-add updates
    rows.append(_row(31, "u", 5, content="b:5", size_bytes=55))
    rows.append(_row(32, "u", 6, content="b:6", size_bytes=None))  # explicit NULL
    schema = T.StructType.fromDDL(
        f"offset bigint, ts_ms bigint, op string, repo string, path string, "
        f"before {PAYLOAD_T}, after {PAYLOAD_T}, is_tombstone boolean, "
        f"tx_id bigint, schema_version int"
    )
    return spark.createDataFrame(rows, schema)


def _history(spark):
    return spark.createDataFrame(
        [
            (0, 1, "CREATE TABLE t (repo string, path string, commit string, "
             "lang string, content string)", "create"),
            (30, 2, "ALTER TABLE t ADD COLUMN size_bytes bigint DEFAULT 7",
             "add_column:size_bytes:bigint:7"),
        ],
        "offset bigint, version int, ddl string, table_changes string",
    )


def _mk(spark, tmpdir_path, wal_dir, sub, *, step=20):
    return CdcEngine(
        spark,
        EngineConfig(max_offsets_per_batch=step),
        wal_path=wal_dir,
        target_path=os.path.join(tmpdir_path, "t" + sub),
        work_dir=os.path.join(tmpdir_path, "w" + sub),
        schema_changes=_history(spark),
    )


def test_default_backfills_pre_add_rows_only(spark, tmpdir_path):
    wal_dir = os.path.join(tmpdir_path, "wal_dflt")
    _wal_df(spark).repartition(1).write.parquet(wal_dir)

    # step=20: batch 1 commits keys 0..9 under the PRE-add schema version,
    # batch 2 crosses the DDL and merges the post-add updates
    eng = _mk(spark, tmpdir_path, wal_dir, "a")
    eng.run()
    final = {r["path"]: r for r in eng.target().read().collect()}
    assert len(final) == 10
    # untouched pre-add rows: the DEFAULT backfill (read-time, v1 files)
    for k in (0, 1, 2, 3, 4, 7, 8, 9):
        assert final[f"p{k}"]["size_bytes"] == 7, k
    # post-add explicit value and explicit NULL survive untouched
    assert final["p5"]["size_bytes"] == 55
    assert final["p6"]["size_bytes"] is None

    # one giant batch: pre-add EVENTS merge after the DDL applied (the
    # write-time backfill path through the copy-on-write flatten)
    eng2 = _mk(spark, tmpdir_path, wal_dir, "b", step=1000)
    eng2.run()
    final2 = {r["path"]: r["size_bytes"] for r in eng2.target().read().collect()}
    assert final2 == {p: r["size_bytes"] for p, r in final.items()}


def test_default_survives_rewrite_and_rename(spark, tmpdir_path):
    wal_dir = os.path.join(tmpdir_path, "wal_dflt2")
    _wal_df(spark).repartition(1).write.parquet(wal_dir)
    eng = _mk(spark, tmpdir_path, wal_dir, "c")
    eng.run()
    lake = eng.target()
    # copy-on-write rewrite happened for the buckets of keys 5/6 in batch 2 —
    # pre-add rows sharing those buckets must still read the default
    assert {r["size_bytes"] for p, r in
            {r["path"]: r for r in lake.read().collect()}.items()
            if p not in ("p5", "p6")} == {7}
    # the default follows a rename
    lake.rename_column("size_bytes", "sz")
    vals = {r["path"]: r["sz"] for r in lake.read().collect()}
    assert vals["p0"] == 7 and vals["p5"] == 55 and vals["p6"] is None
    # and is dropped with the column
    lake.drop_column("sz")
    assert "sz" not in lake.read().columns
    assert lake.defaults == {}


def test_ddl_parser_captures_static_default_literals():
    evs = parse_ddl(
        "ALTER TABLE t ADD COLUMN size_bytes bigint NOT NULL DEFAULT 7;"
        "ALTER TABLE t ADD COLUMN tag varchar(10) DEFAULT 'n/a';"
        "ALTER TABLE t ADD COLUMN flag boolean DEFAULT true;"
        "ALTER TABLE t ADD COLUMN note text DEFAULT NULL;"
        "ALTER TABLE t ADD COLUMN ts timestamp DEFAULT CURRENT_TIMESTAMP;"
    )
    changes = [e.table_changes for e in evs]
    assert changes[0] == "add_column:size_bytes:bigint:7"
    assert changes[1] == 'add_column:tag:string:"n/a"'
    assert changes[2] == "add_column:flag:boolean:true"
    # NULL and function defaults cannot be replayed as a static backfill
    assert changes[3] == "add_column:note:string"
    assert changes[4] == "add_column:ts:timestamp"
