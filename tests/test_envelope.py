"""Golden envelope validators — the VerifyRecord.java analogue.

Mirrors debezium-core/src/test/java/io/debezium/data/VerifyRecord.java:
isValidRead(:130)/isValidInsert(:107)/isValidUpdate(:146)/isValidDelete(:168)/
isValidTombstone(:191): per-op presence of before/after and key integrity.
"""

from pyspark.sql import functions as F

from debezium_spark.functions import envelope as E
from debezium_spark.sources import wal as W


def _env(spark, spec=None):
    spec = spec or W.WalSpec(n_keys=200, n_events=1000, seed=11)
    wal = W.wal_events(spark, spec)
    return E.wrap_wal(wal), wal


def test_read_and_create_set_only_after(spark):
    env, _ = _env(spark)
    bad = env.where(
        F.col("value.op").isin("r", "c")
        & (F.col("value.before").isNotNull() | F.col("value.after").isNull())
    ).count()
    assert bad == 0


def test_update_sets_before_and_after(spark):
    env, _ = _env(spark)
    bad = env.where(
        (F.col("value.op") == "u")
        & (F.col("value.before").isNull() | F.col("value.after").isNull())
    ).count()
    assert bad == 0


def test_delete_sets_only_before(spark):
    env, _ = _env(spark)
    bad = env.where(
        (F.col("value.op") == "d")
        & F.col("value").isNotNull()
        & (F.col("value.before").isNull() | F.col("value.after").isNotNull())
    ).count()
    assert bad == 0


def test_tombstone_has_key_and_null_value(spark):
    env, wal = _env(spark)
    tombs = env.where(F.col("value").isNull())
    assert tombs.count() == wal.where("is_tombstone").count()
    assert tombs.where(
        F.col("key.repo").isNull() | F.col("key.path").isNull()
    ).count() == 0


def test_key_matches_image(spark):
    """Key = before's key for deletes, after's key otherwise (TableSchema.keyFromColumnData)."""
    env, _ = _env(spark)
    bad = env.where(
        F.col("value").isNotNull()
        & (
            (F.col("value.op") == "d")
            & (F.col("key.path") != F.col("value.before.path"))
            | F.col("value.op").isin("r", "c")
            & (F.col("key.path") != F.col("value.after.path"))
        )
    ).count()
    assert bad == 0


def test_source_block_fields(spark):
    env, _ = _env(spark)
    row = env.where(F.col("value").isNotNull()).select("value.source.*").first()
    assert row["connector"] == "spark-cdc"
    assert row["name"] == "repos"
    assert row["snapshot"] in ("true", "false")
    assert row["sequence"] is not None


def test_snapshot_markers_first_true_last(spark):
    from debezium_spark.sources.snapshot import snapshot_events

    seed = W.seed_table(spark, W.WalSpec(n_keys=50, n_events=0, seed=3))
    env = snapshot_events(seed)
    marks = [r["m"] for r in env.select(F.col("value.source.snapshot").alias("m")).collect()]
    assert marks.count("first") == 1
    assert marks.count("last") == 1
    assert marks.count("true") == 48
    # offsets dense and aligned with markers
    offs = env.select("offset", F.col("value.source.snapshot").alias("m")).collect()
    by_off = {r["offset"]: r["m"] for r in offs}
    assert by_off[min(by_off)] == "first" and by_off[max(by_off)] == "last"


def test_snapshot_select_override(spark):
    """S2 snapshot.select.statement.overrides
    (RelationalSnapshotChangeEventSource.java:457-468): per-table predicate
    restricts the snapshot scan; markers/offsets stay dense over the subset."""
    from debezium_spark.sources.snapshot import snapshot_events

    seed = W.seed_table(spark, W.WalSpec(n_keys=80, n_events=0, seed=4))
    n_py = seed.where("lang = 'py'").count()
    assert 0 < n_py < 80
    env = snapshot_events(seed, where="lang = 'py'")
    rows = env.select(
        "offset",
        F.col("value.after.lang").alias("lang"),
        F.col("value.source.snapshot").alias("m"),
    ).collect()
    assert len(rows) == n_py
    assert all(r["lang"] == "py" for r in rows)
    marks = [r["m"] for r in rows]
    assert marks.count("first") == 1 and marks.count("last") == 1
    assert sorted(r["offset"] for r in rows) == list(range(n_py))


def test_unwrap_extract_new_record_state(spark):
    env, _ = _env(spark)
    flat = E.unwrap(env)
    assert "__deleted" in flat.columns and "__op" in flat.columns
    # tombstones dropped
    assert flat.where(F.col("__op").isNull()).count() == 0
    # delete rows carry the before-image key and __deleted=true
    d = flat.where("__deleted")
    assert d.count() > 0 and d.where(F.col("repo").isNull()).count() == 0
    # drop_deletes mode removes them
    assert E.unwrap(env, drop_deletes=True).where("__deleted").count() == 0


def test_unwrap_options(spark):
    """add.fields / add.headers / route.by.field / delete.handling.mode /
    drop.tombstones (ExtractNewRecordState.java:64-87,126-191,318-343)."""
    env, _ = _env(spark)
    flat = E.unwrap(
        env,
        add_fields=["op", "ts_ms", "source.sequence", "transaction.id"],
        add_headers=["op"],
        route_by_field="lang",
    )
    for c in ("__op", "__ts_ms", "__source_sequence", "__transaction_id",
              "__header_op", "__route"):
        assert c in flat.columns, c
    assert flat.where(F.col("__source_sequence").isNull()).count() == 0
    # route column mirrors the flattened payload field
    assert flat.where(F.col("__route") != F.col("lang").cast("string")).count() == 0

    # delete_handling='none': delete rows keep the (null) after-image
    none = E.unwrap(env, delete_handling="none")
    d = none.where("__deleted")
    assert d.count() > 0 and d.where(F.col("repo").isNotNull()).count() == 0
    # drop_tombstones=False keeps tombstones (null-value rows, null __op)
    kept = E.unwrap(env, drop_tombstones=False)
    assert kept.where(F.col("__op").isNull()).count() > 0
