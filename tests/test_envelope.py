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
