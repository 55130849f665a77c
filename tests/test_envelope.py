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


def test_wrap_messages_shape_and_filter(spark):
    """MESSAGE('m') envelopes (LogicalDecodingMessageMonitor.java:43-96):
    key = struct{prefix}, value = {op='m', ts_ms, source, message{prefix,
    content}} with no before/after image, topic = '<server>.message';
    include regex wins over exclude (LogicalDecodingMessageFilter.java:22-31)."""
    rows = [(i, f"pfx{i % 3}", f"payload-{i}") for i in range(9)]
    df = spark.createDataFrame(rows, "off long, pfx string, body string")
    msgs = E.wrap_messages(
        df,
        prefix=F.col("pfx"),
        content=F.col("body"),
        offset=F.col("off"),
        ts_ms=(F.col("off") * 100).cast("long"),
        server_name="srv",
    )
    assert set(msgs.columns) == {"key", "value", "offset", "topic"}
    value_fields = set(msgs.schema["value"].dataType.fieldNames())
    assert value_fields == {"op", "ts_ms", "source", "message"}  # no before/after
    got = {r["offset"]: r for r in msgs.collect()}
    assert len(got) == 9
    for off, r in got.items():
        assert r["topic"] == "srv.message"
        assert r["value"]["op"] == "m"
        assert r["key"]["prefix"] == r["value"]["message"]["prefix"] == f"pfx{off % 3}"
        assert r["value"]["message"]["content"] == f"payload-{off}"
        assert r["value"]["ts_ms"] == off * 100

    only_0 = E.wrap_messages(
        df, prefix=F.col("pfx"), content=F.col("body"), offset=F.col("off"),
        prefix_include="^pfx0$",
    )
    assert {r["key"]["prefix"] for r in only_0.collect()} == {"pfx0"}
    no_1 = E.wrap_messages(
        df, prefix=F.col("pfx"), content=F.col("body"), offset=F.col("off"),
        prefix_exclude="^pfx1$",
    )
    assert {r["key"]["prefix"] for r in no_1.collect()} == {"pfx0", "pfx2"}
    # include wins when both are set, as the reference filter does
    both = E.wrap_messages(
        df, prefix=F.col("pfx"), content=F.col("body"), offset=F.col("off"),
        prefix_include="^pfx2$", prefix_exclude="^pfx2$",
    )
    assert {r["key"]["prefix"] for r in both.collect()} == {"pfx2"}


def test_wrap_messages_prefix_list_semantics(spark):
    """Predicates.java:205,235 parity: the include/exclude lists are
    comma-separated regexes, each matched case-insensitively against the FULL
    prefix (Pattern.matches anchoring) — substring hits do not count."""
    rows = [(0, "PFX0"), (1, "pfx1"), (2, "xpfx0x"), (3, "pfx2")]
    df = spark.createDataFrame(rows, "off long, pfx string")

    def prefixes(**kw):
        m = E.wrap_messages(
            df, prefix=F.col("pfx"), content=F.lit("c"), offset=F.col("off"), **kw
        )
        return {r["key"]["prefix"] for r in m.collect()}

    # comma-separated list: ANY pattern fully matching admits the prefix
    assert prefixes(prefix_include="pfx0,pfx2") == {"PFX0", "pfx2"}
    # case-insensitive full match; 'xpfx0x' is only a substring hit -> excluded
    assert prefixes(prefix_include="pfx0") == {"PFX0"}
    # exclude list obeys the same semantics
    assert prefixes(prefix_exclude="pfx0,PFX1") == {"xpfx0x", "pfx2"}


def test_wrap_wal_incremental_snapshot_marker(spark):
    """Ad-hoc chunk rows (_adhoc=true) carry source.snapshot='incremental'
    (SnapshotRecord.INCREMENTAL); plain reads 'true'; stream ops 'false'."""
    def img(p):
        return '{"repo": "r1", "path": "%s"}' % p

    df = spark.createDataFrame(
        [
            (1, 10, "r", "r1", "p1", None, img("p1"), False, True),
            (2, 20, "r", "r1", "p2", None, img("p2"), False, None),
            (3, 30, "c", "r1", "p3", None, img("p3"), False, None),
        ],
        "offset bigint, ts_ms bigint, op string, repo string, path string, "
        "before_j string, after_j string, is_tombstone boolean, _adhoc boolean",
    ).select(
        "offset", "ts_ms", "op", "repo", "path",
        F.from_json("before_j", "repo string, path string").alias("before"),
        F.from_json("after_j", "repo string, path string").alias("after"),
        "is_tombstone", "_adhoc",
    )
    env = E.wrap_wal(df, key_cols=("repo", "path"))
    snaps = {
        r["offset"]: r["s"]
        for r in env.select("offset", F.col("value.source.snapshot").alias("s")).collect()
    }
    assert snaps == {1: "incremental", 2: "true", 3: "false"}
    assert "_adhoc" not in env.columns
