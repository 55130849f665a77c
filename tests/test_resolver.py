"""Unit tests: dedup-by-offset, PK-change split, LWW reduce, tx metadata."""

from pyspark.sql import functions as F

from debezium_spark.functions import envelope as E
from debezium_spark.operators import resolver as R
from debezium_spark.sources import wal as W


def _env(spark, spec):
    return E.wrap_wal(W.wal_events(spark, spec))


def test_dedup_by_offset(spark):
    spec = W.WalSpec(n_keys=200, n_events=2000, seed=5, dup_frac=0.05)
    wal = W.wal_events(spark, spec)
    deduped = R.dedup_by_offset(wal)
    assert wal.count() > deduped.count()
    assert deduped.groupBy("offset", "is_tombstone").count().where("count > 1").count() == 0


def test_split_pk_changes(spark):
    spec = W.WalSpec(n_keys=300, n_events=3000, seed=6)
    env = _env(spark, spec)
    n_split = env.where(
        (F.col("value.op") == "u")
        & (F.col("value.before.path") != F.col("value.after.path"))
    ).count()
    assert n_split > 0
    out = R.split_pk_changes(env)
    # each split row becomes exactly two (delete seq=0, create seq=1)
    assert out.count() == env.count() + n_split
    pairs = out.where("seq = 1")
    assert pairs.count() == n_split
    # delete half keeps the OLD key; create half carries the NEW key
    d = out.where((F.col("seq") == 0) & (F.col("value.op") == "d")
                  & F.col("value.before.path").endswith(".moved"))
    assert d.count() == 0  # old keys never have the .moved suffix
    c = out.where("seq = 1").where(~F.col("key.path").endswith(".moved"))
    assert c.count() == 0
    # ordering: delete sorts before create at the same offset
    assert out.where("seq = 1").select(F.min("offset")).first()[0] is not None


def test_lww_single_action_per_key(spark):
    spec = W.WalSpec(n_keys=150, n_events=2500, seed=7)
    env = R.split_pk_changes(_env(spark, spec))
    actions = R.resolve_lww(env)
    assert actions.groupBy("repo", "path").count().where("count > 1").count() == 0
    assert set(r["action"] for r in actions.select("action").distinct().collect()) <= {
        "upsert",
        "delete",
    }
    # upserts carry a payload, deletes don't
    assert actions.where("action = 'upsert' and after is null").count() == 0
    assert actions.where("action = 'delete' and after is not null").count() == 0


def test_lww_strategies_agree(spark):
    """The broadcast-ordinal plan and the one-shuffle max_by plan are two
    physical strategies for the same argmax — identical results on a WAL with
    duplicates, tombstones, PK splits, and hot keys."""
    spec = W.WalSpec(n_keys=120, n_events=3000, seed=11)
    env = R.split_pk_changes(_env(spark, spec))
    a = R.resolve_lww(env, strategy="ordinal")
    b = R.resolve_lww(env, strategy="aggregate")
    cols = ["repo", "path", "action", "_offset", "_ts_ms"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )
    # payloads agree too (compare a content digest to keep rows small)
    da = {(r["repo"], r["path"]): r["c"] for r in
          a.select("repo", "path", F.sha2(F.col("after.content"), 256).alias("c")).collect()}
    db = {(r["repo"], r["path"]): r["c"] for r in
          b.select("repo", "path", F.sha2(F.col("after.content"), 256).alias("c")).collect()}
    assert da == db


def test_lww_auto_falls_back_past_broadcast_budget(spark):
    """strategy='auto' (the default) probes the live-key count and degrades
    to the one-shuffle aggregate plan when the winner set would blow the
    broadcast budget — no user knob involved (VERDICT r2 #6)."""
    spec = W.WalSpec(n_keys=120, n_events=3000, seed=11)
    env = R.split_pk_changes(_env(spark, spec))
    small = R.resolve_lww(env, strategy="auto", broadcast_key_budget=5)
    assert small._lww_chosen == "aggregate"
    assert "BroadcastHashJoin" not in small._jdf.queryExecution().executedPlan().toString()
    big = R.resolve_lww(env, strategy="auto", broadcast_key_budget=10_000_000)
    assert big._lww_chosen == "ordinal"
    assert "BroadcastHashJoin" in big._jdf.queryExecution().executedPlan().toString()
    cols = ["repo", "path", "action", "_offset", "_ts_ms"]
    assert sorted(map(tuple, small.select(cols).collect())) == sorted(
        map(tuple, big.select(cols).collect())
    )


def test_engine_auto_fallback_end_to_end(spark, tmpdir_path):
    """A batch whose live-key count exceeds the budget replays correctly
    through the full engine on the degraded plan."""
    import os

    from debezium_spark import CdcEngine, EngineConfig

    spec = W.WalSpec(n_keys=200, n_events=800, seed=23, schema_changes=False)
    wal_dir = os.path.join(tmpdir_path, "wal")
    W.write_wal(spark, spec, wal_dir, n_files=4)
    eng = CdcEngine(
        spark,
        EngineConfig(max_offsets_per_batch=3000, lww_broadcast_key_budget=1),
        wal_path=wal_dir,
        target_path=os.path.join(tmpdir_path, "t"),
        work_dir=os.path.join(tmpdir_path, "w"),
    )
    eng.run()
    from tests import oracle

    wal_pd = (
        spark.read.parquet(wal_dir)
        .select("offset", "is_tombstone", "op", "repo", "path", "after")
        .toPandas()
    )
    got = oracle.target_hashes(
        eng.target().read().select("repo", "path", "content").toPandas()
    )
    assert got == oracle.state_hashes(oracle.reduce_wal(wal_pd))


def test_lww_winner_is_max_offset(spark):
    """Hand-built log: c@1, u@2, u@3 for one key -> winner offset 3; d@4 wins over all."""
    rows = [
        (1, "c", "k", 10),
        (2, "u", "k", 20),
        (3, "u", "k", 30),
    ]
    df = spark.createDataFrame(rows, "offset long, op string, repo string, x int")
    wal = df.select(
        "offset",
        (F.col("offset") * 1000).alias("ts_ms"),
        "op",
        "repo",
        F.lit("p").alias("path"),
        F.lit(None).cast(
            "struct<repo:string,path:string,commit:string,lang:string,content:string>"
        ).alias("before"),
        F.struct(
            F.col("repo"), F.lit("p").alias("path"), F.lit("c0").alias("commit"),
            F.lit("py").alias("lang"), F.concat(F.lit("v"), F.col("x")).alias("content"),
        ).alias("after"),
        F.lit(False).alias("is_tombstone"),
        F.lit(1).cast("long").alias("tx_id"),
        F.lit(1).alias("schema_version"),
    )
    env = E.wrap_wal(wal)
    a = R.resolve_lww(env).collect()
    assert len(a) == 1 and a[0]["action"] == "upsert"
    assert a[0]["_offset"] == 3 and a[0]["after"]["content"] == "v30"

    # add a delete at offset 4 -> action flips to delete
    wal_d = wal.unionByName(
        wal.limit(1).select(
            F.lit(4).cast("long").alias("offset"), F.lit(4000).cast("long").alias("ts_ms"),
            F.lit("d").alias("op"), "repo", "path",
            F.col("after").alias("before"),
            F.lit(None).cast(wal.schema["after"].dataType).alias("after"),
            F.lit(False).alias("is_tombstone"), F.col("tx_id"), F.col("schema_version"),
        )
    )
    a2 = R.resolve_lww(E.wrap_wal(wal_d)).collect()
    assert len(a2) == 1 and a2[0]["action"] == "delete" and a2[0]["_offset"] == 4


def test_lww_nonfinite_and_temporal_payload(spark):
    """Schema-evolved payloads can carry double/timestamp columns; a NaN/Infinity
    double must survive the LWW reduce verbatim (the old packed-JSON variant
    round-tripped the payload through to_json/from_json, where non-finite
    doubles produced unparseable JSON and PERMISSIVE parsing nulled the whole
    winner — silently upserting a null after-image)."""
    import math

    rows = [(1, "c", "r1", float("nan")), (2, "u", "r1", float("inf")),
            (1, "c", "r2", 1.5)]
    df = spark.createDataFrame(rows, "offset long, op string, repo string, score double")
    env = df.select(
        F.struct(F.col("repo"), F.lit("p").alias("path")).alias("key"),
        F.struct(
            F.struct(
                "repo", F.lit("p").alias("path"), F.col("score"),
                F.to_timestamp(F.lit("2026-01-02 03:04:05")).alias("mtime"),
            ).alias("after"),
            F.col("op").alias("op"),
            (F.col("offset") * 1000).alias("ts_ms"),
        ).alias("value"),
        F.col("offset"),
    )
    out = {r["repo"]: r for r in R.resolve_lww(env).collect()}
    assert out["r1"]["action"] == "upsert" and out["r1"]["after"] is not None
    assert math.isinf(out["r1"]["after"]["score"])  # winner = offset 2
    assert out["r1"]["_offset"] == 2
    assert out["r2"]["after"]["score"] == 1.5
    assert out["r2"]["after"]["mtime"] is not None


def test_transaction_metadata_ordering(spark):
    spec = W.WalSpec(n_keys=100, n_events=500, seed=9)
    wal = R.dedup_by_offset(W.wal_events(spark, spec).where("op != 'r'"))
    env = E.wrap_wal(wal)
    out = R.transaction_metadata(env)
    t = out.where(F.col("value").isNotNull()).select(
        "tx_id",
        "offset",
        F.col("value.transaction.id").alias("txid"),
        F.col("value.transaction.total_order").alias("to"),
    )
    assert t.where(F.col("txid").isNull()).count() == 0
    # total_order is 1..n within each tx and increases with offset
    agg = t.groupBy("tx_id").agg(
        F.count("*").alias("n"), F.max("to").alias("mx"), F.min("to").alias("mn")
    )
    assert agg.where("mx != n or mn != 1").count() == 0
    w = t.orderBy("tx_id", "offset").collect()
    last = {}
    for r in w:
        if r["tx_id"] in last:
            assert r["to"] == last[r["tx_id"]] + 1
        last[r["tx_id"]] = r["to"]


def test_lww_auto_bound_skips_probe(spark):
    """A free live-key upper bound under the budget proves ordinal is safe —
    no probe job, no persisted winner cache (auto costs what pinned ordinal
    costs on every batch that cannot exceed the broadcast limit)."""
    spec = W.WalSpec(n_keys=50, n_events=400, seed=5)
    env = R.split_pk_changes(_env(spark, spec))
    out = R.resolve_lww(
        env, strategy="auto", broadcast_key_budget=10_000, live_key_bound=800
    )
    assert out._lww_chosen == "ordinal"
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    # bound ABOVE the budget still probes (and here degrades: 50 keys > 10)
    probed = R.resolve_lww(
        env, strategy="auto", broadcast_key_budget=10, live_key_bound=999_999
    )
    assert probed._lww_chosen == "aggregate"
