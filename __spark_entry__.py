"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator from SURVEY.md §2 (Debezium's
operator inventory re-expressed Spark-first) or one training-data-pipeline
operator, over the driver's parquet tables; ``oracle_sql()`` holds the DuckDB
equivalent. Column names/aliases match exactly on both sides.

CDC mapping used on the `events` table (the WAL analogue):
  offset = event_id, key = user_id, op: signup->'c', error->'d', else 'u',
  tx_id = event_id div 8 (8-event transactions).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_spark.functions import dedup as DD
from debezium_spark.functions import text as TX

# ---------------------------------------------------------------- helpers

_OP_CASE_SQL = (
    "CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END"
)


def _op_col() -> F.Column:
    return (
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


# ---------------------------------------------------------------- CDC queries


def q_envelope_wrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/P5: WAL row -> envelope op + per-op before/after presence
    (Envelope.java:274-369: c->after, u->both, d->before)."""
    ev = _events(spark, sf_dir)
    op = _op_col()
    return ev.select(
        F.col("event_id").alias("offset"),
        op.alias("op"),
        F.col("user_id").alias("key_user"),
        F.when(op.isin("u", "d"), 1).otherwise(0).alias("has_before"),
        F.when(op.isin("c", "u", "r"), 1).otherwise(0).alias("has_after"),
    )


def q_lww_last_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core materialization: per-key last-writer-wins over the offset order, delete
    removes the key — the compacted-topic state (SURVEY.md §2.4). Drives the
    engine's shipped operator (operators/resolver.resolve_lww, default
    "ordinal" strategy): the winner ordinal is aggregated map-side (the
    hot-key answer), payload rows are broadcast-semi-filtered on it, and the
    final collapse shuffles at most one slim row per key — payload bytes
    shuffled scale with live keys, not events."""
    from debezium_spark.operators.resolver import ACTION_DELETE, resolve_lww

    ev = _events(spark, sf_dir)
    env = ev.select(
        F.struct(F.col("user_id")).alias("key"),
        F.struct(
            F.struct(F.col("event_type")).alias("after"),
            _op_col().alias("op"),
            F.lit(0).cast("long").alias("ts_ms"),
        ).alias("value"),
        F.col("event_id").alias("offset"),
    )
    res = resolve_lww(env, key_cols=("user_id",))
    return res.where(F.col("action") != ACTION_DELETE).select(
        "user_id",
        F.col("_offset").alias("last_offset"),
        F.col("after.event_type").alias("last_event_type"),
    )


def q_dedup_by_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-offset (restart re-delivery): double-deliver the log, dedup on
    offset, counts return to the originals (PostgresStreamingChangeEventSource
    LSN skip analogue)."""
    ev = _events(spark, sf_dir)
    doubled = ev.unionByName(ev)
    return (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_op_skip_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 skipped.operations: drop deletes ('d'), count per op."""
    ev = _events(spark, sf_dir).withColumn("op", _op_col())
    return ev.where(~F.col("op").isin("d")).groupBy("op").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_table_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 table.include.list regex filter (event_type stands in for table id)."""
    ev = _events(spark, sf_dir)
    return ev.where(F.col("event_type").rlike("^(click|view)$")).select(
        F.col("event_id").alias("offset"), F.col("event_type").alias("tbl")
    )


def q_column_mask_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 MaskStrings salted-SHA256 mode on the props column."""
    ev = _events(spark, sf_dir)
    return ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("offset"),
        F.sha2(F.concat(F.lit("s4lt:"), F.col("props")), 256).alias("props_masked"),
    )


def q_column_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 TruncateStrings: cap props at 8 chars."""
    ev = _events(spark, sf_dir)
    return ev.select(
        F.col("event_id").alias("offset"),
        F.substring(F.col("props"), 1, 8).alias("props_trunc"),
    )


def q_tombstone_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: every delete is followed by a (key, null) tombstone — emitted as a second
    row per 'd' event (EventDispatcher.java:408-420)."""
    ev = _events(spark, sf_dir).withColumn("op", _op_col())
    deletes = ev.where(F.col("op") == "d")
    main = deletes.select(
        F.col("event_id").alias("offset"),
        F.lit("delete").alias("kind"),
        F.col("user_id").alias("key_user"),
    )
    tombs = deletes.select(
        F.col("event_id").alias("offset"),
        F.lit("tombstone").alias("kind"),
        F.col("user_id").alias("key_user"),
    )
    return main.unionByName(tombs)


def q_pk_change_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: a key-changing UPDATE splits into DELETE(old key)+CREATE(new key)
    (RelationalChangeRecordEmitter.java:160-174). Purchases model key changes:
    new key = user_id + 1000000."""
    ev = _events(spark, sf_dir)
    split = ev.where(F.col("event_type") == "purchase")
    deletes = split.select(
        F.col("event_id").alias("offset"), F.lit(0).alias("seq"),
        F.lit("d").alias("op"), F.col("user_id").alias("key_user"),
    )
    creates = split.select(
        F.col("event_id").alias("offset"), F.lit(1).alias("seq"),
        F.lit("c").alias("op"), (F.col("user_id") + 1000000).alias("key_user"),
    )
    others = ev.where(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("offset"), F.lit(0).alias("seq"),
        _op_col().alias("op"), F.col("user_id").alias("key_user"),
    )
    return others.unionByName(deletes).unionByName(creates)


def q_tx_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16 TransactionMonitor: transaction{id, total_order} via ranking window."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).withColumn(
        "tx_id", (F.col("event_id") / 8).cast("long")
    )
    w = Window.partitionBy("tx_id").orderBy("event_id")
    return ev.select(
        F.col("event_id").alias("offset"),
        F.col("tx_id"),
        F.row_number().over(w).cast("long").alias("total_order"),
    )


def q_snapshot_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 snapshot markers first/true/last over a consistent scan of customer
    (RelationalSnapshotChangeEventSource.java:404-428). Row numbering is
    range-partitioned (sources/snapshot.ranged_row_number): parallel shuffles +
    a tiny per-partition-count collect, never the single-task
    Exchange SinglePartition a global Window.orderBy would cost at 100 TB."""
    from debezium_spark.sources.snapshot import ranged_row_number

    c = _customer(spark, sf_dir).select("c_custkey")
    numbered, total = ranged_row_number(c, ("c_custkey",))
    return numbered.select(
        "c_custkey",
        (
            F.when(F.col("_rn") == 1, "first")
            .when(F.col("_rn") == total, "last")
            .otherwise("true")
        ).alias("snapshot_marker"),
    )


def q_snapshot_select_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 snapshot.select.statement.overrides
    (RelationalSnapshotChangeEventSource.java:457-468): the initial snapshot
    scans only rows matching the per-table predicate; markers + dense offsets
    are assigned over the FILTERED scan (range-partitioned numbering — no
    single-task window)."""
    from debezium_spark.sources.snapshot import snapshot_events

    c = _customer(spark, sf_dir).select("c_custkey", "c_mktsegment")
    env = snapshot_events(
        c, key_cols=("c_custkey",), where="c_mktsegment = 'BUILDING'"
    )
    return env.select(
        F.col("offset"),
        F.col("key.c_custkey").alias("c_custkey"),
        F.col("value.source.snapshot").alias("snapshot_marker"),
    )


def q_incremental_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 DBLog window dedup: chunk rows whose key was touched by the concurrent
    stream are superseded (left-anti join) — customers with any 'F' order drop out
    of the chunk."""
    c = _customer(spark, sf_dir)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    touched = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    return c.join(F.broadcast(touched), "c_custkey", "left_anti").select(
        "c_custkey", "c_name"
    )


def q_unwrap_new_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 ExtractNewRecordState: flat after-image + __deleted flag."""
    ev = _events(spark, sf_dir).withColumn("op", _op_col())
    return ev.select(
        F.col("event_id").alias("offset"),
        F.col("user_id"),
        F.col("event_type"),
        (F.col("op") == "d").cast("int").alias("__deleted"),
    )


def _derived_wal_engine(spark: SparkSession, sf_dir: str, *, prefix: str):
    """Shared harness for the full-engine entries: derive a WAL from the
    events table (one c/u/d change per event, keyed by a synthetic repo+path),
    write it to a temp dir, and return a fresh CdcEngine over it."""
    import tempfile

    from debezium_spark import CdcEngine, EngineConfig

    ev = _events(spark, sf_dir).withColumn("op", _op_col())
    img = F.struct(
        F.concat(F.lit("r"), (F.col("user_id") % 31).cast("string")).alias("repo"),
        F.concat(F.lit("p"), F.col("user_id").cast("string")).alias("path"),
        F.lit("py").alias("lang"),
        F.concat(
            F.col("event_type"),
            F.lit(":"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").cast("string"),
        ).alias("content"),
    )
    wal = ev.select(
        F.col("event_id").alias("offset"),
        (F.col("event_id") * 10).cast("long").alias("ts_ms"),
        F.col("op"),
        img.getField("repo").alias("repo"),
        img.getField("path").alias("path"),
        F.when(F.col("op").isin("u", "d"), img).alias("before"),
        F.when(F.col("op") != "d", img).alias("after"),
        F.lit(False).alias("is_tombstone"),
        F.col("event_id").alias("tx_id"),
        F.lit(0).alias("schema_version"),
    )
    root = tempfile.mkdtemp(prefix=prefix)
    wal.repartition(4).write.mode("overwrite").parquet(os.path.join(root, "wal"))
    return CdcEngine(
        spark,
        EngineConfig(max_offsets_per_batch=4000),
        wal_path=os.path.join(root, "wal"),
        target_path=os.path.join(root, "target"),
        work_dir=os.path.join(root, "work"),
    )


def q_e2e_engine_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-engine end-to-end under the driver's hash gate: replay the derived
    WAL through the shipped CdcEngine (envelope wrap -> offset dedup ->
    ordinal LWW resolve -> bucket-pruned copy-on-write merge, 3 offset-range
    batches with lineage checkpoints), and return the final lake state.
    Oracle: per-key last-writer-wins window, deletes remove the key — the
    reference's golden-state replay-and-diff (ConnectorOutputTest) as a
    hash-checked driver entry."""
    eng = _derived_wal_engine(spark, sf_dir, prefix="dbz_e2e_entry_")
    eng.run()
    # Return the lake state straight off its kept parquet files — the "write
    # to a kept path" pattern. The earlier localCheckpoint(eager=True) copied
    # the FULL final state into executor block storage just to allow deleting
    # the temp dir early: harmless at gate scale, an anti-pattern at 100 TB.
    # The temp root is left for the OS tmp reaper (bounded: one sf0.01 state
    # per driver run).
    return eng.target().read().select("repo", "path", "content")


def q_stateful_lww_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-materialization end-to-end: the SAME derived WAL as
    cdc_e2e_engine_replay, driven through run_streaming_stateful — Structured
    Streaming file source, applyInPandasWithState per-key LWW against all
    history (streaming/stateful.py), changed-keys-only lake merge. The final
    lake state must hash-match the batch engine's oracle exactly: batch and
    continuous modes share one ordinal rule (offset*128+seq), so this entry
    pins their equivalence under the driver's gate."""
    eng = _derived_wal_engine(spark, sf_dir, prefix="dbz_stateful_entry_")
    eng.run_streaming_stateful(max_files_per_trigger=2)
    return eng.target().read().select("repo", "path", "content")


def q_lake_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake changelog scan (Iceberg incremental/changelog read analogue,
    plans/lake.py changes_between) under the hash gate: replay the derived
    WAL through the shipped engine in 4000-offset batches, then diff the
    first committed data snapshot against the final one — the c/u/d stream a
    downstream incremental consumer re-processes instead of re-reading the
    table. Bucket-pruned: only buckets the replay window rewrote are scanned
    or joined. Oracle: SQL state at the batch-1 watermark (offset <= 3999 —
    run() slices hi = committed(-1) + 4000) vs final state, diffed by
    liveness and winning offset."""
    eng = _derived_wal_engine(spark, sf_dir, prefix="dbz_changelog_entry_")
    eng.run()
    lake = eng.target()
    snaps = [s for s in lake.snapshots() if s["max_offset"] >= 0]
    diff = lake.changes_between(snaps[0]["version"])
    return diff.select(
        "repo",
        "path",
        "op",
        F.col("after").getField("content").alias("after_content"),
        F.col("_offset").alias("off"),
    )


def q_multi_table_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table dispatch + data-collections-routed incremental snapshot,
    end-to-end under the hash gate: one heterogeneous WAL (users + items
    derived from events), one shared signal file whose execute-snapshot
    addresses ONLY ["users"] (ExecuteSnapshot.java:48 routing). The users
    lake must show stream-LWW state for touched keys plus snapshot backfill
    for untouched source keys; the items lake must show stream state ONLY —
    a routing leak adds its source-only rows and fails the row count."""
    import tempfile

    from debezium_spark import EngineConfig, MultiTableEngine, TableSpec

    root = tempfile.mkdtemp(prefix="dbz_multi_snap_")
    ev = _events(spark, sf_dir)
    val = F.concat(
        F.col("event_type"),
        F.lit(":"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").cast("string"),
    )
    uoff = (F.col("event_id") * 2 + 2).cast("long")
    uw = ev.select(
        uoff.alias("offset"),
        (uoff * 10).cast("long").alias("ts_ms"),
        F.lit("c").alias("op"),
        F.lit("users").alias("table"),
        F.to_json(F.struct((F.col("user_id") % 40).alias("uid"))).alias("key_json"),
        F.lit(None).cast("string").alias("before_json"),
        F.to_json(
            F.struct((F.col("user_id") % 40).alias("uid"), val.alias("val"))
        ).alias("after_json"),
        F.lit(False).alias("is_tombstone"),
        F.col("event_id").cast("long").alias("tx_id"),
        F.lit(1).cast("int").alias("schema_version"),
    )
    ioff = (F.col("event_id") * 2 + 3).cast("long")
    iw = ev.where(F.col("event_id") % 3 == 0).select(
        ioff.alias("offset"),
        (ioff * 10).cast("long").alias("ts_ms"),
        F.lit("c").alias("op"),
        F.lit("items").alias("table"),
        F.to_json(F.struct((F.col("user_id") % 25).alias("item"))).alias("key_json"),
        F.lit(None).cast("string").alias("before_json"),
        F.to_json(
            F.struct((F.col("user_id") % 25).alias("item"), val.alias("val"))
        ).alias("after_json"),
        F.lit(False).alias("is_tombstone"),
        F.col("event_id").cast("long").alias("tx_id"),
        F.lit(1).cast("int").alias("schema_version"),
    )
    wal_dir = os.path.join(root, "wal")
    uw.unionByName(iw).repartition(4).write.mode("overwrite").parquet(wal_dir)
    # snapshot sources: users 0..59 (40..59 untouched by the stream -> must
    # backfill), items 100..110 (must NOT appear: snapshot not addressed)
    usrc = os.path.join(root, "usrc")
    spark.range(60).select(
        F.col("id").alias("uid"),
        F.concat(F.lit("SRC:"), F.col("id").cast("string")).alias("val"),
    ).write.mode("overwrite").parquet(usrc)
    isrc = os.path.join(root, "isrc")
    spark.range(100, 111).select(
        F.col("id").alias("item"),
        F.concat(F.lit("SRC:"), F.col("id").cast("string")).alias("val"),
    ).write.mode("overwrite").parquet(isrc)
    sig = os.path.join(root, "signals.jsonl")
    with open(sig, "w") as f:
        f.write(
            '{"type": "execute-snapshot", "data-collections": ["users"]}\n'
        )
    eng = MultiTableEngine(
        spark,
        EngineConfig(
            snapshot_mode="never", max_offsets_per_batch=8000, signal_path=sig
        ),
        wal_path=wal_dir,
        target_root=os.path.join(root, "targets"),
        work_root=os.path.join(root, "work"),
        tables={
            "users": TableSpec(
                payload_ddl="uid bigint, val string",
                key_columns=("uid",),
                snapshot_source=usrc,
            ),
            "items": TableSpec(
                payload_ddl="item bigint, val string",
                key_columns=("item",),
                snapshot_source=isrc,
            ),
        },
    )
    eng.run()
    u = eng.target("users").read().select(
        F.lit("users").alias("tbl"), F.col("uid").cast("long").alias("k"), "val"
    )
    i = eng.target("items").read().select(
        F.lit("items").alias("tbl"), F.col("item").cast("long").alias("k"), "val"
    )
    return u.unionByName(i)


def q_unwrap_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 ExtractNewRecordState full option surface through the shipped
    `envelope.unwrap` (ExtractNewRecordState.java:126-191): rewrite
    delete-handling (deletes flatten their BEFORE image instead of dropping),
    add.fields ('source.lsn' -> __source_lsn), add.headers ('op' ->
    __header_op), route.by.field ('event_type' -> __route), and tombstone
    dropping (delete companions with NULL value must vanish). The oracle is
    one row per event — any option regression changes rows or values."""
    from debezium_spark.functions import envelope as E

    ev = _events(spark, sf_dir).withColumn("op", _op_col())
    img = F.struct(F.col("event_type"), F.col("value"))
    env = ev.select(
        F.struct(F.col("user_id")).alias("key"),
        F.struct(
            F.when(F.col("op").isin("u", "d"), img).alias("before"),
            F.when(F.col("op") != "d", img).alias("after"),
            F.col("op").alias("op"),
            (F.col("event_id") * 10).cast("long").alias("ts_ms"),
            F.struct(F.col("event_id").alias("lsn")).alias("source"),
        ).alias("value"),
        F.col("event_id").alias("offset"),
    )
    tombs = env.where(F.col("value.op") == "d").select(
        "key",
        F.lit(None).cast(env.schema["value"].dataType).alias("value"),
        (F.col("offset") + 10_000_000).alias("offset"),
    )
    flat = E.unwrap(
        env.unionByName(tombs),
        delete_handling="rewrite",
        add_fields=["source.lsn"],
        add_headers=["op"],
        route_by_field="event_type",
    )
    return flat.select(
        F.col("__offset").alias("offset"),
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("val_c"),
        F.col("__op").alias("op"),
        F.col("__deleted").cast("int").alias("deleted"),
        F.col("__ts_ms").alias("ts_ms"),
        F.col("__source_lsn").alias("lsn"),
        F.col("__header_op").alias("header_op"),
        F.col("__route").alias("route"),
    )


def q_schema_evolution_nullfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.5 read-with-widest-schema: v1 rows (before the schema change offset) lack
    the `value` column and are NULL-filled on union (unionByName
    allowMissingColumns)."""
    ev = _events(spark, sf_dir)
    v1 = ev.where(F.col("event_id") < 5000).drop("value")
    v2 = ev.where(F.col("event_id") >= 5000)
    merged = v1.unionByName(v2, allowMissingColumns=True)
    # Fixed-point BIGINT (floor(x*100+0.5)) instead of decimal-from-double:
    # Spark HALF_UPs double->decimal casts while DuckDB rounds half-even, so a
    # decimal output column can never hash-match across engines.
    return merged.select(
        F.col("event_id").alias("offset"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("value_c"),
    )


def q_schema_evolution_drop_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableChanges drop/rename alignment (registry.align_envelope_columns,
    TableChanges.java:31-54,201-204): the physical payload is the union schema —
    rows before the rename offset populate only `value_old`, later rows only
    `value_new`; the alignment coalesces them under the new name and projects
    the dropped `props` column away. A broken alignment nulls half the rows."""
    from debezium_spark.plans.registry import align_envelope_columns

    ev = _events(spark, sf_dir)
    after = F.struct(
        F.when(F.col("event_id") < 5000, F.col("value")).alias("value_old"),
        F.when(F.col("event_id") >= 5000, F.col("value")).alias("value_new"),
        F.col("props").alias("props"),
    )
    env = ev.select(
        F.struct(F.col("user_id")).alias("key"),
        F.struct(
            F.lit(None).cast(
                "struct<value_old:double,value_new:double,props:string>"
            ).alias("before"),
            after.alias("after"),
            F.lit("u").alias("op"),
            F.lit(0).cast("long").alias("ts_ms"),
            F.lit(None).cast("string").alias("source"),
            F.lit(None).cast("string").alias("transaction"),
        ).alias("value"),
        F.col("event_id").alias("offset"),
    )
    aligned = align_envelope_columns(
        env, renames=[("value_old", "value_new")], drops=["props"]
    )
    n_fields = len(
        aligned.schema["value"].dataType["after"].dataType.fieldNames()
    )  # 1 after drop+rename collapse — emitted so the oracle checks the projection
    return aligned.select(
        "offset",
        F.floor(F.col("value.after.value_new") * 100 + F.lit(0.5))
        .cast("long")
        .alias("value_c"),
        F.lit(n_fields).alias("n_payload_fields"),
    )


def q_value_converters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 value converters (jdbc/JdbcValueConverters.java:100-136 temporal
    modes): Date -> epoch days, Timestamp -> epoch millis (connect mode) and
    micros (adaptive mode), ZonedTimestamp -> ISO-8601 UTC string. Decimal
    handling modes are covered by pytest (their cross-engine hash is
    representation-unstable by construction — that's the point of the modes)."""
    from debezium_spark.functions import converters as C

    ev = _events(spark, sf_dir)
    ts = F.col("ts")
    return ev.select(
        F.col("event_id").alias("offset"),
        C.epoch_days(ts).alias("d_days"),
        C.convert_timestamp(ts, "connect").alias("ts_ms_connect"),
        C.convert_timestamp(ts, "adaptive").alias("ts_us_adaptive"),
        C.zoned_iso(ts).alias("ts_iso"),
    )


def q_custom_converters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom converter plug-in chain (spi/converter/CustomConverter.java:18-47,
    CustomConverterRegistry.java:32,55-127): the first converter claiming a
    column wins, unclaimed columns fall through. Conversions are pure column
    algebra (a claim is evaluated once per column at plan-build time, JVM-side
    in the row path): a fixed-point plug-in claims the double 'value' column
    (-> BIGINT cents, the engine-portable representation), an upper-caser
    claims 'event_type', and a never-claiming plug-in ahead of both proves
    fall-through ordering."""
    from pyspark.sql import types as T

    from debezium_spark.functions.custom import (
        ConverterDefinition,
        CustomConverterRegistry,
    )

    def never_claims(col):
        return None

    def cents(col):
        if col.name == "value" and col.type_name == "double":
            return ConverterDefinition(
                field_type=T.LongType(),
                convert=lambda c: F.floor(c * 100 + F.lit(0.5)),
            )
        return None

    def upper_type(col):
        if col.name == "event_type":
            return ConverterDefinition(
                field_type=T.StringType(), convert=lambda c: F.upper(c)
            )
        return None

    reg = CustomConverterRegistry([never_claims, cents, upper_type])
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    out = reg.apply(ev, "lake.events")
    return out.select(
        F.col("event_id").alias("offset"),
        F.col("event_type"),
        F.col("value").alias("value_cents"),
    )


def q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics meters (pipeline/meters): events per type per hour window."""
    ev = _events(spark, sf_dir)
    from debezium_spark.streaming.windows import epoch_seconds

    return ev.groupBy(
        # session-tz-independent hour floor: epoch seconds div 3600 * 3600
        # (equals epoch(date_trunc('hour', ts)) for NTZ inputs on any driver)
        (F.floor(epoch_seconds(F.col("ts")) / 3600) * 3600)
        .cast("long")
        .alias("hour_epoch"),
        F.col("event_type"),
    ).agg(F.count(F.lit(1)).alias("n"))


def q_evt_windowed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window metrics (streaming/windows.py — the SAME
    column algebra runs streaming with a watermark, pytest-proven in
    tests/test_windows.py): per-(hour-window, event_type) counts + exact
    fixed-point value sums. One shuffle keyed on (window, type) with map-side
    partial agg; fixed-point so the sum is independent of partition summation
    order (a DOUBLE sum would not be exactly checkable)."""
    from debezium_spark.streaming.windows import (
        epoch_seconds,
        windowed_event_metrics,
    )

    return windowed_event_metrics(
        _events(spark, sf_dir),
        ts_col="ts",
        group_cols=("event_type",),
        window="1 hour",
        value_col="value",
    ).withColumn(
        # parquet ts is NTZ; wall-clock epoch is session-tz-independent and
        # matches DuckDB's epoch(time_bucket(...)) on any driver
        "window_start",
        epoch_seconds(F.col("window_start")),
    )


def q_evt_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (streaming/windows.sessionize — F.session_window, the
    Spark-native gap-based sessionization; streaming form emits a session
    when the watermark passes its end + gap, state bounded by OPEN sessions):
    per-user 30-minute-gap sessions with exact integer epoch-micro bounds.
    One shuffle keyed on (session_window, user) with map-side partial agg —
    no global sort, no per-user repartition of the world."""
    from debezium_spark.streaming.windows import sessionize

    return sessionize(
        _events(spark, sf_dir),
        ts_col="ts",
        key_cols=("user_id",),
        gap="30 minutes",
    )


def q_evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (streaming/windows.funnel): per-user
    view -> click -> purchase with strictly-after first-touch chaining.
    Step times are chained MIN windows all partitioned by user — ONE hash
    exchange total, every layer reuses the same partitioning, and only the
    len(steps)-row summary leaves the cluster."""
    from debezium_spark.streaming.windows import funnel_counts

    return funnel_counts(
        _events(spark, sf_dir),
        ("view", "click", "purchase"),
        ts_col="ts",
        key_cols=("user_id",),
        type_col="event_type",
    )


def q_evt_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier flags (windows.zscore_outliers): the test
    |x-mean| > 3*std evaluated as (n*v - S)^2 > 9*(n*SS - S^2) in exact
    DECIMAL(38,0)/HUGEINT integer algebra — no float mean/std whose
    accumulation order could flip a boundary row between engines. One
    map-side-combined stats groupBy broadcast back over the stream."""
    from debezium_spark.streaming.windows import zscore_outliers

    return zscore_outliers(
        _events(spark, sf_dir), value_col="value", group_cols=("event_type",)
    ).select("event_id", "event_type", "value_fp", "is_outlier")


def q_evt_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (functions/joins.asof_join — union-window form, ONE key
    exchange, no inequality join / BroadcastNestedLoopJoin): each purchase
    gets the user's latest STRICTLY-earlier view's value. Right-side
    (user, ts) ties collapse to max value pre-union; DuckDB's native ASOF
    LEFT JOIN is the oracle."""
    from debezium_spark.functions.joins import asof_join
    from debezium_spark.streaming.windows import epoch_us
    from debezium_spark.functions.similarity import scaled

    ev = _events(spark, sf_dir)
    left = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    j = asof_join(left, right, on=("user_id",), right_cols=("value",))
    return j.select(
        "event_id",
        "user_id",
        epoch_us(F.col("ts")).alias("ts_us"),
        epoch_us(F.col("ts_right")).alias("view_ts_us"),
        scaled(F.col("value_right")).alias("view_value_fp"),
    )


def q_evt_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join (functions/joins.interval_join — intervals explode
    to epoch buckets, points equi-join on their ONE bucket + containment
    filter; never a BroadcastNestedLoopJoin): attribute every event to its
    user's 30-minute session window from sessionize. Sessions of one user
    are disjoint, so each event lands in exactly one session."""
    from debezium_spark.functions.joins import interval_join
    from debezium_spark.streaming.windows import ntz_from_us, sessionize

    ev = _events(spark, sf_dir)
    sess = sessionize(ev, ts_col="ts", key_cols=("user_id",), gap="30 minutes")
    ivals = sess.select(
        "user_id",
        # NTZ bounds (ntz_from_us): timestamp_micros would give session-zoned
        # TIMESTAMPs that shift against the NTZ point column off-UTC
        ntz_from_us(F.col("session_start_us")).alias("s_start"),
        ntz_from_us(F.col("session_end_us")).alias("s_end"),
        "session_start_us",
    )
    j = interval_join(
        ev.select("event_id", "user_id", "ts"),
        ivals,
        on=("user_id",),
        point_ts="ts",
        start_col="s_start",
        end_col="s_end",
        bucket_seconds=1800,
    )
    return j.select("event_id", "user_id", "session_start_us")


def q_evt_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle (streaming/windows.retention_cohorts):
    daily cohorts by first event, distinct-active per later day. Exact
    integer period indexing (floor epoch/period — no calendar functions,
    whose week conventions differ across engines); every shuffle carries
    (key, int) pairs, the distinct collapse runs before the join."""
    from debezium_spark.streaming.windows import retention_cohorts

    return retention_cohorts(
        _events(spark, sf_dir), ts_col="ts", key_cols=("user_id",),
        period_seconds=86_400,
    )


def q_doc_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language top-5 tokens (sketches.heavy_hitters): the skew
    probe run before any token-keyed join. Map-side-combined count shuffle
    sized by vocabulary, bounded rank window per group."""
    from debezium_spark.functions.sketches import heavy_hitters

    d = _docs(spark, sf_dir)
    t = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = d.select(
        "lang", F.explode(F.filter(F.split(t, r"\s+"), lambda x: x != "")).alias("tok")
    )
    return heavy_hitters(toks, "tok", k=5, group_cols=("lang",))


def q_doc_cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language HLL distinct-token estimates (sketches.cardinality_
    sketches — Apache DataSketches HLL via hll_sketch_agg, lg_k=12): the
    shuffle carries 4 KB mergeable sketches, never distinct values. The
    estimate itself cannot be hash-gated (DuckDB's HLL is a different
    implementation), so the gate holds the DETERMINISTIC contract instead:
    per lang, the exact distinct count plus `within_bound` — the published
    DataSketches accuracy law |est − exact| ≤ 4·(1.04/√2^lg_k)·exact
    (±6.5% at lg_k=12; HLL register state is order-independent, so the 0/1
    outcome is deterministic). 4σ rather than 3σ: for FIXED data the gate is
    deterministic either way, but at a fresh SF/dataset each group's fixed
    estimate has ~0.3% odds of landing outside 3σ — a red row with no code
    defect; 4σ cuts that to ~6e-5 while still pinning the estimator to the
    published law. The oracle recomputes the exact side and asserts the
    bound always holds. Mergeability stays pytest-pinned."""
    from debezium_spark.functions.sketches import cardinality_sketches

    d = _docs(spark, sf_dir)
    t = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = d.select(
        "lang", F.explode(F.filter(F.split(t, r"\s+"), lambda x: x != "")).alias("tok")
    )
    est = cardinality_sketches(toks, "tok", group_cols=("lang",)).select(
        "lang", "distinct_estimate"
    )
    exact = toks.groupBy("lang").agg(
        F.count_distinct(F.col("tok")).alias("exact_distinct")
    )
    bound = 4 * 1.04 / (2**12) ** 0.5
    return est.join(exact, "lang").select(
        "lang",
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        (
            F.abs(F.col("distinct_estimate") - F.col("exact_distinct"))
            <= F.lit(bound) * F.col("exact_distinct")
        )
        .cast("int")
        .alias("within_bound"),
    )


def q_doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (dedup.winnow_fingerprints — MOSS, SIGMOD'03):
    min-hash of every sliding window of 4 consecutive 5-gram hashes; any
    shared >=8-word substring leaves a shared fingerprint while only
    ~2/5 of the gram hashes are kept. Pure per-row array algebra, zero
    shuffles before the final explode."""
    return DD.winnow_fingerprints(_docs(spark, sf_dir), k=5, window=4)


def q_doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-copy pairs over winnowed fingerprints
    (dedup.winnow_shared_pairs): inverted-index join on the winnowed subset
    with the same max_doc_freq posting cap as ngram_jaccard — candidates
    never explode quadratically on a boilerplate fingerprint."""
    return DD.winnow_shared_pairs(
        _docs(spark, sf_dir), k=5, window=4, min_shared=2
    )


def q_doc_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocations (text.pmi_bigrams — the word2phrase pass): top-50
    bigrams by ppm-quantized pointwise mutual information, min_count=3
    noise floor. Vocab-sized joins only; corpus-sized paths are two
    map-side-combined count shuffles; TakeOrdered top-k."""
    return TX.pmi_bigrams(_docs(spark, sf_dir), min_count=3, k=50)


def q_doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document (text.tfidf_top_terms): exact
    fixed-point scoring — idf quantized to ppm once per TERM on the
    vocabulary-sized frame, score = tf * idf_ppm an exact BIGINT, ties by
    (score desc, term asc). Two map-side-combined shuffles (doc-term tf,
    term df), a term-keyed join, and a bounded per-doc rank window — no
    global sort, no float accumulation in the row path."""
    return TX.tfidf_top_terms(_docs(spark, sf_dir), k=3)


def q_doc_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle (text.shuffle_order):
    contiguous 1-based rank in portable-hash order. Scale-safe numbering via
    the snapshot source's range-partitioned row numbering — one
    rangepartitioning exchange, windows only within partitions, NEVER a
    SinglePartition global window."""
    return TX.shuffle_order(_docs(spark, sf_dir)).select(
        "doc_id", "shuffle_rank"
    )


def q_doc_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter verdicts (text.gopher_filter — Rae et al. 2021
    table A1): every rule evaluated as exact integer cross-multiplication
    (no float ratio anywhere), per-row array algebra + repetition_stats'
    count aggregations for the top-2-gram rule. min_words lowered to 10 at
    this SF so both verdicts appear in the gate's output."""
    return TX.gopher_filter(_docs(spark, sf_dir), min_words=10)


def q_doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (text.dsir_weights, arXiv:2302.03169):
    log-likelihood ratio of the lang='en' target distribution vs the raw
    corpus over 1024 hashed unigram buckets, Laplace-smoothed; per-bucket
    log-ratios quantized to ppm on the <=1024-row bucket frame so each
    document's weight is an exact BIGINT sum. One corpus-sized shuffle
    (bucket counts) + one broadcast lookup + one groupBy(doc) sum."""
    return TX.dsir_weights(
        _docs(spark, sf_dir), F.col("lang") == "en", buckets=1024
    )


def q_content_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 content-based router: expression -> route."""
    ev = _events(spark, sf_dir)
    return ev.select(
        F.col("event_id").alias("offset"),
        F.when(F.col("value") >= 150, "hot").otherwise("cold").alias("route"),
    )


def q_logical_table_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 ByLogicalTableRouter: regex-merge sharded names, keep physical id."""
    ev = _events(spark, sf_dir)
    shard = F.concat(
        F.lit("shard_"), F.pmod(F.col("user_id"), F.lit(4)).cast("string"),
        F.lit("."), F.col("event_type"),
    )
    return ev.select(
        F.col("event_id").alias("offset"),
        shard.alias("physical_table"),
        F.regexp_replace(shard, r"^shard_[0-9]+\.", "all_shards.").alias("logical_table"),
    )


# ------------------------------------------------------- training-data queries


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keeper doc per normalized-content sha256 digest."""
    d = _docs(spark, sf_dir)
    return DD.exact_dedup(d).select(
        F.col("_digest").alias("digest"), F.col("doc_id"), F.col("dup_count")
    )


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces per document."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace/punctuation-normalized text."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.md5(DD.normalize_text(F.col("text"))).alias("fp")
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring components as exact integers (x10 to avoid float drift):
    length band, punctuation band, stopword presence."""
    d = _docs(spark, sf_dir)
    c = F.col("text")
    n_chars = F.length(F.coalesce(c, F.lit("")))
    len_ok = (
        F.when((n_chars >= 200) & (n_chars <= 20000), 10)
        .when(n_chars > 0, 5)
        .otherwise(0)
    )
    p = TX.punct_ratio(c)
    punct_ok = F.when((p >= 0.005) & (p <= 0.2), 10).otherwise(5)
    s = TX.stopword_ratio(c)
    sw_ok = F.when(s >= 0.1, 10).when(s > 0, 5).otherwise(0)
    return d.select(
        "doc_id",
        len_ok.alias("len_score"),
        punct_ok.alias("punct_score"),
        sw_ok.alias("stopword_score"),
    )


def q_doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram heuristic; compared against the table's labeled lang for
    en/de/fr/es rows (zh has no markers -> excluded both sides)."""
    d = _docs(spark, sf_dir).where(F.col("lang").isin("en", "de", "fr", "es"))
    return d.select("doc_id", TX.language_guess(F.col("text")).alias("lang_guess"))


def q_doc_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash band keys (portable string-min variant): per doc, min over 3-gram
    shingles of md5(perm:shingle), for 4 permutations — the LSH bucketing step."""
    d = _docs(spark, sf_dir)
    # Explode shingles then groupBy-min: the shingle expression is evaluated once
    # per doc (not once per output column), and min() partial-aggregates map-side
    # so the shuffle carries ~4 hashes per (doc, partition) — scale-safe.
    ex = d.select("doc_id", F.explode(DD.shingles(F.col("text"), 3)).alias("g"))
    return ex.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{p}:"), F.col("g")))).alias(f"mh{p}")
            for p in range(4)
        ]
    )


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 60-bit fingerprint per document (near-dup dedup building block)."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", DD.simhash(F.col("text")).alias("sig"))


def q_doc_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash+LSH near-dup detection (signature -> bands -> bucket join
    -> estimate): pairs sharing any of 4 bands over a 16-perm signature, with
    the estimated Jaccard reported as the exact agreement count (int — no
    float representation to drift). Candidate generation is the banded bucket
    join (never all-pairs); at 100 TB the band keys partition the shuffle and
    ``max_band_freq`` caps per-bucket population so one degenerate band key
    (boilerplate cluster) cannot emit k² candidates — non-binding at this SF
    (all sf0.01 texts are distinct; buckets are tiny), so the oracle needs no
    mirror of the cap."""
    d = _docs(spark, sf_dir)
    pairs = DD.minhash_lsh_dedup(
        d, n=3, num_perm=16, bands=4, jaccard_threshold=0.25, max_band_freq=256
    )
    return pairs.select(
        "id_a", "id_b",
        F.round(F.col("est_jaccard") * 16).cast("int").alias("n_agree"),
    )


def q_doc_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: Hamming distance <= 3 on the 60-bit signature,
    candidates from Manku-style block permutation (6 blocks of 10 bits; within
    Hamming 3 the signatures must agree on >= 3 of 6 blocks, probed as
    C(6,3)=20 tables keyed by the 30-bit 3-block concatenation) — a bucket
    equi-join with a ~2^30 key space, never a cross product and never the
    2^15-key floor of single-chunk pigeonhole. Exact for k<=3, so the
    popcount-verified result set is unchanged vs the r2 scheme and the
    all-candidates DuckDB oracle."""
    d = _docs(spark, sf_dir)
    pairs = DD.simhash_near_dups(d, max_hamming=3)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.1) via inverted-index
    candidate join with posting lists capped at doc-freq 256 (skew guard: a
    shingle shared by k docs otherwise yields k^2 candidates); similarity
    reported as fixed-point 1e-4 BIGINT (engine-portable, see dedup docstring)."""
    d = _docs(spark, sf_dir)
    pairs = DD.ngram_jaccard_pairs(d, threshold=0.1, max_doc_freq=256)
    return pairs.select(
        "id_a", "id_b",
        F.floor(F.col("jaccard") * 10000 + F.lit(0.5)).cast("long").alias("jac_c"),
    )


def q_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: the step after pair detection — near-dup relations
    are not transitive, so the keep-one rule operates on connected components
    of the pair graph (dedup.connected_components: distributed min-label
    propagation, eager-checkpointed rounds; see its scale docstring). Pairs =
    the exact 3-gram Jaccard operator at threshold 0.1; output = per-doc
    component id (= smallest doc id = keep-representative) + cluster size,
    checked against a DuckDB recursive-CTE reachability oracle."""
    from debezium_spark.functions.dedup import dup_clusters

    d = _docs(spark, sf_dir)
    pairs = DD.ngram_jaccard_pairs(d, threshold=0.1, max_doc_freq=256).select(
        "id_a", "id_b"
    )
    return dup_clusters(pairs).select(
        F.col("id").alias("doc_id"), "component", "cluster_size"
    )


def q_doc_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing (the sharded-corpus writer's streaming-pack
    rule): shard_id = running_token_offset // budget in doc_id order. The
    global prefix sum runs as the two-pass distributed scan
    (text.pack_shards: range-partition + per-partition window + broadcast
    base offsets) — never Window.orderBy's Exchange SinglePartition. Oracle:
    DuckDB's serial cumulative sum."""
    from debezium_spark.functions.text import pack_shards

    return pack_shards(
        _docs(spark, sf_dir), tokens_per_shard=500, partitions=8
    )


def q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021 table A1): duplicate-word
    mass + most frequent word / word-2-gram per doc, as exact integers (the
    float thresholds are the caller's). Two (doc, token)-keyed map-side
    combining groupBys + a per-doc window over the slim counts."""
    return TX.repetition_stats(_docs(spark, sf_dir))


def q_doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc exact span dedup (C4 §2.2's span dedup with fixed 16-word
    windows): keep the globally first occurrence of every span, re-assemble
    docs. One shuffle keyed on the span, first-occurrence = min (doc, idx)."""
    return DD.dedup_spans(_docs(spark, sf_dir), span_words=16)


def q_cdc_handling_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-wide value handling modes (JdbcValueConverters.java:73-136,
    CommonConnectorConfig BinaryHandlingMode): decimal string mode, temporal
    adaptive (epoch micros) / connect (epoch millis) / date (epoch days), and
    binary base64 + lowercase hex — all pure codegen'd column algebra over
    the orders scan. (Decimal double mode is pytest-covered instead: DuckDB's
    own decimal->double conversion is quantized differently, so it can't
    serve as the oracle for a value both engines compute correctly.)"""
    from debezium_spark.functions.converters import (
        convert_binary,
        convert_decimal,
        convert_timestamp,
        epoch_days,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderkey") % 37 == 0
    )
    dec = F.concat(F.col("o_orderkey").cast("string"), F.lit(".25")).cast(
        "decimal(38,18)"
    )
    bin_ = F.unhex(F.md5(F.col("o_orderkey").cast("string")))
    return o.select(
        "o_orderkey",
        convert_decimal(dec, "string").alias("price_str"),
        convert_timestamp(F.col("o_orderdate"), "adaptive").alias("ts_micros"),
        convert_timestamp(F.col("o_orderdate"), "connect").alias("ts_millis"),
        epoch_days(F.col("o_orderdate")).alias("date_days"),
        convert_binary(bin_, "base64").alias("bin_b64"),
        convert_binary(bin_, "hex").alias("bin_hex"),
    )


def q_doc_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality classifier (sigmoid of mean token
    weight) with the deterministic hash-derived weight table. Pure per-row
    higher-order array algebra — zero shuffles; the token aggregation is an
    exact integer sum so Spark's array fold and DuckDB's row sum agree
    bit-for-bit."""
    from debezium_spark.functions.text import classifier_score

    return (
        classifier_score(_docs(spark, sf_dir))
        .where(F.col("lm_quality").isNotNull())
        .select("doc_id", "lm_quality")
    )


def q_doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language quota sampling: the 25 smallest salted-hash docs per
    lang stratum (corpus-mixing primitive). Pass 1 derives per-stratum hash
    thresholds from map-side-combined counts so the ranking window sorts only
    ~margin*k survivors per stratum, never a whole skewed stratum."""
    from debezium_spark.functions.text import stratified_sample

    return stratified_sample(_docs(spark, sf_dir), "lang", 25).select(
        "doc_id", "lang", "sample_rank"
    )


def q_doc_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-mod corpus sampling at 20% (200000 ppm): md5-bucket
    filter, reproducible and re-partition-stable, zero shuffle."""
    return TX.hash_sample(_docs(spark, sf_dir), rate_ppm=200_000).select(
        "doc_id", "sample_bucket"
    )


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C): docs with
    doc_id % 97 == 0 play the eval set; every remaining doc sharing any
    8-word shingle with it is flagged. Eval shingles broadcast (tiny side);
    the corpus probe is a broadcast hash join — zero corpus shuffle."""
    d = _docs(spark, sf_dir)
    return DD.decontaminate(
        d.where(F.col("doc_id") % 97 != 0),
        d.where(F.col("doc_id") % 97 == 0),
        ngram_words=8,
    )


def q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: redact emails + phone-shaped numbers, count redactions.
    The corpus is synthetic word soup with no real PII, so the entry injects
    one deterministic email + phone per doc (the SAME expression in the
    oracle) and the scrub must remove exactly those."""
    d = _docs(spark, sf_dir)
    injected = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return TX.scrub_pii(
        d.select("doc_id", injected.alias("text"))
    )


def q_emb_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (the scale path): sign-LSH over 8 hyperplanes, multi-probe
    Hamming<=1, cosine top-10 for vec_id=0's embedding. At scale the bucket column
    is materialized + partition-pruned; here the filter prunes candidates.
    order_scale=1e4 ranks by the fixed-point score so the selected rows are
    deterministic across engines with different float-summation order."""
    from debezium_spark.functions.similarity import lsh_topk, scaled

    v = _emb(spark, sf_dir)
    query = [float(x) for x in v.where("vec_id = 0").first()["embedding"]]
    topk = lsh_topk(v, query, k=10, planes=8, probe_hamming=1, order_scale=10000)
    return topk.select("vec_id", scaled(F.col("cos_sim")).alias("cos_c"))


def q_emb_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: 10 nearest to vec_id=0's embedding; similarity
    as fixed-point 1e-4 BIGINT (floor(x*1e4+0.5) — portable, unlike
    double->decimal casts whose rounding mode differs across engines)."""
    from debezium_spark.functions.similarity import brute_force_topk, scaled

    v = _emb(spark, sf_dir)
    query = [float(x) for x in v.where("vec_id = 0").first()["embedding"]]
    topk = brute_force_topk(v, query, k=10, order_scale=10000)
    return topk.select("vec_id", scaled(F.col("cos_sim")).alias("cos_c"))


def q_emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (the partition-pruned scale path alongside sign-LSH): coarse
    cells = 32 TRAINED centroids — ivf_topk's default quantizer is now the
    exact fixed-point k-means over a bounded id-pruned sample (2 Lloyd
    rounds; untrained first-N cells skew probe populations at 10^9
    vectors), and because the training is scaled-BIGINT exact, the oracle
    replays the SAME two rounds in unrolled SQL and hash-gates the trained
    index end-to-end. Probe the 4 cells nearest vec_id=0's embedding
    (12.5% probe fraction — the sqrt(N) sizing rule at this SF); exact
    cosine top-10 within the probed cells. At 100 TB the table is written
    partitioned by ivf_cell, so a probe is a 4-partition read. All ranking
    is fixed-point (1e-4) with id tie-breaks."""
    from debezium_spark.functions.similarity import ivf_topk, scaled

    v = _emb(spark, sf_dir)
    query = [float(x) for x in v.where("vec_id = 0").first()["embedding"]]
    topk = ivf_topk(v, query, k=10, n_cells=32, nprobe=4, order_scale=10000)
    return topk.select(
        "vec_id", "ivf_cell", scaled(F.col("cos_sim")).alias("cos_c")
    )


def q_emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-10 (similarity.pq_topk — Jegou TPAMI
    2011, the compression half of IVF-PQ): 64-dim vectors encoded as 4
    packed 4-bit codes against TRAINED codebooks — per-subspace exact
    integer k-means over the id-pruned sample (pq_train_codebooks, 2 Lloyd
    rounds; head-row codebooks cover only the head's corner of the space).
    The training is scaled-BIGINT exact, so the oracle replays the same
    rounds in unrolled SQL and hash-gates the trained index. The query's
    m x ks scaled-integer ADC table ships as plan literals, so the search
    scan reads only the 2-byte code — the 128x-compression trick that
    makes 10^10-vector ANN feasible. Scores are exact BIGINT sums (no
    float in the row path); TakeOrdered top-k."""
    from debezium_spark.functions.similarity import pq_topk, pq_train_codebooks

    v = _emb(spark, sf_dir)
    cbs = pq_train_codebooks(v, m=4, ks=16, iterations=2)
    query = [float(x) for x in v.where("vec_id = 0").first()["embedding"]]
    return pq_topk(v, query, cbs, k=10)


def q_emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-10 (similarity.ivf_pq_topk — FAISS IVFPQ / Jegou
    TPAMI 2011 §IV, the canonical 10^10-vector index): coarse cells from
    the trained exact fixed-point k-means (32 cells, 2 Lloyd rounds over
    the id-pruned sample), PQ codebooks from the exact integer k-means per
    subspace over the sample's RESIDUALS w.r.t. their assigned cells, then
    probe the 8 cells nearest vec_id=0's embedding and ADC-score only the
    probed candidates. Every training and scoring step quantizes to scaled
    BIGINTs before any argmin/argmax, so the whole trained index — coarse
    training, residual codebook training, assignment, probe set, packed
    codes, ADC sums — replays exactly in the unrolled SQL oracle. At scale:
    IVF prunes the scan to ~nprobe/n_cells (partition pruning when written
    by ivf_cell), PQ shrinks the probed read to 2 bytes/vector."""
    from debezium_spark.functions.similarity import ivf_pq_topk

    v = _emb(spark, sf_dir)
    query = [float(x) for x in v.where("vec_id = 0").first()["embedding"]]
    return ivf_pq_topk(v, query, k=10, n_cells=32, nprobe=8, m=4, ks=16)


def q_emb_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs above cosine 0.3 via the LSH-bucketed self-join
    (similarity.embedding_near_dups): pairs are scored only inside a shared
    sign-LSH bucket — O(sum bucket^2) candidates, never the O(n^2) cross product
    a naive pair join would cost at 100 TB. Threshold applied on the fixed-point
    score (cos_c >= 3000) so the boundary is engine-portable; the library
    pre-filter at 0.29 can only drop pairs already below the reported band."""
    from debezium_spark.functions.similarity import embedding_near_dups, scaled

    v = _emb(spark, sf_dir)
    pairs = embedding_near_dups(v, cosine_threshold=0.29, planes=8)
    return pairs.select(
        "id_a", "id_b", scaled(F.col("cos_sim")).alias("cos_c")
    ).where(F.col("cos_c") >= 3000)


def q_emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup over the embedding column.
    LSH-bucketed cosine pairs (never all-pairs) -> connected components over
    the pair graph (min-label propagation) -> keep one exemplar (min id) per
    component. Every vec_id comes back with (component, kept); where(kept) is
    the deduplicated corpus. Pair boundary on the fixed-point score
    (cos_c >= 3000) so component membership is engine-portable."""
    from debezium_spark.functions.similarity import (
        embedding_near_dups,
        scaled,
        semantic_dedup,
    )

    v = _emb(spark, sf_dir)
    pairs = embedding_near_dups(v, cosine_threshold=0.29, planes=8).where(
        scaled(F.col("cos_sim")) >= 3000
    )
    return semantic_dedup(v, pairs=pairs).select(
        "vec_id", "component", "kept"
    )


def q_doc_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataset mixing (GPT-3/Pile-style per-source epoch
    weights): en x2.4, de x1.0, es x0.6, fr x0.25, zh dropped. floor(w) full
    copies per doc via codegen'd explode(sequence) + the frac(w) fraction
    chosen by the shared portable hash — reproducible, re-partition-stable,
    ppm-exact thresholds (no float boundary)."""
    from debezium_spark.functions.text import mix_sources

    mixed = mix_sources(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        {"en": 2.4, "de": 1.0, "es": 0.6, "fr": 0.25},
        source_col="lang",
    )
    return mixed.select(
        "doc_id", "lang", F.col("epoch").cast("long").alias("epoch")
    )


def q_doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (text.chunk_documents): 64-token windows with
    stride 32 (BERT-style sliding overlap). Split once, posexplode the window
    starts, slice per window — codegen'd row expansion, zero shuffle, no
    Python in the row path."""
    from debezium_spark.functions.text import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=64, stride=32
    ).select("doc_id", "chunk_id", "n_tokens", "chunk_text")


def q_tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary with exact integer-cents arithmetic:
    quantity/price/discount are quantized to BIGINT hundredths up front
    (exact — TPC-H money columns carry 2 decimal digits), so every sum is pure
    int64 math, overflow-safe to ~10^18 (sf100k), and bit-identical across
    engines. sum_disc_price_c is in 1e-4 units (cents x (100 - discount_c))."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty_c = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    ep_c = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    disc_c = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("sum_qty_c"),
            F.sum(ep_c).alias("sum_base_price_c"),
            F.sum(ep_c * (F.lit(100) - disc_c)).alias("sum_disc_price_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_column_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 column.exclude.list (TableSchemaBuilder.java:122-146): drop the
    `props` payload field from both images; key columns always survive."""
    from debezium_spark.functions.transforms import project_columns

    ev = _events(spark, sf_dir)
    env = ev.select(
        F.struct(F.col("user_id")).alias("key"),
        F.struct(
            F.lit(None).cast(
                "struct<user_id:bigint,event_type:string,props:string>"
            ).alias("before"),
            F.struct(F.col("user_id"), F.col("event_type"), F.col("props")).alias("after"),
            F.lit("c").alias("op"),
            F.lit(0).cast("long").alias("ts_ms"),
            F.lit(None).cast("string").alias("source"),
            F.lit(None).cast("string").alias("transaction"),
        ).alias("value"),
        F.col("event_id").alias("offset"),
    )
    pruned = project_columns(env, None, ["props"], key_cols=("user_id",))
    n_fields = len(pruned.schema["value"].dataType["after"].dataType.fieldNames())
    return pruned.select(
        "offset",
        F.col("value.after.user_id").alias("user_id"),
        F.col("value.after.event_type").alias("event_type"),
        F.lit(n_fields).alias("n_payload_fields"),
    )


def q_topic_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 DefaultTopicNamingStrategy (AbstractTopicNamingStrategy.java:89-125):
    topic = prefix.db.table with non-alphanumerics sanitized to '_'."""
    from debezium_spark.functions.transforms import topic_name

    ev = _events(spark, sf_dir).select(
        F.col("event_id").alias("offset"),
        F.concat(F.col("event_type"), F.lit("/v1")).alias("tbl"),
    )
    named = topic_name(ev, prefix="repos", db_col=F.lit("lake"), table_col="tbl")
    return named.select("offset", "topic")


def q_message_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logical decoding messages (pg_logical_emit_message): click events
    re-cast as MESSAGE('m') envelopes — key = struct{prefix}, value carries a
    message{prefix, content} block and NO before/after image, routed to the
    '<server>.message' topic, prefix-filtered by the include regex
    (LogicalDecodingMessageMonitor.java:43-96,100-115;
    LogicalDecodingMessageFilter.java:22-31)."""
    from debezium_spark.functions.envelope import wrap_messages

    ev = _events(spark, sf_dir).where(F.col("event_type") == "click")
    msgs = wrap_messages(
        ev,
        prefix=F.concat(F.lit("ch"), (F.col("user_id") % 8).cast("string")),
        content=F.col("props"),
        offset=F.col("event_id"),
        ts_ms=(F.col("event_id") * 10).cast("long"),
        prefix_include="^ch[0-3]$",
        server_name="repos",
    )
    return msgs.select(
        "offset",
        "topic",
        F.col("key.prefix").alias("key_prefix"),
        F.col("value.op").alias("op"),
        F.col("value.message.prefix").alias("msg_prefix"),
        F.col("value.message.content").alias("msg_content"),
        F.col("value.ts_ms").alias("ts_ms"),
    )


def q_heartbeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15 heartbeat records (HeartbeatImpl.java:30-69,111-124): at most one
    record per elapsed interval on the '__debezium-heartbeat.<server>' topic,
    key = struct{serverName}, value = struct{ts_ms}; batch analogue emits one
    row per interval window the stream advanced through, carrying the
    window's max ts/offset."""
    from debezium_spark.functions.transforms import heartbeat_records

    ev = _events(spark, sf_dir).select(
        F.col("event_id").alias("offset"),
        (F.col("event_id") * 10).cast("long").alias("ts_ms"),
    )
    hb = heartbeat_records(ev, interval_ms=1000, server_name="repos")
    return hb.select(
        "topic",
        F.col("key.serverName").alias("server_name"),
        F.col("value.ts_ms").alias("ts_ms"),
        "offset",
    )


def q_outbox_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 outbox EventRouter: route by aggregate type, key by aggregate id,
    extract payload (transforms/outbox/EventRouter.java)."""
    from debezium_spark.functions.transforms import outbox_route

    ev = _events(spark, sf_dir).select(
        F.col("event_id").alias("offset"),
        F.col("event_type").alias("aggregatetype"),
        F.col("user_id").alias("aggregateid"),
        F.col("props").alias("payload"),
    )
    routed = outbox_route(ev)
    return routed.select(
        "topic", F.col("key").alias("agg_key"), F.col("value").alias("payload")
    )


def q_content_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 scripting Filter SMT: drop records where the expression is false."""
    from debezium_spark.functions.transforms import content_filter

    ev = _events(spark, sf_dir)
    kept = content_filter(ev, "value >= 100 AND event_type <> 'error'")
    return kept.select(F.col("event_id").alias("offset"), "event_type")


def q_tx_commit_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 tx look-ahead buffer (EventBuffer.java:21-45): events of transactions
    with no commit marker (here: no 'click' in the tx) are dropped via a
    broadcast semi-join against the committed-tx set."""
    from debezium_spark.operators.resolver import committed_tx_filter

    ev = _events(spark, sf_dir).withColumn(
        "tx_id", (F.col("event_id") / 8).cast("long")
    )
    commits = ev.where(F.col("event_type") == "click").select("tx_id")
    kept = committed_tx_filter(ev, commits)
    return kept.select(F.col("event_id").alias("offset"), "tx_id")


def q_snapshot_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 DBLog keyset chunking lineage: 1024-row chunks over the pk order with
    per-chunk bounds — the resumable chunk-position model
    (AbstractIncrementalSnapshotChangeEventSource.java:199-259)."""
    from debezium_spark.sources.snapshot import ranged_row_number

    c = _customer(spark, sf_dir).select("c_custkey")
    numbered, _ = ranged_row_number(c, ("c_custkey",))
    chunked = numbered.select(
        "c_custkey", ((F.col("_rn") - 1) / 1024).cast("long").alias("chunk_id")
    )
    return chunked.groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )


def q_cloudevents_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P19 CloudEvents converter: envelope -> CE JSON; attributes extracted back
    out of the JSON to prove the serialization round-trips."""
    from debezium_spark.functions.converters import epoch_millis
    from debezium_spark.functions.transforms import to_cloudevents

    ev = _events(spark, sf_dir)
    env = ev.select(
        F.struct(F.col("user_id").alias("user_id")).alias("key"),
        F.struct(
            _op_col().alias("op"), epoch_millis(F.col("ts")).alias("ts_ms")
        ).alias("value"),
        F.col("event_id").alias("offset"),
    )
    ce = to_cloudevents(env)
    return ce.select(
        "offset",
        F.get_json_object("cloudevent", "$.id").alias("ce_id"),
        F.get_json_object("cloudevent", "$.type").alias("ce_type"),
        F.get_json_object("cloudevent", "$.specversion").alias("ce_spec"),
        F.get_json_object("cloudevent", "$.datacontenttype").alias("ce_dct"),
        F.get_json_object("cloudevent", "$.time").alias("ce_time"),
        F.get_json_object("cloudevent", "$.iodebeziumop").alias("ce_ext_op"),
        F.get_json_object("cloudevent", "$.iodebeziumconnector").alias("ce_ext_conn"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payloads + typed metadata decoded /
    feature-extracted through Arrow-batched mapInPandas (decode step is a
    deterministic stub — no codec libs in this container; schema, batching and
    partitioning are production-real). The synthetic payload is a pure
    md5/sha2 hash chain, so the sha256/n_bytes/kind/frames columns have a full
    DuckDB oracle; only the stub feature VALUES stay oracle-free (its dim is
    checked)."""
    from debezium_spark.functions.multimodal import extract_features, synth_media

    media = synth_media(spark, n=256)
    feats = extract_features(media)
    return feats.select(
        "media_id", "kind", "sha256", "n_bytes", "frames_sampled",
        F.size("feature").alias("feat_dim"),
    )


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing (mapInPandas, 1-in-1-out): the stub re-encode is
    sha256(payload || ':64x64') as utf-8 bytes, so the oracle rebuilds the
    resized payload bit-for-bit (returned hex-encoded for the hash gate)."""
    from debezium_spark.functions.multimodal import resize_images, synth_media

    media = synth_media(spark, n=256)
    out = resize_images(media, width=64, height=64)
    # the stub payload IS the digest's utf-8 bytes -> cast back for the gate
    return out.select(
        "media_id",
        F.col("payload").cast("string").alias("resized_sha"),
        "width",
        "height",
        "n_bytes",
    )


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plumbing (mapInPandas with ROW EXPANSION: one
    video -> ceil(duration/every) frame rows). Duration is overridden with an
    md5-derived value so the oracle can rebuild the exact frame fan-out; the
    frame digest stub is sha256(payload || ':' || t_ms)."""
    from debezium_spark.functions.dedup import _h64
    from debezium_spark.functions.multimodal import sample_frames, synth_media

    media = synth_media(spark, n=256)
    dur = ((_h64(F.col("media_id").cast("string"), "dur") % 5 + 1) * 1000).cast(
        "long"
    )
    media = media.withColumn(
        "meta",
        F.struct(
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            dur.alias("duration_ms"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )
    return sample_frames(media, every_ms=700)


def q_tx_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEGIN/END transaction boundary records on the dedicated transaction
    topic (TransactionMonitor.java:36-37,168-203): per tx (event_id // 8),
    BEGIN at the first offset and END at the last carrying the event count
    plus the per-collection breakdown (event_type stands in for the table)."""
    from debezium_spark.operators.resolver import transaction_boundaries

    ev = _events(spark, sf_dir)
    wal = ev.select(
        F.col("event_id").alias("offset"),
        (F.col("event_id") * 10).cast("long").alias("ts_ms"),
        _op_col().alias("op"),
        (F.col("event_id") / 8).cast("long").alias("tx_id"),
        "event_type",
    )
    return transaction_boundaries(
        wal, topic_prefix="spark-cdc", table_col="event_type"
    )


def q_read_to_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReadToInsertEvent SMT (connector-mysql transforms/ReadToInsertEvent.java:
    35-60): snapshot READ ('r') envelopes rewritten to CREATE ('c'); other ops
    untouched. 'view' events stand in for snapshot reads here."""
    from debezium_spark.functions.transforms import read_to_insert

    ev = _events(spark, sf_dir)
    op = (
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "view", F.lit("r"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    env = ev.select(
        F.struct(F.col("user_id")).alias("key"),
        F.struct(op.alias("op")).alias("value"),
        F.col("event_id").alias("offset"),
    )
    return (
        read_to_insert(env)
        .groupBy(F.col("value.op").alias("op"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_crdt_pn_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRDT PN counter (crdt/StateBasedPNCounter.java:1): per-user adds/removes
    rolled up independently on two 'replicas' (even/odd offsets) then merged
    with the state-based CRDT merge (sum pairwise) — the merge result must
    equal a single-pass rollup, which is exactly what the oracle computes."""
    from debezium_spark.functions.crdt import merge_counter_states, pn_counter_from_ops

    ev = _events(spark, sf_dir)
    env = ev.select(
        F.struct(F.col("user_id")).alias("key"),
        F.struct(_op_col().alias("op")).alias("value"),
        F.col("event_id").alias("offset"),
    )
    replica_a = pn_counter_from_ops(env.where(F.col("offset") % 2 == 0), ["user_id"])
    replica_b = pn_counter_from_ops(env.where(F.col("offset") % 2 == 1), ["user_id"])
    return merge_counter_states(replica_a, replica_b).select(
        "user_id", "adds", "removes", "value"
    )


def q_serde_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium JSON serde (serde/json/JsonSerde.java:86-103): envelope ->
    Kafka-Connect schema+payload JSON wire -> typed unwrap from the 'after'
    field. Deletes carry no after image, so they deserialize to null content
    (the serde parses them as extracted records with no matching fields)."""
    from debezium_spark.functions.serde import deserialize_values, serialize_records
    from debezium_spark.streaming.windows import epoch_us
    from pyspark.sql import types as T

    ev = _events(spark, sf_dir)
    op = _op_col()
    payload = F.struct(F.col("event_type"), F.col("props"))
    env = ev.select(
        F.struct(F.col("user_id")).alias("key"),
        F.struct(
            F.when(op == "d", payload).alias("before"),
            F.when(op != "d", payload).alias("after"),
            op.alias("op"),
            F.floor(epoch_us(F.col("ts")) / 1000).cast("long").alias("ts_ms"),
            F.struct(
                F.lit("0.1.0").alias("version"),
                F.lit("spark-cdc").alias("connector"),
                F.lit("events").alias("name"),
                F.floor(epoch_us(F.col("ts")) / 1000)
                .cast("long")
                .alias("ts_ms"),
                F.lit("false").alias("snapshot"),
                F.lit("lake").alias("db"),
                F.col("event_id").cast("string").alias("sequence"),
            ).alias("source"),
        ).alias("value"),
        F.col("event_id").alias("offset"),
    )
    wire = serialize_records(env, schema_payload_wrapper=True)
    payload_t = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("props", T.StringType()),
        ]
    )
    back = deserialize_values(wire, payload_t)  # from_field="after"
    return back.select(
        "offset",
        F.col("value.event_type").alias("rt_event_type"),
        F.col("value.props").alias("rt_props"),
    )


def q_dt_variable_scale_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """io.debezium.data.VariableScaleDecimal (data/VariableScaleDecimal.java:1):
    decimal -> {scale, big-endian two's-complement unscaled bytes}, exactly
    BigDecimal.unscaledValue().toByteArray(); the hex of those bytes and the
    decoded unscaled value are both checked against DuckDB."""
    from debezium_spark.functions.datatypes import (
        variable_scale_decimal,
        variable_scale_decimal_decode,
    )

    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    vsd = variable_scale_decimal(dec, 2)
    return od.select(
        F.col("o_orderkey"),
        vsd.getField("scale").alias("vsd_scale"),
        F.hex(vsd.getField("value")).alias("vsd_hex"),
        (variable_scale_decimal_decode(vsd) * 100).cast("long").alias("unscaled_back"),
    )


def q_dt_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """io.debezium.data.Bits (data/Bits.java:1): long mask -> BitSet.toByteArray
    little-endian minimal bytes; hex + decode round-trip checked vs DuckDB."""
    from debezium_spark.functions.datatypes import bits_decode, bits_encode

    ev = _events(spark, sf_dir)
    enc = bits_encode(F.col("event_id"))
    return ev.select(
        F.col("event_id"),
        F.hex(enc).alias("bits_hex"),
        bits_decode(enc).alias("bits_back"),
    )


def q_dt_point_wkb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """io.debezium.data.geometry.Point (geometry/Point.java:24-55): (x, y) ->
    21-byte WKB via an Arrow-batched pandas UDF, parsed back bit-exactly; the
    round-trip doubles and the fixed WKB length are the oracle-checked
    invariants (DuckDB cannot emit IEEE-754 bytes to compare directly)."""
    from debezium_spark.functions.datatypes import point_decode, point_encode

    cu = _customer(spark, sf_dir).select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("x"),
        F.col("c_custkey").cast("double").alias("y"),
    )
    enc = point_encode(cu, "x", "y", srid=4326)
    dec = point_decode(enc.select("c_custkey", F.col("point.wkb").alias("wkb")), "wkb")
    return dec.select(
        "c_custkey",
        F.col("pt_x"),
        F.col("pt_y"),
        F.octet_length("wkb").alias("wkb_len"),
    )


def q_dt_avro_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro binary record encoding (functions/avro.py — the wire body the
    reference's Avro converter ships: CloudEventsConverter.java data
    serializer AVRO / engine/format/Avro.java). Record {lang, text}, both
    ["null","string"] unions: each field = union branch varint 0x02 +
    zigzag-varint byte length + utf8 bytes. DuckDB rebuilds the bytes hex-
    for-hex, covering 1- and 2-byte varint lengths (text spans 48-553 B)."""
    from debezium_spark.functions.avro import avro_binary

    schema = {
        "type": "record",
        "name": "Doc",
        "namespace": "io.debezium.spark",
        "fields": [
            {"name": "lang", "type": ["null", "string"]},
            {"name": "text", "type": ["null", "string"]},
        ],
    }
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.struct("lang", "text").alias("rec")
    )
    out, _ = avro_binary(docs, "rec", schema=schema)
    return out.select(
        "doc_id",
        F.hex(F.col("avro")).alias("avro_hex"),
        F.octet_length(F.col("avro")).alias("avro_len"),
    )


def q_dt_protobuf_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """proto3 message encoding (functions/protobuf.py — the embedded API's
    Protobuf format, engine/format/Protobuf.java): message {lang=1, text=2},
    each present field = tag varint (number<<3|wire_type 2) + RAW varint byte
    length (proto3 lengths are unsigned, not zigzag — deliberately different
    from the Avro entry) + utf8 bytes; null fields omitted. DuckDB rebuilds
    the bytes hex-for-hex across 1- and 2-byte length varints."""
    from debezium_spark.functions.protobuf import protobuf_binary

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.struct("lang", "text").alias("rec")
    )
    out, _ = protobuf_binary(docs, "rec")
    return out.select(
        "doc_id",
        F.hex(F.col("proto")).alias("proto_hex"),
        F.octet_length(F.col("proto")).alias("proto_len"),
    )


def q_topic_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro fullname adjustment over a data column of topic/schema names
    (util/SchemaNameAdjuster.validFullname, SchemaNameAdjuster.java:149-190):
    invalid chars -> '_', an invalid FIRST char is replaced (not prefixed).
    One column exercises the valid-first-char path, one the digit-first path."""
    from debezium_spark.functions.naming import sanitize_topic_col

    ev = _events(spark, sf_dir)
    a = F.concat(F.col("event_type"), F.lit("-v+1"))
    b = F.concat(F.col("user_id").cast("string"), F.lit("."), F.col("event_type"))
    return ev.select(
        "event_id",
        sanitize_topic_col(a).alias("topic_ok_first"),
        sanitize_topic_col(b).alias("topic_digit_first"),
    )


def q_dt_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """io.debezium.data.Enum / EnumSet validation (data/Enum.java:1,
    data/EnumSet.java:1): values outside the ``allowed`` parameter become null
    (relaxed Connect behavior); EnumSet checks every comma-separated element."""
    from debezium_spark.functions.datatypes import enum_check, enum_set_check

    ev = _events(spark, sf_dir)
    es = F.concat(F.col("event_type"), F.lit(",click"))
    return ev.select(
        "event_id",
        enum_check(F.col("event_type"), ["click", "view"]).alias("enum_ok"),
        enum_set_check(es, ["click", "view"]).alias("enum_set_ok"),
    )


def q_dt_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the io.debezium.time.* family (time/Time.java:1,
    MicroTime.java:1, NanoTime.java:1, NanoTimestamp.java:1, Year.java:1,
    ZonedTime.java:1, Interval.java:1, MicroDuration.java:1): past-midnight
    milli/micro/nano ints, epoch nanos, year int, zoned time string, ISO-8601
    period string with trailing-zero-stripped seconds, and the
    average-days-per-month approximate duration. Interval/duration components
    are synthesized deterministically from event_id (quarter-second fractions
    keep the double arithmetic exact, so the truncation cross-checks
    bit-for-bit against the oracle)."""
    from debezium_spark.functions import converters as C

    ev = _events(spark, sf_dir)
    ts = F.col("ts")
    eid = F.col("event_id")
    y, mo, d = eid % 3, eid % 12, eid % 28
    h, mi = eid % 24, eid % 60
    s = (eid % 60).cast("double") + (eid % 4).cast("double") / F.lit(4.0)
    return ev.select(
        eid.alias("offset"),
        C.milli_of_day(ts).alias("t_ms"),
        C.micro_of_day(ts).alias("t_us"),
        C.nano_of_day(ts).alias("t_ns"),
        C.epoch_nanos(ts).alias("ts_ns"),
        C.year_int(ts).alias("yr"),
        C.zoned_time_iso(ts).alias("zt"),
        C.interval_iso(y, mo, d, h, mi, s).alias("period_iso"),
        C.duration_micros(y, mo, d, h, mi, s).alias("dur_us"),
    )


def q_dt_special_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpecialValueDecimal (data/SpecialValueDecimal.java:33-192): textual
    NaN/Infinity/-Infinity decimals through all three decimal.handling.modes —
    string renders the enum NAME, double renders IEEE specials, precise nulls
    them out (the reference throws; the engine's failure-handling predicate is
    the `special` column). Plain values are exact '<id>.25' strings so the
    decimal casts cross-check digit-for-digit."""
    from debezium_spark.functions import converters as C

    ev = _events(spark, sf_dir)
    eid = F.col("event_id")
    raw = (
        F.when(eid % 7 == 0, F.lit("NaN"))
        .when(eid % 7 == 1, F.lit("Infinity"))
        .when(eid % 7 == 2, F.lit("-Infinity"))
        .otherwise(F.concat(eid.cast("string"), F.lit(".25")))
    )
    return ev.select(
        eid.alias("offset"),
        C.decimal_special_name(raw).alias("special"),
        C.convert_decimal_special(raw, "string", precision=38, scale=6).alias("d_str"),
        C.convert_decimal_special(raw, "double").alias("d_dbl"),
        # Rendered as a string on BOTH sides: Spark's Decimal('3.250000') and
        # DuckDB's float64 3.25 stringify differently under the driver's
        # value-hash (r4's one red row), so the precise mode is gated on its
        # canonical scale-6 text form instead (same pattern as d_str, green).
        C.convert_decimal_special(raw, "precise", precision=38, scale=6)
        .cast("string")
        .alias("d_prec"),
    )


def q_dt_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """io.debezium.data.geometry.Geometry (geometry/Geometry.java:30-76) /
    Geography (Geography.java:24-42): {wkb, srid} struct with optional srid
    (createValue sets it only when non-null). Point WKB feeds the struct; the
    oracle-checked invariants are the srid pattern (incl. nulls), the 21-byte
    WKB length, and the bit-exact (x, y) round-trip through the WKB bytes."""
    from debezium_spark.functions.datatypes import (
        geometry_encode,
        point_decode,
        point_encode,
    )

    cu = _customer(spark, sf_dir).select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("x"),
        F.col("c_custkey").cast("double").alias("y"),
    )
    ck = F.col("c_custkey")
    enc = point_encode(cu, "x", "y").select(
        "c_custkey",
        F.col("point.wkb").alias("wkb"),
        F.when(ck % 3 != 0, (F.lit(4326) + ck % 10).cast("int")).alias("srid_in"),
    )
    geom = geometry_encode(enc, "wkb", srid_col="srid_in", out="geom")
    dec = point_decode(
        geom.select("c_custkey", F.col("geom.srid").alias("srid"),
                    F.col("geom.wkb").alias("gwkb")),
        "gwkb",
    )
    return dec.select(
        "c_custkey",
        F.col("srid"),
        F.octet_length("gwkb").alias("wkb_len"),
        F.col("pt_x"),
        F.col("pt_y"),
    )


def q_tracing_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ActivateTracingSpan SMT (transforms/tracing/ActivateTracingSpan.java:
    1-186): every third event carries a Properties-serialized parent span
    context in its after-block; the transform extracts it (DebeziumTextMap
    load, comment lines skipped), chains db-log-write -> operation spans with
    deterministic md5-derived ids, and injects the operation span's context
    as headers. Span lineage, start timestamps, a db.* tag, and the injected
    header are all oracle-checked."""
    from debezium_spark.functions.converters import epoch_millis
    from debezium_spark.functions.tracing import activate_tracing_span

    ev = _events(spark, sf_dir)
    eid = F.col("event_id")
    es = eid.cast("string")
    ctx = F.when(
        eid % 3 == 0,
        F.concat(
            F.lit("#exported span\ntraceid="),
            F.substring(F.md5(F.concat(F.lit("t"), es)), 1, 16),
            F.lit("\nspanid="),
            F.substring(F.md5(F.concat(F.lit("s"), es)), 1, 16),
        ),
    )
    ts_ms = epoch_millis(F.col("ts"))
    env = ev.select(
        eid.alias("offset"),
        F.struct(
            F.struct(
                F.col("event_type").alias("etype"),
                ctx.alias("tracingspancontext"),
            ).alias("after"),
            F.when(eid % 2 == 0, F.lit("c")).otherwise(F.lit("u")).alias("op"),
            ts_ms.alias("ts_ms"),
            F.struct(
                F.lit("spark-cdc").alias("connector"),
                ts_ms.alias("ts_ms"),
            ).alias("source"),
        ).alias("value"),
    )
    out = activate_tracing_span(env)
    tr = F.col("tracing")
    return out.select(
        "offset",
        tr["trace_id"].alias("trace_id"),
        tr["parent_span_id"].alias("parent_span_id"),
        tr["tx_log_span"]["span_id"].alias("tx_span_id"),
        tr["debezium_span"]["span_id"].alias("op_span_id"),
        tr["debezium_span"]["start_us"].alias("start_us"),
        tr["tx_log_span"]["tags"].getItem("db.connector").alias("db_connector"),
        F.col("__header_spanid").alias("header_spanid"),
    )


def q_message_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """message.key.columns custom key mapper (relational/Key.java:92-148):
    the spec '(.*)\\.EVENTS:event_type,user_id' full-matches the captured
    table 'lake.events' case-insensitively and re-keys the stream by
    (user_id, event_type) — TABLE column order, not spec order (the reference
    filters table.columns() in place). The re-keyed per-key aggregation is
    the oracle-checked consequence."""
    from debezium_spark.functions.transforms import resolve_message_key

    ev = _events(spark, sf_dir)
    key = resolve_message_key(
        "(.*)\\.EVENTS:event_type,user_id", "lake.events",
        ev.columns, ("event_id",),
    )
    return ev.groupBy(*key).agg(
        F.count("*").alias("n_changes"),
        F.max("event_id").alias("max_offset"),
    )


def q_doc_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational count-min sketch, end to end (sketches.cms_table /
    merge_cms_tables / cms_estimate): per-source sketches of document
    tokens built independently, merged cell-wise (counters ADD exactly —
    the merge law is in the hash-gated path, merged == global build), then
    every distinct token point-estimated as min-over-rows. width=256 is
    deliberately small so hash collisions occur and estimates genuinely
    overestimate some counts — the oracle reproduces the exact same cells
    via the shared portable md5 hash. Shuffles are bounded at
    depth x width cells per group; the probe join broadcasts."""
    from debezium_spark.functions import sketches as SK

    d = _docs(spark, sf_dir)
    t = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    toks = d.select(
        "source",
        F.explode(F.filter(F.split(t, r"\s+"), lambda x: x != "")).alias("tok"),
    )
    per_source = SK.cms_table(
        toks, "tok", depth=4, width=256, group_cols=("source",)
    )
    merged = SK.merge_cms_tables(per_source.drop("source"))
    probes = toks.select("tok").distinct()
    return SK.cms_estimate(merged, probes, "tok", depth=4, width=256)


def q_doc_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (dedup.decontaminate_bloom): same
    eval split as doc_decontaminate (doc_id % 97 == 0), but the eval
    shingle set is compressed to a 2^18-bit bloom (k=6) and the corpus
    probe is a zero-join bit test against ONE shared word array (forall
    over a k-position array — the array appears once in the plan, not
    once per hash) — no broadcast hash table, no corpus shuffle before
    the per-doc count. A bloom is probabilistic, so the hash gate holds
    only the DETERMINISTIC direction: per doc, the exact join's n_hits /
    contaminated, plus `no_false_negative` — the law that the bloom can
    never miss a contaminated shingle position (always 1, any SF, any
    filter sizing). The false-positive side is bounded by pytest
    (tests/test_dataops.py), not hash-gated — gating a ~FP-rate event
    against an exact oracle would turn flaky as n/m grows with SF."""
    d = _docs(spark, sf_dir)
    corpus = d.where(F.col("doc_id") % 97 != 0)
    eval_docs = d.where(F.col("doc_id") % 97 == 0)
    exact = DD.decontaminate(corpus, eval_docs, ngram_words=8)
    bloom = DD.decontaminate_bloom(
        corpus,
        eval_docs,
        ngram_words=8,
        m_bits=1 << 18,
        k_hashes=6,
    ).select(
        F.col("doc_id"),
        F.col("n_hits").alias("_bloom_hits"),
        F.col("contaminated").alias("_bloom_cont"),
    )
    return exact.join(bloom, "doc_id").select(
        "doc_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        F.col("contaminated").cast("int").alias("contaminated"),
        (
            (F.col("_bloom_hits") >= F.col("n_hits"))
            & (F.col("_bloom_cont") >= F.col("contaminated"))
        )
        .cast("int")
        .alias("no_false_negative"),
    )


def q_evt_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type value quantiles (windows.quantile_profile):
    Spark's exact `percentile` aggregate — interpolation at rank (n-1)*q,
    the same definition as DuckDB quantile_cont — computed for all five
    quantiles from ONE map-side-combined buffer, quantized to ppm. Buffer
    memory is O(distinct values per group) (2-decimal values here), the
    documented trade vs approx_percentile for unbounded measures.

    Oracle-contract boundary note: the interpolated percentile is ONE float
    multiply-add per quantile before the floor(x*1e6+0.5) quantization — a
    1-ulp divergence between engines on an exact .5 boundary would flip the
    ppm value. Measure-zero in practice (5 values x |types| per run) and
    unobserved across rounds; documented as a residual risk unlike the
    pure-integer gates."""
    from debezium_spark.streaming.windows import quantile_profile

    return quantile_profile(
        _events(spark, sf_dir),
        "value",
        quantiles=(0.25, 0.5, 0.75, 0.9, 0.99),
        group_cols=("event_type",),
    )


def q_evt_rolling_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 10-minute per-user activity (windows.rolling_metrics):
    every event's count + exact cents-scaled sum of that user's events in
    [ts-600s, ts]. ONE user-keyed RANGE window over microsecond event time
    serves both aggregates (single hash exchange + in-partition sort);
    same-(user, ts) events are frame peers, so outputs are tie-stable
    across engines."""
    from debezium_spark.streaming.windows import rolling_metrics

    return rolling_metrics(
        _events(spark, sf_dir),
        trailing_seconds=600,
        value_scale=100,
    ).select("event_id", "user_id", "rolling_n", "rolling_sum_scaled")


def q_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-point PageRank (graph.pagerank) over the 3-gram-Jaccard
    pair graph — centrality-based keep-representative selection for dup
    cluster families. 5 power iterations; every per-edge contribution is an
    integer division of BIGINT rank by degree, so round sums are
    order-independent and the oracle (the same graph unrolled 5 rounds in
    SQL) matches bit-for-bit. Per round: one slim rank-onto-edges join + a
    map-side-combined SUM keyed by the receiving node, lineage truncated
    by eager checkpoint."""
    from debezium_spark.functions.graph import pagerank

    d = _docs(spark, sf_dir)
    pairs = DD.ngram_jaccard_pairs(d, threshold=0.1, max_doc_freq=256).select(
        "id_a", "id_b"
    )
    return pagerank(pairs, iterations=5)


def q_evt_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences
    (windows.transition_matrix): one user-keyed exchange feeds the lead
    window ((ts, event_id)-ordered, tie-deterministic), pair counts
    map-side combine into a |types|²-bounded frame, and row probabilities
    are exact integer-division ppm."""
    from debezium_spark.streaming.windows import transition_matrix

    return transition_matrix(_events(spark, sf_dir))


def q_doc_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual sampling weights (text.temperature_
    weights, mT5/XLM-R style, T=3): per-language pow quantized to an
    integer immediately, so the normalizing sum and the ppm weights are
    exact integer arithmetic. One map-side-combined token-count shuffle;
    the rest runs on the |languages|-bounded frame.

    Oracle-contract boundary note: the ONE float op (pow) is computed by
    JVM Math vs DuckDB libm — a 1-ulp divergence for an input whose scaled
    value lands exactly on the floor(x*1e6+0.5) boundary would flip the
    quantized integer. Measure-zero in practice (|languages| inputs per
    run) and unobserved across rounds, but unlike the pure-integer
    operators this gate carries that documented residual risk."""
    return TX.temperature_weights(
        _docs(spark, sf_dir), group_col="lang", temperature=3.0
    )


def q_doc_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation (text.unimax_weights, arXiv:2304.09151):
    water-filling in closed form — capped groups are a prefix of the
    capacity sort, uncapped groups share the remainder equally — all
    BIGINT comparisons/divisions, windows only on the bounded language
    frame. budget=45000/max_epochs=2 caps four of five languages at this
    SF so both branches appear in the gate."""
    return TX.unimax_weights(
        _docs(spark, sf_dir),
        group_col="lang",
        budget_tokens=45000,
        max_epochs=2,
    )


def q_emb_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantization top-10 (similarity.sq_encode/sq_topk, FAISS
    ScalarQuantizer analogue): per-dimension affine grids from the head-256
    sample (pushed-down id<256 scan), 4x-compressed codes, and EXACT
    integer code-space distances — no float in the scan, ranking
    deterministic with id ties."""
    from debezium_spark.functions.similarity import (
        sq_params_from_head,
        sq_topk,
    )

    v = _emb(spark, sf_dir)
    mins, steps = sq_params_from_head(v, head=256)
    query = [float(x) for x in v.where("vec_id = 0").first()["embedding"]]
    return sq_topk(v, query, mins, steps, k=10)


def _fl2_sql_chain(prefix: str, seed: str, carry: str, n: int = 16) -> str:
    """The DuckDB replay of text.with_fixed_log2: ``n`` shift-and-square
    rounds as chained CTEs over a seed subquery exposing (``carry``, x, e,
    m, f). Generated rather than hand-written so the oracle's step count and
    constants can never drift from the Spark operator's."""
    ctes = [f"{prefix}0 AS ({seed})"]
    for i in range(n):
        ctes.append(
            f"{prefix}{i + 1} AS (SELECT {carry}x, e, "
            "CASE WHEN sq >= 2147483648 THEN sq >> 1 ELSE sq END AS m, "
            "f * 2 + CASE WHEN sq >= 2147483648 THEN 1 ELSE 0 END AS f "
            f"FROM (SELECT *, (m * m) >> 30 AS sq FROM {prefix}{i}))"
        )
    return ",\n            ".join(ctes)


# Seed template for _fl2_sql_chain: exposes (carry..., x, e, m, f) from a
# source relation; {x} is the positive BIGINT expression to log.
_FL2_SEED = (
    "SELECT {carry}x, e, CASE WHEN e >= 30 THEN x >> (e - 30) "
    "ELSE x << (30 - e) END AS m, CAST(0 AS BIGINT) AS f "
    "FROM (SELECT {carry}CAST({x} AS BIGINT) AS x, "
    "length(printf('%b', CAST({x} AS BIGINT))) - 1 AS e FROM {src})"
)


def _unigram_nll_oracle_sql() -> str:
    """doc_unigram_nll oracle: identical integer fixed-point-log2 steps as
    the Spark operator (16 fraction bits, x 693147 div 65536) — the gate is
    exact-by-construction, no transcendental on either side."""
    d_seed = (
        "SELECT x, e, CASE WHEN e >= 30 THEN x >> (e - 30) "
        "ELSE x << (30 - e) END AS m, CAST(0 AS BIGINT) AS f "
        "FROM (SELECT CAST(N + V AS BIGINT) AS x, "
        "length(printf('%b', N + V)) - 1 AS e FROM nv)"
    )
    c_seed = (
        "SELECT w, x, e, CASE WHEN e >= 30 THEN x >> (e - 30) "
        "ELSE x << (30 - e) END AS m, CAST(0 AS BIGINT) AS f "
        "FROM (SELECT w, CAST(c_w + 1 AS BIGINT) AS x, "
        "length(printf('%b', c_w + 1)) - 1 AS e FROM vocab)"
    )
    return rf"""
            WITH toks AS (
              SELECT doc_id AS id,
                     unnest(list_filter(
                       string_split_regex(lower(trim(coalesce(text,''))), '\s+'),
                       x -> x <> '')) AS w
              FROM documents
            ),
            vocab AS MATERIALIZED (SELECT w, count(*) AS c_w FROM toks GROUP BY 1),
            nv AS (SELECT CAST(sum(c_w) AS BIGINT) AS N, count(*) AS V FROM vocab),
            {_fl2_sql_chain("d", d_seed, "")},
            dl AS (SELECT e * 65536 + f AS l2d FROM d16),
            {_fl2_sql_chain("c", c_seed, "w, ")},
            model AS MATERIALIZED (
              SELECT w,
                     CAST(((dl.l2d - (e * 65536 + f)) * 693147) // 65536
                          AS BIGINT) AS q
              FROM c16 CROSS JOIN dl
            ),
            pd AS (SELECT id, w, count(*) AS n FROM toks GROUP BY 1, 2),
            sc AS MATERIALIZED (
              SELECT id, CAST(sum(n) AS BIGINT) AS n_tokens,
                     CAST(sum(n * q) AS BIGINT) AS nll_ppm
              FROM pd JOIN model USING (w) GROUP BY 1
            )
            SELECT d.doc_id AS id,
                   CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(sc.nll_ppm, 0) AS BIGINT) AS nll_ppm,
                   CAST(CASE WHEN coalesce(sc.n_tokens, 0) = 0 THEN 0
                        ELSE coalesce(sc.nll_ppm, 0) // sc.n_tokens END AS BIGINT)
                     AS avg_nll_ppm
            FROM documents d LEFT JOIN sc ON sc.id = d.doc_id
        """


def q_doc_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity scoring (text.unigram_nll — the CCNet-style
    quality filter shape): per-token nll is quantized once per VOCAB TYPE
    (Laplace alpha=1) via the EXACT shift-and-square fixed-point binary log
    (text.with_fixed_log2, 16 fraction bits, x ln(2)*1e6 constant), each
    doc's score is the exact BIGINT token sum. No transcendental touches
    the gated value anywhere — the r3/r4 1-ulp JVM-vs-libm ln boundary
    risk is structurally gone (the oracle replays the identical integer
    steps). Two map-side-combined count shuffles, a broadcast vocab join,
    one doc-keyed sum."""
    return TX.unigram_nll(_docs(spark, sf_dir))


def q_evt_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-3 event types per tumbling hour (windows.windowed_topk):
    one (window, type)-keyed count shuffle with map-side combine, rank
    window partitioned BY WINDOW (|types|-bounded partitions, never a
    global sort)."""
    from debezium_spark.streaming.windows import windowed_topk

    return windowed_topk(_events(spark, sf_dir), window_duration="1 hour", k=3)


def q_emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-point k-means (similarity.kmeans_fit/kmeans_assign —
    the clustering step of topic-balancing/SemDeDup curation): vectors
    quantize once to scaled BIGINTs, 3 Lloyd iterations with integer
    argmin assignment and sum-DIV-count centroid updates, head-8 init.
    Per iteration one zero-join assignment scan + one k*dim-bounded sum;
    the final assignment is hash-gated against the same algorithm
    unrolled in SQL."""
    from debezium_spark.functions.similarity import kmeans_assign, kmeans_fit

    v = _emb(spark, sf_dir)
    cents = kmeans_fit(v, k=8, iterations=3)
    return kmeans_assign(v, cents)


def q_evt_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-width value histograms per event type
    (windows.value_histogram): cents-scaled BIGINT quantization, bin =
    truncating integer division by the scaled width — a value can never
    straddle two bins across engines. One map-side-combined count shuffle
    bounded by |types| x |occupied bins|."""
    from debezium_spark.streaming.windows import value_histogram

    return value_histogram(
        _events(spark, sf_dir),
        group_cols=("event_type",),
        bin_width=25.0,
        value_scale=100,
    )


# ---------------------------------------------------------------- contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC last-writer-wins materialization at sf0.001."""
    return q_lww_last_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
    # Order matters operationally: the driver's CORRECTNESS gate checks
    # roughly the FIRST 50 keys each round. ROTATION POLICY (applied every
    # round, in this priority): (1) entries whose operator/gate/oracle code
    # changed this round ride first, (2) then the longest-unchecked entries
    # (no driver row for the most rounds), (3) long-green unchanged entries
    # ride at the back with their prior driver rows as evidence. r5 front
    # block = this round's changed entries (special-decimal string render,
    # exact-root/fixed-log2 gates, 4-sigma HLL bound, IVF broadcast path,
    # stateful/merge hot-path rework, DDL parser) + every entry whose last
    # driver row is r02, + the oldest r03 rows.
        "dt_special_decimal": q_dt_special_decimal,
        "doc_temperature_weights": q_doc_temperature_weights,
        "doc_unigram_nll": q_doc_unigram_nll,
        "doc_cardinality_sketch": q_doc_cardinality_sketch,
        "emb_ivf_topk": q_emb_ivf_topk,
        "emb_ivfpq_topk": q_emb_ivfpq_topk,
        "emb_pq_topk": q_emb_pq_topk,
        "cdc_stateful_lww_state": q_stateful_lww_state,
        "cdc_lww_last_state": q_lww_last_state,
        "cdc_e2e_engine_replay": q_e2e_engine_replay,
        "cdc_schema_evolution_nullfill": q_schema_evolution_nullfill,
        "cdc_schema_evolution_drop_rename": q_schema_evolution_drop_rename,
        "cdc_content_router": q_content_router,
        "cdc_logical_table_router": q_logical_table_router,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_token_stats": q_doc_token_stats,
        "doc_fingerprint": q_doc_fingerprint,
        "doc_quality": q_doc_quality,
        "doc_langid": q_doc_langid,
        "doc_minhash_bands": q_doc_minhash_bands,
        "doc_minhash_lsh_pairs": q_doc_minhash_lsh_pairs,
        "doc_simhash": q_doc_simhash,
        "doc_simhash_near_dups": q_doc_simhash_near_dups,
        "doc_ngram_jaccard": q_doc_ngram_jaccard,
        "emb_topk_cosine": q_emb_topk_cosine,
        "emb_lsh_topk": q_emb_lsh_topk,
        "emb_near_dups": q_emb_near_dups,
        "cdc_column_projection": q_column_projection,
        "cdc_topic_name": q_topic_name,
        "cdc_message_route": q_message_route,
        "cdc_heartbeat": q_heartbeat,
        "cdc_outbox_route": q_outbox_route,
        "cdc_tx_commit_filter": q_tx_commit_filter,
        "cdc_content_filter": q_content_filter,
        "cdc_snapshot_chunks": q_snapshot_chunks,
        "cdc_cloudevents_attrs": q_cloudevents_attrs,
        "mm_media_features": q_media_features,
        "cdc_envelope_wrap": q_envelope_wrap,
        "cdc_lake_changelog": q_lake_changelog,
        "cdc_multi_table_snapshot": q_multi_table_snapshot,
        "cdc_dedup_by_offset": q_dedup_by_offset,
        "cdc_op_skip_filter": q_op_skip_filter,
        "cdc_table_filter": q_table_filter,
        "cdc_column_mask_hash": q_column_mask_hash,
        "cdc_column_truncate": q_column_truncate,
        "cdc_tombstone_emit": q_tombstone_emit,
        "cdc_pk_change_split": q_pk_change_split,
        "cdc_tx_metadata": q_tx_metadata,
        "cdc_snapshot_markers": q_snapshot_markers,
        "cdc_snapshot_select_override": q_snapshot_select_override,
        "evt_windowed_metrics": q_evt_windowed_metrics,
        "doc_gopher_filter": q_doc_gopher_filter,
        "doc_shuffle_order": q_doc_shuffle_order,
        "doc_dsir_weights": q_doc_dsir_weights,
        "doc_dup_clusters": q_doc_dup_clusters,
        "doc_pack_shards": q_doc_pack_shards,
        "doc_repetition_stats": q_doc_repetition_stats,
        "doc_span_dedup": q_doc_span_dedup,
        "doc_pii_scrub": q_doc_pii_scrub,
        "doc_decontaminate": q_doc_decontaminate,
        "doc_hash_sample": q_doc_hash_sample,
        "cdc_handling_modes": q_cdc_handling_modes,
        "doc_classifier_score": q_doc_classifier_score,
        "doc_stratified_sample": q_doc_stratified_sample,
        "emb_semantic_dedup": q_emb_semantic_dedup,
        "doc_mix_sources": q_doc_mix_sources,
        "doc_chunk_windows": q_doc_chunk_windows,
        "cdc_tx_boundaries": q_tx_boundaries,
        "mm_media_resize": q_media_resize,
        "mm_frame_sample": q_media_frame_sample,
        "cdc_read_to_insert": q_read_to_insert,
        "cdc_crdt_pn_counter": q_crdt_pn_counter,
        "cdc_serde_roundtrip": q_serde_roundtrip,
        "dt_variable_scale_decimal": q_dt_variable_scale_decimal,
        "dt_bits": q_dt_bits,
        "dt_point_wkb": q_dt_point_wkb,
        "dt_avro_binary": q_dt_avro_binary,
        "dt_protobuf_binary": q_dt_protobuf_binary,
        "cdc_topic_sanitize": q_topic_sanitize,
        "dt_enum": q_dt_enum,
        "dt_temporal": q_dt_temporal,
        "dt_geometry": q_dt_geometry,
        "cdc_tracing_span": q_tracing_span,
        "cdc_message_key": q_message_key,
        "doc_bloom_decontaminate": q_doc_bloom_decontaminate,
        "cdc_metrics_rollup": q_metrics_rollup,
        "evt_sessionize": q_evt_sessionize,
        "evt_funnel": q_evt_funnel,
        "evt_retention_cohorts": q_evt_retention_cohorts,
        "evt_asof_join": q_evt_asof_join,
        "evt_interval_join": q_evt_interval_join,
        "evt_rolling_metrics": q_evt_rolling_metrics,
        "evt_windowed_topk": q_evt_windowed_topk,
        "emb_kmeans": q_emb_kmeans,
        "tpch_q1_pricing": q_tpch_q1_pricing,
        "cdc_incremental_snapshot_dedup": q_incremental_snapshot_dedup,
        "cdc_unwrap_new_state": q_unwrap_new_state,
        "cdc_unwrap_options": q_unwrap_options,
        "cdc_value_converters": q_value_converters,
        "cdc_custom_converters": q_custom_converters,
        "evt_outliers": q_evt_outliers,
        "doc_pmi_bigrams": q_doc_pmi_bigrams,
        "doc_heavy_hitters": q_doc_heavy_hitters,
        "doc_cms_estimate": q_doc_cms_estimate,
        "evt_value_quantiles": q_evt_value_quantiles,
        "doc_pagerank": q_doc_pagerank,
        "evt_transitions": q_evt_transitions,
        "doc_unimax_mix": q_doc_unimax_mix,
        "emb_sq_topk": q_emb_sq_topk,
        "evt_value_histogram": q_evt_value_histogram,
        "doc_winnow_fingerprints": q_doc_winnow_fingerprints,
        "doc_winnow_pairs": q_doc_winnow_pairs,
        "doc_tfidf_topterms": q_doc_tfidf_topterms,
    }


def _simhash_oracle_sql() -> str:
    """60-bit majority-vote SimHash in DuckDB, matching functions/dedup.simhash:
    token hash = first 15 hex chars of md5('0:'||token) as bigint."""
    norm = (
        "trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), "
        "'[^A-Za-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))"
    )
    toks = f"list_distinct(string_split({norm}, ' '))"
    th = (
        f"list_transform({toks}, "
        "t -> CAST(('0x' || substr(md5('0:' || t), 1, 15)) AS BIGINT))"
    )
    bits = " + ".join(
        f"(CASE WHEN 2*len(list_filter(th, h -> ((h >> {b}) & 1) = 1)) > len(th) "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(60)
    )
    return f"""
        WITH s AS (SELECT doc_id, {th} AS th FROM documents)
        SELECT doc_id, CAST({bits} AS BIGINT) AS sig FROM s
    """


_H64_SQL = "CAST(('0x' || substr(md5('{p}:' || {x}), 1, 15)) AS BIGINT)"


def _minhash_lsh_oracle_sql(
    num_perm: int = 16, bands: int = 4, min_agree: int = 4
) -> str:
    """MinHash+LSH pair detection in DuckDB mirroring dedup.minhash_lsh_dedup:
    16-perm _h64 signature, 4 bands x 4 rows, candidates = any band equal,
    kept pairs = signature agreement >= min_agree (est_jaccard threshold)."""
    norm = (
        "trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), "
        "'[^A-Za-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))"
    )
    toks = f"string_split({norm}, ' ')"
    shingles3 = (
        f"list_sort(list_distinct(list_transform("
        f"generate_series(1, greatest(len({toks})-2, 0)), "
        f"i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])))"
    )
    sig_cols = ", ".join(
        "list_aggregate(list_transform(sh, g -> "
        + _H64_SQL.format(p=p, x="g")
        + f"), 'min') AS s{p}"
        for p in range(num_perm)
    )
    rows = num_perm // bands
    band_conds = " OR ".join(
        "("
        + " AND ".join(f"a.s{b * rows + r} = b.s{b * rows + r}" for r in range(rows))
        + ")"
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN a.s{p} = b.s{p} THEN 1 ELSE 0 END)" for p in range(num_perm)
    )
    return f"""
        WITH sh0 AS (SELECT doc_id AS id, {shingles3} AS sh FROM documents),
        sig AS (SELECT id, {sig_cols} FROM sh0 WHERE len(sh) > 0)
        SELECT a.id AS id_a, b.id AS id_b, CAST({agree} AS INT) AS n_agree
        FROM sig a JOIN sig b ON a.id < b.id AND ({band_conds})
        WHERE {agree} >= {min_agree}
    """


def _simhash_pairs_oracle_sql(max_hamming: int = 3) -> str:
    """SimHash near-dup pairs in DuckDB: 4-chunk pigeonhole candidates over the
    60-bit signature (dedup.simhash_near_dups), verified by xor popcount."""
    chunk_conds = " OR ".join(
        f"((a.sig >> {c * 15}) & 32767) = ((b.sig >> {c * 15}) & 32767)"
        for c in range(4)
    )
    return f"""
        WITH s AS ({_simhash_oracle_sql()})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id AND ({chunk_conds})
        WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
    """


def _bucket_sql(dim: int = 64, planes: int = 8) -> str:
    """Sign-LSH bucket expression in DuckDB with the engine's deterministic
    hyperplanes inlined as literals (functions/similarity._hyperplane)."""
    from debezium_spark.functions.similarity import _hyperplane

    terms = []
    for b in range(planes):
        hp = ", ".join(repr(x) for x in _hyperplane(dim, b))
        terms.append(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), [{hp}]) >= 0 "
            f"THEN {1 << b} ELSE 0 END)"
        )
    return " + ".join(terms)


# Fixed-point 1e-4 quantization (similarity.scaled analogue) — floor(x*1e4+0.5)
# is pure IEEE double math, bit-identical in Spark and DuckDB, unlike
# double->DECIMAL casts whose rounding mode differs between the engines.
def _kmeans_rounds_sql(n_rounds: int) -> str:
    """Unrolled Lloyd iterations a1/c1..aN/cN for the emb_kmeans oracle —
    exact integer arithmetic mirroring similarity.kmeans_fit (BIGINT
    distances, ties to smallest cid, sum // count updates, empty clusters
    keep their previous centroid)."""
    rounds = []
    for i in range(1, n_rounds + 1):
        rounds.append(f"""
            a{i} AS MATERIALIZED (
              SELECT vec_id, vq, cid FROM (
                SELECT v.vec_id, v.vq, c.cid,
                       row_number() OVER (
                         PARTITION BY v.vec_id
                         ORDER BY list_sum(list_transform(
                           list_zip(v.vq, c.cv),
                           x -> (x[1] - x[2]) * (x[1] - x[2]))) ASC, c.cid ASC
                       ) AS rn
                FROM v CROSS JOIN c{i - 1} c
              ) WHERE rn = 1
            ),
            s{i} AS (
              SELECT a.cid, dims.d,
                     sum(a.vq[CAST(dims.d AS INT) + 1]) AS s,
                     count(*) AS n
              FROM a{i} a CROSS JOIN dims
              GROUP BY a.cid, dims.d
            ),
            c{i} AS MATERIALIZED (
              SELECT c.cid,
                     coalesce(u.cv, c.cv) AS cv
              FROM c{i - 1} c
              LEFT JOIN (
                SELECT cid, list(s // n ORDER BY d) AS cv FROM s{i} GROUP BY cid
              ) u USING (cid)
            )""")
    return ",".join(rounds) + ","


def _pq_kmeans_rounds_sql(n_rounds: int) -> str:
    """Unrolled per-subspace Lloyd iterations pa1/pc1..paN/pcN for the
    emb_pq_topk oracle — the same exact integer arithmetic as
    _kmeans_rounds_sql but keyed on (subspace s, code): argmin of BIGINT
    squared distance with ties to the smallest code, sum // count updates,
    empty codes keep their previous sub-centroid. Mirrors
    similarity._pq_int_kmeans. Expects CTEs ``sv`` (vec_id, s, sq — the
    training subvectors), ``pdims`` (sub-dimension ids) and ``p0`` (s, code,
    cv — the init codebooks)."""
    rounds = []
    for i in range(1, n_rounds + 1):
        rounds.append(f"""
            pa{i} AS MATERIALIZED (
              SELECT vec_id, s, sq, code FROM (
                SELECT sv.vec_id, sv.s, sv.sq, p.code,
                       row_number() OVER (
                         PARTITION BY sv.vec_id, sv.s
                         ORDER BY list_sum(list_transform(
                           list_zip(sv.sq, p.cv),
                           x -> (x[1] - x[2]) * (x[1] - x[2]))) ASC, p.code ASC
                       ) AS rn
                FROM sv JOIN p{i - 1} p USING (s)
              ) WHERE rn = 1
            ),
            ps{i} AS (
              SELECT a.s, a.code, pdims.d,
                     sum(a.sq[CAST(pdims.d AS INT) + 1]) AS sm,
                     count(*) AS n
              FROM pa{i} a CROSS JOIN pdims
              GROUP BY a.s, a.code, pdims.d
            ),
            p{i} AS MATERIALIZED (
              SELECT p.s, p.code,
                     coalesce(u.cv, p.cv) AS cv
              FROM p{i - 1} p
              LEFT JOIN (
                SELECT s, code, list(sm // n ORDER BY d) AS cv
                FROM ps{i} GROUP BY s, code
              ) u USING (s, code)
            )""")
    return ",".join(rounds) + ","


def _pagerank_rounds_sql(n_rounds: int) -> str:
    """Unrolled PageRank iteration CTEs it1..itN for the doc_pagerank oracle
    (exact integer arithmetic mirroring graph.pagerank: contribution =
    r // degree per edge, update = base + (85 * sum_in) // 100)."""
    rounds = []
    for k in range(1, n_rounds + 1):
        rounds.append(f"""
            it{k} AS MATERIALIZED (
              SELECT d.id, d.degree,
                     (15 * 1000000000000) // (100 * nn.n)
                     + (85 * COALESCE(s.sum_in, 0)) // 100 AS r
              FROM it{k - 1} d
              CROSS JOIN nn
              LEFT JOIN (
                SELECT e.b AS id, sum(p.r // p.degree) AS sum_in
                FROM edges e JOIN it{k - 1} p ON p.id = e.a
                GROUP BY e.b
              ) s USING (id)
            )""")
    return ",".join(rounds)


def _scaled_sql(expr: str, scale: int = 10000) -> str:
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"


def _lsh_topk_oracle_sql(dim: int = 64, planes: int = 8) -> str:
    """Sign-LSH multi-probe ANN in DuckDB, ranked by the fixed-point score."""
    cos = "list_cosine_similarity(e, (SELECT qe FROM q))"
    return f"""
        WITH b AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, {_bucket_sql(dim, planes)} AS bucket
          FROM embeddings
        ),
        q AS (SELECT e AS qe, bucket AS qb FROM b WHERE vec_id = 0)
        SELECT vec_id, {_scaled_sql(cos)} AS cos_c
        FROM b
        WHERE bit_count(xor(CAST(bucket AS BIGINT), CAST((SELECT qb FROM q) AS BIGINT))) <= 1
        ORDER BY cos_c DESC, vec_id
        LIMIT 10
    """


_NORM_TEXT_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-za-z0-9]+', ' ', 'g'), "
    "'\\s+', ' ', 'g'))"
)


def oracle_sql() -> dict[str, str]:
    norm = (
        "trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), "
        "'[^A-Za-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))"
    )
    toks = f"string_split({norm}, ' ')"
    shingles3 = (
        f"list_transform(generate_series(1, greatest(len({toks})-2, 0)), "
        f"i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])"
    )
    return {
        "cdc_envelope_wrap": f"""
            SELECT event_id AS offset,
                   {_OP_CASE_SQL} AS op,
                   user_id AS key_user,
                   CASE WHEN {_OP_CASE_SQL} IN ('u','d') THEN 1 ELSE 0 END AS has_before,
                   CASE WHEN {_OP_CASE_SQL} IN ('c','u','r') THEN 1 ELSE 0 END AS has_after
            FROM events
        """,
        "cdc_lww_last_state": f"""
            WITH ranked AS (
              SELECT user_id, event_id, event_type, {_OP_CASE_SQL} AS op,
                     row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
              FROM events
            )
            SELECT user_id, event_id AS last_offset, event_type AS last_event_type
            FROM ranked WHERE rn = 1 AND op != 'd'
        """,
        "cdc_dedup_by_offset": """
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        """,
        "cdc_op_skip_filter": f"""
            SELECT op, count(*) AS n FROM (
              SELECT {_OP_CASE_SQL} AS op FROM events
            ) WHERE op != 'd' GROUP BY op
        """,
        "cdc_table_filter": """
            SELECT event_id AS offset, event_type AS tbl FROM events
            WHERE regexp_matches(event_type, '^(click|view)$')
        """,
        "cdc_column_mask_hash": """
            SELECT event_id AS offset, sha256('s4lt:' || props) AS props_masked
            FROM events WHERE event_type = 'purchase'
        """,
        "cdc_column_truncate": """
            SELECT event_id AS offset, substr(props, 1, 8) AS props_trunc FROM events
        """,
        "cdc_tombstone_emit": f"""
            SELECT event_id AS offset, 'delete' AS kind, user_id AS key_user
            FROM events WHERE {_OP_CASE_SQL} = 'd'
            UNION ALL
            SELECT event_id AS offset, 'tombstone' AS kind, user_id AS key_user
            FROM events WHERE {_OP_CASE_SQL} = 'd'
        """,
        "cdc_pk_change_split": f"""
            SELECT event_id AS offset, 0 AS seq, {_OP_CASE_SQL} AS op,
                   user_id AS key_user
            FROM events WHERE event_type != 'purchase'
            UNION ALL
            SELECT event_id AS offset, 0 AS seq, 'd' AS op, user_id AS key_user
            FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT event_id AS offset, 1 AS seq, 'c' AS op,
                   user_id + 1000000 AS key_user
            FROM events WHERE event_type = 'purchase'
        """,
        "cdc_tx_metadata": """
            SELECT event_id AS offset, CAST(event_id // 8 AS BIGINT) AS tx_id,
                   CAST(row_number() OVER (PARTITION BY event_id // 8
                                           ORDER BY event_id) AS BIGINT) AS total_order
            FROM events
        """,
        "cdc_snapshot_markers": """
            WITH n AS (SELECT count(*) AS total FROM customer),
            r AS (SELECT c_custkey,
                         row_number() OVER (ORDER BY c_custkey) AS rn
                  FROM customer)
            SELECT c_custkey,
                   CASE WHEN rn = 1 THEN 'first'
                        WHEN rn = (SELECT total FROM n) THEN 'last'
                        ELSE 'true' END AS snapshot_marker
            FROM r
        """,
        "cdc_snapshot_select_override": """
            WITH f AS (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            ),
            r AS (
              SELECT c_custkey,
                     row_number() OVER (ORDER BY c_custkey) AS rn,
                     count(*) OVER () AS total
              FROM f
            )
            SELECT CAST(rn - 1 AS BIGINT) AS offset, c_custkey,
                   CASE WHEN rn = 1 THEN 'first'
                        WHEN rn = total THEN 'last'
                        ELSE 'true' END AS snapshot_marker
            FROM r
        """,
        "cdc_incremental_snapshot_dedup": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
            )
        """,
        "cdc_unwrap_new_state": f"""
            SELECT event_id AS offset, user_id, event_type,
                   CASE WHEN {_OP_CASE_SQL} = 'd' THEN 1 ELSE 0 END AS __deleted
            FROM events
        """,
        "cdc_e2e_engine_replay": f"""
            WITH w AS (
              SELECT event_id AS off,
                     'r' || CAST(user_id % 31 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     {_OP_CASE_SQL} AS op,
                     event_type || ':' ||
                       CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)
                       AS content
              FROM events
            ),
            last AS (
              SELECT repo, path, op, content,
                     row_number() OVER (
                       PARTITION BY repo, path ORDER BY off DESC
                     ) AS rn
              FROM w
            )
            SELECT repo, path, content FROM last WHERE rn = 1 AND op <> 'd'
        """,
        "cdc_lake_changelog": f"""
            WITH w AS (
              SELECT event_id AS off,
                     'r' || CAST(user_id % 31 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     {_OP_CASE_SQL} AS op,
                     event_type || ':' ||
                       CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)
                       AS content
              FROM events
            ),
            l1 AS (
              SELECT repo, path, op, content, off,
                     row_number() OVER (
                       PARTITION BY repo, path ORDER BY off DESC
                     ) AS rn
              FROM w WHERE off <= 3999
            ),
            s1 AS (SELECT repo, path, off, content FROM l1
                   WHERE rn = 1 AND op <> 'd'),
            l2 AS (
              SELECT repo, path, op, content, off,
                     row_number() OVER (
                       PARTITION BY repo, path ORDER BY off DESC
                     ) AS rn
              FROM w
            ),
            s2 AS (SELECT repo, path, off, content FROM l2
                   WHERE rn = 1 AND op <> 'd'),
            d2 AS (SELECT repo, path, off FROM l2 WHERE rn = 1 AND op = 'd')
            SELECT s2.repo, s2.path, 'c' AS op,
                   s2.content AS after_content, s2.off AS off
            FROM s2 LEFT JOIN s1 ON s2.repo = s1.repo AND s2.path = s1.path
            WHERE s1.repo IS NULL
            UNION ALL
            SELECT s2.repo, s2.path, 'u' AS op,
                   s2.content AS after_content, s2.off AS off
            FROM s2 JOIN s1 ON s2.repo = s1.repo AND s2.path = s1.path
            WHERE s2.off > s1.off
            UNION ALL
            SELECT s1.repo, s1.path, 'd' AS op,
                   CAST(NULL AS VARCHAR) AS after_content, d2.off AS off
            FROM s1 JOIN d2 ON s1.repo = d2.repo AND s1.path = d2.path
        """,
        "cdc_multi_table_snapshot": f"""
            WITH uw AS (
              SELECT event_id * 2 + 2 AS off,
                     user_id % 40 AS uid,
                     event_type || ':' ||
                       CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)
                       AS val
              FROM events
            ),
            ulast AS (
              SELECT uid, val FROM (
                SELECT uid, val,
                       row_number() OVER (PARTITION BY uid ORDER BY off DESC) rn
                FROM uw
              ) WHERE rn = 1
            ),
            usrc AS (
              SELECT CAST(i AS BIGINT) AS uid,
                     'SRC:' || CAST(i AS VARCHAR) AS val
              FROM (SELECT unnest(range(60)) AS i)
            ),
            iw AS (
              SELECT event_id * 2 + 3 AS off,
                     user_id % 25 AS item,
                     event_type || ':' ||
                       CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)
                       AS val
              FROM events WHERE event_id % 3 = 0
            ),
            ilast AS (
              SELECT item, val FROM (
                SELECT item, val,
                       row_number() OVER (PARTITION BY item ORDER BY off DESC) rn
                FROM iw
              ) WHERE rn = 1
            )
            SELECT 'users' AS tbl, uid AS k, val FROM ulast
            UNION ALL
            SELECT 'users' AS tbl, uid AS k, val FROM usrc
            WHERE uid NOT IN (SELECT uid FROM ulast)
            UNION ALL
            SELECT 'items' AS tbl, item AS k, val FROM ilast
        """,
        "cdc_stateful_lww_state": f"""
            WITH w AS (
              SELECT event_id AS off,
                     'r' || CAST(user_id % 31 AS VARCHAR) AS repo,
                     'p' || CAST(user_id AS VARCHAR) AS path,
                     {_OP_CASE_SQL} AS op,
                     event_type || ':' ||
                       CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)
                       AS content
              FROM events
            ),
            last AS (
              SELECT repo, path, op, content,
                     row_number() OVER (
                       PARTITION BY repo, path ORDER BY off DESC
                     ) AS rn
              FROM w
            )
            SELECT repo, path, content FROM last WHERE rn = 1 AND op <> 'd'
        """,
        "cdc_unwrap_options": f"""
            SELECT event_id AS offset,
                   event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS val_c,
                   {_OP_CASE_SQL} AS op,
                   CASE WHEN {_OP_CASE_SQL} = 'd' THEN 1 ELSE 0 END AS deleted,
                   event_id * 10 AS ts_ms,
                   event_id AS lsn,
                   {_OP_CASE_SQL} AS header_op,
                   event_type AS route
            FROM events
        """,
        "cdc_schema_evolution_nullfill": """
            SELECT event_id AS offset,
                   CASE WHEN event_id < 5000 THEN NULL
                        ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS value_c
            FROM events
        """,
        "cdc_schema_evolution_drop_rename": """
            SELECT event_id AS offset,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c,
                   1 AS n_payload_fields
            FROM events
        """,
        "cdc_value_converters": """
            SELECT event_id AS offset,
                   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT) AS d_days,
                   CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS ts_ms_connect,
                   epoch_us(ts) AS ts_us_adaptive,
                   strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z' AS ts_iso
            FROM events
        """,
        "cdc_custom_converters": """
            SELECT event_id AS offset,
                   upper(event_type) AS event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
            FROM events
        """,
        "cdc_metrics_rollup": """
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "evt_sessionize": """
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, new_s DESC
                       ROWS UNBOUNDED PRECEDING
                     ) AS sid
              FROM o
            )
            SELECT user_id,
                   epoch_us(min(ts)) AS session_start_us,
                   epoch_us(max(ts)) AS session_end_us,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "evt_funnel": """
            WITH s1 AS (
              SELECT user_id,
                     min(CASE WHEN event_type = 'view' THEN ts END) AS t1
              FROM events GROUP BY user_id
            ),
            s2 AS (
              SELECT s1.user_id, s1.t1,
                     min(CASE WHEN e.event_type = 'click' AND e.ts > s1.t1
                              THEN e.ts END) AS t2
              FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id
              GROUP BY s1.user_id, s1.t1
            ),
            s3 AS (
              SELECT s2.user_id, s2.t1, s2.t2,
                     min(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t2
                              THEN e.ts END) AS t3
              FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id
              GROUP BY s2.user_id, s2.t1, s2.t2
            ),
            r AS (
              SELECT CASE WHEN t3 IS NOT NULL THEN 3
                          WHEN t2 IS NOT NULL THEN 2
                          ELSE 1 END AS reached
              FROM s3 WHERE t1 IS NOT NULL
            )
            SELECT s.step, s.step_name,
                   (SELECT count(*) FROM r WHERE r.reached >= s.step) AS n_keys
            FROM (VALUES (1, 'view'), (2, 'click'), (3, 'purchase'))
                 AS s(step, step_name)
        """,
        "doc_tfidf_topterms": rf"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(coalesce(text,''))), '\s+')) AS term
              FROM documents
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf
              FROM toks WHERE term <> '' GROUP BY 1, 2
            ),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents),
            {_fl2_sql_chain("fn", _FL2_SEED.format(carry="", x="n_docs", src="n"), "")},
            nl AS (SELECT e * 65536 + f AS l2n FROM fn16),
            {_fl2_sql_chain("fd", _FL2_SEED.format(carry="term, df, ", x="df", src="df"), "term, df, ")},
            idf AS (
              SELECT term, df,
                     CAST(((nl.l2n - (e * 65536 + f)) * 693147) // 65536
                          AS BIGINT) AS idf_ppm
              FROM fd16 CROSS JOIN nl
            ),
            ranked AS (
              SELECT tf.doc_id, tf.term, tf.tf,
                     tf.tf * idf.idf_ppm AS score_ppm,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * idf.idf_ppm DESC, tf.term ASC
                     ) AS term_rank
              FROM tf JOIN idf USING (term)
            )
            SELECT doc_id, term, tf, score_ppm, term_rank
            FROM ranked WHERE term_rank <= 3
        """,
        "doc_cardinality_sketch": r"""
            WITH toks AS (
              SELECT lang,
                     unnest(list_filter(
                       string_split_regex(lower(trim(coalesce(text,''))), '\s+'),
                       x -> x <> '')) AS tok
              FROM documents
            )
            SELECT lang,
                   CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct,
                   CAST(1 AS INT) AS within_bound
            FROM toks GROUP BY lang
        """,
        "doc_cms_estimate": r"""
            WITH toks AS (
              SELECT unnest(list_filter(
                       string_split_regex(lower(trim(coalesce(text,''))), '\s+'),
                       x -> x <> '')) AS tok
              FROM documents
            ),
            rows_ AS (SELECT unnest(range(4)) AS r),
            cells AS (
              SELECT r,
                     CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':' || tok), 1, 15))
                          AS BIGINT) % 256 AS bucket,
                     count(*) AS n
              FROM toks CROSS JOIN rows_
              GROUP BY 1, 2
            ),
            probes AS (SELECT DISTINCT tok FROM toks)
            SELECT p.tok AS value, CAST(min(c.n) AS BIGINT) AS est_n
            FROM probes p
            CROSS JOIN rows_ r
            JOIN cells c
              ON c.r = r.r
             AND c.bucket = CAST(('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || ':' || p.tok), 1, 15))
                                 AS BIGINT) % 256
            GROUP BY 1
        """,
        "doc_bloom_decontaminate": """
            WITH w AS (
              SELECT doc_id, string_split(trim(coalesce(text,'')), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(ws) >= 8 THEN
                       list_transform(range(1, len(ws) - 8 + 2),
                                      i -> array_to_string(ws[i:(i+7)], ' '))
                     ELSE [] END) AS s
              FROM w
            ),
            eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
            hits AS (
              SELECT sh.doc_id, count(*) AS c
              FROM sh JOIN eval_sh USING (s)
              WHERE sh.doc_id % 97 <> 0
              GROUP BY sh.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.c, 0) AS BIGINT) AS n_hits,
                   CAST(CASE WHEN coalesce(h.c, 0) > 0 THEN 1 ELSE 0 END AS INT)
                     AS contaminated,
                   CAST(1 AS INT) AS no_false_negative
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 97 <> 0
        """,
        "evt_value_quantiles": """
            WITH a AS (
              SELECT event_type,
                     quantile_cont(value, [0.25, 0.5, 0.75, 0.9, 0.99]) AS vs
              FROM events GROUP BY event_type
            ),
            q AS (
              SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
                     unnest(range(5)) AS i
            )
            SELECT a.event_type, q.q,
                   CAST(floor(a.vs[CAST(q.i AS INT) + 1] * 1e6 + 0.5) AS BIGINT)
                     AS value_ppm
            FROM a CROSS JOIN q
        """,
        "evt_rolling_metrics": """
            SELECT event_id, user_id,
                   CAST(count(*) OVER w AS BIGINT) AS rolling_n,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                        AS BIGINT) AS rolling_sum_scaled
            FROM events
            WINDOW w AS (
              PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW
            )
        """,
        "evt_outliers": """
            WITH v AS (
              SELECT event_id, event_type,
                     CAST(floor(value * 10000 + 0.5) AS HUGEINT) AS vfp
              FROM events
            ),
            st AS (
              SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS n,
                     sum(vfp) AS s,
                     sum(vfp * vfp) AS ss
              FROM v GROUP BY event_type
            )
            SELECT v.event_id, v.event_type,
                   CAST(v.vfp AS BIGINT) AS value_fp,
                   (st.n * v.vfp - st.s) * (st.n * v.vfp - st.s)
                     > 9 * (st.n * st.ss - st.s * st.s) AS is_outlier
            FROM v JOIN st USING (event_type)
        """,
        "evt_asof_join": """
            WITH l AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ),
            r AS (
              SELECT user_id, ts, max(value) AS value FROM events
              WHERE event_type = 'view' GROUP BY user_id, ts
            )
            SELECT l.event_id, l.user_id,
                   epoch_us(l.ts) AS ts_us,
                   epoch_us(r.ts) AS view_ts_us,
                   CAST(floor(r.value * 10000 + 0.5) AS BIGINT) AS view_value_fp
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts > r.ts
        """,
        "evt_interval_join": """
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (
                       PARTITION BY user_id ORDER BY ts, new_s DESC
                       ROWS UNBOUNDED PRECEDING
                     ) AS sid
              FROM o
            ),
            sess AS (
              SELECT user_id,
                     min(ts) AS s_start, max(ts) AS s_end,
                     epoch_us(min(ts)) AS session_start_us
              FROM s GROUP BY user_id, sid
            )
            SELECT e.event_id, e.user_id, sess.session_start_us
            FROM events e
            JOIN sess ON e.user_id = sess.user_id
                     AND e.ts BETWEEN sess.s_start AND sess.s_end
        """,
        "evt_retention_cohorts": """
            WITH p AS (
              SELECT user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS p
              FROM events
            ),
            c AS (
              SELECT user_id, min(p) AS cohort_period FROM p GROUP BY user_id
            ),
            a AS (SELECT DISTINCT user_id, p FROM p)
            SELECT c.cohort_period,
                   a.p - c.cohort_period AS period_offset,
                   count(*) AS n_keys
            FROM a JOIN c USING (user_id)
            WHERE a.p >= c.cohort_period
            GROUP BY 1, 2
        """,
        "doc_heavy_hitters": r"""
            WITH toks AS (
              SELECT lang,
                     unnest(string_split_regex(lower(trim(coalesce(text,''))), '\s+')) AS tok
              FROM documents
            ),
            c AS (
              SELECT lang, tok AS value, count(*) AS n
              FROM toks WHERE tok <> '' GROUP BY 1, 2
            )
            SELECT lang, value, n, CAST(rank AS INT) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY lang ORDER BY n DESC, value) AS rank
              FROM c
            ) WHERE rank <= 5
        """,
        "doc_winnow_fingerprints": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(
                       lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g'),
                       '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ),
            h AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, greatest(len(ws) - 4, 0)),
                       i -> CAST(('0x' || substr(md5('winnow:' ||
                              ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              || ' ' || ws[i+3] || ' ' || ws[i+4]), 1, 15))
                            AS BIGINT)) AS hs
              FROM w
            ),
            f AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(hs) - 3, 0)),
                       i -> list_aggregate(hs[i:i+3], 'min'))) AS fps
              FROM h
            )
            SELECT doc_id, unnest(fps) AS fp FROM f
        """,
        "doc_winnow_pairs": r"""
            WITH w AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(regexp_replace(
                       lower(coalesce(text,'')), '[^a-z0-9]+', ' ', 'g'),
                       '\s+', ' ', 'g')), ' ') AS ws
              FROM documents
            ),
            h AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, greatest(len(ws) - 4, 0)),
                       i -> CAST(('0x' || substr(md5('winnow:' ||
                              ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              || ' ' || ws[i+3] || ' ' || ws[i+4]), 1, 15))
                            AS BIGINT)) AS hs
              FROM w
            ),
            f AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(hs) - 3, 0)),
                       i -> list_aggregate(hs[i:i+3], 'min'))) AS fps
              FROM h
            ),
            inv AS (
              SELECT doc_id AS id, fp FROM (SELECT doc_id, unnest(fps) AS fp FROM f)
              QUALIFY count(*) OVER (PARTITION BY fp) <= 256
            )
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
            FROM inv a JOIN inv b USING (fp)
            WHERE a.id < b.id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "doc_pmi_bigrams": rf"""
            WITH w AS (
              SELECT list_filter(
                       string_split_regex(lower(trim(coalesce(text,''))), '\s+'),
                       x -> x <> '') AS ws
              FROM documents
            ),
            uni AS (
              SELECT tok AS w, count(*) AS n_w FROM (
                SELECT unnest(ws) AS tok FROM w
              ) GROUP BY 1
            ),
            big AS (
              SELECT bg, count(*) AS n_pair FROM (
                SELECT unnest(list_transform(range(1, len(ws)),
                       i -> ws[i] || chr(1) || ws[i+1])) AS bg
                FROM w
              ) GROUP BY 1 HAVING count(*) >= 3
            ),
            n AS (SELECT CAST(sum(len(ws)) AS BIGINT) AS n_tokens FROM w),
            {_fl2_sql_chain("pn", _FL2_SEED.format(carry="", x="n_tokens", src="n"), "")},
            pnl AS (SELECT e * 65536 + f AS l2n FROM pn16),
            {_fl2_sql_chain("pu", _FL2_SEED.format(carry="w, n_w, ", x="n_w", src="uni"), "w, n_w, ")},
            pul AS (SELECT w, n_w, e * 65536 + f AS l2w FROM pu16),
            {_fl2_sql_chain("pb", _FL2_SEED.format(carry="bg, n_pair, ", x="n_pair", src="big"), "bg, n_pair, ")},
            pbl AS (SELECT bg, n_pair, e * 65536 + f AS l2p FROM pb16)
            SELECT replace(pbl.bg, chr(1), ' ') AS bigram,
                   pbl.n_pair,
                   ul.n_w AS n_left,
                   ur.n_w AS n_right,
                   CAST(((pbl.l2p + pnl.l2n - ul.l2w - ur.l2w) * 693147)
                        // 65536 AS BIGINT) AS pmi_ppm
            FROM pbl
            JOIN pul ul ON ul.w = string_split(pbl.bg, chr(1))[1]
            JOIN pul ur ON ur.w = string_split(pbl.bg, chr(1))[2]
            CROSS JOIN pnl
            ORDER BY pmi_ppm DESC, bigram
            LIMIT 50
        """,
        "doc_shuffle_order": """
            SELECT doc_id,
                   row_number() OVER (
                     ORDER BY CAST(('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 15))
                                   AS BIGINT), doc_id
                   ) AS shuffle_rank
            FROM documents
        """,
        "doc_gopher_filter": r"""
            WITH w AS (
              SELECT doc_id, trim(coalesce(text,'')) AS t,
                     coalesce(text,'') AS raw,
                     string_split(trim(coalesce(text,'')), ' ') AS ws
              FROM documents
            ),
            gc AS (
              SELECT doc_id, tok, count(*) AS c FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)),
                              i -> ws[i] || ' ' || ws[i+1])) AS tok
                FROM w
              ) GROUP BY doc_id, tok
            ),
            gtop AS (
              SELECT doc_id, tok AS top_2gram, c AS top_2gram_n FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
                FROM gc
              ) WHERE rn = 1
            ),
            base AS (
              SELECT w.doc_id,
                     CAST(len(ws) AS BIGINT) AS n_words,
                     length(t) AS n_chars_t,
                     CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
                          AS BIGINT) AS total_word_chars,
                     len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
                       AS n_alpha_words,
                     length(t) - length(replace(t, '#', '')) AS n_hash,
                     (length(t) - length(replace(t, '...', ''))) // 3 AS n_ellipsis,
                     string_split(raw, chr(10)) AS lines_,
                     len(list_filter(['the','be','to','of','and','that','have','with'],
                         s -> list_contains(list_transform(ws, x -> lower(x)), s)))
                       AS n_req_stopwords,
                     coalesce(gtop.top_2gram, '') AS top_2gram,
                     CAST(coalesce(gtop.top_2gram_n, 0) AS BIGINT) AS top_2gram_n
              FROM w LEFT JOIN gtop USING (doc_id)
            ),
            r AS (
              SELECT doc_id, n_words,
                     n_words >= 10 AND n_words <= 100000 AS r_word_count,
                     total_word_chars >= 3*n_words
                       AND total_word_chars <= 10*n_words AS r_mean_word_len,
                     10*(n_hash + n_ellipsis) <= n_words AS r_symbol_ratio,
                     10*len(list_filter(lines_, ln -> ln LIKE '- %'
                        OR ln LIKE '* %' OR ln LIKE '•%'))
                       <= 9*len(lines_) AS r_bullet_lines,
                     10*len(list_filter(lines_, ln -> ln LIKE '%...'))
                       <= 3*len(lines_) AS r_ellipsis_lines,
                     5*n_alpha_words >= 4*n_words AS r_alpha_words,
                     n_req_stopwords >= 2 AS r_stopwords,
                     5*top_2gram_n*length(top_2gram) <= n_chars_t AS r_top_2gram
              FROM base
            )
            SELECT doc_id, n_words, r_word_count, r_mean_word_len,
                   r_symbol_ratio, r_bullet_lines, r_ellipsis_lines,
                   r_alpha_words, r_stopwords, r_top_2gram,
                   (r_word_count AND r_mean_word_len AND r_symbol_ratio
                    AND r_bullet_lines AND r_ellipsis_lines AND r_alpha_words
                    AND r_stopwords AND r_top_2gram) AS keep
            FROM r
        """,
        "doc_dsir_weights": rf"""
            WITH toks AS (
              SELECT doc_id, (lang = 'en') AS is_target,
                     CAST(('0x' || substr(md5('dsir:' || tok), 1, 15)) AS BIGINT)
                       % 1024 AS bucket
              FROM (
                SELECT doc_id, lang,
                       unnest(string_split_regex(lower(trim(coalesce(text,''))), '\s+')) AS tok
                FROM documents
              ) WHERE tok <> ''
            ),
            counts AS (
              SELECT bucket,
                     sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
                     count(*) AS cr
              FROM toks GROUP BY 1
            ),
            totals AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM counts),
            {_fl2_sql_chain("gt", _FL2_SEED.format(carry="", x="tt + 1024", src="totals"), "")},
            gtl AS (SELECT e * 65536 + f AS l2tt FROM gt16),
            {_fl2_sql_chain("gr", _FL2_SEED.format(carry="", x="tr + 1024", src="totals"), "")},
            grl AS (SELECT e * 65536 + f AS l2tr FROM gr16),
            {_fl2_sql_chain("bc", _FL2_SEED.format(carry="bucket, cr, ", x="ct + 1", src="counts"), "bucket, cr, ")},
            bcl AS (SELECT bucket, cr, e * 65536 + f AS l2ct FROM bc16),
            {_fl2_sql_chain("br", _FL2_SEED.format(carry="bucket, l2ct, ", x="cr + 1", src="bcl"), "bucket, l2ct, ")},
            lr AS (
              SELECT bucket,
                     CAST(((l2ct + grl.l2tr - (e * 65536 + f) - gtl.l2tt)
                           * 693147) // 65536 AS BIGINT) AS lr_ppm
              FROM br16 CROSS JOIN gtl CROSS JOIN grl
            ),
            per_doc AS (
              SELECT t.doc_id, count(*) AS n_tokens,
                     sum(lr.lr_ppm) AS w
              FROM toks t JOIN lr USING (bucket) GROUP BY 1
            )
            SELECT d.doc_id,
                   coalesce(p.n_tokens, 0) AS n_tokens,
                   CAST(coalesce(p.w, 0) AS BIGINT) AS dsir_logratio_ppm
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
        """,
        "evt_windowed_metrics": """
            SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT)
                     AS window_start,
                   event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS BIGINT)
                     AS sum_value_fp
            FROM events GROUP BY 1, 2
        """,
        "cdc_content_router": """
            SELECT event_id AS offset,
                   CASE WHEN value >= 150 THEN 'hot' ELSE 'cold' END AS route
            FROM events
        """,
        "cdc_logical_table_router": """
            SELECT event_id AS offset,
                   'shard_' || CAST(user_id % 4 AS VARCHAR) || '.' || event_type
                     AS physical_table,
                   'all_shards.' || event_type AS logical_table
            FROM events
        """,
        "doc_exact_dedup": f"""
            SELECT sha256({norm}) AS digest, min(doc_id) AS doc_id,
                   count(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "doc_token_stats": f"""
            SELECT doc_id,
                   CAST(CASE WHEN trim(coalesce(text,'')) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(coalesce(text,'')), '\\s+'))
                        END AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(coalesce(text,''),
                     '(''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+)', 1))
                     AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "doc_fingerprint": f"""
            SELECT doc_id, md5({norm}) AS fp FROM documents
        """,
        "doc_quality": """
            WITH q AS (
              SELECT doc_id,
                     length(coalesce(text,'')) AS n_chars,
                     CASE WHEN length(coalesce(text,'')) > 0 THEN
                       CAST(length(regexp_replace(coalesce(text,''),
                         '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
                         / length(coalesce(text,''))
                     ELSE 0 END AS pr,
                     CASE WHEN len(string_split(lower(trim(coalesce(text,''))), ' ')) > 0 THEN
                       CAST(len(list_filter(
                         regexp_split_to_array(lower(trim(coalesce(text,''))), '\\s+'),
                         t -> list_contains(['the','and','of','to','in','a','is','that','it','for','on','was','with','as','are','be','this','at','by','an'], t)))
                         AS DOUBLE)
                         / len(regexp_split_to_array(lower(trim(coalesce(text,''))), '\\s+'))
                     ELSE 0 END AS sr
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN n_chars BETWEEN 200 AND 20000 THEN 10
                        WHEN n_chars > 0 THEN 5 ELSE 0 END AS len_score,
                   CASE WHEN pr >= 0.005 AND pr <= 0.2 THEN 10 ELSE 5 END AS punct_score,
                   CASE WHEN sr >= 0.1 THEN 10 WHEN sr > 0 THEN 5 ELSE 0 END
                     AS stopword_score
            FROM q
        """,
        "doc_langid": """
            WITH p AS (
              SELECT doc_id, ' ' || lower(coalesce(text,'')) || ' ' AS t
              FROM documents WHERE lang IN ('en','de','fr','es')
            ), s AS (
              SELECT doc_id,
                CAST((length(t)-length(regexp_replace(t,'the','','g')))/3 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'and','','g')))/3 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'of','','g')))/2 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'to','','g')))/2 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'in','','g')))/2 AS INT) AS s_en,
                CAST((length(t)-length(regexp_replace(t,'der','','g')))/3 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'die','','g')))/3 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'und','','g')))/3 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'das','','g')))/3 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'ist','','g')))/3 AS INT) AS s_de,
                CAST((length(t)-length(regexp_replace(t,'le','','g')))/2 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'la','','g')))/2 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'les','','g')))/3 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'et','','g')))/2 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'est','','g')))/3 AS INT) AS s_fr,
                CAST((length(t)-length(regexp_replace(t,'el','','g')))/2 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'la','','g')))/2 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'que','','g')))/3 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'de','','g')))/2 AS INT)
                + CAST((length(t)-length(regexp_replace(t,'los','','g')))/3 AS INT) AS s_es
              FROM p
            )
            SELECT doc_id,
              CASE
                WHEN s_fr > 0 AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
                WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de THEN 'es'
                WHEN s_en > 0 AND s_en >= s_de THEN 'en'
                WHEN s_de > 0 THEN 'de'
                ELSE 'unk'
              END AS lang_guess
            FROM s
        """,
        "doc_minhash_bands": f"""
            WITH s AS (
              SELECT doc_id, {shingles3} AS sh FROM documents
            )
            SELECT doc_id,
                   list_aggregate(list_transform(sh, g -> md5('0:' || g)), 'min') AS mh0,
                   list_aggregate(list_transform(sh, g -> md5('1:' || g)), 'min') AS mh1,
                   list_aggregate(list_transform(sh, g -> md5('2:' || g)), 'min') AS mh2,
                   list_aggregate(list_transform(sh, g -> md5('3:' || g)), 'min') AS mh3
            FROM s WHERE len(sh) > 0
        """,
        "emb_topk_cosine": f"""
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   {_scaled_sql("list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q))")} AS cos_c
            FROM embeddings
            ORDER BY cos_c DESC, vec_id
            LIMIT 10
        """,
        "emb_near_dups": f"""
            WITH b AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                     {_bucket_sql(64, 8)} AS bucket
              FROM embeddings
            )
            SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                   {_scaled_sql("list_cosine_similarity(a.e, b2.e)")} AS cos_c
            FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
            WHERE {_scaled_sql("list_cosine_similarity(a.e, b2.e)")} >= 3000
        """,
        "emb_semantic_dedup": f"""
            WITH RECURSIVE b AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                     {_bucket_sql(64, 8)} AS bucket
              FROM embeddings
            ),
            pairs AS (
              SELECT a.vec_id AS id_a, b2.vec_id AS id_b
              FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
              WHERE {_scaled_sql("list_cosine_similarity(a.e, b2.e)")} >= 3000
            ),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b AS a, id_a AS b FROM pairs
            ),
            nodes AS (SELECT DISTINCT a AS id FROM edges),
            reach(src, node) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
            ),
            cc AS (SELECT src AS id, min(node) AS component FROM reach GROUP BY src)
            SELECT v.vec_id,
                   COALESCE(cc.component, v.vec_id) AS component,
                   COALESCE(cc.component, v.vec_id) = v.vec_id AS kept
            FROM embeddings v LEFT JOIN cc ON cc.id = v.vec_id
        """,
        "doc_chunk_windows": """
            WITH w AS (
              SELECT doc_id,
                     CASE WHEN trim(coalesce(text, '')) = '' THEN CAST([] AS VARCHAR[])
                          ELSE regexp_split_to_array(trim(coalesce(text, '')), '\\s+')
                     END AS ws
              FROM documents
            ),
            b AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
            e AS (
              SELECT doc_id, ws, n, UNNEST(range((n - 1) // 32 + 1)) AS i
              FROM b
            )
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_id,
                   CAST(least(64, n - i * 32) AS BIGINT) AS n_tokens,
                   array_to_string(ws[i * 32 + 1 : i * 32 + 64], ' ') AS chunk_text
            FROM e
        """,
        "doc_mix_sources": """
            WITH w(lang, n_full, frac_ppm) AS (
              VALUES ('en', 2, 400000), ('de', 1, 0),
                     ('es', 0, 600000), ('fr', 0, 250000)
            ),
            d AS (
              SELECT doc_id, documents.lang,
                     n_full + CASE WHEN
                       CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15))
                            AS BIGINT) % 1000000 < frac_ppm
                     THEN 1 ELSE 0 END AS n
              FROM documents JOIN w ON w.lang = documents.lang
            )
            SELECT doc_id, lang, CAST(UNNEST(range(n)) AS BIGINT) AS epoch
            FROM d WHERE n > 0
        """,
        "doc_simhash": _simhash_oracle_sql(),
        "doc_minhash_lsh_pairs": _minhash_lsh_oracle_sql(),
        "doc_simhash_near_dups": _simhash_pairs_oracle_sql(),
        "doc_ngram_jaccard": f"""
            WITH s AS (
              SELECT doc_id AS id, list_sort(list_distinct({shingles3})) AS sh
              FROM documents
            ),
            s2 AS (SELECT id, sh FROM s WHERE len(sh) > 0),
            inv AS (
              SELECT id, g FROM (SELECT id, unnest(sh) AS g FROM s2)
              QUALIFY count(*) OVER (PARTITION BY g) <= 256
            ),
            cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM inv a JOIN inv b USING (g) WHERE a.id < b.id
            ),
            j AS (
              SELECT id_a, id_b,
                     CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                       / len(list_distinct(sa.sh || sb.sh)) AS jac
              FROM cand
              JOIN s2 sa ON sa.id = cand.id_a
              JOIN s2 sb ON sb.id = cand.id_b
            )
            SELECT id_a, id_b, {_scaled_sql("jac")} AS jac_c
            FROM j WHERE jac >= 0.1
        """,
        "doc_dup_clusters": f"""
            WITH RECURSIVE s AS (
              SELECT doc_id AS id, list_sort(list_distinct({shingles3})) AS sh
              FROM documents
            ),
            s2 AS (SELECT id, sh FROM s WHERE len(sh) > 0),
            inv AS (
              SELECT id, g FROM (SELECT id, unnest(sh) AS g FROM s2)
              QUALIFY count(*) OVER (PARTITION BY g) <= 256
            ),
            cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM inv a JOIN inv b USING (g) WHERE a.id < b.id
            ),
            pairs AS (
              SELECT id_a, id_b
              FROM cand
              JOIN s2 sa ON sa.id = cand.id_a
              JOIN s2 sb ON sb.id = cand.id_b
              WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                    / len(list_distinct(sa.sh || sb.sh)) >= 0.1
            ),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs WHERE id_a != id_b
              UNION
              SELECT id_b AS a, id_a AS b FROM pairs WHERE id_a != id_b
            ),
            nodes AS (SELECT DISTINCT a AS id FROM edges),
            reach(src, node) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
            ),
            cc AS (SELECT src AS id, min(node) AS component FROM reach GROUP BY src),
            sizes AS (
              SELECT component, count(*) AS cluster_size FROM cc GROUP BY component
            )
            SELECT cc.id AS doc_id, cc.component, sizes.cluster_size
            FROM cc JOIN sizes USING (component)
        """,
        "doc_pagerank": f"""
            -- AS MATERIALIZED throughout: DuckDB inlines multiply-referenced
            -- CTEs, and the 5 unrolled rounds reference edges/it_k 2x each —
            -- uninlined this oracle re-runs the shingle pipeline ~12x (280s
            -- vs 6s measured at sf0.01)
            WITH s AS MATERIALIZED (
              SELECT doc_id AS id, list_sort(list_distinct({shingles3})) AS sh
              FROM documents
            ),
            s2 AS MATERIALIZED (SELECT id, sh FROM s WHERE len(sh) > 0),
            inv AS MATERIALIZED (
              SELECT id, g FROM (SELECT id, unnest(sh) AS g FROM s2)
              QUALIFY count(*) OVER (PARTITION BY g) <= 256
            ),
            cand AS MATERIALIZED (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM inv a JOIN inv b USING (g) WHERE a.id < b.id
            ),
            pairs AS MATERIALIZED (
              SELECT id_a, id_b
              FROM cand
              JOIN s2 sa ON sa.id = cand.id_a
              JOIN s2 sb ON sb.id = cand.id_b
              WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                    / len(list_distinct(sa.sh || sb.sh)) >= 0.1
            ),
            edges AS MATERIALIZED (
              SELECT id_a AS a, id_b AS b FROM pairs WHERE id_a != id_b
              UNION
              SELECT id_b AS a, id_a AS b FROM pairs WHERE id_a != id_b
            ),
            deg AS MATERIALIZED (SELECT a AS id, count(*) AS degree FROM edges GROUP BY 1),
            nn AS MATERIALIZED (SELECT count(*) AS n FROM deg),
            it0 AS MATERIALIZED (
              SELECT id, degree, 1000000000000 // nn.n AS r
              FROM deg CROSS JOIN nn
            ),
            {_pagerank_rounds_sql(5)}
            SELECT id, CAST(r AS BIGINT) AS rank_scaled FROM it5
        """,
        "evt_transitions": """
            WITH p AS (
              SELECT event_type AS from_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS to_type
              FROM events
            ),
            c AS (
              SELECT from_type, to_type, count(*) AS n
              FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
            ),
            t AS (SELECT from_type, sum(n) AS n_from FROM c GROUP BY 1)
            SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
                   CAST((c.n * 1000000) // t.n_from AS BIGINT) AS p_ppm
            FROM c JOIN t USING (from_type)
        """,
        "doc_pack_shards": """
            WITH t AS (
              SELECT doc_id,
                     CAST(CASE WHEN trim(coalesce(text,'')) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(coalesce(text,'')), '\\s+'))
                          END AS BIGINT) AS n_tokens
              FROM documents
            )
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                          ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        // 500 AS BIGINT) AS shard_id
            FROM t
        """,
        "doc_repetition_stats": """
            WITH w AS (
              SELECT doc_id, string_split(trim(coalesce(text,'')), ' ') AS ws
              FROM documents
            ),
            base AS (
              SELECT doc_id, len(ws) AS n_words,
                     len(list_distinct(ws)) AS n_distinct_words
              FROM w
            ),
            wc AS (
              SELECT doc_id, tok, count(*) AS c FROM (
                SELECT doc_id, unnest(ws) AS tok FROM w
              ) GROUP BY doc_id, tok
            ),
            wtop AS (
              SELECT doc_id, tok AS top_word, c AS top_word_n FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
                FROM wc
              ) WHERE rn = 1
            ),
            gc AS (
              SELECT doc_id, tok, count(*) AS c FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)),
                              i -> ws[i] || ' ' || ws[i+1])) AS tok
                FROM w
              ) GROUP BY doc_id, tok
            ),
            gtop AS (
              SELECT doc_id, tok AS top_2gram, c AS top_2gram_n FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY doc_id ORDER BY c DESC, tok) AS rn
                FROM gc
              ) WHERE rn = 1
            )
            SELECT b.doc_id,
                   CAST(n_words AS INT) AS n_words,
                   CAST(n_distinct_words AS INT) AS n_distinct_words,
                   top_word, top_word_n,
                   coalesce(top_2gram, '') AS top_2gram,
                   CAST(coalesce(top_2gram_n, 0) AS BIGINT) AS top_2gram_n
            FROM base b
            JOIN wtop USING (doc_id)
            LEFT JOIN gtop USING (doc_id)
        """,
        "doc_span_dedup": """
            WITH w AS (
              SELECT doc_id, string_split(trim(coalesce(text,'')), ' ') AS ws
              FROM documents
            ),
            spans AS (
              SELECT doc_id,
                     CAST(unnest(range((len(ws)+15)//16)) AS INT) AS idx,
                     unnest(list_transform(range((len(ws)+15)//16),
                            i -> array_to_string(ws[(i*16+1):(i*16+16)], ' ')))
                       AS span
              FROM w
            ),
            kept AS (
              SELECT doc_id, idx, span FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY span ORDER BY doc_id, idx) AS rn
                FROM spans
              ) WHERE rn = 1
            ),
            totals AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY 1)
            SELECT k.doc_id,
                   string_agg(k.span, ' ' ORDER BY k.idx) AS text_dedup,
                   CAST(max(t.n_spans) AS BIGINT) AS n_spans,
                   count(*) AS n_kept
            FROM kept k JOIN totals t USING (doc_id)
            GROUP BY k.doc_id
        """,
        "doc_hash_sample": """
            WITH h AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5('dbz:' || CAST(doc_id AS VARCHAR)), 1, 15))
                          AS BIGINT) % 1000000 AS sample_bucket
              FROM documents
            )
            SELECT doc_id, sample_bucket FROM h WHERE sample_bucket < 200000
        """,
        "cdc_handling_modes": """
            SELECT o_orderkey,
                   CAST(CAST(o_orderkey AS VARCHAR) || '.25' AS DECIMAL(38,18))::VARCHAR
                     AS price_str,
                   epoch_us(o_orderdate) AS ts_micros,
                   epoch_ms(o_orderdate) AS ts_millis,
                   datediff('day', DATE '1970-01-01', o_orderdate::DATE) AS date_days,
                   to_base64(unhex(md5(CAST(o_orderkey AS VARCHAR)))) AS bin_b64,
                   lower(hex(unhex(md5(CAST(o_orderkey AS VARCHAR))))) AS bin_hex
            FROM orders WHERE o_orderkey % 37 = 0
        """,
        "doc_classifier_score": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(trim(coalesce(text,''))), '\s+')) AS tok
              FROM documents
            ), w AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5('w:' || tok), 1, 15)) AS BIGINT) % 2001 - 1000 AS wt
              FROM toks WHERE tok <> ''
            )
            SELECT doc_id,
                   round(1.0/(1.0+exp(-(CAST(sum(wt) AS DOUBLE)/(1000.0*count(*))))), 9)
                     AS lm_quality
            FROM w GROUP BY doc_id
        """,
        "doc_stratified_sample": """
            SELECT doc_id, lang, sample_rank FROM (
              SELECT doc_id, lang,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY CAST(('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15))
                                     AS BIGINT), doc_id
                     ) AS sample_rank
              FROM documents
            ) WHERE sample_rank <= 25
        """,
        "doc_decontaminate": """
            WITH w AS (
              SELECT doc_id, string_split(trim(coalesce(text,'')), ' ') AS ws
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     unnest(CASE WHEN len(ws) >= 8 THEN
                       list_transform(range(1, len(ws) - 8 + 2),
                                      i -> array_to_string(ws[i:(i+7)], ' '))
                     ELSE [] END) AS s
              FROM w
            ),
            eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
            hits AS (
              SELECT sh.doc_id, count(*) AS c
              FROM sh JOIN eval_sh USING (s)
              WHERE sh.doc_id % 97 <> 0
              GROUP BY sh.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.c, 0) AS BIGINT) AS n_hits,
                   CAST(CASE WHEN coalesce(h.c, 0) > 0 THEN 1 ELSE 0 END AS INT)
                     AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 97 <> 0
        """,
        "doc_pii_scrub": """
            WITH inj AS (
              SELECT doc_id,
                     coalesce(text,'') || ' contact u' ||
                     CAST(doc_id AS VARCHAR) || '@mail.example or +1-555-' ||
                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
              FROM documents
            ),
            s AS (
              SELECT doc_id, text,
                     regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS no_email
              FROM inj
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                     AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(no_email,
                     '\\+?\\d{1,3}[- ]\\d{3,4}[- ]?\\d{4}')) AS BIGINT)
                     AS n_phones,
                   regexp_replace(no_email, '\\+?\\d{1,3}[- ]\\d{3,4}[- ]?\\d{4}',
                     '<PHONE>', 'g') AS text_clean
            FROM s
        """,
        "emb_lsh_topk": _lsh_topk_oracle_sql(),
        "emb_ivf_topk": f"""
            WITH v AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vq
              FROM embeddings WHERE vec_id < 16384
            ),
            dims AS (SELECT unnest(range(64)) AS d),
            c0 AS MATERIALIZED (
              SELECT CAST(vec_id AS INT) AS cid, vq AS cv FROM v WHERE vec_id < 32
            ),
{_kmeans_rounds_sql(2)}
            cf AS MATERIALIZED (
              SELECT cid,
                     list_transform(cv, x -> CAST(x AS DOUBLE) / 1000000.0)
                       AS cvf
              FROM c2
            ),
            av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            q AS (SELECT e AS qe FROM av WHERE vec_id = 0),
            asgn AS (
              SELECT vec_id, cid AS ivf_cell FROM (
                SELECT av.vec_id, cf.cid,
                       row_number() OVER (
                         PARTITION BY av.vec_id
                         ORDER BY {_scaled_sql("list_cosine_similarity(av.e, cf.cvf)")} DESC,
                                  cf.cid
                       ) AS rn
                FROM av CROSS JOIN cf
              ) WHERE rn = 1
            ),
            probes AS (
              SELECT cid FROM (
                SELECT cf.cid,
                       row_number() OVER (
                         ORDER BY {_scaled_sql("list_cosine_similarity((SELECT qe FROM q), cf.cvf)")} DESC,
                                  cf.cid
                       ) AS rn
                FROM cf
              ) WHERE rn <= 4
            )
            SELECT av.vec_id, CAST(asgn.ivf_cell AS INT) AS ivf_cell,
                   {_scaled_sql("list_cosine_similarity(av.e, (SELECT qe FROM q))")} AS cos_c
            FROM av JOIN asgn USING (vec_id)
            WHERE asgn.ivf_cell IN (SELECT cid FROM probes)
            ORDER BY cos_c DESC, vec_id
            LIMIT 10
        """,
        "emb_pq_topk": f"""
            WITH v AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            vt AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vq
              FROM embeddings WHERE vec_id < 16384
            ),
            sv AS MATERIALIZED (
              SELECT vt.vec_id, s.s,
                     list_slice(vt.vq, s.s * 16 + 1, s.s * 16 + 16) AS sq
              FROM vt CROSS JOIN (SELECT unnest(range(4)) AS s) s
            ),
            pdims AS (SELECT unnest(range(16)) AS d),
            p0 AS MATERIALIZED (
              SELECT s, CAST(vec_id AS INT) AS code, sq AS cv
              FROM sv WHERE vec_id < 16
            ),
{_pq_kmeans_rounds_sql(2)}
            cb AS MATERIALIZED (
              SELECT s, code,
                     list_transform(cv, x -> CAST(x AS DOUBLE) / 1000000.0)
                       AS cv
              FROM p2
            ),
            asgn AS (
              SELECT vec_id, s, code FROM (
                SELECT v.vec_id, cb.s, cb.code,
                       row_number() OVER (
                         PARTITION BY v.vec_id, cb.s
                         ORDER BY CAST(floor(list_sum(list_transform(
                             list_zip(list_slice(v.e, cb.s * 16 + 1, cb.s * 16 + 16), cb.cv),
                             x -> (x[1] - x[2]) * (x[1] - x[2])
                           )) * 10000 + 0.5) AS BIGINT) ASC, cb.code ASC
                       ) AS rn
                FROM v CROSS JOIN cb
              ) WHERE rn = 1
            ),
            q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
            dtab AS (
              SELECT cb.s, cb.code,
                     CAST(floor(list_sum(list_transform(
                         list_zip(list_slice((SELECT qe FROM q), cb.s * 16 + 1, cb.s * 16 + 16), cb.cv),
                         x -> (x[1] - x[2]) * (x[1] - x[2])
                       )) * 10000 + 0.5) AS BIGINT) AS d
              FROM cb
            )
            SELECT a.vec_id,
                   CAST(sum(a.code << (4 * a.s)) AS BIGINT) AS pq_code,
                   CAST(sum(d.d) AS BIGINT) AS adc_dist_fp
            FROM asgn a JOIN dtab d ON d.s = a.s AND d.code = a.code
            GROUP BY a.vec_id
            ORDER BY adc_dist_fp ASC, a.vec_id
            LIMIT 10
        """,
        "emb_ivfpq_topk": f"""
            WITH v AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vq
              FROM embeddings WHERE vec_id < 16384
            ),
            dims AS (SELECT unnest(range(64)) AS d),
            c0 AS MATERIALIZED (
              SELECT CAST(vec_id AS INT) AS cid, vq AS cv FROM v WHERE vec_id < 32
            ),
{_kmeans_rounds_sql(2)}
            cf AS MATERIALIZED (
              SELECT cid,
                     list_transform(cv, x -> CAST(x AS DOUBLE) / 1000000.0)
                       AS cvf
              FROM c2
            ),
            av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            q AS (SELECT e AS qe FROM av WHERE vec_id = 0),
            tasgn AS (
              SELECT vec_id, cid FROM (
                SELECT av.vec_id, cf.cid,
                       row_number() OVER (
                         PARTITION BY av.vec_id
                         ORDER BY CAST(floor(list_cosine_similarity(av.e, cf.cvf)
                                            * 10000 + 0.5) AS BIGINT) DESC,
                                  cf.cid ASC
                       ) AS rn
                FROM av CROSS JOIN cf WHERE av.vec_id < 16384
              ) WHERE rn = 1
            ),
            tres AS MATERIALIZED (
              SELECT a.vec_id,
                     list_transform(list_zip(a.e, cf.cvf),
                       x -> CAST(floor((x[1] - x[2]) * 1000000 + 0.5) AS BIGINT))
                       AS rq
              FROM av a
              JOIN tasgn USING (vec_id)
              JOIN cf ON cf.cid = tasgn.cid
              WHERE a.vec_id < 16384
            ),
            sv AS MATERIALIZED (
              SELECT tres.vec_id, s.s,
                     list_slice(tres.rq, s.s * 16 + 1, s.s * 16 + 16) AS sq
              FROM tres CROSS JOIN (SELECT unnest(range(4)) AS s) s
            ),
            pdims AS (SELECT unnest(range(16)) AS d),
            p0 AS MATERIALIZED (
              SELECT s, CAST(vec_id AS INT) AS code, sq AS cv
              FROM sv WHERE vec_id < 16
            ),
{_pq_kmeans_rounds_sql(2)}
            cbf AS MATERIALIZED (
              SELECT s, code,
                     list_transform(cv, x -> CAST(x AS DOUBLE) / 1000000.0)
                       AS cv
              FROM p2
            ),
            probes AS (
              SELECT cid FROM (
                SELECT cf.cid,
                       row_number() OVER (
                         ORDER BY CAST(floor(list_cosine_similarity(
                                    (SELECT qe FROM q), cf.cvf)
                                    * 10000 + 0.5) AS BIGINT) DESC,
                                  cf.cid ASC
                       ) AS rn
                FROM cf
              ) WHERE rn <= 8
            ),
            asgn AS (
              SELECT vec_id, cid AS cell FROM (
                SELECT av.vec_id, cf.cid,
                       row_number() OVER (
                         PARTITION BY av.vec_id
                         ORDER BY CAST(floor(list_cosine_similarity(av.e, cf.cvf)
                                            * 10000 + 0.5) AS BIGINT) DESC,
                                  cf.cid ASC
                       ) AS rn
                FROM av CROSS JOIN cf
              ) WHERE rn = 1
            ),
            cres AS MATERIALIZED (
              SELECT av.vec_id, asgn.cell,
                     list_transform(list_zip(av.e, cf.cvf), x -> x[1] - x[2])
                       AS rf
              FROM av
              JOIN asgn USING (vec_id)
              JOIN cf ON cf.cid = asgn.cell
              WHERE asgn.cell IN (SELECT cid FROM probes)
            ),
            codes AS (
              SELECT vec_id, cell, s, code FROM (
                SELECT r.vec_id, r.cell, cb.s, cb.code,
                       row_number() OVER (
                         PARTITION BY r.vec_id, cb.s
                         ORDER BY CAST(floor(list_sum(list_transform(
                             list_zip(list_slice(r.rf, cb.s * 16 + 1, cb.s * 16 + 16),
                                      cb.cv),
                             x -> (x[1] - x[2]) * (x[1] - x[2])
                           )) * 10000 + 0.5) AS BIGINT) ASC, cb.code ASC
                       ) AS rn
                FROM cres r CROSS JOIN cbf cb
              ) WHERE rn = 1
            ),
            qres AS (
              SELECT cf.cid AS cell,
                     list_transform(list_zip((SELECT qe FROM q), cf.cvf),
                                    x -> x[1] - x[2]) AS qr
              FROM cf WHERE cf.cid IN (SELECT cid FROM probes)
            ),
            dtab AS (
              SELECT qres.cell, cb.s, cb.code,
                     CAST(floor(list_sum(list_transform(
                         list_zip(list_slice(qres.qr, cb.s * 16 + 1, cb.s * 16 + 16),
                                  cb.cv),
                         x -> (x[1] - x[2]) * (x[1] - x[2])
                       )) * 10000 + 0.5) AS BIGINT) AS dd
              FROM qres CROSS JOIN cbf cb
            )
            SELECT c.vec_id, CAST(c.cell AS INT) AS ivf_cell,
                   CAST(sum(c.code << (4 * c.s)) AS BIGINT) AS pq_code,
                   CAST(sum(d.dd) AS BIGINT) AS adc_dist_fp
            FROM codes c
            JOIN dtab d ON d.cell = c.cell AND d.s = c.s AND d.code = c.code
            GROUP BY c.vec_id, c.cell
            ORDER BY adc_dist_fp ASC, c.vec_id
            LIMIT 10
        """,
        "evt_value_histogram": """
            WITH b AS (
              SELECT event_type,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) // 2500 AS bin
              FROM events
            )
            SELECT event_type, CAST(bin AS BIGINT) AS bin,
                   CAST(bin * 2500 AS BIGINT) AS bin_lo_fp,
                   CAST(count(*) AS BIGINT) AS n
            FROM b GROUP BY event_type, bin
        """,
        "doc_unigram_nll": _unigram_nll_oracle_sql(),
        "evt_windowed_topk": """
            WITH c AS (
              SELECT time_bucket(INTERVAL '1 hour', ts) AS w,
                     event_type AS type, count(*) AS n
              FROM events GROUP BY 1, 2
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY w ORDER BY n DESC, type ASC
              ) AS rank
              FROM c
            )
            SELECT CAST(epoch_us(w) AS BIGINT) AS window_start_us,
                   CAST(epoch_us(w + INTERVAL '1 hour') AS BIGINT) AS window_end_us,
                   type, CAST(n AS BIGINT) AS n, CAST(rank AS INT) AS rank
            FROM r WHERE rank <= 3
        """,
        "emb_kmeans": f"""
            WITH v AS MATERIALIZED (
              SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vq
              FROM embeddings
            ),
            dims AS (SELECT unnest(range(64)) AS d),
            c0 AS MATERIALIZED (
              SELECT CAST(vec_id AS INT) AS cid, vq AS cv FROM v WHERE vec_id < 8
            ),
{_kmeans_rounds_sql(3)}
            final AS (
              SELECT vec_id, dist, cid FROM (
                SELECT v.vec_id, c.cid,
                       list_sum(list_transform(
                         list_zip(v.vq, c.cv),
                         x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist,
                       row_number() OVER (
                         PARTITION BY v.vec_id
                         ORDER BY list_sum(list_transform(
                           list_zip(v.vq, c.cv),
                           x -> (x[1] - x[2]) * (x[1] - x[2]))) ASC, c.cid ASC
                       ) AS rn
                FROM v CROSS JOIN c3 c
              ) WHERE rn = 1
            )
            SELECT vec_id AS id, CAST(cid AS INT) AS cluster,
                   CAST(dist AS BIGINT) AS dist_sq
            FROM final
        """,
        "doc_temperature_weights": r"""
            WITH c AS (
              SELECT lang AS "group",
                     CAST(sum(CASE WHEN trim(coalesce(text,'')) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(coalesce(text,'')), '\s+'))
                          END) AS BIGINT) AS n_tokens
              FROM documents GROUP BY 1
            ),
            -- exact integer cube root: float pow only seeds the guess, the
            -- largest k in guess±2 with k^3 <= n*10^18 (HUGEINT-exact) wins,
            -- mirroring text._exact_root_pow_q (1-ulp pow can't flip it)
            p AS (
              SELECT "group", n_tokens,
                     coalesce(list_max(list_filter(
                       [g - 2, g - 1, g, g + 1, g + 2],
                       k -> k >= 0 AND k::HUGEINT * k * k
                            <= n_tokens::HUGEINT * 1000000000000000000
                     )), 0) AS pq
              FROM (
                SELECT "group", n_tokens,
                       CAST(floor(pow(CAST(n_tokens AS DOUBLE), 1.0/3.0)
                                  * 1e6) AS BIGINT) AS g
                FROM c
              )
            )
            SELECT "group", n_tokens,
                   CAST((pq * 1000000) // (SELECT sum(pq) FROM p) AS BIGINT)
                     AS weight_ppm
            FROM p
        """,
        "doc_unimax_mix": r"""
            WITH c AS (
              SELECT lang AS "group",
                     CAST(sum(CASE WHEN trim(coalesce(text,'')) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(coalesce(text,'')), '\s+'))
                          END) AS BIGINT) AS n_tokens
              FROM documents GROUP BY 1
            ),
            caps AS (
              SELECT "group", n_tokens,
                     CAST(n_tokens * 2 AS BIGINT) AS cap_tokens
              FROM c
            ),
            r AS (
              SELECT *, row_number() OVER w AS i,
                     sum(cap_tokens) OVER w AS cum,
                     count(*) OVER () AS L
              FROM caps
              WINDOW w AS (ORDER BY cap_tokens, "group")
            ),
            f AS (
              SELECT *, CASE WHEN cap_tokens * (L - i + 1)
                                  <= 45000 - (cum - cap_tokens)
                        THEN 1 ELSE 0 END AS capped
              FROM r
            ),
            g AS (
              SELECT *, sum(capped) OVER () AS K,
                     sum(cap_tokens * capped) OVER () AS cumK
              FROM f
            ),
            a AS (
              SELECT "group", n_tokens, cap_tokens,
                     CAST(CASE WHEN capped = 1 THEN cap_tokens
                          ELSE (45000 - cumK) // (L - K) END AS BIGINT)
                       AS alloc_tokens
              FROM g
            )
            SELECT "group", n_tokens, cap_tokens, alloc_tokens,
                   CAST(CASE WHEN n_tokens = 0 THEN 0
                        ELSE (alloc_tokens * 1000000) // n_tokens END AS BIGINT)
                     AS epochs_ppm
            FROM a
        """,
        "emb_sq_topk": """
            WITH v AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ),
            dims AS (SELECT unnest(range(64)) AS d),
            hd AS (
              SELECT dims.d, min(e[CAST(dims.d AS INT) + 1]) AS mn,
                     max(e[CAST(dims.d AS INT) + 1]) AS mx
              FROM v CROSS JOIN dims WHERE vec_id < 256 GROUP BY dims.d
            ),
            prm AS (
              SELECT d, mn,
                     CASE WHEN (mx - mn) / 255.0 = 0 THEN 1.0
                          ELSE (mx - mn) / 255.0 END AS st
              FROM hd
            ),
            q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
            qc AS (
              SELECT p.d,
                     greatest(0, least(255, CAST(floor(
                       ((SELECT qe FROM q)[CAST(p.d AS INT) + 1] - p.mn) / p.st + 0.5
                     ) AS BIGINT))) AS c
              FROM prm p
            ),
            codes AS (
              SELECT v.vec_id, p.d,
                     greatest(0, least(255, CAST(floor(
                       (v.e[CAST(p.d AS INT) + 1] - p.mn) / p.st + 0.5
                     ) AS BIGINT))) AS c
              FROM v CROSS JOIN prm p
            )
            SELECT codes.vec_id AS id,
                   CAST(sum((codes.c - qc.c) * (codes.c - qc.c)) AS BIGINT)
                     AS dist_sq
            FROM codes JOIN qc USING (d)
            GROUP BY 1
            ORDER BY dist_sq ASC, id ASC
            LIMIT 10
        """,
        "cdc_column_projection": """
            SELECT event_id AS offset, user_id, event_type, 2 AS n_payload_fields
            FROM events
        """,
        "cdc_topic_name": """
            SELECT event_id AS offset,
                   'repos.lake.' || regexp_replace(event_type || '/v1',
                                                   '[^a-zA-Z0-9\\._\\-]', '_', 'g')
                     AS topic
            FROM events
        """,
        "cdc_message_route": """
            SELECT event_id AS offset,
                   'repos.message' AS topic,
                   'ch' || CAST(user_id % 8 AS VARCHAR) AS key_prefix,
                   'm' AS op,
                   'ch' || CAST(user_id % 8 AS VARCHAR) AS msg_prefix,
                   props AS msg_content,
                   event_id * 10 AS ts_ms
            FROM events
            WHERE event_type = 'click' AND (user_id % 8) <= 3
        """,
        "cdc_heartbeat": """
            SELECT '__debezium-heartbeat.repos' AS topic,
                   'repos' AS server_name,
                   MAX(event_id * 10) AS ts_ms,
                   MAX(event_id) AS offset
            FROM events
            GROUP BY (event_id * 10) // 1000
        """,
        "cdc_outbox_route": """
            SELECT 'outbox.event.' || event_type AS topic,
                   user_id AS agg_key, props AS payload
            FROM events
        """,
        "cdc_tx_commit_filter": """
            WITH e AS (
              SELECT event_id, CAST(event_id // 8 AS BIGINT) AS tx_id, event_type
              FROM events
            )
            SELECT event_id AS offset, tx_id FROM e
            WHERE tx_id IN (SELECT DISTINCT tx_id FROM e WHERE event_type = 'click')
        """,
        "cdc_content_filter": """
            SELECT event_id AS offset, event_type FROM events
            WHERE value >= 100 AND event_type <> 'error'
        """,
        "cdc_snapshot_chunks": """
            WITH r AS (
              SELECT c_custkey,
                     CAST((row_number() OVER (ORDER BY c_custkey) - 1) // 1024
                          AS BIGINT) AS chunk_id
              FROM customer
            )
            SELECT chunk_id, count(*) AS n_rows,
                   min(c_custkey) AS min_key, max(c_custkey) AS max_key
            FROM r GROUP BY chunk_id
        """,
        "mm_media_features": """
            WITH m AS (
              SELECT CAST(g.generate_series AS BIGINT) AS media_id
              FROM generate_series(0, 255) g
            ), k AS (
              SELECT media_id,
                     (['image','audio','video'])[
                       CAST(CAST(('0x' || substr(md5('42:' || CAST(media_id AS VARCHAR)), 1, 15))
                                 AS BIGINT) % 3 AS INT) + 1] AS kind,
                     repeat(sha256('42:' || CAST(media_id AS VARCHAR)), 8) AS payload_text
              FROM m
            )
            SELECT media_id, kind,
                   sha256(payload_text) AS sha256,
                   CAST(length(payload_text) AS BIGINT) AS n_bytes,
                   CAST(CASE WHEN kind = 'video' THEN 4 ELSE 1 END AS INT) AS frames_sampled,
                   8 AS feat_dim
            FROM k
        """,
        "mm_media_resize": """
            WITH m AS (
              SELECT CAST(g.generate_series AS BIGINT) AS media_id
              FROM generate_series(0, 255) g
            ), k AS (
              SELECT media_id,
                     (['image','audio','video'])[
                       CAST(CAST(('0x' || substr(md5('42:' || CAST(media_id AS VARCHAR)), 1, 15))
                                 AS BIGINT) % 3 AS INT) + 1] AS kind,
                     repeat(sha256('42:' || CAST(media_id AS VARCHAR)), 8) AS payload_text
              FROM m
            )
            SELECT media_id,
                   sha256(payload_text || ':64x64') AS resized_sha,
                   CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
                   CAST(64 AS BIGINT) AS n_bytes
            FROM k WHERE kind = 'image'
        """,
        "mm_frame_sample": """
            WITH m AS (
              SELECT CAST(g.generate_series AS BIGINT) AS media_id
              FROM generate_series(0, 255) g
            ), k AS (
              SELECT media_id,
                     (['image','audio','video'])[
                       CAST(CAST(('0x' || substr(md5('42:' || CAST(media_id AS VARCHAR)), 1, 15))
                                 AS BIGINT) % 3 AS INT) + 1] AS kind,
                     repeat(sha256('42:' || CAST(media_id AS VARCHAR)), 8) AS payload_text,
                     (CAST(('0x' || substr(md5('dur:' || CAST(media_id AS VARCHAR)), 1, 15))
                           AS BIGINT) % 5 + 1) * 1000 AS duration_ms
              FROM m
            )
            SELECT media_id,
                   CAST(i AS INT) AS frame_idx,
                   CAST(i * 700 AS BIGINT) AS t_ms,
                   sha256(payload_text || ':' || CAST(i * 700 AS VARCHAR)) AS frame_sha
            FROM k, unnest(range((duration_ms + 699) // 700)) AS t(i)
            WHERE kind = 'video'
        """,
        "cdc_tx_boundaries": """
            WITH d AS (
              SELECT event_id AS off, event_id * 10 AS ts_ms,
                     event_id // 8 AS tx_id, event_type AS coll
              FROM events
            ),
            pc AS (
              SELECT tx_id, coll, count(*) AS c, min(off) AS fo, max(off) AS lo,
                     min(ts_ms) AS bt, max(ts_ms) AS et
              FROM d GROUP BY tx_id, coll
            ),
            t AS (
              SELECT tx_id, sum(c) AS n, min(fo) AS fo, max(lo) AS lo,
                     min(bt) AS bt, max(et) AS et,
                     string_agg(coll || ':' || CAST(c AS VARCHAR), ','
                                ORDER BY coll) AS colls
              FROM pc GROUP BY tx_id
            )
            SELECT 'spark-cdc.transaction' AS topic, 'BEGIN' AS status, tx_id,
                   CAST(NULL AS BIGINT) AS event_count, fo AS offset,
                   bt AS ts_ms, '' AS collections
            FROM t
            UNION ALL
            SELECT 'spark-cdc.transaction', 'END', tx_id, CAST(n AS BIGINT),
                   lo, et, colls
            FROM t
        """,
        "cdc_cloudevents_attrs": f"""
            SELECT event_id AS offset,
                   'id:' || CAST(event_id AS VARCHAR) AS ce_id,
                   'io.debezium.spark.datachangeevent.' || {_OP_CASE_SQL} AS ce_type,
                   '1.0' AS ce_spec,
                   'application/json' AS ce_dct,
                   strftime(make_timestamp(CAST(floor(epoch_us(ts) / 1000) AS BIGINT) * 1000),
                            '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS ce_time,
                   {_OP_CASE_SQL} AS ce_ext_op,
                   'spark-cdc' AS ce_ext_conn
            FROM events
        """,
        "tpch_q1_pricing": """
            WITH c AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
                     CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ep_c,
                     CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_c
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            )
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
                   CAST(sum(ep_c) AS BIGINT) AS sum_base_price_c,
                   CAST(sum(ep_c * (100 - disc_c)) AS BIGINT) AS sum_disc_price_c,
                   count(*) AS count_order
            FROM c
            GROUP BY l_returnflag, l_linestatus
        """,
        "cdc_read_to_insert": """
            SELECT op, count(*) AS n FROM (
              SELECT CASE event_type WHEN 'signup' THEN 'c' WHEN 'view' THEN 'c'
                          WHEN 'error' THEN 'd' ELSE 'u' END AS op
              FROM events) t
            GROUP BY op
        """,
        "cdc_crdt_pn_counter": f"""
            WITH ops AS (SELECT user_id, {_OP_CASE_SQL} AS op FROM events)
            SELECT user_id,
                   CAST(sum(CASE WHEN op IN ('c','r') THEN 1 ELSE 0 END) AS BIGINT) AS adds,
                   CAST(sum(CASE WHEN op = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS removes,
                   CAST(sum(CASE WHEN op IN ('c','r') THEN 1 ELSE 0 END)
                        - sum(CASE WHEN op = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS value
            FROM ops GROUP BY user_id
        """,
        "cdc_serde_roundtrip": f"""
            SELECT event_id AS offset,
                   CASE WHEN {_OP_CASE_SQL} = 'd' THEN NULL ELSE event_type END
                       AS rt_event_type,
                   CASE WHEN {_OP_CASE_SQL} = 'd' THEN NULL ELSE props END AS rt_props
            FROM events
        """,
        "dt_variable_scale_decimal": """
            WITH u AS (
              SELECT o_orderkey,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS un
              FROM orders
            ), h0 AS (
              SELECT o_orderkey, un, upper(format('{:x}', un)) AS h FROM u
            ), h1 AS (
              SELECT o_orderkey, un,
                     CASE WHEN length(h) % 2 = 1 THEN '0' || h ELSE h END AS h
              FROM h0
            )
            SELECT o_orderkey, 2 AS vsd_scale,
                   CASE WHEN substr(h, 1, 1) IN ('8','9','A','B','C','D','E','F')
                        THEN '00' || h ELSE h END AS vsd_hex,
                   un AS unscaled_back
            FROM h1
        """,
        "dt_bits": """
            SELECT event_id,
                   upper(regexp_replace(
                     lpad(format('{:x}', (event_id >> 0)  & 255), 2, '0') ||
                     lpad(format('{:x}', (event_id >> 8)  & 255), 2, '0') ||
                     lpad(format('{:x}', (event_id >> 16) & 255), 2, '0') ||
                     lpad(format('{:x}', (event_id >> 24) & 255), 2, '0') ||
                     lpad(format('{:x}', (event_id >> 32) & 255), 2, '0') ||
                     lpad(format('{:x}', (event_id >> 40) & 255), 2, '0') ||
                     lpad(format('{:x}', (event_id >> 48) & 255), 2, '0') ||
                     lpad(format('{:x}', (event_id >> 56) & 255), 2, '0'),
                     '(00)+$', '')) AS bits_hex,
                   event_id AS bits_back
            FROM events
        """,
        "dt_point_wkb": """
            SELECT c_custkey, c_acctbal AS pt_x, CAST(c_custkey AS DOUBLE) AS pt_y,
                   21 AS wkb_len
            FROM customer
        """,
        "dt_avro_binary": """
            WITH b AS (
              SELECT doc_id,
                     octet_length(encode(lang)) AS ln,
                     octet_length(encode(text)) AS lm,
                     hex(encode(lang)) AS hn,
                     hex(encode(text)) AS hm
              FROM documents
            )
            SELECT doc_id,
                   upper(
                     '02' ||
                     CASE WHEN ln < 64 THEN lpad(format('{:x}', ln*2), 2, '0')
                          ELSE lpad(format('{:x}', (ln*2) % 128 + 128), 2, '0')
                            || lpad(format('{:x}', (ln*2) // 128), 2, '0') END
                     || hn ||
                     '02' ||
                     CASE WHEN lm < 64 THEN lpad(format('{:x}', lm*2), 2, '0')
                          ELSE lpad(format('{:x}', (lm*2) % 128 + 128), 2, '0')
                            || lpad(format('{:x}', (lm*2) // 128), 2, '0') END
                     || hm
                   ) AS avro_hex,
                   CAST(1 + CASE WHEN ln < 64 THEN 1 ELSE 2 END + ln
                      + 1 + CASE WHEN lm < 64 THEN 1 ELSE 2 END + lm
                      AS INTEGER) AS avro_len
            FROM b
        """,
        "dt_protobuf_binary": """
            WITH b AS (
              SELECT doc_id,
                     octet_length(encode(lang)) AS ln,
                     octet_length(encode(text)) AS lm,
                     hex(encode(lang)) AS hn,
                     hex(encode(text)) AS hm
              FROM documents
            )
            SELECT doc_id,
                   upper(
                     '0A' ||
                     CASE WHEN ln < 128 THEN lpad(format('{:x}', ln), 2, '0')
                          ELSE lpad(format('{:x}', ln % 128 + 128), 2, '0')
                            || lpad(format('{:x}', ln // 128), 2, '0') END
                     || hn ||
                     '12' ||
                     CASE WHEN lm < 128 THEN lpad(format('{:x}', lm), 2, '0')
                          ELSE lpad(format('{:x}', lm % 128 + 128), 2, '0')
                            || lpad(format('{:x}', lm // 128), 2, '0') END
                     || hm
                   ) AS proto_hex,
                   CAST(1 + CASE WHEN ln < 128 THEN 1 ELSE 2 END + ln
                      + 1 + CASE WHEN lm < 128 THEN 1 ELSE 2 END + lm
                      AS INTEGER) AS proto_len
            FROM b
        """,
        "cdc_topic_sanitize": """
            WITH t AS (
              SELECT event_id,
                     event_type || '-v+1' AS a,
                     CAST(user_id AS VARCHAR) || '.' || event_type AS b
              FROM events
            ), s AS (
              SELECT event_id, a, b,
                     regexp_replace(a, '[^A-Za-z0-9_.]', '_', 'g') AS sa,
                     regexp_replace(b, '[^A-Za-z0-9_.]', '_', 'g') AS sb
              FROM t
            )
            SELECT event_id,
                   CASE WHEN regexp_matches(substr(a, 1, 1), '^[A-Za-z_]$')
                        THEN sa ELSE '_' || substr(sa, 2, 100000) END
                       AS topic_ok_first,
                   CASE WHEN regexp_matches(substr(b, 1, 1), '^[A-Za-z_]$')
                        THEN sb ELSE '_' || substr(sb, 2, 100000) END
                       AS topic_digit_first
            FROM s
        """,
        "dt_enum": """
            SELECT event_id,
                   CASE WHEN event_type IN ('click','view') THEN event_type END
                       AS enum_ok,
                   CASE WHEN len(list_filter(
                            string_split(event_type || ',click', ','),
                            x -> x <> '' AND x NOT IN ('click','view'))) = 0
                        THEN event_type || ',click' END AS enum_set_ok
            FROM events
        """,
        # io.debezium.time.* temporal family: past-midnight millis/micros/
        # nanos, epoch nanos, year, zoned time, ISO period with
        # stripTrailingZeros seconds, MicroDuration's avg-days-per-month
        # double arithmetic (same association order -> bit-exact).
        "dt_temporal": """
            WITH t AS (
              SELECT event_id, ts,
                     epoch_us(ts) AS us,
                     epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS us_day,
                     event_id % 3 AS y, event_id % 12 AS mo,
                     event_id % 28 AS d, event_id % 24 AS h,
                     event_id % 60 AS mi,
                     CAST(event_id % 60 AS DOUBLE)
                         + CAST(event_id % 4 AS DOUBLE) / 4.0 AS s
              FROM events
            )
            SELECT event_id AS offset,
                   CAST(us_day // 1000 AS INT) AS t_ms,
                   CAST(us_day AS BIGINT) AS t_us,
                   CAST(us_day * 1000 AS BIGINT) AS t_ns,
                   CAST(us * 1000 AS BIGINT) AS ts_ns,
                   CAST(year(ts) AS INT) AS yr,
                   strftime(ts, '%H:%M:%S.%f') || 'Z' AS zt,
                   'P' || y || 'Y' || mo || 'M' || d || 'DT' || h || 'H'
                       || mi || 'M'
                       || regexp_replace(regexp_replace(
                              CAST(CAST(s AS DECIMAL(29,9)) AS VARCHAR),
                              '0+$', ''), '\\.$', '')
                       || 'S' AS period_iso,
                   CAST(trunc(
                       (((((CAST(y AS DOUBLE) * 12.0 + CAST(mo AS DOUBLE))
                              * 30.4375 + CAST(d AS DOUBLE)) * 24.0
                             + CAST(h AS DOUBLE)) * 60.0
                            + CAST(mi AS DOUBLE)) * 60.0 + s)
                       * 1000000.0) AS BIGINT) AS dur_us
            FROM t
        """,
        # SpecialValueDecimal: enum names in string mode, IEEE specials in
        # double mode, null in precise mode; plain '<id>.25' decimals are
        # exact in both engines at scale 6.
        "dt_special_decimal": """
            WITH t AS (
              SELECT event_id,
                     CASE event_id % 7
                          WHEN 0 THEN 'NaN'
                          WHEN 1 THEN 'Infinity'
                          WHEN 2 THEN '-Infinity'
                          ELSE event_id || '.25' END AS raw,
                     CASE event_id % 7
                          WHEN 0 THEN 'NAN'
                          WHEN 1 THEN 'POSITIVE_INFINITY'
                          WHEN 2 THEN 'NEGATIVE_INFINITY' END AS special
              FROM events
            )
            SELECT event_id AS offset,
                   special,
                   COALESCE(special,
                            CAST(CAST(raw AS DECIMAL(38,6)) AS VARCHAR))
                       AS d_str,
                   CASE special
                        WHEN 'NAN' THEN CAST('nan' AS DOUBLE)
                        WHEN 'POSITIVE_INFINITY' THEN CAST('inf' AS DOUBLE)
                        WHEN 'NEGATIVE_INFINITY' THEN CAST('-inf' AS DOUBLE)
                        ELSE CAST(raw AS DOUBLE) END AS d_dbl,
                   CASE WHEN special IS NULL
                        THEN CAST(CAST(raw AS DECIMAL(38,6)) AS VARCHAR)
                        END AS d_prec
            FROM t
        """,
        # Geometry/Geography struct: srid passthrough incl. optional nulls,
        # fixed 21-byte point WKB, bit-exact (x, y) round-trip.
        "dt_geometry": """
            SELECT c_custkey,
                   CASE WHEN c_custkey % 3 <> 0
                        THEN CAST(4326 + c_custkey % 10 AS INT) END AS srid,
                   21 AS wkb_len,
                   CAST(c_acctbal AS DOUBLE) AS pt_x,
                   CAST(c_custkey AS DOUBLE) AS pt_y
            FROM customer
        """,
        # ActivateTracingSpan: parent context extraction, md5-derived span
        # lineage, ts_ms*1000 start micros, db.* tag, injected header.
        "cdc_tracing_span": """
            WITH t AS (
              SELECT event_id,
                     CASE WHEN event_id % 3 = 0
                          THEN substr(md5('t' || event_id), 1, 16) END AS ptr,
                     CASE WHEN event_id % 3 = 0
                          THEN substr(md5('s' || event_id), 1, 16) END AS psp,
                     CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS ts_ms
              FROM events
            ), u AS (
              SELECT event_id, psp, ts_ms,
                     COALESCE(ptr, substr(md5('trace:' || event_id), 1, 16))
                         AS trace_id
              FROM t
            )
            SELECT event_id AS offset,
                   trace_id,
                   psp AS parent_span_id,
                   substr(md5(trace_id || ':db-log-write:' || event_id), 1, 16)
                       AS tx_span_id,
                   substr(md5(trace_id || ':debezium-read:' || event_id), 1, 16)
                       AS op_span_id,
                   ts_ms * 1000 AS start_us,
                   'spark-cdc' AS db_connector,
                   substr(md5(trace_id || ':debezium-read:' || event_id), 1, 16)
                       AS header_spanid
            FROM u
        """,
        # message.key.columns: re-keyed per-(user_id, event_type) aggregation
        "cdc_message_key": """
            SELECT user_id, event_type,
                   COUNT(*) AS n_changes,
                   MAX(event_id) AS max_offset
            FROM events
            GROUP BY user_id, event_type
        """,
    }
