"""Per-key last-writer-wins resolution over the offset total order.

Debezium itself delegates per-key materialization to Kafka log compaction (tombstones
consumed downstream — EventDispatcher.java:396-420); in Spark we materialize it
explicitly so the MERGE sees exactly one action per key per batch (SURVEY.md §4.3).

Pieces:
  * dedup-by-offset — restart/dup protection analogous to the LSN skip in
    PostgresStreamingChangeEventSource.java:318 (searchWalPosition).
  * PK-change split — an UPDATE whose key changed becomes DELETE(old key) +
    CREATE(new key), per RelationalChangeRecordEmitter.java:111-118,160-174. The two
    derived events share the source offset and are ordered by a sub-sequence column.
  * last-writer-wins argmax — default "ordinal" strategy shuffles only (key,
    long-ordinal) pairs and broadcast-filters the payload rows, so payload bytes
    shuffled scale with live keys, not events; "aggregate" fallback is a single
    map-side-combining max_by groupBy (the hot-key/skew answer — at most one row
    per key per input partition crosses the wire). Window-over-offset ranking
    (row_number DESC = 1) is semantically identical but cannot partial-aggregate,
    which is what rules it out at 10^10 events.

All pure DataFrame ops — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Resolved-action codes consumed by LakeTable.merge().
ACTION_UPSERT = "upsert"
ACTION_DELETE = "delete"


def dedup_by_offset(events: DataFrame, *, sub_seq: str | None = None) -> DataFrame:
    """Drop duplicate offsets (exactly-once within a batch).

    Duplicates arise from replay overlap and deliberate re-delivery; the WAL offset is
    unique per source event, so (offset, is_tombstone[, seq]) identifies an event.
    """
    cols = ["offset"]
    if "is_tombstone" in events.columns:
        cols.append("is_tombstone")
    if sub_seq and sub_seq in events.columns:
        cols.append(sub_seq)
    return events.dropDuplicates(cols)


def split_pk_changes(
    env: DataFrame, key_cols: tuple[str, ...] = ("repo", "path")
) -> DataFrame:
    """Split key-changing UPDATEs into DELETE(old)+CREATE(new).

    Input: envelope rows (key, value, offset[, tx_id, schema_version]).
    Output: same schema + ``seq`` (0 default; delete=0 / create=1 for split pairs) so
    that ordering by (offset, seq) preserves Debezium's emission order
    (RelationalChangeRecordEmitter.java:160-174: delete first, then create).
    """
    v = F.col("value")
    before_key = F.struct(*[v.getField("before").getField(c).alias(c) for c in key_cols])
    after_key = F.struct(*[v.getField("after").getField(c).alias(c) for c in key_cols])
    is_split = (
        v.isNotNull()
        & (v.getField("op") == "u")
        & v.getField("before").isNotNull()
        & v.getField("after").isNotNull()
        & (before_key != after_key)
    )

    vt = env.schema["value"].dataType
    payload_t = vt["after"].dataType
    kt = env.schema["key"].dataType

    delete_value = F.struct(
        v.getField("before").alias("before"),
        F.lit(None).cast(payload_t).alias("after"),
        F.lit("d").alias("op"),
        v.getField("ts_ms").alias("ts_ms"),
        v.getField("source").alias("source"),
        v.getField("transaction").alias("transaction"),
    ).cast(vt)
    create_value = F.struct(
        F.lit(None).cast(payload_t).alias("before"),
        v.getField("after").alias("after"),
        F.lit("c").alias("op"),
        v.getField("ts_ms").alias("ts_ms"),
        v.getField("source").alias("source"),
        v.getField("transaction").alias("transaction"),
    ).cast(vt)

    # One source scan: each row explodes into its delete+create pair (split) or
    # itself (passthrough) — vs three filtered scans of a content-heavy slice.
    def elem(key_c, value_c, seq: int):
        return F.struct(
            key_c.cast(kt).alias("key"), value_c.alias("value"),
            F.lit(seq).alias("seq"),
        )

    arr = F.when(
        F.coalesce(is_split, F.lit(False)),
        F.array(elem(before_key, delete_value, 0), elem(after_key, create_value, 1)),
    ).otherwise(F.array(elem(F.col("key"), F.col("value").cast(vt), 0)))

    extra = [c for c in env.columns if c not in ("key", "value", "offset")]
    return env.select(
        F.col("offset"), *extra, F.explode(arr).alias("_e")
    ).select(
        F.col("_e.key").alias("key"), F.col("_e.value").alias("value"),
        F.col("offset"), *extra, F.col("_e.seq").alias("seq"),
    )


def resolve_lww(
    env: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("repo", "path"),
    salt_buckets: int = 32,
    strategy: str = "ordinal",
    bucket_into=None,
) -> DataFrame:
    """Reduce envelope rows to one action per key: the last writer by (offset, seq).

    Tombstones (value IS NULL) and deletes both resolve to ACTION_DELETE; everything
    else upserts its ``after`` image. The ordering key is one LONG ordinal
    ``offset * 128 + seq`` (WAL/LSN offsets are non-negative and the per-offset
    sub-sequence is < 128 — PK-split emits seq 0/1), and the carried value is a
    slim (after, is_delete, ts_ms, offset) struct.

    Two physical strategies, same result:

      * ``strategy="ordinal"`` (default) — **shuffle ordinals, not payloads.**
        Phase 1 aggregates only (key, ordinal) to each key's winning ordinal:
        a shuffle of a few dozen bytes per event instead of the full row
        payload (~KB per event: at 10^8+ events per batch the payload shuffle
        is memory-/network-bandwidth-bound and dominates the replay). Phase 2
        broadcasts the winning-ordinal set (8-byte longs; one per live key —
        a LongHashedRelation, ~100 MB per 6M keys) and LEFT SEMI-joins the
        envelope on the ordinal: payload rows are filtered map-side with NO
        exchange, because a WAL ordinal is globally unique up to exact
        duplicate re-deliveries. Phase 3 collapses those duplicate winners
        with a per-key max_by — a shuffle of at most one payload row per key.
        Total payload bytes shuffled ∝ live keys, not events.
      * ``strategy="aggregate"`` — single ``max_by(slim_struct, ordinal)``
        groupBy. One partial-aggregating SortAggregate per input partition,
        one exchange carrying at-most-one slim row per (key, partition). This
        is the fallback for the regime where the winner set itself is too big
        to broadcast (10^9+ live keys on small executors): payload moves
        through ONE shuffle, never two, and the map-side combine is the
        hot-key/skew answer — a key with millions of duplicate events still
        ships at most one row per input partition (no salting needed;
        ``salt_buckets`` retained for API compatibility only).

    Phase 1 of the ordinal strategy touches only offset/seq/key columns, so
    Catalyst's nested-schema pruning keeps the payload columns out of that
    scan entirely (verify: ReadSchema in PLANS.md §CDC replay).

    ``bucket_into=(n_buckets, bucket_fn)`` (bucket_fn: first-key-column ->
    bucket Column, e.g. the lake's bucket transform) clusters the FINAL
    aggregation by the storage bucket instead of Spark's default key hash:
    candidates are repartitioned once on ``_bucket`` and the per-key reduce
    runs exchange-free on top (HashPartitioning(_bucket) satisfies
    ClusteredDistribution(_bucket, key) — bucket is a function of the key),
    so the output arrives ALREADY in the lake's write layout. One payload
    shuffle end-to-end instead of two (key-hash agg + bucket repartition);
    at 10^10 events that second payload pass through the wire is the
    difference between shuffle-bound and scan-bound. Rows with a null key
    column get a null ``_bucket`` (quarantine lane). Output gains a
    ``_bucket`` column.

    No serialization round-trip in either strategy: an earlier packed-string
    variant carried the payload through to_json/from_json, where a non-finite
    double (NaN/Infinity) produced unparseable JSON and PERMISSIVE from_json
    nulled the whole slim struct — silently upserting a null ``after`` over
    good data. The struct path carries payload bytes verbatim.

    Returns: key_cols*, action, after(payload struct), _offset, _ts_ms.
    """
    seq = (F.col("seq") if "seq" in env.columns else F.lit(0)).cast("long")
    val0 = F.col("value")
    is_del0 = val0.isNull() | (val0.getField("op") == "d")
    slim = F.struct(
        F.when(~is_del0, val0.getField("after")).alias("after"),
        is_del0.alias("is_delete"),
        F.when(val0.isNotNull(), val0.getField("ts_ms")).alias("ts_ms"),
        F.col("offset").cast("long").alias("offset"),
    )
    ordinal = (F.col("offset").cast("long") * 128 + seq).alias("_ord")
    key_refs = [F.col("key").getField(c).alias(c) for c in key_cols]
    if strategy == "ordinal":
        win = (
            env.select(*key_refs, ordinal)
            .groupBy(*key_cols)
            .agg(F.max("_ord").alias("_ord"))
        )
        ev = env.select(*key_refs, slim.alias("_slim"), ordinal)
        cand = ev.join(F.broadcast(win.select("_ord")), on="_ord", how="left_semi")
    else:
        cand = env.select(*key_refs, slim.alias("_slim"), ordinal)
    group_cols: list = list(key_cols)
    if bucket_into is not None:
        n_buckets, bucket_fn = bucket_into
        key_null = F.lit(False)
        for c in key_cols:
            key_null = key_null | F.col(c).isNull()
        cand = cand.withColumn(
            "_bucket", F.when(~key_null, bucket_fn(F.col(key_cols[0])))
        ).repartition(n_buckets, "_bucket")
        group_cols = ["_bucket", *key_cols]
    agg = cand.groupBy(*group_cols).agg(F.max_by("_slim", "_ord").alias("_w"))
    w = F.col("_w")
    return agg.select(
        *group_cols,
        F.when(w.getField("is_delete"), F.lit(ACTION_DELETE))
        .otherwise(F.lit(ACTION_UPSERT))
        .alias("action"),
        w.getField("after").alias("after"),
        w.getField("offset").alias("_offset"),
        w.getField("ts_ms").alias("_ts_ms"),
    )


def committed_tx_filter(
    events: DataFrame,
    commits: DataFrame,
    *,
    tx_col: str = "tx_id",
    broadcast_commits: bool = True,
) -> DataFrame:
    """Transaction look-ahead buffer (S7, connector-mysql EventBuffer.java:21-45):
    Debezium buffers in-flight transaction events and drops transactions that roll
    back. Spark-first, the buffer is a semi-join: keep only events whose tx id
    appears in the committed set. ``commits`` = one row per committed tx
    (the XID-event stream); broadcast it when the per-batch tx count is small
    (the common case — tx count << event count), else shuffle-join.
    """
    c = commits.select(F.col(tx_col)).distinct()
    if broadcast_commits:
        c = F.broadcast(c)
    return events.join(c, on=tx_col, how="left_semi")


def transaction_metadata(env: DataFrame) -> DataFrame:
    """Per-event transaction block (TransactionMonitor.java:56-72,122-135):
    transaction{id, total_order, data_collection_order} where total_order ranks events
    within a tx and data_collection_order ranks within (tx, table). With a single
    captured table the two coincide; kept separate for parity.
    """
    from pyspark.sql import Window

    # Tombstones carry no envelope (value IS NULL) and get no transaction block
    # (TransactionMonitor skips them); rank only data events so total_order is dense.
    w_tx = Window.partitionBy("tx_id").orderBy("offset")
    rank = F.when(
        F.col("value").isNotNull(),
        F.row_number().over(
            Window.partitionBy(
                "tx_id", F.col("value").isNull()
            ).orderBy("offset")
        ),
    )
    out = env.withColumn("_total_order", rank).withColumn("_dc_order", rank)
    v = F.col("value")
    vt = env.schema["value"].dataType
    new_value = F.when(
        v.isNotNull(),
        F.struct(
            v.getField("before").alias("before"),
            v.getField("after").alias("after"),
            v.getField("op").alias("op"),
            v.getField("ts_ms").alias("ts_ms"),
            v.getField("source").alias("source"),
            F.struct(
                F.col("tx_id").cast("string").alias("id"),
                F.col("_total_order").cast("long").alias("total_order"),
                F.col("_dc_order").cast("long").alias("data_collection_order"),
            ).alias("transaction"),
        ).cast(vt),
    )
    return out.withColumn("value", new_value).drop("_total_order", "_dc_order")
