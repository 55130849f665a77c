"""Single-message-transform (SMT) equivalents as DataFrame column algebra.

Each function mirrors a Debezium pipeline operator (SURVEY.md §2.2); all operate on
envelope DataFrames (key, value, offset, ...) or flat unwrapped rows. Everything is
Catalyst-expressible — whole-stage codegen, no Python row path.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .envelope import OP_CREATE, OP_READ

_MSG_KEY_PART = re.compile(r"^\s*([^\s:]+):([^:\s]+)\s*$")


def resolve_message_key(
    spec: str | None,
    table_id: str,
    columns: Sequence[str],
    default_key: Sequence[str],
) -> tuple[str, ...]:
    """``message.key.columns`` custom key mapper (relational/Key.java:92-148,
    ``CustomKeyMapper.getInstance``; config at
    RelationalDatabaseConnectorConfig.java:275).

    ``spec`` is ``'<tableRegex>:<col1,col2>;...'``. Each (tableRegex, col)
    pair becomes the regex ``<tableRegex>.<col>``; a column is a key candidate
    when its fully-qualified name ``<table_id>.<col>`` FULL-matches any of
    them case-insensitively (Predicates.includes semantics,
    function/Predicates.java:205). Candidates keep the TABLE's column order
    (the reference filters ``table.columns()`` in place, not spec order); no
    candidates -> the default primary key. Malformed parts raise (the
    reference's config validator rejects them,
    MSG_KEY_COLUMNS_PATTERN at Key.java:98)."""
    if not spec:
        return tuple(default_key)
    pats: list[re.Pattern[str]] = []
    for part in spec.split(";"):
        if not part.strip():
            continue
        m = _MSG_KEY_PART.match(part)
        if not m:
            raise ValueError(f"invalid message.key.columns part {part!r}")
        tbl, cols = m.group(1), m.group(2)
        for c in cols.split(","):
            # the joining '.' stays a regex-dot — the reference concatenates
            # '<tableRegex>.<col>' into the pattern verbatim (Key.java:121-127)
            pats.append(re.compile(f"^(?:{tbl}.{c})$", re.IGNORECASE))
    candidates = [
        c for c in columns if any(p.match(f"{table_id}.{c}") for p in pats)
    ]
    return tuple(candidates) if candidates else tuple(default_key)


def op_skip_filter(env: DataFrame, skipped: list[str]) -> DataFrame:
    """skipped.operations (EventDispatcher.java:121-122,224): drop selected op codes.
    Tombstones travel with their delete: a null value row is dropped iff 'd' skipped.
    """
    if not skipped:
        return env
    op = F.coalesce(F.col("value.op"), F.lit("d"))  # tombstone => belongs to delete
    return env.where(~op.isin(skipped))


def table_filter(
    df: DataFrame, include: str | None, exclude: str | None, col: str = "table"
) -> DataFrame:
    """table.include.list / table.exclude.list regex filters
    (EventDispatcher.java:189-196; RelationalDatabaseConnectorConfig.java:212,56-57).
    """
    if include:
        df = df.where(F.col(col).rlike(include))
    if exclude:
        df = df.where(~F.col(col).rlike(exclude))
    return df


def _map_payload_field(env: DataFrame, column: str, fn) -> DataFrame:
    """Apply fn(old_col) -> Column to a payload field in both before and after images."""
    out_value = F.col("value")
    for side in ("before", "after"):
        img = out_value.getField(side)
        new_img = F.when(
            img.isNotNull(), img.withField(column, fn(img.getField(column)))
        ).otherwise(img)
        out_value = F.when(
            out_value.isNotNull(), out_value.withField(side, new_img)
        ).otherwise(out_value)
    return env.withColumn("value", out_value)


def mask_column(env: DataFrame, column: str, mask: str) -> DataFrame:
    """MaskStrings constant mode (relational/mapping/MaskStrings.java): replace the
    column's value with a constant, preserving nulls."""
    return _map_payload_field(
        env, column, lambda c: F.when(c.isNotNull(), F.lit(mask)).otherwise(c)
    )


def hash_mask_column(env: DataFrame, column: str, salt: str) -> DataFrame:
    """MaskStrings HashValueConverter (MaskStrings.java:1-185, salted SHA-256):
    value -> sha256(salt || value) hex."""
    return _map_payload_field(
        env,
        column,
        lambda c: F.when(c.isNotNull(), F.sha2(F.concat(F.lit(salt), c), 256)).otherwise(c),
    )


def truncate_column(env: DataFrame, column: str, max_len: int) -> DataFrame:
    """TruncateStrings (relational/mapping/TruncateStrings.java:1-74)."""
    return _map_payload_field(env, column, lambda c: F.substring(c, 1, max_len))


def project_columns(
    env: DataFrame, include: list[str] | None, exclude: list[str] | None,
    key_cols: tuple[str, ...] = ("repo", "path"),
) -> DataFrame:
    """column.include.list / column.exclude.list
    (TableSchemaBuilder.java:122-146 filter param): drop payload fields from both
    images. Key columns are always kept (a key field can't be excluded)."""
    payload_fields = env.schema["value"].dataType["after"].dataType.fieldNames()
    keep = [
        c
        for c in payload_fields
        if c in key_cols
        or ((include is None or c in include) and (exclude is None or c not in exclude))
    ]
    v = F.col("value")

    def prune(img: Column) -> Column:
        return F.when(
            img.isNotNull(), F.struct(*[img.getField(c).alias(c) for c in keep])
        )

    new_value = F.when(
        v.isNotNull(),
        F.struct(
            prune(v.getField("before")).alias("before"),
            prune(v.getField("after")).alias("after"),
            v.getField("op").alias("op"),
            v.getField("ts_ms").alias("ts_ms"),
            v.getField("source").alias("source"),
            v.getField("transaction").alias("transaction"),
        ),
    )
    return env.withColumn("value", new_value)


def propagate_source_types(
    df: DataFrame,
    patterns: str,
    *,
    data_collection: str,
    source_types: dict[str, dict] | None = None,
) -> DataFrame:
    """column.propagate.source.type (relational/mapping/
    PropagateSourceTypeToSchemaParameter.java:23-53): attach the source
    column's type name (upper-cased, :39), length, scale, and comment as the
    schema parameters ``__debezium.source.column.type`` / ``.length`` /
    ``.scale`` / ``.comment`` — on Spark, as StructField METADATA, the schema-
    parameter analogue that survives a parquet round-trip and is what a sink
    reads to re-create source DDL.

    ``patterns``: comma-separated regexes matched case-insensitively against
    the FULL ``<dataCollection>.<column>`` name (Predicates.java:205 semantics,
    same convention as the message prefix filters). ``source_types``: optional
    ``{column: {"type": ..., "length": ..., "scale": ..., "comment": ...}}``
    overrides (e.g. the pre-converter WAL type); a matched column absent from
    the map propagates its current Spark type's simpleString. Flat frames only
    (the unwrapped record stream / lake-bound projection) — driver-side schema
    work, zero row-path cost."""
    import re

    regexes = [
        re.compile(f"(?:{p.strip()})\\Z", re.IGNORECASE)
        for p in patterns.split(",")
        if p.strip()
    ]
    out = df
    for f_ in df.schema.fields:
        full = f"{data_collection}.{f_.name}"
        if not any(r.fullmatch(full) for r in regexes):
            continue
        info = (source_types or {}).get(f_.name, {})
        meta = dict(f_.metadata or {})
        meta["__debezium.source.column.type"] = str(
            info.get("type", f_.dataType.simpleString())
        ).upper()
        for k in ("length", "scale", "comment"):
            if info.get(k) is not None:
                meta[f"__debezium.source.column.{k}"] = str(info[k])
        out = out.withMetadata(f_.name, meta)
    return out


def read_to_insert(env: DataFrame) -> DataFrame:
    """ReadToInsertEvent SMT (connector-mysql transforms/ReadToInsertEvent.java:35-60):
    rewrite snapshot READ events (op='r') to CREATE ('c') so consumers that only
    understand stream ops see the snapshot as inserts. Non-'r' records and
    tombstones (null value — not a valid envelope, :37) pass through untouched."""
    v = F.col("value")
    return env.withColumn(
        "value",
        F.when(
            v.isNotNull() & (v.getField("op") == OP_READ),
            v.withField("op", F.lit(OP_CREATE)),
        ).otherwise(v),
    )


def content_filter(env: DataFrame, condition: str) -> DataFrame:
    """Content-based filter SMT (debezium-scripting transforms/Filter.java:43-50):
    keep records where the SQL expression over the envelope is true. Tombstones are
    kept (they carry no content)."""
    return env.where(F.col("value").isNull() | F.expr(condition))


def content_router(env: DataFrame, route_expr: str, default: str = "default") -> DataFrame:
    """Content-based router (debezium-scripting ContentBasedRouter.java): compute a
    route/topic column from the envelope; downstream writers partition by it."""
    return env.withColumn(
        "route",
        F.when(F.col("value").isNull(), F.lit(default)).otherwise(
            F.coalesce(F.expr(route_expr), F.lit(default))
        ),
    )


def logical_table_router(
    df: DataFrame,
    topic_regex: str,
    topic_replacement: str,
    *,
    table_col: str = "table",
    key_field: str = "__dbz__physicalTableIdentifier",
) -> DataFrame:
    """ByLogicalTableRouter (transforms/ByLogicalTableRouter.java:56): regex-rewrite
    the table/topic name to merge shards into one logical table, preserving the
    physical identity as an extra key field."""
    return df.withColumn(key_field, F.col(table_col)).withColumn(
        table_col, F.regexp_replace(F.col(table_col), topic_regex, topic_replacement)
    )


def topic_name(
    df: DataFrame, *, prefix: str, db_col: str | Column, table_col: str | Column
) -> DataFrame:
    """DefaultTopicNamingStrategy (schema/AbstractTopicNamingStrategy.java:89-125):
    topic = prefix.db.table with non-alphanumerics sanitized to '_'."""
    db = F.col(db_col) if isinstance(db_col, str) else db_col
    tb = F.col(table_col) if isinstance(table_col, str) else table_col
    sanitize = lambda c: F.regexp_replace(c, r"[^a-zA-Z0-9\._\-]", "_")  # noqa: E731
    return df.withColumn(
        "topic", F.concat_ws(".", F.lit(prefix), sanitize(db), sanitize(tb))
    )


def outbox_route(
    df: DataFrame,
    *,
    aggregate_type_col: str = "aggregatetype",
    aggregate_id_col: str = "aggregateid",
    payload_col: str = "payload",
    route_prefix: str = "outbox.event.",
) -> DataFrame:
    """Outbox EventRouter (transforms/outbox/EventRouter.java): events inserted into
    an outbox table are routed by aggregate type, keyed by aggregate id, with the
    payload extracted as the record value."""
    return df.select(
        F.concat(F.lit(route_prefix), F.col(aggregate_type_col)).alias("topic"),
        F.col(aggregate_id_col).alias("key"),
        F.col(payload_col).alias("value"),
    ).repartition(F.col("key"))


def to_cloudevents(
    env: DataFrame,
    *,
    source_uri: str = "/debezium-spark",
    connector: str = "spark-cdc",
    extension_attributes: bool = True,
    keep: list[str] | None = None,
    avro_data_col: str | None = None,
    data_content_type: str | None = None,
) -> DataFrame:
    """CloudEvents converter (converters/CloudEventsConverter.java:1-625):
    envelope -> CloudEvents v1.0 JSON string.

    Emits the full required attribute set (id, source, specversion, type, time,
    datacontenttype) plus the reference's io.debezium extension attributes
    (iodebeziumop/-connector/-tsms/-txid — CloudEventsConverter's
    CE extension naming) when the envelope carries the fields.

    Data payload: JSON by default (SerializerType.JSON). With
    ``avro_data_col`` naming a binary column of framed Avro bodies
    (functions/avro.py), the record carries ``data_base64`` instead of
    ``data`` — the CE v1.0 JSON-format rule for binary data — with
    ``datacontenttype`` ``application/avro`` (SerializerType.AVRO,
    CloudEventsConverter's data serializer switch)."""
    vt = env.schema["value"].dataType
    fields = [
        F.concat_ws(":", F.lit("id"), F.col("offset").cast("string")).alias("id"),
        F.lit(source_uri).alias("source"),
        F.lit("1.0").alias("specversion"),
        F.concat(
            F.lit("io.debezium.spark.datachangeevent."),
            F.coalesce(F.col("value.op"), F.lit("tombstone")),
        ).alias("type"),
        F.lit(
            data_content_type
            or ("application/avro" if avro_data_col else "application/json")
        ).alias("datacontenttype"),
    ]
    if "ts_ms" in vt.fieldNames():
        fields.append(
            # render the UTC wall time via NTZ arithmetic: date_format on a
            # session-zoned TIMESTAMP would re-render ce_time in the driver's
            # timezone on a non-UTC driver
            F.date_format(
                F.timestamp_add(
                    "MILLISECOND",
                    F.col("value.ts_ms"),
                    F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                ),
                "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
            ).alias("time")
        )
    if extension_attributes:
        fields.append(F.coalesce(F.col("value.op"), F.lit("tombstone")).alias("iodebeziumop"))
        fields.append(F.lit(connector).alias("iodebeziumconnector"))
        if "ts_ms" in vt.fieldNames():
            fields.append(F.col("value.ts_ms").alias("iodebeziumtsms"))
        if "transaction" in vt.fieldNames():
            fields.append(F.col("value.transaction.id").alias("iodebeziumtxid"))
            fields.append(
                F.col("value.transaction.total_order").alias("iodebeziumtxtotalorder")
            )
    fields.append(F.col("key").alias("partitionkey"))
    if avro_data_col:
        fields.append(F.base64(F.col(avro_data_col)).alias("data_base64"))
    else:
        fields.append(F.col("value").alias("data"))
    return env.select(
        F.to_json(F.struct(*fields)).alias("cloudevent"),
        F.col("offset"),
        # passthrough columns a caller wants beside the CE string (e.g. the
        # serialized record key in api.DebeziumEngine) — same projection, no
        # post-hoc join needed
        *[F.col(c) for c in (keep or [])],
    )


def heartbeat_records(
    df: DataFrame,
    *,
    interval_ms: int,
    server_name: str,
    ts_col: str = "ts_ms",
    offset_col: str = "offset",
    topics_prefix: str = "__debezium-heartbeat",
) -> DataFrame:
    """P15 heartbeat records (heartbeat/HeartbeatImpl.java:30-69,111-124):
    topic '<topics_prefix>.<server>', key = struct{serverName}, value =
    struct{ts_ms} — emitted at most once per elapsed interval
    (Heartbeat.java:27-49, dispatched at EventDispatcher.java:237-240).

    Batch analogue of the reference's timer: one record per interval window
    the stream actually advanced through, carrying the window's max ts and the
    OFFSET OF THAT SAME EVENT (``max_by`` paired, not two independent maxes —
    on an out-of-order WAL the heartbeat must describe one real event, and
    offsets must never regress relative to ts ordering; ties on ts break by
    the higher offset, deterministically) so a quiet-topic consumer can still
    advance its offset store. Map-side combining groupBy on the window id —
    one slim shuffle row per interval, scale-safe at any event volume.

    ``interval_ms <= 0`` raises: the reference treats interval 0 as
    heartbeat-disabled (Heartbeat.java:31 DEFAULT_INTERVAL=0 -> no-op
    instance), so a 0 here is a caller bug, not a request for one null-window
    record. The window is built with column algebra (no SQL interpolation of
    ``ts_col``).
    """
    if interval_ms <= 0:
        raise ValueError(
            "interval_ms must be > 0 (the reference treats 0 as "
            "heartbeat-disabled: emit nothing by not calling this)"
        )
    ts = F.col(ts_col).cast("long")
    off = F.col(offset_col).cast("long")
    # exact floor division in long arithmetic (pmod keeps it correct for
    # negative ts too; the double division sees an exactly-divisible value
    # whose quotient — an interval count — is far below 2^53)
    step = F.lit(int(interval_ms))
    win = ((ts - F.pmod(ts, step)) / step).cast("long")
    return (
        df.groupBy(win.alias("_hb_window"))
        .agg(
            F.max(ts).alias("ts_ms"),
            F.max_by(off, F.struct(ts, off)).alias("offset"),
        )
        .select(
            F.lit(f"{topics_prefix}.{server_name}").alias("topic"),
            F.struct(F.lit(server_name).alias("serverName")).alias("key"),
            F.struct(F.col("ts_ms")).alias("value"),
            F.col("offset"),
        )
    )
