"""ActivateTracingSpan SMT as a batch transform
(transforms/tracing/ActivateTracingSpan.java:1-186, DebeziumTextMap.java:1-60).

The reference's side effect is two OpenTracing spans per change event — a
``db-log-write`` span tagged with ``db.``-prefixed source fields (started at
``source.ts_ms``), whose child is the ``debezium-read`` operation span tagged
with the envelope's ``op``/``ts_ms`` — plus the child span's context injected
into the record headers. The parent context rides IN the data: a
``java.util.Properties``-serialized text map in the ``after`` block's
``tracingspancontext`` field.

A distributed batch engine can't call a process-global tracer per row, so the
Spark-first re-expression materializes the spans as COLUMNS — a span-export
frame that a sink ships to the tracing backend — and surfaces the injected
context as ``__header_*`` columns (same convention as
``envelope.unwrap(add_headers=...)``). OpenTracing implementations draw
random span ids; a replayable engine derives them from content (md5-hex,
like the tracer-agnostic ids Jaeger renders) so re-runs trace identically
and an oracle can cross-check.

Tombstones (null value) and — under ``tracing.with.context.field.only`` —
events without a propagated context pass through untraced, exactly the
reference's short-circuits (ActivateTracingSpan.java:96-111).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_span_context",
    "span_id",
    "activate_tracing_span",
    "DEFAULT_SPAN_CONTEXT_FIELD",
    "OPERATION_NAME_DEFAULT",
    "TX_LOG_OPERATION_NAME",
    "TRACING_COMPONENT",
]

DEFAULT_SPAN_CONTEXT_FIELD = "tracingspancontext"
OPERATION_NAME_DEFAULT = "debezium-read"
TX_LOG_OPERATION_NAME = "db-log-write"
TRACING_COMPONENT = "debezium"


def parse_span_context(col: Column) -> Column:
    """``DebeziumTextMap.load`` (Properties text format -> map<string,string>).

    Supports the subset ``Properties.store`` emits: one ``key=value`` pair
    per line, ``#``/``!`` comment lines (store always writes a date comment),
    blank lines, and CRLF. Exotic escapes/continuations are out of scope —
    exported span contexts are flat ASCII key-value pairs."""
    # single-arg lambda on purpose: passing F.trim directly would bind
    # transform's (element, index) TWO-arg form -> trim(str, trimStr=index),
    # which strips index digits off the line ends (same pitfall as dedup._h64)
    lines = F.filter(
        F.transform(
            F.split(F.regexp_replace(col, "\r", ""), "\n"), lambda l: F.trim(l)
        ),
        lambda l: (l != "")
        & ~l.startswith("#")
        & ~l.startswith("!")
        & l.contains("="),
    )
    kv = F.array_join(lines, "\n")
    return F.when(col.isNotNull(), F.str_to_map(kv, F.lit("\n"), F.lit("=")))


def span_id(trace_id: Column, operation: str, offset: Column) -> Column:
    """Deterministic 16-hex-char (64-bit) span id for one operation of one
    change event — the replayable stand-in for a tracer's random id."""
    return F.substring(
        F.md5(F.concat_ws(":", trace_id, F.lit(operation), offset.cast("string"))),
        1,
        16,
    )


def activate_tracing_span(
    env: DataFrame,
    *,
    span_context_field: str = DEFAULT_SPAN_CONTEXT_FIELD,
    operation_name: str = OPERATION_NAME_DEFAULT,
    require_context_field: bool = False,
    out: str = "tracing",
) -> DataFrame:
    """Attach the two-span trace + injected headers to an envelope frame.

    Adds one struct column ``out`` =
    ``{trace_id, parent_span_id, tx_log_span, debezium_span}`` where each span
    is ``{operation, span_id, parent_span_id, start_us, finish_us, component,
    tags: map<string,string>}``, plus ``__header_traceid`` /
    ``__header_spanid`` (the ``tracer.inject`` analogue,
    ActivateTracingSpan.java:168-170). Untraced rows carry nulls.

    Tag parity (ActivateTracingSpan.java:130-147): the tx-log span gets every
    non-null ``source.*`` field as ``db.<field>``; the operation span gets
    ``op`` and ``ts_ms``; both get ``component=debezium``. Start timestamps
    are the reference's ``ts_ms * 1_000`` micros."""
    value = env["value"]
    after_fields = [
        f.name for f in env.schema["value"].dataType["after"].dataType.fields
    ]
    ctx_raw = (
        value["after"][span_context_field]
        if span_context_field in after_fields
        else F.lit(None).cast("string")
    )
    parent = parse_span_context(ctx_raw)

    traced = value.isNotNull()
    if require_context_field:
        traced = traced & ctx_raw.isNotNull()

    offset = env["offset"]
    trace_id = F.coalesce(
        parent["traceid"],
        F.substring(F.md5(F.concat(F.lit("trace:"), offset.cast("string"))), 1, 16),
    )
    parent_span_id = parent["spanid"]
    tx_span_id = span_id(trace_id, TX_LOG_OPERATION_NAME, offset)
    op_span_id = span_id(trace_id, operation_name, offset)

    src = value["source"]
    src_fields = [
        f.name for f in env.schema["value"].dataType["source"].dataType.fields
    ]
    # addFieldToSpan skips null values (ActivateTracingSpan.java:176-184)
    db_tags = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(f"db.{f}") for f in src_fields]),
            F.array(*[src[f].cast("string") for f in src_fields]),
        ),
        lambda _, v: v.isNotNull(),
    )
    op_tags = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("op"), F.lit("ts_ms")),
            F.array(value["op"].cast("string"), value["ts_ms"].cast("string")),
        ),
        lambda _, v: v.isNotNull(),
    )

    src_ts, env_ts = src["ts_ms"], value["ts_ms"]

    def _span(op_name, sid, parent_sid, start_ms, finish_ms, tags):
        return F.struct(
            F.lit(op_name).alias("operation"),
            sid.alias("span_id"),
            parent_sid.alias("parent_span_id"),
            (start_ms * 1000).cast("long").alias("start_us"),
            (finish_ms * 1000).cast("long").alias("finish_us"),
            F.lit(TRACING_COMPONENT).alias("component"),
            tags.alias("tags"),
        )

    tracing = F.when(
        traced,
        F.struct(
            trace_id.alias("trace_id"),
            parent_span_id.alias("parent_span_id"),
            _span(
                TX_LOG_OPERATION_NAME, tx_span_id, parent_span_id,
                src_ts, src_ts, db_tags,
            ).alias("tx_log_span"),
            _span(
                operation_name, op_span_id, tx_span_id,
                env_ts, env_ts, op_tags,
            ).alias("debezium_span"),
        ),
    )
    return (
        env.withColumn(out, tracing)
        .withColumn("__header_traceid", F.when(traced, trace_id))
        .withColumn("__header_spanid", F.when(traced, op_span_id))
    )
