"""Debezium JSON serde (io.debezium.serde) as column algebra.

The reference's ``DebeziumSerdes.payloadJson`` (serde/DebeziumSerdes.java:1,
serde/json/JsonSerde.java:1) lets a consumer deserialize Debezium change
records into typed objects, handling three wire shapes:

* Kafka-Connect "schema + payload" wrapper — unwrap from the ``payload``
  field (JsonSerde.java:89-93);
* full Debezium envelope — either returned whole (``as_envelope``) or
  unwrapped from a configured source field, default ``after``
  (JsonSerdeConfig ``from.field``; JsonSerde.java:94-100, the node must carry
  ``source`` to count as an envelope);
* already-extracted records — parsed as-is.

Keys: a single-field JSON object key is unwrapped to its value
(JsonSerde.readKey, JsonSerde.java:105-120).

Spark-first: serialization is ``to_json`` and deserialization is ``from_json``
+ shape-sniffing with ``get_json_object`` — all JVM-side, whole-stage codegen,
no Python row path. The typed-object target is a Spark struct type instead of
a Jackson class; unknown JSON properties are ignored by ``from_json``'s
by-name field matching (the reference's ``unknown.properties.ignored``)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["serialize_records", "deserialize_values", "deserialize_keys"]


def serialize_records(env: DataFrame, *, schema_payload_wrapper: bool = False) -> DataFrame:
    """Envelope frame -> JSON wire records ``(key_json, value_json, offset)``.

    Tombstones keep ``value_json IS NULL`` (a null value, not the string
    'null' — EventDispatcher tombstone contract). With
    ``schema_payload_wrapper`` the value is nested under ``payload`` beside a
    minimal ``schema`` node, the Kafka-Connect ``JsonConverter``
    schemas.enable=true shape the serde must unwrap."""
    key_json = F.to_json(F.col("key"))
    value_json = F.when(F.col("value").isNotNull(), F.to_json(F.col("value")))
    if schema_payload_wrapper:
        value_json = F.when(
            F.col("value").isNotNull(),
            F.to_json(
                F.struct(
                    F.struct(
                        F.lit("struct").alias("type"),
                        F.lit("io.debezium.spark.Envelope").alias("name"),
                    ).alias("schema"),
                    F.col("value").alias("payload"),
                )
            ),
        )
    return env.select(
        key_json.alias("key_json"), value_json.alias("value_json"), F.col("offset")
    )


def _envelope_type(payload_type: T.StructType) -> T.StructType:
    """Envelope *value* type over an arbitrary payload struct (Envelope.java
    before/after/op/ts_ms/source/transaction — independent of key columns)."""
    from .envelope import envelope_schema, source_schema

    try:
        return envelope_schema(payload_type)["value"].dataType
    except KeyError:
        # payload without the default key columns: build the value type directly
        return T.StructType(
            [
                T.StructField("before", payload_type),
                T.StructField("after", payload_type),
                T.StructField("op", T.StringType(), nullable=False),
                T.StructField("ts_ms", T.LongType()),
                T.StructField("source", source_schema()),
                T.StructField(
                    "transaction",
                    T.StructType(
                        [
                            T.StructField("id", T.StringType()),
                            T.StructField("total_order", T.LongType()),
                            T.StructField("data_collection_order", T.LongType()),
                        ]
                    ),
                ),
            ]
        )


def deserialize_values(
    df: DataFrame,
    payload_type: T.StructType,
    *,
    value_col: str = "value_json",
    as_envelope: bool = False,
    from_field: str = "after",
) -> DataFrame:
    """JSON wire values -> typed struct column ``value`` (JsonSerde.readValue).

    Shape handling mirrors JsonSerde.java:86-103: if the JSON object has a
    ``payload`` property the node is first unwrapped from it; then with
    ``as_envelope`` the whole envelope is parsed, otherwise a node that looks
    like an envelope (has ``source`` and the ``from_field``) yields the
    ``from_field`` sub-object and anything else parses as an already-extracted
    record. Null wire values (tombstones) stay null."""
    raw = F.col(value_col)
    # JsonSerde unserializes the tree once; we sniff with get_json_object and
    # parse the selected node — still one JVM projection, no Python.
    payload_node = F.get_json_object(raw, "$.payload")
    node = F.when(payload_node.isNotNull(), payload_node).otherwise(raw)
    if as_envelope:
        parsed: Column = F.from_json(node, _envelope_type(payload_type))
    else:
        env_t = _envelope_type(payload_type)
        is_envelope = (
            F.get_json_object(node, "$.source").isNotNull()
            & F.get_json_object(node, f"$.{from_field}").isNotNull()
        )
        parsed = F.when(
            is_envelope, F.from_json(node, env_t).getField(from_field)
        ).otherwise(F.from_json(node, payload_type))
    return df.withColumn("value", F.when(raw.isNotNull(), parsed))


def deserialize_keys(
    df: DataFrame,
    key_type: T.StructType,
    *,
    key_col: str = "key_json",
) -> DataFrame:
    """JSON wire keys -> typed ``key`` struct (JsonSerde.readKey,
    JsonSerde.java:105-120). The reference unwraps a one-field object key to
    its bare value when the target type is scalar; here the typed target is
    always the key struct, and a one-field key additionally gets the unwrapped
    scalar as ``key_scalar`` (cast to the field's type) for consumers keyed by
    the bare id."""
    payload_node = F.get_json_object(F.col(key_col), "$.payload")
    node = F.when(payload_node.isNotNull(), payload_node).otherwise(F.col(key_col))
    out = df.withColumn("key", F.from_json(node, key_type))
    if len(key_type.fields) == 1:
        f0 = key_type.fields[0]
        out = out.withColumn("key_scalar", F.col(f"key.{f0.name}"))
    return out
