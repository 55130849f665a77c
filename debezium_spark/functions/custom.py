"""Custom converter plug-in registry — the user seam for per-column value
conversion.

Reference:
  * ``io.debezium.spi.converter.CustomConverter`` (CustomConverter.java:18-47):
    a user plug-in sees each column's metadata (``RelationalColumn``: name,
    owning data collection, type name, optionality, length/scale) and may call
    ``registration.register(fieldSchema, converter)`` to claim it.
  * ``io.debezium.relational.CustomConverterRegistry``
    (CustomConverterRegistry.java:32,55-127,136-143): converters are consulted
    in configuration order; the FIRST converter that registers wins the
    column; unclaimed columns fall through to the built-in converters; after a
    DDL change the chain is re-consulted and a stale registration is removed
    (:125-127 "Remove in case the table was altered").
  * Example plug-in: ``TinyIntOneToBooleanConverter``
    (debezium-connector-mysql/.../converters/TinyIntOneToBooleanConverter.java).

Spark-first adaptation: a registration's "conversion function" is pure column
algebra — ``Column -> Column`` plus a target Spark ``DataType`` (the
``SchemaBuilder`` analogue) — NOT a per-row Python callable, so custom
conversions stay JVM-side inside whole-stage codegen, composable with every
other SMT. A converter plug-in itself is an ordinary Python callable
``(RelationalColumn) -> ConverterDefinition | None`` evaluated ONCE per column
at plan-build time (driver-side), never per row.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class RelationalColumn:
    """The column view a plug-in is consulted with (CustomConverter.java:
    RelationalColumn: name/dataCollection/typeName/isOptional/length/scale)."""

    name: str
    data_collection: str          # "<database>.<table>"
    type_name: str                # Spark simpleString of the source type
    is_optional: bool = True
    length: Optional[int] = None
    scale: Optional[int] = None


@dataclass(frozen=True)
class ConverterDefinition:
    """A claimed registration: target field schema + conversion
    (CustomConverterRegistry.ConverterDefinition — fieldSchema + converter)."""

    field_type: T.DataType
    convert: Callable[[Column], Column]


# A plug-in: consulted per column, returns a definition to claim it or None to
# pass (the register-callback flattened into a return value).
CustomConverter = Callable[[RelationalColumn], Optional[ConverterDefinition]]


class CustomConverterRegistry:
    """Ordered converter chain + per-column registration cache.

    Mirrors CustomConverterRegistry.java: ``register_converter_for`` consults
    the chain in order and caches the first claim under the full column name;
    ``value_converter`` returns the cached conversion; re-registering after a
    schema change replaces (or removes) the cached entry.
    """

    def __init__(self, converters: list[CustomConverter] | None = None) -> None:
        self._converters: list[CustomConverter] = list(converters or [])
        self._registrations: dict[str, ConverterDefinition] = {}

    # ---------------------------------------------------------- registration
    def register_converter_for(
        self, column: RelationalColumn
    ) -> ConverterDefinition | None:
        """Consult the chain for one column; first claim wins
        (CustomConverterRegistry.java:55-127)."""
        full = f"{column.data_collection}.{column.name}"
        for conv in self._converters:
            definition = conv(column)
            if definition is not None:
                self._registrations[full] = definition
                return definition
        # table altered and no converter claims the new shape -> forget it
        self._registrations.pop(full, None)
        return None

    def value_converter(
        self, data_collection: str, column_name: str
    ) -> ConverterDefinition | None:
        """Pre-registered conversion lookup (:136-143 getValueConverter)."""
        return self._registrations.get(f"{data_collection}.{column_name}")

    def is_empty(self) -> bool:
        return not self._registrations

    # ----------------------------------------------------------- application
    def _consult_schema(
        self, schema: T.StructType, data_collection: str
    ) -> dict[str, ConverterDefinition]:
        claimed: dict[str, ConverterDefinition] = {}
        for f in schema.fields:
            d = self.register_converter_for(
                RelationalColumn(
                    name=f.name,
                    data_collection=data_collection,
                    type_name=f.dataType.simpleString(),
                    is_optional=f.nullable,
                )
            )
            if d is not None:
                claimed[f.name] = d
        return claimed

    def apply(self, df: DataFrame, data_collection: str) -> DataFrame:
        """Rewrite every claimed column of a FLAT frame (unwrapped payload /
        source table scan). Unclaimed columns pass through untouched — they
        keep whatever built-in conversion applies (TableSchemaBuilder
        consults the registry before falling back to default converters)."""
        claimed = self._consult_schema(df.schema, data_collection)
        out = df
        for name, d in claimed.items():
            out = out.withColumn(name, d.convert(F.col(name)).cast(d.field_type))
        return out

    def apply_to_envelope(
        self,
        env: DataFrame,
        data_collection: str,
        *,
        skip_columns: tuple[str, ...] = (),
    ) -> DataFrame:
        """Rewrite claimed payload fields inside BOTH envelope images
        (value.before / value.after), null-preserving — same nested-field
        mapping as the column maskers. ``skip_columns``: columns never offered
        to the chain (the engine passes its key columns — a key's identity
        must not be rewritten mid-pipeline, same rule as project_columns)."""
        from debezium_spark.functions.transforms import _map_payload_field

        payload_t = env.schema["value"].dataType["after"].dataType
        offered = T.StructType(
            [f for f in payload_t.fields if f.name not in skip_columns]
        )
        claimed = self._consult_schema(offered, data_collection)
        out = env
        for name, d in claimed.items():
            out = _map_payload_field(
                out, name, lambda c, _d=d: _d.convert(c).cast(_d.field_type)
            )
        return out
