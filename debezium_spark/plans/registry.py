"""Envelope schema registry + durable schema history.

Debezium historizes schema: every DDL becomes a SchemaChangeEvent
(``schema/SchemaChangeEvent.java:139-143``) appended to a durable history log as a
HistoryRecord {position, ddl, tableChanges, ts_ms}
(``relational/history/HistoryRecord.java:19-27``); on restart the history is replayed
up to the restart offset to rebuild the in-memory schema
(``relational/history/AbstractDatabaseHistory.java:124-138`` with
``HistoryRecordComparator.isAtOrBefore``).

Here the history is a small offset-ordered table; `replay(upto_offset)` rebuilds the
registry exactly like AbstractDatabaseHistory.recover(), and `apply_pending` executes
the corresponding lake DDL (add column / widen) when the stream crosses a change
offset. table_changes uses a compact machine-readable form:
``add_column:<name>:<type>`` / ``widen:<name>:<type>`` / ``create``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import types as T

from debezium_spark.plans.lake import LakeTable

_TYPES = {
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "string": T.StringType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "decimal(38,18)": T.DecimalType(38, 18),
}


def parse_type(s: str) -> T.DataType:
    try:
        return _TYPES[s.strip().lower()]
    except KeyError:
        return T.StructType.fromDDL(f"x {s}")["x"].dataType


@dataclass
class SchemaChange:
    offset: int
    version: int
    ddl: str
    table_changes: str  # create | add_column:name:type | widen:name:type


@dataclass
class SchemaRegistry:
    """Driver-side registry {version -> payload StructType}, rebuilt by replay."""

    base_schema: T.StructType
    changes: list[SchemaChange] = field(default_factory=list)
    applied_version: int = 1

    @classmethod
    def from_history_rows(cls, base_schema: T.StructType, rows) -> "SchemaRegistry":
        """rows: iterable with .offset/.version/.ddl/.table_changes, any order."""
        ch = sorted(
            (SchemaChange(r["offset"], r["version"], r["ddl"], r["table_changes"])
             for r in rows),
            key=lambda c: c.offset,
        )
        return cls(base_schema=base_schema, changes=ch)

    def schema_at(self, version: int) -> T.StructType:
        """Payload schema in force at a given version (replay of history deltas)."""
        schema = self.base_schema
        for c in self.changes:
            if c.version > version:
                break
            schema = _apply_change(schema, c)
        return schema

    def version_at_offset(self, offset: int) -> int:
        v = 1
        for c in self.changes:
            if c.offset <= offset:
                v = max(v, c.version)
        return v

    def pending_between(self, lo_exclusive: int, hi_inclusive: int) -> list[SchemaChange]:
        """Changes the stream crosses in (lo, hi] — to apply before merging the batch."""
        return [c for c in self.changes if lo_exclusive < c.offset <= hi_inclusive]

    def apply_to_lake(self, lake: LakeTable, change: SchemaChange) -> None:
        """Execute the DDL against the lake table (idempotent)."""
        kind, *args = change.table_changes.split(":")
        if kind == "create":
            pass
        elif kind == "add_column":
            name, typ = args
            lake.add_column(name, parse_type(typ))
        elif kind == "widen":
            name, typ = args
            lake.widen_column(name, parse_type(typ))
        else:
            raise ValueError(f"unknown table_changes {change.table_changes!r}")
        self.applied_version = max(self.applied_version, change.version)


def _apply_change(schema: T.StructType, c: SchemaChange) -> T.StructType:
    kind, *args = c.table_changes.split(":")
    if kind == "create":
        return schema
    if kind == "add_column":
        name, typ = args
        if name in schema.fieldNames():
            return schema
        return T.StructType(list(schema.fields) + [T.StructField(name, parse_type(typ))])
    if kind == "widen":
        name, typ = args
        return T.StructType(
            [
                T.StructField(f.name, parse_type(typ) if f.name == name else f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
    raise ValueError(c.table_changes)


class SchemaHistoryStore:
    """Durable offset-ordered schema history (AbstractDatabaseHistory analogue).

    JSON-lines file; append-then-fsync; replay() filters records at-or-before the
    restart offset (HistoryRecordComparator.isAtOrBefore semantics).
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def record(self, change: SchemaChange) -> None:
        with open(self.path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "offset": change.offset,
                        "version": change.version,
                        "ddl": change.ddl,
                        "table_changes": change.table_changes,
                    }
                )
                + "\n"
            )
            f.flush()
            os.fsync(f.fileno())

    def replay(self, upto_offset: int | None = None) -> list[SchemaChange]:
        if not os.path.exists(self.path):
            return []
        out: list[SchemaChange] = []
        seen: set[int] = set()
        with open(self.path) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                if upto_offset is not None and d["offset"] > upto_offset:
                    continue
                if d["version"] in seen:  # idempotent re-record on replay
                    continue
                seen.add(d["version"])
                out.append(
                    SchemaChange(d["offset"], d["version"], d["ddl"], d["table_changes"])
                )
        return sorted(out, key=lambda c: c.offset)
