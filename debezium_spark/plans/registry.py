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
the corresponding lake DDL when the stream crosses a change offset. table_changes
uses a compact machine-readable form (TableChanges.java:31-54 serialization
analogue): ``create`` / ``add_column:<name>:<type>[:<default-json>]`` /
``widen:<name>:<type>`` / ``drop_column:<name>`` /
``rename_column:<old>:<new>``. The optional add_column default (a JSON
literal — relational/Column.defaultValue) fills every slot the engine would
otherwise null-fill for pre-add rows, matching the source DB's ADD COLUMN
backfill; see LakeTable.defaults.

Rename/drop mid-stream (MySqlSchemaMigrationIT scenarios): events written before a
rename carry the old field name; `payload_renames`/`payload_drops` feed the
engine's envelope alignment (coalesce old into new — a single event only ever
populates its own version's column) and LakeTable tracks renames per schema
version so files committed under old names read back aligned.
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

    def inject(self, change: SchemaChange) -> bool:
        """Ad-hoc schema-change injection (pipeline/signal/SchemaChanges.java):
        insert a change into the history as if it had arrived from the
        schema-change source. Idempotent by version — re-delivering a known
        version is a no-op. Returns True if the change was added."""
        if any(c.version == change.version for c in self.changes):
            return False
        self.changes = sorted(self.changes + [change], key=lambda c: c.offset)
        return True

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

    def pending_upto(self, hi_inclusive: int) -> list[SchemaChange]:
        """Changes at-or-before ``hi`` not yet applied this run, in history order.

        The batch-apply path uses this instead of ``pending_between``: the file
        stream source does NOT guarantee binlog-segment order, so a batch
        covering (say) the v3 widen can arrive before the batch covering the v2
        add of the same column. History order is the dependency order
        (TableChanges.java applies serialized changes sequentially); every lake
        DDL is idempotent, so re-application after a restart is a no-op."""
        return [
            c for c in self.changes
            if c.offset <= hi_inclusive and c.version > self.applied_version
        ]

    def apply_to_lake(self, lake: LakeTable, change: SchemaChange) -> None:
        """Execute the DDL against the lake table (idempotent)."""
        kind, *args = change.table_changes.split(":")
        if kind == "create":
            pass
        elif kind == "add_column":
            # add_column:<name>:<type>[:<default-json>] — the default tail is
            # JSON (may itself contain ':'), so re-split with a bound
            name, typ, *d = change.table_changes.split(":", 3)[1:]
            default = json.loads(d[0]) if d else None
            lake.add_column(
                name,
                parse_type(typ),
                default=default,
                # backfill boundary = the DDL's WAL offset: rows last written
                # below it get the default (the DB's ADD COLUMN backfill)
                default_below_offset=change.offset,
            )
        elif kind == "widen":
            name, typ = args
            lake.widen_column(name, parse_type(typ))
        elif kind == "drop_column":
            lake.drop_column(args[0])
        elif kind == "rename_column":
            old, new = args
            lake.rename_column(old, new)
        else:
            raise ValueError(f"unknown table_changes {change.table_changes!r}")
        self.applied_version = max(self.applied_version, change.version)

    @property
    def applied_offset(self) -> int:
        """Max change offset already applied to the lake (0 if only the base).

        The envelope must be aligned to the LAKE's column set, which under
        out-of-order segment delivery can be ahead of the current batch's own
        high watermark — a late pre-rename segment still merges into the
        post-rename lake schema."""
        return max(
            (c.offset for c in self.changes if c.version <= self.applied_version),
            default=0,
        )

    def payload_renames(self, upto_offset: int | None = None) -> list[tuple[str, str]]:
        """(old, new) column renames in history order, optionally only those in
        force at ``upto_offset`` — the envelope alignment map for events written
        under pre-rename schema versions."""
        out = []
        for c in self.changes:
            if upto_offset is not None and c.offset > upto_offset:
                continue
            kind, *args = c.table_changes.split(":")
            if kind == "rename_column":
                out.append((args[0], args[1]))
        return out

    def payload_drops(self, upto_offset: int | None = None) -> list[str]:
        """Columns dropped by history (excluded from the current payload)."""
        out = []
        for c in self.changes:
            if upto_offset is not None and c.offset > upto_offset:
                continue
            kind, *args = c.table_changes.split(":")
            if kind == "drop_column":
                out.append(args[0])
        return out


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
    if kind == "drop_column":
        return T.StructType([f for f in schema.fields if f.name != args[0]])
    if kind == "rename_column":
        old, new = args
        return T.StructType(
            [
                T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
    raise ValueError(c.table_changes)


def align_envelope_columns(
    env, renames: list[tuple[str, str]], drops: list[str]
):
    """Rewrite envelope before/after images to the post-rename/drop column set.

    An event written before ``rename_column:old:new`` populates only ``old``;
    one written after populates only ``new`` — so coalescing the physical
    columns that map to the same final name is exact, never a merge of two
    live values. Dropped columns are projected away. Chained renames (a->b,
    b->c) resolve by walking the rename list in history order.
    """
    from pyspark.sql import functions as F

    payload_t = env.schema["value"].dataType["after"].dataType
    final_name: dict[str, str] = {}
    for f in payload_t.fields:
        n = f.name
        for old, new in renames:
            if n == old:
                n = new
        final_name[f.name] = n
    drop_set = set(drops)
    # final field -> physical source fields (original order, newest name first)
    targets: dict[str, list[T.StructField]] = {}
    order: list[str] = []
    for f in payload_t.fields:
        t = final_name[f.name]
        if t in drop_set:
            continue
        if t not in targets:
            targets[t] = []
            order.append(t)
        if f.name == t:
            targets[t].insert(0, f)
        else:
            targets[t].append(f)

    v = F.col("value")

    def img(side: str):
        im = v.getField(side)
        cols = []
        for t in order:
            srcs = targets[t]
            dtype = srcs[0].dataType
            c = F.coalesce(*[im.getField(s.name).cast(dtype) for s in srcs]) \
                if len(srcs) > 1 else im.getField(srcs[0].name)
            cols.append(c.alias(t))
        return F.when(im.isNotNull(), F.struct(*cols))

    new_value = F.when(
        v.isNotNull(),
        F.struct(
            img("before").alias("before"),
            img("after").alias("after"),
            v.getField("op").alias("op"),
            v.getField("ts_ms").alias("ts_ms"),
            v.getField("source").alias("source"),
            v.getField("transaction").alias("transaction"),
        ),
    )
    return env.withColumn("value", new_value)


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
