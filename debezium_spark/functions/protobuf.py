"""Protobuf wire format for change records (engine/format/Protobuf.java:1 —
the embedded API's fourth serialization format).

Built from the PUBLIC proto3 encoding spec alone (no generated classes, no
protobuf runtime): a Spark struct maps to a message whose field numbers are
the 1-based struct positions, and values encode as

* wire type 0 (varint): long/int/boolean — base-128 little-endian, two's
  complement for negatives (10 bytes), NOT zigzag (that is sint*, which the
  Connect converter does not emit for int64);
* wire type 1 (64-bit): double, little-endian IEEE-754;
* wire type 5 (32-bit): float;
* wire type 2 (length-delimited): string (utf8), bytes, nested message,
  and repeated/packed is not needed here — arrays encode as repeated
  length-delimited/varint fields (one tag per element, proto3 unpacked form
  for simplicity and decoder symmetry);
* proto3 presence: null fields are simply OMITTED (the proto3 default rule);
  a decoder returns None for absent fields.

:func:`proto_schema_text` renders the matching ``.proto`` source so consumers
can codegen real classes against the same shape. Framing mirrors the
Confluent Protobuf wire format: magic ``0x00`` + 4-byte schema id + the
message-indexes varint list (single ``0x00`` byte = first message in the
file) + body — :func:`frame_confluent_protobuf`.

Execution model: same tier as functions/avro.py — the encoder is an
Arrow-batched pandas UDF walking the derived descriptor (per-batch dispatch;
protobuf runtimes are not in this container and Spark's protobuf module is a
separate jar). Decoding is plain Python for tests/embedded consumers.
"""

from __future__ import annotations

import io
import json
import struct as _struct
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "proto_descriptor",
    "proto_schema_text",
    "encode_message",
    "decode_message",
    "protobuf_binary",
    "frame_confluent_protobuf",
]

_SCALAR: dict[type, str] = {
    T.StringType: "string",
    T.LongType: "int64",
    T.IntegerType: "int32",
    T.ShortType: "int32",
    T.ByteType: "int32",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "bool",
    T.BinaryType: "bytes",
    T.TimestampType: "int64",  # micros
    T.DateType: "int32",       # days
}


def proto_descriptor(dt: T.StructType, *, name: str = "Envelope") -> dict:
    """Spark struct -> descriptor dict {name, fields:[{name, number, type,
    repeated, message?}]} — field numbers are 1-based struct positions, so
    the mapping is stable as long as column order is (it is: Debezium
    envelopes have a fixed field order)."""

    def field_type(d: T.DataType, path: str) -> dict:
        if isinstance(d, T.StructType):
            return {"type": "message", "message": walk(d, path)}
        for cls, pt in _SCALAR.items():
            if isinstance(d, cls):
                return {"type": pt}
        raise TypeError(f"no protobuf mapping for Spark type {d.simpleString()}")

    def walk(d: T.StructType, path: str) -> dict:
        fields = []
        for i, f in enumerate(d.fields, start=1):
            if isinstance(f.dataType, T.ArrayType):
                ft = field_type(f.dataType.elementType, f"{path}_{f.name}")
                fields.append({"name": f.name, "number": i, "repeated": True, **ft})
            else:
                ft = field_type(f.dataType, f"{path}_{f.name}")
                fields.append({"name": f.name, "number": i, "repeated": False, **ft})
        return {"name": path, "fields": fields}

    return walk(dt, name)


def proto_schema_text(desc: dict, *, package: str = "io.debezium.spark") -> str:
    """Render the descriptor as .proto source (proto3)."""
    out = [f'syntax = "proto3";', f"package {package};", ""]

    def render(msg: dict, indent: str = "") -> None:
        out.append(f"{indent}message {msg['name'].split('_')[-1] or msg['name']} {{")
        for f in msg["fields"]:
            rep = "repeated " if f["repeated"] else ""
            if f["type"] == "message":
                render(f["message"], indent + "  ")
                tname = f["message"]["name"].split("_")[-1]
            else:
                tname = f["type"]
            out.append(f"{indent}  {rep}{tname} {f['name']} = {f['number']};")
        out.append(f"{indent}}}")

    render(desc)
    return "\n".join(out)


# ------------------------------------------------------------- binary codec
def _write_varint(out: io.BytesIO, n: int) -> None:
    n &= 0xFFFFFFFFFFFFFFFF  # two's complement for negatives (10-byte form)
    while n > 0x7F:
        out.write(bytes([(n & 0x7F) | 0x80]))
        n >>= 7
    out.write(bytes([n]))


_WIRE = {"int64": 0, "int32": 0, "bool": 0, "double": 1,
         "string": 2, "bytes": 2, "message": 2, "float": 5}


def _compile(desc: dict):
    """Descriptor -> closure tree encoder ``enc(out, value)`` with tag bytes
    precomputed per field — hoists every descriptor-shaped decision out of
    the row loop (same rationale as functions/avro.py:_compile; measured via
    bench.py --serde)."""
    field_encs = []
    for f in desc["fields"]:
        tag = io.BytesIO()
        _write_varint(tag, (f["number"] << 3) | _WIRE[f["type"]])
        tag_b = tag.getvalue()
        t = f["type"]
        if t in ("int64", "int32"):
            def val(out, v):
                _write_varint(out, int(v))
        elif t == "bool":
            def val(out, v):
                out.write(b"\x01" if v else b"\x00")
        elif t == "double":
            pack = _struct.Struct("<d").pack

            def val(out, v, pack=pack):
                out.write(pack(float(v)))
        elif t == "float":
            pack = _struct.Struct("<f").pack

            def val(out, v, pack=pack):
                out.write(pack(float(v)))
        elif t == "string":
            def val(out, v):
                b = str(v).encode("utf-8")
                _write_varint(out, len(b))
                out.write(b)
        elif t == "bytes":
            def val(out, v):
                b = bytes(v)
                _write_varint(out, len(b))
                out.write(b)
        elif t == "message":
            inner = _compile(f["message"])

            def val(out, v, inner=inner):
                buf = io.BytesIO()
                inner(buf, v)
                b = buf.getvalue()
                _write_varint(out, len(b))
                out.write(b)
        else:
            raise TypeError(f"cannot encode protobuf type {t!r}")
        field_encs.append((f["name"], bool(f["repeated"]), tag_b, val))

    def enc(out, value):
        if value is None:
            return
        get = value.get
        for name, repeated, tag_b, val in field_encs:
            v = get(name)
            if v is None:
                continue
            if repeated:
                for x in v:
                    if x is None:
                        continue
                    out.write(tag_b)
                    val(out, x)
            else:
                out.write(tag_b)
                val(out, v)

    return enc


_COMPILED: dict[str, Any] = {}


def compiled_encoder(desc_json: str):
    """Process-wide compiled-encoder cache, one per descriptor JSON."""
    enc = _COMPILED.get(desc_json)
    if enc is None:
        enc = _COMPILED[desc_json] = _compile(json.loads(desc_json))
    return enc


def encode_message(desc: dict, value: dict | None) -> bytes:
    """One record -> proto3 message bytes. None/absent fields are omitted
    (proto3 presence); repeated fields emit one tagged element each."""
    out = io.BytesIO()
    _compile(desc)(out, value)
    return out.getvalue()


def decode_message(data: bytes, desc: dict) -> dict:
    """proto3 bytes -> dict (absent fields -> None; repeated -> list)."""
    buf = io.BytesIO(data)
    by_num = {f["number"]: f for f in desc["fields"]}
    result: dict[str, Any] = {
        f["name"]: ([] if f["repeated"] else None) for f in desc["fields"]
    }

    def read_varint() -> int:
        shift = n = 0
        while True:
            raw = buf.read(1)
            if not raw:
                raise EOFError("truncated varint")
            b = raw[0]
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return n

    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        tag = read_varint()
        num, wire = tag >> 3, tag & 7
        f = by_num.get(num)
        if wire == 0:
            raw = read_varint()
            if f is None:
                continue
            if f["type"] == "bool":
                v: Any = bool(raw)
            else:
                # two's complement back to signed
                v = raw - (1 << 64) if raw >= 1 << 63 else raw
        elif wire == 1:
            b = buf.read(8)
            v = _struct.unpack("<d", b)[0] if f else None
        elif wire == 5:
            b = buf.read(4)
            v = _struct.unpack("<f", b)[0] if f else None
        elif wire == 2:
            b = buf.read(read_varint())
            if f is None:
                continue
            if f["type"] == "string":
                v = b.decode("utf-8")
            elif f["type"] == "bytes":
                v = b
            else:
                v = decode_message(b, f["message"])
        else:
            raise ValueError(f"unsupported wire type {wire}")
        if f is None:
            continue
        if f["repeated"]:
            result[f["name"]].append(v)
        else:
            result[f["name"]] = v
    return result


# ------------------------------------------------------------- Spark surface
def protobuf_binary(
    df: DataFrame, col: str, *, desc: dict | None = None, out_col: str = "proto"
) -> tuple[DataFrame, dict]:
    """Struct column -> proto3 message bytes column. Returns (df, descriptor).
    NULL input rows encode to NULL (tombstone contract), not to an empty
    message. Arrow-batched pandas UDF (see module docstring)."""
    dt = df.schema[col].dataType
    if not isinstance(dt, T.StructType):
        raise TypeError(f"column {col!r} must be a struct, got {dt.simpleString()}")
    d = desc if desc is not None else proto_descriptor(dt, name=col.capitalize())
    d_json = json.dumps(d)

    @pandas_udf(T.BinaryType())
    def _enc(rows: pd.DataFrame) -> pd.Series:
        enc = compiled_encoder(d_json)  # compiled once per worker process
        recs = rows.astype(object).where(rows.notna(), None).to_dict("records")
        out = []
        for r in recs:
            buf = io.BytesIO()
            enc(buf, r)
            out.append(buf.getvalue())
        return pd.Series(out)

    return df.withColumn(
        out_col, F.when(F.col(col).isNotNull(), _enc(F.col(col)))
    ), d


def frame_confluent_protobuf(body: Column, schema_id: int) -> Column:
    """Confluent Protobuf wire format: 0x00 magic + 4-byte BE schema id +
    message-indexes varint list (0x00 = first message in the file) + body."""
    header = b"\x00" + int(schema_id).to_bytes(4, "big") + b"\x00"
    return F.when(body.isNotNull(), F.concat(F.lit(header), body))
