"""Protobuf wire format (functions/protobuf.py) — descriptor derivation,
proto3 codec round-trip, framing, and the embedded API's Protobuf format."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark import CdcEngine, EngineConfig
from debezium_spark.api import DebeziumEngine, Protobuf
from debezium_spark.functions import avro as A
from debezium_spark.functions import protobuf as P
from debezium_spark.sources import wal as W


DT = T.StructType(
    [
        T.StructField("s", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("d", T.DoubleType(), True),
        T.StructField("b", T.BooleanType(), True),
        T.StructField("raw", T.BinaryType(), True),
        T.StructField(
            "sub", T.StructType([T.StructField("k", T.IntegerType(), True)]), True
        ),
        T.StructField("arr", T.ArrayType(T.LongType(), True), True),
    ]
)


def test_descriptor_and_proto_text():
    desc = P.proto_descriptor(DT, name="Rec")
    nums = {f["name"]: f["number"] for f in desc["fields"]}
    assert nums == {"s": 1, "n": 2, "d": 3, "b": 4, "raw": 5, "sub": 6, "arr": 7}
    arr = next(f for f in desc["fields"] if f["name"] == "arr")
    assert arr["repeated"] and arr["type"] == "int64"
    text = P.proto_schema_text(desc)
    assert 'syntax = "proto3";' in text
    assert "repeated int64 arr = 7;" in text
    assert "string s = 1;" in text


def test_codec_round_trip_including_negatives_and_nesting():
    desc = P.proto_descriptor(DT, name="Rec")
    rec = {
        "s": "héllo",
        "n": -5,  # negative int64 -> 10-byte two's-complement varint
        "d": 2.5,
        "b": True,
        "raw": b"\x00\xff",
        "sub": {"k": 7},
        "arr": [1, 200, 300000],
    }
    body = P.encode_message(desc, rec)
    assert P.decode_message(body, desc) == rec
    # null fields are omitted and decode back to None / empty repeated
    rec2 = {"s": None, "n": 3, "d": None, "b": None, "raw": None, "sub": None,
            "arr": None}
    got = P.decode_message(P.encode_message(desc, rec2), desc)
    assert got == {"s": None, "n": 3, "d": None, "b": None, "raw": None,
                   "sub": None, "arr": []}


def test_known_wire_layout():
    """Spot-check the proto3 spec: field 1 string 'foo' -> 0A 03 'foo';
    field 2 int64 1 -> 10 01; bool true field 3 -> 18 01."""
    desc = {
        "name": "V",
        "fields": [
            {"name": "s", "number": 1, "repeated": False, "type": "string"},
            {"name": "n", "number": 2, "repeated": False, "type": "int64"},
            {"name": "b", "number": 3, "repeated": False, "type": "bool"},
        ],
    }
    assert P.encode_message(desc, {"s": "foo", "n": 1, "b": True}) == (
        b"\x0a\x03foo\x10\x01\x18\x01"
    )
    assert P.encode_message(desc, {"s": None, "n": -1, "b": None}) == (
        b"\x10" + b"\xff" * 9 + b"\x01"
    )


def test_decoder_skips_unknown_fields():
    desc = {
        "name": "V",
        "fields": [{"name": "n", "number": 2, "repeated": False, "type": "int64"}],
    }
    # field 1 (unknown string) + field 2
    data = b"\x0a\x03foo\x10\x2a"
    assert P.decode_message(data, desc) == {"n": 42}


def test_framing(spark):
    df = spark.createDataFrame([(b"\x10\x01",), (None,)], ["body"])
    rows = df.select(
        P.frame_confluent_protobuf(F.col("body"), 7).alias("framed")
    ).collect()
    framed = {bytes(r["framed"]) if r["framed"] is not None else None for r in rows}
    assert framed == {b"\x00\x00\x00\x00\x07\x00\x10\x01", None}


def test_protobuf_binary_udf_matches_pure_encoder(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=30, n_events=120, seed=9)
    W.write_wal(spark, spec, f"{tmpdir_path}/wal", n_files=2)
    eng = CdcEngine(
        spark, EngineConfig(),
        wal_path=f"{tmpdir_path}/wal", target_path=f"{tmpdir_path}/t",
        work_dir=f"{tmpdir_path}/w",
    )
    env = eng.envelope_stream().where(F.col("value").isNotNull()).limit(15)
    out, desc = P.protobuf_binary(env, "value")
    for r in out.select("value", "proto").collect():
        expected = P.encode_message(desc, r["value"].asDict(recursive=True))
        assert bytes(r["proto"]) == expected


def test_embedded_api_protobuf_format(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=30, n_events=120, seed=9)
    W.write_wal(spark, spec, f"{tmpdir_path}/wal", n_files=2)
    seen = []
    (
        DebeziumEngine.create(Protobuf)
        .using({
            "topic.prefix": "repos",
            "wal.path": f"{tmpdir_path}/wal",
            "work.dir": f"{tmpdir_path}/w",
        })
        .using_spark(spark)
        .notifying(seen.append)
        .build()
        .run()
    )
    assert seen
    reg = A.AvroSchemaRegistry(f"{tmpdir_path}/w/_avro_registry.jsonl")
    rec = next(r for r in seen if r.value is not None)
    kb, vb = bytes(rec.key), bytes(rec.value)
    # Confluent protobuf framing: magic, 4B id, message-indexes 0x00
    assert kb[0] == 0 and kb[5] == 0
    kid = int.from_bytes(kb[1:5], "big")
    vid = int.from_bytes(vb[1:5], "big")
    key = P.decode_message(kb[6:], reg.by_id(kid))
    val = P.decode_message(vb[6:], reg.by_id(vid))
    assert set(key) == {"repo", "path"}
    assert val["op"] in {"c", "u", "d", "r"}
    assert val["source"]["name"] == "repos"
    tomb = next(r for r in seen if r.value is None)
    assert tomb.key is not None


def test_embedded_api_cloudevents_protobuf_data(spark, tmpdir_path):
    import base64

    from debezium_spark.api import CloudEvents

    spec = W.WalSpec(n_keys=30, n_events=120, seed=9)
    W.write_wal(spark, spec, f"{tmpdir_path}/wal", n_files=2)
    seen = []
    (
        DebeziumEngine.create(CloudEvents)
        .using({
            "topic.prefix": "repos",
            "wal.path": f"{tmpdir_path}/wal",
            "work.dir": f"{tmpdir_path}/w",
            "cloudevents.data.serializer.type": "protobuf",
        })
        .using_spark(spark)
        .notifying(seen.append)
        .build()
        .run()
    )
    ce = json.loads(next(r.value for r in seen if r.value is not None))
    assert ce["datacontenttype"] == "application/protobuf"
    assert "data_base64" in ce and "data" not in ce
    reg = A.AvroSchemaRegistry(f"{tmpdir_path}/w/_avro_registry.jsonl")
    framed = base64.b64decode(ce["data_base64"])
    assert framed[0] == 0 and framed[5] == 0  # Confluent protobuf framing
    sid = int.from_bytes(framed[1:5], "big")
    val = P.decode_message(framed[6:], reg.by_id(sid))
    assert val["op"] in {"c", "u", "d", "r"} and val["source"]["name"] == "repos"
