"""Avro wire format (functions/avro.py) — schema derivation, binary codec
round-trip, framings, registry, and the embedded API's Avro /
CloudEvents-with-Avro-data formats."""

import base64
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark import CdcEngine, EngineConfig
from debezium_spark.api import Avro, CloudEvents, DebeziumEngine
from debezium_spark.functions import avro as A
from debezium_spark.sources import wal as W


def test_schema_derivation_and_canonical_form():
    dt = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("name", T.StringType(), nullable=True),
            T.StructField(
                "inner",
                T.StructType([T.StructField("x", T.DoubleType(), nullable=True)]),
                nullable=True,
            ),
            T.StructField("tags", T.ArrayType(T.StringType(), False), nullable=True),
        ]
    )
    sch = A.avro_schema(dt, name="Rec")
    assert sch["type"] == "record" and sch["name"] == "Rec"
    by_name = {f["name"]: f["type"] for f in sch["fields"]}
    assert by_name["id"] == "long"
    assert by_name["name"] == ["null", "string"]
    assert by_name["inner"][0] == "null" and by_name["inner"][1]["type"] == "record"
    cf = A.canonical_json(sch)
    parsed = json.loads(cf)
    # PCF: fullnames, only name/type/fields keys, field order preserved
    assert parsed["name"] == "io.debezium.spark.Rec"
    assert [f["name"] for f in parsed["fields"]] == ["id", "name", "inner", "tags"]
    assert "namespace" not in parsed


def test_fingerprint_is_stable_and_schema_sensitive():
    s1 = A.avro_schema(T.StructType([T.StructField("a", T.LongType(), False)]))
    s2 = A.avro_schema(T.StructType([T.StructField("b", T.LongType(), False)]))
    f1, f1b, f2 = A.fingerprint64(s1), A.fingerprint64(s1), A.fingerprint64(s2)
    assert f1 == f1b and f1 != f2
    assert 0 <= f1 < 1 << 64


def test_binary_codec_round_trip_pure_python():
    sch = A.avro_schema(
        T.StructType(
            [
                T.StructField("s", T.StringType(), True),
                T.StructField("n", T.LongType(), False),
                T.StructField("d", T.DoubleType(), True),
                T.StructField("b", T.BooleanType(), False),
                T.StructField("raw", T.BinaryType(), True),
                T.StructField(
                    "sub",
                    T.StructType([T.StructField("k", T.IntegerType(), True)]),
                    True,
                ),
                T.StructField("arr", T.ArrayType(T.LongType(), False), True),
                T.StructField("m", T.MapType(T.StringType(), T.StringType(), False), True),
            ]
        ),
        name="RT",
    )
    rec = {
        "s": "héllo",
        "n": -3_000_000_000,  # forces multi-byte zigzag varint
        "d": 2.5,
        "b": True,
        "raw": b"\x00\x01\xff",
        "sub": {"k": None},
        "arr": [1, 2, 129],
        "m": {"x": "y"},
    }
    body = A.encode_record(sch, rec)
    assert A.decode_record(body, sch) == rec
    # null-heavy record
    rec2 = {"s": None, "n": 0, "d": None, "b": False, "raw": None, "sub": None,
            "arr": None, "m": None}
    assert A.decode_record(A.encode_record(sch, rec2), sch) == rec2


def test_known_varint_layout():
    """Spot-check the binary spec directly: long 1 -> 0x02, -1 -> 0x01,
    string 'foo' -> 0x06 'foo' (zigzag varint length)."""
    sch = {"type": "record", "name": "V", "fields": [
        {"name": "l", "type": "long"}, {"name": "s", "type": "string"}]}
    assert A.encode_record(sch, {"l": 1, "s": "foo"}) == b"\x02\x06foo"
    assert A.encode_record(sch, {"l": -1, "s": ""}) == b"\x01\x00"
    assert A.encode_record(sch, {"l": 64, "s": ""}) == b"\x80\x01\x00"


def test_framings_round_trip():
    sch = A.avro_schema(T.StructType([T.StructField("a", T.LongType(), False)]))
    body = A.encode_record(sch, {"a": 7})
    confluent = b"\x00" + (42).to_bytes(4, "big") + body
    sid, b2 = A.read_frame(confluent)
    assert (sid, b2) == (42, body)
    single = b"\xc3\x01" + A.fingerprint64(sch).to_bytes(8, "little") + body
    fid, b3 = A.read_frame(single)
    assert fid == A.fingerprint64(sch) and b3 == body
    with pytest.raises(ValueError):
        A.read_frame(b"\x01junk")


def test_registry_idempotent_ids(tmpdir_path):
    reg = A.AvroSchemaRegistry(f"{tmpdir_path}/reg.jsonl")
    s1 = A.avro_schema(T.StructType([T.StructField("a", T.LongType(), False)]))
    s2 = A.avro_schema(T.StructType([T.StructField("b", T.StringType(), True)]))
    id1 = reg.register("t-value", s1)
    assert reg.register("t-value", s1) == id1
    id2 = reg.register("t-key", s2)
    assert id2 == id1 + 1
    # re-open from disk: same ids, schema retrievable
    reg2 = A.AvroSchemaRegistry(f"{tmpdir_path}/reg.jsonl")
    assert reg2.register("t-value", s1) == id1
    assert json.loads(A.canonical_json(s1)) == reg2.by_id(id1)


def test_avro_binary_udf_matches_pure_encoder(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=40, n_events=160, seed=5)
    W.write_wal(spark, spec, f"{tmpdir_path}/wal", n_files=2)
    eng = CdcEngine(
        spark, EngineConfig(),
        wal_path=f"{tmpdir_path}/wal", target_path=f"{tmpdir_path}/t",
        work_dir=f"{tmpdir_path}/w",
    )
    env = eng.envelope_stream().where(F.col("value").isNotNull()).limit(20)
    out, sch = A.avro_binary(env, "value")
    rows = out.select("value", "avro").collect()
    assert rows
    for r in rows:
        expected = A.encode_record(sch, r["value"].asDict(recursive=True))
        assert bytes(r["avro"]) == expected
        # and the decode inverts it
        assert A.decode_record(bytes(r["avro"]), sch) == r["value"].asDict(recursive=True)


def _props(d: str, **extra) -> dict:
    p = {
        "topic.prefix": "repos",
        "wal.path": f"{d}/wal",
        "work.dir": f"{d}/w",
        "max.batch.size": "1000",
    }
    p.update({k: str(v) for k, v in extra.items()})
    return p


@pytest.fixture()
def small_wal(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=40, n_events=160, seed=5)
    W.write_wal(spark, spec, f"{tmpdir_path}/wal", n_files=2)
    return tmpdir_path


def test_embedded_api_avro_format(spark, small_wal):
    d = small_wal
    seen = []
    (
        DebeziumEngine.create(Avro)
        .using(_props(d))
        .using_spark(spark)
        .notifying(seen.append)
        .build()
        .run()
    )
    assert seen
    reg = A.AvroSchemaRegistry(f"{d}/w/_avro_registry.jsonl")
    rec = next(r for r in seen if r.value is not None)
    kid, kbody = A.read_frame(bytes(rec.key))
    vid, vbody = A.read_frame(bytes(rec.value))
    assert kid != vid
    key = A.decode_record(kbody, reg.by_id(kid))
    val = A.decode_record(vbody, reg.by_id(vid))
    assert set(key) == {"repo", "path"}
    assert val["op"] in {"c", "u", "d", "r"}
    assert val["source"]["name"] == "repos"
    # tombstones: framed key present, value None
    tomb = next(r for r in seen if r.value is None)
    tkid, tkbody = A.read_frame(bytes(tomb.key))
    assert set(A.decode_record(tkbody, reg.by_id(tkid))) == {"repo", "path"}


def test_embedded_api_cloudevents_avro_data(spark, small_wal):
    d = small_wal
    seen = []
    (
        DebeziumEngine.create(CloudEvents)
        .using(_props(d, **{"cloudevents.data.serializer.type": "avro"}))
        .using_spark(spark)
        .notifying(seen.append)
        .build()
        .run()
    )
    ce = json.loads(next(r.value for r in seen if r.value is not None))
    assert ce["datacontenttype"] == "application/avro"
    assert "data" not in ce and "data_base64" in ce
    reg = A.AvroSchemaRegistry(f"{d}/w/_avro_registry.jsonl")
    sid, body = A.read_frame(base64.b64decode(ce["data_base64"]))
    val = A.decode_record(body, reg.by_id(sid))
    assert val["op"] in {"c", "u", "d", "r"} and "after" in val


# -------------------------------------- read-side registry surface + compat
def test_registry_versions_and_confluent_export(tmpdir_path):
    """versions() is subject-scoped 1-based; export_confluent materializes
    the REST resource tree (GET /subjects, /subjects/<s>/versions/<v>,
    /schemas/ids/<id>) with the registry wire shapes."""
    import os

    reg = A.AvroSchemaRegistry(f"{tmpdir_path}/reg.jsonl")
    s1 = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    s2 = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string", "default": ""},
        ],
    }
    id1 = reg.register("repos-value", s1)
    id2 = reg.register("repos-value", s2)
    id3 = reg.register("repos-key", s1)
    assert reg.subjects() == ["repos-key", "repos-value"]
    vs = reg.versions("repos-value")
    assert [(v, i) for v, i, _ in vs] == [(1, id1), (2, id2)]

    out = reg.export_confluent(f"{tmpdir_path}/registry_export")
    assert out == {
        "path": f"{tmpdir_path}/registry_export",
        "subjects": 2,
        "versions": 3,
        "schemas": 3,
    }
    root = out["path"]
    assert json.load(open(f"{root}/subjects.json")) == ["repos-key", "repos-value"]
    v2 = json.load(open(f"{root}/subjects/repos-value/versions/2.json"))
    assert v2["version"] == 2 and v2["id"] == id2
    assert json.loads(v2["schema"])["fields"][1]["name"] == "b"
    latest = json.load(open(f"{root}/subjects/repos-value/versions/latest.json"))
    assert latest == v2
    byid = json.load(open(f"{root}/schemas/ids/{id3}.json"))
    assert json.loads(byid["schema"])["name"] == "r"
    # a re-opened registry exports identically (ids from file order)
    reg2 = A.AvroSchemaRegistry(f"{tmpdir_path}/reg.jsonl")
    out2 = reg2.export_confluent(f"{tmpdir_path}/registry_export2")
    assert (out2["subjects"], out2["versions"]) == (2, 3)
    assert os.path.getsize(f"{root}/subjects.json") == os.path.getsize(
        f"{out2['path']}/subjects.json"
    )


def test_backward_compatibility_rules():
    rec = lambda *fields: {  # noqa: E731
        "type": "record",
        "name": "r",
        "fields": list(fields),
    }
    a_long = {"name": "a", "type": "long"}
    # adding a field WITH a default is backward-compatible
    assert A.backward_compatible(
        rec(a_long), rec(a_long, {"name": "b", "type": "string", "default": ""})
    )
    # adding one WITHOUT a default is not
    assert not A.backward_compatible(
        rec(a_long), rec(a_long, {"name": "b", "type": "string"})
    )
    # dropping a field is fine (reader ignores writer-only fields)
    assert A.backward_compatible(rec(a_long, {"name": "b", "type": "int"}), rec(a_long))
    # numeric promotion widens, never narrows
    assert A.backward_compatible(
        rec({"name": "a", "type": "int"}), rec({"name": "a", "type": "long"})
    )
    assert not A.backward_compatible(
        rec(a_long), rec({"name": "a", "type": "int"})
    )
    # string <-> bytes promote both ways; nullable-union widening reads
    assert A.backward_compatible(
        rec({"name": "a", "type": "string"}), rec({"name": "a", "type": "bytes"})
    )
    assert A.backward_compatible(
        rec(a_long), rec({"name": "a", "type": ["null", "long"]})
    )
    assert not A.backward_compatible(
        rec({"name": "a", "type": ["null", "long"]}), rec(a_long)
    )
    # nested record fields resolve recursively
    inner_w = {"type": "record", "name": "n", "fields": [{"name": "x", "type": "int"}]}
    inner_r = {"type": "record", "name": "n", "fields": [{"name": "x", "type": "long"}]}
    assert A.backward_compatible(
        rec({"name": "n", "type": inner_w}), rec({"name": "n", "type": inner_r})
    )


def test_registry_backward_gate_blocks_incompatible_version(tmpdir_path):
    reg = A.AvroSchemaRegistry(f"{tmpdir_path}/reg.jsonl")
    v1 = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    reg.register("t-value", v1, compatibility="backward")
    bad = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},  # no default
        ],
    }
    with pytest.raises(ValueError, match="not backward-compatible.*b"):
        reg.register("t-value", bad, compatibility="backward")
    # same registration without the gate is allowed (compatibility NONE)
    assert reg.register("t-value", bad) > 0


def test_engine_export_schema_registry(spark, small_wal):
    d = small_wal
    eng = (
        DebeziumEngine.create(Avro)
        .using(_props(d))
        .using_spark(spark)
        .notifying(lambda r: None)
        .build()
    )
    eng.run()
    out = eng.export_schema_registry(f"{d}/registry_export")
    # key + value subjects for the one captured table
    subs = json.load(open(f"{out['path']}/subjects.json"))
    assert subs == ["repos.lake.repos-key", "repos.lake.repos-value"]
    assert out["versions"] >= 2 and out["schemas"] >= 2
