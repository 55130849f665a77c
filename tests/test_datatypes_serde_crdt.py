"""Round-3 parity modules: io.debezium.data value types, io.debezium.serde
JSON serde, io.debezium.crdt counters, and the ReadToInsertEvent SMT."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark.functions import crdt as CR
from debezium_spark.functions import datatypes as DT
from debezium_spark.functions import serde as SD
from debezium_spark.functions import transforms as TR
from debezium_spark.functions.envelope import payload_schema, read_events, wrap_wal


# ---------------------------------------------------------------- datatypes


def test_bits_roundtrip_matches_bitset_tobytearray(spark):
    # java.util.BitSet.toByteArray() ground truths:
    #   0 -> [], 1 -> [0x01], 0x8000 -> [0x00, 0x80], -1 not applicable (mask>=0)
    df = spark.createDataFrame(
        [(0,), (1,), (0x8000,), (0xDEADBEEF,), (None,)], "v long"
    )
    out = df.select(
        F.col("v"),
        DT.bits_encode(F.col("v")).alias("b"),
        DT.bits_decode(DT.bits_encode(F.col("v"))).alias("back"),
    ).collect()
    by_v = {r["v"]: r for r in out}
    assert by_v[0]["b"] == bytearray(b"")
    assert by_v[1]["b"] == bytearray(b"\x01")
    assert by_v[0x8000]["b"] == bytearray(b"\x00\x80")  # little-endian bytes
    assert by_v[0xDEADBEEF]["b"] == bytearray(b"\xef\xbe\xad\xde")
    assert by_v[None]["b"] is None and by_v[None]["back"] is None
    for v in (1, 0x8000, 0xDEADBEEF):
        assert by_v[v]["back"] == v


def test_variable_scale_decimal_matches_biginteger_tobytearray(spark):
    # BigInteger.toByteArray() ground truths (big-endian two's complement):
    #   123456 -> [0x01, 0xE2, 0x40]; -1 -> [0xFF]; 0 -> [0x00];
    #   -32768 -> [0x80, 0x00]; 255 -> [0x00, 0xFF]
    rows = [("1234.56",), ("-0.01",), ("0.00",), ("-327.68",), ("2.55",), (None,)]
    df = spark.createDataFrame(rows, "s string").select(
        F.col("s").cast("decimal(20,2)").alias("d")
    )
    out = df.select(
        F.col("d"),
        DT.variable_scale_decimal(F.col("d"), 2).alias("vsd"),
        DT.variable_scale_decimal_decode(
            DT.variable_scale_decimal(F.col("d"), 2)
        ).alias("back"),
    ).collect()
    got = {str(r["d"]): r for r in out}
    assert bytes(got["1234.56"]["vsd"]["value"]) == b"\x01\xe2\x40"
    assert got["1234.56"]["vsd"]["scale"] == 2
    assert bytes(got["-0.01"]["vsd"]["value"]) == b"\xff"
    assert bytes(got["0.00"]["vsd"]["value"]) == b"\x00"
    assert bytes(got["-327.68"]["vsd"]["value"]) == b"\x80\x00"
    assert bytes(got["2.55"]["vsd"]["value"]) == b"\x00\xff"
    assert got["None"]["vsd"] is None
    for s in ("1234.56", "-0.01", "0.00", "-327.68", "2.55"):
        assert got[s]["back"] == Decimal(s).quantize(Decimal("1." + "0" * 18))


def test_enum_and_enumset_checks(spark):
    df = spark.createDataFrame(
        [("a", "a,b"), ("z", "a,z"), (None, None), ("b", "")], "e string, es string"
    )
    out = df.select(
        DT.enum_check(F.col("e"), ["a", "b"]).alias("e_ok"),
        DT.enum_set_check(F.col("es"), ["a", "b"]).alias("es_ok"),
    ).collect()
    assert [r["e_ok"] for r in out] == ["a", None, None, "b"]
    assert [r["es_ok"] for r in out] == ["a,b", None, None, ""]


def test_point_wkb_roundtrip_and_layout(spark):
    import struct

    df = spark.createDataFrame(
        [(1.5, -2.25), (0.0, 0.0), (None, 3.0)], "x double, y double"
    )
    enc = DT.point_encode(df, "x", "y", srid=4326)
    rows = enc.collect()
    by_x = {r["x"]: r["point"] for r in rows}
    wkb = bytes(by_x[1.5]["wkb"])
    assert wkb == struct.pack("<b", 1) + struct.pack("<idd", 1, 1.5, -2.25)
    assert by_x[1.5]["srid"] == 4326
    assert by_x[None]["wkb"] is None
    dec = DT.point_decode(enc.select(F.col("point.wkb").alias("wkb")), "wkb")
    got = sorted(
        [(r["pt_x"], r["pt_y"]) for r in dec.collect()],
        key=lambda t: (t[0] is None, t[0]),
    )
    assert got == [(0.0, 0.0), (1.5, -2.25), (None, None)]


def test_point_decode_big_endian_bom(spark):
    import struct

    be = struct.pack(">b", 0) + struct.pack(">idd", 1, 7.5, -1.0)
    bad_type = struct.pack("<b", 1) + struct.pack("<idd", 2, 7.5, -1.0)
    df = spark.createDataFrame([(bytearray(be),), (bytearray(bad_type),)], "wkb binary")
    got = {(r["pt_x"], r["pt_y"]) for r in DT.point_decode(df, "wkb").collect()}
    assert got == {(7.5, -1.0), (None, None)}


def test_geometry_struct_and_logical_name(spark):
    """Geometry/Geography struct {wkb, srid} with optional srid
    (geometry/Geometry.java:30-76 createValue, Geography.java:24-42)."""
    df = spark.createDataFrame(
        [(bytearray(b"\x01\x01"), 4326), (bytearray(b"\x00"), None)],
        "wkb binary, s int",
    )
    geo = DT.geometry_encode(df, "wkb", srid_col="s")
    rows = {bytes(r["geom"]["wkb"]): r["geom"]["srid"] for r in geo.collect()}
    assert rows == {b"\x01\x01": 4326, b"\x00": None}
    assert geo.schema["geom"].metadata[DT.LOGICAL_NAME_KEY] == DT.GEOMETRY_LOGICAL
    gg = DT.geometry_encode(df, "wkb", srid=3857, geography=True)
    assert gg.schema["geom"].metadata[DT.LOGICAL_NAME_KEY] == DT.GEOGRAPHY_LOGICAL
    assert {r["geom"]["srid"] for r in gg.collect()} == {3857}
    plain = DT.geometry_encode(df, "wkb")
    assert {r["geom"]["srid"] for r in plain.collect()} == {None}


def test_special_value_decimal_modes(spark):
    """SpecialValueDecimal.fromLogical (data/SpecialValueDecimal.java:161-192):
    string -> enum names, double -> IEEE specials, precise -> null (the
    engine-side stand-in for the reference's ConnectException)."""
    import math

    from debezium_spark.functions import converters as C

    df = spark.createDataFrame(
        [("NaN",), ("Infinity",), ("-Infinity",), ("12.5",), (None,)],
        "raw string",
    )
    out = df.select(
        C.decimal_special_name(F.col("raw")).alias("sp"),
        C.convert_decimal_special(F.col("raw"), "string", scale=2).alias("s"),
        C.convert_decimal_special(F.col("raw"), "double").alias("d"),
        C.convert_decimal_special(F.col("raw"), "precise", scale=2).alias("p"),
    ).collect()
    got = {r["s"]: r for r in out}
    assert set(got) == {"NAN", "POSITIVE_INFINITY", "NEGATIVE_INFINITY", "12.50", None}
    assert math.isnan(got["NAN"]["d"]) and got["NAN"]["p"] is None
    assert got["POSITIVE_INFINITY"]["d"] == float("inf")
    assert got["NEGATIVE_INFINITY"]["d"] == float("-inf")
    r = got["12.50"]
    assert r["sp"] is None and r["d"] == 12.5 and str(r["p"]) == "12.50"
    assert got[None]["sp"] is None and got[None]["p"] is None


def test_as_logical_metadata_survives(spark):
    df = spark.createDataFrame([("u1",)], "id string")
    tagged = DT.as_logical(df, "id", "io.debezium.data.Uuid")
    assert tagged.schema["id"].metadata[DT.LOGICAL_NAME_KEY] == "io.debezium.data.Uuid"


# ---------------------------------------------------------------- serde


_PAYLOAD_DDL = "struct<repo:string,path:string,commit:string,lang:string,content:string>"


def _mini_wal(spark, rows):
    """rows: (offset, op, repo, path, content, ts_ms, is_tombstone)."""
    flat = spark.createDataFrame(
        rows,
        "offset long, op string, repo string, path string, content string, "
        "ts_ms long, is_tombstone boolean",
    )
    img = F.struct(
        F.col("repo"),
        F.col("path"),
        F.concat(F.lit("c"), F.col("offset")).alias("commit"),
        F.lit("py").alias("lang"),
        F.col("content"),
    ).cast(_PAYLOAD_DDL)
    return flat.select(
        "offset",
        "ts_ms",
        "op",
        "repo",
        "path",
        F.when(F.col("op").isin("u", "d"), img).alias("before"),
        F.when(F.col("op").isin("r", "c", "u"), img).alias("after"),
        "is_tombstone",
    )


@pytest.fixture(scope="module")
def envelopes(spark):
    wal = _mini_wal(
        spark,
        [
            (0, "c", "r1", "a.py", "print(1)", 1000, False),
            (1, "u", "r1", "a.py", "print(2)", 2000, False),
            (2, "c", "r1", "b.py", "x=1", 2000, False),
            (3, "d", "r1", "a.py", None, 3000, False),
            (4, "d", "r1", "a.py", None, 3000, True),  # tombstone after delete
        ],
    )
    return wrap_wal(wal)


def test_serde_roundtrip_envelope(spark, envelopes):
    wire = SD.serialize_records(envelopes)
    n_tomb = wire.where(F.col("value_json").isNull()).count()
    assert n_tomb == 1  # tombstone value stays a true null
    back = SD.deserialize_values(wire, payload_schema(), as_envelope=True)
    got = (
        back.where(F.col("value").isNotNull())
        .select("offset", "value.op", "value.after.content")
        .collect()
    )
    by_off = {r["offset"]: (r["op"], r["content"]) for r in got}
    assert by_off[0] == ("c", "print(1)")
    assert by_off[3] == ("d", None)


def test_serde_unwraps_from_field_and_payload_wrapper(spark, envelopes):
    # schema+payload wrapper AND from.field=after in one pass (JsonSerde sniffs both)
    wire = SD.serialize_records(envelopes, schema_payload_wrapper=True)
    back = SD.deserialize_values(wire, payload_schema())  # default from_field="after"
    got = {
        r["offset"]: r["value"]["content"] if r["value"] else None
        for r in back.collect()
    }
    assert got[1] == "print(2)"
    # delete envelope: after is null -> not "has from_field" -> parses whole node
    # as extracted record, all-null struct; content stays null either way
    assert got[3] is None


def test_serde_extracted_format_passthrough(spark):
    wire = spark.createDataFrame(
        [('{"repo":"r1","path":"a.py","commit":"c9","lang":"py","content":"z"}',)],
        "value_json string",
    )
    back = SD.deserialize_values(wire, payload_schema())
    assert back.collect()[0]["value"]["commit"] == "c9"


def test_serde_key_unwrap(spark, envelopes):
    key_t = T.StructType(
        [T.StructField("repo", T.StringType()), T.StructField("path", T.StringType())]
    )
    wire = SD.serialize_records(envelopes)
    back = SD.deserialize_keys(wire, key_t)
    assert back.collect()[0]["key"]["repo"] == "r1"
    one_field = T.StructType([T.StructField("repo", T.StringType())])
    back1 = SD.deserialize_keys(wire, one_field)
    assert back1.collect()[0]["key_scalar"] == "r1"


# ---------------------------------------------------------------- crdt


def test_pn_counter_and_merge(spark):
    a = spark.createDataFrame(
        [("k1", 1, 0), ("k1", 1, 0), ("k2", 0, 1)], "k string, inc int, dec int"
    )
    b = spark.createDataFrame(
        [("k1", 0, 1), ("k3", 1, 0)], "k string, inc int, dec int"
    )
    sa = CR.pn_counter(a, ["k"], increments=F.col("inc"), decrements=F.col("dec"))
    sb = CR.pn_counter(b, ["k"], increments=F.col("inc"), decrements=F.col("dec"))
    # CRDT merge laws: commutative
    m1 = {r["k"]: (r["adds"], r["removes"], r["value"])
          for r in CR.merge_counter_states(sa, sb).collect()}
    m2 = {r["k"]: (r["adds"], r["removes"], r["value"])
          for r in CR.merge_counter_states(sb, sa).collect()}
    assert m1 == m2
    assert m1["k1"] == (2, 1, 1)
    assert m1["k2"] == (0, 1, -1)
    assert m1["k3"] == (1, 0, 1)


def test_g_counter(spark):
    df = spark.createDataFrame([("k1",), ("k1",), ("k2",)], "k string")
    got = {r["k"]: r["value"] for r in CR.g_counter(df, ["k"]).collect()}
    assert got == {"k1": 2, "k2": 1}


def test_delta_counter_merge_matches_reference_semantics(spark):
    # StateBasedPNDeltaCounter: totals absorb only the delta's changes;
    # getChanges() reports the batch delta.
    total = spark.createDataFrame([("k1", 5, 2), ("k2", 1, 0)], "k string, adds long, removes long")
    batch = spark.createDataFrame(
        [("k1", 1, 0), ("k1", 0, 1), ("k3", 1, 0)], "k string, inc int, dec int"
    )
    delta = CR.pn_counter(batch, ["k"], increments=F.col("inc"), decrements=F.col("dec"))
    out = {r["k"]: r for r in CR.delta_counter_merge(total, delta).collect()}
    assert (out["k1"]["adds"], out["k1"]["removes"], out["k1"]["value"]) == (6, 3, 3)
    assert (out["k1"]["delta_adds"], out["k1"]["delta_removes"]) == (1, 1)
    assert (out["k2"]["adds"], out["k2"]["value"], out["k2"]["delta_adds"]) == (1, 1, 0)
    assert (out["k3"]["adds"], out["k3"]["value"]) == (1, 1)  # new key: delta is total


def test_pn_counter_from_ops(spark, envelopes):
    got = {
        (r["repo"], r["path"]): r["value"]
        for r in CR.pn_counter_from_ops(envelopes, ["repo", "path"]).collect()
    }
    # a.py: c +1, u +0, d -1 => 0 live; b.py: c +1 => 1; tombstone counts nothing
    assert got[("r1", "a.py")] == 0
    assert got[("r1", "b.py")] == 1


# ---------------------------------------------------------------- SMT


def test_read_to_insert(spark):
    wal = _mini_wal(
        spark,
        [
            (0, "r", "r1", "a.py", "x", 0, False),
            (1, "c", "r1", "b.py", "y", 0, False),
            (2, "d", "r1", "a.py", None, 1, False),
            (3, "d", "r1", "a.py", None, 1, True),
        ],
    )
    env = TR.read_to_insert(wrap_wal(wal))
    ops = [
        r["op"]
        for r in env.where(F.col("value").isNotNull())
        .select(F.col("value.op").alias("op"))
        .collect()
    ]
    assert "r" not in ops and ops.count("c") == 2 and ops.count("d") == 1
    assert env.where(F.col("value").isNull()).count() == 1  # tombstone untouched