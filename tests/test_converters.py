"""Value converters: decimal.handling.mode + time.precision.mode parity
(jdbc/JdbcValueConverters.java:73-136, io.debezium.time.*)."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from debezium_spark.functions import converters as C


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [("123.456789", "2024-01-02 03:04:05.678901"),
         ("-0.000000000000000015", "1970-01-01 00:00:00"),
         (None, None)],
        "dec_s string, ts_s string",
    ).select(
        F.col("dec_s"), F.col("ts_s").cast("timestamp").alias("ts")
    )


def test_decimal_modes(frame):
    out = frame.select(
        C.convert_decimal(F.col("dec_s"), "precise").alias("p"),
        C.convert_decimal(F.col("dec_s"), "double").alias("d"),
        C.convert_decimal(F.col("dec_s"), "string").alias("s"),
    ).collect()
    r = out[0]
    assert r["p"] == Decimal("123.456789000000000000")
    assert abs(r["d"] - 123.456789) < 1e-9
    assert r["s"] == "123.456789000000000000"
    # precise mode keeps sub-double precision exactly
    assert out[1]["p"] == Decimal("-1.5E-17")
    assert out[2]["p"] is None and out[2]["s"] is None
    with pytest.raises(ValueError):
        C.convert_decimal(F.col("dec_s"), "bogus")


def test_temporal_modes(frame):
    out = frame.where(F.col("ts").isNotNull()).select(
        C.epoch_days(F.col("ts")).alias("days"),
        C.convert_timestamp(F.col("ts"), "connect").alias("ms"),
        C.convert_timestamp(F.col("ts"), "adaptive").alias("us"),
        C.convert_timestamp(F.col("ts"), "adaptive_time_microseconds").alias("us2"),
        C.zoned_iso(F.col("ts")).alias("iso"),
    ).collect()
    r = out[0]
    assert r["days"] == 19724                       # 2024-01-02
    assert r["us"] == 1704164645678901 and r["us2"] == r["us"]
    assert r["ms"] == 1704164645678                 # floor to millis
    assert r["iso"] == "2024-01-02T03:04:05.678901Z"
    epoch = out[1]
    assert epoch["days"] == 0 and epoch["ms"] == 0 and epoch["us"] == 0
    with pytest.raises(ValueError):
        C.convert_timestamp(F.col("ts"), "bogus")


def test_time_family(frame):
    """io.debezium.time.{Time,MicroTime,NanoTime,NanoTimestamp,Year,
    ZonedTime}: past-midnight values, epoch nanos, year int, zoned time."""
    out = frame.where(F.col("ts").isNotNull()).select(
        C.milli_of_day(F.col("ts")).alias("ms"),
        C.micro_of_day(F.col("ts")).alias("us"),
        C.nano_of_day(F.col("ts")).alias("ns"),
        C.epoch_nanos(F.col("ts")).alias("ens"),
        C.year_int(F.col("ts")).alias("yr"),
        C.zoned_time_iso(F.col("ts")).alias("zt"),
    ).collect()
    r = out[0]  # 2024-01-02 03:04:05.678901
    us = ((3 * 60 + 4) * 60 + 5) * 1_000_000 + 678_901
    assert r["ms"] == us // 1000 and r["us"] == us and r["ns"] == us * 1000
    assert r["ens"] == 1704164645678901000 and r["yr"] == 2024
    assert r["zt"] == "03:04:05.678901Z"
    e = out[1]  # epoch midnight
    assert e["ms"] == 0 and e["us"] == 0 and e["ns"] == 0 and e["ens"] == 0


def test_interval_and_duration(spark):
    """io.debezium.time.Interval.toIsoString (stripTrailingZeros seconds) and
    MicroDuration.durationMicros (30.4375 days/month, truncating)."""
    df = spark.createDataFrame(
        [(1, 2, 3, 4, 5, 6.25), (0, 0, 0, 0, 0, 7.0)],
        "y int, mo int, d int, h int, mi int, s double",
    )
    cols = [F.col(c) for c in ("y", "mo", "d", "h", "mi", "s")]
    out = df.select(
        C.interval_iso(*cols).alias("iso"),
        C.duration_micros(*cols).alias("us"),
    ).collect()
    assert out[0]["iso"] == "P1Y2M3DT4H5M6.25S"
    assert out[1]["iso"] == "P0Y0M0DT0H0M7S"
    # Java: numberOfDays = (1*12+2)*30.4375 + 3; ((nd*24+4)*60+5)*60+6.25
    nd = (1 * 12 + 2) * 30.4375 + 3
    assert out[0]["us"] == int((((nd * 24 + 4) * 60 + 5) * 60 + 6.25) * 1e6)
    assert out[1]["us"] == 7_000_000


def test_heartbeat_records(spark):
    """P15 heartbeat (HeartbeatImpl.java:30-69): one record per elapsed
    interval window, topic '__debezium-heartbeat.<server>', key={serverName},
    value={ts_ms}, carrying the window's max ts/offset."""
    from pyspark.sql import functions as F

    from debezium_spark.functions.transforms import heartbeat_records

    rows = [(i, i * 300) for i in range(10)]  # ts 0..2700 -> windows 0,1,2 @1000ms
    df = spark.createDataFrame(rows, "offset long, ts_ms long")
    hb = heartbeat_records(df, interval_ms=1000, server_name="srv")
    got = {r["value"]["ts_ms"]: r for r in hb.collect()}
    assert len(got) == 3
    # window maxima: ts 900 (offset 3), 1800 (offset 6), 2700 (offset 9)
    assert set(got) == {900, 1800, 2700}
    assert got[900]["offset"] == 3 and got[2700]["offset"] == 9
    assert all(r["topic"] == "__debezium-heartbeat.srv" for r in got.values())
    assert all(r["key"]["serverName"] == "srv" for r in got.values())


def test_heartbeat_pairs_offset_with_max_ts(spark):
    """On an out-of-order WAL the heartbeat's (ts_ms, offset) must describe
    ONE real event — the max-ts one — not two independent maxima (which could
    pair a high offset with a stale ts, regressing offset-vs-ts ordering)."""
    from debezium_spark.functions.transforms import heartbeat_records

    # offset 5 carries ts 100 (late arrival); offset 2 carries the window max 900
    rows = [(1, 50), (2, 900), (5, 100)]
    df = spark.createDataFrame(rows, "offset long, ts_ms long")
    [r] = heartbeat_records(df, interval_ms=1000, server_name="srv").collect()
    assert (r["value"]["ts_ms"], r["offset"]) == (900, 2)


def test_heartbeat_interval_zero_raises(spark):
    """Reference treats interval 0 as heartbeat-disabled (Heartbeat.java:31
    DEFAULT_INTERVAL=0 -> no-op); a 0 here is a caller bug, not one null row."""
    import pytest

    from debezium_spark.functions.transforms import heartbeat_records

    df = spark.createDataFrame([(1, 1)], "offset long, ts_ms long")
    with pytest.raises(ValueError):
        heartbeat_records(df, interval_ms=0, server_name="srv")


def test_propagate_source_types(spark, tmpdir_path):
    """column.propagate.source.type (PropagateSourceTypeToSchemaParameter.java:
    23-53): matched columns carry __debezium.source.column.type/length/scale/
    comment as StructField metadata — upper-cased type, full-name
    case-insensitive pattern match — and the metadata survives a parquet
    round-trip (what a sink reads to re-create source DDL)."""
    import os

    from debezium_spark.functions.transforms import propagate_source_types

    df = spark.createDataFrame(
        [("a", 1, 2.5)], "name string, qty int, price double"
    )
    out = propagate_source_types(
        df,
        "lake\\.repos\\.(name|price), LAKE\\.REPOS\\.QTY",
        data_collection="lake.repos",
        source_types={
            "name": {"type": "varchar", "length": 255, "comment": "display name"},
            "price": {"type": "numeric", "length": 8, "scale": 2},
        },
    )
    meta = {f.name: f.metadata for f in out.schema.fields}
    assert meta["name"]["__debezium.source.column.type"] == "VARCHAR"
    assert meta["name"]["__debezium.source.column.length"] == "255"
    assert meta["name"]["__debezium.source.column.comment"] == "display name"
    assert meta["price"]["__debezium.source.column.scale"] == "2"
    # case-insensitive full-name match; no source_types entry -> Spark type
    assert meta["qty"]["__debezium.source.column.type"] == "INT"
    # substring-only match must NOT propagate
    none = propagate_source_types(
        df, "repos\\.name", data_collection="lake.repos"
    )
    assert "__debezium.source.column.type" not in {
        f.name: f.metadata for f in none.schema.fields
    }["name"]
    # parquet round-trip keeps the schema parameters
    p = os.path.join(tmpdir_path, "meta_rt")
    out.write.parquet(p)
    rt = {f.name: f.metadata for f in spark.read.parquet(p).schema.fields}
    assert rt["name"]["__debezium.source.column.type"] == "VARCHAR"
    assert rt["price"]["__debezium.source.column.scale"] == "2"


def test_binary_modes(spark):
    """binary.handling.mode: bytes passthrough, base64 (no line breaks),
    LOWERCASE hex (HexConverter.java:17)."""
    import base64

    payload = bytes(range(0, 256, 7))
    df = spark.createDataFrame([(payload,)], "b binary")
    row = df.select(
        C.convert_binary(F.col("b"), "bytes").alias("raw"),
        C.convert_binary(F.col("b"), "base64").alias("b64"),
        C.convert_binary(F.col("b"), "hex").alias("hx"),
    ).first()
    assert bytes(row["raw"]) == payload
    assert row["b64"] == base64.b64encode(payload).decode()
    assert row["hx"] == payload.hex()  # python .hex() is lowercase
    with pytest.raises(ValueError, match="binary.handling.mode"):
        C.convert_binary(F.col("b"), "base16")


def test_handling_mode_converter_plugin(spark):
    """The engine-wide modes as one type-keyed converter plug-in: claims
    decimal/timestamp/date/binary columns per mode, leaves strings alone,
    and claims nothing when every mode is None."""
    from debezium_spark.functions.custom import CustomConverterRegistry

    df = spark.createDataFrame(
        [(Decimal("12.5"), "2020-03-04 05:06:07", "2020-03-04", b"\x01\xff", "keep")],
        "d decimal(10,2), ts string, dt string, b binary, s string",
    ).select(
        "d",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("dt").cast("date").alias("dt"),
        "b",
        "s",
    )
    plug = C.handling_mode_converter("string", "connect", "hex")
    out = CustomConverterRegistry([plug]).apply(df, "lake.t")
    row = out.first()
    assert row["d"] == "12.500000000000000000"
    assert row["ts"] == 1583298367000  # epoch millis (connect)
    assert row["dt"] == 18325          # epoch days
    assert row["b"] == "01ff"
    assert row["s"] == "keep"
    # adaptive -> epoch micros
    out2 = CustomConverterRegistry(
        [C.handling_mode_converter(time_mode="adaptive")]
    ).apply(df, "lake.t")
    assert out2.first()["ts"] == 1583298367000000
    assert out2.first()["d"] == Decimal("12.5")  # unclaimed without a mode
    # all-None claims nothing
    reg = CustomConverterRegistry([C.handling_mode_converter()])
    assert reg.apply(df, "lake.t").schema == df.schema and reg.is_empty()
    with pytest.raises(ValueError, match="time.precision.mode"):
        C.handling_mode_converter(time_mode="nanos")


def test_handling_mode_properties():
    """The reference's dotted property names map onto the mode fields and
    invalid values fail fast (Connect-style)."""
    from debezium_spark.config import EngineConfig

    cfg = EngineConfig.from_properties(
        {
            "decimal.handling.mode": "string",
            "time.precision.mode": "connect",
            "binary.handling.mode": "hex",
        }
    )
    assert (
        cfg.decimal_handling_mode,
        cfg.time_precision_mode,
        cfg.binary_handling_mode,
    ) == ("string", "connect", "hex")
    with pytest.raises(ValueError, match="binary_handling_mode"):
        EngineConfig.from_properties({"binary.handling.mode": "base16"})
    errs = EngineConfig.validate_properties({"time.precision.mode": "nanos"})
    assert errs and errs[0]["name"] == "time.precision.mode"
