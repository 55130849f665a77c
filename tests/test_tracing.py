"""ActivateTracingSpan batch analogue
(transforms/tracing/ActivateTracingSpan.java:1-186)."""

import hashlib

from pyspark.sql import functions as F

from debezium_spark.functions import tracing as TR


def _env(spark):
    df = spark.createDataFrame(
        [
            # parent context rides in after.tracingspancontext; Properties
            # export always has a leading date comment (DebeziumTextMap.export)
            (1, "c", 100, 90,
             "#Thu Jan 01 00:00:00 UTC 2026\r\ntraceid=abcdef0123456789\r\nspanid=f00d"),
            (2, "u", 200, 190, None),       # no propagated context
            (3, "t", None, None, None),     # tombstone -> untouched
        ],
        "offset long, op string, ts_ms long, src_ts long, ctx string",
    )
    return df.select(
        "offset",
        F.when(
            F.col("op") != "t",
            F.struct(
                F.struct(
                    F.lit("r1").alias("repo"),
                    F.col("ctx").alias("tracingspancontext"),
                ).alias("after"),
                F.col("op").alias("op"),
                F.col("ts_ms").alias("ts_ms"),
                F.struct(
                    F.lit("pg").alias("connector"),
                    F.col("src_ts").alias("ts_ms"),
                    F.lit(None).cast("string").alias("db"),
                ).alias("source"),
            ),
        ).alias("value"),
    )


def _md5_16(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:16]


def test_spans_tags_and_headers(spark):
    rows = {r["offset"]: r for r in TR.activate_tracing_span(_env(spark)).collect()}

    r1 = rows[1]
    t = r1["tracing"]
    assert t["trace_id"] == "abcdef0123456789"       # extracted parent context
    assert t["parent_span_id"] == "f00d"
    tx, dbz = t["tx_log_span"], t["debezium_span"]
    assert tx["parent_span_id"] == "f00d"            # asChildOf(parent context)
    assert dbz["parent_span_id"] == tx["span_id"]    # asChildOf(txLogSpan)
    assert tx["span_id"] == _md5_16("abcdef0123456789:db-log-write:1")
    assert dbz["span_id"] == _md5_16("abcdef0123456789:debezium-read:1")
    assert tx["start_us"] == 90_000 and dbz["start_us"] == 100_000
    assert tx["tags"] == {"db.connector": "pg", "db.ts_ms": "90"}  # null db skipped
    assert dbz["tags"] == {"op": "c", "ts_ms": "100"}
    assert tx["component"] == dbz["component"] == "debezium"
    assert r1["__header_traceid"] == "abcdef0123456789"
    assert r1["__header_spanid"] == dbz["span_id"]   # tracer.inject analogue

    r2 = rows[2]                                     # no context -> derived ids
    t2 = r2["tracing"]
    assert t2["trace_id"] == _md5_16("trace:2")
    assert t2["parent_span_id"] is None
    assert t2["tx_log_span"]["parent_span_id"] is None

    r3 = rows[3]                                     # tombstone untouched
    assert r3["tracing"] is None
    assert r3["__header_traceid"] is None and r3["__header_spanid"] is None


def test_require_context_field_skips_bare_events(spark):
    out = TR.activate_tracing_span(_env(spark), require_context_field=True)
    rows = {r["offset"]: r for r in out.collect()}
    assert rows[1]["tracing"] is not None
    assert rows[2]["tracing"] is None                # ActivateTracingSpan.java:108-110
    assert rows[3]["tracing"] is None


def test_parse_span_context_properties_subset(spark):
    df = spark.createDataFrame(
        [("#c\n!c2\n\na=1\nb=x=y\n  c = 2 ",), (None,)], "s string"
    )
    got = df.select(TR.parse_span_context(F.col("s")).alias("m")).collect()
    m = got[0]["m"]
    assert m["a"] == "1"
    assert m["b"] == "x=y"      # split on the FIRST '=' only
    assert got[1]["m"] is None
