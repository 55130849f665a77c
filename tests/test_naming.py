"""Avro schema/field name adjustment parity (util/SchemaNameAdjuster.java,
schema/FieldNameSelector.java)."""

import pytest
from pyspark.sql import functions as F

from debezium_spark.functions import naming as N


def test_fullname_validity_rules():
    assert N.is_valid_fullname("")  # reference: empty is valid
    assert N.is_valid_fullname("a.b.C_9")
    assert not N.is_valid_fullname("9abc")   # digit first char
    assert not N.is_valid_fullname(".abc")   # dot first char
    assert not N.is_valid_fullname("a-b")


def test_valid_fullname_substitution():
    assert N.valid_fullname("my-topic.v2") == "my_topic.v2"
    assert N.valid_fullname("9abc") == "_abc"      # first char REPLACED (not prefixed)
    assert N.valid_fullname("ok.name") == "ok.name"
    assert N.valid_fullname("") == ""


def test_adjuster_conflict_raises():
    adj = N.SchemaNameAdjuster()
    assert adj.adjust("a-b") == "a_b"
    assert adj.adjust("a-b") == "a_b"  # same original again: fine
    with pytest.raises(ValueError, match="conflicts"):
        adj.adjust("a+b")  # different original, same replacement


def test_sanitize_field_name_prefixes_leading_digit():
    # FieldNameSanitizer: leading digit is PREFIXED, kept (1col -> _1col)
    assert N.sanitize_field_name("1col") == "_1col"
    assert N.sanitize_field_name("col-a.b") == "col_a_b"  # no dots in field names
    assert N.sanitize_field_name("ok_col9") == "ok_col9"


def test_sanitize_field_names_frame(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["ok", "1num", "has-dash"])
    out = N.sanitize_field_names(df)
    assert out.columns == ["ok", "_1num", "has_dash"]
    df2 = spark.createDataFrame([(1, 2)], ["a-b", "a+b"])
    with pytest.raises(ValueError, match="colliding"):
        N.sanitize_field_names(df2)


def test_sanitize_topic_col(spark):
    df = spark.createDataFrame(
        [("srv.db-1.t",), ("9srv.t",), ("ok.name",), ("",)], "t string"
    )
    got = [r["s"] for r in df.select(N.sanitize_topic_col(F.col("t")).alias("s")).collect()]
    assert got == ["srv.db_1.t", "_srv.t", "ok.name", ""]