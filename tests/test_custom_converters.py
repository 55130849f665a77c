"""Custom converter plug-in registry (spi/converter/CustomConverter.java:18-47,
relational/CustomConverterRegistry.java:32,55-143): ordered chain, first claim
wins, unclaimed columns fall through, stale registrations dropped after DDL,
and conversions stay pure column algebra end-to-end through the engine."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark import CdcEngine, EngineConfig
from debezium_spark.functions.custom import (
    ConverterDefinition,
    CustomConverterRegistry,
    RelationalColumn,
)
from debezium_spark.sources import wal as W
from tests import oracle


def tinyint_one_to_boolean(col: RelationalColumn):
    """The reference's canonical example plug-in
    (TinyIntOneToBooleanConverter.java): TINYINT(1) columns become booleans."""
    if col.type_name in ("tinyint", "smallint") and (col.length or 1) == 1:
        return ConverterDefinition(
            field_type=T.BooleanType(), convert=lambda c: c == 1
        )
    return None


def upper_langs(col: RelationalColumn):
    if col.name == "lang":
        return ConverterDefinition(
            field_type=T.StringType(), convert=lambda c: F.upper(c)
        )
    return None


def lower_langs(col: RelationalColumn):
    if col.name == "lang":
        return ConverterDefinition(
            field_type=T.StringType(), convert=lambda c: F.lower(c)
        )
    return None


def test_first_claim_wins_and_fallthrough(spark):
    reg = CustomConverterRegistry([upper_langs, lower_langs, tinyint_one_to_boolean])
    df = spark.createDataFrame(
        [("Py", 1, "x"), ("Rs", 0, "y")], "lang string, flag smallint, other string"
    )
    # smallint defaults to length None -> treated as width-1 per the example
    out = reg.apply(df, "lake.repos")
    assert dict(out.dtypes)["flag"] == "boolean"
    got = {r["other"]: (r["lang"], r["flag"]) for r in out.collect()}
    # upper_langs registered first -> wins over lower_langs
    assert got == {"x": ("PY", True), "y": ("RS", False)}
    # registration cache mirrors the chain consultation
    assert reg.value_converter("lake.repos", "lang") is not None
    assert reg.value_converter("lake.repos", "other") is None
    assert not reg.is_empty()


def test_stale_registration_removed_after_alter(spark):
    """CustomConverterRegistry.java:125-127: when the table is altered and no
    converter claims the column's new shape, the old registration is removed."""
    reg = CustomConverterRegistry([tinyint_one_to_boolean])
    claimed = reg.register_converter_for(
        RelationalColumn("flag", "lake.repos", "tinyint")
    )
    assert claimed is not None
    assert reg.value_converter("lake.repos", "flag") is not None
    # ALTER: flag widened to int -> re-consultation drops the claim
    re = reg.register_converter_for(RelationalColumn("flag", "lake.repos", "int"))
    assert re is None
    assert reg.value_converter("lake.repos", "flag") is None
    assert reg.is_empty()


def test_engine_applies_custom_converters(spark, tmpdir_path):
    """config.custom_converters end-to-end: payload columns rewritten in both
    images before the merge, key columns never offered to the chain."""
    spec = W.WalSpec(n_keys=120, n_events=500, seed=53, schema_changes=False)
    wal_dir = os.path.join(tmpdir_path, "wal")
    W.write_wal(spark, spec, wal_dir, n_files=3)

    def claims_everything(col: RelationalColumn):
        # would corrupt keys if offered them — the engine must skip key cols
        return ConverterDefinition(
            field_type=T.StringType(),
            convert=lambda c: F.concat(F.lit("cc:"), c.cast("string")),
        )

    eng = CdcEngine(
        spark,
        EngineConfig(custom_converters=[claims_everything]),
        wal_path=wal_dir,
        target_path=os.path.join(tmpdir_path, "t"),
        work_dir=os.path.join(tmpdir_path, "w"),
    )
    eng.run()
    final = eng.target().read().select("repo", "path", "content").toPandas()
    # keys untouched; every non-null content rewritten by the plug-in
    assert not final["repo"].str.startswith("cc:").any()
    assert final["content"].dropna().str.startswith("cc:").all()

    wal_pd = (
        spark.read.parquet(wal_dir)
        .select("offset", "is_tombstone", "op", "repo", "path", "after")
        .toPandas()
    )
    expected = oracle.reduce_wal(wal_pd)
    exp = {
        k: ("cc:" + v["content"] if v.get("content") is not None else None)
        for k, v in expected.items()
    }
    got = {
        (r.repo, r.path): r.content for r in final.itertuples(index=False)
    }
    assert got == exp
