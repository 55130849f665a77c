"""Sweep every queries()/oracle_sql() pair and report pandas-dtype mismatches
between the Spark result and the DuckDB result. The driver's value hash
stringifies values, so an INT column on one side rendered as float on the other
("2600" vs "2600.0") is a hash FAIL even when numerically equal — the exact
failure mode of the r03 `evt_windowed_metrics` red row (DuckDB sum(BIGINT)
returns HUGEINT, which pandas renders float64). Run at sf0.001 for speed."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_mismatch = 0
    for name, fn in qs.items():
        if name not in oracles:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:160]}")
            n_mismatch += 1
            continue
        probs = []
        for c in sorted(set(got.columns) & set(want.columns)):
            a, b = got[c], want[c]
            af = pd.api.types.is_float_dtype(a)
            bf = pd.api.types.is_float_dtype(b)
            ai = pd.api.types.is_integer_dtype(a)
            bi = pd.api.types.is_integer_dtype(b)
            # int-on-one-side / float-on-the-other stringifies differently
            if (af and bi) or (ai and bf):
                # Spark nullable ints arrive float64 when nulls exist; only a
                # problem when the *rendered strings* differ, so check that.
                sa = a.map(lambda v: "∅" if v is None or v != v else str(v))
                sb = b.map(lambda v: "∅" if v is None or v != v else str(v))
                if sorted(sa) != sorted(sb):
                    probs.append(f"{c}: spark={a.dtype} duck={b.dtype}")
        if probs:
            n_mismatch += 1
            print(f"DTYPE {name}: " + "; ".join(probs))
    print(f"done: {n_mismatch} entries with dtype-render mismatches")
    return n_mismatch


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
