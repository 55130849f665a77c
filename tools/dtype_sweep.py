"""Sweep every queries()/oracle_sql() pair and report pandas-dtype mismatches
between the Spark result and the DuckDB result. The driver's value hash
stringifies values, so an INT column on one side rendered as float on the other
("2600" vs "2600.0") is a hash FAIL even when numerically equal — the exact
failure mode of the r03 `evt_windowed_metrics` red row (DuckDB sum(BIGINT)
returns HUGEINT, which pandas renders float64). Run at sf0.001 for speed."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd  # noqa: F401  (kept for interactive debugging)

sys.path.insert(0, "/root/repo")

from tools.check_entry import render_value  # noqa: E402

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
            # ANY cross-dtype pair can stringify differently (int-vs-float
            # "2600"/"2600.0", object(Decimal)-vs-float "3.250000"/"3.25",
            # None-vs-nan, …) — so render every cell with the same strict
            # stringifier as check_entry and compare the multisets.
            sa = sorted(a.map(render_value))
            sb = sorted(b.map(render_value))
            if sa != sb:
                ex = next(
                    (f" e.g. {x!r} vs {y!r}" for x, y in zip(sa, sb) if x != y),
                    "",
                )
                probs.append(f"{c}: spark={a.dtype} duck={b.dtype}{ex}")
        if probs:
            n_mismatch += 1
            print(f"DTYPE {name}: " + "; ".join(probs))
    print(f"done: {n_mismatch} entries with dtype-render mismatches")
    return n_mismatch


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
