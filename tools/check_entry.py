"""Local replica of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column names,
and order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif isinstance(df[c].dtype, pd.core.dtypes.dtypes.BaseMaskedDtype):
            df[c] = df[c].astype(object)
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None) -> int:
    import os

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    # CHECK_TZ=America/New_York runs the whole gate under a non-UTC driver
    # session — the regression leg that catches entries silently depending
    # on session config (the r03 red-row bug class). Default stays UTC,
    # matching the driver.
    tz = os.environ.get("CHECK_TZ", "UTC")
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", tz)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"....  {name}: rows={len(got)} (no oracle — rows-only check)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        status = "ok"
        if list(g.columns) != list(w.columns):
            status = f"COLUMN MISMATCH spark={list(g.columns)} duck={list(w.columns)}"
        elif len(g) != len(w):
            status = f"ROWCOUNT MISMATCH spark={len(g)} duck={len(w)}"
        else:
            for c in g.columns:
                a, b = g[c], w[c]
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    ok = np.allclose(
                        a.astype(float).fillna(-1e308),
                        b.astype(float).fillna(-1e308),
                        rtol=0, atol=0,
                    )
                else:
                    av = a.map(lambda v: str(v) if v is not None and v == v else "∅")
                    bv = b.map(lambda v: str(v) if v is not None and v == v else "∅")
                    ok = av.equals(bv)
                if not ok:
                    diff_idx = None
                    try:
                        neq = (a.astype(str).fillna("∅") != b.astype(str).fillna("∅"))
                        diff_idx = neq.idxmax()
                    except Exception:
                        pass
                    status = f"VALUE MISMATCH col={c} firstdiff@{diff_idx}: spark={a.iloc[diff_idx] if diff_idx is not None else '?'} duck={b.iloc[diff_idx] if diff_idx is not None else '?'}"
                    break
        dt = time.time() - t0
        if status == "ok":
            print(f"PASS  {name}: rows={len(g)} ({dt:.1f}s)")
        else:
            print(f"FAIL  {name}: {status}")
            failures += 1
    return failures


if __name__ == "__main__":
    only = sys.argv[1:] or None
    raise SystemExit(main(only=only))
