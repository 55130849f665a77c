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


def render_value(v) -> str:
    """Strict driver-style stringification of ONE cell. Every value of every
    column — object (Decimal!), float, int, datetime, list, bytes — is rendered
    to text and compared exactly; no float-coercion, no NaN/NULL collapsing.
    This is what let r4's `dt_special_decimal` ship red: the old comparison
    `astype(float).fillna(-1e308)`-coerced any float-dtype pair, hiding both
    Decimal('3.250000')-vs-3.25 and None-vs-nan drift that the driver's
    stringified hash distinguishes."""
    if v is None or v is pd.NA:
        return "∅"
    if isinstance(v, float):  # covers np.float64; NaN kept distinct from NULL
        return "nan" if v != v else str(v)
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(render_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(
            f"{k}: {render_value(x)}" for k, x in sorted(v.items())
        ) + "}"
    try:
        if v != v:  # NaT and friends
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted-columns, every cell rendered via render_value, rows sorted on the
    rendered strings — exactly as strict as the driver's value hash (a local
    PASS implies a driver hash match; never weaker)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(render_value)
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
                if not a.equals(b):
                    neq = a != b
                    diff_idx = neq.idxmax()
                    status = (
                        f"VALUE MISMATCH col={c} firstdiff@{diff_idx}: "
                        f"spark={a.iloc[diff_idx]!r} duck={b.iloc[diff_idx]!r}"
                    )
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
