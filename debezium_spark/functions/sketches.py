"""Mergeable sketch operators — the approximate-aggregation family a
100 TB pipeline runs where exact aggregation is either too expensive or
needed ONLINE (cardinality of a join key before planning, heavy hitters for
skew detection, per-partition profiles unioned without a second scan).

All sketches here are MERGEABLE: partial sketches build map-side per
partition and union associatively, so the shuffle carries fixed-size binary
sketches (~KB) instead of distinct values — the property that makes them
linear-scan at any scale. Estimates are approximate by contract, so the
binary-sketch operators are pytest-bounded against exact counts rather than
hash-matched against a SQL oracle (DuckDB's HLL implementation differs
bit-wise). The RELATIONAL count-min form (:func:`cms_table`) is the
exception: its hash is the shared oracle-portable md5 (`dedup._h64`), so its
estimates ARE bit-reproducible in DuckDB and the driver hash-gates them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cardinality_sketches(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: tuple[str, ...] = (),
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-group HLL cardinality: (group_cols..., distinct_estimate,
    hll_sketch BINARY). Spark's Apache DataSketches HLL (`hll_sketch_agg`)
    builds partials map-side; the emitted sketch column can be stored and
    later re-merged with :func:`merge_cardinality_sketches` — profile once,
    union forever, never rescan. lg_config_k=12 ≈ 1.6% relative error at
    4 KB per sketch.
    """
    g = df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_config_k)).alias("hll_sketch")
    )
    return g.select(
        *group_cols,
        F.hll_sketch_estimate("hll_sketch").alias("distinct_estimate"),
        "hll_sketch",
    )


def merge_cardinality_sketches(
    sketches: DataFrame,
    *,
    group_cols: tuple[str, ...] = (),
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Union previously-materialized HLL sketches (e.g. one per day/segment)
    into coarser groups without touching raw data — `hll_union_agg` is the
    associative merge that makes incremental profiling O(sketch count)."""
    g = sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias("hll_sketch")
    )
    return g.select(
        *group_cols,
        F.hll_sketch_estimate("hll_sketch").alias("distinct_estimate"),
        "hll_sketch",
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 10,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact top-k frequent values (skew detection: WHICH keys are hot before
    a join). Two-phase: map-side-combined count per value, then TakeOrdered
    on (count desc, value) — the count shuffle is value-cardinality-sized
    and the top-k never sorts globally. For cardinalities too large even for
    the count shuffle, feed a `hash_sample` of the input: frequencies of
    genuinely heavy values survive uniform sampling (the standard trade).

    Output: (group_cols..., value, n, rank) with rank 1..k per group.
    """
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols, F.col(value_col).alias("value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(
            F.desc("n"), F.asc("value")
        )
        return (
            counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )
    return (
        counts.orderBy(F.desc("n"), F.asc("value"))
        .limit(k)
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.desc("n"), F.asc("value"))
        ))
    )


# ------------------------------------------------------------- count-min
def _cms_bucket(value: Column, row: int, width: int) -> Column:
    """Bucket of ``value`` in count-min row ``row``: portable md5 hash
    (dedup._h64, the one oracle-shared hash) salted per row, mod width."""
    from debezium_spark.functions.dedup import _h64

    return F.pmod(_h64(value, f"cms{row}"), F.lit(width))


def _cms_keys(value: Column, depth: int, width: int) -> Column:
    """The depth-wide (row, bucket) key expansion for one value — the ONE
    expression both the build (cms_table) and probe (cms_estimate) sides
    must share: any drift between them silently corrupts estimates."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _cms_bucket(value, r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    )


def cms_table(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) in RELATIONAL form:
    one row per non-empty counter cell, ``(group_cols..., row, bucket, n)``.

    Each input value increments ``depth`` counters (row r, bucket
    h_r(value) mod width); a point estimate is the MIN over rows of its
    cells, never an underestimate, overestimating by at most
    ``2N/width`` with probability ``1 - 2^-depth``. Keeping the sketch as a
    table instead of a binary blob buys three things Spark-side: the build
    is one explode + map-side-combined groupBy (the shuffle carries at most
    ``depth * width`` cells per group, a fixed ceiling regardless of input
    rows); merging sketches from different segments is union + SUM
    (:func:`merge_cms_tables` — the same associativity the binary form
    gets from mergeInPlace); and the portable md5 row hash makes every
    estimate bit-reproducible in the DuckDB oracle (the driver hash-gates
    :func:`cms_estimate` output, which no binary sketch can offer).

    For the compact single-cell binary form use Spark's built-in
    ``F.count_min_sketch`` (:func:`freq_sketch_binary`); its estimates are
    pytest-law-bounded instead (JVM hashing is not SQL-reproducible).

    NULL values are EXCLUDED on both the build and probe sides (the
    COUNT(col) convention, matching Spark's binary ``count_min_sketch``) —
    without the filter a NULL hashes to a NULL bucket the probe join can
    never match, which would silently break the never-underestimate law.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    v = F.col(value_col).cast("string")
    cells = df.where(v.isNotNull()).select(
        *group_cols, _cms_keys(v, depth, width).alias("_c")
    ).select(*group_cols, F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
    return cells.groupBy(*group_cols, "row", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def merge_cms_tables(
    sketches: DataFrame,
    *,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Merge unioned relational CMS tables (same depth/width!) into coarser
    groups: counters add cell-wise, so the merge is one map-side-combined
    SUM over (group, row, bucket) — O(cells), never O(raw data)."""
    return sketches.groupBy(*group_cols, "row", "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    probe_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Point-estimate each probe value against a relational CMS:
    ``est_n = min over rows of counter[h_r(probe)]`` (missing cell = 0).

    The probe side is small by contract (a watchlist, the heavy-hitter
    candidates); each probe expands to ``depth`` (row, bucket) keys and
    BROADCAST-joins the sketch cells — with the sketch bounded at
    ``depth * width`` cells the join is a broadcast hash join regardless of
    which side Spark broadcasts. NULL probes are dropped (see
    :func:`cms_table`'s NULL note). Output: (group_cols..., value, est_n).
    """
    v = F.col(probe_col).cast("string")
    keys = probes.where(v.isNotNull()).select(
        *group_cols,
        v.alias("value"),
        _cms_keys(v, depth, width).alias("_c"),
    ).select(
        *group_cols, "value", F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket")
    )
    joined = keys.join(
        F.broadcast(cms.withColumnRenamed("n", "_cell_n")),
        [*group_cols, "row", "bucket"],
        "left",
    )
    return joined.groupBy(*group_cols, "value").agg(
        F.min(F.coalesce(F.col("_cell_n"), F.lit(0))).cast("long").alias("est_n")
    )


def freq_sketch_binary(
    df: DataFrame,
    value_col: str,
    *,
    eps: float = 0.01,
    confidence: float = 0.99,
    seed: int = 42,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Spark's built-in binary count-min (`F.count_min_sketch`): one compact
    blob per group (width=ceil(2/eps), depth=ceil(ln(1/(1-confidence)))),
    built with map-side partials. Decode/merge driver-side via
    ``org.apache.spark.util.sketch.CountMinSketch.readFrom`` (mergeInPlace
    is the associative union). Estimates overestimate-only within
    ``eps * N`` at the given confidence — pytest-pinned laws, no SQL oracle
    (JVM hashing). Output: (group_cols..., cms_sketch BINARY, total_n)."""
    return df.groupBy(*group_cols).agg(
        F.count_min_sketch(
            F.col(value_col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms_sketch"),
        F.count(F.col(value_col)).alias("total_n"),
    )
