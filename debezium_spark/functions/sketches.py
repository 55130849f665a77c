"""Mergeable sketch operators — the approximate-aggregation family a
100 TB pipeline runs where exact aggregation is either too expensive or
needed ONLINE (cardinality of a join key before planning, heavy hitters for
skew detection, per-partition profiles unioned without a second scan).

All sketches here are MERGEABLE: partial sketches build map-side per
partition and union associatively, so the shuffle carries fixed-size binary
sketches (~KB) instead of distinct values — the property that makes them
linear-scan at any scale. Estimates are approximate by contract, so these
operators are pytest-bounded against exact counts rather than hash-matched
against a SQL oracle (DuckDB's HLL implementation differs bit-wise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
