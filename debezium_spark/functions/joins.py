"""Temporal join operators Spark lacks as built-ins: as-of join and
interval (range) containment join.

Both are implemented as compositions of existing DataFrame ops chosen for
their 100 TB shape — Spark's own planner turns a naive `l.ts >= r.ts`
inequality join into a BroadcastNestedLoopJoin (quadratic wall) — and both
have exact-arithmetic outputs so the DuckDB oracles (native ASOF JOIN /
BETWEEN join) verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from debezium_spark.streaming.windows import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: tuple[str, ...],
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = (),
    strict: bool = True,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: attach to every left row the LATEST right row of
    the same key with ``right.ts < left.ts`` (``strict=False`` for ``<=``) —
    the point-in-time join of every market-data / feature-store / CDC-state
    lookup ("what was the user's last profile value when this event fired").

    THE scale trick is the union-window form: tag both sides, union them,
    and run one `last_value(payload, ignorenulls)` window partitioned by the
    key and ordered by (ts, side) — ONE hash exchange + per-key sort, no
    inequality join anywhere (Spark plans naive ``l.ts >= r.ts`` joins as
    BroadcastNestedLoopJoin — quadratic). Right payload columns travel in a
    single struct so the matched row is attached atomically; right-side ts
    ties within a key are collapsed to the highest-ordinality row BEFORE the
    union (deterministic, engine-portable).

    Output: every left row + ``<col><suffix>`` for each of ``right_cols``
    + ``ts<suffix>`` (the matched right row's ts; all null when no earlier
    right row exists — a LEFT as-of join).
    """
    if not right_cols:
        raise ValueError("right_cols must name at least one column")
    key = list(on)
    ts = F.col(ts_col)
    # collapse right-side ts ties deterministically: keep the max-ordinal row
    # per (key, ts) — max_by over a struct of the payload ordered by itself
    r1 = (
        right.select(*key, ts_col, *right_cols)
        .groupBy(*key, ts_col)
        .agg(
            F.max(F.struct(*right_cols)).alias("_rp")
        )
    )
    payload = F.struct(
        F.col(ts_col).alias("_rts"), F.col("_rp").alias("_rvals")
    )
    r_side = r1.select(
        *key,
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_rpayload"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left.columns
        ],
    )
    l_side = left.select(
        *key,
        ts.alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_side.schema["_rpayload"].dataType).alias("_rpayload"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    # strict (<):  left sorts BEFORE right at equal ts, so an equal-ts right
    #              row is not yet visible to the window.
    # non-strict (<=): right sorts first and IS visible.
    side_order = F.desc("_side") if strict else F.asc("_side")
    w = (
        Window.partitionBy(*key)
        .orderBy(F.col("_t"), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r_side.unionByName(l_side)
        .withColumn("_m", F.last("_rpayload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m._rts").alias(f"{ts_col}{suffix}"))
    out_cols += [
        F.col(f"_m._rvals.{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return matched.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: tuple[str, ...] = (),
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range/containment join: match each point to every interval (same key)
    with ``start <= ts <= end`` — session attribution, validity-window
    lookups, IP-range joins.

    Spark plans a naive BETWEEN join as BroadcastNestedLoopJoin; the scale
    form buckets time: each interval EXPLODES to the epoch buckets it
    covers, each point hashes to its one bucket, and the match becomes an
    equi-join on (key..., bucket) + a residual containment filter. A
    (point, interval) pair meets in exactly ONE bucket (the point's), so no
    dedup pass is needed. Cost is interval_rows x avg_buckets_per_interval
    — pick ``bucket_seconds`` near the typical interval length (buckets ~=
    span/bucket + 1); pathological month-long intervals explode to ~720
    hourly rows, still linear, never quadratic.

    Inner semantics; :func:`interval_join_left` keeps unmatched points.
    Output: all point columns + all interval columns (same-key columns
    appear once).
    """
    key = list(on)
    b = int(bucket_seconds)
    # session-tz-independent NTZ epoch (see windows.epoch_us docstring)
    p_ep = epoch_seconds(F.col(point_ts))
    s_ep = epoch_seconds(F.col(start_col))
    e_ep = epoch_seconds(F.col(end_col))
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(s_ep / b), F.floor(e_ep / b))),
    )
    pts = points.withColumn("_bucket", F.floor(p_ep / b))
    ival_cols = [c for c in intervals.columns if c not in key]
    joined = pts.join(
        ivals.select(*key, "_bucket", *ival_cols), key + ["_bucket"], "inner"
    )
    contained = (
        (p_ep >= epoch_seconds(F.col(start_col)))
        & (p_ep <= epoch_seconds(F.col(end_col)))
    )
    return joined.where(contained).drop("_bucket")


def interval_join_left(
    points: DataFrame,
    intervals: DataFrame,
    **kwargs,
) -> DataFrame:
    """LEFT containment join that keeps every point exactly once when
    unmatched: inner interval_join + anti-join union of unmatched points
    with null interval columns. The anti-join uses NULL-SAFE equality on
    every point column — a plain column-list join compares NULL = NULL as
    NULL, which would re-emit any matched point that carries a null
    attribute as unmatched too."""
    inner = interval_join(points, intervals, **kwargs)
    key_pt = points.columns
    matched_keys = inner.select(*key_pt).distinct()
    cond = None
    for c in key_pt:
        eq = points[c].eqNullSafe(matched_keys[c])
        cond = eq if cond is None else (cond & eq)
    unmatched = points.join(matched_keys, cond, "left_anti")
    for c in inner.columns:
        if c not in key_pt:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(inner.dtypes)[c])
            )
    return inner.unionByName(unmatched)
