"""CRDT counters (io.debezium.crdt) as distributed DataFrame aggregations.

The reference ships state-based conflict-free replicated counters used to
accumulate change totals that merge safely across processes:

* ``GCounter``  — grow-only adds (crdt/StateBasedGCounter.java:1).
* ``PNCounter`` — adds + removes, value = adds - removes
  (crdt/StateBasedPNCounter.java:1; ``merge`` sums both sides).
* ``DeltaCounter`` — a PNCounter that additionally tracks the changes since the
  last ``reset()`` so only the delta need be shipped
  (crdt/StateBasedPNDeltaCounter.java:1; merging a DeltaCount folds the
  *changes* into both the total and the delta).

Spark-first re-expression: a counter state is a row ``(key..., adds, removes)``
and every operation is a map-side-combining ``groupBy().sum()`` — the
commutative/associative merge IS Spark's partial aggregation, so the "replica
merge" costs one slim shuffle row per key regardless of event volume. No
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "g_counter",
    "pn_counter",
    "pn_counter_from_ops",
    "merge_counter_states",
    "delta_counter_merge",
]


def _value(adds: Column, removes: Column) -> Column:
    return (adds - removes).alias("value")


def g_counter(df: DataFrame, key_cols: list[str], *, adds: Column | None = None) -> DataFrame:
    """Grow-only counter rollup (StateBasedGCounter.java:1): per-key total adds.

    ``adds``: an optional per-row contribution (defaults to 1 per row —
    ``increment()``). Output: key columns + ``adds`` + ``value`` (== adds;
    GCount.getIncrement == get, GCount.java:1).
    """
    inc = adds if adds is not None else F.lit(1).cast("long")
    return df.groupBy(*key_cols).agg(F.sum(inc).cast("long").alias("adds")).select(
        *key_cols, "adds", F.col("adds").alias("value")
    )


def pn_counter(
    df: DataFrame, key_cols: list[str], *, increments: Column, decrements: Column
) -> DataFrame:
    """PN counter rollup (StateBasedPNCounter.java:1): per-key
    ``(adds, removes, value = adds - removes)`` from per-row contribution
    columns. One map-side-combining shuffle."""
    return (
        df.groupBy(*key_cols)
        .agg(
            F.sum(increments).cast("long").alias("adds"),
            F.sum(decrements).cast("long").alias("removes"),
        )
        .select(*key_cols, "adds", "removes", _value(F.col("adds"), F.col("removes")))
    )


def pn_counter_from_ops(
    env: DataFrame, key_cols: list[str], *, op: Column | None = None
) -> DataFrame:
    """PN counter over a CDC envelope stream: create/read ops increment, delete
    ops decrement, updates are value-neutral (the row count per key is the
    live-row PN count — the reference uses exactly this counter shape for its
    snapshot/stream change meters, pipeline/meters/CommonEventMeter.java:1).

    Tombstones (null value) carry no content and count nothing.
    """
    o = op if op is not None else F.col("value.op")
    inc = F.when(o.isin("c", "r"), 1).otherwise(0).cast("long")
    dec = F.when(o == "d", 1).otherwise(0).cast("long")
    flat = env.select(
        *[F.col(f"key.{c}").alias(c) for c in key_cols], inc.alias("_inc"), dec.alias("_dec")
    )
    return pn_counter(flat, key_cols, increments=F.col("_inc"), decrements=F.col("_dec"))


def merge_counter_states(*states: DataFrame) -> DataFrame:
    """State-based merge of counter states from independent replicas
    (PNCounter.merge: adds/removes sum pairwise; StateBasedPNCounter.java:1).

    Each input is a ``(key..., adds, removes, ...)`` frame; the merge is a
    union + re-aggregate — commutative, associative, idempotent-per-replica,
    exactly the CRDT contract, and Spark executes it as one partial-agg
    shuffle over slim counter rows."""
    if not states:
        raise ValueError("merge_counter_states needs at least one state frame")
    key_cols = [c for c in states[0].columns if c not in ("adds", "removes", "value")]
    merged = states[0].select(*key_cols, "adds", "removes")
    for s in states[1:]:
        merged = merged.unionByName(s.select(*key_cols, "adds", "removes"))
    return (
        merged.groupBy(*key_cols)
        .agg(F.sum("adds").alias("adds"), F.sum("removes").alias("removes"))
        .select(*key_cols, "adds", "removes", _value(F.col("adds"), F.col("removes")))
    )


def delta_counter_merge(total: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a batch's *changes* into the running totals
    (StateBasedPNDeltaCounter.merge, crdt/StateBasedPNDeltaCounter.java:84-95:
    merging a DeltaCount adds only the delta to the totals).

    ``total``: the persisted ``(key..., adds, removes)`` state; ``delta``: this
    batch's PN rollup. Keys new to the delta appear with the delta as their
    total (merge into an implicit zero counter). Returns the new total state
    plus the batch's ``delta_adds``/``delta_removes`` (DeltaCount.getChanges)
    so callers can persist totals and ship deltas separately."""
    key_cols = [c for c in total.columns if c not in ("adds", "removes", "value")]
    d = delta.select(
        *key_cols,
        F.col("adds").alias("delta_adds"),
        F.col("removes").alias("delta_removes"),
    )
    t = total.select(*key_cols, "adds", "removes")
    joined = t.join(d, on=key_cols, how="full_outer")
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    return joined.select(
        *key_cols,
        (z("adds") + z("delta_adds")).alias("adds"),
        (z("removes") + z("delta_removes")).alias("removes"),
        (z("adds") + z("delta_adds") - z("removes") - z("delta_removes")).alias("value"),
        z("delta_adds").alias("delta_adds"),
        z("delta_removes").alias("delta_removes"),
    )
