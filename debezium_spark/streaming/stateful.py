"""Continuous per-key LWW materialization with Structured Streaming state.

The batch engine resolves last-writer-wins per micro-batch and MERGEs into the
lake (operators/resolver.py + plans/lake.py). This module is the *continuous*
variant: per-key state lives in Spark's streaming state store
(``applyInPandasWithState``), so the winner comparison happens against ALL
history, not just the current batch — the Spark-native analogue of the
reference connector's compacted-topic materialization
(RelationalChangeRecordEmitter -> Kafka log compaction on the key;
SURVEY.md §2.4), kept incrementally instead of re-derived.

Scale shape: state is hash-partitioned by key across executors (the state
store shards with ``spark.sql.shuffle.partitions``), each micro-batch
shuffles only its own events, and the emitted changelog carries at most one
row per (key, batch) — downstream sinks see exactly the keys that changed.
Arrow-batched pandas on the grouped path (the sanctioned vectorized seam for
custom stateful operators); payload columns stay typed end-to-end (no JSON
round-trip — see resolver.py's NaN note).

Crash safety: the state store checkpoints with the query (WAL + snapshot
under ``checkpointLocation``); on restart the store resumes at the last
committed epoch, so re-delivered events lose the ordinal comparison and the
changelog stays exactly-once w.r.t. state transitions.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.resolver import ACTION_DELETE, ACTION_UPSERT  # same changelog vocabulary


def _payload_type(env: DataFrame) -> T.StructType:
    return env.schema["value"].dataType["after"].dataType


def stateful_lww(
    env: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("repo", "path"),
) -> DataFrame:
    """Envelope stream -> per-key changelog of state transitions.

    Input: a (streaming or batch) envelope frame ``(key, value, offset[, seq])``
    (envelope.wrap_wal schema). Output: one row per key whose winner CHANGED in
    the trigger — ``key_cols*, action ('upsert'|'delete'), <non-key payload
    cols>, _offset, _ts_ms`` — i.e. the stream a sink would apply; unchanged
    keys emit nothing (a stale re-delivery with a lower ordinal is absorbed by
    the state comparison, the resume/dedup rule S8 applied against all
    history). ``_ts_ms`` is the winning event's source timestamp, so the row
    is directly mergeable by LakeTable.merge (run_streaming_stateful).

    Ordering key: the same ``offset * 128 + seq`` ordinal as the batch
    resolver (resolver.py:resolve_lww), so batch and continuous modes resolve
    identically, including PK-split sub-sequence ties.

    Tombstones and deletes both transition the key to deleted; the state row
    is kept (ordinal memory) so late lower-ordinal upserts cannot resurrect a
    deleted key — the state-store twin of the lake's retained delete
    tombstones (plans/lake.py merge guard).
    """
    payload_t = _payload_type(env)
    data_fields = [f for f in payload_t.fields if f.name not in key_cols]
    key_t = env.schema["key"].dataType

    seq = (F.col("seq") if "seq" in env.columns else F.lit(0)).cast("long")
    val = F.col("value")
    is_del = val.getField("op").isNull() | (val.getField("op") == "d")
    flat = env.select(
        *[F.col("key").getField(c).alias(c) for c in key_cols],
        (F.col("offset").cast("long") * 128 + seq).alias("_ord"),
        F.coalesce(val.getField("ts_ms").cast("long"), F.lit(0)).alias("_ts"),
        is_del.alias("_is_delete"),
        *[
            F.when(~is_del, val.getField("after").getField(f.name))
            .cast(f.dataType)
            .alias(f.name)
            for f in data_fields
        ],
    )

    state_t = T.StructType(
        [
            T.StructField("_ord", T.LongType()),
            T.StructField("_ts", T.LongType()),
            T.StructField("_is_delete", T.BooleanType()),
            *[T.StructField(f.name, f.dataType) for f in data_fields],
        ]
    )
    out_t = T.StructType(
        [
            *[T.StructField(c, key_t[c].dataType) for c in key_cols],
            T.StructField("action", T.StringType()),
            *[T.StructField(f.name, f.dataType) for f in data_fields],
            T.StructField("_offset", T.LongType()),
            T.StructField("_ts_ms", T.LongType()),
        ]
    )
    data_names = [f.name for f in data_fields]
    n_keys = len(key_cols)

    def resolve(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best_ord: int | None = None
        best_row: tuple[int, bool, list[Any]] | None = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            i = int(pdf["_ord"].idxmax())
            o = int(pdf["_ord"].loc[i])
            if best_ord is None or o > best_ord:
                best_ord = o
                row = pdf.loc[i]
                # scalar-safe null check: pd.isna on an array-typed cell
                # (list/np.ndarray payload column) returns elementwise and
                # would raise on truth-testing — arrays are never "missing"
                vals = [
                    row[c]
                    if isinstance(row[c], (list, tuple, np.ndarray))
                    else (None if pd.isna(row[c]) else row[c])
                    for c in data_names
                ]
                best_row = (int(row["_ts"]), bool(row["_is_delete"]), vals)
        if best_ord is None:
            return
        if state.exists and int(state.get[0]) >= best_ord:
            return  # stale re-delivery: all-history dedup, no emission
        ts, is_delete, vals = best_row
        state.update((best_ord, ts, is_delete, *vals))
        action = ACTION_DELETE if is_delete else ACTION_UPSERT
        yield pd.DataFrame(
            [[*key, action, *vals, best_ord // 128, ts]],
            columns=[*key_cols, "action", *data_names, "_offset", "_ts_ms"],
        )

    return flat.groupBy(*key_cols).applyInPandasWithState(
        resolve, out_t, state_t, "update", GroupStateTimeout.NoTimeout
    )
