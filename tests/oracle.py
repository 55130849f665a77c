"""Reference reducer: apply the WAL per key in offset order, in pandas.

This stands in for the reference Debezium connector's materialized state (the
downstream compacted topic): final state per (repo, path) after replaying the full
log, compared by per-row sha256(content) equality (BASELINE.json invariant).

Semantics applied, mirroring the engine:
  * events apply in (offset, sub-order) order; duplicate offsets apply once
  * r/c/u set state[key] = after
  * a key-changing update (before key != after key) deletes the old key then creates
    the new one (RelationalChangeRecordEmitter.java:160-174)
  * d / tombstone remove the key
"""

from __future__ import annotations

import hashlib

import pandas as pd


def reduce_wal(wal: pd.DataFrame) -> dict[tuple[str, str], dict]:
    wal = wal.sort_values(["offset", "is_tombstone"], kind="stable")
    state: dict[tuple[str, str], dict] = {}
    seen_offsets: set[tuple[int, bool]] = set()
    for row in wal.itertuples(index=False):
        oid = (row.offset, bool(row.is_tombstone))
        if oid in seen_offsets:
            continue  # duplicate delivery
        seen_offsets.add(oid)
        key = (row.repo, row.path)
        if row.is_tombstone:
            state.pop(key, None)
            continue
        op = row.op
        if op == "d":
            state.pop(key, None)
            continue
        after = row.after
        if after is None:
            continue
        if isinstance(after, dict):
            a = after
        else:  # Row
            a = after.asDict()
        new_key = (a["repo"], a["path"])
        if op == "u" and new_key != key:
            state.pop(key, None)  # PK change: delete old, create new
        state[new_key] = dict(a)
    return state


def state_hashes(state: dict[tuple[str, str], dict]) -> set[tuple[str, str, str]]:
    return {
        (k[0], k[1], hashlib.sha256((v.get("content") or "").encode()).hexdigest())
        for k, v in state.items()
    }


def target_hashes(df_pandas: pd.DataFrame) -> set[tuple[str, str, str]]:
    return {
        (r.repo, r.path, hashlib.sha256((r.content or "").encode()).hexdigest())
        for r in df_pandas.itertuples(index=False)
    }
