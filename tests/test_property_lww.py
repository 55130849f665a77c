"""Property-based test: random WALs through the resolver pipeline match the
pandas reference reducer.

Hypothesis generates adversarial event interleavings the deterministic WAL
generator never produces — PK changes landing on keys that already exist,
deletes of never-created keys, re-creation after a PK-change delete, exact
duplicate re-deliveries, tombstones with no preceding delete — and checks that
dedup-by-offset -> envelope wrap -> PK-change split -> LWW resolve applied to
an empty lake equals `tests/oracle.reduce_wal` (the stand-in for the reference
connector's compacted state, Envelope.java:274-369 +
RelationalChangeRecordEmitter.java:160-174) under BOTH physical strategies.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from tests import oracle as O
from debezium_spark.functions import envelope as E
from debezium_spark.operators import resolver as R

REPOS = ["r0", "r1"]
PATHS = ["a", "b", "c"]
KEYS = [(r, p) for r in REPOS for p in PATHS]

_PAYLOAD_T = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)
_WAL_T = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("before", _PAYLOAD_T),
        T.StructField("after", _PAYLOAD_T),
        T.StructField("is_tombstone", T.BooleanType(), False),
        T.StructField("tx_id", T.LongType()),
        T.StructField("schema_version", T.IntegerType()),
    ]
)

# One abstract event: (kind, key index, target key index for PK changes).
# kind: 0=create 1=update 2=pk-change-update 3=delete 4=tombstone
_event = st.tuples(
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=len(KEYS) - 1),
    st.integers(min_value=0, max_value=len(KEYS) - 1),
)


def _payload(key: tuple[str, str], version: int) -> dict:
    return {
        "repo": key[0],
        "path": key[1],
        "lang": "py",
        "content": f"{key[0]}/{key[1]}@v{version}",
    }


def _wal_rows(events: list[tuple[int, int, int]], dup_every: int) -> list[dict]:
    rows = []
    for i, (kind, ki, kj) in enumerate(events):
        off = i * 4  # strided offsets leave room for nothing — they are unique
        key = KEYS[ki]
        row = {
            "offset": off,
            "ts_ms": 1_700_000_000_000 + off,
            "op": None,
            "repo": key[0],
            "path": key[1],
            "before": None,
            "after": None,
            "is_tombstone": False,
            "tx_id": i // 4,
            "schema_version": 1,
        }
        if kind == 0:
            row["op"] = "c"
            row["after"] = _payload(key, off)
        elif kind == 1:
            row["op"] = "u"
            row["before"] = _payload(key, 0)
            row["after"] = _payload(key, off)
        elif kind == 2:  # PK change: before=key, after=target key (may collide)
            row["op"] = "u"
            row["before"] = _payload(key, 0)
            row["after"] = _payload(KEYS[kj], off)
        elif kind == 3:
            row["op"] = "d"
            row["before"] = _payload(key, 0)
        else:  # tombstone, possibly with no preceding delete
            row["op"] = "d"
            row["before"] = None
            row["is_tombstone"] = True
        rows.append(row)
        if dup_every and i % dup_every == dup_every - 1:
            rows.append(dict(row))  # exact duplicate re-delivery
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(_event, min_size=1, max_size=40),
    dup_every=st.sampled_from([0, 3, 5]),
)
def test_random_wal_matches_reference_reducer(spark, events, dup_every):
    rows = _wal_rows(events, dup_every)
    wal = spark.createDataFrame(rows, schema=_WAL_T)

    # reference state: pandas reducer over the raw (pre-dedup) WAL
    want = O.state_hashes(O.reduce_wal(pd.DataFrame(rows)))

    env = R.split_pk_changes(
        E.wrap_wal(R.dedup_by_offset(wal)), key_cols=("repo", "path")
    )
    for strategy in ("ordinal", "aggregate"):
        actions = R.resolve_lww(env, strategy=strategy).collect()
        got = {
            (
                r["repo"],
                r["path"],
                hashlib.sha256(
                    (r["after"]["content"] or "").encode()
                ).hexdigest(),
            )
            for r in actions
            if r["action"] == R.ACTION_UPSERT
        }
        assert got == want, f"strategy={strategy} diverged from reducer"
        # exactly one action per key, delete keys disjoint from upsert keys
        keys = [(r["repo"], r["path"]) for r in actions]
        assert len(keys) == len(set(keys))
