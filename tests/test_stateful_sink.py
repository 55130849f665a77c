"""Engine-integrated stateful-LWW sink mode (run_streaming_stateful).

The state store resolves winners against ALL history and the lake merge
applies only changed keys — the final lake state must equal the batch
engine's, and a full re-delivery of the log must leave the lake untouched
(the state store absorbs every stale ordinal before the merge ever runs).
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from debezium_spark import CdcEngine, EngineConfig
from debezium_spark.sources import wal as W
from tests import oracle


def _want(spark, wal_dir):
    wal_pd = spark.read.parquet(wal_dir).select(
        "offset", "is_tombstone", "op", "repo", "path", "after"
    ).toPandas()
    return oracle.state_hashes(oracle.reduce_wal(wal_pd))


def _got(eng):
    return oracle.target_hashes(
        eng.target().read().select("repo", "path", "content").toPandas()
    )


def _engine(spark, root, wal_dir, spec, sub, **cfg):
    return CdcEngine(
        spark,
        EngineConfig(**cfg),
        wal_path=wal_dir,
        target_path=os.path.join(root, sub, "target"),
        work_dir=os.path.join(root, sub, "work"),
        schema_changes=W.schema_history(spark, spec),
    )


def test_stateful_join_back_matches_payload_through(spark, tmpdir_path):
    """stateful_payload_join_back=True (slim Arrow boundary + offset-pushdown
    WAL re-scan join) must land the exact same lake state as the default
    payload-through mode — including over a WAL carrying identical
    duplicate-offset re-deliveries, which the join-back path must collapse
    (each re-delivery joins the winner ordinal once; without the key-level
    dedup the merge would see multiplied rows — the r5 bug this pins)."""
    spec = W.WalSpec(n_keys=200, n_events=1100, seed=33)
    wal_dir = os.path.join(tmpdir_path, "wal_jb")
    W.write_wal(spark, spec, wal_dir, n_files=4)
    want = _want(spark, wal_dir)

    ej = _engine(
        spark, tmpdir_path, wal_dir, spec, "jb",
        stateful_payload_join_back=True,
    )
    ej.run_streaming_stateful(max_files_per_trigger=2)
    assert _got(ej) == want
    # one row per key, no join-multiplied duplicates
    t = ej.target().read(include_deleted=True)
    assert (
        t.groupBy("repo", "path").count().where("count > 1").count() == 0
    )

    ep = _engine(spark, tmpdir_path, wal_dir, spec, "pt")
    ep.run_streaming_stateful(max_files_per_trigger=2)
    assert _got(ep) == want


def test_stateful_sink_matches_batch_and_absorbs_redelivery(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=250, n_events=1400, seed=21)
    src = os.path.join(tmpdir_path, "wal_src")
    W.write_wal(spark, spec, src, n_files=5)
    wal_dir = os.path.join(tmpdir_path, "wal")
    shutil.copytree(src, wal_dir)
    want = _want(spark, src)

    es = _engine(spark, tmpdir_path, wal_dir, spec, "stateful")
    es.run_streaming_stateful(max_files_per_trigger=2)
    assert _got(es) == want

    lake = es.target()
    committed = lake.committed_batch_id
    assert committed >= 1 and lake.committed_max_offset > 0

    # engine metrics recorded per applied trigger (keys_touched > 0)
    m = es.metrics().collect()
    assert m and all(r["keys_touched"] > 0 for r in m)

    # re-deliver the ENTIRE log under fresh file names: the state store
    # absorbs every stale ordinal, the changelog stays silent, and the lake
    # commits nothing new
    for i, f in enumerate(sorted(glob.glob(f"{src}/*.parquet"))):
        shutil.copy(f, os.path.join(wal_dir, f"redeliver_{i:03d}.parquet"))
    es2 = _engine(spark, tmpdir_path, wal_dir, spec, "stateful")
    es2.run_streaming_stateful(max_files_per_trigger=2)
    assert _got(es2) == want
    assert es2.target().committed_batch_id == committed

    # batch engine over the same (un-redelivered) log converges identically
    eb = _engine(spark, tmpdir_path, src, spec, "batch")
    eb.run()
    assert _got(eb) == want


def test_stateful_sink_rejects_tx_metadata(spark, tmpdir_path):
    eng = CdcEngine(
        spark,
        EngineConfig(provide_transaction_metadata=True),
        wal_path=os.path.join(tmpdir_path, "nowal"),
        target_path=os.path.join(tmpdir_path, "t"),
        work_dir=os.path.join(tmpdir_path, "w"),
    )
    with pytest.raises(ValueError, match="transaction_metadata"):
        eng.run_streaming_stateful()
