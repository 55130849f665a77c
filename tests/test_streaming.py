"""Structured Streaming drive (run_streaming): state parity with the batch
path and order-tolerance to file-source delivery order.

Spark's file stream source does NOT guarantee binlog-segment order (it lists
by modification time, and restarts can replay the last epoch). The engine's
answer is the per-row offset guard + retained delete tombstones
(plans/lake.py); these tests pin that behavior — the out-of-order case is the
regression test for the file-batch resurrection bug the e2e drive caught.
"""

from __future__ import annotations

import os
import shutil

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


def _engine(spark, root, wal_dir, spec, sub):
    return CdcEngine(
        spark,
        EngineConfig(),
        wal_path=wal_dir,
        target_path=os.path.join(root, sub, "target"),
        work_dir=os.path.join(root, sub, "work"),
        schema_changes=W.schema_history(spark, spec),
    )


def test_streaming_matches_oracle_and_batch(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=300, n_events=1500, seed=11)
    wal_dir = os.path.join(tmpdir_path, "wal")
    W.write_wal(spark, spec, wal_dir, n_files=6)
    want = _want(spark, wal_dir)

    es = _engine(spark, tmpdir_path, wal_dir, spec, "stream")
    es.run_streaming(max_files_per_trigger=2)
    assert _got(es) == want

    # a second availableNow pass over the same checkpoint sees no new files
    # and must not change state
    es2 = _engine(spark, tmpdir_path, wal_dir, spec, "stream")
    es2.run_streaming(max_files_per_trigger=2)
    assert _got(es2) == want

    eb = _engine(spark, tmpdir_path, wal_dir, spec, "batch")
    eb.run()
    assert _got(eb) == want


def test_streaming_out_of_order_segments(spark, tmpdir_path):
    """Segments delivered newest-offsets-FIRST (reversed mtimes) must converge
    to the same state: cross-batch ordering is never assumed."""
    spec = W.WalSpec(n_keys=200, n_events=1200, seed=12)
    src = os.path.join(tmpdir_path, "wal_src")
    W.write_wal(spark, spec, src, n_files=5)

    dst = os.path.join(tmpdir_path, "wal_rev")
    os.makedirs(dst)
    parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    assert len(parts) >= 3
    t0 = 1_700_000_000
    for i, f in enumerate(parts):  # lexicographically-first file gets the
        shutil.copy2(os.path.join(src, f), os.path.join(dst, f))
        # NEWEST mtime -> the file source (mtime ascending) delivers the
        # high-offset tail segments before the snapshot head
        os.utime(os.path.join(dst, f), (t0 - i * 60, t0 - i * 60))

    want = _want(spark, src)
    eng = _engine(spark, tmpdir_path, dst, spec, "rev")
    eng.run_streaming(max_files_per_trigger=1)
    assert _got(eng) == want


def test_streaming_picks_up_appended_segment(spark, tmpdir_path):
    """Binlog tailing: a segment appended after the first availableNow pass is
    applied by the next pass (checkpointed source progress, B3 analogue)."""
    spec = W.WalSpec(n_keys=150, n_events=900, seed=13)
    staging = os.path.join(tmpdir_path, "staging")
    W.write_wal(spark, spec, staging, n_files=3)
    parts = sorted(f for f in os.listdir(staging) if f.endswith(".parquet"))

    live = os.path.join(tmpdir_path, "wal_live")
    os.makedirs(live)
    for f in parts[:-1]:
        shutil.copy2(os.path.join(staging, f), os.path.join(live, f))

    eng = _engine(spark, tmpdir_path, live, spec, "tail")
    eng.run_streaming()
    shutil.copy2(os.path.join(staging, parts[-1]), os.path.join(live, parts[-1]))
    eng2 = _engine(spark, tmpdir_path, live, spec, "tail")
    eng2.run_streaming()
    assert _got(eng2) == _want(spark, staging)
