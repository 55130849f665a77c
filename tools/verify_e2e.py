"""End-to-end verification drive through the public API (the `verify` skill's
recipe, checked in): build a deterministic WAL, replay it through CdcEngine
three ways — batch, crash/resume across engine instances, Structured
Streaming — and require sha256 state equality with the pandas reference
reducer each time.

Usage: PYTHONPATH=/root/repo python tools/verify_e2e.py
"""

import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
from debezium_spark import CdcEngine, EngineConfig
from debezium_spark.sources import wal as W
import oracle as O

d = tempfile.mkdtemp(prefix="verify_cdc_")
# VERIFY_TZ (default UTC) lets the drive run under a non-UTC driver session —
# the engine's state and hashes must be session-timezone-independent
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.sql.session.timeZone", os.environ.get("VERIFY_TZ", "UTC"))
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spec = W.WalSpec(n_keys=500, n_events=2500, seed=7)
W.write_wal(spark, spec, f"{d}/wal", n_files=6)
sch = W.schema_history(spark, spec)
want = O.state_hashes(O.reduce_wal(spark.read.parquet(f"{d}/wal").toPandas()))

def lake_sig(eng):
    return O.target_hashes(eng.target().read().select("repo","path","content").toPandas())

# 1. batch replay -> oracle match
eng = CdcEngine(spark, EngineConfig(max_offsets_per_batch=6000), wal_path=f"{d}/wal",
                target_path=f"{d}/t1", work_dir=f"{d}/w1", schema_changes=sch)
eng.run()
assert lake_sig(eng) == want, "batch replay state mismatch"
print("1. batch replay sha256 state match: OK", len(want), "keys")

# 2. crash/resume across engine instances
e1 = CdcEngine(spark, EngineConfig(max_offsets_per_batch=800), wal_path=f"{d}/wal",
               target_path=f"{d}/t2", work_dir=f"{d}/w2", schema_changes=sch)
e1.run(max_batches=1)
e2 = CdcEngine(spark, EngineConfig(max_offsets_per_batch=800), wal_path=f"{d}/wal",
               target_path=f"{d}/t2", work_dir=f"{d}/w2", schema_changes=sch)
e2.run()
assert lake_sig(e2) == want, "resume mismatch"
print("2. crash/resume: OK")

# 3. streaming mode -> same state
es = CdcEngine(spark, EngineConfig(), wal_path=f"{d}/wal",
               target_path=f"{d}/t4", work_dir=f"{d}/w4", schema_changes=sch)
es.run_streaming(max_files_per_trigger=2)
assert lake_sig(es) == want, "streaming mismatch"
print("3. streaming replay: OK")

shutil.rmtree(d, ignore_errors=True)
print("VERIFY PASS")
