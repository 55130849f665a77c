"""Experiment: single-shuffle initial-load replay variant.

Current fast path: slim scan -> win agg -> broadcast; full scan -> semi join ->
groupBy(key) max_by [payload shuffle #1] -> persist (columnar cache) ->
lineage agg -> merge projection -> repartition(_bucket) [payload shuffle #2]
-> write.

Variant B: slim scan -> win agg -> broadcast; full scan -> semi join ->
withColumn(_bucket) -> repartition(N, _bucket) [payload shuffle, the ONLY one]
-> groupBy(_bucket, key) max_by  [no exchange: hash(_bucket) satisfies
ClusteredDistribution(_bucket, key)] -> project -> write partitionBy(_bucket)
-> lineage from a narrow re-read of the staging files.

Usage: taskset -c 0-7 python tools/exp_fastpath.py 8 3 [n_buckets]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SF = sys.argv[2] if len(sys.argv) > 2 else "3"
NB = int(sys.argv[3]) if len(sys.argv) > 3 else 128
os.environ.setdefault("BENCH_SHUFFLE_PARTITIONS", "64")
os.environ.setdefault("BENCH_DRIVER_MEM", "24g")

import bench  # noqa: E402


def main():
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from debezium_spark.functions import envelope as E
    from debezium_spark.operators import resolver as R
    from debezium_spark.plans.lake import bucket_expr

    spark = bench.build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    n_keys, n_events = bench.WAL_SCALE[SF]
    wal_dir = bench.ensure_wal(spark, SF)
    spark.read.parquet(wal_dir).count()
    work = tempfile.mkdtemp(prefix="dbzexp-", dir=bench.BENCH_ROOT)

    t0 = time.time()
    wal = spark.read.parquet(wal_dir)
    env = E.wrap_wal(wal)
    env = R.split_pk_changes(env)

    key_cols = ("repo", "path")
    seq = F.col("seq").cast("long")
    val0 = F.col("value")
    is_del0 = val0.isNull() | (val0.getField("op") == "d")
    slim = F.struct(
        F.when(~is_del0, val0.getField("after")).alias("after"),
        is_del0.alias("is_delete"),
        F.when(val0.isNotNull(), val0.getField("ts_ms")).alias("ts_ms"),
        F.col("offset").cast("long").alias("offset"),
    )
    ordinal = (F.col("offset").cast("long") * 128 + seq).alias("_ord")
    key_refs = [F.col("key").getField(c).alias(c) for c in key_cols]

    win = (
        env.select(*key_refs, ordinal)
        .groupBy(*key_cols)
        .agg(F.max("_ord").alias("_ord"))
    )
    ev = env.select(*key_refs, slim.alias("_slim"), ordinal)
    cand = ev.join(F.broadcast(win.select("_ord")), on="_ord", how="left_semi")
    key_null = F.col("repo").isNull() | F.col("path").isNull()
    cand = cand.withColumn(
        "_bucket", F.when(~key_null, bucket_expr(F.col("repo"), NB))
    )
    agg = (
        cand.repartition(NB, "_bucket")
        .groupBy("_bucket", *key_cols)
        .agg(F.max_by("_slim", "_ord").alias("_w"))
    )
    w = F.col("_w")
    payload_fields = ["commit", "lang", "content", "size_bytes"]
    result = agg.select(
        *key_cols,
        *[w.getField("after").getField(c).alias(c) for c in payload_fields],
        w.getField("offset").alias("_offset"),
        w.getField("ts_ms").alias("_ts_ms"),
        w.getField("is_delete").alias("_deleted"),
        F.col("_bucket"),
    )
    staging = os.path.join(work, "staging")
    result.write.partitionBy("_bucket").mode("overwrite").parquet(staging)
    t_write = time.time() - t0
    print(f"pipeline+write: {t_write:.2f}s", flush=True)

    # check the plan really has a single payload exchange
    result.explain("formatted")

    t1 = time.time()
    st = spark.read.parquet(staging)
    lineage = (
        st.groupBy("_bucket")
        .agg(
            F.max("_offset").alias("max_offset"),
            F.sum(F.when(~F.col("_deleted"), 1).otherwise(0)).alias("rows_applied"),
            F.sum(F.when(F.col("_deleted"), 1).otherwise(0)).alias("rows_deleted"),
        )
        .collect()
    )
    t_lineage = time.time() - t1
    total = time.time() - t0
    n_rows = sum(r["rows_applied"] + r["rows_deleted"] for r in lineage)
    print(f"lineage: {t_lineage:.2f}s over {len(lineage)} buckets, {n_rows:,} rows")
    print(f"TOTAL {total:.2f}s -> {75_598_174 / total:,.0f} events/s (cpus={CPUS})")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
