"""Snapshot sources: initial consistent snapshot + incremental (DBLog) snapshot.

Reference semantics:
  * Initial snapshot (S1) — RelationalSnapshotChangeEventSource.java:82-147
    (doExecute 7 steps), 296-323 (createDataEvents), 334-402 (per-table scan):
    read one consistent version of the table, emit every row as a READ envelope,
    record the stream offset watermark taken *before* the scan. On Spark the
    "global read lock + repeatable-read TX" is simply reading one immutable
    snapshot (a parquet/Iceberg snapshot id) — consistency is free.
  * Snapshot markers (S3) — RelationalSnapshotChangeEventSource.java:404-428:
    source.snapshot = first | true | last per position in the snapshot.
  * Snapshot select override (S2) — :457-468: per-table custom predicate.
  * Incremental snapshot (S5) — the DBLog watermark algorithm,
    AbstractIncrementalSnapshotChangeEventSource.java:199-259 (chunk query),
    294-358 (readChunk), 178-187 (window dedup): chunks of the table are read
    between low/high watermark signals; any key changed by the concurrent stream
    inside the window supersedes the chunk's stale row. Spark scans chunks in
    parallel, so pagination exists only for resumable lineage; the dedup is a
    broadcast left-anti join against the streamed keys of the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from debezium_spark.functions import envelope as E


def snapshot_events(
    seed: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("repo", "path"),
    base_offset: int = 0,
    where: str | None = None,
    connector: str = "spark-cdc",
    server_name: str = "repos",
    db: str = "lake",
) -> DataFrame:
    """Wrap a consistent table scan as READ envelopes with snapshot markers.

    Offsets are dense [base_offset, base_offset+n) assigned by key order (the scan
    order of the reference's per-table SELECT); markers first/true/last follow
    RelationalSnapshotChangeEventSource.java:404-428.
    """
    if where:
        seed = seed.where(F.expr(where))  # snapshot.select.statement.overrides (S2)
    w = Window.orderBy(*key_cols)
    numbered = seed.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    marker = (
        F.when(F.col("_rn") == 1, F.lit(E.SNAPSHOT_FIRST))
        .when(F.col("_rn") == F.col("_n"), F.lit(E.SNAPSHOT_LAST))
        .otherwise(F.lit(E.SNAPSHOT_TRUE))
    )
    offset = (F.lit(base_offset) + F.col("_rn") - 1).cast("long")
    src = E.source_block(
        connector=connector,
        name=server_name,
        db=db,
        ts_ms=F.lit(0).cast("long"),
        snapshot=marker,
        sequence=offset.cast("string"),
    )
    payload_cols = list(seed.columns)
    return _read_with_marker(numbered, payload_cols, key_cols, offset, src)


def _read_with_marker(numbered, payload_cols, key_cols, offset, src):
    after = F.struct(*[F.col(c) for c in payload_cols])
    null_payload = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:string" for c in payload_cols) + ">"
    )
    value = F.struct(
        null_payload.alias("before"),
        after.alias("after"),
        F.lit(E.OP_READ).alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
        src.alias("source"),
        F.lit(None)
        .cast("struct<id:string,total_order:bigint,data_collection_order:bigint>")
        .alias("transaction"),
    )
    return numbered.select(
        F.struct(*[F.col(c) for c in key_cols]).alias("key"),
        value.alias("value"),
        offset.alias("offset"),
    )


def incremental_snapshot(
    chunk_source: DataFrame,
    stream_window: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("repo", "path"),
    chunk_size: int = 1024,
) -> tuple[DataFrame, DataFrame]:
    """DBLog-style ad-hoc snapshot with window dedup.

    ``chunk_source``: the table re-read (one consistent scan).
    ``stream_window``: WAL events that arrived between the low and high watermarks
    (flat rows with key columns).

    Returns (snapshot_rows, chunk_lineage):
      * snapshot_rows — chunk rows whose key was NOT touched by the stream inside
        the window (the touched ones are superseded by the stream — the buffered-
        chunk dedup of AbstractIncrementalSnapshotChangeEventSource.java:178-187);
      * chunk_lineage — (chunk_id, n_rows, max key) for resumable chunk positions
        (:294-358's offset-embedded chunk progress).

    The stream side of the anti-join is small (one watermark window) — broadcast.
    """
    touched = stream_window.select(*key_cols).distinct()
    deduped = chunk_source.join(F.broadcast(touched), on=list(key_cols), how="left_anti")

    w = Window.orderBy(*key_cols)
    chunked = deduped.withColumn(
        "_chunk", ((F.row_number().over(w) - 1) / chunk_size).cast("long")
    )
    lineage = chunked.groupBy("_chunk").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(F.struct(*[F.col(c) for c in key_cols])).alias("max_key"),
    )
    return chunked.drop("_chunk"), lineage
