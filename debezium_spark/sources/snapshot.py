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


def ranged_row_number(
    df: DataFrame,
    key_cols: tuple[str, ...],
    *,
    num_partitions: int | None = None,
    rn_col: str = "_rn",
) -> tuple[DataFrame, int]:
    """Scale-safe global row numbering in key order.

    A plain ``Window.orderBy(key)`` funnels the whole table through ONE task
    (Exchange SinglePartition) — correct at sf0.1, a wall at 100 TB. Instead:

      1. range-partition on the keys (parallel shuffle; partition i holds keys
         strictly below partition i+1),
      2. number rows *within* each partition with an ordinary window,
      3. add the cumulative row count of the preceding partitions — a
         per-partition count that is collected to the driver (n_partitions rows,
         negligible at any scale) and folded back in as a literal map.

    The ranged frame is persisted so the count pass and the numbering pass see
    the same (sampled) range boundaries. DISK_ONLY: the intermediate is an
    already-shuffled full-width dataset read exactly twice — at 100 TB a
    MEMORY_AND_DISK cache would evict the executors' working memory for data
    that a sequential disk re-read serves just as well.

    Returns (df + rn_col [1-based], total_row_count).

    Mirrors the scan-position semantics of the reference's snapshot reader
    (RelationalSnapshotChangeEventSource.java:404-428) without its single-cursor
    bottleneck.
    """
    from pyspark import StorageLevel

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n, *[F.col(c) for c in key_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.DISK_ONLY)
    )
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    offsets: dict[int, int] = {}
    total = 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = total
        total += r["n"]
    if offsets:
        base = F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("_pid"),
        )
    else:
        base = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*key_cols)
    out = ranged.withColumn(
        rn_col, (F.row_number().over(w) + F.coalesce(base, F.lit(0))).cast("long")
    ).drop("_pid")
    # expose the persisted intermediate so long-lived callers (e.g. the
    # engine's per-batch incremental-snapshot chunking) can unpersist it
    out._ranged_persisted = ranged
    return out, total


def chunk_bounds_frame(
    df: DataFrame,
    key_cols: tuple[str, ...],
    *,
    chunk_size: int = 1024,
) -> tuple[DataFrame, int, DataFrame]:
    """Distributed form of :func:`chunk_bounds`: the boundary keys as a
    DataFrame ``(_chunk long, <key cols...>)`` that is never collected — the
    caller lands it wherever it wants (the engine writes a parquet sidecar
    when the chunk count would not fit driver memory; ~10^8 chunks at 10^11
    rows / 1024-row chunks is a 10 GB bounds list, not a driver object).

    Returns ``(bounds_frame, total_rows, persisted_intermediate)``; the caller
    must ``persisted_intermediate.unpersist()`` after materializing the frame.
    """
    numbered, total = ranged_row_number(df.select(*key_cols), key_cols)
    bf = numbered.where(
        (F.col("_rn") % chunk_size == 0) | (F.col("_rn") == F.lit(total))
    ).select(
        ((F.col("_rn") - 1) / chunk_size).cast("long").alias("_chunk"),
        *key_cols,
    )
    return bf, total, numbered._ranged_persisted


def chunk_bounds(
    df: DataFrame,
    key_cols: tuple[str, ...],
    *,
    chunk_size: int = 1024,
) -> tuple[list[dict], int]:
    """Per-chunk inclusive upper key bounds for keyset-paginated chunk reads (S5).

    ONE key-only scan (the parquet reader prunes every payload column) numbers
    the table in key order and keeps just the boundary keys — the key at row
    ``(c+1) * chunk_size`` for each chunk c. A later chunk read is then
    ``WHERE key > prev_hi AND key <= hi``: O(chunk) work with the leading key
    column's range pushed down to the scan, instead of re-numbering the full
    table on every micro-batch. This mirrors the reference's keyset pagination
    (AbstractIncrementalSnapshotChangeEventSource.java:199-259: chunk query =
    ``WHERE pk > last_chunk_end ORDER BY pk LIMIT chunk_size``), parallelized:
    the bounds are computed once up front so chunks need no serial cursor.

    Returns ``(bounds, total_rows)`` with ``bounds[c] = {"chunk": c, "hi":
    [key values...], "n_rows": nominal_count}``. The driver holds one entry
    per chunk — at 10^9+ rows size ``chunk_size`` so the chunk count stays
    bounded (e.g. >= 100k rows/chunk), or land the bounds in a parquet
    sidecar instead of driver memory.

    Rows whose full key equals a boundary key all belong to the EARLIER chunk
    (membership is by key range, not row number), so coverage is exact — no
    gap, no overlap — even if the key is not unique; ``n_rows`` is nominal in
    that degenerate case and per-chunk lineage reports actual counts.
    """
    bf, total, persisted = chunk_bounds_frame(df, key_cols, chunk_size=chunk_size)
    try:
        if total == 0:
            return [], 0
        rows = bf.collect()
    finally:
        persisted.unpersist()
    n_chunks = (total + chunk_size - 1) // chunk_size
    by_chunk = {int(r["_chunk"]): [r[c] for c in key_cols] for r in rows}
    bounds = []
    for c in range(n_chunks):
        n = chunk_size if c < n_chunks - 1 else total - (n_chunks - 1) * chunk_size
        bounds.append({"chunk": c, "hi": by_chunk[c], "n_rows": n})
    return bounds, total


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
    numbered, total = ranged_row_number(seed, key_cols)
    marker = (
        F.when(F.col("_rn") == 1, F.lit(E.SNAPSHOT_FIRST))
        .when(F.col("_rn") == total, F.lit(E.SNAPSHOT_LAST))
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

    numbered, _ = ranged_row_number(deduped, key_cols)
    chunked = numbered.withColumn(
        "_chunk", ((F.col("_rn") - 1) / chunk_size).cast("long")
    ).drop("_rn")
    lineage = chunked.groupBy("_chunk").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(F.struct(*[F.col(c) for c in key_cols])).alias("max_key"),
    )
    return chunked.drop("_chunk"), lineage
