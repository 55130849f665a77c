"""CdcEngine — the embedded-engine analogue (EmbeddedEngine.run(), SURVEY.md §3.2).

Pipeline per micro-batch (offset-range slice of the WAL):

    read WAL slice -> op/table/malformed filters -> envelope wrap
      -> PK-change split -> SMT column transforms -> LWW resolve (packed-string
      max(), hash-partial; duplicate offsets collapse here, so no separate dedup)
      -> schema DDL (if the batch crosses a schema-change offset)
      -> offset-guarded copy-on-write MERGE into the lake table
      -> lineage checkpoint (_checkpoints) + metrics (_metrics)

Exactly-once = atomic manifest commit (batch_id recorded in the same commit as the
data) + per-row offset guard for replay overlap; the Debezium analogues are the
offset flush after batch ack (EmbeddedEngine.java:923-1017 maybeFlush) and the
restart LSN skip (PostgresStreamingChangeEventSource.java:318).

Resume = read ``committed_max_offset`` from the lake manifest (the transactional
source of truth), replay schema history up to it (AbstractDatabaseHistory.recover
analogue), continue from the next offset. Lineage rows in ``_checkpoints`` are
observability, not the recovery source — they can trail the manifest after a crash
and the engine still recovers exactly.

Two drive modes sharing the same batch function:
  * run(): deterministic offset-range batch replay (Trigger.AvailableNow analogue,
    what the bench measures);
  * run_streaming(): Structured Streaming file source over the WAL directory with
    foreachBatch + checkpointLocation (the production shape).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark.config import (
    SNAPSHOT_INITIAL_ONLY,
    SNAPSHOT_NEVER,
    SNAPSHOT_SCHEMA_ONLY,
    EngineConfig,
)
from debezium_spark.functions import envelope as E
from debezium_spark.functions import transforms as X
from debezium_spark.operators import resolver as R
from debezium_spark.plans.lake import LakeTable
from debezium_spark.plans.registry import SchemaHistoryStore, SchemaRegistry


class CdcEngine:
    def __init__(
        self,
        spark: SparkSession,
        config: EngineConfig,
        *,
        wal_path: str,
        target_path: str,
        work_dir: str,
        schema_changes: DataFrame | None = None,
    ):
        self.spark = spark
        self.config = config
        self.wal_path = wal_path
        self.target_path = target_path
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.history = SchemaHistoryStore(os.path.join(work_dir, "_schema_history.jsonl"))
        self._ckpt_path = os.path.join(work_dir, "_checkpoints.jsonl")
        self._metrics_path = os.path.join(work_dir, "_metrics.jsonl")
        self._schema_changes_df = schema_changes
        self._registry: SchemaRegistry | None = None
        self._truncate_offsets: list[int] | None = None
        self._signal_state_path = os.path.join(work_dir, "_signals_consumed")

    # ------------------------------------------------------------------ setup
    def _wal(self) -> DataFrame:
        return self.spark.read.parquet(self.wal_path)

    def _base_payload_schema(self, wal: DataFrame) -> T.StructType:
        """v1 payload schema = WAL payload minus columns introduced by later DDL."""
        full = wal.schema["after"].dataType
        added = set()
        for c in self.registry().changes:
            kind, *args = c.table_changes.split(":")
            if kind == "add_column":
                added.add(args[0])
        return T.StructType([f for f in full.fields if f.name not in added])

    def registry(self) -> SchemaRegistry:
        if self._registry is None:
            base = E.payload_schema()
            if self._schema_changes_df is not None:
                rows = [r.asDict() for r in self._schema_changes_df.collect()]
            else:
                rows = [
                    {"offset": c.offset, "version": c.version, "ddl": c.ddl,
                     "table_changes": c.table_changes}
                    for c in self.history.replay()
                ]
            self._registry = SchemaRegistry.from_history_rows(base, rows)
        return self._registry

    def target(self) -> LakeTable:
        if not LakeTable.exists(self.target_path):
            wal = self._wal()
            base = self._base_payload_schema(wal)
            LakeTable.create(
                self.spark,
                self.target_path,
                base,
                key_cols=self.config.key_columns,
                n_buckets=self.config.target_buckets,
            )
        return LakeTable(self.spark, self.target_path)

    # ------------------------------------------------------------- control ops
    def _truncates_in(self, lo: int, hi: int) -> int | None:
        """Max TRUNCATE offset in (lo, hi], or None. The WAL is scanned for 't'
        rows once per engine (column-pruned offset scan), not once per batch."""
        if not self.config.handle_truncate:
            return None
        if self._truncate_offsets is None:
            try:
                rows = (
                    self._wal().where(F.col("op") == "t").select("offset").collect()
                )
                self._truncate_offsets = sorted(int(r["offset"]) for r in rows)
            except Exception:
                self._truncate_offsets = []
        hits = [o for o in self._truncate_offsets if lo < o <= hi]
        return max(hits) if hits else None

    def _poll_signals(self) -> dict[str, Any]:
        """Signal table poll at the batch boundary (pipeline/signal/Signal.java:
        in-band control rows). Supported: {"type": "log", "message": ...} appended
        to _metrics; {"type": "pause"} stops the replay loop before the next batch
        (resume = call run() again; consumed signals never re-fire — the consumed
        count is durable in the work dir)."""
        cfg = self.config
        out: dict[str, Any] = {"pause": False}
        if not cfg.signal_path or not os.path.exists(cfg.signal_path):
            return out
        consumed = 0
        if os.path.exists(self._signal_state_path):
            with open(self._signal_state_path) as f:
                consumed = int(f.read().strip() or 0)
        with open(cfg.signal_path) as f:
            lines = [x for x in f if x.strip()]
        for line in lines[consumed:]:
            sig = json.loads(line)
            if sig.get("type") == "log":
                self._append_jsonl(
                    self._metrics_path,
                    [{"signal": "log", "message": sig.get("message", "")}],
                )
            elif sig.get("type") == "pause":
                out["pause"] = True
        with open(self._signal_state_path, "w") as f:
            f.write(str(len(lines)))
        return out

    # ------------------------------------------------------------- transforms
    def _transform(self, slice_df: DataFrame) -> DataFrame:
        """WAL slice -> resolved actions (one per key)."""
        cfg = self.config
        df = slice_df
        if cfg.snapshot_mode in (SNAPSHOT_NEVER, SNAPSHOT_SCHEMA_ONLY):
            df = df.where(F.col("op") != E.OP_READ)  # stream-only start (S4)
        elif cfg.snapshot_mode == SNAPSHOT_INITIAL_ONLY:
            df = df.where(F.col("op") == E.OP_READ)
        if cfg.handle_truncate:
            df = df.where(F.col("op") != "t")  # control event, applied in merge
        # Malformed events (unresolvable key) flow through the resolver under
        # their null key and surface as action rows with a null key column —
        # detected for free in the lineage aggregation (no dedicated scan job)
        # and excluded from the merge; see _apply_batch for the P18 modes.
        # No dropDuplicates here: duplicate offsets are identical re-deliveries and
        # the per-key max_by((offset,seq)) reduce is invariant to them, so the LWW
        # phase subsumes dedup-by-offset (S8) without its full-width shuffle.
        # dedup_by_offset stays available for consumers of raw envelope streams.
        env = E.wrap_wal(
            df,
            key_cols=cfg.key_columns,
            connector=cfg.connector,
            server_name=cfg.server_name,
            db=cfg.database,
            version=cfg.version,
        )
        env = X.op_skip_filter(env, cfg.skipped_operations)
        env = R.split_pk_changes(env, cfg.key_columns)
        for col, mask in cfg.mask_columns.items():
            env = X.mask_column(env, col, mask)
        for col, salt in cfg.hash_mask_columns.items():
            env = X.hash_mask_column(env, col, salt)
        for col, n in cfg.truncate_columns.items():
            env = X.truncate_column(env, col, n)
        if cfg.column_include or cfg.column_exclude:
            env = X.project_columns(
                env, cfg.column_include, cfg.column_exclude, cfg.key_columns
            )
        return R.resolve_lww(
            env, key_cols=cfg.key_columns, salt_buckets=cfg.lww_salt_buckets
        )

    # ------------------------------------------------------------- batch apply
    def _apply_batch(
        self, lake: LakeTable, slice_df: DataFrame, *, batch_id: int, lo: int, hi: int
    ) -> dict[str, Any]:
        t0 = time.time()
        cfg = self.config
        truncate_below = self._truncates_in(lo, hi)
        reg = self.registry()
        for change in reg.pending_between(lo, hi):
            reg.apply_to_lake(lake, change)      # Iceberg-DDL analogue, idempotent
            if change.table_changes != "create":
                # The base CREATE is implicit in the registry's base schema;
                # durable history (B5) records only lake-mutating deltas.
                self.history.record(change)
        # The resolved actions feed three consumers (lineage aggregation, the
        # merge's touched-bucket probe, and the merge join itself); persist so the
        # WAL-scan -> dedup -> envelope -> LWW pipeline runs once, not three times.
        actions = self._transform(slice_df).persist()
        nb = lake.n_buckets
        from debezium_spark.plans.lake import bucket_expr

        # Per-partition lineage + batch metrics + malformed detection in ONE
        # aggregation pass (a dedicated malformed-scan job per batch costs more
        # driver-serial time than the whole check is worth).
        key_null = F.lit(False)
        for c in cfg.key_columns:
            key_null = key_null | F.col(c).isNull()
        lineage_all = (
            actions.withColumn(
                "_bucket",
                F.when(~key_null, bucket_expr(F.col(cfg.key_columns[0]), nb)),
            )
            .groupBy("_bucket")
            .agg(
                F.max("_offset").alias("max_offset"),
                F.sum(F.when(F.col("action") == R.ACTION_UPSERT, 1).otherwise(0)).alias(
                    "rows_applied"
                ),
                F.sum(F.when(F.col("action") == R.ACTION_DELETE, 1).otherwise(0)).alias(
                    "rows_deleted"
                ),
            )
            .collect()
        )
        # _bucket NULL row = resolved actions whose key had a null column (P18,
        # EventDispatcher.java:244-258). Count is per distinct malformed key.
        lineage_rows = [r for r in lineage_all if r["_bucket"] is not None]
        n_bad = sum(
            r["rows_applied"] + r["rows_deleted"]
            for r in lineage_all
            if r["_bucket"] is None
        )
        if n_bad:
            if cfg.failure_handling == "fail":
                actions.unpersist()
                raise ValueError(
                    f"batch {batch_id}: {n_bad} malformed key(s) (null key column); "
                    "set failure_handling='warn'|'skip' to quarantine/drop"
                )
            if cfg.failure_handling == "warn":
                invalid_src = F.lit(False)
                for c in cfg.key_columns:
                    invalid_src = invalid_src | F.col(c).isNull()
                (
                    slice_df.where((F.col("op") != "t") & invalid_src)
                    .write.mode("append")
                    .parquet(os.path.join(self.work_dir, "_dlq"))
                )
            self._append_jsonl(
                self._metrics_path,
                [{"batch_id": batch_id, "malformed_skipped": int(n_bad)}],
            )
            actions_valid = actions.where(~key_null)
        else:
            actions_valid = actions
        stats = {
            "rows_applied": int(sum(r["rows_applied"] for r in lineage_rows)),
            "rows_deleted": int(sum(r["rows_deleted"] for r in lineage_rows)),
        }
        try:
            res = lake.merge(
                actions_valid, batch_id=batch_id, max_offset=hi, stats=stats,
                touched_buckets=[int(r["_bucket"]) for r in lineage_rows],
                truncate_below=truncate_below,
            )
        finally:
            actions.unpersist()
        wall_ms = int((time.time() - t0) * 1000)
        if res.get("applied"):
            self._append_jsonl(
                self._ckpt_path,
                [
                    {
                        "batch_id": batch_id,
                        "partition_id": int(r["_bucket"]),
                        "max_offset": int(r["max_offset"]),
                        "rows_applied": int(r["rows_applied"]),
                        "rows_deleted": int(r["rows_deleted"]),
                        "wall_ms": wall_ms,
                    }
                    for r in lineage_rows
                ],
            )
            self._append_jsonl(
                self._metrics_path,
                [
                    {
                        "batch_id": batch_id,
                        "lo": lo,
                        "hi": hi,
                        "keys_touched": stats["rows_applied"] + stats["rows_deleted"],
                        "rows_applied": stats["rows_applied"],
                        "rows_deleted": stats["rows_deleted"],
                        "wall_ms": wall_ms,
                    }
                ],
            )
        return {**res, **stats, "wall_ms": wall_ms}

    @staticmethod
    def _append_jsonl(path: str, rows: list[dict]) -> None:
        with open(path, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    # -------------------------------------------------------------- run modes
    def run(self, *, max_batches: int | None = None) -> list[dict[str, Any]]:
        """Deterministic offset-range batch replay until the WAL is exhausted.

        Resumable: picks up after the lake manifest's committed_max_offset. Batch
        slicing is by offset range, so parquet min/max stats prune unread segments
        (predicate pushdown on `offset`).
        """
        lake = self.target()
        wal = self._wal()
        bounds = wal.agg(
            F.min("offset").alias("lo"), F.max("offset").alias("hi")
        ).collect()[0]
        if bounds["hi"] is None:
            return []
        results = []
        step = self.config.max_offsets_per_batch
        lo = lake.committed_max_offset
        batch_id = lake.committed_batch_id + 1
        n = 0
        while lo < bounds["hi"]:
            if self._poll_signals()["pause"]:
                break  # P17 pause signal; resume = call run() again
            hi = lo + step
            slice_df = wal.where((F.col("offset") > lo) & (F.col("offset") <= hi))
            results.append(
                self._apply_batch(lake, slice_df, batch_id=batch_id, lo=lo, hi=hi)
            )
            lo, batch_id, n = hi, batch_id + 1, n + 1
            if max_batches is not None and n >= max_batches:
                break
        return results

    def run_streaming(self, *, max_files_per_trigger: int | None = None) -> None:
        """Structured Streaming drive: file-source over the WAL directory,
        foreachBatch -> same batch function, availableNow trigger, Spark checkpoint
        for source progress (offset store B3 analogue). WAL segments are written in
        offset order (sources/wal.write_wal), matching binlog segment ordering.
        """
        lake = self.target()
        wal_schema = self._wal().schema
        reader = self.spark.readStream.schema(wal_schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(self.wal_path)

        def handle(df: DataFrame, epoch_id: int) -> None:
            # No offset pre-filter: the file source may deliver segments in any
            # order, and restart may replay the last epoch. Both are safe — the
            # per-row offset guard + retained delete tombstones make merge
            # idempotent and order-tolerant (plans/lake.py module docstring).
            if self._poll_signals()["pause"]:
                raise _PauseSignal()  # surfaces as query stop; resume = restart
            rng = df.agg(
                F.min("offset").alias("lo"), F.max("offset").alias("hi")
            ).collect()[0]
            if rng["hi"] is None:
                return
            self._apply_batch(
                lake, df, batch_id=lake.committed_batch_id + 1,
                lo=int(rng["lo"]) - 1, hi=int(rng["hi"]),
            )

        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", os.path.join(self.work_dir, "stream_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except Exception as e:  # pause is a clean stop, not a failure
            if "_PauseSignal" not in str(e):
                raise

    # ------------------------------------------------------------- inspection
    def checkpoints(self) -> DataFrame:
        schema = (
            "batch_id bigint, partition_id int, max_offset bigint, "
            "rows_applied bigint, rows_deleted bigint, wall_ms bigint"
        )
        rows = []
        if os.path.exists(self._ckpt_path):
            with open(self._ckpt_path) as f:
                rows = [json.loads(x) for x in f if x.strip()]
        return self.spark.createDataFrame(rows, schema)

    def metrics(self) -> DataFrame:
        schema = (
            "batch_id bigint, lo bigint, hi bigint, keys_touched bigint, "
            "rows_applied bigint, rows_deleted bigint, wall_ms bigint, "
            "malformed_skipped bigint, signal string, message string"
        )
        keys = [f.strip().split(" ")[0] for f in schema.split(",")]
        rows = []
        if os.path.exists(self._metrics_path):
            with open(self._metrics_path) as f:
                rows = [
                    {k: json.loads(x).get(k) for k in keys} for x in f if x.strip()
                ]
        return self.spark.createDataFrame(rows, schema)


class _PauseSignal(Exception):
    """In-band pause signal received; the streaming query stops cleanly before
    the paused epoch commits, so a restart resumes exactly there."""
