"""Deterministic synthetic WAL (binlog analogue) over a source-code-repo table.

The captured "database" is a table of source-code repositories
(repo, path, commit, lang, content) keyed by (repo, path) — BASELINE.json input_hint.
This module synthesizes, in pure Spark column algebra (spark.range + hash chains,
zero Python in the row path, any scale):

  * the seed table (initial consistent state), and
  * a change log with strictly-increasing ``offset`` (the LSN analogue —
    MySqlOffsetContext.java:27-30 / PostgresOffsetContext.java:35-36 reduced to one
    monotonic long), with the event mix from FIXTURES.md §2: creates, updates,
    deletes + tombstones (EventDispatcher.java:408-420), primary-key-changing updates
    (RelationalChangeRecordEmitter.java:160-174), duplicate offsets (~1%, to exercise
    dedup-by-offset per PostgresStreamingChangeEventSource.java:318), hot-repo skew,
    and mid-stream schema changes (SchemaChangeEvent.java:139-143).

Determinism: every column is a pure function of (seed, row id), so the same
parameters reproduce byte-identical data at any scale — no stored fixtures needed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LANGS = ["py", "java", "go", "rs", "js", "md"]
EXTS = {"py": "py", "java": "java", "go": "go", "rs": "rs", "js": "js", "md": "md"}

# Offsets: snapshot READ events occupy [0, n_keys); streamed events start at
# STREAM_BASE(n_keys) on a stride-8 grid so each delete's tombstone fits at +1.
_STRIDE = 8


def stream_base(n_keys: int) -> int:
    return n_keys + _STRIDE


@dataclass
class WalSpec:
    """Parameters of a deterministic WAL. Same spec => identical data."""

    n_keys: int = 5_000
    n_events: int = 20_000
    seed: int = 42
    hot_key_frac: float = 0.01   # fraction of keys that are "hot"
    hot_event_frac: float = 0.50  # fraction of events hitting hot keys
    dup_frac: float = 0.01        # duplicated-offset events (dedup test)
    # event-op mix (FIXTURES.md §2): percent thresholds over a 0-99 hash draw
    pct_create: int = 35
    pct_update: int = 40
    pct_delete: int = 15          # each delete followed by a tombstone row
    pct_pk_change: int = 5        # update that changes `path` (split to d+c by engine)
    # remaining percent = plain updates
    schema_changes: bool = True   # v2 add size_bytes:int @40%, v3 widen to bigint @70%

    @property
    def n_hot(self) -> int:
        return max(1, int(self.n_keys * self.hot_key_frac))

    def schema_change_offsets(self) -> dict[int, int]:
        """{version: first offset at which that schema version is in force}."""
        if not self.schema_changes:
            return {1: 0}
        base = stream_base(self.n_keys)
        span = self.n_events * _STRIDE
        return {
            1: 0,
            2: base + int(span * 0.40),
            3: base + int(span * 0.70),
        }


def _h(col, seed: int, salt: int):
    """Deterministic 64-bit hash chain element."""
    return F.xxhash64(col, F.lit(seed), F.lit(salt))


def _key_cols(k, spec: WalSpec, *, version):
    """repo/path/commit/lang/content for key-id `k` at content-version `version`.

    repo: ~n_keys/64 repos, FIXTURES-style names; path/lang derived from key hash;
    content fully determined by (repo, path, version) so sha256 equality is checkable
    at any scale without stored data.
    """
    n_repos = max(8, spec.n_keys // 64)
    repo_id = F.pmod(k, F.lit(n_repos))
    repo = F.concat(
        F.lit("org"), F.pmod(repo_id, F.lit(40)).cast("string"),
        F.lit("/repo"), repo_id.cast("string"),
    )
    kh = _h(k, spec.seed, 1)
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(kh, F.lit(6)) + 1).cast("int"))
    path = F.concat(
        F.lit("src/d"), F.pmod(_h(k, spec.seed, 2), F.lit(97)).cast("string"),
        F.lit("/f"), k.cast("string"), F.lit("."), lang,
    )
    ver = version.cast("string")
    ident = F.concat_ws(":", repo, path, ver, F.lit(str(spec.seed)))
    digest = F.sha2(ident, 256)
    # variable-length deterministic body (64..~576 chars)
    body_len = (F.pmod(_h(k + version, spec.seed, 3), F.lit(512)) + 64).cast("int")
    content = F.concat(ident, F.lit("|"), F.substring(F.repeat(digest, 10), F.lit(1), body_len))
    commit = F.substring(F.sha2(F.concat_ws(":", F.lit(str(spec.seed)), repo, path, ver), 256), 1, 40)
    return repo, path, commit, lang, content


def payload_struct(k, spec: WalSpec, *, version, size_bytes=None) -> F.Column:
    repo, path, commit, lang, content = _key_cols(k, spec, version=version)
    sb = size_bytes if size_bytes is not None else F.lit(None).cast("long")
    return F.struct(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        sb.cast("long").alias("size_bytes"),
    )


def seed_table(spark: SparkSession, spec: WalSpec) -> DataFrame:
    """Initial consistent state of the captured table (version 0 contents)."""
    df = spark.range(spec.n_keys).withColumnRenamed("id", "k")
    k = F.col("k")
    repo, path, commit, lang, content = _key_cols(k, spec, version=F.lit(0))
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def _event_key(i, spec: WalSpec):
    """Hot-skewed key id for event i (deterministic)."""
    h1 = _h(i, spec.seed, 10)
    h2 = _h(i, spec.seed, 11)
    n_hot = spec.n_hot
    hot_cut = int(spec.hot_event_frac * 1000)
    is_hot = F.pmod(h1, F.lit(1000)) < hot_cut
    cold_span = max(1, spec.n_keys - n_hot)
    return F.when(is_hot, F.pmod(h2, F.lit(n_hot))).otherwise(
        F.lit(n_hot) + F.pmod(h2, F.lit(cold_span))
    )


def wal_events(
    spark: SparkSession,
    spec: WalSpec,
    *,
    stream_partitions: int | None = None,
    snap_partitions: int | None = None,
) -> DataFrame:
    """The full change log: snapshot READ events + streamed c/u/d/tombstone events.

    Columns: offset, ts_ms, op, repo, path, before, after, is_tombstone, tx_id,
    schema_version. Strictly one row per (offset, is_tombstone) except the injected
    duplicate-offset rows (exact duplicates, ~dup_frac).

    Offset-ordered BY CONSTRUCTION, shuffle-free: offsets are monotone in the
    generator row id, companion rows (each delete's tombstone at offset+1, the
    ~dup_frac duplicated events) are emitted inline in the same pass via
    array+inline, and union places the snapshot partitions (all offsets <
    stream base) before the stream partitions. ``stream_partitions`` /
    ``snap_partitions`` size the ordered ``spark.range`` slices so a direct
    write needs no repartition — at 60M+ events the old
    ``repartitionByRange`` exchange carried ~1.5 KB/row through a full
    shuffle+sort and was the generation-time memory hot spot.
    """
    p_c = spec.pct_create
    p_u = p_c + spec.pct_update
    p_d = p_u + spec.pct_delete
    p_pk = p_d + spec.pct_pk_change
    sco = spec.schema_change_offsets()
    base = stream_base(spec.n_keys)

    # ---- snapshot READ events: offsets [0, n_keys), op='r' -------------------
    snap_src = (
        spark.range(0, spec.n_keys, 1, snap_partitions)
        if snap_partitions
        else spark.range(spec.n_keys)
    )
    snap = snap_src.select(
        F.col("id").alias("offset"),
        (F.lit(1_700_000_000_000) + F.col("id")).alias("ts_ms"),
        F.lit("r").alias("op"),
        F.col("id").alias("_k"),
        F.lit(None).cast("long").alias("_ver"),
    )
    snap = snap.select(
        "offset", "ts_ms", "op",
        payload_struct(F.col("_k"), spec, version=F.lit(0)).alias("after"),
        F.lit(None).cast(
            "struct<repo:string,path:string,commit:string,lang:string,content:string,size_bytes:bigint>"
        ).alias("before"),
        F.lit(False).alias("is_tombstone"),
        F.lit(0).cast("long").alias("tx_id"),
        F.lit(1).alias("schema_version"),
    )
    snap = snap.select(
        "offset", "ts_ms", "op",
        F.col("after.repo").alias("repo"), F.col("after.path").alias("path"),
        "before", "after", "is_tombstone", "tx_id", "schema_version",
    )

    # ---- streamed events ------------------------------------------------------
    ev_src = (
        spark.range(0, spec.n_events, 1, stream_partitions)
        if stream_partitions
        else spark.range(spec.n_events)
    )
    ev = ev_src.select(F.col("id").alias("i"))
    i = F.col("i")
    off = (F.lit(base) + i * _STRIDE).alias("offset")
    draw = F.pmod(_h(i, spec.seed, 20), F.lit(100))
    op = (
        F.when(draw < p_c, F.lit("c"))
        .when(draw < p_u, F.lit("u"))
        .when(draw < p_d, F.lit("d"))
        .otherwise(F.lit("u"))  # pk-change and overflow are updates
    )
    is_pk_change = (draw >= p_d) & (draw < p_pk)
    k = _event_key(i, spec)
    offc = F.lit(base) + i * _STRIDE
    ver = offc  # content version = offset => every write has distinct content
    schema_version = (
        F.when(F.lit(not spec.schema_changes) | (offc < sco.get(2, 1 << 62)), F.lit(1))
        .when(offc < sco.get(3, 1 << 62), F.lit(2))
        .otherwise(F.lit(3))
    )
    size_bytes = F.when(
        schema_version >= 2, F.pmod(_h(i, spec.seed, 21), F.lit(1_000_000))
    ).otherwise(F.lit(None).cast("long"))

    # pk-change: after.path differs (append '.moved' suffix via a distinct key slot)
    after_same = payload_struct(k, spec, version=ver, size_bytes=size_bytes)
    moved = payload_struct(k, spec, version=ver, size_bytes=size_bytes)
    after_moved = moved.withField("path", F.concat(moved.getField("path"), F.lit(".moved")))
    payload_t = "struct<repo:string,path:string,commit:string,lang:string,content:string,size_bytes:bigint>"
    after = (
        F.when(op == "d", F.lit(None).cast(payload_t))
        .when(is_pk_change, after_moved)
        .otherwise(after_same)
    )

    before_key = payload_struct(k, spec, version=F.lit(0), size_bytes=None)
    before = F.when(
        op.isin("u", "d"),
        F.struct(
            before_key.getField("repo").alias("repo"),
            before_key.getField("path").alias("path"),
            F.lit(None).cast("string").alias("commit"),
            before_key.getField("lang").alias("lang"),
            F.lit(None).cast("string").alias("content"),
            F.lit(None).cast("long").alias("size_bytes"),
        ),
    ).otherwise(
        F.lit(None).cast(
            "struct<repo:string,path:string,commit:string,lang:string,content:string,size_bytes:bigint>"
        )
    )

    tx_id = (i / 8).cast("long") + 1  # ~8 consecutive events per transaction

    # Single-pass emission: each event i yields [main, tombstone-if-delete,
    # dup-if-selected] inline — no second/third scan of the lineage and no
    # later shuffle needed to restore offset order (tombstone at offset+1 sits
    # next to its delete within the stride-8 grid).
    m = F.struct(
        offc.alias("offset"),
        (F.lit(1_700_000_000_000) + offc * 3).alias("ts_ms"),
        op.alias("op"),
        before_key.getField("repo").alias("repo"),
        before_key.getField("path").alias("path"),
        before.alias("before"),
        after.alias("after"),
        F.lit(False).alias("is_tombstone"),
        tx_id.alias("tx_id"),
        schema_version.alias("schema_version"),
    )
    row_t = (
        "struct<offset:bigint,ts_ms:bigint,op:string,repo:string,path:string,"
        f"before:{payload_t},after:{payload_t},"
        "is_tombstone:boolean,tx_id:bigint,schema_version:int>"
    )
    # tombstone companion for each delete: same key, null before/after, offset+1
    # (EventDispatcher.java:408-420: tombstone record follows the delete)
    tomb = F.when(
        op == "d",
        m.withField("offset", offc + 1)
        .withField("before", F.lit(None).cast(payload_t))
        .withField("after", F.lit(None).cast(payload_t))
        .withField("is_tombstone", F.lit(True)),
    ).otherwise(F.lit(None).cast(row_t))
    # duplicate-offset injection: re-emit ~dup_frac of events verbatim
    dup_cut = int(spec.dup_frac * 1000)
    dup = F.when(
        F.pmod(_h(offc, spec.seed, 30), F.lit(1000)) < dup_cut, m
    ).otherwise(F.lit(None).cast(row_t))
    stream = ev.select(F.inline(F.array_compact(F.array(m, tomb, dup))))

    return snap.unionByName(stream)


def schema_history(spark: SparkSession, spec: WalSpec) -> DataFrame:
    """Schema-change log (HistoryRecord.java:19-27 analogue): one row per DDL,
    ordered by offset. v1 = base payload; v2 adds size_bytes INT; v3 widens to BIGINT
    (FIXTURES.md §3.3).
    """
    sco = spec.schema_change_offsets()
    rows = [(0, 1, "CREATE TABLE repos (repo string, path string, commit string, lang string, content string)", "create")]
    if 2 in sco:
        rows.append((sco[2], 2, "ALTER TABLE repos ADD COLUMN size_bytes int", "add_column:size_bytes:int"))
    if 3 in sco:
        rows.append((sco[3], 3, "ALTER TABLE repos ALTER COLUMN size_bytes TYPE bigint", "widen:size_bytes:bigint"))
    return spark.createDataFrame(
        rows, "offset bigint, version int, ddl string, table_changes string"
    )


def write_wal(spark: SparkSession, spec: WalSpec, out_dir: str, *, n_files: int | None = None) -> None:
    """Materialize the WAL as offset-ordered parquet files (binlog segments).

    Lexicographic file order == offset order — the property a real binlog/WAL
    directory has, and what the streaming reader relies on for cross-batch
    ordering. Achieved with zero shuffle: offsets are monotone in the ordered
    generation ranges, so the files come straight out of the range partitions.
    """
    files = n_files or max(8, spec.n_events // 250_000)
    # Offset order is already the generation order (see wal_events): the
    # snapshot partitions (all offsets < stream base) precede the ordered
    # stream range slices, so a direct write of those partitions yields
    # lexicographic file order == offset order with ZERO shuffle — no range
    # sampling pass, no exchange, no sort buffers, at any scale.
    snap_files = max(1, min(files, spec.n_keys // 250_000 + 1))
    wal = wal_events(
        spark, spec, stream_partitions=files, snap_partitions=snap_files
    )
    wal.write.mode("overwrite").parquet(out_dir)
