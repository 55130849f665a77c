"""Pluggable storage backends (debezium_spark/storage.py — the
debezium-storage module analogue): backend laws, reference class-name
resolution, and engine-facade wiring (offset.storage / schema.history.internal
selecting the store exactly like a Connect worker config would)."""

import json
import os

import pytest

from debezium_spark.api import DebeziumEngine, Json
from debezium_spark.plans.registry import SchemaChange
from debezium_spark.sources import wal as W
from debezium_spark.storage import (
    FileOffsetBackingStore,
    LogOffsetBackingStore,
    LogSchemaHistory,
    MemoryOffsetBackingStore,
    MemorySchemaHistory,
    offset_store_from_properties,
    schema_history_from_properties,
)


def test_offset_store_class_name_resolution(tmpdir_path):
    f = offset_store_from_properties(
        {"offset.storage": "org.apache.kafka.connect.storage.FileOffsetBackingStore",
         "offset.storage.file.filename": f"{tmpdir_path}/o.json"},
        default_path=f"{tmpdir_path}/d.json",
    )
    assert isinstance(f, FileOffsetBackingStore) and f.path.endswith("o.json")
    m = offset_store_from_properties(
        {"offset.storage": "org.apache.kafka.connect.storage.MemoryOffsetBackingStore"},
        default_path=f"{tmpdir_path}/d.json",
    )
    assert isinstance(m, MemoryOffsetBackingStore)
    k = offset_store_from_properties(
        {"offset.storage": "org.apache.kafka.connect.storage.KafkaOffsetBackingStore"},
        default_path=f"{tmpdir_path}/d.json",
    )
    assert isinstance(k, LogOffsetBackingStore)
    with pytest.raises(ValueError):
        offset_store_from_properties(
            {"offset.storage": "com.example.Nope"}, default_path="x"
        )


def test_history_class_name_resolution(tmpdir_path):
    h = schema_history_from_properties(
        {"schema.history.internal": "io.debezium.storage.file.history.FileSchemaHistory"},
        default_path=f"{tmpdir_path}/h.jsonl",
    )
    assert h.path.endswith("h.jsonl")
    assert isinstance(
        schema_history_from_properties(
            {"schema.history.internal": "io.debezium.storage.kafka.history.KafkaSchemaHistory"},
            default_path=f"{tmpdir_path}/h.jsonl",
        ),
        LogSchemaHistory,
    )
    assert isinstance(
        schema_history_from_properties(
            {"schema.history.internal": "memory"}, default_path=f"{tmpdir_path}/h"
        ),
        MemorySchemaHistory,
    )


def test_log_offset_store_compacts_and_resumes(tmpdir_path):
    d = f"{tmpdir_path}/olog"
    s = LogOffsetBackingStore(d, segment_records=5)
    assert s.load() == {}
    for i in range(23):
        s.save({"offset": i, "extra": "x"})
    # a NEW store instance over the directory reads the last record
    assert LogOffsetBackingStore(d, segment_records=5).load()["offset"] == 22
    # compaction: only the active segment survives (single-key topic)
    segs = [f for f in os.listdir(d) if f.endswith(".jsonl")]
    assert len(segs) == 1
    with open(os.path.join(d, segs[0])) as f:
        assert sum(1 for _ in f) <= 5


def test_memory_offset_store_process_scoped(tmpdir_path):
    a = MemoryOffsetBackingStore("storename")
    a.save({"offset": 7})
    # same name, new instance (rebuilt engine in the same process) resumes
    assert MemoryOffsetBackingStore("storename").load() == {"offset": 7}
    # different name is isolated
    assert MemoryOffsetBackingStore("other-store").load() == {}


def test_log_schema_history_rotates_never_compacts(tmpdir_path):
    d = f"{tmpdir_path}/hlog"
    h = LogSchemaHistory(d, segment_records=3)
    for v in range(8):
        h.record(SchemaChange(offset=v * 10, version=v, ddl=f"ddl{v}", table_changes=""))
    # rotation produced multiple segments; nothing was deleted
    segs = [f for f in os.listdir(d) if f.endswith(".jsonl")]
    assert len(segs) >= 3
    # full replay in offset order; at-or-before filtering; version dedup
    out = LogSchemaHistory(d, segment_records=3).replay()
    assert [c.version for c in out] == list(range(8))
    upto = h.replay(upto_offset=45)
    assert [c.version for c in upto] == [0, 1, 2, 3, 4]
    h.record(SchemaChange(offset=0, version=0, ddl="dup", table_changes=""))
    assert len(h.replay()) == 8  # idempotent re-record


def test_log_stores_survive_torn_tail(tmpdir_path):
    """A crash mid-append leaves a partial final line (write+flush+fsync of
    one line is not atomic). Recovery must treat it like a log consumer
    treats a torn tail record: discard it, keep everything before it, and
    never let the next append concatenate onto it."""
    d = f"{tmpdir_path}/torn_o"
    s = LogOffsetBackingStore(d, segment_records=100)
    for i in range(4):
        s.save({"offset": i})
    seg = os.path.join(d, [f for f in os.listdir(d) if f.endswith(".jsonl")][0])
    with open(seg, "a") as f:
        f.write('{"offset": 4, "tr')  # torn: no closing brace, no newline
    # load() on a fresh instance skips the torn record, keeps offset=3
    assert LogOffsetBackingStore(d, segment_records=100).load()["offset"] == 3
    # a fresh writer truncates the torn tail, so the next save is clean
    s2 = LogOffsetBackingStore(d, segment_records=100)
    s2.save({"offset": 5})
    assert LogOffsetBackingStore(d, segment_records=100).load()["offset"] == 5
    # mid-file corruption is NOT silently skipped
    bad = f"{tmpdir_path}/torn_bad"
    sb = LogOffsetBackingStore(bad, segment_records=100)
    sb.save({"offset": 0})
    sb.save({"offset": 1})
    segb = os.path.join(bad, [f for f in os.listdir(bad) if f.endswith(".jsonl")][0])
    lines = open(segb).read().splitlines()
    with open(segb, "w") as f:
        f.write("{corrupt}\n" + lines[1] + "\n")
    with pytest.raises(Exception):
        LogOffsetBackingStore(bad, segment_records=100).load()

    # a COMPLETE JSON final line missing its newline is still uncommitted
    # (the writer appends json+'\n' in one write — no terminator means the
    # write never finished), so replay skips it AND the next writer
    # truncates it: replay and append agree on the last committed record
    half = f"{tmpdir_path}/torn_half"
    sh_ = LogOffsetBackingStore(half, segment_records=100)
    sh_.save({"offset": 0})
    segh = os.path.join(half, [f for f in os.listdir(half) if f.endswith(".jsonl")][0])
    with open(segh, "a") as f:
        f.write('{"offset": 1}')  # valid JSON, no newline
    assert LogOffsetBackingStore(half, segment_records=100).load()["offset"] == 0
    s3 = LogOffsetBackingStore(half, segment_records=100)
    s3.save({"offset": 2})
    assert LogOffsetBackingStore(half, segment_records=100).load()["offset"] == 2

    # a newline-TERMINATED corrupt final line is committed garbage -> raises
    badf = f"{tmpdir_path}/torn_badfinal"
    sbf = LogOffsetBackingStore(badf, segment_records=100)
    sbf.save({"offset": 0})
    segf = os.path.join(badf, [f for f in os.listdir(badf) if f.endswith(".jsonl")][0])
    with open(segf, "a") as f:
        f.write("{corrupt}\n")
    with pytest.raises(Exception):
        LogOffsetBackingStore(badf, segment_records=100).load()

    # schema history: torn tail in the LAST segment only skips that record
    hd = f"{tmpdir_path}/torn_h"
    h = LogSchemaHistory(hd, segment_records=2)
    for v in range(5):
        h.record(SchemaChange(offset=v * 10, version=v, ddl=f"d{v}", table_changes=""))
    segs = sorted(f for f in os.listdir(hd) if f.endswith(".jsonl"))
    with open(os.path.join(hd, segs[-1]), "a") as f:
        f.write('{"offset": 99, "ver')
    out = LogSchemaHistory(hd, segment_records=2).replay()
    assert [c.version for c in out] == list(range(5))


@pytest.fixture()
def small_wal(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=40, n_events=200, seed=13)
    W.write_wal(spark, spec, f"{tmpdir_path}/wal", n_files=2)
    return tmpdir_path


def _props(d: str, **extra) -> dict:
    p = {
        "topic.prefix": "repos",
        "database.dbname": "lake",
        "wal.path": f"{d}/wal",
        "work.dir": f"{d}/w",
        "max.batch.size": "1000",
    }
    p.update({k: str(v) for k, v in extra.items()})
    return p


def test_engine_with_log_offset_store_resumes(spark, small_wal):
    """offset.storage=Kafka-analogue log store: run, rebuild, resume — the
    second run delivers nothing new (everything was committed)."""
    d = small_wal
    seen = []
    props = _props(
        d,
        **{
            "offset.storage": "org.apache.kafka.connect.storage.KafkaOffsetBackingStore",
            "offset.storage.log.dir": f"{d}/w/_offsets_log",
            "offset.flush.interval.ms": "0",  # flush every batch
        },
    )
    eng = (
        DebeziumEngine.create(Json)
        .using(props)
        .using_spark(spark)
        .notifying(seen.append)
        .build()
    )
    eng.run()
    assert len(seen) > 0
    assert os.path.isdir(f"{d}/w/_offsets_log")
    second = []
    eng2 = (
        DebeziumEngine.create(Json)
        .using(props)
        .using_spark(spark)
        .notifying(second.append)
        .build()
    )
    eng2.run()
    assert second == []


def test_engine_with_memory_offset_store(spark, small_wal):
    """offset.storage=memory: resumes across rebuilds within the process."""
    d = small_wal
    seen = []
    props = _props(
        d,
        **{
            "offset.storage": "org.apache.kafka.connect.storage.MemoryOffsetBackingStore",
            "offset.flush.interval.ms": "0",
        },
    )
    make = lambda sink: (
        DebeziumEngine.create(Json)
        .using(dict(props))
        .using_spark(spark)
        .notifying(sink.append)
        .build()
    )
    make(seen).run()
    assert len(seen) > 0
    second = []
    make(second).run()
    assert second == []
