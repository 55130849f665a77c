"""DebeziumEngine embedded-API facade (debezium-api
engine/DebeziumEngine.java) — builder contract, record pump, offset
store/resume, StopEngineException, lifecycle callbacks, formats.

Oracle: the facade must deliver exactly the engine's envelope stream
(``CdcEngine.envelope_stream()``), serialized, in offset order."""

import json
import os

import pytest

from debezium_spark import CdcEngine, EngineConfig
from debezium_spark.api import (
    ChangeConsumer,
    CloudEvents,
    DebeziumEngine,
    Json,
    StopEngineException,
)
from debezium_spark.sources import wal as W


def _props(d: str, **extra) -> dict:
    p = {
        "topic.prefix": "repos",
        "database.dbname": "lake",
        "wal.path": f"{d}/wal",
        "work.dir": f"{d}/w",
        "max.batch.size": "1000",
        # transport keys a real Debezium .properties file carries — must be
        # accepted and ignored, like a Connect worker would
        "connector.class": "io.debezium.connector.mysql.MySqlConnector",
        "database.hostname": "localhost",
    }
    p.update({k: str(v) for k, v in extra.items()})
    return p


def _expected_total(spark, d: str) -> int:
    """Record count the pump must deliver: the full envelope stream."""
    eng = CdcEngine(
        spark,
        EngineConfig(),
        wal_path=f"{d}/wal",
        target_path=f"{d}/_oracle_target",
        work_dir=f"{d}/_oracle_work",
    )
    return eng.envelope_stream().count()


@pytest.fixture()
def small_wal(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=60, n_events=300, seed=11)
    W.write_wal(spark, spec, f"{tmpdir_path}/wal", n_files=3)
    return tmpdir_path


def test_notifying_consumer_receives_every_record_in_order(spark, small_wal):
    d = small_wal
    seen = []
    eng = (
        DebeziumEngine.create(Json)
        .using(_props(d))
        .using_spark(spark)
        .notifying(seen.append)
        .build()
    )
    eng.run()
    assert len(seen) == _expected_total(spark, d)
    offs = [r.offset for r in seen]
    assert offs == sorted(offs)  # non-decreasing (duplicate offsets exist)
    # destination = sanitized <prefix>.<db>.<table>
    assert seen[0].destination == "repos.lake.repos"
    # values are envelope JSON (or None tombstones); keys always JSON
    nonnull = [r for r in seen if r.value is not None]
    assert nonnull and any(r.value is None for r in seen)  # both kinds flow
    v = json.loads(nonnull[0].value)
    assert {"op", "source"} <= set(v)
    assert "repo" in json.loads(seen[0].key)


def test_offset_store_resume_skips_flushed_records(spark, small_wal):
    d = small_wal
    total = _expected_total(spark, d)
    first, second = [], []

    class StopAfter(ChangeConsumer):
        """Stops at a BATCH boundary — offset-granularity resume is exact
        there (records sharing one offset never straddle an offset-range
        batch), mirroring markBatchFinished-then-stop usage."""

        def handle_batch(self, records, committer):
            for rec in records:
                first.append(rec)
                committer.mark_processed(rec)
            committer.mark_batch_finished()
            if len(first) >= 120:
                raise StopEngineException()

    def build(consumer):
        return (
            DebeziumEngine.create(Json)
            # commit policy 'always' so the mid-run stop leaves a flushed offset
            .using(_props(d, **{"max.batch.size": 64}))
            .using_spark(spark)
            .using_offset_commit_policy("always")
            .notifying(consumer)
            .build()
        )

    build(StopAfter()).run()
    assert 0 < len(first) < total
    # offset file holds the last marked offset
    state = json.load(open(f"{d}/w/_api_offsets.json"))
    assert state["offset"] == first[-1].offset

    class Collect(ChangeConsumer):
        def handle_batch(self, records, committer):
            for rec in records:
                second.append(rec)
                committer.mark_processed(rec)
            committer.mark_batch_finished()

    build(Collect()).run()
    # resume starts strictly after the flushed offset: no redelivery, no gap
    assert second[0].offset > first[-1].offset
    assert len(first) + len(second) == total


def test_stop_engine_exception_from_function_consumer_marks_the_record(spark, small_wal):
    d = small_wal
    seen = []

    def consume(rec):
        seen.append(rec)
        if len(seen) == 7:
            raise StopEngineException()

    eng = (
        DebeziumEngine.create(Json)
        .using(_props(d))
        .using_spark(spark)
        .using_offset_commit_policy("always")
        .notifying(consume)
        .build()
    )
    eng.run()
    assert len(seen) == 7
    state = json.load(open(f"{d}/w/_api_offsets.json"))
    assert state["offset"] == seen[-1].offset  # the stopping record is processed


def test_completion_and_connector_callbacks(spark, small_wal):
    d = small_wal
    events, completions = [], []

    class Cb:
        def connector_started(self):
            events.append("connector_started")

        def task_started(self):
            events.append("task_started")

        def task_stopped(self):
            events.append("task_stopped")

        def connector_stopped(self):
            events.append("connector_stopped")

    eng = (
        DebeziumEngine.create(Json)
        .using(_props(d))
        .using_spark(spark)
        .notifying(lambda r: None)
        .using_connector_callback(Cb())
        .using_completion_callback(lambda ok, msg, err: completions.append((ok, err)))
        .build()
    )
    eng.run()
    assert events == [
        "connector_started", "task_started", "task_stopped", "connector_stopped"
    ]
    assert completions == [(True, None)]


def test_consumer_error_reported_via_completion_callback(spark, small_wal):
    d = small_wal
    completions = []

    def boom(rec):
        raise RuntimeError("consumer exploded")

    eng = (
        DebeziumEngine.create(Json)
        .using(_props(d))
        .using_spark(spark)
        .notifying(boom)
        .using_completion_callback(lambda ok, msg, err: completions.append((ok, str(err))))
        .build()
    )
    eng.run()  # must not raise — the callback owns the failure
    assert completions and completions[0][0] is False
    assert "consumer exploded" in completions[0][1]


def test_schemas_enable_wrapper_and_tombstone_opt_out(spark, small_wal):
    d = small_wal
    seen = []

    class NoTombstones(ChangeConsumer):
        def supports_tombstone_events(self):
            return False

        def handle_batch(self, records, committer):
            for rec in records:
                seen.append(rec)
                committer.mark_processed(rec)
            committer.mark_batch_finished()

    eng = (
        DebeziumEngine.create(Json)
        .using(_props(d, **{"value.converter.schemas.enable": "true"}))
        .using_spark(spark)
        .notifying(NoTombstones())
        .build()
    )
    eng.run()
    assert seen and all(r.value is not None for r in seen)  # tombstones filtered
    v = json.loads(seen[0].value)
    assert set(v) == {"schema", "payload"}  # JsonConverter schemas.enable shape
    assert "op" in v["payload"]


def test_cloudevents_format(spark, small_wal):
    d = small_wal
    seen = []
    eng = (
        DebeziumEngine.create(CloudEvents)
        .using(_props(d))
        .using_spark(spark)
        .notifying(seen.append)
        .build()
    )
    eng.run()
    assert len(seen) == _expected_total(spark, d)
    ce = json.loads(next(r.value for r in seen if r.value is not None))
    assert ce["specversion"] == "1.0"
    assert ce["type"].startswith("io.debezium.spark.datachangeevent.")
    assert "data" in ce and "iodebeziumop" in ce


def test_offsets_extra_keys_and_custom_offset_file(spark, small_wal):
    d = small_wal
    off_file = os.path.join(d, "custom_offsets.json")

    class Custom(ChangeConsumer):
        def handle_batch(self, records, committer):
            for rec in records:
                offs = committer.build_offsets()
                offs.set("gtid", f"uuid:1-{rec.offset}")
                committer.mark_processed(rec, offs)
            committer.mark_batch_finished()

    eng = (
        DebeziumEngine.create(Json)
        .using(_props(d, **{"offset.storage.file.filename": off_file}))
        .using_spark(spark)
        .notifying(Custom())
        .build()
    )
    eng.run()
    state = json.load(open(off_file))
    assert state["gtid"] == f"uuid:1-{state['offset']}"


def test_builder_validation(spark):
    with pytest.raises(ValueError, match="unsupported serialization format"):
        DebeziumEngine.create(dict)
    with pytest.raises(ValueError, match="consumer is required"):
        DebeziumEngine.create(Json).using_spark(spark).build()
    with pytest.raises(ValueError, match="wal.path"):
        DebeziumEngine.create(Json).using_spark(spark).notifying(lambda r: None).build()
    with pytest.raises(ValueError, match="unknown connector property"):
        (
            DebeziumEngine.create(Json)
            .using({"wal.path": "x", "work.dir": "y", "not.a.knob": "1"})
            .using_spark(spark)
            .notifying(lambda r: None)
            .build()
        )
