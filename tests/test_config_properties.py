"""EngineConfig.from_properties: the reference's dotted connector property
surface (config/CommonConnectorConfig.java,
relational/RelationalDatabaseConnectorConfig.java) mapped onto EngineConfig.
Pure driver-side — no SparkSession."""

import pytest

from debezium_spark.config import EngineConfig


def test_reference_properties_map_onto_fields():
    cfg = EngineConfig.from_properties(
        {
            # transport keys a Connect worker eats — accepted, ignored
            "name": "repos-connector",
            "connector.class": "io.debezium.connector.postgresql.PostgresConnector",
            "tasks.max": "1",
            "database.hostname": "db",
            "database.port": "5432",
            "database.user": "cdc",
            "database.password": "secret",
            # real engine knobs, reference names verbatim
            "topic.prefix": "prod",
            "database.dbname": "inventory",
            "table.include.list": "inventory\\.repos",
            "column.exclude.list": "inventory.repos.content, lang",
            "skipped.operations": "t,r",
            "tombstones.on.delete": "false",
            "snapshot.mode": "when_needed",
            "event.processing.failure.handling.mode": "warn",
            "provide.transaction.metadata": "true",
            "heartbeat.interval.ms": "5000",
            "incremental.snapshot.chunk.size": "2048",
            "max.batch.size": "100000",
            "message.key.columns": "inventory\\.repos:repo,path",
            "signal.data.collection": "inventory.dbz_signal",
            # key-embedded column mappers
            "column.mask.with.8.chars": "inventory.repos.commit",
            "column.truncate.to.16.chars": "content",
            "column.mask.hash.SHA-256.with.salt.s4lt": "repos.path",
        }
    )
    assert cfg.server_name == "prod"
    assert cfg.database == "inventory"
    assert cfg.table_include == "inventory\\.repos"
    assert cfg.column_exclude == ["inventory.repos.content", "lang"]
    assert cfg.skipped_operations == ["t", "r"]
    assert cfg.tombstones_on_delete is False
    assert cfg.snapshot_mode == "when_needed"
    assert cfg.failure_handling == "warn"
    assert cfg.provide_transaction_metadata is True
    assert cfg.heartbeat_interval_ms == 5000
    assert cfg.incremental_chunk_size == 2048
    assert cfg.max_offsets_per_batch == 100000
    assert cfg.message_key_columns == "inventory\\.repos:repo,path"
    assert cfg.signal_data_collection is True
    # column-segment extraction on fully-qualified names
    assert cfg.mask_columns == {"commit": "********"}
    assert cfg.truncate_columns == {"content": 16}
    assert cfg.hash_mask_columns == {"path": "s4lt"}


def test_defaults_aliases_and_sentinels():
    cfg = EngineConfig.from_properties({})
    assert cfg == EngineConfig()
    # legacy alias + 'none' skipped-operations sentinel
    cfg = EngineConfig.from_properties(
        {"database.server.name": "legacy", "skipped.operations": "none"}
    )
    assert cfg.server_name == "legacy" and cfg.skipped_operations == []
    # overrides win last
    cfg = EngineConfig.from_properties(
        {"topic.prefix": "a"}, server_name="b", target_buckets=64
    )
    assert cfg.server_name == "b" and cfg.target_buckets == 64


def test_unknown_and_invalid_properties_raise():
    with pytest.raises(ValueError, match="unknown connector property"):
        EngineConfig.from_properties({"snapsot.mode": "initial"})  # typo
    with pytest.raises(ValueError, match="invalid boolean"):
        EngineConfig.from_properties({"tombstones.on.delete": "yes"})
    with pytest.raises(ValueError, match="invalid snapshot_mode"):
        EngineConfig.from_properties({"snapshot.mode": "bogus"})
    with pytest.raises(ValueError, match="invalid skipped_operations"):
        EngineConfig.from_properties({"skipped.operations": "x"})


def test_validate_properties_collects_all_errors():
    findings = EngineConfig.validate_properties(
        {
            "topic.prefix": "srv",
            "not.a.knob": "1",
            "tombstones.on.delete": "yep",          # bad boolean
            "heartbeat.interval.ms": "soon",        # bad int
            "connector.class": "ignored.Transport",
        }
    )
    by_name = {f["name"]: f for f in findings}
    assert set(by_name) == {
        "not.a.knob", "tombstones.on.delete", "heartbeat.interval.ms"
    }
    assert by_name["not.a.knob"]["errors"] == ["unknown connector property"]
    assert "boolean" in by_name["tombstones.on.delete"]["errors"][0]
    assert by_name["heartbeat.interval.ms"]["value"] == "soon"


def test_validate_properties_attributes_constructor_errors():
    findings = EngineConfig.validate_properties({"snapshot.mode": "bogus"})
    assert len(findings) == 1
    assert findings[0]["name"] == "snapshot.mode"
    assert "snapshot_mode" in findings[0]["errors"][0]


def test_validate_properties_empty_means_buildable():
    props = {
        "topic.prefix": "srv",
        "snapshot.mode": "never",
        "column.mask.with.4.chars": "db.t.secret",
    }
    assert EngineConfig.validate_properties(props) == []
    cfg = EngineConfig.from_properties(props)
    assert cfg.mask_columns == {"secret": "****"}


def test_validate_properties_empty_column_list():
    findings = EngineConfig.validate_properties({"column.mask.with.4.chars": " "})
    assert findings and "comma-separated" in findings[0]["errors"][0]


def test_schema_generator_covers_property_map():
    """The generated connector schema (tools/schema_generator.py — the
    debezium-schema-generator analogue) must describe every dotted property
    from_properties accepts, with types/enums consistent with EngineConfig."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from schema_generator import build_connector_schema

    from debezium_spark import config as C

    spec = build_connector_schema()
    props = spec["properties"]
    for dotted, (field_name, _conv) in C._PROPERTY_MAP.items():
        assert dotted in props, f"{dotted} missing from generated schema"
        assert props[dotted]["x-field"] == field_name
    # enums mirror __post_init__ validation: every enum default is legal
    assert set(props["snapshot.mode"]["enum"]) == C.VALID_SNAPSHOT_MODES
    assert props["snapshot.mode"]["default"] == "initial"
    assert props["tombstones.on.delete"]["type"] == "boolean"
    assert props["tombstones.on.delete"]["default"] is True
    assert props["max.batch.size"]["type"] == "integer"
    # pattern families (mask/truncate/hash-mask) are declared
    fams = spec["x-pattern-properties"]
    assert any("mask\\.with" in k for k in fams)
    assert any("truncate\\.to" in k for k in fams)
    # the descriptor identity block mirrors buildConnectorSchema's extensions
    assert spec["x-connector-id"] == "spark-cdc"
    assert spec["x-className"].endswith("CdcEngine")


def test_standard_embedded_transport_keys_ignored():
    """Every reference embedded-engine config carries offset-store /
    server-id / schema-history-file keys; from_properties must pass over
    them instead of rejecting the verbatim-ported dict (regression)."""
    from debezium_spark.config import EngineConfig

    cfg = EngineConfig.from_properties({
        "topic.prefix": "srv",
        "offset.storage": "org.apache.kafka.connect.storage.FileOffsetBackingStore",
        "offset.storage.file.filename": "/tmp/o.dat",
        "offset.flush.interval.ms": "1000",
        "offset.flush.timeout.ms": "5000",
        "database.server.id": "184054",
        "schema.history.internal.file.filename": "/tmp/h.dat",
    })
    assert cfg.server_name == "srv"
