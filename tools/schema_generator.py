"""Connector-metadata schema generator — the debezium-schema-generator analogue.

The reference walks a connector's `Field` set and emits a JSON-Schema
document with per-property type/format/default/enum metadata
(`debezium-schema-generator/.../JsonSchemaCreatorService.java:109-160`
buildConnectorSchema; type mapping `toJsonSchemaType` at :86-108; extensions
`connector-id`/`version`/`className` at :115-117). This tool derives the same
document from the ONE source of truth this engine has: `EngineConfig`'s
dataclass fields plus `config._PROPERTY_MAP` (the dotted connector-property
names accepted verbatim by `EngineConfig.from_properties`).

Usage:  python tools/schema_generator.py [out.json]
Import: build_connector_schema() -> dict  (used by tests/test_config_properties.py)
"""

from __future__ import annotations

import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

from debezium_spark import config as C  # noqa: E402

# allowed-value sets mirrored from EngineConfig.__post_init__ (config.py:204-233)
_ENUMS: dict[str, list[str]] = {
    "snapshot_mode": sorted(C.VALID_SNAPSHOT_MODES),
    "failure_handling": ["fail", "warn", "skip"],
    "decimal_handling_mode": ["precise", "double", "string"],
    "time_precision_mode": ["adaptive", "adaptive_time_microseconds", "connect"],
    "binary_handling_mode": ["bytes", "base64", "hex"],
    "skipped_operations": ["c", "u", "d", "t", "r"],
}

# JsonSchemaCreatorService.toJsonSchemaType (:86-108): converter -> (type, format)
_BOOL_FIELDS = {
    "tombstones_on_delete", "provide_transaction_metadata", "publish_messages",
    "signal_data_collection",
}


def _json_type(field_name: str, default) -> tuple[str, str | None]:
    if field_name in _BOOL_FIELDS or isinstance(default, bool):
        return "boolean", None
    if isinstance(default, int) and not isinstance(default, bool):
        return "integer", "int64" if abs(int(default)) > 2**31 else "int32"
    if field_name.endswith(("_include", "_exclude")) or isinstance(default, list):
        return "string", "list,regex"
    return "string", None


def build_connector_schema() -> dict:
    """JSON-Schema connector descriptor: one `properties` entry per dotted
    connector option in `_PROPERTY_MAP`, typed/defaulted from the matching
    `EngineConfig` field — the reference's buildConnectorSchema output shape
    (title, x-connector-id, x-version, x-className, properties{})."""
    defaults = {
        f.name: (
            f.default
            if f.default is not dataclasses.MISSING
            else (f.default_factory() if f.default_factory is not dataclasses.MISSING else None)
        )
        for f in dataclasses.fields(C.EngineConfig)
    }
    props: dict[str, dict] = {}
    for dotted, (field_name, _conv) in sorted(C._PROPERTY_MAP.items()):
        if field_name not in defaults:
            continue
        default = defaults[field_name]
        jtype, jformat = _json_type(field_name, default)
        entry: dict = {"title": dotted, "type": jtype, "x-field": field_name}
        if jformat:
            entry["format"] = jformat
        if field_name in _ENUMS:
            entry["enum"] = _ENUMS[field_name]
        if default not in (None, [], {}):
            entry["default"] = (
                ",".join(default) if isinstance(default, list) else default
            )
        props[dotted] = entry
    # regex-keyed property families (config._MASK_CHARS/_TRUNCATE_CHARS/_MASK_HASH)
    pattern_props = {
        r"column\.mask\.with\.(\d+)\.chars": "mask_columns",
        r"column\.truncate\.to\.(\d+)\.chars": "truncate_columns",
        r"column\.mask\.hash\.([\w-]+)\.with\.salt\.(.+)": "hash_mask_columns",
    }
    cfg = C.EngineConfig()
    return {
        "title": "Spark CDC Connector",
        "type": "object",
        "x-connector-id": cfg.connector,
        "x-version": cfg.version,
        "x-className": "debezium_spark.streaming.engine.CdcEngine",
        "properties": props,
        "x-pattern-properties": {
            k: {"type": "string", "x-field": v} for k, v in pattern_props.items()
        },
    }


def main() -> int:
    spec = build_connector_schema()
    out = sys.argv[1] if len(sys.argv) > 1 else None
    text = json.dumps(spec, indent=2, sort_keys=True)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {out} ({len(spec['properties'])} properties)")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
