"""debezium_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Reimplements the semantics of Debezium (reference: /root/reference, Java/Kafka-Connect)
as an idiomatic Spark system: a binlog/WAL-style change stream is wrapped in
Debezium-style before/after envelopes (``io/debezium/data/Envelope.java``), resolved
per-key last-writer-wins over the offset total order, and MERGE-applied into a
bucketed lake table with exactly-once, schema-evolution, and resumable-replay
semantics.

Everything is pyspark.sql DataFrame column algebra; no per-row Python UDFs.
"""

from debezium_spark.api import ChangeConsumer, ChangeEvent, DebeziumEngine, StopEngineException
from debezium_spark.config import EngineConfig
from debezium_spark.plans.ddl import history_rows_from_ddl, parse_ddl
from debezium_spark.plans.lake import LakeTable
from debezium_spark.server import Server
from debezium_spark.streaming.engine import CdcEngine
from debezium_spark.streaming.multi import MultiTableEngine, TableSpec

__all__ = [
    "ChangeConsumer",
    "ChangeEvent",
    "DebeziumEngine",
    "Server",
    "StopEngineException",
    "EngineConfig",
    "LakeTable",
    "CdcEngine",
    "MultiTableEngine",
    "TableSpec",
    "parse_ddl",
    "history_rows_from_ddl",
]
__version__ = "0.1.0"
