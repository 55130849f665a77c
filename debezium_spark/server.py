"""Debezium-Server-equivalent standalone runtime.

The reference's ``debezium-server-core`` wraps the embedded engine in a
process that is configured ENTIRELY by an ``application.properties`` file and
fans records out to a named sink (debezium-server/debezium-server-core/
src/main/java/io/debezium/server/DebeziumServer.java):

* property namespaces ``debezium.source.`` / ``debezium.sink.`` /
  ``debezium.format.`` (DebeziumServer.java:64-77); ``debezium.sink.type``
  selects the consumer, and the source/format subsets are re-prefixed onto
  the embedded engine's properties (``configToProperties`` calls at
  DebeziumServer.java:127-133);
* key/value formats resolved by simple name — json / avro / protobuf /
  cloudevents — defaulting to json (getFormat, DebeziumServer.java:181-199);
* the sink is looked up BY NAME from a registry of ChangeConsumer
  implementations; zero or multiple candidates is an error
  (DebeziumServer.java:106-118);
* sinks rename destinations through a pluggable ``StreamNameMapper``
  (BaseChangeConsumer.java:31-41);
* the engine runs on an executor and the process exit code reflects the
  completion callback (Main.java + ConnectorLifecycle returnCode wiring,
  DebeziumServer.java:154,214).

Spark-first shape (SURVEY.md §3.3): the runtime is a ``spark-submit`` job —

    spark-submit --master <cluster> --py-files dist/debezium_spark.zip \
        tools/server_main.py --config application.properties

``tools/build_pyfiles.py`` builds the deterministic package zip. The
reference's network sinks (Kinesis, Pub/Sub, Pulsar, Redis, HTTP, ...) are
transport plug-ins around the identical consumer contract; this runtime ships
a filesystem sink (the transport available in any Spark-cluster container)
and the same by-name plug-in seam (:func:`register_sink`, the analogue of the
CDI bean lookup + ``@CustomConsumerBuilder``, CustomConsumerBuilder.java:1)
so a user adds their own network sink exactly like a debezium-server module
would.

The distributed work — capture filters, SMT chain, envelope wrap, format
serialization — all happens inside :class:`debezium_spark.api.DebeziumEngine`
as column algebra; the server layer only parses properties, picks the sink,
and pumps the driver-side record iterator into it.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import re
import sys
from typing import Any, Callable

from pyspark.sql import SparkSession

from debezium_spark.api import (
    Avro,
    ChangeConsumer,
    ChangeEvent,
    CloudEvents,
    DebeziumEngine,
    Json,
    Protobuf,
    RecordCommitter,
)

__all__ = [
    "Server",
    "ServerConfig",
    "load_properties",
    "register_sink",
    "FileSink",
    "main",
]

# ---------------------------------------------------------------- properties

_PREFIX = "debezium."
_SOURCE_PREFIX = _PREFIX + "source."  # DebeziumServer.java:65
_SINK_PREFIX = _PREFIX + "sink."  # DebeziumServer.java:66
_FORMAT_PREFIX = _PREFIX + "format."  # DebeziumServer.java:67
_SINK_TYPE = _SINK_PREFIX + "type"  # DebeziumServer.java:74
_KEY_FORMAT = _FORMAT_PREFIX + "key"  # DebeziumServer.java:75
_VALUE_FORMAT = _FORMAT_PREFIX + "value"  # DebeziumServer.java:76

_FORMATS: dict[str, type] = {
    # simple names, lower-cased, like getFormat (DebeziumServer.java:181-199)
    "json": Json,
    "avro": Avro,
    "protobuf": Protobuf,
    "cloudevents": CloudEvents,
}


def load_properties(path: str) -> dict[str, str]:
    """Parse a java.util.Properties file — the config format every
    debezium-server deployment already has. Covers the subset real
    ``application.properties`` files use: ``#``/``!`` comments, ``key=value``
    or ``key: value`` or ``key value`` separators, trailing-backslash line
    continuation, and latin escapes ``\\t \\n \\= \\:``."""
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        logical = ""
        for raw in f:
            line = raw.rstrip("\n").rstrip("\r")
            stripped = line.lstrip()
            if not logical and (not stripped or stripped[0] in "#!"):
                continue
            # a trailing odd number of backslashes continues the line
            body = stripped if not logical else line.lstrip()
            n_bs = len(body) - len(body.rstrip("\\"))
            if n_bs % 2 == 1:
                logical += body[:-1]
                continue
            logical += body
            key, val = _split_property(logical)
            if key:
                props[key] = val
            logical = ""
        if logical:
            key, val = _split_property(logical)
            if key:
                props[key] = val
    return props


def _split_property(line: str) -> tuple[str, str]:
    """Split at the first unescaped ``=``, ``:`` or whitespace."""
    key_chars: list[str] = []
    i = 0
    while i < len(line):
        c = line[i]
        if c == "\\" and i + 1 < len(line):
            key_chars.append(line[i + 1])
            i += 2
            continue
        if c in "=:" or c.isspace():
            break
        key_chars.append(c)
        i += 1
    # skip separator: optional whitespace, one = or :, optional whitespace
    while i < len(line) and line[i].isspace():
        i += 1
    if i < len(line) and line[i] in "=:":
        i += 1
    while i < len(line) and line[i].isspace():
        i += 1
    return "".join(key_chars), _unescape(line[i:])


def _unescape(s: str) -> str:
    return re.sub(
        r"\\(.)",
        lambda m: {"t": "\t", "n": "\n", "r": "\r", "f": "\f"}.get(
            m.group(1), m.group(1)
        ),
        s,
    )


class ServerConfig:
    """The parsed ``debezium.*`` namespaces.

    Mirrors ``DebeziumServer.start()``'s property routing
    (DebeziumServer.java:101-145):

    * ``debezium.source.*``  → engine properties, prefix stripped;
    * ``debezium.format.key`` / ``debezium.format.value`` → format classes
      (default json); key must be json or equal to the value format — the
      facade serializes both sides with one format class;
    * ``debezium.format.value.*`` → ``value.converter.*`` engine properties
      (the reference's re-prefixing at DebeziumServer.java:131), except the
      CloudEvents serializer knob which the embedded facade takes bare;
    * ``debezium.sink.type`` → sink name (required — loadConfigOrDie,
      DebeziumServer.java:220-229);
    * ``debezium.sink.<type>.*`` → sink config, prefix stripped.
    """

    def __init__(self, props: dict[str, str]) -> None:
        if _SINK_TYPE not in props:
            raise ValueError(
                f"Property '{_SINK_TYPE}' is required (no sink configured)"
            )
        self.sink_type: str = str(props[_SINK_TYPE]).strip()

        value_name = str(props.get(_VALUE_FORMAT, "json")).strip().lower()
        key_name = str(props.get(_KEY_FORMAT, "json")).strip().lower()
        if value_name not in _FORMATS:
            raise ValueError(f"Unknown value format '{value_name}'")
        if key_name not in _FORMATS:
            raise ValueError(f"Unknown key format '{key_name}'")
        if key_name not in ("json", value_name):
            raise ValueError(
                f"key format '{key_name}' must be json or match the value "
                f"format '{value_name}'"
            )
        self.format: type = _FORMATS[value_name]
        self.value_format_name: str = value_name

        self.engine_props: dict[str, str] = {}
        self.sink_props: dict[str, str] = {}
        sink_sub = f"{_SINK_PREFIX}{self.sink_type}."
        for k, v in props.items():
            if k.startswith(_SOURCE_PREFIX):
                self.engine_props[k[len(_SOURCE_PREFIX):]] = v
            elif k.startswith(sink_sub):
                self.sink_props[k[len(sink_sub):]] = v
            elif k.startswith(_FORMAT_PREFIX + "value."):
                rest = k[len(_FORMAT_PREFIX + "value."):]
                if rest.startswith("cloudevents."):
                    self.engine_props[rest] = v  # the facade's bare knob
                else:
                    self.engine_props[f"value.converter.{rest}"] = v
            elif k in (_SINK_TYPE, _KEY_FORMAT, _VALUE_FORMAT):
                continue
            elif k.startswith(_PREFIX):
                # other debezium.sink.<othertype>.* / debezium.transforms.*
                # blocks are inert for the selected sink, like the reference
                continue
            # non-debezium.* keys (quarkus.*, logging) are runtime noise


# -------------------------------------------------------------------- sinks

StreamNameMapper = Callable[[str], str]  # BaseChangeConsumer.java:31

_SINKS: dict[str, Callable[[dict[str, str], StreamNameMapper], ChangeConsumer]] = {}


def register_sink(
    name: str,
    factory: Callable[[dict[str, str], StreamNameMapper], ChangeConsumer],
) -> None:
    """The plug-in seam: the analogue of debezium-server's CDI lookup of a
    ``ChangeConsumer`` bean named ``debezium.sink.type``
    (DebeziumServer.java:106-118, CustomConsumerBuilder.java:1). Registering
    an existing name replaces it (latest wins, like an application shadowing
    a built-in bean)."""
    _SINKS[name] = factory


def resolve_sink(
    name: str,
    sink_props: dict[str, str],
    stream_name_mapper: StreamNameMapper | None = None,
) -> ChangeConsumer:
    if name not in _SINKS:
        # same failure text shape as DebeziumServer.java:113
        raise ValueError(
            f"No Debezium consumer named '{name}' is available "
            f"(registered: {sorted(_SINKS)})"
        )
    return _SINKS[name](sink_props, stream_name_mapper or (lambda d: d))


class FileSink(ChangeConsumer):
    """Filesystem sink: one JSON-lines file per destination under ``dir``.

    The container-runnable analogue of the reference's per-destination
    transports (a Kinesis stream / PubSub topic / Pulsar topic per sanitized
    destination — e.g. KinesisChangeConsumer.handleBatch in
    debezium-server-kinesis). Each line carries ``destination``, ``offset``,
    ``key`` and ``value``; binary formats (Avro/Protobuf frames) are
    base64-wrapped the way the reference's JSON transports carry bytes
    (BaseChangeConsumer.getString/bytes handling). A record is only
    ``markProcessed``-ed after its line is durably flushed, and the batch is
    only finished after ``fsync`` — the offset-commit-after-ack ordering of
    SURVEY §3.3 crossing (2): a crash between sink write and offset flush
    redelivers, never loses."""

    def __init__(self, sink_props: dict[str, str], mapper: StreamNameMapper) -> None:
        if "dir" not in sink_props:
            raise ValueError("file sink requires 'debezium.sink.file.dir'")
        self._dir = sink_props["dir"]
        self._mapper = mapper
        self._null_key = str(sink_props.get("null.key", "default")).strip()
        os.makedirs(self._dir, exist_ok=True)
        self.written = 0

    def _path(self, destination: str) -> str:
        safe = re.sub(r"[^a-zA-Z0-9\._\-]", "_", self._mapper(destination))
        return os.path.join(self._dir, f"{safe}.jsonl")

    @staticmethod
    def _text(v: str | bytes | None) -> Any:
        if isinstance(v, (bytes, bytearray)):
            return {"base64": base64.b64encode(bytes(v)).decode("ascii")}
        return v

    def handle_batch(
        self, records: list[ChangeEvent], committer: RecordCommitter
    ) -> None:
        handles: dict[str, Any] = {}
        try:
            for rec in records:
                p = self._path(rec.destination)
                fh = handles.get(p)
                if fh is None:
                    fh = handles[p] = open(p, "a", encoding="utf-8")
                fh.write(
                    json.dumps(
                        {
                            "destination": rec.destination,
                            "offset": rec.offset,
                            "key": self._text(rec.key) or self._null_key,
                            "value": self._text(rec.value),
                        },
                        separators=(",", ":"),
                    )
                    + "\n"
                )
                self.written += 1
                committer.mark_processed(rec)
            for fh in handles.values():
                fh.flush()
                os.fsync(fh.fileno())
        finally:
            for fh in handles.values():
                fh.close()
        committer.mark_batch_finished()


register_sink("file", FileSink)


class HttpSink(ChangeConsumer):
    """HTTP webhook sink — HttpChangeConsumer parity (debezium-server-http/
    src/main/java/io/debezium/server/http/HttpChangeConsumer.java:44-156):
    one POST per record to the webhook URL (the Knative ``K_SINK`` env when
    set, else the ``url`` sink property — K_SINK-first like the reference's
    SinkBinding support, so a bound deployment that also carries a stale url
    property targets the binding's endpoint), with
    content-type derived from the value format (json →
    ``application/json``, avro → ``avro/bytes``, cloudevents →
    ``application/cloudevents+json``). Success = HTTP 200/202/204; any
    other status is retried with ``retry.interval.ms`` pauses (default
    1000) until ``retries`` TOTAL attempts (default 5) are exhausted, then
    raises — the reference's exact attempt accounting and
    DebeziumException path. A transport-level failure (connection refused,
    timeout) raises immediately, mirroring the reference's IOException →
    InterruptedException path.

    Ordering/at-least-once: records POST strictly in batch order; each is
    ``mark_processed``-ed only AFTER its POST is acked and the batch
    finishes only after every record — offset-commit-after-ack, so a crash
    between sink ack and offset flush redelivers, never loses.
    Null-valued records are not sent (the tombstone's deletion is already
    carried by the preceding envelope) but ARE marked processed —
    deliberate deviation from HttpChangeConsumer.handleBatch, whose
    null-guard also skips markProcessed and therefore never advances the
    offset past a trailing tombstone (a batch of only tombstones commits
    nothing and redelivers forever). Disable tombstones at the engine
    instead via ``tombstones.on.delete`` if the webhook must never see
    them."""

    _OK_STATUSES = (200, 202, 204)

    def __init__(self, sink_props: dict[str, str], mapper: StreamNameMapper) -> None:
        # K_SINK FIRST (HttpChangeConsumer.java: the Knative SinkBinding env
        # wins over the configured url when both are present)
        url = os.environ.get("K_SINK") or sink_props.get("url")
        if not url:
            raise ValueError(
                "http sink requires 'debezium.sink.http.url' (or K_SINK)"
            )
        self._url = url
        self._timeout = int(sink_props.get("timeout.ms", "60000")) / 1000.0
        self._retries = int(sink_props.get("retries", "5"))
        self._retry_interval = (
            int(sink_props.get("retry.interval.ms", "1000")) / 1000.0
        )
        fmt = str(sink_props.get("_value.format", "json")).strip().lower()
        self._content_type = {
            "avro": "avro/bytes",
            "cloudevents": "application/cloudevents+json",
        }.get(fmt, "application/json")
        self._mapper = mapper
        self.written = 0

    def _record_sent(self, value: str | bytes) -> bool:
        import urllib.error
        import urllib.request

        data = (
            bytes(value)
            if isinstance(value, (bytes, bytearray))
            else str(value).encode("utf-8")
        )
        req = urllib.request.Request(
            self._url,
            data=data,
            headers={"content-type": self._content_type},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as resp:
                return resp.status in self._OK_STATUSES
        except urllib.error.HTTPError as e:
            # non-2xx WITH a response: retryable, like the reference's
            # "Failed to publish event" log-and-retry
            e.close()
            return False
        except urllib.error.URLError as e:
            # transport failure: fail fast (reference: IOException ->
            # InterruptedException stops the engine)
            raise RuntimeError(f"http sink transport failure: {e}") from e

    def handle_batch(
        self, records: list[ChangeEvent], committer: RecordCommitter
    ) -> None:
        import time as _time

        for rec in records:
            if rec.value is not None:
                attempts = 0
                while not self._record_sent(rec.value):
                    attempts += 1
                    if attempts >= self._retries:
                        raise RuntimeError(
                            "Exceeded maximum number of attempts to publish "
                            f"event at offset {rec.offset}"
                        )
                    _time.sleep(self._retry_interval)
                self.written += 1
            # tombstones skip the POST but still advance the offset — see
            # the class docstring for why this deviates from the reference
            committer.mark_processed(rec)
        committer.mark_batch_finished()


register_sink("http", HttpSink)


class RedisSink(ChangeConsumer):
    """Redis stream sink — RedisStreamChangeConsumer parity
    (debezium-server-redis/src/main/java/io/debezium/server/redis/
    RedisStreamChangeConsumer.java:44-220), speaking the RESP2 wire protocol
    over a stdlib socket (no client library): each record becomes
    ``XADD <mapped destination> * <key> <value>`` — one entry on the stream
    named by the ``StreamNameMapper``-mapped destination, with the record key
    as the single field name and the serialized value as its value
    (handleBatch's ``pipeline.xadd(destination, NEW_ENTRY,
    singletonMap(key, value))``). Null keys/values are replaced by the
    ``null.key`` / ``null.value`` properties (default ``default`` both, like
    the reference's @ConfigProperty defaults) — so tombstones DO reach the
    stream, unlike the HTTP sink.

    Batching/acks: records go out in ``batch.size`` (default 500) pipelined
    slices; every command's reply is read back in order and each record is
    ``mark_processed``-ed only when ITS reply is a stream id — Redis OOM
    errors ("OOM command not allowed...") leave just the failed records in
    the retry set, which is retried with exponential backoff from
    ``retry.initial.delay.ms`` (300) capped at ``retry.max.delay.ms``
    (10000), exactly the reference's DelayStrategy.exponential + per-response
    OOM accounting. Connection errors tear the socket down and reconnect-
    retry the remaining records. Deviation (documented): retries are bounded
    by ``retries`` (default 16) instead of the reference's unbounded loop —
    a stuck sandbox process is worse than a failed batch; set retries=0 for
    the reference's retry-forever behavior. Offsets commit only after acks
    (offset-commit-after-ack), so a crash between XADD and offset flush
    redelivers, never loses — at-least-once, the reference's contract.
    """

    def __init__(self, sink_props: dict[str, str], mapper: StreamNameMapper) -> None:
        addr = sink_props.get("address")
        if not addr or ":" not in addr:
            raise ValueError(
                "redis sink requires 'debezium.sink.redis.address' as host:port"
            )
        host, _, port = addr.rpartition(":")
        self._host, self._port = host, int(port)
        self._user = sink_props.get("user")
        self._password = sink_props.get("password")
        self._timeout = int(sink_props.get("socket.timeout.ms", "2000")) / 1000.0
        self._batch_size = int(sink_props.get("batch.size", "500"))
        self._initial_delay = (
            int(sink_props.get("retry.initial.delay.ms", "300")) / 1000.0
        )
        self._max_delay = int(sink_props.get("retry.max.delay.ms", "10000")) / 1000.0
        self._max_retries = int(sink_props.get("retries", "16"))
        self._null_key = sink_props.get("null.key", "default")
        self._null_value = sink_props.get("null.value", "default")
        self._mapper = mapper
        self._sock = None
        self._rfile = None
        self.written = 0

    # ---------------------------------------------------------- RESP codec
    @staticmethod
    def _encode(*args: str | bytes) -> bytes:
        out = [b"*%d\r\n" % len(args)]
        for a in args:
            b = a if isinstance(a, (bytes, bytearray)) else str(a).encode("utf-8")
            out.append(b"$%d\r\n" % len(b))
            out.append(bytes(b))
            out.append(b"\r\n")
        return b"".join(out)

    def _read_reply(self):
        line = self._rfile.readline()
        if not line:
            raise ConnectionError("redis connection closed mid-reply")
        t, body = line[:1], line[1:-2]
        if t == b"+":
            return ("ok", body.decode("utf-8"))
        if t == b"-":
            return ("err", body.decode("utf-8"))
        if t == b":":
            return ("int", int(body))
        if t == b"$":
            n = int(body)
            if n == -1:
                return ("bulk", None)
            data = self._rfile.read(n + 2)[:-2]
            return ("bulk", data)
        if t == b"*":
            return ("array", [self._read_reply() for _ in range(int(body))])
        raise ConnectionError(f"unparseable RESP reply {line!r}")

    def _connect(self) -> None:
        import socket

        self._close()
        self._sock = socket.create_connection(
            (self._host, self._port), timeout=self._timeout
        )
        self._rfile = self._sock.makefile("rb")
        # AUTH [user] password, then the reference's client naming
        # (RedisConnection.DEBEZIUM_REDIS_SINK_CLIENT_NAME)
        if self._password:
            args = (
                ("AUTH", self._user, self._password)
                if self._user
                else ("AUTH", self._password)
            )
            self._sock.sendall(self._encode(*args))
            kind, msg = self._read_reply()
            if kind == "err":
                raise ConnectionError(f"redis AUTH failed: {msg}")
        self._sock.sendall(
            self._encode("CLIENT", "SETNAME", "debezium:redis:sink")
        )
        self._read_reply()  # best-effort, like the reference's client name

    def _close(self) -> None:
        for o in (self._rfile, self._sock):
            if o is not None:
                try:
                    o.close()
                except OSError:
                    pass
        self._sock = self._rfile = None

    # ------------------------------------------------------------- delivery
    def handle_batch(
        self, records: list[ChangeEvent], committer: RecordCommitter
    ) -> None:
        import time as _time

        for start in range(0, len(records), self._batch_size):
            pending = list(records[start : start + self._batch_size])
            delay, attempts = self._initial_delay, 0
            while pending:
                try:
                    if self._sock is None:
                        self._connect()
                    # liveness probe before pipelining, "to reduce the chance
                    # of ending up with duplicate records" (reference comment)
                    self._sock.sendall(self._encode("PING"))
                    kind, msg = self._read_reply()
                    if kind == "err":
                        raise ConnectionError(f"redis PING failed: {msg}")
                    cmds = []
                    for rec in pending:
                        key = rec.key if rec.key is not None else self._null_key
                        value = (
                            rec.value if rec.value is not None else self._null_value
                        )
                        cmds.append(
                            self._encode(
                                "XADD",
                                self._mapper(rec.destination),
                                "*",
                                key,
                                value,
                            )
                        )
                    self._sock.sendall(b"".join(cmds))  # one pipelined write
                    replies = [self._read_reply() for _ in pending]
                except (OSError, ConnectionError):
                    self._close()
                    attempts += 1
                    if self._max_retries and attempts > self._max_retries:
                        raise
                    _time.sleep(delay)
                    delay = min(delay * 2, self._max_delay)
                    continue
                still = []
                for rec, (kind, msg) in zip(pending, replies):
                    if kind == "err":
                        if "OOM command not allowed" in str(msg):
                            still.append(rec)  # retried once memory frees
                            continue
                        raise RuntimeError(f"redis sink data error: {msg}")
                    committer.mark_processed(rec)
                    self.written += 1
                pending = still
                if pending:
                    attempts += 1
                    if self._max_retries and attempts > self._max_retries:
                        raise RuntimeError(
                            f"redis sink: {len(pending)} records still failing "
                            f"with OOM after {attempts} attempts"
                        )
                    _time.sleep(delay)
                    delay = min(delay * 2, self._max_delay)
        committer.mark_batch_finished()


register_sink("redis", RedisSink)


# ------------------------------------------------------------------- server


class Server:
    """The standalone runtime: properties in, sink out, exit code back.

    ``run()`` builds the embedded facade exactly like ``DebeziumServer.start``
    builds its engine (create(format).using(props).notifying(sink).build())
    and blocks until the WAL is exhausted or the sink raises; the return
    value is the process exit code (0 success / 1 failure — the reference's
    ``returnCode`` flipped by the completion callback,
    DebeziumServer.java:154,214)."""

    def __init__(
        self,
        spark: SparkSession,
        config: ServerConfig | dict[str, str] | str,
        *,
        stream_name_mapper: StreamNameMapper | None = None,
    ) -> None:
        if isinstance(config, str):
            config = load_properties(config)
        if isinstance(config, dict):
            config = ServerConfig(config)
        self.config = config
        self.spark = spark
        # sinks that vary behavior by value format (e.g. http content-type)
        # read it from this reserved key — the analogue of the reference
        # sink reading the global `debezium.format.value` config
        sink_props = dict(config.sink_props)
        sink_props.setdefault("_value.format", config.value_format_name)
        self.sink = resolve_sink(config.sink_type, sink_props, stream_name_mapper)
        self.completion: tuple[bool, str, BaseException | None] | None = None

    def run(self) -> int:
        def _completed(ok: bool, msg: str, err: BaseException | None) -> None:
            self.completion = (ok, msg, err)

        engine = (
            DebeziumEngine.create(self.config.format)
            .using(self.config.engine_props)
            .using_spark(self.spark)
            .notifying(self.sink)
            .using_completion_callback(_completed)
            .build()
        )
        engine.run()
        ok = self.completion is None or self.completion[0]
        return 0 if ok else 1


def main(argv: list[str] | None = None) -> int:
    """spark-submit entry point::

        spark-submit --master <cluster> --py-files dist/debezium_spark.zip \
            tools/server_main.py --config application.properties

    The SparkSession comes from spark-submit's own configuration
    (master/executors/conf flags), so cluster sizing lives where a Spark
    operator expects it; everything Debezium-shaped lives in the properties
    file, where a Debezium operator expects it."""
    ap = argparse.ArgumentParser(prog="debezium-spark-server")
    ap.add_argument("--config", required=True, help="application.properties path")
    args = ap.parse_args(argv)
    spark = SparkSession.builder.appName("debezium-spark-server").getOrCreate()
    try:
        server = Server(spark, args.config)
        code = server.run()
        if server.completion is not None:
            ok, msg, err = server.completion
            print(f"server completed ok={ok}: {msg}", file=sys.stderr)
            if err is not None:
                print(f"error: {err!r}", file=sys.stderr)
        print(
            json.dumps(
                {
                    "sink": server.config.sink_type,
                    "records_written": getattr(server.sink, "written", None),
                    "exit_code": code,
                }
            )
        )
        return code
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
