"""Standalone server runtime (debezium-server-core DebeziumServer.java) —
properties parsing/routing, sink registry, file sink, and the real
``spark-submit --py-files`` deployment path.

Oracle: the server must deliver exactly the embedded facade's record stream
(``CdcEngine.envelope_stream()`` count) into the sink, and the packaged zip
must be sufficient to run the whole job with the repo absent from the path.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from debezium_spark import CdcEngine, EngineConfig
from debezium_spark.server import (
    FileSink,
    Server,
    ServerConfig,
    load_properties,
    register_sink,
    resolve_sink,
)
from debezium_spark.sources import wal as W

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------- properties IO
def test_load_properties_java_format(tmpdir_path):
    p = os.path.join(tmpdir_path, "app.properties")
    with open(p, "w") as f:
        f.write(
            "# comment\n"
            "! also a comment\n"
            "debezium.sink.type=file\n"
            "debezium.source.topic.prefix: repos\n"
            "spaced.key value with = inside\n"
            "continued.key=first\\\n"
            "    second\n"
            "escaped\\=key=v1\n"
            "trailing.ws=v2   \n"
            "\n"
        )
    props = load_properties(p)
    assert props["debezium.sink.type"] == "file"
    assert props["debezium.source.topic.prefix"] == "repos"
    assert props["spaced.key"] == "value with = inside"
    assert props["continued.key"] == "firstsecond"
    assert props["escaped=key"] == "v1"
    # java.util.Properties keeps trailing whitespace in VALUES (only leading
    # value whitespace is stripped) — assert the as-is behavior for real
    assert props["trailing.ws"] == "v2   "


def _base_props(d: str, **extra) -> dict:
    p = {
        "debezium.sink.type": "file",
        "debezium.sink.file.dir": f"{d}/sink",
        "debezium.source.topic.prefix": "repos",
        "debezium.source.database.dbname": "lake",
        "debezium.source.wal.path": f"{d}/wal",
        "debezium.source.work.dir": f"{d}/work",
        "debezium.source.max.batch.size": "1000",
        # transport keys a real application.properties carries — ignored
        "debezium.source.connector.class": "io.debezium.connector.mysql.MySqlConnector",
        "debezium.source.database.hostname": "localhost",
        "quarkus.log.level": "INFO",  # non-debezium runtime noise
    }
    p.update(extra)
    return p


def test_server_config_namespace_routing(tmpdir_path):
    d = tmpdir_path
    cfg = ServerConfig(
        _base_props(
            d,
            **{
                "debezium.format.value": "json",
                "debezium.format.value.schemas.enable": "true",
                "debezium.sink.othersink.url": "http://x",  # unselected sink block
            },
        )
    )
    assert cfg.sink_type == "file"
    assert cfg.sink_props == {"dir": f"{d}/sink"}
    # source prefix stripped (DebeziumServer.java:127)
    assert cfg.engine_props["topic.prefix"] == "repos"
    assert cfg.engine_props["wal.path"] == f"{d}/wal"
    # format.value.* -> value.converter.* (DebeziumServer.java:131)
    assert cfg.engine_props["value.converter.schemas.enable"] == "true"
    # unselected sink blocks and non-debezium keys are inert
    assert "url" not in cfg.sink_props
    assert not any("quarkus" in k for k in cfg.engine_props)


def test_server_config_errors(tmpdir_path):
    with pytest.raises(ValueError, match="debezium.sink.type"):
        ServerConfig({"debezium.source.topic.prefix": "x"})
    with pytest.raises(ValueError, match="Unknown value format"):
        ServerConfig(_base_props(tmpdir_path, **{"debezium.format.value": "xml"}))
    with pytest.raises(ValueError, match="must be json or match"):
        ServerConfig(
            _base_props(
                tmpdir_path,
                **{"debezium.format.key": "avro", "debezium.format.value": "json"},
            )
        )
    with pytest.raises(ValueError, match="No Debezium consumer named 'kinesis'"):
        resolve_sink("kinesis", {})


def test_register_sink_plugin_seam():
    calls = []

    class Probe(FileSink):
        pass

    def factory(props, mapper):
        calls.append(props)
        import tempfile

        return Probe({"dir": tempfile.mkdtemp()}, mapper)

    register_sink("probe", factory)
    sink = resolve_sink("probe", {"a": "1"})
    assert isinstance(sink, Probe) and calls == [{"a": "1"}]


# ------------------------------------------------------------ in-process run
@pytest.fixture()
def server_wal(spark, tmpdir_path):
    spec = W.WalSpec(n_keys=60, n_events=300, seed=13)
    W.write_wal(spark, spec, f"{tmpdir_path}/wal", n_files=3)
    return tmpdir_path


def _expected_total(spark, d: str) -> int:
    eng = CdcEngine(
        spark,
        EngineConfig(),
        wal_path=f"{d}/wal",
        target_path=f"{d}/_oracle_target",
        work_dir=f"{d}/_oracle_work",
    )
    return eng.envelope_stream().count()


def test_file_sink_delivers_full_stream_and_resumes(spark, server_wal):
    d = server_wal
    server = Server(spark, _base_props(d))
    assert server.run() == 0
    path = os.path.join(d, "sink", "repos.lake.repos.jsonl")
    lines = [json.loads(x) for x in open(path)]
    assert len(lines) == _expected_total(spark, d)
    offs = [r["offset"] for r in lines]
    assert offs == sorted(offs)
    # envelope JSON payloads (or null tombstones) with stable destination
    assert all(r["destination"] == "repos.lake.repos" for r in lines)
    vals = [r["value"] for r in lines if r["value"] is not None]
    assert {"op", "source"} <= set(json.loads(vals[0]))
    # a fresh server over the same work dir resumes past the flushed offset
    server2 = Server(spark, _base_props(d))
    assert server2.run() == 0
    assert len(open(path).readlines()) == len(lines)  # nothing re-delivered


def test_file_sink_avro_format_base64_frames(spark, server_wal):
    d = server_wal
    props = _base_props(d, **{"debezium.format.value": "avro"})
    props["debezium.sink.file.dir"] = f"{d}/sink_avro"
    props["debezium.source.work.dir"] = f"{d}/work_avro"
    server = Server(spark, props)
    assert server.run() == 0
    path = os.path.join(d, "sink_avro", "repos.lake.repos.jsonl")
    lines = [json.loads(x) for x in open(path)]
    assert len(lines) == _expected_total(spark, d)
    framed = [r["value"]["base64"] for r in lines if r["value"] is not None]
    import base64

    body = base64.b64decode(framed[0])
    assert body[0] == 0  # Confluent magic byte


class _Webhook:
    """Local HTTP listener capturing POST bodies; can fail the first N
    requests with 500 to exercise the sink's retry loop."""

    def __init__(self, fail_first: int = 0):
        import http.server
        import threading

        hook = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("content-length", 0))
                body = self.rfile.read(n)
                if hook.failures_left > 0:
                    hook.failures_left -= 1
                    self.send_response(500)
                    self.end_headers()
                    return
                hook.received.append(
                    (body, self.headers.get("content-type"))
                )
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):  # silence
                pass

        self.received: list[tuple[bytes, str]] = []
        self.failures_left = fail_first
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}/hook"
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


class _FakeRedis:
    """Minimal stdlib-socket RESP2 server: enough of Redis to host the sink's
    wire protocol — PING/AUTH/CLIENT are acked, XADD appends to an in-memory
    stream dict and returns a synthetic entry id. Can reply OOM to the first
    N XADDs (exercising the reference's per-response OOM retry accounting)
    and drop the first N connections outright (exercising reconnect)."""

    def __init__(self, oom_first: int = 0, drop_first_conns: int = 0):
        import socket
        import threading

        self.entries: dict[str, list[tuple[bytes, bytes]]] = {}
        self.oom_left = oom_first
        self.drop_conns_left = drop_first_conns
        self.auths: list[list[bytes]] = []
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(8)
        self.address = f"127.0.0.1:{self._srv.getsockname()[1]}"
        self._alive = True
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self):
        import threading

        while self._alive:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            with self._lock:
                if self.drop_conns_left > 0:
                    self.drop_conns_left -= 1
                    conn.close()
                    continue
            threading.Thread(
                target=self._serve, args=(conn,), daemon=True
            ).start()

    def _serve(self, conn):
        f = conn.makefile("rb")
        seq = 0
        try:
            while True:
                line = f.readline()
                if not line or not line.startswith(b"*"):
                    return
                args = []
                for _ in range(int(line[1:-2])):
                    n = int(f.readline()[1:-2])
                    args.append(f.read(n + 2)[:-2])
                cmd = args[0].upper()
                if cmd in (b"PING",):
                    conn.sendall(b"+PONG\r\n")
                elif cmd in (b"CLIENT",):
                    conn.sendall(b"+OK\r\n")
                elif cmd == b"AUTH":
                    with self._lock:
                        self.auths.append(args[1:])
                    conn.sendall(b"+OK\r\n")
                elif cmd == b"XADD":
                    stream, _star, field, value = (
                        args[1].decode(), args[2], args[3], args[4],
                    )
                    with self._lock:
                        if self.oom_left > 0:
                            self.oom_left -= 1
                            conn.sendall(
                                b"-OOM command not allowed when used memory"
                                b" > 'maxmemory'.\r\n"
                            )
                            continue
                        self.entries.setdefault(stream, []).append(
                            (field, value)
                        )
                    seq += 1
                    rid = f"17000000000-{seq}".encode()
                    conn.sendall(b"$%d\r\n%s\r\n" % (len(rid), rid))
                else:
                    conn.sendall(b"-ERR unknown command\r\n")
        except OSError:
            pass
        finally:
            conn.close()

    def close(self):
        self._alive = False
        self._srv.close()


def test_redis_sink_round_trip(spark, server_wal):
    """RedisStreamChangeConsumer parity over a stdlib RESP fake: XADD per
    record onto the mapped destination stream with {key: value} fields,
    tombstones delivered as the null.value replacement (NOT skipped — unlike
    the HTTP sink), OOM replies retried per-record with backoff, dropped
    connections reconnected, offsets committed only after acks (a second run
    delivers nothing new)."""
    d = server_wal
    fake = _FakeRedis(oom_first=3, drop_first_conns=1)
    try:
        props = _base_props(d)
        props["debezium.sink.type"] = "redis"
        props["debezium.sink.redis.address"] = fake.address
        props["debezium.sink.redis.password"] = "hunter2"
        props["debezium.sink.redis.retry.initial.delay.ms"] = "10"
        props["debezium.sink.redis.retry.max.delay.ms"] = "50"
        del props["debezium.sink.file.dir"]
        server = Server(spark, props)
        assert server.run() == 0
        expected = _expected_total(spark, d)
        got = sum(len(v) for v in fake.entries.values())
        assert got == server.sink.written == expected  # tombstones included
        assert list(fake.entries) == ["repos.lake.repos"]
        assert fake.auths and fake.auths[0] == [b"hunter2"]
        # tombstone records carry the null.value replacement
        values = [v for _, v in fake.entries["repos.lake.repos"]]
        assert b"default" in values
        json.loads(  # non-tombstone values are the JSON envelope
            next(v for v in values if v != b"default").decode()
        )
        # offsets flushed: a fresh server re-delivers nothing
        n0 = got
        server2 = Server(spark, props)
        assert server2.run() == 0
        assert sum(len(v) for v in fake.entries.values()) == n0
    finally:
        fake.close()


def test_redis_sink_errors(spark):
    from debezium_spark.server import RedisSink

    with pytest.raises(ValueError, match="address"):
        RedisSink({}, lambda s: s)
    # bounded-retry deviation: a dead endpoint raises instead of spinning
    sink = RedisSink(
        {"address": "127.0.0.1:1", "retries": "2",
         "retry.initial.delay.ms": "1", "retry.max.delay.ms": "2"},
        lambda s: s,
    )

    class _Rec:
        destination, offset, key, value = "t", 1, "k", '{"a":1}'

    class _Committer:
        def mark_processed(self, r):
            pass

        def mark_batch_finished(self):
            pass

    with pytest.raises(OSError):
        sink.handle_batch([_Rec()], _Committer())


def test_http_sink_round_trip_with_retries(spark, server_wal):
    """HttpChangeConsumer parity: per-record POSTs in offset order,
    content-type by value format, 500s retried with the configured pause,
    offsets committed only after acks (resume delivers nothing new)."""
    d = server_wal
    hook = _Webhook(fail_first=2)
    try:
        props = _base_props(d)
        props["debezium.sink.type"] = "http"
        props["debezium.sink.http.url"] = hook.url
        props["debezium.sink.http.retries"] = "10"
        props["debezium.sink.http.retry.interval.ms"] = "10"
        del props["debezium.sink.file.dir"]
        server = Server(spark, props)
        assert server.run() == 0
        expected = _expected_total(spark, d)
        # null-valued tombstone records are skipped, like the reference
        bodies = [json.loads(b.decode()) for b, _ in hook.received]
        assert server.sink.written == len(bodies)
        assert len(bodies) <= expected
        assert all(ct == "application/json" for _, ct in hook.received)
        assert {"op", "source"} <= set(bodies[0])
        # strictly in-order delivery of the non-null stream (the envelope
        # carries the WAL offset in source.sequence, LSN-style)
        offs = [
            int(b["source"]["sequence"])
            for b in bodies
            if b.get("source", {}).get("sequence") is not None
        ]
        assert offs == sorted(offs)
        # resume: nothing re-delivered after a clean run
        n0 = len(hook.received)
        server2 = Server(spark, props)
        assert server2.run() == 0
        assert len(hook.received) == n0
    finally:
        hook.close()


def test_http_sink_marks_tombstones_processed(spark):
    """Null-valued (tombstone) records skip the POST but still advance the
    offset: a batch ending in tombstones must mark every record, or the
    committed offset permanently lags and restarts redeliver forever (the
    reference HttpChangeConsumer's null-guard bug — deliberately fixed
    here, see the class docstring)."""
    from debezium_spark.server import HttpSink

    hook = _Webhook()
    try:
        sink = HttpSink({"url": hook.url}, lambda s: s)

        class _Rec:
            def __init__(self, offset, value):
                self.destination, self.offset = "t", offset
                self.key, self.value = "k", value

        marked = []

        class _Committer:
            def mark_processed(self, r):
                marked.append(r.offset)

            def mark_batch_finished(self):
                marked.append("done")

        sink.handle_batch(
            [_Rec(1, '{"a":1}'), _Rec(2, None), _Rec(3, None)], _Committer()
        )
        assert marked == [1, 2, 3, "done"]  # tombstones marked, in order
        assert len(hook.received) == 1      # but never POSTed
    finally:
        hook.close()


def test_http_sink_k_sink_env_wins(spark, monkeypatch):
    """Knative SinkBinding precedence (HttpChangeConsumer.java): when K_SINK
    is set it wins over a configured 'url' sink property, so a bound
    deployment that also carries a stale url property still targets the
    binding's endpoint."""
    from debezium_spark.server import HttpSink

    monkeypatch.setenv("K_SINK", "http://binding.example:9/events")
    sink = HttpSink({"url": "http://stale.example:9/old"}, lambda s: s)
    assert sink._url == "http://binding.example:9/events"
    monkeypatch.delenv("K_SINK")
    sink2 = HttpSink({"url": "http://stale.example:9/old"}, lambda s: s)
    assert sink2._url == "http://stale.example:9/old"


def test_http_sink_errors(spark, tmpdir_path):
    from debezium_spark.server import HttpSink

    with pytest.raises(ValueError):
        HttpSink({}, lambda s: s)
    # retry budget exhausted -> raises (reference DebeziumException path)
    hook = _Webhook(fail_first=99)
    try:
        sink = HttpSink(
            {"url": hook.url, "retries": "2", "retry.interval.ms": "1"},
            lambda s: s,
        )

        class _Rec:
            destination, offset, key, value = "t", 1, "k", '{"a":1}'

        class _Committer:
            def mark_processed(self, r):
                pass

            def mark_batch_finished(self):
                pass

        with pytest.raises(RuntimeError, match="maximum number of attempts"):
            sink.handle_batch([_Rec()], _Committer())
    finally:
        hook.close()


# --------------------------------------------------- spark-submit --py-files
def test_spark_submit_pyfiles_end_to_end(spark, server_wal):
    """The SURVEY §3.3 deployment shape, for real: package the library into
    the deterministic zip, launch a SEPARATE spark-submit process whose only
    access to debezium_spark is --py-files (cwd is the scratch dir, repo
    stripped from PYTHONPATH), and check the sink + exit code."""
    d = server_wal
    from tools.build_pyfiles import build

    dist = build(os.path.join(d, "dist"))
    assert dist["n_files"] > 10
    # determinism: a second build is byte-identical
    assert build(os.path.join(d, "dist2"))["sha256"] == dist["sha256"]

    shutil.copy(os.path.join(REPO, "tools", "server_main.py"), d)
    props_path = os.path.join(d, "app.properties")
    with open(props_path, "w") as f:
        for k, v in _base_props(d).items():
            f.write(f"{k}={v}\n")

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", dist["path"],
            os.path.join(d, "server_main.py"),
            "--config", props_path,
        ],
        cwd=d,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["exit_code"] == 0 and summary["sink"] == "file"
    path = os.path.join(d, "sink", "repos.lake.repos.jsonl")
    n = len(open(path).readlines())
    assert n == summary["records_written"] == _expected_total(spark, d)
    # the offset store was flushed by the submitted job
    assert os.path.exists(os.path.join(d, "work", "_api_offsets.json"))

    # second leg, same zip: the HTTP sink through a real spark-submit — the
    # webhook lives in THIS process, the producer in the submitted one
    hook = _Webhook()
    try:
        http_props = _base_props(d)
        http_props["debezium.sink.type"] = "http"
        http_props["debezium.sink.http.url"] = hook.url
        http_props["debezium.source.work.dir"] = f"{d}/work_http"
        del http_props["debezium.sink.file.dir"]
        http_props_path = os.path.join(d, "app_http.properties")
        with open(http_props_path, "w") as f:
            for k, v in http_props.items():
                f.write(f"{k}={v}\n")
        proc2 = subprocess.run(
            [
                spark_submit,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", dist["path"],
                os.path.join(d, "server_main.py"),
                "--config", http_props_path,
            ],
            cwd=d,
            env=env,
            capture_output=True,
            text=True,
            timeout=420,
        )
        assert proc2.returncode == 0, proc2.stderr[-4000:]
        summary2 = json.loads(
            [ln for ln in proc2.stdout.splitlines() if ln.startswith("{")][-1]
        )
        assert summary2["sink"] == "http" and summary2["exit_code"] == 0
        assert len(hook.received) == summary2["records_written"] > 0
    finally:
        hook.close()

    # third leg, same zip: the Redis RESP sink through a real spark-submit —
    # the RESP fake lives in THIS process, the producer in the submitted one
    fake = _FakeRedis()
    try:
        redis_props = _base_props(d)
        redis_props["debezium.sink.type"] = "redis"
        redis_props["debezium.sink.redis.address"] = fake.address
        redis_props["debezium.source.work.dir"] = f"{d}/work_redis"
        del redis_props["debezium.sink.file.dir"]
        redis_props_path = os.path.join(d, "app_redis.properties")
        with open(redis_props_path, "w") as f:
            for k, v in redis_props.items():
                f.write(f"{k}={v}\n")
        proc3 = subprocess.run(
            [
                spark_submit,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", dist["path"],
                os.path.join(d, "server_main.py"),
                "--config", redis_props_path,
            ],
            cwd=d,
            env=env,
            capture_output=True,
            text=True,
            timeout=420,
        )
        assert proc3.returncode == 0, proc3.stderr[-4000:]
        summary3 = json.loads(
            [ln for ln in proc3.stdout.splitlines() if ln.startswith("{")][-1]
        )
        assert summary3["sink"] == "redis" and summary3["exit_code"] == 0
        got = sum(len(v) for v in fake.entries.values())
        assert got == summary3["records_written"] > 0
        assert list(fake.entries) == ["repos.lake.repos"]
    finally:
        fake.close()
