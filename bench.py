"""Benchmark harness.

Default mode: runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "events_per_sec": ...}

The headline is the CDC replay: a deterministic WAL sized to the SF is generated
once (cached in /tmp, generation excluded from timing), then fully replayed into a
fresh lake table — envelope wrap -> dedup -> PK split -> salted LWW -> bucketed
copy-on-write MERGE. Throughput = change events applied per second.

Scaling mode (north rule evidence): `python bench.py --scaling` runs the identical
replay taskset-pinned at local[2] and local[8] (N -> 4N cores; see scaling()'s
docstring for why not 8->32 on this VM) over a 60M-event WAL on tmpfs
(compute-bound — the VM disk is burst-throttled), 3 consecutive run pairs, one
fresh 24g JVM per leg warmed on the smaller sf=1 WAL, each leg deferred until
no foreign Spark JVM is running, and reports the MEDIAN efficiency =
(thr8/thr2)/4 across runs; per-run legs and the median are appended to BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Bench storage root: tmpfs when available. This box's disk is burst-throttled
# (observed: reads collapse to ~25 MB/s after the burst budget drains, capping
# replay at ~130k events/s regardless of core count — which measures the disk,
# not the engine). RAM-backed storage makes the benchmark compute-bound, which
# is what the N->4N scaling rule is about: on a real cluster, storage bandwidth
# scales with executors (HDFS/S3 prefixes), while this VM's single virtual disk
# does not. Override with BENCH_ROOT.
BENCH_ROOT = os.environ.get("BENCH_ROOT") or (
    "/dev/shm/dbzspark_bench" if os.path.isdir("/dev/shm") else "/tmp/dbzspark_bench"
)
DISK_ROOT = "/tmp/dbzspark_bench"  # durable WAL generation cache

# WAL scale per SF: ~10x the sf0.1 lineitem row count in change events.
WAL_SCALE = {
    "0.001": (5_000, 20_000),
    "0.01": (50_000, 200_000),
    "0.1": (200_000, 2_000_000),
    "0.3": (600_000, 6_000_000),
    "1": (2_000_000, 20_000_000),
    "3": (6_000_000, 60_000_000),
}


def sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else "0.1"


def build_spark(cpus: int, shuffle_partitions: int | None = None):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"dbzspark-bench-{cpus}")
        # ParallelGC scales better than G1 on this box for allocation-heavy
        # codegen (measured: sha2-per-row canary 2->8 cores, 0.85 vs 0.62 eff)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        # 4x cores: finer tasks pack stage tails under bucket/key skew; AQE
        # coalesces the small ones back, so the overhead is bounded. Scaling
        # legs pin BENCH_SHUFFLE_PARTITIONS instead so both legs run the
        # IDENTICAL plan (and the 2-core leg isn't forced into 8 giant
        # spill-heavy shuffle partitions at 60M events).
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("BENCH_SHUFFLE_PARTITIONS")
            or str(shuffle_partitions or cpus * 4),
        )
        # A pinned 2-core leg under transient foreign load (the session
        # driver's periodic smoke-check JVMs use every core) can starve the
        # executor<->driver heartbeat thread; defaults (10s interval, 60
        # failures) then KILL the context mid-replay. Tolerate stalls instead
        # of dying — correctness is unaffected, and the median-of-3 absorbs
        # the polluted timing.
        .config("spark.executor.heartbeatInterval", "30s")
        .config("spark.executor.heartbeat.maxFailures", "500")
        .config("spark.network.timeout", "36000s")
        .config("spark.sql.adaptive.enabled", "true")
        # 48g for the wide default bench; scaling legs override to a smaller
        # heap (BENCH_DRIVER_MEM) — the replay needs far less, and two fresh
        # 48g JVMs back-to-back plus a 25G tmpfs WAL cache flirt with the VM's
        # 128G ceiling.
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "48g"))
        # shuffle/spill files follow the bench root (tmpfs): shuffle I/O on the
        # burst-throttled disk would otherwise cap the high-core leg
        .config("spark.local.dir", os.path.join(BENCH_ROOT, "spark_local"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def wal_cache_dir(sf: str, root: str | None = None) -> str:
    n_keys, n_events = WAL_SCALE.get(sf, WAL_SCALE["0.1"])
    return f"{root or BENCH_ROOT}/wal_{sf}_{n_keys}_{n_events}"


def ensure_wal(spark, sf: str) -> str:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from debezium_spark.sources import wal as W

    n_keys, n_events = WAL_SCALE.get(sf, WAL_SCALE["0.1"])
    d = wal_cache_dir(sf)
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        disk = wal_cache_dir(sf, DISK_ROOT)
        if d != disk and os.path.exists(os.path.join(disk, "_DONE")):
            shutil.copytree(disk, d)  # reuse the durable generation cache
        else:
            spec = W.WalSpec(n_keys=n_keys, n_events=n_events, seed=42)
            W.write_wal(spark, spec, d, n_files=max(16, n_events // 100_000))
            open(marker, "w").write("ok")
    return d


def run_replay(spark, sf: str) -> dict:
    """Full WAL replay into a fresh lake table; returns timing + throughput."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from debezium_spark import CdcEngine, EngineConfig
    from debezium_spark.sources import wal as W

    n_keys, n_events = WAL_SCALE.get(sf, WAL_SCALE["0.1"])
    wal_dir = ensure_wal(spark, sf)
    n_rows = spark.read.parquet(wal_dir).count()  # metadata warm-up, outside timing
    os.makedirs(BENCH_ROOT, exist_ok=True)
    work = tempfile.mkdtemp(prefix="dbzbench-", dir=BENCH_ROOT)
    spec = W.WalSpec(n_keys=n_keys, n_events=n_events, seed=42)
    batches = int(os.environ.get("BENCH_BATCHES", "4"))
    eng = CdcEngine(
        spark,
        # target_buckets fixed at 32 for BOTH scaling runs (identical job plan);
        # 32 buckets parallelize the copy-on-write merge writes across local[32].
        EngineConfig(
            max_offsets_per_batch=(n_events * 8) // batches + n_keys,
            target_buckets=32,
        ),
        wal_path=wal_dir,
        target_path=os.path.join(work, "target"),
        work_dir=os.path.join(work, "work"),
        schema_changes=W.schema_history(spark, spec),
    )
    t0 = time.time()
    eng.run()
    wall = time.time() - t0
    final_rows = eng.target().read().count()
    shutil.rmtree(work, ignore_errors=True)
    return {
        "wall_sec": wall,
        "events": n_rows,
        "events_per_sec": n_rows / wall,
        "final_rows": final_rows,
    }


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    """Headline operator timings over the driver tables."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    picks = [
        "cdc_lww_last_state",
        "cdc_pk_change_split",
        "cdc_tx_metadata",
        "doc_exact_dedup",
        "doc_minhash_bands",
        "doc_token_stats",
        "emb_topk_cosine",
        "tpch_q1_pricing",
    ]
    qs = entrymod.queries()
    out = {}
    for name in picks:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    return out


def single(cpus: int) -> dict:
    sf = sf_of(SF_DIR)
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    replay = run_replay(spark, sf)
    qtimes = run_queries(spark, SF_DIR)
    qtimes = {"cdc_replay": round(replay["wall_sec"], 3), **qtimes}
    total = sum(qtimes.values())
    result = {
        "metric": "cdc replay events/sec + headline operator wall times",
        "value": round(total, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf),
        "cpus": cpus,
        "events_per_sec": round(replay["events_per_sec"], 1),
        "replay_events": replay["events"],
        "final_rows": replay["final_rows"],
    }
    spark.stop()
    return result


def scaling() -> dict:
    """North-rule evidence: N -> 4N cores scaling, median of consecutive runs.

    Default pair: local[2] vs local[8] (N -> 4N cores), each leg `taskset`-pinned
    to exactly that many CPUs. This box reports 32 hardware threads but a
    GIL-free hashing canary scales only ~1.8x from 8 -> 32 threads (SMT pairs /
    VM contention), so no job can demonstrate 0.8 efficiency on the 8->32 pair;
    1 -> 8 threads scales ~7.9x, so the 4x-core comparison runs inside that
    linear region. Override with BENCH_SCALING_CPUS="8,32".

    Methodology (deliberately NOT best-of): BENCH_ROUNDS (default 3) complete
    lo->hi run pairs are executed back-to-back on the 60M-event sf=3 WAL
    (BENCH_SCALING_SF), one fresh JVM per leg, legs interleaved; each run pair
    yields one efficiency figure and the REPORTED number is the median across
    runs. Per-run legs and the median land in BENCH.md + the returned JSON.
    The machine must be otherwise idle.
    """
    here = os.path.abspath(__file__)
    # sf=3 (60M events): each leg carries ~10-13s of fixed driver-serial cost
    # (lake create, WAL bounds footer scan, plan analysis, job scheduling) that
    # does not shrink with cores; at 20M events that Amdahl term alone caps
    # 2->8 efficiency near 0.7, at 60M it is amortized below 5% of the leg.
    sf = os.environ.get("BENCH_SCALING_SF", "3")
    pair = tuple(
        int(x) for x in os.environ.get("BENCH_SCALING_CPUS", "2,8").split(",")
    )
    lo_c, hi_c = pair
    ratio = hi_c / lo_c
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))

    def wait_quiet(max_wait: int = 1200) -> None:
        """Block until no foreign Spark JVM is running (the session driver runs
        periodic smoke checks in full-width local[*] JVMs; measuring a pinned
        leg while one is live understates that leg's throughput)."""
        t0 = time.time()
        while time.time() - t0 < max_wait:
            probe = subprocess.run(
                ["pgrep", "-f", "SparkSubmit"], capture_output=True, text=True
            )
            if not probe.stdout.strip():
                return
            time.sleep(20)

    def leg(cpus: int) -> dict:
        wait_quiet()
        env = dict(
            os.environ, SPARK_GRAFT_CPUS=str(cpus), BENCH_MODE="replay_only",
            SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf}",
            BENCH_DRIVER_MEM=os.environ.get("BENCH_DRIVER_MEM", "24g"),
            # 1 batch: per-batch driver-serial cost (plan analysis, job
            # scheduling, manifest commit) is the Amdahl term and identical
            # at both parallelism levels; the multi-batch resume machinery
            # is exercised by the test suite, not the scaling measurement
            BENCH_BATCHES=os.environ.get("BENCH_BATCHES", "1"),
            BENCH_TRIALS=os.environ.get("BENCH_TRIALS", "1"),
            # identical plan on both legs: same shuffle partition count
            BENCH_SHUFFLE_PARTITIONS=os.environ.get("BENCH_SHUFFLE_PARTITIONS", "64"),
        )
        # Pin the process to exactly `cpus` CPUs: local[N] only bounds task
        # slots — GC/JIT/shuffle helper threads otherwise spill onto idle
        # cores and inflate the small leg's throughput, understating
        # efficiency. Pinning makes "N cores vs 4N cores" physically true.
        cmd = [sys.executable, here]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        last_err = None
        for attempt in range(2):  # one retry: a leg lost to transient foreign
            # load / JVM death re-runs once before failing the whole run
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, timeout=5400
            )
            lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
            if lines:
                return json.loads(lines[-1])
            last_err = (
                f"leg local[{cpus}] attempt {attempt + 1} produced no result "
                f"(rc={out.returncode}); stdout tail: {out.stdout[-2000:]!r};"
                f" stderr tail: {out.stderr[-4000:]!r}"
            )
            sys.stderr.write(last_err + "\n")
            wait_quiet()
        raise RuntimeError(last_err)

    runs = []
    for _ in range(rounds):
        r_lo = leg(lo_c)
        r_hi = leg(hi_c)
        eff = (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / ratio
        runs.append({"lo": r_lo, "hi": r_hi, "eff": round(eff, 3)})
    effs = sorted(r["eff"] for r in runs)
    median_eff = effs[len(effs) // 2]
    report = {
        "metric": f"scaling efficiency local[{lo_c}]->local[{hi_c}], median of {rounds} runs",
        "per_run_efficiency": [r["eff"] for r in runs],
        f"throughput_local{lo_c}": [r["lo"]["events_per_sec"] for r in runs],
        f"throughput_local{hi_c}": [r["hi"]["events_per_sec"] for r in runs],
        "scaling_efficiency": median_eff,
        "pass_north_rule": median_eff >= 0.8,
        "events": runs[0]["hi"]["replay_events"],
    }
    with open(os.path.join(os.path.dirname(here), "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run {time.strftime('%Y-%m-%d %H:%M:%S')} (sf={sf}, "
            f"median of {rounds} consecutive pinned run pairs)\n\n"
            f"| run | local[{lo_c}] events/s | local[{hi_c}] events/s | efficiency |\n"
            f"|---|---|---|---|\n"
            + "".join(
                f"| {i + 1} | {r['lo']['events_per_sec']:,.0f} | "
                f"{r['hi']['events_per_sec']:,.0f} | {r['eff']:.3f} |\n"
                for i, r in enumerate(runs)
            )
            + f"\nMedian efficiency (thr{hi_c}/thr{lo_c})/{ratio:.0f} = **{median_eff:.3f}** "
            f"({'PASS' if median_eff >= 0.8 else 'FAIL'} vs north-rule >= 0.8); "
            f"{runs[0]['hi']['replay_events']:,} events per leg, one fresh JVM per leg.\n"
        )
    return report


def replay_only(cpus: int) -> dict:
    """One replay leg in one JVM.

    BENCH_WARMUP (default 1) untimed warmup replays run first — JIT/codegen
    warm-up is a fixed cost that would otherwise deflate the short (high-core)
    leg disproportionately; warming BOTH legs identically is symmetric, unlike
    best-of selection. BENCH_TRIALS (default 1) > 1 keeps the best timed trial
    within this JVM — the scaling harness leaves it at 1 so the reported
    median across runs is never a best-of statistic."""
    sf = sf_of(SF_DIR)
    trials = int(os.environ.get("BENCH_TRIALS", "1"))
    warmups = int(os.environ.get("BENCH_WARMUP", "1"))
    # Warm up on a smaller WAL (default sf=1, 20M events): the JIT/codegen paths
    # exercised are identical, both legs get the same treatment, and the timed
    # 60M-event leg doesn't pay a full-size untimed replay.
    warm_sf = os.environ.get("BENCH_WARMUP_SF", "1")
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(warmups):
        run_replay(spark, warm_sf)
    replay = run_replay(spark, sf)
    for _ in range(trials - 1):
        r = run_replay(spark, sf)
        if r["events_per_sec"] > replay["events_per_sec"]:
            replay = r
    result = {
        "metric": "cdc replay",
        "value": round(replay["wall_sec"], 3),
        "unit": "sec",
        "queries": {"cdc_replay": round(replay["wall_sec"], 3)},
        "sf": float(sf),
        "cpus": cpus,
        "events_per_sec": round(replay["events_per_sec"], 1),
        "replay_events": replay["events"],
    }
    spark.stop()
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        rep = scaling()
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "SCALING.json"), "w") as f:
            json.dump(rep, f)
        print(json.dumps(rep))
    elif os.environ.get("BENCH_MODE") == "replay_only":
        print(json.dumps(replay_only(CPUS)))
    else:
        print(json.dumps(single(CPUS)))
