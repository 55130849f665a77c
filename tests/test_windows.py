"""Event-time windowed metrics + watermark semantics (streaming/windows.py).

Covers the three contracts that only show up under a real streaming run:
append-mode windows finalize exactly when the watermark passes their end,
late-but-in-watermark events are counted while too-late events are dropped
(no duplicate window emission), and dropDuplicatesWithinWatermark gives
dedup-by-offset with bounded state. Watermark progress is persisted in the
checkpoint, so the tests drive two availableNow phases with a query restart
between them — the deterministic way to observe watermark advancement
(within one availableNow run the file order is not guaranteed)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from debezium_spark.streaming.windows import (
    dedup_by_offset_within_watermark,
    windowed_event_metrics,
)
from tests.conftest import SF_DIR

EVT_SCHEMA = "ts timestamp, event_type string, value double"


def _write(spark, path, rows):
    df = spark.createDataFrame(
        rows, "ts string, event_type string, value double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    df.coalesce(1).write.mode("append").parquet(path)


def _run_phase(spark, src, out, ckpt):
    stream = spark.readStream.schema(EVT_SCHEMA).parquet(src)
    m = windowed_event_metrics(
        stream, ts_col="ts", group_cols=("event_type",), window="1 hour",
        value_col="value", watermark="1 hour",
    )
    q = (
        m.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_windowed_metrics_finalize_and_late_events(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    out = os.path.join(tmpdir_path, "out")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    T = "2024-01-01 {}:00"
    # phase 1: two events in w0, one in w1, max-ts anchor in w3
    _write(spark, src, [
        (f"2024-01-01 00:10:00", "a", 1.25),
        (f"2024-01-01 00:40:00", "a", 2.25),
        (f"2024-01-01 01:20:00", "b", 4.00),
        (f"2024-01-01 03:00:00", "a", 8.00),
    ])
    _run_phase(spark, src, out, ckpt)
    got1 = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value_fp"])
        for r in spark.read.parquet(out).collect()
    }
    # watermark after phase 1 = 03:00 - 1h = 02:00 -> only w0/w1 finalized
    assert got1 == {
        ("2024-01-01 00:00:00", "a"): (2, 35000),
        ("2024-01-01 01:00:00", "b"): (1, 40000),
    }
    # phase 2: late-but-allowed event lands in the open w2; too-late event
    # (00:30, behind the 02:00 watermark) is dropped; 05:00 advances the
    # watermark to 04:00, finalizing w2 (with the late event) and w3
    _write(spark, src, [
        ("2024-01-01 02:30:00", "b", 0.50),
        ("2024-01-01 00:30:00", "a", 100.0),
        ("2024-01-01 05:00:00", "a", 16.0),
    ])
    _run_phase(spark, src, out, ckpt)
    got2 = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value_fp"])
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == {
        ("2024-01-01 00:00:00", "a"): (2, 35000),  # NOT re-emitted/doubled
        ("2024-01-01 01:00:00", "b"): (1, 40000),
        ("2024-01-01 02:00:00", "b"): (1, 5000),   # late event counted
        ("2024-01-01 03:00:00", "a"): (1, 80000),
    }
    # w5 (05:00) stays open — append mode only emits finalized windows
    assert ("2024-01-01 05:00:00", "a") not in got2


def test_windowed_metrics_batch_mode(spark):
    """Same column algebra in batch (metric backfill): exact fixed-point sums
    over the sf0.001 events table, cross-checked against a pandas reduction."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = windowed_event_metrics(
        ev, ts_col="ts", group_cols=("event_type",), window="24 hours",
        value_col="value",
    )
    pdf = ev.select("ts", "event_type", "value").toPandas()
    pdf["day"] = pdf["ts"].dt.floor("24h")
    pdf["fp"] = (pdf["value"] * 10000 + 0.5).apply(int)  # floor for v >= 0
    want = pdf.groupby(["day", "event_type"]).agg(
        n=("fp", "size"), s=("fp", "sum")
    )
    gmap = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_fp"])
        for r in got.collect()
    }
    assert len(gmap) == len(want)
    for (day, et), row in want.iterrows():
        assert gmap[(day.to_pydatetime(), et)] == (row["n"], row["s"])


def test_dedup_by_offset_within_watermark(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    out = os.path.join(tmpdir_path, "out")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    schema = "offset long, ts_ms long, payload string"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        deduped = dedup_by_offset_within_watermark(
            stream, offset_col="offset", ts_col="ts_ms", delay="10 minutes"
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    t0 = 1_700_000_000_000
    # phase 1: offsets 1,2,3 with 3 duplicated inside the batch
    write([
        (1, t0 + 1_000, "a"),
        (2, t0 + 2_000, "b"),
        (3, t0 + 3_000, "c"),
        (3, t0 + 3_000, "c-dup"),
    ])
    run()
    first = sorted(
        (r["offset"], r["payload"]) for r in spark.read.parquet(out).collect()
    )
    assert [o for o, _ in first] == [1, 2, 3]
    # phase 2: offset 2 re-delivered within the 10-minute delay -> dropped by
    # dedup state; new offset 4 passes
    write([
        (2, t0 + 4_000, "b-redelivery"),
        (4, t0 + 5_000, "d"),
    ])
    run()
    offsets = sorted(r["offset"] for r in spark.read.parquet(out).collect())
    assert offsets == [1, 2, 3, 4]
    payloads = {r["payload"] for r in spark.read.parquet(out).collect()}
    assert "b-redelivery" not in payloads and "c-dup" not in payloads


def test_sessionize_batch_gap_boundary(spark):
    from debezium_spark.streaming.windows import sessionize

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:10:00"),
            (1, "2024-01-01 00:39:59"),  # 29:59 after prev -> same session
            (1, "2024-01-01 01:09:59"),  # exactly 30:00 after -> still MERGES
            (1, "2024-01-01 01:40:00"),  # 30:01 after -> NEW session
            (2, "2024-01-01 00:00:00"),
        ],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    out = sessionize(df, ts_col="ts", key_cols=("user_id",), gap="30 minutes")
    got = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in out.collect()
    )
    base = 1704067200_000000  # 2024-01-01 00:00:00 UTC in micros
    m = 60_000_000
    assert got == [
        (1, base, base + 69 * m + 59_000_000, 4),
        (1, base + 100 * m, base + 100 * m, 1),
        (2, base, base, 1),
    ]


def test_sessionize_streaming_finalizes_on_watermark(spark, tmpdir_path):
    from debezium_spark.streaming.windows import sessionize

    src = os.path.join(tmpdir_path, "src")
    out = os.path.join(tmpdir_path, "out")
    ckpt = os.path.join(tmpdir_path, "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
        s = sessionize(
            stream, ts_col="ts", key_cols=("user_id",), gap="30 minutes",
            watermark="1 hour",
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # phase 1: one closed session (3 events) + an open anchor at 03:00
    write([
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 00:20:00"),
        (1, "2024-01-01 03:00:00"),
    ])
    run()
    got1 = sorted(
        (r["session_start_us"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    )
    base = 1704067200_000000
    m = 60_000_000
    # watermark 03:00-1h = 02:00 > session end 00:20 + 30min gap -> finalized
    assert got1 == [(base, 3)]
    # phase 2: 03:05 merges into the open session; 06:00 advances the
    # watermark to 05:00, finalizing {03:00, 03:05}; a too-late 00:15 event
    # (behind the 02:00 watermark) must NOT resurrect the emitted session
    write([
        (1, "2024-01-01 03:05:00"),
        (1, "2024-01-01 00:15:00"),
        (1, "2024-01-01 06:00:00"),
    ])
    run()
    got2 = sorted(
        (r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    )
    assert got2 == [
        (base, base + 20 * m, 3),
        (base + 180 * m, base + 185 * m, 2),
    ]


def test_funnel_strictly_after_chaining(spark):
    from datetime import datetime

    from debezium_spark.streaming.windows import funnel, funnel_counts

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # u1 completes the whole funnel in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: click BEFORE its first view -> click must not count; later
        # click after view does, but purchase precedes that click -> reached 2
        (2, t(1), "click"), (2, t(2), "view"), (2, t(3), "purchase"),
        (2, t(4), "click"),
        # u3: view only
        (3, t(1), "view"), (3, t(2), "error"),
        # u4: never enters the funnel (no view) -> excluded entirely
        (4, t(1), "click"), (4, t(2), "purchase"),
        # u5: simultaneous view+click (strictly-after excludes the tie)
        (5, t(1), "view"), (5, t(1), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_type string")
    got = {
        r["user_id"]: (r["reached"], r["step1_us"], r["step2_us"], r["step3_us"])
        for r in funnel(
            df, ("view", "click", "purchase"), key_cols=("user_id",)
        ).collect()
    }
    assert set(got) == {1, 2, 3, 5}
    us = lambda s: int(datetime(2024, 1, 1, 0, 0, s).timestamp() * 1_000_000)
    assert got[1] == (3, us(1), us(2), us(3))
    assert got[2] == (2, us(2), us(4), None)
    assert got[3] == (1, us(1), None, None)
    assert got[5] == (1, us(1), None, None)  # tie is not strictly after

    counts = {
        r["step"]: (r["step_name"], r["n_keys"])
        for r in funnel_counts(
            df, ("view", "click", "purchase"), key_cols=("user_id",)
        ).collect()
    }
    assert counts == {1: ("view", 4), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_single_exchange_plan(spark):
    """The chained step windows + same-key collapse must cost ONE hash
    exchange on the key, not one per step."""
    from datetime import datetime

    from debezium_spark.streaming.windows import funnel

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "view")],
        "user_id int, ts timestamp, event_type string",
    )
    plan = funnel(
        df, ("view", "click", "purchase"), key_cols=("user_id",)
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") <= 1


def test_retention_cohorts_triangle(spark):
    from datetime import datetime, timedelta

    from debezium_spark.streaming.windows import retention_cohorts

    day = timedelta(days=1)
    # epoch day 0-based periods; u1 born day 0 active days 0,1,3; u2 born
    # day 1 active days 1,2; u3 born day 0, one event only
    base = datetime(1970, 1, 5)  # day 4 since epoch
    rows = [
        (1, base), (1, base + day), (1, base + 3 * day), (1, base),  # dup same day
        (2, base + day), (2, base + 2 * day),
        (3, base),
    ]
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_keys"]
        for r in retention_cohorts(
            spark.createDataFrame(rows, "user_id long, ts timestamp"),
            period_seconds=86_400,
        ).collect()
    }
    assert got == {
        (4, 0): 2,  # u1, u3 born day 4
        (4, 1): 1,  # u1 back next day (same-day dup counted once)
        (4, 3): 1,  # u1 day 7
        (5, 0): 1,  # u2 born day 5
        (5, 1): 1,  # u2 day 6
    }


def test_pmi_bigrams_promotes_collocation(spark):
    from debezium_spark.functions.text import pmi_bigrams

    # "new york" always co-occurs; "the cat/dog/sun..." disperses 'the'
    docs = spark.createDataFrame(
        [
            (1, "new york is big and the cat sleeps"),
            (2, "new york is old and the dog runs"),
            (3, "new york is far and the sun sets"),
            (4, "the rain falls on the new york the"),
        ],
        "doc_id long, text string",
    )
    top = pmi_bigrams(docs, min_count=3, k=5).collect()
    assert top[0]["bigram"] == "new york"
    assert top[0]["n_pair"] == 4 and top[0]["n_left"] == 4
    # PMI of a perfect collocation = ln(N / c) > any dispersed pair
    assert all(top[0]["pmi_ppm"] >= r["pmi_ppm"] for r in top)
    # min_count floors hapax bigrams out entirely
    assert all(r["n_pair"] >= 3 for r in top)


def test_zscore_outliers_exact_boundary(spark):
    from debezium_spark.streaming.windows import zscore_outliers

    # group 'a': values 0 repeated with one spike; group 'b': constant
    rows = [(i, "a", 0.0) for i in range(20)] + [
        (100, "a", 100.0),
        (200, "b", 5.0), (201, "b", 5.0), (202, "b", 5.0),
    ]
    got = {
        r["event_id"]: r["is_outlier"]
        for r in zscore_outliers(
            spark.createDataFrame(rows, "event_id long, event_type string, value double"),
            value_col="value",
            group_cols=("event_type",),
            k=3,
        ).collect()
    }
    assert got[100] is True                       # the spike
    assert all(got[i] is False for i in range(20))  # the bulk
    # zero-variance group: nothing can exceed 3 std = 0 strictly
    assert got[200] is False and got[201] is False and got[202] is False

    # exact boundary: symmetric two-point group has |x-mean| = std exactly;
    # with k=1 the strict > test must NOT flag either point
    two = spark.createDataFrame(
        [(1, "g", 0.0), (2, "g", 2.0)], "event_id long, event_type string, value double"
    )
    res = {
        r["event_id"]: r["is_outlier"]
        for r in zscore_outliers(
            two, value_col="value", group_cols=("event_type",), k=1
        ).collect()
    }
    assert res == {1: False, 2: False}


def test_retention_pre_epoch_floor(spark):
    from datetime import datetime

    from debezium_spark.streaming.windows import retention_cohorts

    rows = [
        (1, datetime(1969, 12, 25)),  # negative epoch -> period -1 (floor)
        (1, datetime(1970, 1, 2)),    # period 0
    ]
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_keys"]
        for r in retention_cohorts(
            spark.createDataFrame(rows, "user_id long, ts timestamp"),
            period_seconds=604_800,
        ).collect()
    }
    assert got == {(-1, 0): 1, (-1, 1): 1}


def test_zscore_anchor_shift_invariance(spark):
    """Anchoring to the group min must not change any flag: huge absolute
    values with a small spread stay exact (the decimal budget scales with
    spread, not |value|)."""
    from debezium_spark.streaming.windows import zscore_outliers

    base = 1.0e8  # 1e12 fixed-point units at the default unit
    rows = [(i, "g", base) for i in range(30)] + [(99, "g", base + 50.0)]
    got = {
        r["event_id"]: r["is_outlier"]
        for r in zscore_outliers(
            spark.createDataFrame(rows, "event_id long, event_type string, value double"),
            value_col="value",
            group_cols=("event_type",),
            k=3,
        ).collect()
    }
    assert got[99] is True
    assert all(got[i] is False for i in range(30))
    assert None not in got.values()  # overflow would null the flag
