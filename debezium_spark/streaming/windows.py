"""Event-time windowed metrics with watermark-bounded state.

The reference's meters (pipeline/meters/StreamingMeter.java, pipeline/metrics/)
publish processing-time counters from driver-side state. The Spark-native form
is richer: EVENT-time tumbling-window aggregation over the change stream, with
a watermark so state is bounded and late events have defined semantics —
counted while inside the allowed lateness, dropped (not wrongly re-opened)
once the window is finalized. The same column algebra runs in batch (backfill
over the full log) and streaming (live meters), which is how Spark wants
lambda-free metrics built.

Scale notes: a tumbling-window groupBy is one shuffle keyed on
(window, group-cols) with map-side partial aggregation; watermark eviction
keeps streaming state at O(windows-in-flight x groups), independent of stream
length. Fixed-point value sums (integer units) keep the outputs bit-identical
across engines and summation orders — float accumulation order is
partition-dependent, so a DOUBLE sum can't be an exactly-checked metric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NTZ_EPOCH = "1970-01-01 00:00:00"


def epoch_us(col: Column | str) -> Column:
    """Session-timezone-INDEPENDENT epoch microseconds of a TIMESTAMP_NTZ
    column: wall-clock arithmetic against the NTZ epoch origin
    (``timestamp_diff`` between two NTZ values never consults the session
    timezone). The tempting ``cast('timestamp')`` hop interprets the NTZ
    wall time in the driver session's timezone and silently shifts every
    epoch by the UTC offset on a non-UTC driver — the exact bug class
    behind the r03 red gate row. Use THIS for every NTZ→epoch conversion."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND", F.lit(_NTZ_EPOCH).cast("timestamp_ntz"), c
    )


def epoch_seconds(col: Column | str) -> Column:
    """Session-timezone-independent epoch seconds of a TIMESTAMP_NTZ,
    FLOORED — '1969-12-31 23:59:59.5' is second -1, matching SQL epoch()
    semantics and what the old cast-to-long path produced. A bare
    ``timestamp_diff SECOND`` truncates toward zero and would collapse
    pre-1970 fractional seconds into second 0 (the exact bucket-collapse
    retention_cohorts documents guarding against). Exact integer
    arithmetic: subtract the pmod'd microsecond remainder, then the
    division is of an exact multiple (DECIMAL, no float)."""
    us = epoch_us(col)
    whole = (us - F.pmod(us, F.lit(1_000_000))).cast("decimal(38,0)")
    return (whole / F.lit(1_000_000)).cast("long")


def ntz_from_us(col: Column | str) -> Column:
    """Inverse of :func:`epoch_us`: epoch microseconds (BIGINT) back to a
    TIMESTAMP_NTZ wall value, session-tz-independently. The tempting
    ``F.timestamp_micros`` returns a session-zoned TIMESTAMP, which shifts
    on any non-UTC driver when compared/joined against NTZ columns."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add(
        "MICROSECOND", c, F.lit(_NTZ_EPOCH).cast("timestamp_ntz")
    )


def windowed_event_metrics(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    value_col: str | None = None,
    value_unit: int = 10000,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window event metrics: count (+ exact fixed-point value sum)
    per (window, *group_cols).

    Batch: leave ``watermark`` None — a plain windowed groupBy, useful for
    metric backfills over the historical log. Streaming: pass a watermark
    delay (e.g. ``"2 hours"``) — events later than the delay behind the
    observed max event time are dropped, windows finalize (append-mode
    emittable) once the watermark passes their end, and aggregation state is
    evicted — bounded regardless of stream length.

    ``value_col`` (optional, DOUBLE) is summed exactly as
    ``floor(v * value_unit + 0.5)`` BIGINT fixed-point — portable across
    engines and independent of partition summation order.
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        cents = F.floor(F.col(value_col) * value_unit + F.lit(0.5)).cast("long")
        aggs.append(F.sum(cents).alias("sum_value_fp"))
    out = df.groupBy(F.window(F.col(ts_col), window).alias("w"), *group_cols).agg(
        *aggs
    )
    return out.select(
        F.col("w.start").alias("window_start"), *group_cols, *[
            F.col(a) for a in (["n_events", "sum_value_fp"] if value_col else ["n_events"])
        ]
    )


def dedup_by_offset_within_watermark(
    stream: DataFrame,
    *,
    offset_col: str = "offset",
    ts_col: str = "ts_ms",
    delay: str = "10 minutes",
) -> DataFrame:
    """Continuous-mode dedup-by-offset with BOUNDED state (S8's
    `PostgresStreamingChangeEventSource.searchWalPosition` skip-replayed-LSNs
    semantics, restated for an unbounded stream).

    `dropDuplicates([offset])` on a stream retains every offset ever seen —
    state grows with the log and a 10^10-event replay OOMs the state store.
    `dropDuplicatesWithinWatermark` keeps an offset only until the watermark
    passes its event time + delay: re-deliveries (source retries, file
    re-listing, at-least-once upstreams) land within the delay window in
    practice, so duplicates are still dropped while state stays
    O(events-per-delay-window). Events older than the watermark are dropped
    by the watermark itself — exactly the replay-skip contract.

    ``ts_ms`` BIGINT epoch-millis columns are accepted and converted; a
    TIMESTAMP ``ts_col`` is used as-is.
    """
    df = stream
    dt = dict(df.dtypes).get(ts_col)
    tcol = "_wm_ts"
    if dt in ("bigint", "int", "long"):
        df = df.withColumn(tcol, F.timestamp_millis(F.col(ts_col)))
    else:
        df = df.withColumn(tcol, F.col(ts_col))
    out = df.withWatermark(tcol, delay).dropDuplicatesWithinWatermark([offset_col])
    return out.drop(tcol)


def sessionize(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: group each key's events into maximal runs where
    consecutive gaps are <= ``gap`` (Spark's `session_window` — a session
    spans [first, last + gap], and an event starting exactly at a session's
    current end still merges; only a STRICTLY larger gap opens a new
    session — pinned in tests/test_windows.py).

    Batch: the historical sessionization backfill. Streaming: pass
    ``watermark`` — Spark merges the growing session in state and emits it
    (append mode) once the watermark passes session end + gap, so state is
    bounded by open sessions only.

    Output: one row per (key, session): ``session_start_us`` /
    ``session_end_us`` (exact integer epoch-microseconds of the first/last
    event — interval arithmetic in microseconds is engine-portable where
    float seconds are not) and ``n_events``.

    Scale: one shuffle keyed on (session_window, *keys) with partial
    map-side aggregation; per-key session merging never needs a global sort
    — skewed users cost one hot reduce key, not a repartition of the world.
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    out = (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), *key_cols)
        .agg(
            F.min(ts_col).alias("_first"),
            F.max(ts_col).alias("_last"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            *key_cols,
            epoch_us(F.col("_first")).alias("session_start_us"),
            epoch_us(F.col("_last")).alias("session_end_us"),
            "n_events",
        )
    )
    return out


def funnel(
    df: DataFrame,
    steps: tuple[str, ...],
    *,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each key, walk the event stream through
    the ordered ``steps`` sequence — step i completes at the EARLIEST event
    of type ``steps[i]`` that is STRICTLY after step i-1's completion time
    (first-touch attribution, the standard product-analytics funnel).

    Declarative single-exchange plan: step times are chained unbounded
    MIN-window aggregates all partitioned by ``key_cols`` — Catalyst plans
    ONE hash exchange (+ one sort) and evaluates every layer on the same
    partitioning (no per-step shuffle, no self-joins), then a final same-key
    groupBy collapses to one row per key without re-exchanging. Skewed keys
    cost a hot partition of that key's events only — never a global sort.

    Output: one row per key that entered the funnel (completed step 1):
    ``*key_cols``, ``reached`` (1..len(steps)), and ``step{i}_us`` exact
    epoch-microsecond completion times (null beyond ``reached``) — integer
    timestamps keep the frame engine-portable for exact oracle comparison.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols)
    ts = F.col(ts_col)
    cur = df.withColumn(
        "_t1", F.min(F.when(F.col(type_col) == steps[0], ts)).over(w)
    )
    for i, s in enumerate(steps[1:], start=2):
        prev = F.col(f"_t{i - 1}")
        cur = cur.withColumn(
            f"_t{i}",
            F.min(
                F.when((F.col(type_col) == s) & (ts > prev) & prev.isNotNull(), ts)
            ).over(w),
        )
    tcols = [f"_t{i}" for i in range(1, len(steps) + 1)]
    per_key = cur.groupBy(*key_cols).agg(
        *[F.min(c).alias(c) for c in tcols]
    )
    reached = F.coalesce(
        *[
            F.when(F.col(f"_t{i}").isNotNull(), F.lit(i))
            for i in range(len(steps), 0, -1)
        ],
        F.lit(0),
    )
    return per_key.where(F.col("_t1").isNotNull()).select(
        *key_cols,
        reached.cast("int").alias("reached"),
        *[
            epoch_us(F.col(c)).alias(f"step{i}_us")
            for i, c in enumerate(tcols, start=1)
        ],
    )


def funnel_counts(
    df: DataFrame,
    steps: tuple[str, ...],
    *,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion report over :func:`funnel`: one row per step with
    the count of keys that reached at least that step. The per-key frame
    never leaves the cluster — the report is a ``len(steps)``-row aggregate
    (explode the reached prefix, groupBy step), so the driver sees only the
    summary regardless of corpus size.

    Output: (step 1-based, step_name, n_keys), every step present even at 0.
    """
    per_key = funnel(
        df, steps, ts_col=ts_col, key_cols=key_cols, type_col=type_col
    )
    hit = per_key.select(
        F.explode(F.sequence(F.lit(1), F.col("reached"))).alias("step")
    ).groupBy("step").agg(F.count(F.lit(1)).alias("n_keys"))
    names = F.create_map(
        *[x for i, s in enumerate(steps, 1) for x in (F.lit(i), F.lit(s))]
    )
    all_steps = df.sparkSession.range(1, len(steps) + 1).select(
        F.col("id").cast("int").alias("step")
    )
    return (
        all_steps.join(hit, "step", "left")
        .select(
            "step",
            names[F.col("step")].alias("step_name"),
            F.coalesce("n_keys", F.lit(0)).alias("n_keys"),
        )
    )


def retention_cohorts(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    period_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention: bucket each key by the period of its FIRST event
    (the cohort), then count distinct keys active in each later period —
    the (cohort, offset) retention triangle every product-analytics stack
    computes over the event stream.

    Period indexing is exact integer arithmetic (``floor(epoch_seconds /
    period)``) — engine-portable, no calendar/timezone functions whose week
    conventions differ across engines.

    Scale shape: one map-side-combined groupBy per aggregate — (key) for
    cohorts, (key, period) for activity — then a key-partitioned join and a
    final (cohort, offset) count. Every shuffle carries (key, int) pairs,
    never events; the distinct-active collapse happens BEFORE the join, so
    a chatty key costs one row per period, not one per event.

    Output: (cohort_period, period_offset, n_keys), offsets >= 0, including
    offset 0 (the cohort's own size at birth period).
    """
    base = df.select(
        *key_cols,
        # true floor (F.floor), not cast-truncation toward zero — pre-1970
        # timestamps must bucket to negative periods, not collapse into 0
        F.floor(
            epoch_seconds(F.col(ts_col)) / period_seconds
        ).cast("long").alias("_p"),
    )
    cohorts = base.groupBy(*key_cols).agg(F.min("_p").alias("cohort_period"))
    active = base.select(*key_cols, "_p").distinct()
    joined = active.join(cohorts, list(key_cols))
    return (
        joined.where(F.col("_p") >= F.col("cohort_period"))
        .groupBy(
            "cohort_period",
            (F.col("_p") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def zscore_outliers(
    df: DataFrame,
    *,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    k: int = 3,
    value_unit: int = 10000,
) -> DataFrame:
    """Per-group z-score outlier flags with EXACT integer arithmetic — the
    stream-quality / metrics-anomaly check, engine-portable where the
    textbook float mean/std pipeline is not (float accumulation order is
    partition-dependent, so a naive stddev flag can flip at the boundary
    between runs or engines).

    The test |x - mean| > k*std is evaluated with no division, no sqrt and
    no float: with fixed-point values v = floor(x*unit + 0.5) and per-group
    S = sum(v), SS = sum(v^2), n — multiply through by n^2:

        (n*v - S)^2  >  k^2 * (n*SS - S^2)

    Both sides are exact integers (DECIMAL(38,0)), so the boundary is
    bit-identical in any engine. Population variance (the /n form),
    matching the oracle. Because the whole test is SHIFT-INVARIANT, values
    are anchored to the per-group MINIMUM before aggregation — the decimal
    products then scale with n^2 * spread^2 (spread = max-min in fixed-point
    units), not n^2 * |value|^2: safe while n * spread < 10^19 (e.g. 10^10
    rows with a value spread of ~3*10^4 at the default unit). For
    wider-spread metrics lower ``value_unit`` — the flags only quantize at
    the unit, they never drift.

    Scale: two map-side-combined groupBys (per-group min anchor, then the
    shifted (n, S', SS') stats) — both GROUP-COLS-sized frames broadcast
    back over the stream; the flag itself is per-row column algebra.
    Output: input columns + ``value_fp`` + ``is_outlier``.
    """
    v = F.floor(F.col(value_col) * value_unit + F.lit(0.5)).cast("long")
    mins = (
        df.select(*group_cols, v.alias("_v0"))
        .groupBy(*group_cols)
        .agg(F.min("_v0").alias("_minv"))
    )
    anchored = df.withColumn("_v0", v).join(
        F.broadcast(mins), list(group_cols)
    ).withColumn("_v", (F.col("_v0") - F.col("_minv")).cast("decimal(38,0)"))
    stats = (
        anchored.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
            F.sum("_v").cast("decimal(38,0)").alias("_s"),
            F.sum(F.col("_v") * F.col("_v")).cast("decimal(38,0)").alias("_ss"),
        )
    )
    j = anchored.join(F.broadcast(stats), list(group_cols))
    lhs = (F.col("_n") * F.col("_v") - F.col("_s"))
    rhs = (
        F.lit(int(k * k)).cast("decimal(38,0)")
        * (F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s"))
    )
    return (
        j.withColumn("value_fp", F.col("_v0"))
        .withColumn("is_outlier", (lhs * lhs) > rhs)
        .drop("_v", "_v0", "_minv", "_n", "_s", "_ss")
    )


def quantile_profile(
    df: DataFrame,
    value_col: str,
    *,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    group_cols: tuple[str, ...] = (),
    scale: int = 10**6,
) -> DataFrame:
    """Exact per-group quantile profile: (group_cols..., q, value_ppm).

    Uses Spark's EXACT ``percentile`` aggregate (linear interpolation at
    rank ``(n-1)*q`` — the same definition as DuckDB's ``quantile_cont`` and
    NumPy's default, so results are engine-portable; the single interpolated
    double is quantized to ppm once per group x quantile). One
    map-side-combined aggregation: the partial buffer holds per-group
    DISTINCT values with counts, so memory is O(distinct values per group)
    — exact and cheap for bounded-cardinality measures (token counts,
    quality scores, sizes in bytes); for genuinely unbounded continuous
    values at 10^10 rows switch to ``approx_percentile`` (GK sketch,
    fixed-size buffer, rank error <= 1/accuracy) and drop the oracle claim.

    All requested quantiles compute from ONE shared buffer (percentile takes
    the array), then explode to rows — never one aggregation per quantile.
    """
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    qarr = F.array(*[F.lit(float(q)) for q in quantiles])
    agg = df.groupBy(*group_cols).agg(
        F.percentile(F.col(value_col).cast("double"), qarr).alias("_vals")
    )
    pairs = F.arrays_zip(
        qarr.alias("q"), F.col("_vals").alias("v")
    )
    return agg.select(
        *group_cols, F.explode(pairs).alias("_p")
    ).select(
        *group_cols,
        F.col("_p.q").alias("q"),
        F.floor(F.col("_p.v") * scale + F.lit(0.5)).cast("long").alias("value_ppm"),
    )


def rolling_metrics(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    trailing_seconds: int = 3600,
    value_scale: int = 100,
) -> DataFrame:
    """Per-key trailing-window metrics over event time: for every event, the
    count and sum of that key's events in ``[ts - trailing_seconds, ts]`` —
    the sliding "activity in the last hour" feature that tumbling windows
    (windowed_event_metrics) cannot express because every event anchors its
    own window.

    Physical shape: ONE key-partitioned RANGE window over microsecond event
    time serves both aggregates — a single hash exchange on the key plus an
    in-partition sort, state bounded by each key's events inside the
    trailing range. Events tied on the same (key, ts) are RANGE-frame peers
    and share identical outputs in any engine (no arbitrary tie order leaks
    into results). Values sum as scaled BIGINTs (``floor(v*scale + 0.5)``)
    — float accumulation order is partition-dependent, integer sums are
    exact and engine-portable. Hot keys: a rolling window cannot be salted
    (every event needs its key's full trailing range); when one key's
    events at this granularity overflow a task, coarsen per-(key, bucket)
    partial sums first (tumbling pre-aggregation at, say, 1s grain) and
    roll over the bucket series instead.

    Output: input columns + rolling_n (BIGINT), rolling_sum_scaled (BIGINT).
    """
    from pyspark.sql import Window

    us = epoch_us(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-trailing_seconds * 1_000_000, 0)
    )
    scaled = F.floor(
        F.col(value_col).cast("double") * value_scale + F.lit(0.5)
    ).cast("long")
    return events.withColumn(
        "rolling_n", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn("rolling_sum_scaled", F.sum(scaled).over(w).cast("long"))


def transition_matrix(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    p_scale: int = 10**6,
) -> DataFrame:
    """First-order Markov transition matrix of per-key event sequences:
    ``(from_type, to_type, n, p_ppm)`` — the user-journey model behind
    next-step prediction, funnel design, and bot detection (bots have
    near-degenerate rows).

    Each key's events are ordered by ``(ts, id)`` — the id tiebreak makes
    simultaneous events deterministically ordered, so the pair counts are
    engine-portable — and consecutive pairs count into the matrix.
    ``p_ppm = (n * p_scale) DIV n_from`` is the exact integer-division
    row-normalized probability (order-independent, no float).

    Physical shape: ONE key-hash exchange + in-partition sort feeds the lag
    window (partitions bounded by per-key event counts), then the pair
    count is a map-side-combined groupBy on (from, to) — a frame bounded by
    |type vocabulary|², tiny by construction. The row-sum join back is over
    that same tiny frame. Hot keys: a single user's events must sort in one
    task; at 10^10-events-per-key granularity, pre-bucket each key by
    session (sessionize) and model transitions within sessions.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(F.col(type_col)).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        pairs.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.expr(f"(n * {p_scale}) div n_from").cast("long").alias("p_ppm"),
        )
    )


def windowed_topk(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_duration: str = "1 hour",
    k: int = 3,
) -> DataFrame:
    """Trending items per tumbling event-time window: top-``k`` types by
    count with rank, ties by type name — the "what's hot this hour" feed.
    One map-side-combined count shuffle keyed on (window, type), then a
    rank window partitioned BY WINDOW (bounded at |type vocabulary| rows
    per partition — never a global sort). The same algebra streams with a
    watermark: counts finalize per window exactly like
    windowed_event_metrics.

    Output: (window_start_us, window_end_us, type, n, rank), rank 1..k.
    """
    from pyspark.sql import Window

    w = F.window(F.col(ts_col), window_duration)
    counts = events.groupBy(
        w.alias("_w"), F.col(type_col).alias("type")
    ).agg(F.count(F.lit(1)).alias("n"))
    rank_w = Window.partitionBy("_w").orderBy(F.desc("n"), F.asc("type"))
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select(
            # windows over TIMESTAMP_NTZ columns keep NTZ bounds; convert
            # with the session-tz-independent wall-clock epoch
            epoch_us(F.col("_w.start")).alias("window_start_us"),
            epoch_us(F.col("_w.end")).alias("window_end_us"),
            "type",
            F.col("n").cast("long").alias("n"),
            "rank",
        )
    )


def value_histogram(
    events: DataFrame,
    *,
    value_col: str = "value",
    group_cols: tuple[str, ...] = (),
    bin_width: float = 10.0,
    value_scale: int = 100,
) -> DataFrame:
    """Exact fixed-width histogram per group: values quantize to scaled
    BIGINTs (``floor(v*scale + 0.5)``), the bin index is TRUNCATING integer
    division by the scaled bin width (the SQL DIV convention both engines
    share), and counts are one map-side-combined shuffle bounded by
    |groups| x |occupied bins|. The distribution profile every
    curation/monitoring pipeline wants, with none of the float-boundary
    ambiguity (a value can never land in two bins on two engines).

    Output: (group_cols..., bin, bin_lo_fp, n) where bin_lo_fp = bin *
    scaled width (the bin's inclusive lower edge for non-negative bins,
    in fixed-point units).
    """
    w_fp = int(round(bin_width * value_scale))
    if w_fp < 1:
        raise ValueError("bin_width * value_scale must be >= 1")
    vfp = F.floor(F.col(value_col).cast("double") * value_scale + F.lit(0.5)).cast(
        "long"
    )
    binned = events.select(*group_cols, vfp.alias("_vfp"))
    return (
        binned.select(*group_cols, F.expr(f"_vfp div {w_fp}").alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *group_cols,
            F.col("bin").cast("long").alias("bin"),
            (F.col("bin") * w_fp).cast("long").alias("bin_lo_fp"),
            F.col("n").cast("long").alias("n"),
        )
    )
