"""Value converters: Debezium's decimal / temporal handling modes as column algebra.

Reference surface (jdbc/JdbcValueConverters.java:73-136 + io.debezium.time.*):

  * decimal.handling.mode (RelationalDatabaseConnectorConfig.DecimalHandlingMode)
      - precise -> decimal logical type (here: Spark DecimalType)
      - double  -> lossy double
      - string  -> exact decimal string
  * time.precision.mode (TemporalPrecisionMode)
      - adaptive / adaptive_time_microseconds -> the source's precision:
        Date -> epoch DAYS (io.debezium.time.Date, int32),
        Timestamp -> epoch MICROseconds (io.debezium.time.MicroTimestamp)
      - connect -> Kafka Connect logical types: Timestamp = epoch MILLIseconds
        (org.apache.kafka.connect.data.Timestamp), Date = epoch days
  * ZonedTimestamp -> ISO-8601 UTC string (io.debezium.time.ZonedTimestamp)
  * the rest of the io.debezium.time.* family: Time / MicroTime / NanoTime
    (past-midnight int), NanoTimestamp, Year, ZonedTime, Interval
    (ISO-8601 period string), MicroDuration (approximate micros)

Everything is JVM-side column algebra (no UDFs); each converter is a pure
Column -> Column function usable standalone or through apply_converters() on a
flat/unwrapped frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECIMAL_MODES = ("precise", "double", "string")
TIME_MODES = ("adaptive", "adaptive_time_microseconds", "connect")


def convert_decimal(
    col: Column, mode: str = "precise", *, precision: int = 38, scale: int = 18
) -> Column:
    """decimal.handling.mode (JdbcValueConverters.java:73-99)."""
    if mode == "precise":
        return col.cast(f"decimal({precision},{scale})")
    if mode == "double":
        return col.cast("double")
    if mode == "string":
        return col.cast(f"decimal({precision},{scale})").cast("string")
    raise ValueError(f"invalid decimal.handling.mode {mode!r}")


def _wall(ts_col: Column) -> Column:
    """Normalize to TIMESTAMP_NTZ — the source-local WALL-CLOCK value. The
    reference's io.debezium.time types convert wall times as-if-UTC
    (Timestamp/MicroTimestamp javadocs: 'does not include timezone
    information'), so every epoch here is wall-clock arithmetic against the
    NTZ origin and NEVER consults the driver session timezone (a
    ``cast('timestamp')`` hop would shift every value by the session's UTC
    offset on a non-UTC driver — the r03 red-row bug class)."""
    return ts_col.cast("timestamp_ntz")


def _wall_us(ts_col: Column) -> Column:
    """Wall-clock epoch microseconds (session-tz-independent)."""
    return F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        _wall(ts_col),
    )


def epoch_days(date_col: Column) -> Column:
    """io.debezium.time.Date: days since epoch (int32)."""
    return F.datediff(date_col.cast("date"), F.lit("1970-01-01").cast("date")).cast("int")


def epoch_millis(ts_col: Column) -> Column:
    """Kafka Connect Timestamp / io.debezium.time.Timestamp: epoch millis.
    floor(micros/1000) — exact and engine-portable (no bare double division)."""
    return F.floor(_wall_us(ts_col) / F.lit(1000)).cast("long")


def epoch_micros(ts_col: Column) -> Column:
    """io.debezium.time.MicroTimestamp: epoch microseconds."""
    return _wall_us(ts_col)


def zoned_iso(ts_col: Column) -> Column:
    """io.debezium.time.ZonedTimestamp: ISO-8601 UTC string (micro
    precision). Formats the NTZ wall value directly — date_format on a
    session-zoned TIMESTAMP would re-render in the driver's timezone."""
    return F.date_format(_wall(ts_col), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")


def milli_of_day(ts_col: Column) -> Column:
    """io.debezium.time.Time: milliseconds past midnight (int32,
    Time.toMilliOfDay), on the source-local wall clock."""
    return F.floor(F.pmod(_wall_us(ts_col), F.lit(86_400_000_000)) / F.lit(1000)).cast(
        "int"
    )


def micro_of_day(ts_col: Column) -> Column:
    """io.debezium.time.MicroTime: microseconds past midnight (int64).
    pmod, not %: pre-1970 wall times still yield a 0..86400s time-of-day."""
    return F.pmod(_wall_us(ts_col), F.lit(86_400_000_000)).cast("long")


def nano_of_day(ts_col: Column) -> Column:
    """io.debezium.time.NanoTime: nanoseconds past midnight (int64,
    NanoTime.toNanoOfDay). Spark timestamps carry microsecond precision, so
    the sub-microsecond digits are zero — same as the reference converting a
    micro-precision source value."""
    return micro_of_day(ts_col) * F.lit(1000)


def epoch_nanos(ts_col: Column) -> Column:
    """io.debezium.time.NanoTimestamp: nanoseconds past epoch (int64,
    NanoTimestamp.toEpochNanos); micro-precision source -> trailing zeros."""
    return _wall_us(ts_col) * F.lit(1000)


def year_int(ts_col: Column) -> Column:
    """io.debezium.time.Year: the year number as int32 (MySQL YEAR columns)."""
    return F.year(_wall(ts_col)).cast("int")


def zoned_time_iso(ts_col: Column) -> Column:
    """io.debezium.time.ZonedTime: ISO-8601 time-with-offset string; the
    engine normalizes to UTC ('Z'), like ZonedTimestamp handling above."""
    return F.date_format(_wall(ts_col), "HH:mm:ss.SSSSSS'Z'")


def _strip_trailing_zeros(dec_str: Column) -> Column:
    # BigDecimal.stripTrailingZeros().toPlainString(): the cast-to-string of a
    # decimal(_,9) ALWAYS contains '.', so stripping '0' then '.' from the
    # right cannot eat integer digits ("200.000000000" -> "200").
    return F.regexp_replace(F.regexp_replace(dec_str, r"0+$", ""), r"\.$", "")


def interval_iso(
    years: Column, months: Column, days: Column,
    hours: Column, minutes: Column, seconds: Column,
) -> Column:
    """io.debezium.time.Interval: ISO-8601 period string
    'P<y>Y<m>M<d>DT<h>H<m>M<s>S' with the seconds' trailing fractional zeros
    stripped (Interval.toIsoString — BigDecimal.stripTrailingZeros, scale
    capped at 9)."""
    secs = _strip_trailing_zeros(seconds.cast("decimal(29,9)").cast("string"))
    return F.concat(
        F.lit("P"), years.cast("int").cast("string"),
        F.lit("Y"), months.cast("int").cast("string"),
        F.lit("M"), days.cast("int").cast("string"),
        F.lit("DT"), hours.cast("int").cast("string"),
        F.lit("H"), minutes.cast("int").cast("string"),
        F.lit("M"), secs, F.lit("S"),
    )


#: MicroDuration.DAYS_PER_MONTH_AVG (365.25 / 12 = 30.4375, exact in binary).
DAYS_PER_MONTH_AVG = 365.25 / 12.0


def duration_micros(
    years: Column, months: Column, days: Column,
    hours: Column, minutes: Column, seconds: Column,
    *, days_per_month_avg: float = DAYS_PER_MONTH_AVG,
) -> Column:
    """io.debezium.time.MicroDuration.durationMicros: approximate interval ->
    microseconds, using an average-days-per-month convention (the reference
    defaults to ChronoUnit.MONTHS' 30.436875 when unset; connectors pass
    DAYS_PER_MONTH_AVG = 30.4375 — same knob here). Same double-arithmetic
    association order as the Java, truncated toward zero."""
    nd = (
        (years.cast("double") * F.lit(12.0) + months.cast("double"))
        * F.lit(float(days_per_month_avg))
        + days.cast("double")
    )
    nsec = (
        (nd * F.lit(24.0) + hours.cast("double")) * F.lit(60.0)
        + minutes.cast("double")
    ) * F.lit(60.0) + seconds.cast("double")
    return (nsec * F.lit(1e6)).cast("long")  # Spark cast truncates, like (long)


#: Source-side textual special values (PostgreSQL numeric NaN/Infinity) ->
#: SpecialValueDecimal.SpecialValue names (data/SpecialValueDecimal.java:33-42).
SPECIAL_DECIMAL_TOKENS = {
    "NaN": "NAN",
    "Infinity": "POSITIVE_INFINITY",
    "-Infinity": "NEGATIVE_INFINITY",
}


def decimal_special_name(col: Column) -> Column:
    """The SpecialValue enum name for a textual decimal, else null
    (data/SpecialValueDecimal.java:33-42 — NAN / POSITIVE_INFINITY /
    NEGATIVE_INFINITY; ``toString()`` renders ``specialValue.name()``)."""
    out = F.lit(None).cast("string")
    for token, name in SPECIAL_DECIMAL_TOKENS.items():
        out = F.when(F.trim(col) == F.lit(token), F.lit(name)).otherwise(out)
    return out


def convert_decimal_special(
    col: Column, mode: str = "precise", *, precision: int = 38, scale: int = 18
) -> Column:
    """decimal.handling.mode with SpecialValueDecimal semantics
    (data/SpecialValueDecimal.java:161-192, ``fromLogical``):

    * string  -> special values render as the enum NAME ("NAN",
      "POSITIVE_INFINITY", "NEGATIVE_INFINITY"); plain values as
      toPlainString.
    * double  -> Double.NaN / ±Infinity.
    * precise -> the reference THROWS (specials aren't representable as
      Connect Decimal). The batch analogue is a null here — pair with
      ``decimal_special_name()`` as the predicate for the engine's
      event.processing.failure.handling.mode (fail/warn/skip + DLQ), which
      is where a per-record ConnectException maps in a vectorized engine.
    """
    special = decimal_special_name(col)
    if mode == "precise":
        return F.when(special.isNotNull(), F.lit(None).cast(
            f"decimal({precision},{scale})"
        )).otherwise(col.cast(f"decimal({precision},{scale})"))
    if mode == "double":
        return (
            F.when(special == "NAN", F.lit(float("nan")))
            .when(special == "POSITIVE_INFINITY", F.lit(float("inf")))
            .when(special == "NEGATIVE_INFINITY", F.lit(float("-inf")))
            .otherwise(col.cast("double"))
        )
    if mode == "string":
        return F.coalesce(
            special, col.cast(f"decimal({precision},{scale})").cast("string")
        )
    raise ValueError(f"invalid decimal.handling.mode {mode!r}")


def convert_timestamp(ts_col: Column, mode: str = "adaptive") -> Column:
    """time.precision.mode for timestamp columns (JdbcValueConverters.java:100-136)."""
    if mode in ("adaptive", "adaptive_time_microseconds"):
        return epoch_micros(ts_col)
    if mode == "connect":
        return epoch_millis(ts_col)
    raise ValueError(f"invalid time.precision.mode {mode!r}")


def apply_converters(df: DataFrame, converters: dict[str, Column]) -> DataFrame:
    """Apply a {column: converted-Column} map to a flat (unwrapped) frame."""
    out = df
    for name, col in converters.items():
        out = out.withColumn(name, col)
    return out


BINARY_MODES = ("bytes", "base64", "hex")


def convert_binary(col: Column, mode: str = "bytes") -> Column:
    """binary.handling.mode (CommonConnectorConfig.java:177-197
    BinaryHandlingMode): ``bytes`` passes the raw binary through, ``base64``
    renders java.util.Base64-style (no line breaks — Spark's base64 matches),
    ``hex`` renders LOWERCASE base16 (HexConverter.java:17 uses lowercase
    HEX_CHARS; Spark's hex() is uppercase, hence the lower())."""
    if mode == "bytes":
        return col.cast("binary")
    if mode == "base64":
        return F.base64(col.cast("binary"))
    if mode == "hex":
        return F.lower(F.hex(col.cast("binary")))
    raise ValueError(f"invalid binary.handling.mode {mode!r}")


def handling_mode_converter(
    decimal_mode: str | None = None,
    time_mode: str | None = None,
    binary_mode: str | None = None,
    *,
    precision: int = 38,
    scale: int = 18,
):
    """The engine-wide handling modes as ONE built-in converter plug-in.

    The reference's JdbcValueConverters IS a type-keyed converter provider —
    every decimal/temporal/binary column routes through the mode-selected
    conversion (JdbcValueConverters.java:73-136); this packages the same
    dispatch as a :mod:`debezium_spark.functions.custom` ``CustomConverter``
    so the engine applies it through the identical plug-in seam (prepended to
    the user chain — user converters are consulted FIRST, matching
    CustomConverterRegistry's converters-before-builtins order).

    A mode of None means "Spark-native": the column keeps its typed Spark
    representation (our envelope's default — Spark's decimal/timestamp/binary
    types are already exact); setting a mode opts into the reference's WIRE
    representation (e.g. ``time_mode='adaptive'`` -> epoch-micros longs,
    exactly what a Debezium consumer parses today).
    """
    if decimal_mode is not None and decimal_mode not in DECIMAL_MODES:
        raise ValueError(f"invalid decimal.handling.mode {decimal_mode!r}")
    if time_mode is not None and time_mode not in TIME_MODES:
        raise ValueError(f"invalid time.precision.mode {time_mode!r}")
    if binary_mode is not None and binary_mode not in BINARY_MODES:
        raise ValueError(f"invalid binary.handling.mode {binary_mode!r}")

    from pyspark.sql import types as T

    from debezium_spark.functions.custom import ConverterDefinition

    def plugin(column) -> "ConverterDefinition | None":
        tn = column.type_name
        if decimal_mode is not None and tn.startswith("decimal"):
            target = {
                "precise": T.DecimalType(precision, scale),
                "double": T.DoubleType(),
                "string": T.StringType(),
            }[decimal_mode]
            return ConverterDefinition(
                target,
                lambda c: convert_decimal(
                    c, decimal_mode, precision=precision, scale=scale
                ),
            )
        if time_mode is not None and tn == "timestamp":
            return ConverterDefinition(
                T.LongType(), lambda c: convert_timestamp(c, time_mode)
            )
        if time_mode is not None and tn == "date":
            # both adaptive and connect carry dates as epoch days
            # (io.debezium.time.Date / Connect Date)
            return ConverterDefinition(T.IntegerType(), epoch_days)
        if binary_mode is not None and binary_mode != "bytes" and tn == "binary":
            return ConverterDefinition(
                T.StringType(), lambda c: convert_binary(c, binary_mode)
            )
        return None

    return plugin
