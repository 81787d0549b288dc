"""Time-column helpers shared by temporal operators and window queries.

The driver test tables store ``ts`` as parquet ``timestamp[us]`` without a
timezone, which Spark 4 reads as TIMESTAMP_NTZ; other sources may carry a
zoned TIMESTAMP. ``unix_micros`` only accepts the zoned type, so every
epoch computation goes through :func:`epoch_us`, which picks the right
expression from the column's actual type. Both forms are pure Catalyst
expressions (whole-stage codegen; no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

def _epoch_ntz() -> Column:
    # built lazily: Column construction needs an active SparkContext
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def ntz_epoch_us(col: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ expression (UTC wall clock).
    Session-timezone independent; expression-level counterpart of
    :func:`epoch_us` for when no DataFrame schema is at hand."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", _epoch_ntz(), c)


def ntz_from_epoch_us(col: Column | str) -> Column:
    """TIMESTAMP_NTZ (UTC wall clock) from epoch microseconds —
    session-timezone-independent inverse of :func:`ntz_epoch_us`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add("MICROSECOND", c, _epoch_ntz())


_US_HOUR = 3_600_000_000
_US_DAY = 24 * _US_HOUR


def ntz_trunc(unit: str, col: Column | str) -> Column:
    """Session-timezone-independent truncation of a TIMESTAMP_NTZ column.

    ``F.date_trunc`` silently coerces NTZ input to the zoned type via the
    session timezone (and collect() then renders it in the *process*
    timezone), so NTZ truncation must stay in wall-clock arithmetic:
    hour/day/week floor in epoch-microsecond space (weeks Monday-aligned,
    matching date_trunc), month via field extraction.
    """
    c = F.col(col) if isinstance(col, str) else col
    if unit == "month":
        one = F.lit(1)
        zero = F.lit(0)
        return F.make_timestamp_ntz(F.year(c), F.month(c), one, zero, zero, zero)
    us = ntz_epoch_us(c)
    if unit == "hour":
        return ntz_from_epoch_us(us - F.pmod(us, F.lit(_US_HOUR)))
    if unit == "day":
        return ntz_from_epoch_us(us - F.pmod(us, F.lit(_US_DAY)))
    if unit == "week":
        days = F.floor(us / F.lit(_US_DAY))
        # epoch day 0 = Thursday; (days + 3) % 7 == 0 on Mondays
        monday = days - F.pmod(days + F.lit(3), F.lit(7))
        return ntz_from_epoch_us(monday * F.lit(_US_DAY))
    raise ValueError(f"unsupported ntz_trunc unit: {unit}")


def epoch_us(df: DataFrame, col: str) -> Column:
    """Microseconds since the Unix epoch for ``df[col]``.

    TIMESTAMP_NTZ wall-clock values are treated as UTC (matching duckdb's
    ``epoch_us`` on naive timestamps); zoned TIMESTAMP uses the instant
    directly. Deterministic regardless of the session timezone.
    """
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return F.timestamp_diff("MICROSECOND", _epoch_ntz(), F.col(col))
    return F.unix_micros(F.col(col))


def ntz_as_utc_instant(col: Column | str) -> Column:
    """TIMESTAMP_NTZ wall clock, read as UTC -> zoned TIMESTAMP instant.

    Session-timezone independent (goes through epoch microseconds), unlike
    a plain CAST. Needed because event-time watermarks only accept the
    zoned type (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(F.timestamp_diff("MICROSECOND", _epoch_ntz(), c))


def instant_as_utc_ntz(col: Column | str) -> Column:
    """Zoned TIMESTAMP instant -> TIMESTAMP_NTZ carrying the UTC wall
    clock. Exact inverse of :func:`ntz_as_utc_instant`; session-timezone
    independent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add("MICROSECOND", F.unix_micros(c), _epoch_ntz())
