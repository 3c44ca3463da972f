"""Session-timezone-independent event-time instants.

Every timestamp in the fixtures is stored as a NAIVE wall time
(parquet TIMESTAMP_NTZ) — the semantics the DuckDB oracle reads
directly. Spark's streaming engine, however, requires TimestampType
(instants) for watermarks, and the naive->instant cast interprets the
wall in the SESSION timezone: under tz=Z the instant becomes
wall - offset(Z), which (a) shifts ``F.window`` bucket ALIGNMENT
whenever offset(Z) is not a multiple of the window/slide (the round-7
flake harness caught tumbling 60-min windows landing on :30 under
Asia/Kolkata), and (b) shifts collect-time rendering. The value-hash
contract only held because the driver pins UTC.

``as_utc_instant`` is the ONE conversion the engine uses: it yields
the instant whose UTC wall equals the stored wall, independent of the
session zone —

    cast(w)                         (UTC session: identity plan,
                                     parquet pushdown intact)
    from_utc_timestamp(cast(w), tz) (any other zone: cast gives
                                     w - offset(tz); the shift adds it
                                     back, so the instant is w-as-UTC)

Downstream consequences, all session-independent by construction:
window/session_window alignment (instant epoch = UTC epoch of the
wall), ``unix_micros`` (epoch of the UTC wall — what the oracles'
integer arithmetic computes), and collect-time rendering (instants
render as their UTC wall under the driver's TZ-unset process).

Caveats: under a NON-UTC session the extra expression blocks parquet
filter pushdown on the time column (the driver's UTC session keeps the
bare cast), and a wall time inside a DST transition of the session
zone converts ambiguously — fixture event times (Jan 2024) sit at
constant offsets, and the production contract is a UTC session.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_UTC_NAMES = {"UTC", "Etc/UTC", "GMT", "Etc/GMT", "+00:00", "Z"}


def as_utc_instant(col: Column | str, spark: SparkSession) -> Column:
    """Naive wall time (TIMESTAMP_NTZ or string) -> session-independent
    instant whose UTC wall equals the stored wall (module docstring)."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    c = F.col(col) if isinstance(col, str) else col
    cast = c.cast("timestamp")
    if tz in _UTC_NAMES:
        return cast
    return F.from_utc_timestamp(cast, tz)


def as_utc_wall(col: Column | str) -> Column:
    """Instant (TimestampType) -> its UTC wall as TIMESTAMP_NTZ,
    independent of BOTH the session zone and the python process zone.

    The inverse boundary of as_utc_instant: streaming runners convert
    their memory-sink results back to walls before returning, because
    PySpark renders TimestampType at collect via the PYTHON PROCESS
    timezone (datetime.fromtimestamp) — a TZ env var would shift every
    streamed timestamp while batch NTZ results stay put. The
    session-dependent NTZ cast composed with a session->UTC
    convert_timezone is session-independent (catalog.py note)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.convert_timezone(
        F.current_timezone(), F.lit("UTC"), c.cast("timestamp_ntz")
    )


def walls_out(df: DataFrame) -> DataFrame:
    """Apply as_utc_wall to every top-level TimestampType column — the
    streaming runners' return boundary."""
    from pyspark.sql.types import TimestampType

    fields = df.schema.fields
    if not any(isinstance(f.dataType, TimestampType) for f in fields):
        return df
    return df.select(
        *[
            as_utc_wall(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, TimestampType)
            else F.col(f.name)
            for f in fields
        ]
    )
