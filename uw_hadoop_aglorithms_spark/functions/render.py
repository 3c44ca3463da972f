"""Session-timezone-independent rendering of timestamp outputs.

Spark renders TimestampType instants in the SESSION timezone at
collect(), while the DuckDB oracle renders the stored (UTC-written)
wall times — so a registered result containing timestamps hash-matched
only because the driver pins spark.sql.session.timeZone=UTC. The
round-7 flake harness caught this in the act: under
tz=America/New_York the four stream/window keys diverged with every
row shifted by the zone offset and counts intact (pure rendering; the
window-boundary INSTANTS are timezone-invariant).

Contract: the registered query surface (``__spark_entry__.queries()``)
renders instants as UTC wall times regardless of the caller's session
timezone. Under a UTC session this wrapper is the IDENTITY — same
DataFrame object, byte-stable plans for the driver — and under any
other zone each top-level timestamp column is shifted with
``from_utc_timestamp(col, session_tz)`` so that the session-zone
rendering of the shifted instant is exactly the UTC wall string
(verified empirically against the DuckDB replay under both a
whole-hour zone, America/New_York, and a half-hour one, Asia/Kolkata).

Caveats (documented, not load-bearing for the UTC driver): the shift
uses the zone offset at each instant, so a timestamp INSIDE a DST
transition hour of the session zone could render ambiguously — fixture
event times (Jan 2024) sit at constant offsets. Only top-level columns
are normalized; no registered key emits nested timestamps
(window structs are flattened before return).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

_UTC_NAMES = {"UTC", "Etc/UTC", "GMT", "Etc/GMT", "+00:00", "Z"}


def utc_micros(spark, col) -> "F.Column":
    """Session-timezone-independent epoch micros of a TimestampType
    column: micros of the UTC WALL TIME the value renders as under a
    UTC session (what the DuckDB oracle's epoch arithmetic computes
    over the stored naive timestamps). Identity under a UTC session;
    under any other zone the same from_utc_timestamp shift as
    utc_timestamps, applied before unix_micros."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    c = F.col(col) if isinstance(col, str) else col
    if tz not in _UTC_NAMES:
        c = F.from_utc_timestamp(c, tz)
    return F.unix_micros(c)


def utc_timestamps(df: DataFrame) -> DataFrame:
    """Normalize top-level timestamp columns to render as UTC wall time
    (identity under a UTC session — see module docstring)."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz in _UTC_NAMES:
        return df
    fields = df.schema.fields
    if not any(isinstance(f.dataType, TimestampType) for f in fields):
        return df
    return df.select(
        *[
            F.from_utc_timestamp(F.col(f.name), tz).alias(f.name)
            if isinstance(f.dataType, TimestampType)
            else F.col(f.name)
            for f in fields
        ]
    )
