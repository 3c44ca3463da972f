"""Geo bounding-box predicates (SURVEY.md §2.2 P5).

The reference hard-codes two Manhattan bounding boxes and tags taxi
dropoffs (reference Spark/Spark Streaming/RegionEventCount.scala:66-93;
TrendingArrivals.scala:67-84), with the green/yellow CSV ordinal dispatch
(P11) picking which columns hold lon/lat. Here the boxes are data, the
predicate is one boolean column expression, and the dispatch is F.when.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, lon_min, lon_max, lat_min, lat_max) — the reference's two boxes
#: (RegionEventCount.scala:66-74). Citigroup first: the reference tags
#: "citigroup" when a point is in both checks (`if inCitigroup ... else
#: goldman`, RegionEventCount.scala:93), so it has dispatch priority.
GOLDMAN = ("goldman", -74.0144185, -74.013777, 40.7138745, 40.7152275)
CITIGROUP = ("citigroup", -74.012083, -74.009867, 40.720053, 40.7217236)
DEFAULT_REGIONS = (CITIGROUP, GOLDMAN)


def in_box(
    lon: Column, lat: Column, box: tuple[str, float, float, float, float]
) -> Column:
    """True iff (lon, lat) falls inside the box — pure column expression.
    Bounds are INCLUSIVE, matching the reference's >=/<= checks
    (RegionEventCount.scala:76-84)."""
    _, lon_min, lon_max, lat_min, lat_max = box
    return (
        (lon >= lon_min) & (lon <= lon_max) & (lat >= lat_min) & (lat <= lat_max)
    )


def region_tag(
    lon: Column,
    lat: Column,
    regions: tuple[tuple[str, float, float, float, float], ...] = DEFAULT_REGIONS,
) -> Column:
    """Region name for a point, NULL if outside all boxes — the F.when
    chain replacing the reference's if/else tagger
    (RegionEventCount.scala:93)."""
    expr = F.lit(None).cast("string")
    for box in reversed(regions):
        expr = F.when(in_box(lon, lat, box), F.lit(box[0])).otherwise(expr)
    return expr


#: Synthetic dropoff coordinates for the `events` fixture (it ships no
#: lon/lat): a deterministic double grid seeded by event_id that straddles
#: both reference boxes plus a wide out-of-box margin. Pure column
#: arithmetic — identical IEEE doubles in Spark and DuckDB, so the geo
#: query is fully value-hash-checkable.
SYNTH_LON0 = -74.0150
SYNTH_LAT0 = 40.7130
SYNTH_STEP = 1e-5
SYNTH_MOD = 1_000
#: Affine permutation decorrelating the lat index from the lon index —
#: chosen so every run of 1000 consecutive ids lands ~7 points in the
#: goldman box and ~34 in citigroup (so even the sf0.001 fixture, ids
#: 0..999, exercises both boxes). A plain id//K lat index fails there:
#: small id ranges never reach the boxes' latitudes.
SYNTH_A = 37
SYNTH_B = 11


def synth_lonlat(event_id: Column) -> tuple[Column, Column]:
    """(lon, lat) derived from event_id: lon walks a 0.01° band
    (id % MOD), lat walks the same band under an affine permutation of
    the index — integer arithmetic reduced mod MOD first, so it stays
    exact for any int64 id. Same association order as the SQL fragment
    below (mult before add) for bit-identical doubles."""
    lon = F.lit(SYNTH_LON0) + (event_id % SYNTH_MOD) * F.lit(SYNTH_STEP)
    lat_idx = ((event_id % SYNTH_MOD) * SYNTH_A + SYNTH_B) % SYNTH_MOD
    lat = F.lit(SYNTH_LAT0) + lat_idx * F.lit(SYNTH_STEP)
    return lon, lat


def synth_lonlat_sql(event_id_expr: str) -> tuple[str, str]:
    """DuckDB fragments computing the identical (lon, lat) doubles.
    E-notation literals pin DOUBLE (plain decimals parse as DECIMAL in
    DuckDB, which would change the arithmetic)."""
    lon = (
        f"({SYNTH_LON0!r}e0 + (({event_id_expr}) % {SYNTH_MOD})"
        f" * {SYNTH_STEP!r})"
    )
    lat = (
        f"({SYNTH_LAT0!r}e0 + ((({event_id_expr}) % {SYNTH_MOD})"
        f" * {SYNTH_A} + {SYNTH_B}) % {SYNTH_MOD} * {SYNTH_STEP!r})"
    )
    return lon, lat


def region_case_sql(lon_expr: str, lat_expr: str) -> str:
    """DuckDB CASE mirroring region_tag() — same box order, same
    inclusive bounds, CAST to DOUBLE for exact literal parity."""
    whens = "\n             ".join(
        f"WHEN {lon_expr} >= CAST({lon_min!r} AS DOUBLE)"
        f" AND {lon_expr} <= CAST({lon_max!r} AS DOUBLE)"
        f" AND {lat_expr} >= CAST({lat_min!r} AS DOUBLE)"
        f" AND {lat_expr} <= CAST({lat_max!r} AS DOUBLE) THEN '{name}'"
        for name, lon_min, lon_max, lat_min, lat_max in DEFAULT_REGIONS
    )
    return f"CASE {whens} END"


def taxi_dropoff(
    taxi_type: Column, c8: Column, c9: Column, c10: Column, c11: Column
) -> tuple[Column, Column]:
    """P11: green taxis carry dropoff lon/lat in fields 8/9, yellow in
    10/11 (reference RegionEventCount.scala:86-91). Returns (lon, lat)."""
    lon = F.when(taxi_type == "green", c8).otherwise(c10)
    lat = F.when(taxi_type == "green", c9).otherwise(c11)
    return lon, lat
