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
#: (RegionEventCount.scala:66-74).
GOLDMAN = ("goldman", -74.0144185, -74.013777, 40.7138745, 40.7152275)
CITIGROUP = ("citigroup", -74.012083, -74.009867, 40.720053, 40.7217236)
DEFAULT_REGIONS = (GOLDMAN, CITIGROUP)


def in_box(
    lon: Column, lat: Column, box: tuple[str, float, float, float, float]
) -> Column:
    """True iff (lon, lat) falls inside the box — pure column expression."""
    _, lon_min, lon_max, lat_min, lat_max = box
    return (
        (lon > lon_min) & (lon < lon_max) & (lat > lat_min) & (lat < lat_max)
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


def taxi_dropoff(
    taxi_type: Column, c8: Column, c9: Column, c10: Column, c11: Column
) -> tuple[Column, Column]:
    """P11: green taxis carry dropoff lon/lat in fields 8/9, yellow in
    10/11 (reference RegionEventCount.scala:86-91). Returns (lon, lat)."""
    lon = F.when(taxi_type == "green", c8).otherwise(c10)
    lat = F.when(taxi_type == "green", c9).otherwise(c11)
    return lon, lat
