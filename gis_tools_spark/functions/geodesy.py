"""Geodesic distance column functions — pure Spark SQL column math, no
UDF (SURVEY.md §2.11; reference great_circle distance.py:22-53 uses
haversine × local-sphere radius, euclidean distance.py:56-66)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EARTH_RADIUS_M = 6_371_000.0


def great_circle_meters(lon1: Column, lat1: Column, lon2: Column, lat2: Column,
                        radius: float = EARTH_RADIUS_M) -> Column:
    """Haversine great-circle distance in meters — whole-stage codegen."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) ** 2
    return F.lit(2.0 * radius) * F.asin(F.sqrt(a))


def euclidean(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    return F.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
