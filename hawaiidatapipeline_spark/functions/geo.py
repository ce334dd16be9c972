"""Geospatial functions — the SODA ``location`` type surface (SURVEY.md §1.1).

SoQL exposes ``distance_in_meters``, ``within_circle`` and ``within_box``
over its ``location``/``point`` types (publicly documented SODA 2.x scalar
functions — the service the reference drove). Spark has no geo type, so the
engine's convention is plain ``(lat, lon)`` double columns (the flattened
form of SODA's nested location object) and these functions compose entirely
from built-in trig — whole-stage codegen, no UDF, pushdown-friendly.

The spherical model is the same one SODA documents (great-circle on a
spherical Earth); at 100 TB a within-circle filter should be preceded by a
cheap bounding-box prune (``within_box``) so the parquet reader can skip row
groups on lat/lon min/max stats before any trig runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_000.0


def distance_in_meters(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle (haversine) distance in meters between two points."""
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlmb / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def within_circle(
    lat: Column, lon: Column, center_lat: float, center_lon: float, radius_m: float
) -> Column:
    """SoQL ``within_circle(location, lat, lon, radius)`` — boolean filter."""
    return (
        distance_in_meters(lat, lon, F.lit(center_lat), F.lit(center_lon)) <= radius_m
    )


def within_box(
    lat: Column, lon: Column, nw_lat: float, nw_lon: float, se_lat: float, se_lon: float
) -> Column:
    """SoQL ``within_box`` — rectangular prune; sargable (plain comparisons
    on raw columns), so it reaches the parquet reader as PushedFilters and
    should always wrap a ``within_circle`` at scale."""
    return (lat <= nw_lat) & (lat >= se_lat) & (lon >= nw_lon) & (lon <= se_lon)
