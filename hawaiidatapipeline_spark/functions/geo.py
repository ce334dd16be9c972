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

import re

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


def within_polygon(lat: Column, lon: Column, vertices) -> Column:
    """SoQL ``within_polygon`` — point-in-polygon by ray casting, unrolled
    at plan-build time into pure-codegen arithmetic (no UDF, no geometry
    library): a point is inside iff a ray to +∞ in longitude crosses an
    odd number of edges. ``vertices`` is the ring as [(lon, lat), ...]
    (WKT axis order; first vertex need not repeat). The half-open test
    ``(y1 > y) != (y2 > y)`` counts a vertex crossing exactly once, the
    standard Franklin PNPOLY convention. Cost: O(|ring|) comparisons per
    row, all inside whole-stage codegen — fine for the compile-time
    polygon literals SoQL passes; points exactly ON an edge follow the
    half-open convention (deterministic, engine-independent)."""
    n = len(vertices)
    if n < 3:
        raise ValueError("within_polygon needs at least 3 vertices")
    inside = F.lit(False)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        if y1 == y2:  # horizontal edge never crosses a horizontal ray;
            continue  # skipping it also avoids the 0-divisor in the slope
        crosses = ((F.lit(y1) > lat) != (F.lit(y2) > lat)) & (
            lon
            < (F.lit(x2) - F.lit(x1))
            * (lat - F.lit(y1))
            / (F.lit(y2) - F.lit(y1))
            + F.lit(x1)
        )
        inside = F.when(crosses, ~inside).otherwise(inside)
    return inside


def parse_wkt_polygon(wkt: str) -> list:
    """Parse a simple-ring WKT ``POLYGON ((lon lat, ...))`` into
    [(lon, lat), ...]; the closing repeat vertex is dropped. Only the
    outer ring of a single polygon is supported (no holes /
    MULTIPOLYGON) — the SoQL portal subset this engine compiles."""
    m = re.search(r"POLYGON\s*\(\(\s*([^()]*?)\s*\)\)", wkt, re.IGNORECASE)
    if not m:
        raise ValueError(f"unsupported WKT polygon: {wkt!r}")
    pts = []
    for pair in m.group(1).split(","):
        xy = pair.split()
        if len(xy) != 2:
            raise ValueError(f"bad WKT coordinate pair: {pair!r}")
        pts.append((float(xy[0]), float(xy[1])))
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts.pop()
    if len(pts) < 3:
        raise ValueError("WKT polygon ring needs at least 3 distinct vertices")
    return pts


def polygon_ray_cast_sql(lat_expr: str, lon_expr: str, vertices) -> str:
    """The SQL-text twin of :func:`within_polygon`: an edge-unrolled
    crossing-parity predicate. Pure arithmetic/comparisons in a fixed
    textual order, so Spark SQL and DuckDB evaluate it identically —
    which is what makes SoQL polygon queries oracle-checkable."""
    terms = []
    for i in range(len(vertices)):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % len(vertices)]
        if y1 == y2:
            continue
        terms.append(
            f"(CASE WHEN (({y1} > ({lat_expr})) <> ({y2} > ({lat_expr})))"
            f" AND (({lon_expr}) < ({x2} - {x1}) * (({lat_expr}) - {y1})"
            f" / ({y2} - {y1}) + {x1}) THEN 1 ELSE 0 END)"
        )
    if not terms:
        raise ValueError("degenerate polygon: all edges horizontal")
    return "((" + " + ".join(terms) + ") % 2 = 1)"
