"""Geospatial math without a native geometry type (SURVEY §7.3/§7.4).

The engine's internal representation is (lon, lat) DoubleType pairs plus
WKT strings for polygons; the ~15 ST_* functions the reference uses
(§2.8) are covered by:
- native column math here (distance, centroid-of-points, point-in-bbox),
- shapely-backed pandas UDFs in ``operators/spatial.py`` for polygon
  predicates/dissolve (gated behind import-try; shapely is optional).

Two distance functions:
- :func:`haversine_km` — great-circle distance, the production mapping of
  ``ST_Distance_Spheroid`` (dags/gravity/create_distances.py:17). Uses
  transcendentals, so results can differ from another engine in the last
  ulp (documented tolerance; SURVEY §7.4 item 2).
- :func:`planar_km` — equirectangular approximation using only
  mul/add/sqrt, all IEEE-exact operations, so it is *bit-identical* across
  engines; used by the oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG_LAT = 111.32
KM_PER_DEG_LON_MADRID = 85.0  # cos(40.4°)·111.32 — fixed so both engines agree


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in km (production path for
    ST_Distance_Spheroid — ~0.1-0.5% from the true spheroid geodesic)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def planar_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Equirectangular-projection distance: only *, -, +, sqrt — every op
    IEEE-correctly-rounded, hence bit-identical across engines."""
    dx = (lon2 - lon1) * F.lit(KM_PER_DEG_LON_MADRID)
    dy = (lat2 - lat1) * F.lit(KM_PER_DEG_LAT)
    return F.sqrt(dx * dx + dy * dy)


def sql_planar_km(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """DuckDB twin of :func:`planar_km` — same expression tree. Constants
    cast to DOUBLE (DuckDB parses bare decimal literals as exact DECIMAL)."""
    dx = f"(({lon2}) - ({lon1})) * CAST({KM_PER_DEG_LON_MADRID} AS DOUBLE)"
    dy = f"(({lat2}) - ({lat1})) * CAST({KM_PER_DEG_LAT} AS DOUBLE)"
    return f"SQRT(({dx}) * ({dx}) + ({dy}) * ({dy}))"
