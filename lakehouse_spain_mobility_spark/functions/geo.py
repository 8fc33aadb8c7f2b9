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

import pandas as pd  # module-level: pandas_udf resolves type hints from globals

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


# WGS84 ellipsoid (the spheroid ST_Distance_Spheroid measures on)
WGS84_A_KM = 6378.137
WGS84_F = 1.0 / 298.257223563


def vincenty_km_np(lon1, lat1, lon2, lat2, max_iter: int = 50, tol: float = 1e-12):
    """Vincenty inverse geodesic on the WGS84 spheroid, vectorized over
    numpy arrays (degrees in, km out). The fidelity upgrade over
    :func:`haversine_km` for ``ST_Distance_Spheroid`` parity
    (dags/gravity/create_distances.py:17): haversine is ~0.1-0.5% off the
    spheroid; Vincenty is <0.5 mm. Non-converged (nearly antipodal) pairs
    fall back to haversine — irrelevant for intra-country distances."""
    import numpy as np

    a, f = WGS84_A_KM, WGS84_F
    b = a * (1.0 - f)
    p1, p2 = np.radians(np.asarray(lat1, float)), np.radians(np.asarray(lat2, float))
    L = np.radians(np.asarray(lon2, float) - np.asarray(lon1, float))
    U1, U2 = np.arctan((1 - f) * np.tan(p1)), np.arctan((1 - f) * np.tan(p2))
    sU1, cU1, sU2, cU2 = np.sin(U1), np.cos(U1), np.sin(U2), np.cos(U2)

    lam = L.copy()
    converged = np.zeros(lam.shape, dtype=bool)
    sig = np.zeros_like(lam)
    s_sig = np.zeros_like(lam)
    c_sig = np.ones_like(lam)
    c_sqa = np.ones_like(lam)
    c2sm = np.zeros_like(lam)
    for _ in range(max_iter):
        s_lam, c_lam = np.sin(lam), np.cos(lam)
        s_sig = np.sqrt(
            (cU2 * s_lam) ** 2 + (cU1 * sU2 - sU1 * cU2 * c_lam) ** 2
        )
        c_sig = sU1 * sU2 + cU1 * cU2 * c_lam
        sig = np.arctan2(s_sig, c_sig)
        with np.errstate(divide="ignore", invalid="ignore"):
            s_alpha = np.where(s_sig != 0, cU1 * cU2 * s_lam / s_sig, 0.0)
            c_sqa = 1.0 - s_alpha**2
            c2sm = np.where(c_sqa != 0, c_sig - 2.0 * sU1 * sU2 / c_sqa, 0.0)
        C = f / 16.0 * c_sqa * (4.0 + f * (4.0 - 3.0 * c_sqa))
        lam_new = L + (1.0 - C) * f * s_alpha * (
            sig + C * s_sig * (c2sm + C * c_sig * (-1.0 + 2.0 * c2sm**2))
        )
        converged |= np.abs(lam_new - lam) < tol
        lam = lam_new
        if converged.all():
            break

    u_sq = c_sqa * (a**2 - b**2) / b**2
    A = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    B = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    d_sig = B * s_sig * (
        c2sm
        + B / 4.0 * (
            c_sig * (-1.0 + 2.0 * c2sm**2)
            - B / 6.0 * c2sm * (-3.0 + 4.0 * s_sig**2) * (-3.0 + 4.0 * c2sm**2)
        )
    )
    dist = b * A * (sig - d_sig)

    # haversine fallback for non-converged (antipodal) pairs
    if not converged.all():
        dlat, dlon = p2 - p1, L
        h = np.sin(dlat / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlon / 2) ** 2
        hav = 2 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(h))
        dist = np.where(converged, dist, hav)
    return np.where(s_sig == 0, 0.0, dist)


def geodesic_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Column form of :func:`vincenty_km_np` — an Arrow-batched pandas UDF
    (the SURVEY-sanctioned slow path: iterative math that Catalyst can't
    express; used on dimension-sized centroid tables, never on facts)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _geo(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        return pd.Series(vincenty_km_np(a.values, b.values, c.values, d.values))

    return _geo(lon1, lat1, lon2, lat2)


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
