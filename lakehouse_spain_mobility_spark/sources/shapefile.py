"""ESRI Shapefile scan (SURVEY §2.1 S3: ``ST_Read('<shp>')`` —
dags/geometry/ingestion_bronze_geometry.py:13-24).

Pure-Python reader for polygon shapefiles (.shp geometry + .dbf dBASE III
attributes): the census-section files are national-scale but small (one
per year), so the reference loads them single-node too — this is a
driver-side scan that lands in a DataFrame, exactly like the
geopandas→createDataFrame route SURVEY §2.1 prescribes, minus the
dependency. Geometry is emitted as WKT (the engine's polygon
representation, SURVEY §7.3).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

_SHAPE_POLYGON = 5
_SHAPE_POINT = 1


def _read_shp(path: str) -> list[str | None]:
    """Parse .shp records → WKT strings (polygons: all rings; null shapes
    → None)."""
    wkts: list[str | None] = []
    with open(path, "rb") as f:
        data = f.read()
    file_len = struct.unpack(">i", data[24:28])[0] * 2
    pos = 100
    while pos < file_len:
        (_, content_len) = struct.unpack(">ii", data[pos : pos + 8])
        pos += 8
        shape_type = struct.unpack("<i", data[pos : pos + 4])[0]
        if shape_type == _SHAPE_POLYGON:
            num_parts, num_points = struct.unpack("<ii", data[pos + 36 : pos + 44])
            parts = struct.unpack(f"<{num_parts}i", data[pos + 44 : pos + 44 + 4 * num_parts])
            pts_off = pos + 44 + 4 * num_parts
            pts = struct.unpack(f"<{num_points * 2}d", data[pts_off : pts_off + 16 * num_points])
            rings = []
            bounds = list(parts) + [num_points]
            for r in range(num_parts):
                coords = ", ".join(
                    f"{pts[2 * i]:.9f} {pts[2 * i + 1]:.9f}"
                    for i in range(bounds[r], bounds[r + 1])
                )
                rings.append(f"({coords})")
            wkts.append("POLYGON (" + ", ".join(rings) + ")")
        elif shape_type == _SHAPE_POINT:
            x, y = struct.unpack("<dd", data[pos + 4 : pos + 20])
            wkts.append(f"POINT ({x:.9f} {y:.9f})")
        else:
            wkts.append(None)
        pos += content_len * 2
    return wkts


def _read_dbf(path: str) -> tuple[list[str], list[list]]:
    """Parse .dbf (dBASE III) → (field names, rows of strings/numbers)."""
    with open(path, "rb") as f:
        data = f.read()
    n_records = struct.unpack("<i", data[4:8])[0]
    header_len, record_len = struct.unpack("<hh", data[8:12])
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos : pos + 11].split(b"\x00")[0].decode("latin-1")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fdec = data[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    rows = []
    pos = header_len
    for _ in range(n_records):
        rec = data[pos : pos + record_len]
        pos += record_len
        if rec[:1] == b"*":  # deleted
            continue
        vals, off = [], 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off : off + flen].decode("latin-1").strip()
            off += flen
            if ftype == "N" and raw:
                vals.append(float(raw) if fdec or "." in raw else int(raw))
            elif ftype == "N":
                vals.append(None)
            else:
                vals.append(raw)
        rows.append(vals)
    return [f[0] for f in fields], rows


def read_shapefile(spark: SparkSession, shp_path: str) -> DataFrame:
    """ST_Read equivalent: one row per shape, attribute columns from the
    sidecar .dbf plus a ``geom`` WKT column."""
    wkts = _read_shp(shp_path)
    dbf_path = os.path.splitext(shp_path)[0] + ".dbf"
    if os.path.exists(dbf_path):
        names, rows = _read_dbf(dbf_path)
    else:
        names, rows = [], [[] for _ in wkts]
    records = [tuple(r) + (w,) for r, w in zip(rows, wkts)]
    return spark.createDataFrame(records, names + ["geom"])
