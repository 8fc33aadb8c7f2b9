"""Source connectors (shapefile binary round-trip, CSV modes, URL
generation) and spatial kernel correctness (UTM transform vs known
coordinates, centroid/area/point-in-polygon/validity)."""

from __future__ import annotations

import datetime
import struct

import numpy as np
import pytest

from lakehouse_spain_mobility_spark.operators import spatial
from lakehouse_spain_mobility_spark.sources import shapefile as shp
from lakehouse_spain_mobility_spark.sources.csv import read_csv_all_varchar, read_csv_inferred
from lakehouse_spain_mobility_spark.sources.http import mitma_daily_urls


def _write_test_shapefile(base_path: str, polys: list[list[tuple[float, float]]], attrs: list[dict]):
    """Emit a minimal polygon .shp + .dbf pair (the writer mirror of the
    reader — independent structs, so a reader bug can't self-cancel)."""
    records = b""
    for i, ring in enumerate(polys):
        pts = ring + [ring[0]]
        xs, ys = [p[0] for p in pts], [p[1] for p in pts]
        content = struct.pack("<i", 5)
        content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        content += struct.pack("<ii", 1, len(pts))
        content += struct.pack("<i", 0)
        for x, y in pts:
            content += struct.pack("<dd", x, y)
        records += struct.pack(">ii", i + 1, len(content) // 2) + content
    xs = [p[0] for ring in polys for p in ring]
    ys = [p[1] for ring in polys for p in ring]
    header = struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, (100 + len(records)) // 2)
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack("<8d", min(xs), min(ys), max(xs), max(ys), 0, 0, 0, 0)
    with open(base_path + ".shp", "wb") as f:
        f.write(header + records)

    fields = [(k, 10) for k in attrs[0]]
    record_len = 1 + sum(fl for _, fl in fields)
    dbf_header = struct.pack(
        "<BBBBihh20x", 3, 24, 1, 1, len(attrs), 33 + 32 * len(fields), record_len
    )
    fdesc = b""
    for name, flen in fields:
        fdesc += struct.pack("<11sc4xBB14x", name.encode(), b"C", flen, 0)
    body = b""
    for rec in attrs:
        body += b" " + b"".join(str(rec[k]).ljust(10)[:10].encode() for k, _ in fields)
    with open(base_path + ".dbf", "wb") as f:
        f.write(dbf_header + fdesc + b"\x0d" + body + b"\x1a")


def test_shapefile_round_trip(spark, tmp_path):
    base = str(tmp_path / "sections")
    square = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    tri = [(2.0, 2.0), (3.0, 2.0), (2.5, 3.0)]
    _write_test_shapefile(
        base, [square, tri],
        [{"CUSEC": "4625001001", "CUMUN": "46250"}, {"CUSEC": "4625101001", "CUMUN": "46251"}],
    )
    df = shp.read_shapefile(spark, base + ".shp")
    rows = {r["CUSEC"]: r for r in df.collect()}
    assert set(rows) == {"4625001001", "4625101001"}
    assert rows["4625001001"]["geom"].startswith("POLYGON")
    rings = spatial.parse_polygon_rings(rows["4625001001"]["geom"])
    assert len(rings) == 1 and len(rings[0]) == 5
    a, cx, cy = spatial.ring_area_centroid(rings[0])
    assert abs(abs(a) - 1.0) < 1e-9 and abs(cx - 0.5) < 1e-9 and abs(cy - 0.5) < 1e-9


def test_geom_stats_vectorized_matches_loop():
    """The batch-vectorized st_geom_stats path must agree with the per-row
    loop on simple polygons (integer and exact-fraction coords, degenerate
    slivers, CW and CCW rings), and decline (None) on anything else."""
    import pandas as pd

    wkts = [
        "POLYGON ((0 0, 100 0, 100 120, 0 120, 0 0))",
        "POLYGON ((5 5, 9 5, 9 8, 5 8, 5 5))",
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))",  # clockwise (negative area)
        "POLYGON ((1 1, 2 1, 3 1, 1 1))",  # zero-area sliver -> mean fallback
        "POLYGON ((0.5 0.25, 4.5 0.25, 4.5 3.25, 0.5 3.25, 0.5 0.25))",
        "POLYGON ((-5 -7, 13 -7, 13 2, -5 2, -5 -7))",
    ]
    s = pd.Series(wkts)
    fast = spatial._geom_stats_vectorized(s)
    assert fast is not None
    # the loop body, inlined (st_geom_stats is a pandas_udf wrapper)
    loop = []
    for w in wkts:
        rings = spatial.parse_polygon_rings(w)
        area = abs(spatial.ring_area_centroid(rings[0])[0])
        a, cx, cy = spatial.ring_area_centroid(rings[0])
        allp = rings[0]
        lon, lat = (cx, cy) if a != 0.0 else (allp[:, 0].mean(), allp[:, 1].mean())
        loop.append((area, lon, lat, allp[:, 0].min(), allp[:, 1].min(),
                     allp[:, 0].max(), allp[:, 1].max()))
    for i, (area, lon, lat, xmin, ymin, xmax, ymax) in enumerate(loop):
        r = fast.iloc[i]
        assert r["area"] == area and r["lon"] == lon and r["lat"] == lat, (i, dict(r))
        assert (r["xmin"], r["ymin"], r["xmax"], r["ymax"]) == (xmin, ymin, xmax, ymax)
    # non-simple shapes decline to the loop
    assert spatial._geom_stats_vectorized(pd.Series(["MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))"])) is None
    assert spatial._geom_stats_vectorized(pd.Series([None], dtype=object)) is None
    assert spatial._geom_stats_vectorized(pd.Series(["POLYGON ((0 0, 1 0, 0 0))", "not wkt"])) is None
    assert spatial._geom_stats_vectorized(pd.Series([], dtype=object)) is None
    # the ADVICE r9 #1 exactness gate: coordinates whose summation-order
    # equivalence is NOT provable decline to the loop — non-dyadic floats,
    # out-of-bound magnitudes, and long rings (even with integer coords)
    assert spatial._geom_stats_vectorized(
        pd.Series(["POLYGON ((0.1 0, 1 0, 1 1, 0.1 0))"])) is None
    assert spatial._geom_stats_vectorized(
        pd.Series(["POLYGON ((0 0, 800000 0, 800000 4000000, 0 0))"])) is None
    long_ring = "POLYGON ((" + ", ".join(
        f"{i} {i % 3}" for i in range(70)) + ", 0 0))"
    assert spatial._geom_stats_vectorized(pd.Series([long_ring])) is None


def test_csv_modes(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("a;b;c\n1;x;2.5\nbad;;row\n3;y;4.0\n", encoding="utf-8")
    allv = read_csv_all_varchar(spark, str(p), sep=";")
    assert all(f.dataType.simpleString() == "string" for f in allv.schema.fields)
    inf = read_csv_inferred(spark, str(p), sep=";")
    assert inf.count() == 3  # bad row survives as strings or nulls per inference
    assert dict(inf.dtypes)["b"] == "string"


def test_csv_gzip_transparent(spark, tmp_path):
    """S1 reads daily CSV.gz: Spark decompresses by extension, all-varchar
    schema keeps malformed content (ignore_errors semantics)."""
    import gzip

    p = tmp_path / "day.csv.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("date,hour,zone,trips\n20230201,7,4625001001,55.5\n20230201,xx,4625001002,bad\n")
    df = read_csv_all_varchar(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2  # malformed values survive as strings
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)


def test_mitma_url_generation():
    urls = mitma_daily_urls(
        datetime.date(2023, 2, 1),
        datetime.date(2023, 2, 3),
        "https://example.org/{yyyymm}/{yyyymmdd}_trips.csv.gz",
    )
    assert urls == [
        "https://example.org/202302/20230201_trips.csv.gz",
        "https://example.org/202302/20230202_trips.csv.gz",
        "https://example.org/202302/20230203_trips.csv.gz",
    ]


def test_utm30n_transform_known_point():
    """Puerta del Sol, Madrid: UTM30N ETRS89 ≈ (440300 E, 4474220 N) →
    WGS84 ≈ (-3.7036, 40.4168); series accuracy well under 1e-6 deg."""
    lon, lat = spatial.utm30n_to_wgs84(np.array([440300.0]), np.array([4474220.0]))
    assert abs(lon[0] - -3.7036) < 0.002
    assert abs(lat[0] - 40.4168) < 0.002


def test_point_in_polygon_and_validity():
    square = spatial.parse_polygon_rings("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")[0]
    assert spatial.point_in_ring(1.0, 1.0, square)
    assert not spatial.point_in_ring(3.0, 1.0, square)
    assert spatial.ring_is_valid(square)
    bowtie = spatial.parse_polygon_rings("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")[0]
    assert not spatial.ring_is_valid(bowtie)


def test_polygon_predicates():
    big = spatial.parse_polygon_rings("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    small = spatial.parse_polygon_rings("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
    far = spatial.parse_polygon_rings("POLYGON ((20 20, 21 20, 21 21, 20 21, 20 20))")
    overlap = spatial.parse_polygon_rings("POLYGON ((9 9, 12 9, 12 12, 9 12, 9 9))")
    assert spatial.polygon_contains(big, small)
    assert not spatial.polygon_contains(big, overlap)
    assert spatial.polygons_intersect(big, small)
    assert spatial.polygons_intersect(big, overlap)
    assert not spatial.polygons_intersect(big, far)


def test_polygon_predicate_udf_variants(spark):
    """All four parameterized predicates of the region-extraction UDF
    (P10: intersects/contains/within/overlaps)."""
    from pyspark.sql import functions as F

    region = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    df = spark.createDataFrame(
        [
            ("inside", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"),
            ("straddle", "POLYGON ((9 9, 12 9, 12 12, 9 12, 9 9))"),
            ("outside", "POLYGON ((20 20, 21 20, 21 21, 20 21, 20 20))"),
        ],
        "name string, wkt string",
    )
    got = {}
    for pred in ("intersects", "contains", "within", "overlaps"):
        udf = spatial.make_polygon_predicate_udf(region, pred)
        got[pred] = {r["name"] for r in df.filter(udf(F.col("wkt"))).collect()}
    assert got["intersects"] == {"inside", "straddle"}
    assert got["contains"] == {"inside"}
    assert got["within"] == set()
    assert got["overlaps"] == {"straddle"}


def test_orc_round_trip(spark, tmp_path):
    """ORC is the second columnar format Spark ships a vectorized
    reader/writer for; verify the full fidelity loop (types incl.
    timestamp) and predicate pushdown survive the format switch."""
    from lakehouse_spain_mobility_spark.queries.tables import load
    from lakehouse_spain_mobility_spark.plans import inspect as pi
    import pyspark.sql.functions as F

    src = load(spark, "/root/testdata/sf0.001", "orders")
    p = str(tmp_path / "orders_orc")
    src.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == src.schema
    assert back.count() == src.count()
    filtered = back.filter(F.col("o_orderkey") < 100).select("o_orderkey")
    pushed = pi.pushed_filters(filtered)
    assert any("o_orderkey" in f for f in pushed), pushed


def test_jsonl_round_trip(spark, tmp_path):
    """JSON-lines write/read with explicit schema on read (schema
    inference costs an extra pass — production path always supplies
    one)."""
    from lakehouse_spain_mobility_spark.queries.tables import load

    src = load(spark, "/root/testdata/sf0.001", "documents")
    p = str(tmp_path / "docs_jsonl")
    src.write.json(p)
    back = spark.read.schema(src.schema).json(p)
    assert back.count() == src.count()
    a = sorted(r["doc_id"] for r in src.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    assert a == b


def test_spatial_dissolve_matches_independent_geometry(spark):
    """J7 driver-signal query: the WKT-parser/shoelace/union path must
    reproduce the closed-form rectangle geometry — area_sum = Σ w·h, the
    dissolved centroid is the area-weighted midpoint mean, and it falls
    inside the group bbox."""
    from lakehouse_spain_mobility_spark.queries import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    rows = {r["grp"]: r.asDict() for r in reg["spatial_dissolve"].build(spark, sf).collect()}
    import pandas as pd

    c = pd.read_parquet(f"{sf}/customer.parquet")["c_custkey"]
    exp = {}
    for k in c:
        g = int(k % 25)
        x0, y0 = int(k % 50) * 100, int(k % 37) * 100
        w, h = 100 + int(k % 7) * 20, 100 + int(k % 11) * 10
        a = w * h
        e = exp.setdefault(g, {"n": 0, "area": 0, "sx": 0.0, "sy": 0.0})
        e["n"] += 1
        e["area"] += a
        e["sx"] += (x0 + w / 2.0) * a
        e["sy"] += (y0 + h / 2.0) * a
    assert set(rows) == set(exp)
    for g, e in exp.items():
        r = rows[g]
        assert r["n_parts"] == e["n"]
        assert r["area_sum"] == e["area"]
        assert r["cx_micro"] == round(e["sx"] / e["area"] * 1e6)
        assert r["cy_micro"] == round(e["sy"] / e["area"] * 1e6)
        assert r["xmin"] <= r["cx_micro"] / 1e6 <= r["xmax"]
        assert r["ymin"] <= r["cy_micro"] / 1e6 <= r["ymax"]
