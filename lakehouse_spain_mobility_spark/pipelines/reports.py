"""Report/visualization edge (SURVEY §2.2 K8/K9, U4): gold → pandas →
artifacts.

The reference renders matplotlib/reportlab PDFs and Kepler.gl HTML
(dags/mitma/generate_report.py, dags/bussiness_layer/generate_report.py,
dags/gravity/create_map.py). Those libraries are absent here, so the
artifact layer degrades gracefully: CSV + markdown summary always; PDF
only if reportlab importable; the map as a self-contained GeoJSON HTML
(Leaflet-from-CDN) instead of Kepler. The data path — parameterized gold
query with the disjunctive join, IN-scoping, pandas handoff, peak-hour
detection — is the reference's, re-expressed in DataFrame ops.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import Warehouse
from ..functions.deterministic import davg, dstddev_samp, dsum
from ..functions.scalar import DAY_TYPE_LABELS

try:  # pragma: no cover - optional dependency
    import matplotlib  # noqa: F401

    HAS_MPL = True
except ImportError:
    HAS_MPL = False


def district_report_frame(wh: Warehouse, district_id: str, year: int | None = None) -> DataFrame:
    """BQ1 report query (dags/bussiness_layer/generate_report.py:107-131):
    gold patterns joined to geometry on census-section OR district id (J4,
    authored as a union of two equi-joins), optional year predicate (the
    runtime column probe — :62-74), rolled up per (day_type, hour_period)."""
    gold = wh.read("gold_typical_day_patterns")
    geo = wh.read("gold_geometry_wgs84").filter(F.col("district_id") == district_id)
    if year is not None and "year" in geo.columns:  # optional-column probe
        geo = geo.filter(F.col("year") == year)
    geo_b = F.broadcast(geo.select("census_section_id", "district_id").distinct())

    by_section = gold.join(geo_b, gold.origin_zone == geo_b.census_section_id)
    by_district = gold.join(
        geo_b, gold.origin_zone == geo_b.district_id
    ).filter(F.col("origin_zone") != F.col("census_section_id"))
    scoped = by_section.unionByName(by_district)

    return (
        scoped.groupBy("day_type", "hour_period")
        .agg(
            dsum(F.col("total_trips")).alias("total_trips"),
            davg(F.col("total_trips")).alias("avg_trips"),
            F.coalesce(dstddev_samp(F.col("total_trips")), F.lit(0.0)).alias("std_trips"),
            davg(F.col("num_days_observed").cast("double")).alias("avg_days_observed"),
        )
        .orderBy("day_type", "hour_period")
    )


def generate_district_report(
    wh: Warehouse,
    district_id: str,
    out_dir: str,
    year: int | None = None,
    store=None,
) -> dict[str, str]:
    """CSV + markdown + PDF report with per-day-type peak hours
    (dags/mitma/generate_report.py:41-171 — peak via idxmax after collect,
    kept pandas-side exactly as the reference does since report data is
    tiny). The PDF is always produced via the vendored writer
    (pipelines/pdfgen.py — the reference's reportlab path,
    dags/bussiness_layer/generate_report.py:137-235, is never silently
    skipped). If an ``ArtifactStore`` is given, every artifact is also
    pushed to it (the reference's boto3 upload step,
    dags/mitma/generate_report.py:67-88) and the returned dict carries the
    store URIs under ``<kind>_uri`` keys. Returns artifact paths."""
    from .pdfgen import write_pdf

    os.makedirs(out_dir, exist_ok=True)
    pdf = district_report_frame(wh, district_id, year).toPandas()
    csv_path = os.path.join(out_dir, f"report_{district_id}.csv")
    pdf.to_csv(csv_path, index=False)

    lines = [f"# Mobility report — district {district_id}", ""]
    if pdf.empty:
        lines.append("No data for this district.")
    else:
        lines.append("| day type | peak hour | peak trips | daily total |")
        lines.append("|---|---|---|---|")
        for day_type, day_data in pdf.groupby("day_type"):
            peak = day_data.loc[day_data["total_trips"].idxmax()]
            label = DAY_TYPE_LABELS.get(int(day_type), str(day_type))
            lines.append(
                f"| {label} | {int(peak['hour_period']):02d}:00 "
                f"| {peak['total_trips']:.1f} | {day_data['total_trips'].sum():.1f} |"
            )
    md_path = os.path.join(out_dir, f"report_{district_id}.md")
    with open(md_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")

    pdf_path = os.path.join(out_dir, f"report_{district_id}.pdf")
    write_pdf(pdf_path, f"Mobility report - district {district_id}", lines[2:])

    artifacts = {"csv": csv_path, "markdown": md_path, "pdf": pdf_path}
    if store is not None:
        for kind, path in dict(artifacts).items():
            key = f"{district_id}/{os.path.basename(path)}"
            artifacts[f"{kind}_uri"] = store.put(path, key)
    return artifacts


def run_bq1_all_districts(wh: Warehouse, out_dir: str, year: int | None = None) -> dict[str, dict]:
    """EP3/BQ1 driver loop (dags/bussiness_layer/business_questions_dag.py:
    129-167): enumerate districts via SELECT DISTINCT district_id over the
    extracted gold geometry (P12), then emit one report per district."""
    districts = [
        r["district_id"]
        for r in wh.read("gold_geometry_wgs84")
        .select("district_id")
        .distinct()
        .orderBy("district_id")
        .collect()
    ]
    return {d: generate_district_report(wh, d, out_dir, year) for d in districts}


def _ranking_features(wh: Warehouse) -> list[dict]:
    """Shared data path for both map artifacts: ranking metrics joined to
    the municipality polygons, as GeoJSON features (the frame kepler/leaflet
    render — dags/gravity/create_map.py:22-40)."""
    ranking = wh.read("gold_municipality_infrastructure_ranking")
    geo = wh.read("gold_geometry_wgs84")
    joined = (
        geo.join(
            F.broadcast(ranking), geo.municipality_id == ranking.origin_code
        )
        .select(
            "municipality_id", "geometry", "avg_mismatch_ratio",
            "n_destinations", "infrastructure_status",
        )
        .toPandas()
    )
    features = []
    from ..operators.spatial import parse_polygon_rings

    for _, row in joined.iterrows():
        rings = parse_polygon_rings(row["geometry"])
        if not rings:
            continue
        features.append(
            {
                "type": "Feature",
                "properties": {
                    "municipality_id": row["municipality_id"],
                    "avg_mismatch_ratio": row["avg_mismatch_ratio"],
                    "n_destinations": int(row["n_destinations"]),
                    "status": row["infrastructure_status"],
                },
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[float(x), float(y)] for x, y in rings[0]]],
                },
            }
        )
    return features


def ranking_map_html(wh: Warehouse, out_path: str) -> str:
    """Choropleth map of the infrastructure ranking
    (dags/gravity/create_map.py:5-58): municipality polygons dissolved and
    joined to the metrics, emitted as GeoJSON in a self-contained Leaflet
    HTML page (dependency-light fallback renderer)."""
    features = _ranking_features(wh)
    geojson = json.dumps({"type": "FeatureCollection", "features": features})
    html = f"""<!DOCTYPE html><html><head>
<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>#map{{height:100vh}}</style></head><body><div id="map"></div><script>
var data = {geojson};
var map = L.map('map');
var layer = L.geoJSON(data, {{style: function(f) {{
  var s = f.properties.status;
  return {{color: s === 'INFRASTRUCTURE_DEFICIT' ? '#d7301f' :
                 s === 'INFRASTRUCTURE_SURPLUS' ? '#2b8cbe' : '#31a354'}};
}}}}).bindPopup(function(l) {{
  return l.feature.properties.municipality_id + ': ' + l.feature.properties.status;
}}).addTo(map);
map.fitBounds(layer.getBounds());
</script></body></html>"""
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(html)
    return out_path


def kepler_map_html(wh: Warehouse, out_path: str) -> str:
    """Kepler.gl-style interactive map artifact — the K9 parity renderer for
    ``KeplerGl(...).save_to_html`` (dags/gravity/create_map.py:46-54).

    Emits kepler.gl's documented export shape: the UMD bundle + React from
    CDN, and one ``addDataToMap`` payload (kepler's public action API) with
    a ``datasets`` entry in processor row format (typed ``fields`` +
    ``rows``, geometry in a ``_geojson`` column) and a ``config`` in
    kepler's v1 map-config schema (a geojson layer colored by
    infrastructure_status). The payload is embedded as an inert
    ``application/json`` script block and dispatched on load, so the
    artifact is inspectable (and testable) without executing JS."""
    features = _ranking_features(wh)
    rows = [
        [
            json.dumps(f["geometry"]),
            f["properties"]["municipality_id"],
            f["properties"]["avg_mismatch_ratio"],
            f["properties"]["n_destinations"],
            f["properties"]["status"],
        ]
        for f in features
    ]
    # map centering: mean of first-ring first-vertex per polygon
    lons = [f["geometry"]["coordinates"][0][0][0] for f in features] or [0.0]
    lats = [f["geometry"]["coordinates"][0][0][1] for f in features] or [0.0]
    payload = {
        "datasets": [
            {
                "info": {"id": "infrastructure", "label": "infrastructure"},
                "data": {
                    "fields": [
                        {"name": "_geojson", "type": "geojson"},
                        {"name": "municipality_id", "type": "string"},
                        {"name": "avg_mismatch_ratio", "type": "real"},
                        {"name": "n_destinations", "type": "integer"},
                        {"name": "infrastructure_status", "type": "string"},
                    ],
                    "rows": rows,
                },
            }
        ],
        "config": {
            "version": "v1",
            "config": {
                "visState": {
                    "layers": [
                        {
                            "id": "ranking",
                            "type": "geojson",
                            "config": {
                                "dataId": "infrastructure",
                                "label": "infrastructure",
                                "columns": {"geojson": "_geojson"},
                                "visConfig": {"opacity": 0.6, "stroked": True},
                                "colorField": {
                                    "name": "infrastructure_status",
                                    "type": "string",
                                },
                            },
                        }
                    ]
                },
                "mapState": {
                    "latitude": sum(lats) / len(lats),
                    "longitude": sum(lons) / len(lons),
                    "zoom": 7,
                },
            },
        },
        "options": {"centerMap": False, "readOnly": False},
    }
    html = f"""<!DOCTYPE html><html><head><meta charset="utf-8"/>
<title>infrastructure_map</title>
<script src="https://unpkg.com/react@18/umd/react.production.min.js"></script>
<script src="https://unpkg.com/react-dom@18/umd/react-dom.production.min.js"></script>
<script src="https://unpkg.com/redux@4/dist/redux.min.js"></script>
<script src="https://unpkg.com/react-redux@8/dist/react-redux.min.js"></script>
<script src="https://unpkg.com/styled-components@5/dist/styled-components.min.js"></script>
<script src="https://unpkg.com/kepler.gl@3/umd/keplergl.min.js"></script>
<style>body{{margin:0}} #app{{height:100vh}}</style></head><body>
<div id="app"></div>
<script type="application/json" id="kepler-payload">{json.dumps(payload)}</script>
<script>
(function() {{
  var payload = JSON.parse(document.getElementById('kepler-payload').textContent);
  var reducers = Redux.combineReducers({{keplerGl: KeplerGl.keplerGlReducer}});
  var middlewares = KeplerGl.enhanceReduxMiddleware([]);
  var store = Redux.createStore(reducers, {{}},
      Redux.compose(Redux.applyMiddleware.apply(null, middlewares)));
  var app = React.createElement(ReactRedux.Provider, {{store: store}},
      React.createElement(KeplerGl.KeplerGl, {{
        id: 'map', width: window.innerWidth, height: window.innerHeight,
      }}));
  ReactDOM.render(app, document.getElementById('app'));
  store.dispatch(KeplerGl.addDataToMap(payload));
}})();
</script></body></html>"""
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(html)
    return out_path


def dump_schemas_csv(wh: Warehouse, out_path: str) -> str:
    """Catalog schema dump (S6/K7 — dags/get_schema/get_shema.py:14):
    every table's columns to one CSV."""
    rows = ["table,column,type"]
    for t in wh.list_tables():
        for field in wh.read(t).schema.fields:
            rows.append(f"{t},{field.name},{field.dataType.simpleString()}")
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")
    return out_path
