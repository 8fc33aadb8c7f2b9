"""Property-based tests (hypothesis) for the pure-Python kernels —
no SparkSession needed, so these run in milliseconds."""

from __future__ import annotations

import datetime
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_spain_mobility_spark.functions.holidays_es import easter_sunday, spain_holidays
from lakehouse_spain_mobility_spark.operators import spatial


@given(st.integers(min_value=1900, max_value=2199))
def test_easter_always_in_valid_window(year):
    e = easter_sunday(year)
    assert e.weekday() == 6  # Sunday
    assert datetime.date(year, 3, 22) <= e <= datetime.date(year, 4, 25)


@given(st.integers(min_value=2000, max_value=2100))
def test_holidays_distinct_and_sorted(year):
    days = spain_holidays(year)
    assert days == sorted(days)
    assert len(set(days)) == len(days) == 10


@settings(max_examples=50)
@given(
    st.lists(
        st.tuples(
            st.floats(-100, 100, allow_nan=False), st.floats(-100, 100, allow_nan=False)
        ),
        min_size=3,
        max_size=12,
        unique=True,
    )
)
def test_convex_ring_centroid_inside_bbox(pts):
    """For any simple ring built from a convex hull of points, the
    shoelace centroid lies inside the bbox and the ring validates."""
    arr = np.array(pts)
    center = arr.mean(axis=0)
    order = np.argsort(np.arctan2(arr[:, 1] - center[1], arr[:, 0] - center[0]))
    ring = arr[order]
    a, cx, cy = spatial.ring_area_centroid(ring)
    if a == 0.0:  # collinear degenerate input
        return
    assert ring[:, 0].min() - 1e-9 <= cx <= ring[:, 0].max() + 1e-9
    assert ring[:, 1].min() - 1e-9 <= cy <= ring[:, 1].max() + 1e-9


@settings(max_examples=50)
@given(
    st.floats(100000, 900000, allow_nan=False),
    st.floats(4000000, 4800000, allow_nan=False),
)
def test_utm_transform_plausible_range(easting, northing):
    """Any in-zone UTM 30N coordinate maps into Iberian-ish lon/lat."""
    lon, lat = spatial.utm30n_to_wgs84(np.array([easting]), np.array([northing]))
    assert -10.0 < lon[0] < 4.0
    assert 34.0 < lat[0] < 46.0
    assert math.isfinite(lon[0]) and math.isfinite(lat[0])


@settings(max_examples=30)
@given(st.text(alphabet="ab c.d,", min_size=0, max_size=40))
def test_wkt_parse_never_crashes_on_garbage(s):
    assert spatial.parse_polygon_rings(s) == []
    assert spatial.parse_point(s) is None or isinstance(spatial.parse_point(s), tuple)


def test_kmeans_invariants(spark):
    """Lloyd's algorithm contracts: inertia is monotonically non-increasing,
    every vector is assigned exactly once, and reruns are bit-identical
    (deterministic init + fixed-point centroid means)."""
    from lakehouse_spain_mobility_spark.operators.clustering import kmeans
    from lakehouse_spain_mobility_spark.queries.tables import load

    e = load(spark, "/root/testdata/sf0.01", "embeddings")
    n = e.count()
    assigned, hist = kmeans(e, "vec_id", "embedding", k=8, iters=4)
    assert len(hist) == 4
    assert all(b <= a * (1 + 1e-12) for a, b in zip(hist, hist[1:])), hist
    assert assigned.count() == n
    assert assigned.select("id").distinct().count() == n
    assert assigned.select("cluster").distinct().count() <= 8

    _, hist2 = kmeans(e, "vec_id", "embedding", k=8, iters=4)
    assert hist == hist2  # rerun determinism


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation must agree with a pure-Python
    union-find on arbitrary small graphs (chains, cliques, cycles,
    disconnected pieces — whatever hypothesis finds)."""
    from lakehouse_spain_mobility_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {v: find(v) for v in parent}

    df = spark.createDataFrame(edges, "d1 bigint, d2 bigint")
    got = {r["vertex"]: r["component"] for r in connected_components(df).collect()}
    assert got == want


def test_pq_adc_ranking_is_informative(spark):
    """PQ quality contract. The testdata embeddings are near-uniform
    random, the worst case for product quantization (measured here: even
    16×16 codebooks recover only ~3/10 exact neighbors), so exact-recall
    thresholds would test the data, not the operator. The structural
    contract instead: ADC distances are non-negative, and the ADC top-10's
    mean EXACT distance sits well below the corpus mean — the quantized
    ranking carries real signal, it is not a random draw."""
    from lakehouse_spain_mobility_spark.functions.deterministic import davg
    from lakehouse_spain_mobility_spark.operators.clustering import _assign
    from lakehouse_spain_mobility_spark.queries.pq import q_pq_adc_search
    from lakehouse_spain_mobility_spark.queries.tables import load

    import numpy as np
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    adc_rows = q_pq_adc_search(spark, sf).collect()
    assert len(adc_rows) == 10
    assert all(r["adc_ppm"] >= 0 for r in adc_rows)
    picked_mean_exact = sum(r["exact_ppm"] for r in adc_rows) / len(adc_rows)

    e = load(spark, sf, "embeddings")
    q = np.asarray(
        e.filter(F.col("vec_id") == 0).select("embedding").first()[0], dtype=np.float64
    )
    corpus_mean = (
        _assign(e, "vec_id", "embedding", q[None, :])
        .filter(F.col("id") != 0)
        .agg(davg(F.col("sqdist")))
        .first()[0]
    ) * 1e6
    assert picked_mean_exact < 0.9 * corpus_mean, (picked_mean_exact, corpus_mean)


def test_new_curation_ops_invariant_to_input_partitioning(spark):
    """Repartition-stability for the round-3 selection/webcur operators:
    hash sharding, line keep-first, CDC statuses and cluster election are
    all keyed on content/ids, never on physical layout, so re-reading the
    same table under an adversarial partitioning must reproduce the exact
    rows. (The deterministic-agg battery proves this for sums; these ops
    rely on md5 keys and rank tie-breaks instead.)"""
    from lakehouse_spain_mobility_spark.queries import load_all
    from lakehouse_spain_mobility_spark.queries import selection, webcur
    from lakehouse_spain_mobility_spark.queries import tables as T

    reg = load_all()
    sf = "/root/testdata/sf0.001"

    def rows(name):
        return sorted(map(tuple, reg[name].build(spark, sf).collect()))

    baseline = {n: rows(n) for n in ("shard_manifest", "line_dedup", "snapshot_diff")}

    orig_load = T.load

    def adversarial(spark_, sf_, name):
        # Adversarial layout: 7-way round-robin repartition of every table.
        return orig_load(spark_, sf_, name).repartition(7)

    # The query modules bound `load` at import time (`from .tables import
    # load`), so patching tables.load alone never reaches them — patch the
    # per-module bindings the builders actually call, and prove the patch
    # bites by checking the physical partitioning actually changed.
    patched = [(T, "load"), (webcur, "load"), (selection, "load")]
    try:
        for mod, attr in patched:
            setattr(mod, attr, adversarial)
        assert webcur.load(spark, sf, "documents").rdd.getNumPartitions() == 7
        for n, want in baseline.items():
            assert rows(n) == want, f"{n} changed under repartition"
    finally:
        for mod, attr in patched:
            setattr(mod, attr, orig_load)
