"""BQ2 (gravity model) and BQ3 (long-trip dependency) instantiated on the
TPC-H-ish testdata.

Mapping: nations play municipalities. Deterministic synthetic centroids
derive from ``n_nationkey`` (a 5×5 grid around Madrid); population = count
of customers per nation; avg_income = avg customer balance; the OD trip
matrix comes from lineitem⋈orders⋈customer(origin nation)⋈supplier
(destination nation) — a genuinely heavy join, which is why these are
bench headliners.

Distances use ``planar_km`` (IEEE-exact ops only) so the oracle matches
bit-for-bit; the production mobility pipeline uses haversine
(functions/geo.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, sql_davg, sql_dsum
from ..functions.geo import planar_km, sql_planar_km
from ..operators.gravity import assemble_gravity_data, gravity_analysis, infrastructure_ranking
from ..operators.long_trip import long_trip_dependency
from . import QuerySpec, register
from .tables import load


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.select(
        F.col("n_nationkey").alias("code"),
        (F.lit(-3.7) + (F.col("n_nationkey") % 5) * F.lit(0.8)).alias("lon"),
        (F.lit(40.4) + F.expr("n_nationkey div 5") * F.lit(0.6)).alias("lat"),
    )


# NOTE: DuckDB parses bare decimal literals as DECIMAL (exact), Spark as
# DOUBLE — cast literals to DOUBLE wherever they meet integer columns, or
# the engines do different arithmetic.
_CENTROIDS_SQL = """
    SELECT n_nationkey AS code,
           CAST(-3.7 AS DOUBLE) + (n_nationkey % 5) * CAST(0.8 AS DOUBLE) AS lon,
           CAST(40.4 AS DOUBLE) + (n_nationkey // 5) * CAST(0.6 AS DOUBLE) AS lat
    FROM nation
"""


def _population(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").alias("code")).agg(F.count("*").alias("population"))


_POPULATION_SQL = "SELECT c_nationkey AS code, COUNT(*) AS population FROM customer GROUP BY 1"


def _economy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    from ..functions.deterministic import davg

    return c.groupBy(F.col("c_nationkey").alias("code")).agg(davg(F.col("c_acctbal")).alias("avg_income"))


_ECONOMY_SQL = f"SELECT c_nationkey AS code, {sql_davg('c_acctbal')} AS avg_income FROM customer GROUP BY 1"


def _od_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone→municipality-style OD rollup (dags/gravity/aggregate_trips.py:10-19)
    over the fact join. supplier/customer/nation are broadcast; the only
    shuffle is lineitem⨝orders on l_orderkey and the final OD aggregation."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("origin_code"),
            F.col("s_nationkey").alias("dest_code"),
        )
        .agg(dsum(F.col("l_quantity")).alias("total_trips"))
    )


_OD_TRIPS_SQL = f"""
    SELECT c.c_nationkey AS origin_code, s.s_nationkey AS dest_code,
           {sql_dsum('l.l_quantity')} AS total_trips
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2
"""


def _distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cross join + theta filter (dags/gravity/create_distances.py:
    12-22); one side broadcast (municipality-scale dims — SURVEY §2.4 J3)."""
    cen = _centroids(spark, sf_dir)
    o = cen.select(
        F.col("code").alias("origin_code"), F.col("lon").alias("o_lon"), F.col("lat").alias("o_lat")
    )
    d = cen.select(
        F.col("code").alias("dest_code"), F.col("lon").alias("d_lon"), F.col("lat").alias("d_lat")
    )
    dist = planar_km(F.col("o_lon"), F.col("o_lat"), F.col("d_lon"), F.col("d_lat"))
    return (
        o.crossJoin(F.broadcast(d))
        .filter(F.col("origin_code") != F.col("dest_code"))
        .withColumn("distance_km", dist)
        .filter(F.col("distance_km") > 0.1)
        .select("origin_code", "dest_code", "distance_km")
    )


_PLANAR = sql_planar_km("o.lon", "o.lat", "d.lon", "d.lat")
_DISTANCES_SQL = f"""
    SELECT o.code AS origin_code, d.code AS dest_code, {_PLANAR} AS distance_km
    FROM ({_CENTROIDS_SQL}) o CROSS JOIN ({_CENTROIDS_SQL}) d
    WHERE o.code <> d.code AND {_PLANAR} > 0.1
"""

_GRAVITY_DATA_SQL = f"""
WITH centroids AS ({_CENTROIDS_SQL}),
population AS ({_POPULATION_SQL}),
economy AS ({_ECONOMY_SQL}),
trips AS ({_OD_TRIPS_SQL}),
distances AS ({_DISTANCES_SQL})
SELECT di.origin_code, di.dest_code, di.distance_km,
       po.population, ec.avg_income, tr.total_trips
FROM distances di
LEFT JOIN population po ON di.origin_code = po.code
LEFT JOIN economy ec ON di.dest_code = ec.code
LEFT JOIN trips tr ON di.origin_code = tr.origin_code AND di.dest_code = tr.dest_code
WHERE COALESCE(po.population, 0) > 0 AND COALESCE(ec.avg_income, 0) > 0
"""


def q_gravity_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assemble_gravity_data(
        _distances(spark, sf_dir),
        _population(spark, sf_dir),
        _economy(spark, sf_dir),
        _od_trips(spark, sf_dir),
    )


_K_EXPR = (
    f"({sql_dsum('total_trips * distance_km * distance_km')}"
    f" / NULLIF({sql_dsum('population * avg_income')}, 0.0))"
)

_GRAVITY_ANALYSIS_SQL = f"""
WITH gravity_data AS ({_GRAVITY_DATA_SQL}),
kk AS (
    SELECT {_K_EXPR} AS k FROM gravity_data WHERE total_trips IS NOT NULL
)
SELECT origin_code, dest_code, distance_km,
       population AS origin_population,
       avg_income AS dest_avg_income,
       COALESCE(total_trips, 0.0) AS actual_trips,
       (kk.k * (population * avg_income) / (distance_km * distance_km)) AS predicted_trips,
       CASE WHEN (kk.k * (population * avg_income) / (distance_km * distance_km)) > 0
            THEN (COALESCE(total_trips, 0.0) - (kk.k * (population * avg_income) / (distance_km * distance_km)))
                 / (kk.k * (population * avg_income) / (distance_km * distance_km))
            ELSE NULL END AS mismatch_ratio,
       CASE WHEN (CASE WHEN (kk.k * (population * avg_income) / (distance_km * distance_km)) > 0
                       THEN (COALESCE(total_trips, 0.0) - (kk.k * (population * avg_income) / (distance_km * distance_km)))
                            / (kk.k * (population * avg_income) / (distance_km * distance_km))
                       ELSE NULL END) > 0.5 THEN 'UNDER_PREDICTED'
            WHEN (CASE WHEN (kk.k * (population * avg_income) / (distance_km * distance_km)) > 0
                       THEN (COALESCE(total_trips, 0.0) - (kk.k * (population * avg_income) / (distance_km * distance_km)))
                            / (kk.k * (population * avg_income) / (distance_km * distance_km))
                       ELSE NULL END) < -0.5 THEN 'OVER_PREDICTED'
            WHEN (CASE WHEN (kk.k * (population * avg_income) / (distance_km * distance_km)) > 0
                       THEN 1 ELSE NULL END) IS NOT NULL THEN 'BALANCED'
            ELSE 'UNKNOWN' END AS status
FROM gravity_data CROSS JOIN kk
"""


def q_gravity_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gravity_analysis(q_gravity_data(spark, sf_dir))


_GRAVITY_RANKING_SQL = f"""
WITH analysis AS ({_GRAVITY_ANALYSIS_SQL})
SELECT origin_code,
       {sql_davg('mismatch_ratio')} AS avg_mismatch_ratio,
       MAX(origin_population) AS origin_population,
       COUNT(*) AS n_destinations,
       CASE WHEN {sql_davg('mismatch_ratio')} > 0.5 THEN 'INFRASTRUCTURE_DEFICIT'
            WHEN {sql_davg('mismatch_ratio')} < -0.5 THEN 'INFRASTRUCTURE_SURPLUS'
            ELSE 'ADEQUATE' END AS infrastructure_status
FROM analysis
WHERE mismatch_ratio IS NOT NULL
GROUP BY origin_code
ORDER BY avg_mismatch_ratio DESC, origin_code
"""


def q_gravity_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return infrastructure_ranking(q_gravity_analysis(spark, sf_dir))


# --- BQ3: long-trip dependency ---------------------------------------------
# Study area = bbox over origin centroids (lon ≤ -1.5, lat ≤ 41.5); dests
# with n_nationkey % 7 = 0 have no known centroid → NULL-distance path.
def q_long_trip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cen = _centroids(spark, sf_dir)
    return long_trip_dependency(
        _od_trips(spark, sf_dir),
        cen,
        origin_filter=(F.col("o_lon") <= -1.5) & (F.col("o_lat") <= 41.5),
        long_km=100.0,
        dest_centroids=cen.filter(F.col("code") % 7 != 0),
    )


_DPLANAR = sql_planar_km("t.o_lon", "t.o_lat", "d.lon", "d.lat")
_LONG_TRIP_SQL = f"""
WITH centroids AS ({_CENTROIDS_SQL}),
trips AS ({_OD_TRIPS_SQL}),
origin_scoped AS (
    SELECT tr.origin_code, tr.dest_code, tr.total_trips, o.lon AS o_lon, o.lat AS o_lat
    FROM trips tr JOIN centroids o ON tr.origin_code = o.code
    WHERE o.lon <= -1.5 AND o.lat <= 41.5
),
scored AS (
    SELECT t.origin_code, t.total_trips,
           CASE WHEN d.lon IS NULL THEN NULL ELSE {_DPLANAR} END AS distance_km
    FROM origin_scoped t
    LEFT JOIN (SELECT * FROM centroids WHERE code % 7 <> 0) d ON t.dest_code = d.code
),
agg AS (
    SELECT origin_code,
           {sql_dsum('total_trips')} AS total_trips,
           {sql_dsum('CASE WHEN distance_km IS NOT NULL THEN total_trips ELSE 0.0 END')} AS known_distance_trips,
           {sql_dsum('CASE WHEN distance_km IS NOT NULL AND distance_km > 100.0 THEN total_trips ELSE 0.0 END')} AS long_trips
    FROM scored
    GROUP BY origin_code
)
SELECT origin_code, total_trips, known_distance_trips, long_trips,
       (long_trips / NULLIF(known_distance_trips, 0.0)) AS long_trip_ratio,
       CASE WHEN (long_trips / NULLIF(known_distance_trips, 0.0)) > 0.6 THEN 'HIGH_DEPENDENCY'
            WHEN (long_trips / NULLIF(known_distance_trips, 0.0)) > 0.3 THEN 'MEDIUM_DEPENDENCY'
            WHEN (long_trips / NULLIF(known_distance_trips, 0.0)) IS NOT NULL THEN 'LOW_DEPENDENCY'
            ELSE 'UNKNOWN' END AS dependency_level
FROM agg
"""


for _spec in [
    QuerySpec("gravity_data", q_gravity_data, _GRAVITY_DATA_SQL, "J2,J3,A3,A5,P9,P11", False,
              "Gravity feature assembly: cross-join distances ⟕ dims ⟕ OD trips"),
    QuerySpec("gravity_analysis", q_gravity_analysis, _GRAVITY_ANALYSIS_SQL, "A5,J2,J3", True,
              "BQ2: calibrated gravity prediction + mismatch + status buckets"),
    QuerySpec("gravity_ranking", q_gravity_ranking, _GRAVITY_RANKING_SQL, "A4,A7,P5", False,
              "BQ2 ranking: per-origin infrastructure status"),
    QuerySpec("long_trip_dependency", q_long_trip, _LONG_TRIP_SQL, "J5,J6,A6,P9", True,
              "BQ3: long-distance-trip dependency per origin"),
]:
    register(_spec)
