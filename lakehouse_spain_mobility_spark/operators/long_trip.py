"""Long-trip dependency operator (BQ3).

Reference: dags/bussiness_layer/transform_gold_long_trip_dependency.py —
  trip-ID normalization CTE (:90-98), polygon semi-filter (:100-109),
  LEFT-join destination centroid with NULL-distance semantics (:111-127),
  conditional aggregation of long/known/total trips (:129-145),
  dependency-ratio projection + buckets (:147-158).

The "study polygon" membership is a bbox predicate on centroid lon/lat
(native column math); arbitrary-polygon containment lives in
``operators/spatial.py`` as a shapely pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.deterministic import xdsum
from ..functions.geo import planar_km


def long_trip_dependency(
    trips: DataFrame,  # origin_code, dest_code, total_trips
    centroids: DataFrame,  # code, lon, lat
    origin_filter,  # Column predicate over origin centroid (the study area)
    long_km: float = 15.0,
    dest_centroids: DataFrame | None = None,  # dests with known location (NULL path otherwise)
) -> DataFrame:
    if dest_centroids is None:
        dest_centroids = centroids
    o = F.broadcast(
        centroids.select(
            F.col("code").alias("_o_code"), F.col("lon").alias("o_lon"), F.col("lat").alias("o_lat")
        )
    )
    d = F.broadcast(
        dest_centroids.select(
            F.col("code").alias("_d_code"), F.col("lon").alias("d_lon"), F.col("lat").alias("d_lat")
        )
    )
    # Inner join ≡ semi-filter: centroid codes are unique post-aggregation
    # (reference re-joins to fetch the centroid, :100-109,123-124).
    origin_scoped = trips.join(o, trips.origin_code == o._o_code).filter(origin_filter)
    with_dest = origin_scoped.join(d, trips.dest_code == d._d_code, "left")
    dist = F.when(
        F.col("d_lon").isNull(), F.lit(None).cast("double")
    ).otherwise(planar_km(F.col("o_lon"), F.col("o_lat"), F.col("d_lon"), F.col("d_lat")))
    scored = with_dest.withColumn("distance_km", dist)

    agg = scored.groupBy("origin_code").agg(
        xdsum("total_trips").alias("total_trips"),
        xdsum(
            "CASE WHEN distance_km IS NOT NULL THEN total_trips ELSE 0.0 END"
        ).alias("known_distance_trips"),
        xdsum(
            f"CASE WHEN distance_km IS NOT NULL AND distance_km > {long_km} "
            "THEN total_trips ELSE 0.0 END"
        ).alias("long_trips"),
    )
    ratio = F.col("long_trips") / F.nullif(F.col("known_distance_trips"), F.lit(0.0))
    bucket = (
        F.when(ratio > 0.6, F.lit("HIGH_DEPENDENCY"))
        .when(ratio > 0.3, F.lit("MEDIUM_DEPENDENCY"))
        .when(ratio.isNotNull(), F.lit("LOW_DEPENDENCY"))
        .otherwise(F.lit("UNKNOWN"))
    )
    return agg.select(
        "origin_code",
        "total_trips",
        "known_distance_trips",
        "long_trips",
        ratio.alias("long_trip_ratio"),
        bucket.alias("dependency_level"),
    )
