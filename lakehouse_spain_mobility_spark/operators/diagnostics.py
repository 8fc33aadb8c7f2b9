"""Runtime diagnostics: partition-balance inspection.

The first question when a 100 TB stage is slow is "is one partition
holding the stage hostage?" — ``partition_sizes`` answers it from inside
the engine (spark_partition_id + one aggregation, no data movement), and
``skew_factor`` condenses it to max/mean, the number AQE's skew-join
threshold reasons about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_sizes(df: DataFrame) -> DataFrame:
    """(partition_id, n_rows) for the frame's CURRENT partitioning — a
    narrow map + tiny aggregation; safe to run on any size input."""
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count("*").alias("n_rows"))
    )


def skew_factor(df: DataFrame) -> float:
    """max/mean partition row count (1.0 = perfectly balanced). Above
    ~4-5, AQE's skew split or an explicit salt is warranted."""
    sizes = partition_sizes(df).agg(
        F.max("n_rows").alias("mx"), F.avg("n_rows").alias("mean")
    ).first()
    if not sizes["mean"]:
        return 1.0
    return float(sizes["mx"]) / float(sizes["mean"])
