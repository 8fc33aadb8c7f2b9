"""Slowly-changing-dimension type-2 history construction.

The lakehouse sibling of the storage MERGE family: given a stream of
yearly dimension snapshots, collapse consecutive identical attribute
values into validity intervals (valid_from / valid_to / version). The
snapshots are derived deterministically from facts — a customer's yearly
order-count tier — so the whole operator sits inside the differential
gate with integer/string outputs only.

Pattern: change detection with ``lag`` (island heads), then interval
closing with ``lead`` over the surviving heads — two window passes over
the same (customer, year) sort, one shuffle on c_custkey. At 100 TB this
is the standard SCD2 build: partition by the dimension key, never by
snapshot, so a year of history is one narrow window pass, and AQE handles
the hot-key tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, register
from .tables import load

_OPEN_END = 9999


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # (custkey, year) groups are nearly 1:1 with orders rows (~1.4:1), so
    # letting groupBy hash-partition on both keys buys almost no map-side
    # reduction and costs a second exchange when the windows re-cluster on
    # c_custkey alone. Repartitioning the narrow projection on c_custkey
    # up front satisfies the agg's clustered-distribution requirement
    # (hash on a subset of the grouping keys) AND the window spec, so the
    # whole build runs on ONE exchange (sf3: 3.3 s -> 1.9 s compute).
    yearly = (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            F.year("o_orderdate").alias("yr"),
        )
        .repartition("c_custkey")
        .groupBy("c_custkey", "yr")
        .agg(F.count("*").alias("cnt"))
        .select(
            "c_custkey",
            "yr",
            F.when(F.col("cnt") >= 4, F.lit("high"))
            .when(F.col("cnt") >= 2, F.lit("mid"))
            .otherwise(F.lit("low"))
            .alias("tier"),
        )
    )
    # NB: at 100 TB the repartition width follows shuffle.partitions; the
    # hot-customer tail is bounded by years-per-customer, so per-key
    # window partitions stay tiny regardless of skew.
    w = Window.partitionBy("c_custkey").orderBy("yr")
    heads = (
        yearly.withColumn("prev_tier", F.lag("tier").over(w))
        .filter(F.col("prev_tier").isNull() | (F.col("prev_tier") != F.col("tier")))
        .select("c_custkey", "yr", "tier")
    )
    wh = Window.partitionBy("c_custkey").orderBy("yr")
    return heads.select(
        "c_custkey",
        F.col("tier"),
        F.col("yr").alias("valid_from_year"),
        F.coalesce(F.lead("yr").over(wh) - F.lit(1), F.lit(_OPEN_END)).alias("valid_to_year"),
        F.row_number().over(wh).alias("version"),
    )


_SCD2_SQL = f"""
WITH yearly AS (
    SELECT o_custkey AS c_custkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CASE WHEN COUNT(*) >= 4 THEN 'high'
                WHEN COUNT(*) >= 2 THEN 'mid'
                ELSE 'low' END AS tier
    FROM orders
    GROUP BY 1, 2
),
heads AS (
    SELECT c_custkey, yr, tier
    FROM (
        SELECT c_custkey, yr, tier,
               lag(tier) OVER (PARTITION BY c_custkey ORDER BY yr) AS prev_tier
        FROM yearly
    )
    WHERE prev_tier IS NULL OR prev_tier <> tier
)
SELECT c_custkey,
       tier,
       yr AS valid_from_year,
       COALESCE(lead(yr) OVER (PARTITION BY c_custkey ORDER BY yr) - 1, {_OPEN_END})
           AS valid_to_year,
       CAST(ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY yr) AS INTEGER) AS version
FROM heads
"""


register(
    QuerySpec(
        "scd2_history",
        q_scd2_history,
        _SCD2_SQL,
        "K2,K5,W",
        False,
        "SCD type-2 validity intervals from yearly snapshots (lag change-detect + lead close)",
    )
)
