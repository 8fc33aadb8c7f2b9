"""TPC-H classic analogs over the synthetic tables: Q1 (pricing summary)
and Q3 (shipping priority). The reference has no TPC workload (SURVEY §6),
but these two shapes — full-scan multi-aggregate and selective 3-way
fact join with top-k — are the canonical scan-heavy and join-heavy
benchmarks, so they anchor the bench's relational story.

Scale notes: Q1 is one scan + one shuffle with map-side partial
aggregation; the shipdate predicate and 7-column projection reach the
parquet reader (PushedFilters / ReadSchema — asserted in
tests/test_plans.py). Q3 broadcasts customer (~1.5k rows at sf0.01)
and shuffles only lineitem-joined-orders on l_orderkey; top-10 is a
TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import davg, dsum, sql_davg, sql_dsum
from . import QuerySpec, register
from .tables import load


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 with o_orderpriority standing in for o_shippriority (not in the
    synthetic schema). Ties in revenue are broken by l_orderkey so the
    top-10 is engine-independent."""
    cutoff = F.lit("1995-03-15").cast("date")
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.to_date("o_orderdate") < cutoff)
    l = load(spark, sf_dir, "lineitem").filter(F.to_date("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("order_date"), "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


for _spec in [
    QuerySpec("tpch_q1", q_tpch_q1, _Q1_SQL, "A1-scan", True,
              "TPC-H Q1 pricing summary: full-scan 8-aggregate battery"),
    QuerySpec("tpch_q3", q_tpch_q3, _Q3_SQL, "J2-topk", True,
              "TPC-H Q3 shipping priority: selective 3-way join + top-10"),
]:
    register(_spec)
