"""TPC-H classic analogs over the synthetic tables: Q1 (pricing summary),
Q3 (shipping priority), Q4 (priority check / EXISTS), Q5 (local supplier
volume), Q6 (forecast revenue), Q10 (returned items), Q13 (order-count
distribution), Q14 (promo share), Q15 (top supplier), Q17 (small-quantity
revenue), Q18 (large-volume customers), Q22 (anti-join), Q7 (bilateral trade),
Q19 (disjunction-of-conjunctions), Q8 (market share), Q12 (lateness
buckets) — plus Q2/Q11/Q16/Q20 analogs over a lineitem-derived
partsupp surrogate, covering all 22 TPC-H query shapes (the testdata
ships no partsupp table; no comment/phone columns). The reference has no TPC workload (SURVEY
§6), but these shapes — full-scan multi-aggregate, selective fact joins,
pure filter-scan, and HAVING-gated join-back — are the canonical
relational benchmarks, so they anchor the bench's relational story.

Scale notes: Q1 is one scan + one shuffle with map-side partial
aggregation; the shipdate predicate and 7-column projection reach the
parquet reader (PushedFilters / ReadSchema — asserted in
tests/test_plans.py). Q3 broadcasts customer (~1.5k rows at sf0.01)
and shuffles only lineitem-joined-orders on l_orderkey; top-10 is a
TakeOrderedAndProject, never a full sort. Q5 broadcasts every dimension
(region→nation→supplier/customer), so the only shuffle is the final
per-nation aggregation. Q6 is zero-shuffle: all three predicates push to
the parquet reader and the global sum is a two-stage partial agg. Q18's
HAVING side aggregates lineitem once on l_orderkey; the survivors
(a few hundred keys) broadcast back against orders/customer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import davg, dsum, sql_davg, sql_dsum, xdavg, xdsum
from . import QuerySpec, register
from .tables import load


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    disc_price = "l_extendedprice * (1 - l_discount)"
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            xdsum("l_quantity").alias("sum_qty"),
            xdsum("l_extendedprice").alias("sum_base_price"),
            xdsum(disc_price).alias("sum_disc_price"),
            xdsum(f"{disc_price} * (1 + l_tax)").alias("sum_charge"),
            xdavg("l_quantity").alias("avg_qty"),
            xdavg("l_extendedprice").alias("avg_price"),
            xdavg("l_discount").alias("avg_disc"),
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
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("order_date"), "o_orderpriority")
        .agg(xdsum("l_extendedprice * (1 - l_discount)").alias("revenue"))
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


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: revenue by nation for ASIA/1996 where the
    supplying nation equals the customer nation. All dims broadcast — the
    only shuffle is the final 5-group aggregation."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            xdsum("l_extendedprice * (1 - l_discount)").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


_Q5_SQL = f"""
SELECT n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY n_name
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue: the pure scan-filter-aggregate shape. All three
    predicates reach the parquet reader (PushedFilters) and the projection
    is 3 columns wide; zero shuffle beyond the final partial-agg merge."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        xdsum("l_extendedprice * l_discount").alias("revenue"),
        F.count("*").alias("n_items"),
    )


_Q6_SQL = f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: HAVING-gated aggregate over the fact,
    surviving keys (a few hundred) joined back to orders + customer.
    The big lineitem aggregation happens exactly once; the join-back side
    is small enough to broadcast."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


_Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice, sum_qty
FROM orders o
JOIN (
    SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING {sql_dsum('l_quantity')} > 300
) big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


_Q22_NATIONS = [1, 3, 5, 7, 9, 11, 13]


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: the synthetic
    customer table has no c_phone, so the country-code bucket is
    c_nationkey (same plan shape — IN-list filter, scalar average
    subquery, NOT EXISTS anti-join, final rollup). The scalar threshold
    is computed once and injected as a literal (SURVEY §2.5 A5, same as
    the gravity k constant); the anti-join is a broadcast left_anti on
    the distinct order custkeys; the final aggregate shuffles only the
    surviving few-hundred rows. Threshold uses the deterministic davg
    round-trip so the boundary predicate agrees with DuckDB bit-for-bit.
    This generator gives every customer at least one order, so the
    "never ordered" predicate is recast as "no order since 2000" — the
    anti-join stays the load-bearing operator and the date predicate
    pushes to the orders scan.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(_Q22_NATIONS))
    o = load(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") >= F.lit("2000-01-01").cast("date")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0).agg(davg(F.col("c_acctbal")).alias("a")).first()["a"]
    )
    cust_keys = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    return (
        c.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(cust_keys, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


_Q22_SQL = f"""
SELECT c_nationkey,
       COUNT(*) AS numcust,
       {sql_dsum('c_acctbal')} AS totacctbal
FROM customer c
WHERE c_nationkey IN ({', '.join(str(n) for n in _Q22_NATIONS)})
  AND c_acctbal > (
      SELECT {sql_davg('c_acctbal')} FROM customer
      WHERE c_acctbal > 0.0
        AND c_nationkey IN ({', '.join(str(n) for n in _Q22_NATIONS)})
  )
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01'
  )
GROUP BY c_nationkey
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: lineitem has no
    commitdate/receiptdate, so the EXISTS predicate is "some line shipped
    after the order date" (late shipping). Shape preserved: quarter-scoped
    orders scan, EXISTS → left_semi join on l_orderkey, count per
    priority. The semi-join keys (distinct late l_orderkey) reduce before
    the join; the date predicates push to both parquet scans."""
    o = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    l = load(spark, sf_dir, "lineitem")
    late_keys = (
        l.join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == o.o_orderkey)
        .filter(F.to_date("l_shipdate") > F.to_date("o_orderdate"))
        .select("l_orderkey")
        .distinct()
    )
    return (
        o.join(late_keys, o.o_orderkey == late_keys.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE)
  )
GROUP BY o_orderpriority
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left outer join so
    zero-order customers survive (the non-urgent filter creates them),
    then a two-level aggregate — per-customer count, then histogram of
    counts. First shuffle on o_custkey with map-side partial counts; the
    second aggregate input is one row per customer."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                      AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) pc
GROUP BY c_count
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): per-part average quantity
    joined back against that part's lines — the correlated scalar
    subquery becomes one aggregate + one equi-join (the J1 join-back
    pattern at part granularity). Brand filter prunes part first and the
    semi-joined lineitem side aggregates only surviving partkeys; the
    0.2*avg threshold uses the davg fixed-point round-trip so the
    boundary predicate is engine-portable."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    l = load(spark, sf_dir, "lineitem")
    lb = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    avg_q = lb.groupBy("l_partkey").agg(davg(F.col("l_quantity")).alias("avg_qty"))
    small = lb.join(avg_q, "l_partkey").filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return small.agg(
        (dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
        F.count("*").alias("n_small_lines"),
    )


_Q17_SQL = f"""
WITH lb AS (
    SELECT l.* FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
),
aq AS (
    SELECT l_partkey, {sql_davg('l_quantity')} AS avg_qty
    FROM lb GROUP BY l_partkey
)
SELECT {sql_dsum('l_extendedprice')} / CAST(7.0 AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM lb JOIN aq USING (l_partkey)
WHERE l_quantity < CAST(0.2 AS DOUBLE) * avg_qty
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): revenue lost to returns per
    customer in a quarter, top 20. Orders prune on the quarter first
    (pushed to the scan), lineitem prunes on returnflag='R'; the
    customer dim broadcasts; top-20 is TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, c_nationkey,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_returnflag = 'R'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-10-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, c_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO revenue share in one month —
    conditional aggregate over a broadcast part join; the month predicate
    pushes to the lineitem scan and the result is a single row. The
    share divides two deterministic sums, so the double is portable."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return j.agg(
        (
            F.lit(100.0)
            * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / dsum(rev)
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_lines"),
    )


_Q14_SQL = f"""
SELECT CAST(100.0 AS DOUBLE)
       * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-03-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): per-supplier quarterly revenue, then the
    suppliers whose revenue equals the maximum. The max is attached via a
    broadcast 1-row cross join (the gravity-k pattern) instead of a
    rescan; equality on the deterministic fixed-point sum is portable
    across engines, which a raw double max-equality would not be."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    rev = (
        l.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = f"""
WITH revenue AS (
    SELECT l_suppkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between NATION_1 and
    NATION_2 — revenue by (supplier nation, customer nation, ship year)
    where the two nations differ and both belong to the pair. The
    symmetric OR join predicate is pre-filtered on both dims (each
    broadcast), so the fact side is touched once; the year comes from
    l_shipdate, grouped after the joins."""
    pair = ["NATION_1", "NATION_2"]
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    )
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(s.select("s_suppkey", "supp_nation")), l.l_suppkey == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "cust_nation")), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year(F.to_date("l_shipdate")).alias("l_year"))
        .agg(dsum(rev).alias("revenue"), F.count("*").alias("n_lines"))
    )


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_dsum('volume')} AS revenue,
       COUNT(*) AS n_lines
FROM (
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           year(CAST(l.l_shipdate AS DATE)) AS l_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_name IN ('NATION_1', 'NATION_2')
      AND nc.n_name IN ('NATION_1', 'NATION_2')
      AND ns.n_name <> nc.n_name
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted to the available columns:
    revenue from lines matching ANY of three (brand, size-range,
    quantity-range) conjunctive clauses — the classic disjunction-of-
    conjunctions predicate. Authored as one OR filter AFTER the broadcast
    part join: Catalyst pushes the common l_quantity bounds and the
    per-clause p_brand/p_size predicates stay evaluable post-join without
    multiplying the fact scan (the Q19 trap is rewriting as three UNIONed
    scans)."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = load(spark, sf_dir, "lineitem")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    clause1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11)
    clause2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20)
    clause3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(clause1 | clause2 | clause3).agg(
        dsum(rev).alias("revenue"), F.count("*").alias("n_lines")
    )


_Q19_SQL = f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_1's share of revenue
    among ASIA-customer orders per order year. The share is a
    conditional sum over the joined fact divided by the total — one
    aggregation, no self-join; supplier nation arrives pre-joined on the
    broadcast supplier dim. Share divides two deterministic sums, so the
    double is engine-portable."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_key"), "left_semi"
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(s.select("s_suppkey", "supp_nation")), l.l_suppkey == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year(F.to_date("o_orderdate")).alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0.0)))
                / dsum(vol)
            ).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
    )


_Q8_SQL = f"""
SELECT year(CAST(o.o_orderdate AS DATE)) AS o_year,
       {sql_dsum("CASE WHEN ns.n_name = 'NATION_1' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")}
       / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS mkt_share,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region r ON nc.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY o_year
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority check), adapted: no l_shipmode,
    so the grouping key is lateness bucket (shipped >30d after order vs
    not) and the measures are the classic urgent/non-urgent conditional
    counts. One join (orders projected to 3 columns), one aggregation;
    the CASE measures are codegen'd, no second pass."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 30
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(late.alias("shipped_late"))
        .agg(
            F.sum(urgent.cast("int")).alias("high_line_count"),
            F.sum((~urgent).cast("int")).alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT (date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) > 30)
           AS shipped_late,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
           AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
           AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY shipped_late
"""


for _spec in [
    QuerySpec("tpch_q12", q_tpch_q12, _Q12_SQL, "A6-buckets", False,
              "TPC-H Q12 analog: lateness buckets x urgent/non-urgent conditional counts"),
    QuerySpec("tpch_q8", q_tpch_q8, _Q8_SQL, "A6-share,J2", False,
              "TPC-H Q8: national market share per order year (single-pass share)"),
    QuerySpec("tpch_q7", q_tpch_q7, _Q7_SQL, "J2-bilateral", False,
              "TPC-H Q7: bilateral nation trade volume by ship year"),
    QuerySpec("tpch_q19", q_tpch_q19, _Q19_SQL, "P-disjunction", False,
              "TPC-H Q19 analog: disjunction-of-conjunctions predicate, single scan"),
    QuerySpec("tpch_q10", q_tpch_q10, _Q10_SQL, "J2,A1-topk", False,
              "TPC-H Q10: returned-item revenue per customer, top 20"),
    QuerySpec("tpch_q14", q_tpch_q14, _Q14_SQL, "A6-share", False,
              "TPC-H Q14: promo revenue share (conditional agg over broadcast join)"),
    QuerySpec("tpch_q15", q_tpch_q15, _Q15_SQL, "A5-maxeq", False,
              "TPC-H Q15: top supplier via max-equality on deterministic sums"),
    QuerySpec("tpch_q4", q_tpch_q4, _Q4_SQL, "J5-semi,P7", False,
              "TPC-H Q4 analog: EXISTS late-shipment semi-join, count per priority"),
    QuerySpec("tpch_q13", q_tpch_q13, _Q13_SQL, "J6-outer,A8", False,
              "TPC-H Q13: left-outer order-count distribution (two-level agg)"),
    QuerySpec("tpch_q17", q_tpch_q17, _Q17_SQL, "J1-joinback,A5", False,
              "TPC-H Q17: per-part avg-quantity join-back, small-order revenue"),
    QuerySpec("tpch_q22", q_tpch_q22, _Q22_SQL, "J-anti,A5-scalar", False,
              "TPC-H Q22 analog: scalar-subquery threshold + anti-join + rollup"),
    QuerySpec("tpch_q1", q_tpch_q1, _Q1_SQL, "A1-scan", True,
              "TPC-H Q1 pricing summary: full-scan 8-aggregate battery"),
    QuerySpec("tpch_q3", q_tpch_q3, _Q3_SQL, "J2-topk", True,
              "TPC-H Q3 shipping priority: selective 3-way join + top-10"),
    QuerySpec("tpch_q5", q_tpch_q5, _Q5_SQL, "J2-broadcast", True,
              "TPC-H Q5 local supplier volume: 6-way broadcast-dim join"),
    QuerySpec("tpch_q6", q_tpch_q6, _Q6_SQL, "A1-pushdown", True,
              "TPC-H Q6 forecast revenue: zero-shuffle scan-filter-aggregate"),
    QuerySpec("tpch_q18", q_tpch_q18, _Q18_SQL, "A8-joinback", False,
              "TPC-H Q18 large-volume customers: HAVING gate + join-back"),
]:
    register(_spec)


# --- Q2/Q11/Q16/Q20 analogs (partsupp surrogate) -----------------------------
# The testdata has no partsupp table; the supplier↔part catalog is derived
# from observed lineitems instead: ps = per (l_partkey, l_suppkey) the
# line count, the quantity sum, and the minimum unit price (the supplycost
# analog — MIN over exact per-row divisions, order-independent without any
# fixed-point machinery). This keeps all four remaining TPC-H shapes
# expressible with identical semantics on both engines: correlated
# min-per-group (Q2), value-share-vs-global-scalar (Q11), distinct-count
# with exclusion dim (Q16), and per-group availability threshold (Q20).


def _ps(spark, sf_dir, lineitem=None, part_keys=None, supp_keys=None):
    """Partsupp surrogate. The (l_partkey, l_suppkey) aggregation produces
    ~|lineitem| groups, so map-side partials reduce nothing and a raw scan
    shuffles the whole relation (measured 5.3-5.5× vs the oracle at sf1).
    Default route: the one-time bucketed layout (``bucketed_ps_lineitem``)
    whose scan already satisfies the aggregation's distribution — the _ps
    subplan then has ZERO Exchange (plan-asserted in
    test_scale_patterns.py::test_bucketed_ps_aggregation_no_exchange).
    Pass ``lineitem=load(spark, sf_dir, "lineitem")`` to force the raw
    scan-and-shuffle plan (the A/B reference).

    ``part_keys`` / ``supp_keys`` (single-column DataFrames of l_partkey /
    l_suppkey values) semi-join the fact BELOW the aggregation. Every
    consumer filters ps on a dimension predicate over a GROUP KEY, and
    such filters commute with the agg — dropping whole (partkey, suppkey)
    groups before aggregating leaves every surviving group's count/sum/min
    byte-identical — so the agg processes the selected fraction of the
    fact instead of all of it (measured sf10: the unfiltered agg alone was
    3.8 s of q2's 5.7 s; VERDICT r5 #1). The broadcast semi-join preserves
    the bucketed scan's partitioning: still zero Exchange."""
    li = lineitem if lineitem is not None else bucketed_ps_lineitem(spark, sf_dir)
    if part_keys is not None:
        li = li.join(
            F.broadcast(part_keys.toDF("l_partkey")), "l_partkey", "left_semi"
        )
    if supp_keys is not None:
        li = li.join(
            F.broadcast(supp_keys.toDF("l_suppkey")), "l_suppkey", "left_semi"
        )
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.count("*").alias("ps_lines"),
        dsum(F.col("l_quantity")).alias("ps_qty"),
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_unitcost"),
    )


def bucketed_ps_lineitem(spark, sf_dir, n_buckets: int = 32):
    """One-time ETL layout for the partsupp-surrogate family: the four
    _ps input columns of lineitem, hash-bucketed on ``l_partkey`` ALONE
    and sorted on (l_partkey, l_suppkey). The subset key serves every
    clustered requirement in the family from one layout: the
    (partkey, suppkey) agg (hash(partkey) collocates its groups), q2's
    per-part window MIN, and q11's per-part value rollup — all with ZERO
    Exchange (the round-5 two-key layout satisfied only the first; q2/q11
    then re-shuffled the catalog for their partkey-level pass). Built
    lazily once per (session, sf_dir, n_buckets) — bench warmups pay the
    write, every subsequent q2/q11/q16 run reads the layout, exactly how
    a lakehouse amortizes layout cost across a query family. Data lands
    under a per-process tmp root so concurrent sessions never collide."""
    import os
    import re
    import tempfile

    from ..catalog import Warehouse

    # Cache key includes the source mtime: regenerated data under the same
    # path must rebuild the layout, not serve the stale table for the
    # session lifetime.
    src = f"{sf_dir}/lineitem.parquet"
    try:
        mtime = int(os.stat(src).st_mtime)
    except OSError:
        mtime = 0
    tag = re.sub(r"[^0-9a-zA-Z]+", "_", f"{sf_dir.strip('/')}_{mtime}")
    # "pk" marks the partkey-subset bucket spec: a layout written under the
    # old two-key spec must never be served for the new plan shape
    name = f"ps_lineitem_pk_b{n_buckets}_{tag}"
    if spark.catalog.tableExists(name):
        # idempotent engine convention (set at build_session; re-pinned here
        # for foreign sessions) — never re-plan a bucketed scan away
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        return spark.table(name)
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    root = os.path.join(
        tempfile.gettempdir(), "spark_graft_buckets", str(os.getpid())
    )
    wh = Warehouse(spark, root)
    # Cache miss ⇒ the data under sf_dir was (re)generated: every older
    # mtime-tagged layout for the SAME sf_dir is now unreachable for the
    # rest of the session — drop the catalog entries and their files so
    # stale layouts don't accumulate unbounded across regenerations.
    # trailing "_" so e.g. ..._sf1_ never matches ..._sf10_<mtime>
    prefix = f"ps_lineitem_pk_b{n_buckets}_" + re.sub(
        r"[^0-9a-zA-Z]+", "_", sf_dir.strip("/")
    ) + "_"
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix) and t.name != name:
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
            import shutil

            shutil.rmtree(wh.path(t.name), ignore_errors=True)
    return wh.create_or_replace_bucketed(
        name, li, ["l_partkey"], n_buckets, sort_by=["l_partkey", "l_suppkey"]
    )


_PS_SQL = f"""
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           COUNT(*) AS ps_lines,
           {sql_dsum('l_quantity')} AS ps_qty,
           MIN(l_extendedprice / l_quantity) AS ps_unitcost
    FROM lineitem GROUP BY 1, 2"""


def q_tpch_q2(spark: SparkSession, sf_dir: str, lineitem=None) -> DataFrame:
    """Q2 analog: cheapest EUROPE supplier per LARGE part, top 20 by
    account balance. The min-cost-per-part correlation is a window MIN
    over the region-filtered catalog (no correlated subquery rescan)."""
    from pyspark.sql import Window

    from ..functions.deterministic import micro

    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # The LARGE predicate is on a GROUP KEY of ps, so it pushes below the
    # aggregation as a semi-join: the agg processes only LARGE parts' rows
    # (~1/7 of the fact) instead of aggregating everything and discarding
    # 6/7 at the join (the measured sf10 dominator, VERDICT r5 #1).
    ps = _ps(spark, sf_dir, lineitem, part_keys=p.select("p_partkey"))
    cat = (
        ps.join(F.broadcast(p.select("p_partkey", "p_brand")), ps.ps_partkey == F.col("p_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")),
              ps.ps_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    # window keyed on the ps-side part key: the partkey-bucketed layout
    # already satisfies its clustering, so the min-per-part pass sorts
    # in place with NO Exchange (the p_partkey spelling is the same value
    # post-join, but keying on the streamed column keeps the contract
    # independent of join-equivalence propagation)
    w = Window.partitionBy("ps_partkey")
    best = cat.withColumn("min_cost", F.min("ps_unitcost").over(w)).filter(
        F.col("ps_unitcost") == F.col("min_cost")
    )
    # Bounded by |parts|, but still honor SCALE.md:16 — heap top-k, not a
    # single-partition window sort (the rank window sees only 20 rows).
    from ..functions.topk import global_topk

    return (
        global_topk(
            best, 20, [F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_suppkey")]
        )
        .select(
            F.col("rank"),
            "s_name",
            "n_name",
            F.col("p_partkey"),
            "p_brand",
            micro(F.col("ps_unitcost")).alias("unit_cost_ppm"),
            micro(F.col("s_acctbal")).alias("acctbal_ppm"),
        )
    )


def _q2_sql() -> str:
    from ..functions.deterministic import sql_micro

    return f"""
WITH ps AS ({_PS_SQL}),
cat AS (
    SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal, s.s_suppkey, n.n_name,
           ps.ps_unitcost,
           MIN(ps.ps_unitcost) OVER (PARTITION BY p.p_partkey) AS min_cost
    FROM ps
    JOIN part p ON ps.ps_partkey = p.p_partkey AND p.p_type = 'LARGE'
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
)
SELECT * FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, p_partkey ASC, s_suppkey ASC) AS rank,
           s_name, n_name, p_partkey, p_brand,
           {sql_micro('ps_unitcost')} AS unit_cost_ppm,
           {sql_micro('s_acctbal')} AS acctbal_ppm
    FROM cat WHERE ps_unitcost = min_cost
) WHERE rank <= 20
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str, lineitem=None) -> DataFrame:
    """Q11 analog: parts whose catalog value (qty × min unit cost) from
    NATION_3 suppliers exceeds 0.1% of that nation's total — the
    value-share-vs-global-scalar shape."""
    from ..functions.deterministic import micro

    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_keys = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    # The nation predicate is on a GROUP KEY of ps (suppkey), so it pushes
    # below the aggregation as a semi-join — the agg sees only NATION_3
    # suppliers' rows (~1/|nations| of the fact) and the old join-after-agg
    # becomes a no-op (every surviving group already qualifies).
    nat_ps = _ps(spark, sf_dir, lineitem, supp_keys=nat_keys).withColumn(
        "value", F.col("ps_qty") * F.col("ps_unitcost")
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(dsum(F.col("value")).alias("part_value"))
    # The global scalar is an exact re-aggregate of the per-part sums (the
    # fixed-point micros are integers, so Σ of group sums ≡ the row-level
    # Σ the oracle computes — exact while each part's micro-sum stays in
    # the double-exact range < 2^53, i.e. part values < ~9e9 units;
    # dsum_rollup_guard raises loudly past that bound), taken as a 1-row
    # agg crossJoin(broadcast)-ed back. On the partkey-bucketed layout
    # per_part is ZERO-Exchange (hash(partkey) satisfies both group
    # levels), so there is no shuffle to reuse; the two consumers
    # (per_part rows, 1-row total) recompute a pipeline that now reads
    # only the nation's slice of the fact. (The previous form computed
    # the total as Window.partitionBy() over the part-level frame —
    # dimension-sized, but still a one-task pass over ~20M rows at 100×;
    # VERDICT r4 #4.)
    from ..functions.deterministic import dsum_rollup_guard

    total = per_part.agg(
        dsum(dsum_rollup_guard(F.col("part_value"))).alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("total_value"))
        .select(
            "ps_partkey",
            micro(F.col("part_value")).alias("part_value_ppm"),
            micro(F.col("part_value") / F.col("total_value")).alias("share_ppm"),
        )
    )


def _q11_sql() -> str:
    from ..functions.deterministic import sql_micro

    return f"""
WITH ps AS ({_PS_SQL}),
nat_ps AS (
    SELECT ps.ps_partkey, ps.ps_qty * ps.ps_unitcost AS value
    FROM ps
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
),
per_part AS (
    SELECT ps_partkey, {sql_dsum('value')} AS part_value FROM nat_ps GROUP BY 1
),
total AS (SELECT {sql_dsum('value')} AS total_value FROM nat_ps)
SELECT ps_partkey,
       {sql_micro('part_value')} AS part_value_ppm,
       {sql_micro('part_value / total_value')} AS share_ppm
FROM per_part CROSS JOIN total
WHERE part_value > 0.001 * total_value
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str, lineitem=None) -> DataFrame:
    """Q16 analog: supplier counts per (brand, type, size) for non-PROMO
    parts in selected sizes, excluding '...0'-suffixed suppliers (the
    complaints analog) — distinct-count with an exclusion dimension.

    Physical form (r10 A/B, VERDICT r9 #4): explicit pair-dedup —
    dropDuplicates on (dims, suppkey) then a plain count — instead of
    countDistinct. Spark's distinct-agg rewrite plans the same two
    exchanges but measured 2.38 s vs 1.90 s at sf10 (the pair-dedup's
    map-side partial collapses before the wire; the expand form carries
    distinct-tracking state through both levels). A dim_id surrogate
    variant (narrow exchange rows) measured 2.54 s — the broadcast-probe
    constant outweighs the wire width, the same verdict as r9's
    typical_day key-encoding A/B. Floor: the _ps aggregation ALONE is
    1.03 s at sf10 (zero-exchange bucketed scan, ~3M groups) — 1.4× the
    oracle's whole query — so the distinct-count machinery above it is
    ~0.9 s and the remaining ratio is the partsupp-surrogate floor, not
    this query's shape."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24)
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_name").endswith("0"))
    # both predicates are on GROUP KEYS of ps: the part selection pushes
    # below the aggregation (the agg sees only qualifying parts' rows);
    # the supplier EXCLUSION stays above it (anti-joins don't fit the
    # semi-join pushdown helper, and the excluded set is dim-small)
    ps = _ps(spark, sf_dir, lineitem, part_keys=p.select("p_partkey"))
    pairs = (
        ps.join(F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
                ps.ps_partkey == F.col("p_partkey"))
        .join(F.broadcast(s.select(F.col("s_suppkey").alias("bad_supp"))),
              ps.ps_suppkey == F.col("bad_supp"), "left_anti")
        .select("p_brand", "p_type", "p_size", "ps_suppkey")
        .dropDuplicates()
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.count("*").alias("supplier_cnt")
    )


_Q16_SQL = f"""
WITH ps AS ({_PS_SQL})
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM ps
JOIN part p ON ps.ps_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 24)
  AND ps.ps_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_name LIKE '%0'
  )
GROUP BY 1, 2, 3
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog: NATION_5 suppliers of 'red'-named parts whose 1995
    shipped quantity exceeds half their all-time quantity for that part —
    the per-group availability-threshold shape."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    red_li = li.join(
        F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    )
    qty = red_li.groupBy("l_partkey", "l_suppkey").agg(
        dsum(F.col("l_quantity")).alias("total_qty"),
        dsum(
            F.when(F.year("l_shipdate") == 1995, F.col("l_quantity")).otherwise(F.lit(0.0))
        ).alias("qty_1995"),
    )
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        qty.filter(F.col("qty_1995") > F.lit(0.5) * F.col("total_qty"))
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.countDistinct("l_partkey").alias("n_excess_parts"))
    )


_Q20_SQL = f"""
WITH red_li AS (
    SELECT l.l_partkey, l.l_suppkey, l.l_quantity, l.l_shipdate
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE 'red%'
),
qty AS (
    SELECT l_partkey, l_suppkey,
           {sql_dsum('l_quantity')} AS total_qty,
           {sql_dsum("CASE WHEN year(l_shipdate) = 1995 THEN l_quantity ELSE 0.0 END")}
               AS qty_1995
    FROM red_li GROUP BY 1, 2
)
SELECT s.s_suppkey, s.s_name,
       COUNT(DISTINCT q.l_partkey) AS n_excess_parts
FROM qty q
JOIN supplier s ON q.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_5'
WHERE q.qty_1995 > 0.5 * q.total_qty
GROUP BY 1, 2
"""


for _spec in [
    QuerySpec("tpch_q2", q_tpch_q2, _q2_sql(), "J2,W,A7", False,
              "Q2 analog: window-min cheapest supplier per part in region, top-20"),
    QuerySpec("tpch_q11", q_tpch_q11, _q11_sql(), "A5,A4", False,
              "Q11 analog: part value share vs national total (scalar broadcast)"),
    QuerySpec("tpch_q16", q_tpch_q16, _Q16_SQL, "A8,J-anti", False,
              "Q16 analog: distinct supplier counts with exclusion dim (left_anti)"),
    QuerySpec("tpch_q20", q_tpch_q20, _Q20_SQL, "A6,J5", False,
              "Q20 analog: availability-threshold suppliers (conditional vs total sums)"),
]:
    register(_spec)
