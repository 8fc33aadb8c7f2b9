"""Relational operator inventory (SURVEY §2.3-2.7) over the TPC-H-ish
testdata. Each query re-expresses a reference operator pattern with the
same semantics; float aggregation goes through the deterministic decimal
helpers so results hash-match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.deterministic import davg, dsum, sql_davg, sql_dsum, xdavg, xdsum
from . import QuerySpec, register
from .core import q_typical_day, _TYPICAL_DAY_SQL
from .tables import load


# --- P1/P2: typed projection with bulk rename (bronze→silver hop) ---------
# Reference: 15-column ES→EN rename at ingest (dags/mitma/bronze_mitma.py:51-67)
# then VARCHAR→typed cast pipeline with failure tolerance
# (dags/mitma/silver_mitma.py:121-127).
def q_typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = li.select(
        F.col("l_orderkey").cast("string").alias("order_id"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_quantity").cast("string").try_cast("double").alias("quantity"),
        F.col("l_returnflag").alias("return_flag"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )
    return out.filter(F.col("ship_date").isNotNull() & F.col("quantity").isNotNull())


_TYPED_PROJECTION_SQL = """
SELECT CAST(l_orderkey AS VARCHAR) AS order_id,
       CAST(l_shipdate AS DATE) AS ship_date,
       TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS quantity,
       l_returnflag AS return_flag,
       (l_extendedprice * (1 - l_discount)) AS net_price
FROM lineitem
WHERE CAST(l_shipdate AS DATE) IS NOT NULL
  AND TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) IS NOT NULL
"""


# --- P3/P4/P5/P9: prefix exclusion + inequality + NULL guard + threshold ---
# Reference: NOT LIKE 'PT%'/'FR%' zone drops, <> 'externo', IS NOT NULL
# battery, numeric cutoffs (dags/mitma/silver_mitma.py:131-139;
# dags/gravity/create_distances.py:21).
def q_filter_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        ~F.col("p_type").startswith("ECO")
        & ~F.col("p_type").startswith("PRO")
        & (F.col("p_brand") != "Brand#23")
        & F.col("p_retailprice").isNotNull()
        & (F.col("p_size") > 10)
        & (F.col("p_retailprice") > 100.0)
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")


_FILTER_BATTERY_SQL = """
SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
FROM part
WHERE p_type NOT LIKE 'ECO%' AND p_type NOT LIKE 'PRO%'
  AND p_brand <> 'Brand#23'
  AND p_retailprice IS NOT NULL
  AND p_size > 10
  AND p_retailprice > 100.0
"""


# --- P6: membership IN (report scoping) ------------------------------------
# Reference: WHERE origin_zone IN ({placeholders})
# (dags/mitma/generate_report.py:45-61).
def q_membership_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            xdsum("o_totalprice").alias("total_price"),
        )
    )


_MEMBERSHIP_IN_SQL = f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority, o_orderstatus
"""


# --- P8/A3: string-suffix predicate + GROUP BY on expression ---------------
# Reference: right(CAST("Periodo" AS VARCHAR), 4) = year
# (dags/Economy/ingestion_bronze_economy.py:17); GROUP BY LEFT(zone,5)
# (dags/gravity/aggregate_trips.py:13-14).
def q_suffix_and_expr_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.substring(F.col("c_name"), -1, 1).isin("0", "5"))
        .groupBy(F.substring(F.col("c_name"), 1, 12).alias("name_prefix"), F.col("c_mktsegment"))
        .agg(
            F.count("*").alias("n_customers"),
            xdavg("c_acctbal").alias("avg_acctbal"),
        )
    )


_SUFFIX_EXPR_GROUPBY_SQL = f"""
SELECT substring(c_name, 1, 12) AS name_prefix, c_mktsegment,
       COUNT(*) AS n_customers,
       {sql_davg('c_acctbal')} AS avg_acctbal
FROM customer
WHERE right(c_name, 1) IN ('0', '5')
GROUP BY substring(c_name, 1, 12), c_mktsegment
"""


# --- P12: DISTINCT enumeration ---------------------------------------------
# Reference: SELECT DISTINCT district_id ... ORDER BY
# (dags/bussiness_layer/business_questions_dag.py:137-145).
def q_distinct_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderpriority", "o_orderstatus").distinct().orderBy(
        "o_orderpriority", "o_orderstatus"
    )


_DISTINCT_ENUMERATION_SQL = """
SELECT DISTINCT o_orderpriority, o_orderstatus
FROM orders ORDER BY o_orderpriority, o_orderstatus
"""


# --- J2: multi-way LEFT join with constant predicate, broadcast dims -------
# Reference: distances ⟕ population ⟕ economy ⟕ trips with + po.year =
# {year} (dags/gravity/create_gravity_data.py:20-28). Dims are broadcast —
# at 100 TB the fact side never shuffles for these joins.
def q_multiway_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), (c.c_nationkey == n.n_nationkey) & (n.n_regionkey < 4), "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
    )
    return joined.groupBy(F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("region_name")).agg(
        F.count("*").alias("n_orders"),
        xdsum("o_totalprice").alias("total_price"),
        xdavg("c_acctbal").alias("avg_acctbal"),
    )


_MULTIWAY_LEFT_JOIN_SQL = f"""
SELECT COALESCE(r_name, 'UNKNOWN') AS region_name,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price,
       {sql_davg('c_acctbal')} AS avg_acctbal
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_regionkey < 4
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY COALESCE(r_name, 'UNKNOWN')
"""


# --- J4: disjunctive equi-join (OR of two equalities) -----------------------
# Reference: ON (geo.census_section_id = g.origin_zone OR geo.district_id =
# g.origin_zone) (dags/bussiness_layer/generate_report.py:119-125).
# A naive OR-join plans as BroadcastNestedLoopJoin; authored here as the
# union of two equi-joins (second branch anti-filtered on the first
# condition) which preserves OR multiplicity exactly and keeps both
# branches hash-joinable — the rewrite SURVEY §4.3 calls for.
def q_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    branch_a = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    branch_b = s.join(F.broadcast(n), (s.s_suppkey % 25) == n.n_nationkey).filter(
        F.col("s_nationkey") != F.col("n_nationkey")
    )
    both = branch_a.unionByName(branch_b)
    return both.groupBy("n_name").agg(
        F.count("*").alias("n_suppliers"),
        xdsum("s_acctbal").alias("total_acctbal"),
    )


_DISJUNCTIVE_JOIN_SQL = f"""
SELECT n_name,
       COUNT(*) AS n_suppliers,
       {sql_dsum('s_acctbal')} AS total_acctbal
FROM supplier s
JOIN nation n ON (s.s_nationkey = n.n_nationkey OR (s.s_suppkey % 25) = n.n_nationkey)
GROUP BY n_name
"""


# --- J5: semi-join filter ----------------------------------------------------
# Reference: inner join used as semi-filter (origin inside study polygon,
# dags/bussiness_layer/transform_gold_long_trip_dependency.py:100-109).
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 50000.0)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"), xdavg("c_acctbal").alias("avg_acctbal"))
    )


_SEMI_JOIN_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       {sql_davg('c_acctbal')} AS avg_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000.0)
GROUP BY c_mktsegment
"""


# --- J6: LEFT join preserving unmatched + NULL-aware CASE -------------------
# Reference: LEFT JOIN muni_centroids d ... CASE WHEN d.centroid IS NULL
# THEN NULL ELSE dist END
# (dags/bussiness_layer/transform_gold_long_trip_dependency.py:111-127).
def q_null_aware_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_retailprice") > 500.0)
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left")
    margin = F.when(
        F.col("p_partkey").isNull(), F.lit(None).cast("double")
    ).otherwise(F.col("l_extendedprice") - F.col("p_retailprice") * F.col("l_quantity"))
    return (
        joined.withColumn("margin", margin)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_lines"),
            F.count("margin").alias("n_known_margin"),
            xdsum("COALESCE(margin, 0.0)").alias("total_margin"),
        )
    )


_NULL_AWARE_LEFT_JOIN_SQL = f"""
WITH joined AS (
    SELECT l.l_returnflag,
           CASE WHEN p.p_partkey IS NULL THEN NULL
                ELSE l.l_extendedprice - p.p_retailprice * l.l_quantity END AS margin
    FROM lineitem l
    LEFT JOIN (SELECT * FROM part WHERE p_retailprice > 500.0) p
      ON l.l_partkey = p.p_partkey
)
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       COUNT(margin) AS n_known_margin,
       {sql_dsum('COALESCE(margin, 0.0)')} AS total_margin
FROM joined
GROUP BY l_returnflag
"""


# --- A6: conditional aggregation (long-trip share pattern) ------------------
# Reference: SUM(CASE WHEN distance_km > 15 THEN total_trips ELSE 0 END)
# (dags/bussiness_layer/transform_gold_long_trip_dependency.py:129-145).
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc = "CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END"
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        xdsum(disc).alias("discounted_revenue"),
        xdsum("l_extendedprice").alias("total_revenue"),
        (xdsum(disc) / xdsum("l_extendedprice")).alias("discounted_share"),
    )


_CONDITIONAL_AGG_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END")} AS discounted_revenue,
       {sql_dsum('l_extendedprice')} AS total_revenue,
       ({sql_dsum("CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END")}
        / {sql_dsum('l_extendedprice')}) AS discounted_share
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# --- A7/A8: MIN/MAX + COUNT(*) HAVING QA battery ----------------------------
# Reference: duplicate-natural-key QA (dags/Economy/test_economy.py:56-66),
# MAX(origin_population) (dags/gravity/create_ranking.py:16).
def q_dup_key_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .filter(F.col("n_orders") > 1)
    )


_DUP_KEY_QA_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 1
"""


# --- §2.6: window top-k (peak hour per day_type) -----------------------------
# Reference computes this in pandas after collect
# (dags/mitma/generate_report.py:123); here native as row_number over a
# window — the scale-safe form.
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    gold = q_typical_day(spark, sf_dir)
    w = Window.partitionBy("day_type").orderBy(
        F.desc("total_trips"), "hour_period", "origin_zone", "destination_zone"
    )
    return (
        gold.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("day_type", "hour_period", "origin_zone", "destination_zone", "total_trips", "rn")
    )


_WINDOW_TOPK_SQL = f"""
WITH gold AS ({_TYPICAL_DAY_SQL}),
ranked AS (
    SELECT day_type, hour_period, origin_zone, destination_zone, total_trips,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY day_type
               ORDER BY total_trips DESC, hour_period, origin_zone, destination_zone
           ) AS INTEGER) AS rn
    FROM gold
)
SELECT * FROM ranked WHERE rn <= 3
"""


# --- §2.7: set operation (union of two zone enumerations) -------------------
# The reference has no UNION; this is the union rewrite surface J4 needs
# (SURVEY §2.7) expressed directly.
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side"))
    b = s.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side"))
    return a.unionByName(b).distinct()


_UNION_DISTINCT_SQL = """
SELECT DISTINCT c_nationkey AS nationkey, 'customer' AS side FROM customer
UNION
SELECT DISTINCT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
"""


# --- §2.10-adjacent: tumbling-window aggregation over the event stream ------
# Batch-parity form of the Structured Streaming windowed aggregation in
# streaming/ (window start emitted as a formatted string to stay
# timezone-agnostic across engines).
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "6 hours")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), xdsum("value").alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_TUMBLING_WINDOW_SQL = f"""
SELECT strftime(to_timestamp(floor(epoch(ts) / 21600) * 21600), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
"""


# --- Sessionization: gap-based sessions via lag + running sum ---------------
# The batch form of streaming session windows (SURVEY guide "Common OLAP
# patterns"); all interval math in integer microseconds so both engines
# compare identically.
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(lag_ts)
    new_sess = F.when(lag_ts.isNull() | (gap_us > 1800 * 1000000), F.lit(1)).otherwise(F.lit(0))
    sess_id = F.sum(new_sess).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    sessions = ev.select("user_id", "ts", "event_id", sess_id.alias("session_id"))
    # duration as exact integer microseconds: DOUBLE output columns are
    # hash-fragile across oracle engines/versions; integers cannot disagree.
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


_SESSIONIZE_SQL = """
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR (epoch_us(ts) - epoch_us(lag(ts) OVER w)) > 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, event_id,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
FROM sessions
GROUP BY user_id, session_id
"""


for _spec in [
    QuerySpec("sessionize", q_sessionize, _SESSIONIZE_SQL, "W,S10", False,
              "Gap-based sessionization via lag + running sum window"),
    QuerySpec("typed_projection", q_typed_projection, _TYPED_PROJECTION_SQL, "P1,P2,S4", False,
              "Bronze→silver typed projection with rename + TRY_CAST tolerance"),
    QuerySpec("filter_battery", q_filter_battery, _FILTER_BATTERY_SQL, "P3,P4,P5,P9", False,
              "Prefix exclusion + inequality + NULL guard + thresholds"),
    QuerySpec("membership_in", q_membership_in, _MEMBERSHIP_IN_SQL, "P6,A1", False,
              "IN-membership report scoping"),
    QuerySpec("suffix_expr_groupby", q_suffix_and_expr_groupby, _SUFFIX_EXPR_GROUPBY_SQL, "P8,A3", False,
              "String-suffix predicate + GROUP BY on expression"),
    QuerySpec("distinct_enumeration", q_distinct_enumeration, _DISTINCT_ENUMERATION_SQL, "P12", False,
              "DISTINCT projection with ORDER BY"),
    QuerySpec("multiway_left_join", q_multiway_left_join, _MULTIWAY_LEFT_JOIN_SQL, "J2,A1", True,
              "Multi-way LEFT join with constant predicate, broadcast dims"),
    QuerySpec("disjunctive_join", q_disjunctive_join, _DISJUNCTIVE_JOIN_SQL, "J4", True,
              "OR-of-equalities join as union of equi-joins"),
    QuerySpec("semi_join", q_semi_join, _SEMI_JOIN_SQL, "J5", False,
              "left_semi / EXISTS filter"),
    QuerySpec("null_aware_left_join", q_null_aware_left_join, _NULL_AWARE_LEFT_JOIN_SQL, "J6", False,
              "LEFT join + NULL-aware CASE"),
    QuerySpec("conditional_agg", q_conditional_agg, _CONDITIONAL_AGG_SQL, "A6", True,
              "Conditional SUM(CASE...) share computation"),
    QuerySpec("dup_key_qa", q_dup_key_qa, _DUP_KEY_QA_SQL, "A7,A8", False,
              "Duplicate-key QA with HAVING + MIN/MAX"),
    QuerySpec("window_topk", q_window_topk, _WINDOW_TOPK_SQL, "W", False,
              "Top-k per group via row_number window"),
    QuerySpec("union_distinct", q_union_distinct, _UNION_DISTINCT_SQL, "U", False,
              "UNION set operation"),
    QuerySpec("tumbling_window", q_tumbling_window, _TUMBLING_WINDOW_SQL, "S10", True,
              "Tumbling-window event aggregation (batch parity of streaming op)"),
]:
    register(_spec)
