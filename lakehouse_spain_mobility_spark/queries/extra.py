"""Extended operator coverage beyond the reference's own surface:
as-of join, rollup/cube, pandas-bridge dim join (S5), native spatial
aggregates/predicates (A9 fallback, P10 bbox)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.deterministic import davg, dsum, micro, sql_davg, sql_dsum, sql_micro
from . import QuerySpec, register
from .tables import load


# --- As-of join: purchase → most recent preceding view per user -------------
# Spark lacks a native as-of join (SURVEY guide "Common OLAP patterns");
# implemented as the union-tag + running last_value(ignoreNulls) pattern —
# one shuffle on user_id, no range explosion. Oracle: DuckDB's native
# ASOF JOIN proves the semantics.
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("ts"), F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("purchase_id"), F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ts"), F.lit(1).alias("is_purchase"),
        F.col("event_id").alias("purchase_id"), F.lit(None).cast("timestamp").alias("view_ts"),
    )
    tagged = views.unionByName(purchases)
    w = Window.partitionBy("user_id").orderBy("ts", "is_purchase").rowsBetween(
        Window.unboundedPreceding, 0
    )
    attributed = tagged.withColumn("last_view_ts", F.last("view_ts", ignorenulls=True).over(w))
    return attributed.filter(F.col("is_purchase") == 1).select(
        "purchase_id",
        "user_id",
        (
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_view_ts"))).cast("double")
            / F.lit(1000000.0)
        ).alias("secs_since_view"),
    )


_ASOF_SQL = """
SELECT p.event_id AS purchase_id, p.user_id,
       (CAST(epoch_us(p.ts) - epoch_us(v.ts) AS DOUBLE) / 1000000.0) AS secs_since_view
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


# --- ROLLUP with grouping ids ----------------------------------------------
def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
        F.grouping_id().cast("int").alias("gid"),
    )


_ROLLUP_SQL = f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


# --- S5: in-memory pandas registration bridged into a join ------------------
# (con.register("df_holidays", df) — dags/mitma/silver_mitma.py:39-51.)
_DAY_LABELS = [
    (0, "Sunday"), (1, "Monday"), (2, "Tue-Thu"), (5, "Friday"), (6, "Saturday"), (8, "Holiday"),
]


def q_pandas_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .core import q_typical_day

    labels = spark.createDataFrame(
        pd.DataFrame(_DAY_LABELS, columns=["day_type", "day_label"])
    )
    gold = q_typical_day(spark, sf_dir)
    return (
        gold.join(F.broadcast(labels), "day_type")
        .groupBy("day_label")
        .agg(
            F.count("*").alias("n_patterns"),
            dsum(F.col("total_trips")).alias("total_trips"),
        )
    )


def _labels_values_sql() -> str:
    vals = ", ".join(f"({dt}, '{lbl}')" for dt, lbl in _DAY_LABELS)
    return f"(VALUES {vals}) AS labels(day_type, day_label)"


from .core import _TYPICAL_DAY_SQL  # noqa: E402

_PANDAS_DIM_SQL = f"""
WITH gold AS ({_TYPICAL_DAY_SQL})
SELECT day_label,
       COUNT(*) AS n_patterns,
       {sql_dsum('total_trips')} AS total_trips
FROM gold JOIN {_labels_values_sql()} ON gold.day_type = labels.day_type
GROUP BY day_label
"""


# --- A9 fallback: centroid-of-centroids as plain aggregation ----------------
# ST_Point(AVG(ST_X(c)), AVG(ST_Y(c)))
# (dags/bussiness_layer/transform_gold_long_trip_dependency.py:73-82).
def q_centroid_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .gravity import _centroids

    cen = _centroids(spark, sf_dir)
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    return (
        cen.join(F.broadcast(n), cen.code == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(
            davg(F.col("lon")).alias("centroid_lon"),
            davg(F.col("lat")).alias("centroid_lat"),
            F.count("*").alias("n_members"),
        )
    )


from .gravity import _CENTROIDS_SQL  # noqa: E402

_CENTROID_FALLBACK_SQL = f"""
WITH centroids AS ({_CENTROIDS_SQL})
SELECT n_regionkey,
       {sql_davg('lon')} AS centroid_lon,
       {sql_davg('lat')} AS centroid_lat,
       COUNT(*) AS n_members
FROM centroids JOIN nation ON centroids.code = nation.n_nationkey
GROUP BY n_regionkey
"""


# --- P10 native: bbox containment predicate ---------------------------------
def q_bbox_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .gravity import _centroids

    cen = _centroids(spark, sf_dir)
    return cen.filter(
        F.col("lon").between(-3.0, -1.0) & F.col("lat").between(40.5, 41.8)
    ).orderBy("code")


_BBOX_SQL = f"""
WITH centroids AS ({_CENTROIDS_SQL})
SELECT * FROM centroids
WHERE lon BETWEEN -3.0 AND -1.0 AND lat BETWEEN 40.5 AND 41.8
ORDER BY code
"""


# --- §2.8 scalar-function battery -------------------------------------------
# Every string/conditional function the reference uses, in one projection:
# REPLACE suffix-strip, regexp digit-keep, split_part, TRIM/NULLIF,
# LEFT/RIGHT, Spanish-locale decimal, CASE, COALESCE, TRY_CAST.
def q_scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        F.col("c_custkey"),
        F.regexp_replace(name, "_AM|_AD", "").alias("suffix_stripped"),
        F.regexp_replace(name, "[^0-9]", "").alias("digits_only"),
        F.split_part(name, F.lit("#"), F.lit(1)).alias("split_first"),
        F.nullif(F.trim(F.col("c_mktsegment")), F.lit("MACHINERY")).alias("segment_or_null"),
        F.substring(name, 1, 8).alias("left8"),
        F.substring(name, -3, 3).alias("right3"),
        F.regexp_replace(F.regexp_replace(name, "[^0-9]", ""), "^0+", "")
        .try_cast("bigint")
        .alias("key_from_name"),
        F.when(F.col("c_acctbal") < 0, F.lit("NEGATIVE"))
        .when(F.col("c_acctbal") > 5000, F.lit("HIGH"))
        .otherwise(F.lit("NORMAL"))
        .alias("balance_bucket"),
        F.coalesce(F.col("c_acctbal"), F.lit(0.0)).alias("balance0"),
    ).filter(F.col("c_custkey") < 200)


_SCALAR_BATTERY_SQL = """
SELECT c_custkey,
       regexp_replace(c_name, '_AM|_AD', '', 'g') AS suffix_stripped,
       regexp_replace(c_name, '[^0-9]', '', 'g') AS digits_only,
       split_part(c_name, '#', 1) AS split_first,
       NULLIF(TRIM(c_mktsegment), 'MACHINERY') AS segment_or_null,
       left(c_name, 8) AS left8,
       right(c_name, 3) AS right3,
       TRY_CAST(regexp_replace(regexp_replace(c_name, '[^0-9]', '', 'g'), '^0+', '') AS BIGINT)
           AS key_from_name,
       CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
            WHEN c_acctbal > 5000 THEN 'HIGH'
            ELSE 'NORMAL' END AS balance_bucket,
       COALESCE(c_acctbal, 0.0) AS balance0
FROM customer
WHERE c_custkey < 200
"""


# --- Exact percentiles ------------------------------------------------------
# Spark's exact `percentile` and DuckDB's `quantile_cont` use the same
# (1-f)·a + f·b interpolation over the sorted group, so even these match
# bit-for-bit (approx_percentile would not — engine-specific sketches).
def q_percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


_PERCENTILE_SQL = """
SELECT event_type,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type
"""


# --- Pivot ------------------------------------------------------------------
def q_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type value matrix via pivot (explicit value list keeps
    the schema static — the scale-safe form; an unlisted pivot scans twice)."""
    ev = load(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.withColumn("date", F.to_date("ts"))
        .groupBy("date")
        .pivot("event_type", kinds)
        .agg(dsum(F.col("value")))
        .orderBy("date")
    )


_PIVOT_SQL = f"""
SELECT CAST(ts AS DATE) AS date,
       {sql_dsum("CASE WHEN event_type = 'click' THEN value END")} AS click,
       {sql_dsum("CASE WHEN event_type = 'error' THEN value END")} AS error,
       {sql_dsum("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase,
       {sql_dsum("CASE WHEN event_type = 'signup' THEN value END")} AS signup,
       {sql_dsum("CASE WHEN event_type = 'view' THEN value END")} AS view
FROM events
GROUP BY 1 ORDER BY 1
"""


# --- Cross-modal join: text table ⋈ embedding table -------------------------
def q_crossmodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings on doc_id=vec_id: the text↔vector alignment
    join every retrieval pipeline needs, rolled up per (lang, label)."""
    from ..operators.similarity import sql_norm2  # noqa: F401  (oracle twin)
    from ..operators import similarity as sim

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id)
    return joined.groupBy("lang", "label").agg(
        F.count("*").alias("n_docs"),
        davg(F.col("n_chars").cast("double")).alias("avg_chars"),
        davg(sim.norm2(F.col("embedding"))).alias("avg_norm"),
    )


def _crossmodal_sql() -> str:
    from ..operators.similarity import sql_norm2

    return f"""
SELECT lang, label,
       COUNT(*) AS n_docs,
       {sql_davg('CAST(n_chars AS DOUBLE)')} AS avg_chars,
       {sql_davg(sql_norm2('embedding'))} AS avg_norm
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY lang, label
"""


# --- Bounded time-range join (interval bucketing) ---------------------------
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, count/sum the same user's views in the following
    hour. A naive theta-join (``b.ts > a.ts AND b.ts <= a.ts + 1h``)
    is a per-user cross product; here both sides are bucketed to the
    1-hour grid and candidates are generated only for the two buckets a
    match can live in (probe side replicated 2×), so the join is a plain
    equi-join on (user_id, bucket) whose candidate count is bounded by
    per-bucket density — the standard interval-bucketing trick that keeps
    the pair count linear at 100 TB. The exact range predicate then runs
    on µs integers (portable across engines).
    """
    window_us = 3_600_000_000  # 1 hour
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("a_user"),
        F.unix_micros("ts").alias("a_us"),
        (F.unix_micros("ts") / F.lit(window_us)).cast("long").alias("bucket"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("b_user"),
        F.unix_micros("ts").alias("b_us"),
        "value",
    )
    # replicate each view into the two buckets where a matching click can be
    views2 = views.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("b_us") / F.lit(window_us)).cast("long"),
                (F.col("b_us") / F.lit(window_us)).cast("long") - F.lit(1),
            )
        ),
    )
    return (
        clicks.join(views2, (F.col("a_user") == F.col("b_user")) & (clicks.bucket == views2.bucket))
        .filter((F.col("b_us") > F.col("a_us")) & (F.col("b_us") <= F.col("a_us") + F.lit(window_us)))
        .groupBy(F.col("click_id"), F.col("a_user").alias("user_id"))
        .agg(F.count("*").alias("n_views"), dsum(F.col("value")).alias("sum_value"))
    )


_RANGE_JOIN_SQL = f"""
SELECT a.event_id AS click_id, a.user_id,
       COUNT(*) AS n_views,
       {sql_dsum('b.value')} AS sum_value
FROM (SELECT * FROM events WHERE event_type = 'click') a
JOIN (SELECT * FROM events WHERE event_type = 'view') b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) > epoch_us(a.ts)
 AND epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000
GROUP BY a.event_id, a.user_id
"""


# --- Event funnel ------------------------------------------------------------
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic conversion funnel over the events stream: per user, first
    signup → first subsequent click → first subsequent purchase, each
    step within 24h of the previous. One groupBy(user) with conditional
    min aggregates — no self-joins, one shuffle; the step ordering is
    enforced by comparing the conditional minima, which is exactly how
    funnels stay single-pass at 100 TB (min-per-type is a map-side
    partial)."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))

    def first_ts(t: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == t, us))

    per_user = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    day = 86400 * 1000000
    has_signup = F.col("t_signup").isNotNull()
    step2 = (
        has_signup
        & F.col("t_click").isNotNull()
        & (F.col("t_click") > F.col("t_signup"))
        & (F.col("t_click") <= F.col("t_signup") + day)
    )
    step3 = (
        step2
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") > F.col("t_click"))
        & (F.col("t_purchase") <= F.col("t_click") + day)
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(has_signup.cast("int")).alias("n_signup"),
        F.sum(step2.cast("int")).alias("n_signup_click"),
        F.sum(step3.cast("int")).alias("n_full_funnel"),
    )


_FUNNEL_SQL = """
WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
           MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
    FROM events
    GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                 AND t_click > t_signup AND t_click <= t_signup + 86400000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click IS NOT NULL
                 AND t_click > t_signup AND t_click <= t_signup + 86400000000
                 AND t_purchase IS NOT NULL
                 AND t_purchase > t_click AND t_purchase <= t_click + 86400000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM per_user
"""


# --- Table profiling (ANALYZE-style column statistics) -----------------------
_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
]


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profile of the orders table (what ANALYZE TABLE
    ... COMPUTE STATISTICS FOR COLUMNS feeds the CBO, and what a data
    catalog shows): per column — null count, distinct count, min/max
    (typed: numeric columns in the _num fields, strings in _str). All
    metrics come from ONE scan: a single aggregate row is checkpointed
    and the per-column long-format rows are narrow selects over it, so
    profiling N columns costs one pass regardless of N."""
    o = load(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c, kind in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("int")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
        ]
        if kind == "num":
            aggs += [
                F.min(F.col(c)).cast("double").alias(f"{c}__min"),
                F.max(F.col(c)).cast("double").alias(f"{c}__max"),
            ]
        else:
            aggs += [F.min(F.col(c)).alias(f"{c}__min"), F.max(F.col(c)).alias(f"{c}__max")]
    one = o.agg(*aggs).localCheckpoint(eager=True)
    parts = []
    for c, kind in _PROFILE_COLS:
        parts.append(
            one.select(
                F.lit(c).alias("column"),
                F.col("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (F.col(f"{c}__min") if kind == "num" else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"{c}__max") if kind == "num" else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"{c}__min") if kind == "str" else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"{c}__max") if kind == "str" else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _profile_sql() -> str:
    selects = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
            ms, xs = "NULL", "NULL"
        else:
            mn, mx = "NULL", "NULL"
            ms, xs = f"MIN({c})", f"MAX({c})"
        selects.append(
            f"""SELECT '{c}' AS column, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num,
       CAST({ms} AS VARCHAR) AS min_str, CAST({xs} AS VARCHAR) AS max_str
FROM orders"""
        )
    return "\nUNION ALL\n".join(selects)


# --- Cohort retention --------------------------------------------------------
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; for each (cohort_week, weeks_since) cell, the count of
    distinct users still active. Two aggregations — first-event per user
    (map-side partial min), then the cell rollup — and a broadcast-sized
    join of the per-user cohort back onto events; both engines truncate
    weeks to ISO Monday so the keys agree."""
    ev = load(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    first = ev.groupBy("user_id").agg(F.min("d").alias("first_d"))
    cohort = first.select(
        "user_id", F.date_trunc("week", "first_d").cast("date").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "d").cast("date").alias("activity_week")
    ).distinct()
    return (
        activity.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("weeks_since"),
        )
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )


_COHORT_SQL = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
first AS (SELECT user_id, MIN(d) AS first_d FROM ev GROUP BY user_id),
cohort AS (
    SELECT user_id, CAST(date_trunc('week', first_d) AS DATE) AS cohort_week FROM first
),
activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', d) AS DATE) AS activity_week FROM ev
)
SELECT c.cohort_week,
       CAST(date_diff('day', c.cohort_week, a.activity_week) / 7 AS INTEGER) AS weeks_since,
       COUNT(DISTINCT a.user_id) AS n_active_users
FROM activity a
JOIN cohort c ON a.user_id = c.user_id
GROUP BY c.cohort_week, weeks_since
"""


for _spec in [
    QuerySpec("cohort_retention", q_cohort_retention, _COHORT_SQL, "A-cohort", False,
              "Weekly cohort x weeks-since retention matrix (distinct active users)"),
    QuerySpec("table_profile", q_table_profile, _profile_sql(), "S6-profile", False,
              "ANALYZE-style per-column statistics in one scan (long format)"),
    QuerySpec("event_funnel", q_event_funnel, _FUNNEL_SQL, "A6-funnel", False,
              "Single-pass signup->click->purchase conversion funnel (conditional minima)"),
    QuerySpec("range_join", q_range_join, _RANGE_JOIN_SQL, "J-range", True,
              "Bounded time-range join via interval bucketing (no per-user cross product)"),
    QuerySpec("crossmodal_join", q_crossmodal_join, _crossmodal_sql(), "MM-join", False,
              "documents ⋈ embeddings alignment join with per-(lang,label) rollup"),
    QuerySpec("pivot_daily", q_pivot_daily, _PIVOT_SQL, "A-pivot", False,
              "Daily x event-type pivot matrix"),
    QuerySpec("percentile_summary", q_percentile_summary, _PERCENTILE_SQL, "A-quantile", False,
              "Exact percentile battery (interpolated, engine-exact)"),
    QuerySpec("scalar_battery", q_scalar_battery, _SCALAR_BATTERY_SQL, "F-scalar", False,
              "String/conditional scalar-function battery (SURVEY §2.8)"),
    QuerySpec("asof_join", q_asof_join, _ASOF_SQL, "J-asof", True,
              "As-of attribution join (union-tag + running last_value)"),
    QuerySpec("rollup_grouping", q_rollup_cube, _ROLLUP_SQL, "A-rollup", False,
              "ROLLUP with grouping ids"),
    QuerySpec("pandas_dim_join", q_pandas_dim_join, _PANDAS_DIM_SQL, "S5", False,
              "In-memory pandas dim registered and broadcast-joined"),
    QuerySpec("centroid_fallback", q_centroid_fallback, _CENTROID_FALLBACK_SQL, "A9", False,
              "Centroid-of-centroids spatial aggregate fallback"),
    QuerySpec("bbox_extract", q_bbox_extract, _BBOX_SQL, "P10", False,
              "Native bbox containment predicate"),
]:
    register(_spec)


# --- custom Python DataSource scan (Spark-4 connector surface) ----------------
# End-to-end driver signal for sources/pydatasource.py: register the
# synthetic-ledger source, scan it with predicates Catalyst pushes into
# the reader (entry_id range -> partition-range pruning; bucket equality
# -> strided generation), roll up per month. The DuckDB twin rebuilds
# the ledger from the same closed form over range(), so a wrong stride,
# a dropped partition slice, or an off-by-one in the pushed bounds all
# fail the hash. sf-independent by design — this row checks the
# CONNECTOR surface, not data scaling (the parquet family covers that).

_LEDGER_LO = 10_000
_LEDGER_HI = 60_000  # exclusive
_LEDGER_BUCKET = 3


def q_python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import pydatasource as pds

    try:
        pds.register(spark)
    except Exception:
        pass  # already registered in this session — registration is idempotent
    # runtime-settable in Spark 4.1; when off, Spark evaluates the same
    # predicates post-scan and the result is identical (invariance is
    # pinned by tests/test_round4d.py)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    led = spark.read.format("synthetic_ledger").load()
    picked = led.filter(
        (F.col("entry_id") >= _LEDGER_LO)
        & (F.col("entry_id") < _LEDGER_HI)
        & (F.col("bucket") == _LEDGER_BUCKET)
    )
    return picked.groupBy(
        F.date_format("day", "yyyy-MM").alias("month")
    ).agg(
        F.count("*").cast("bigint").alias("n_entries"),
        F.sum("amount_cents").cast("bigint").alias("total_cents"),
        F.min("entry_id").cast("bigint").alias("first_id"),
        F.max("entry_id").cast("bigint").alias("last_id"),
    )


_PYDS_SQL = f"""
WITH ledger AS (
    SELECT range AS entry_id,
           CAST(range % 16 AS INT) AS bucket,
           (range * 97) % 10000 AS amount_cents,
           DATE '2024-01-01' + CAST(range % 365 AS INT) AS day
    FROM range(0, 100000)
)
SELECT strftime(day, '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_entries,
       CAST(SUM(amount_cents) AS BIGINT) AS total_cents,
       CAST(MIN(entry_id) AS BIGINT) AS first_id,
       CAST(MAX(entry_id) AS BIGINT) AS last_id
FROM ledger
WHERE entry_id >= {_LEDGER_LO} AND entry_id < {_LEDGER_HI}
  AND bucket = {_LEDGER_BUCKET}
GROUP BY 1
"""


register(
    QuerySpec(
        "python_datasource_scan",
        q_python_datasource_scan,
        _PYDS_SQL,
        "S-pyds,§2.1",
        False,
        "Custom Python DataSource: partitioned synthetic-ledger scan with range+stride filter pushdown",
    )
)
