"""Engine-surface batteries beyond the reference's own SQL: window
functions, set operations, date/time scalars, array/higher-order
functions, positional explode, GROUPING SETS, and approximate distinct
counting.

The reference uses none of these directly (SURVEY §2.6 "window functions:
none", §2.7 "set operations: none"), but a user switching engines gets
them from DuckDB for free — so our Spark surface must provide them too,
each proven against the DuckDB oracle. Every float that crosses an
aggregation boundary goes through the deterministic fixed-point helpers
(functions/deterministic.py); raw stored doubles (lag/lead copies) are
exact by construction.

Scale notes: window batteries shuffle once on the partition key;
set operations hash-aggregate (EXCEPT/INTERSECT are distinct-based);
posexplode is a narrow transformation (no shuffle); GROUPING SETS runs
as a single Expand + one aggregation in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, sql_dsum
from ..operators.similarity import norm2, sql_norm2
from . import QuerySpec, register
from .tables import load


# --- Window-function battery (§2.6 upgrade) ---------------------------------
def q_window_battery(
    spark: SparkSession,
    sf_dir: str,
    serial: bool = False,
    min_parallel_rows: int | None = None,
) -> DataFrame:
    """row_number / ntile / lag / lead on a unique ordering plus
    rank / dense_rank / percent_rank / cume_dist on a tied ordering, and a
    running fixed-point sum.

    The SQL windows over PARTITION BY event_type — a ~5-value domain, the
    same one-task-per-value WindowExec serializer the frames battery
    escaped in round 6. The default form re-expresses each function in a
    scale-parallel normal form, value-identical:

    - row_number / ntile / lag / lead / running sum run through the
      chunk-parallel rank stencil (operators/pwindow.py ranked_window):
      local per-chunk ranks + a broadcast per-(chunk, partition) scalar
      carry (prefix counts / prefix sums / border order keys) — ONE fact
      exchange, sort stage task count = chunk count. ntile(4) is then a
      closed-form function of (row_number, partition count): with
      q = N div 4, r = N mod 4 the first r tiles take q+1 rows.
    - the w2 rank family (rank / dense_rank / percent_rank / cume_dist,
      ORDER BY floor(value)) has whole-floor-bucket ties, so every value
      is a pure function of the per-(event_type, floor) COUNTS table —
      tiny (|types| × |floor domain|, data-size-independent), windowed at
      counts-table size, broadcast back onto the fact.

    ``serial=True`` keeps the literal WindowExec form — the A/B reference
    (tests/test_pwindow.py::test_window_battery_serial_parallel_ab)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    if serial:
        w1 = Window.partitionBy("event_type").orderBy("value", "event_id")
        w2 = Window.partitionBy("event_type").orderBy(F.floor("value"))
        wrun = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        running_dec = F.sum(
            F.round(F.col("value") * F.lit(1000000.0)).cast("decimal(38,0)")
        ).over(wrun)
        return ev.select(
            "event_id",
            "event_type",
            F.row_number().over(w1).alias("rn"),
            F.ntile(4).over(w1).alias("quartile"),
            F.lag("value").over(w1).alias("prev_value"),
            F.lead("value").over(w1).alias("next_value"),
            F.rank().over(w2).cast("int").alias("rnk"),
            F.dense_rank().over(w2).cast("int").alias("drnk"),
            F.percent_rank().over(w2).alias("pct_rank"),
            F.cume_dist().over(w2).alias("cdist"),
            (running_dec.cast("string").cast("double") / F.lit(1000000.0)).alias(
                "running_value"
            ),
        )

    from ..operators.pwindow import ranked_window

    # w2 rank family from the counts table: lt = rows strictly below my
    # floor bucket (rank-1), row_number over buckets = dense_rank, lt+c =
    # cumulative inclusive count (cume_dist numerator), N2 = partition size
    counts = ev.groupBy("event_type", F.floor("value").alias("fk")).agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = Window.partitionBy("event_type").orderBy("fk")
    ctab = counts.select(
        F.col("event_type").alias("r_et"),
        "fk",
        F.coalesce(
            F.sum("c").over(wc.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ).alias("lt"),
        F.row_number().over(wc).alias("dr"),
        F.col("c"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n2"),
    )

    rw = ranked_window(
        ev.select("event_id", "event_type", "value"),
        ["event_type"],
        ["value", "event_id"],
        sums={
            # full-partition prefix of value·1e6: decimal(38,0), exact at
            # any scale (a long would clip past ~1e11 rows × 1e8 ppm)
            "run_ppm": F.round(F.col("value") * F.lit(1000000.0)).cast(
                "decimal(38,0)"
            )
        },
        rn_col="rn_l",
        total_col="n1",
        prev_cols={"prev_value": "value"},
        next_cols={"next_value": "value"},
        min_parallel_rows=min_parallel_rows,
    )
    # ntile(4) closed form: q = N div 4, r = N mod 4; the first r tiles
    # take q+1 rows each (threshold (q+1)·r), the rest take q
    nt = F.lit(4)
    q = F.floor(F.col("n1") / nt).cast("long")
    r = F.col("n1") % nt
    thr = (q + F.lit(1)) * r
    quartile = (
        F.when(
            F.col("rn_l") <= thr,
            F.floor((F.col("rn_l") - 1) / (q + F.lit(1))) + F.lit(1),
        )
        .otherwise(r + F.floor((F.col("rn_l") - thr - 1) / q) + F.lit(1))
        .cast("int")
    )
    return (
        rw.join(
            F.broadcast(ctab),
            (F.col("event_type") == F.col("r_et"))
            & (F.floor("value") == F.col("fk")),
        )
        .select(
            "event_id",
            "event_type",
            F.col("rn_l").cast("int").alias("rn"),
            quartile.alias("quartile"),
            "prev_value",
            "next_value",
            (F.col("lt") + 1).cast("int").alias("rnk"),
            F.col("dr").cast("int").alias("drnk"),
            F.when(F.col("n2") > 1, F.col("lt") / (F.col("n2") - 1))
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
            ((F.col("lt") + F.col("c")) / F.col("n2")).alias("cdist"),
            (
                F.col("run_ppm").cast("string").cast("double") / F.lit(1000000.0)
            ).alias("running_value"),
        )
    )


_WINDOW_SQL = """
SELECT event_id, event_type,
       CAST(ROW_NUMBER() OVER w1 AS INTEGER) AS rn,
       CAST(NTILE(4) OVER w1 AS INTEGER) AS quartile,
       LAG(value) OVER w1 AS prev_value,
       LEAD(value) OVER w1 AS next_value,
       CAST(RANK() OVER w2 AS INTEGER) AS rnk,
       CAST(DENSE_RANK() OVER w2 AS INTEGER) AS drnk,
       PERCENT_RANK() OVER w2 AS pct_rank,
       CUME_DIST() OVER w2 AS cdist,
       (CAST(CAST(SUM(CAST(ROUND(value * 1000000.0) AS DECIMAL(38,0)))
                  OVER (PARTITION BY event_type ORDER BY value, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS VARCHAR) AS DOUBLE) / 1000000.0) AS running_value
FROM events
WHERE value IS NOT NULL
WINDOW w1 AS (PARTITION BY event_type ORDER BY value, event_id),
       w2 AS (PARTITION BY event_type ORDER BY FLOOR(value))
"""


# --- Set operations (§2.7) --------------------------------------------------
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(high-value viewers INTERSECT high-value purchasers) EXCEPT
    high-value error-reporters — the distinct-based forms. Each set op is a
    hash semi/anti aggregation. Value thresholds keep the sets proper
    subsets of the user universe (every type touches every user here)."""
    ev = load(spark, sf_dir, "events")
    ids = lambda kind, cutoff: ev.filter(
        (F.col("event_type") == kind) & (F.col("value") > cutoff)
    ).select("user_id")
    return ids("view", 90).intersect(ids("purchase", 90)).subtract(ids("error", 95))


_SET_OPS_SQL = """
(SELECT user_id FROM events WHERE event_type = 'view' AND value > 90
 INTERSECT
 SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90)
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 95
"""


def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) forms: EXCEPT ALL and INTERSECT ALL over
    (user_id, day) with duplicate multiplicity preserved, tagged and
    unioned into one frame."""
    ev = load(spark, sf_dir, "events")
    pairs = lambda kind: ev.filter(F.col("event_type") == kind).select(
        "user_id", F.to_date("ts").alias("day")
    )
    views, purchases = pairs("view"), pairs("purchase")
    return (
        views.exceptAll(purchases)
        .withColumn("op", F.lit("except_all"))
        .unionByName(views.intersectAll(purchases).withColumn("op", F.lit("intersect_all")))
    )


_SET_OPS_ALL_SQL = """
SELECT *, 'except_all' AS op FROM (
    SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'view'
    EXCEPT ALL
    SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT *, 'intersect_all' AS op FROM (
    SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'view'
    INTERSECT ALL
    SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase')
"""


# --- Date/time scalar battery (§2.8 date functions, widened) ----------------
def q_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic over the distinct order dates: truncation,
    extraction, week numbering, month clamping, day offsets, epoch."""
    d = F.col("d")
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderdate")
        .distinct()
        .select(
            F.col("o_orderdate").alias("ts"),
            F.to_date("o_orderdate").alias("d"),
        )
        .select(
            "d",
            F.date_trunc("month", d).cast("date").alias("month_start"),
            F.year(d).alias("yr"),
            F.quarter(d).alias("qtr"),
            F.dayofmonth(d).alias("dom"),
            F.dayofyear(d).alias("doy"),
            F.weekofyear(d).alias("iso_week"),
            F.dayofweek(d).alias("dow_sun1"),
            F.last_day(d).alias("month_end"),
            F.date_add(d, 30).alias("plus_30d"),
            F.add_months(d, 2).alias("plus_2mo"),
            F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
            # ts is TIMESTAMP_NTZ off parquet; session TZ is pinned UTC so
            # the LTZ cast is wall-clock-preserving (matches DuckDB epoch_us
            # on the naive timestamp).
            F.unix_micros(F.col("ts").cast("timestamp")).alias("epoch_micros"),
        )
    )


_DATETIME_SQL = """
WITH base AS (SELECT DISTINCT o_orderdate AS ts, CAST(o_orderdate AS DATE) AS d
              FROM orders)
SELECT d,
       CAST(date_trunc('month', d) AS DATE) AS month_start,
       CAST(year(d) AS INTEGER) AS yr,
       CAST(quarter(d) AS INTEGER) AS qtr,
       CAST(day(d) AS INTEGER) AS dom,
       CAST(dayofyear(d) AS INTEGER) AS doy,
       CAST(week(d) AS INTEGER) AS iso_week,
       CAST(dayofweek(d) + 1 AS INTEGER) AS dow_sun1,
       last_day(d) AS month_end,
       d + 30 AS plus_30d,
       CAST(d + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
       CAST(date_diff('day', DATE '1995-01-01', d) AS INTEGER) AS days_since_95,
       epoch_us(ts) AS epoch_micros
FROM base
"""


# --- Array / higher-order function battery ----------------------------------
def q_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector array surface: length, subscript, max, filtered count,
    L2 norm (sequential fold — bit-identical to DuckDB list_reduce), sorted
    subscript, existence predicate."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_el"),
        F.array_max(emb).cast("double").alias("vmax"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        norm2(emb).alias("l2"),
        F.element_at(F.sort_array(emb, asc=False), 2).cast("double").alias("second_desc"),
        F.exists(emb, lambda x: x > F.lit(0.5)).alias("has_big"),
    )


_ARRAY_SQL = f"""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_el,
       CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vmax,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
       {sql_norm2('embedding')} AS l2,
       CAST(list_sort(embedding, 'DESC')[2] AS DOUBLE) AS second_desc,
       len(list_filter(embedding, x -> x > 0.5)) > 0 AS has_big
FROM embeddings
"""


# --- Positional explode (UNNEST WITH ORDINALITY analog) ---------------------
def q_explode_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the embedding column — the row-to-element pivot that
    feeds any per-dimension statistic. Narrow (no shuffle)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select("vec_id", F.col("pos").cast("int"), F.col("val").cast("double"))


_EXPLODE_SQL = """
SELECT vec_id, CAST(pos AS INTEGER) AS pos, CAST(val AS DOUBLE) AS val
FROM (SELECT vec_id,
             unnest(range(len(embedding))) AS pos,
             unnest(embedding) AS val
      FROM embeddings)
"""


# --- GROUPING SETS (beyond the rollup already covered) ----------------------
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status),(priority),()) — one Expand + one
    aggregation in Spark, not three scans."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs_v")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id() AS INT) AS gid,
               COUNT(*) AS n_orders,
               {_SPARK_DSUM_TOTALPRICE} AS total_price
        FROM orders_gs_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# Spark-SQL text twin of functions.deterministic.dsum (same fixed-point).
_SPARK_DSUM_TOTALPRICE = (
    "(CAST(CAST(SUM(CAST(ROUND(o_totalprice * 1000000.0) AS DECIMAL(38,0)))"
    " AS STRING) AS DOUBLE) / 1000000.0)"
)

_GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- Approximate distinct counting (HLL) ------------------------------------
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct per event_type, checked against the exact
    count with a 15% bound. The sketches differ between engines, so the
    oracle contract is (exact value, bound holds) — both deterministic.
    At 100 TB the sketch is mergeable map-side; the exact count shuffles
    every distinct key."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("int").alias("exact_users"),
        (
            F.abs(F.approx_count_distinct("user_id") - F.count_distinct("user_id"))
            <= 0.15 * F.count_distinct("user_id")
        ).alias("within_15pct"),
    )


_APPROX_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS INTEGER) AS exact_users,
       ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
           <= 0.15 * COUNT(DISTINCT user_id) AS within_15pct
FROM events
GROUP BY event_type
"""


# --- Unpivot / melt ----------------------------------------------------------
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape: per-language document metrics unpivoted to
    (lang, metric, value) rows — the melt a feature store or metrics
    exporter applies before writing a tall table. ``DataFrame.unpivot``
    (Spark ≥3.4) is a narrow zero-shuffle expansion of the already-small
    aggregate, so the whole query costs one aggregation regardless of how
    many metric columns are melted. Oracle uses the engine-portable
    UNION ALL form of the same reshape."""
    from ..functions.deterministic import davg, sql_davg  # noqa: F401

    d = load(spark, sf_dir, "documents")
    wide = d.groupBy("lang").agg(
        F.count("*").cast("double").alias("n_docs"),
        davg(F.col("n_chars").cast("double")).alias("avg_chars"),
        davg(F.length("text").cast("double")).alias("avg_len"),
    )
    return wide.unpivot(["lang"], ["n_docs", "avg_chars", "avg_len"], "metric", "value")


def _unpivot_sql() -> str:
    from ..functions.deterministic import sql_davg

    return f"""
WITH wide AS (
    SELECT lang,
           CAST(COUNT(*) AS DOUBLE) AS n_docs,
           {sql_davg('CAST(n_chars AS DOUBLE)')} AS avg_chars,
           {sql_davg('CAST(len(text) AS DOUBLE)')} AS avg_len
    FROM documents GROUP BY lang
)
SELECT lang, 'n_docs' AS metric, n_docs AS value FROM wide
UNION ALL
SELECT lang, 'avg_chars' AS metric, avg_chars AS value FROM wide
UNION ALL
SELECT lang, 'avg_len' AS metric, avg_len AS value FROM wide
"""


# --- Sliding (overlapping) windows -------------------------------------------
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 6h windows sliding every 3h: each event lands in
    exactly size/slide = 2 windows (epoch-aligned, like Spark's native
    F.window). The oracle reproduces the assignment by enumerating the 2
    aligned starts per event — proving the native operator's semantics
    rather than assuming them. Spark-side this is a single groupBy (the
    window expansion is a narrow generator), one shuffle on (start,
    event_type)."""
    ev = load(spark, sf_dir, "events")
    w = F.window("ts", "6 hours", "3 hours")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("total_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SLIDING_SQL = f"""
WITH starts AS (
    SELECT event_type, value,
           (CAST(floor(epoch_us(ts) / 10800000000) AS BIGINT) - i) * 10800000000
               AS win_start_us
    FROM events, (SELECT unnest(generate_series(0, 1)) AS i)
)
SELECT win_start_us, event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM starts
GROUP BY win_start_us, event_type
"""


# --- Rolling time-range window frame -----------------------------------------
def q_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling aggregate: per event, the count and
    fixed-point sum of the same type's events in the trailing hour —
    a true time-range frame (peers by value distance, not row offset),
    ordered on epoch micros so both engines frame identically. One
    shuffle on event_type; the frame scan is sort-local within each
    partition."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts"))
    hour = 3600 * 1000000
    w = (
        Window.partitionBy("event_type")
        .orderBy(us.alias("us"))
        .rangeBetween(-hour, Window.currentRow)
    )
    rolling_dec = F.sum(
        F.round(F.col("value") * F.lit(1000000.0)).cast("decimal(38,0)")
    ).over(w)
    return ev.select(
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_trailing_hour"),
        (rolling_dec.cast("string").cast("double") / F.lit(1000000.0)).alias(
            "sum_trailing_hour"
        ),
    )


_ROLLING_SQL = """
SELECT event_id, event_type,
       COUNT(*) OVER w AS n_trailing_hour,
       (CAST(CAST(SUM(CAST(ROUND(value * 1000000.0) AS DECIMAL(38,0))) OVER w
             AS VARCHAR) AS DOUBLE) / 1000000.0) AS sum_trailing_hour
FROM events
WHERE value IS NOT NULL
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


# --- Approximate quantile contract -------------------------------------------
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch quantiles: percentile_approx (GK sketch) vs the
    exact interpolated median, contract-checked within 10% per event
    type. The sketches differ across engines (GK vs t-digest), so the
    oracle compares (exact value, bound-holds boolean) — both
    deterministic. At 100 TB the sketch is the only option: it merges
    map-side; the exact quantile shuffles every value."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    exact = F.expr("percentile(value, 0.5)")
    approx = F.percentile_approx("value", 0.5)
    return ev.groupBy("event_type").agg(
        exact.alias("exact_p50"),
        (F.abs(approx - exact) <= 0.10 * F.abs(exact)).alias("within_10pct"),
    )


_APPROX_QUANTILE_SQL = """
SELECT event_type,
       quantile_cont(value, 0.5) AS exact_p50,
       ABS(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
           <= 0.10 * ABS(quantile_cont(value, 0.5)) AS within_10pct
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
"""


# --- Window frame battery: value frames + boundary navigation ---------------
# Serial-vs-parallel crossover for THIS battery (PERF.md round 7, local[32]
# compute-forced): serial wins to ~3M rows (sf3: 6.0 s vs 9.1 s), parallel
# wins at 10M (15.2 s vs 20.3 s) — higher than pwindow's generic 2M default
# because the parallel composition adds the consts min-chain + RANGE rollup.
_FRAMES_MIN_PARALLEL = 6_000_000


def q_window_frames_battery(
    spark: SparkSession,
    sf_dir: str,
    serial: bool | None = None,
    min_parallel_rows: int | None = None,
) -> DataFrame:
    """The frame shapes window_battery doesn't cover: first/last/nth_value
    under explicit ROWS frames, a centered ±2-row moving window, and a
    numeric RANGE offset frame (5 value-units back, peers included).

    The SQL spells every column as a window over PARTITION BY event_type —
    a ~5-value domain, so Spark's WindowExec would run the whole relation
    on ≤5 tasks (measured sf10: 23 s of window compute with 27 cores idle;
    the round-5 'writer gap' decomposition was wrong — count() had pruned
    the window expressions, the sink inherited the serial stage). Round 6
    re-expresses each frame in its parallel normal form, value-identical:

    - fv / lv / nth3 are per-partition CONSTANTS (cumulative FIRST = the
      min (value,id) row; CURRENT..FOLLOWING LAST = the max row; cumulative
      NTH(3) = the 3rd-smallest row, NULL for the two rows before it) —
      one min/max pass plus a two-step broadcast min-chain, no sort;
    - the ±2 ROWS frames run through the chunk-parallel ghost-cell window
      (operators/pwindow.py) — exact, cluster-wide parallel;
    - the RANGE(-5) count is a 6-term rollup over the (event_type,
      floor(value)) counts table — a well-distributed aggregation joined
      back on the key (AQE broadcasts the small side at test scale).

    ``serial`` — None (default) measures the relation once and routes:
    below the measured crossover (_FRAMES_MIN_PARALLEL; serial-wins region
    per PERF.md round 7 — the frames battery's crossover sits higher than
    the generic pwindow default because its parallel composition also pays
    the consts min-chain and the RANGE rollup) the literal WindowExec form
    runs — one pass, no fixed parallel toll; above it the parallel
    composition runs, reusing that same count as the stencil's stats job
    (zero extra jobs either way). True/False force a side — the A/B parity
    test
    (tests/test_pwindow.py::test_window_frames_battery_serial_parallel_ab)
    asserts both produce identical rows."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    key = F.struct(F.col("value").alias("v"), F.col("event_id").alias("e"))
    total = None
    if serial is None:
        total = ev.count()
        floor = (
            _FRAMES_MIN_PARALLEL if min_parallel_rows is None else min_parallel_rows
        )
        serial = total < floor
    if serial:
        w = Window.partitionBy("event_type").orderBy("value", "event_id")
        w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        w_all = Window.partitionBy("event_type")
        lv = F.max(key).over(w_all)["e"]
        w_mov = w.rowsBetween(-2, 2)
        w_rng = (
            Window.partitionBy("event_type")
            .orderBy(F.floor("value").cast("long"))
            .rangeBetween(-5, 0)
        )
        mov_sum = F.sum(
            F.round(F.col("value") * F.lit(1000000.0)).cast("decimal(38,0)")
        ).over(w_mov)
        return ev.select(
            "event_id",
            "event_type",
            F.first("event_id").over(w_cum).alias("fv"),
            lv.alias("lv"),
            F.nth_value("event_id", 3).over(w_cum).alias("nth3"),
            F.count("*").over(w_mov).cast("bigint").alias("mov_cnt"),
            mov_sum.cast("long").alias("mov_sum_ppm"),
            F.count("*").over(w_rng).cast("bigint").alias("rng_cnt"),
        )

    from ..operators.pwindow import sliding_rows_window

    # per-partition constants: min/max in one pass, then the 2nd and 3rd
    # smallest via broadcast-filtered re-aggregation (keys are unique —
    # event_id is — so strict > steps one rank at a time)
    g1 = ev.groupBy("event_type").agg(
        F.min(key).alias("m1"), F.max(key).alias("mx")
    )
    g2 = (
        ev.join(F.broadcast(g1), "event_type")
        .filter(key > F.col("m1"))
        .groupBy("event_type")
        .agg(F.min(key).alias("m2"))
    )
    g3 = (
        ev.join(F.broadcast(g2), "event_type")
        .filter(key > F.col("m2"))
        .groupBy("event_type")
        .agg(F.min(key).alias("m3"))
    )
    consts = g1.join(g2, "event_type", "left").join(g3, "event_type", "left")

    # RANGE(-5) count: per-(type, floor) counts, 6-term rollup, join back.
    k = F.floor("value").cast("long")
    ck = ev.groupBy(F.col("event_type"), k.alias("k")).agg(
        F.count("*").alias("ck")
    )
    rng = (
        ck.select(
            F.col("event_type").alias("rng_et"),
            F.explode(F.sequence(F.col("k"), F.col("k") + F.lit(5))).alias("rng_k"),
            "ck",
        )
        .groupBy("rng_et", "rng_k")
        .agg(F.sum("ck").cast("bigint").alias("rng_cnt"))
    )

    mov = sliding_rows_window(
        ev.select("event_id", "event_type", "value"),
        ["event_type"],
        ["value", "event_id"],
        {
            "mov_cnt": lambda w: F.count("*").over(w).cast("bigint"),
            # ppm units are exact integers; a 5-row sum of |value|·1e6 sits
            # far inside long range, so the decimal(38,0) the oracle spells
            # is computed in long arithmetic bit-identically
            "mov_sum_ppm": lambda w: F.sum(
                F.round(F.col("value") * F.lit(1000000.0)).cast("long")
            )
            .over(w)
            .cast("long"),
        },
        -2,
        2,
        total=total,
        min_parallel_rows=min_parallel_rows,
    )
    return (
        mov.join(F.broadcast(consts), "event_type")
        .join(
            rng,
            (F.col("event_type") == F.col("rng_et")) & (k == F.col("rng_k")),
            "left",
        )
        .select(
            "event_id",
            "event_type",
            F.col("m1")["e"].alias("fv"),
            F.col("mx")["e"].alias("lv"),
            F.when(key < F.col("m3"), F.lit(None))
            .otherwise(F.col("m3")["e"])
            .alias("nth3"),
            "mov_cnt",
            "mov_sum_ppm",
            "rng_cnt",
        )
    )


_WINDOW_FRAMES_SQL = """
SELECT event_id, event_type,
       FIRST_VALUE(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv,
       LAST_VALUE(event_id) OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS lv,
       NTH_VALUE(event_id, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nth3,
       CAST(COUNT(*) OVER (w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS mov_cnt,
       CAST(SUM(CAST(ROUND(value * 1000000.0) AS DECIMAL(38,0)))
                OVER (w ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS mov_sum_ppm,
       CAST(COUNT(*) OVER (PARTITION BY event_type
                           ORDER BY CAST(FLOOR(value) AS BIGINT)
                           RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS rng_cnt
FROM events
WHERE value IS NOT NULL
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


for _spec in [
    QuerySpec("approx_quantile", q_approx_quantile, _APPROX_QUANTILE_SQL, "A-approxq", False,
              "Approximate-median sketch contract vs exact interpolated percentile"),
    QuerySpec("window_frames_battery", q_window_frames_battery, _WINDOW_FRAMES_SQL, "W-frames", False,
              "Frame-shape battery: first/last/nth_value, centered ROWS frame, numeric RANGE offset"),
    QuerySpec("rolling_time_window", q_rolling_time_window, _ROLLING_SQL, "W-range", False,
              "Trailing-hour RANGE-frame rolling count/sum per event type"),
    QuerySpec("sliding_window", q_sliding_window, _SLIDING_SQL, "W-sliding", False,
              "Overlapping 6h/3h sliding windows, oracle enumerates the aligned starts"),
    QuerySpec("unpivot_metrics", q_unpivot_metrics, _unpivot_sql(), "F-unpivot", False,
              "Wide-to-long melt of per-language metrics (DataFrame.unpivot)"),
    QuerySpec("window_battery", q_window_battery, _WINDOW_SQL, "W-battery", True,
              "Window-function battery: ranks, offsets, ntile, running fixed-point sum"),
    QuerySpec("set_ops", q_set_ops, _SET_OPS_SQL, "SET-distinct", False,
              "INTERSECT / EXCEPT distinct set algebra"),
    QuerySpec("set_ops_all", q_set_ops_all, _SET_OPS_ALL_SQL, "SET-bag", False,
              "EXCEPT ALL / INTERSECT ALL multiset algebra with multiplicity"),
    QuerySpec("datetime_battery", q_datetime_battery, _DATETIME_SQL, "F-datetime", False,
              "Calendar scalar battery: trunc/extract/week/clamped month math/epoch"),
    QuerySpec("array_battery", q_array_battery, _ARRAY_SQL, "F-array", False,
              "Array/higher-order battery over embeddings"),
    QuerySpec("explode_positional", q_explode_positional, _EXPLODE_SQL, "F-explode", False,
              "posexplode vs zipped UNNEST with ordinality"),
    QuerySpec("grouping_sets", q_grouping_sets, _GROUPING_SETS_SQL, "A-gsets", False,
              "Explicit GROUPING SETS with grouping ids"),
    QuerySpec("approx_distinct", q_approx_distinct, _APPROX_SQL, "A-approx", False,
              "HLL approx_count_distinct with exact-count error bound"),
]:
    register(_spec)
