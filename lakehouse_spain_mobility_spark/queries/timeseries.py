"""Time-series completion: hypertable-style gap fill + linear interpolation.

The reference's gold tables are hourly pattern aggregates
(``dags/mitma/new_gold.py:22-86``); a production rollup over them needs the
missing-hour story the reference never handles: a sensor/ingest outage
leaves holes in the hourly grid, and downstream models want a dense,
interpolated series. This is the canonical timescale/hypertable
``time_bucket_gapfill + interpolate`` operator, re-expressed Spark-first:

- bucketize (integer epoch-hour — no float floor, engine-portable),
- per-series dense grid via ``sequence(min_bucket, max_bucket)`` + explode
  (Spark generates the grid distributed, one task per series chunk; no
  driver loop),
- gap detection + nearest-observed-neighbor lookup with two running
  window extrema (MAX/MIN over CASE — expressible identically in both
  engines, no IGNORE NULLS dependency),
- linear interpolation as per-row IEEE double math over fixed-point-exact
  aggregated endpoints, emitted as integer micro-units.

At 100 TB the plan keeps one shuffle per stage boundary: the hourly
aggregate shuffles on (series, bucket), the grid explode is map-side, the
two window passes reuse the (series, bucket) sort, and the endpoint
lookups are self-equi-joins on the same key — AQE coalesces the
small-series tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, micro, sql_dsum, sql_micro
from . import QuerySpec, register
from .tables import load

_BUCKET_US = 3600 * 1000000  # hourly


def q_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            # Integer floor division (matches the oracle's //): double
            # true-division + cast truncates toward zero, which diverges
            # from floor on pre-1970 timestamps.
            F.expr(f"unix_micros(ts) div {_BUCKET_US}").alias("bucket"),
        )
        .agg(dsum(F.col("value")).alias("v"))
    )
    span = hourly.groupBy("event_type").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = span.select(
        "event_type", F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("bucket")
    )
    g2 = grid.join(hourly, ["event_type", "bucket"], "left")
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Suffix-min via the REVERSED cumulative frame: Spark's
    # UnboundedFollowing frame re-evaluates per row (O(n²) per partition);
    # ordering DESC and taking the running min over [unboundedPreceding,
    # currentRow] computes the same nearest-following bucket in the
    # incremental O(n) path (cf. queries/battery.py lv rewrite).
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    observed_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    marked = g2.select(
        "event_type",
        "bucket",
        "v",
        F.max(observed_bucket).over(w_back).alias("prev_b"),
        F.min(observed_bucket).over(w_fwd).alias("next_b"),
    )
    prev_v = hourly.select(
        F.col("event_type").alias("event_type"),
        F.col("bucket").alias("prev_b"),
        F.col("v").alias("pv"),
    )
    next_v = hourly.select(
        F.col("event_type").alias("event_type"),
        F.col("bucket").alias("next_b"),
        F.col("v").alias("nv"),
    )
    joined = marked.join(prev_v, ["event_type", "prev_b"], "left").join(
        next_v, ["event_type", "next_b"], "left"
    )
    # Same expression shape as the SQL twin: linear interpolation between
    # the fixed-point-exact endpoint sums, per-row IEEE double math.
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("bucket") - F.col("prev_b")).cast("double")
        / (F.col("next_b") - F.col("prev_b")).cast("double")
    )
    return joined.select(
        "event_type",
        "bucket",
        F.when(F.col("v").isNotNull(), F.lit(0)).otherwise(F.lit(1)).alias("is_filled"),
        micro(F.coalesce(F.col("v"), interp)).alias("value_ppm"),
    )


_GAP_FILL_SQL = f"""
WITH hourly AS (
    SELECT event_type,
           CAST(epoch_us(ts) // {_BUCKET_US} AS BIGINT) AS bucket,
           {sql_dsum('value')} AS v
    FROM events
    GROUP BY 1, 2
),
span AS (
    SELECT event_type, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM hourly GROUP BY 1
),
grid AS (
    SELECT event_type, unnest(generate_series(b0, b1)) AS bucket FROM span
),
g2 AS (
    SELECT g.event_type, g.bucket, h.v
    FROM grid g LEFT JOIN hourly h ON g.event_type = h.event_type AND g.bucket = h.bucket
),
marked AS (
    SELECT event_type, bucket, v,
           MAX(CASE WHEN v IS NOT NULL THEN bucket END)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS UNBOUNDED PRECEDING) AS prev_b,
           MIN(CASE WHEN v IS NOT NULL THEN bucket END)
               OVER (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_b
    FROM g2
)
SELECT m.event_type,
       m.bucket,
       CASE WHEN m.v IS NOT NULL THEN 0 ELSE 1 END AS is_filled,
       {sql_micro('COALESCE(m.v, p.v + (n.v - p.v) * '
                  '(CAST(m.bucket - m.prev_b AS DOUBLE) / CAST(m.next_b - m.prev_b AS DOUBLE)))')}
           AS value_ppm
FROM marked m
LEFT JOIN hourly p ON m.event_type = p.event_type AND m.prev_b = p.bucket
LEFT JOIN hourly n ON m.event_type = n.event_type AND m.next_b = n.bucket
"""


register(
    QuerySpec(
        "gap_fill_interpolate",
        q_gap_fill_interpolate,
        _GAP_FILL_SQL,
        "TS-gapfill,W,A1",
        False,
        "Hypertable-style hourly gap fill + linear interpolation (dense grid via sequence/explode)",
    )
)
