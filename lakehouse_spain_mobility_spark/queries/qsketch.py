"""Mergeable quantile-sketch profiling query (VERDICT r9 #7).

``kll_quantile_sketch`` estimates p50/p90/p99 of ``events.value`` per
event_type from the hash-geometric level sample
(``operators/quantile_sketch.py`` — the order-free mergeable core of the
KLL family, constant ~k-row state per group at any scale) and reports the
ACCURACY CONTRACT alongside the estimate: the estimated value's true rank
in the full group vs the target rank, as an exact-integer ppm error both
engines compute identically.

Engine parity: the sample membership is a pure function of md5(event_id)
(the family's 48-bit convention), the level is integer arithmetic
(bit_length via bin()), target ranks are CEIL over DOUBLE products (both
engines evaluate the same IEEE double), and every output is BIGINT or a
micro-quantized double — the standard differential-gate conventions.

Scale shape (100 TB): pass 1 is a tiny per-group COUNT; pass 2 filters
the fact map-side to ~k rows/group with the broadcast (n, lvl) table, so
the only full-relation work is two scans and nothing fact-sized ever
shuffles; pass 3 re-scans with the 15-row probe table broadcast for the
true-rank contract (a VERIFICATION pass a production profiler would skip
— the sketch's answer is complete after pass 2). Exact
``percentile_summary`` (queries/extra.py) stays registered as the
sort-based exact twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.deterministic import micro, sql_micro
from ..operators.quantile_sketch import level_sample
from . import QuerySpec, register
from .tables import load

_QS_K = 256  # target kept rows per group (rank se ~ n/sqrt(k) ≈ 6% rel)
_QS_PCTS = ((50, 0.5), (90, 0.9), (99, 0.99))


def q_kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .filter(F.col("value").isNotNull())
    )
    sampled = level_sample(base, ["event_type"], "event_id", _QS_K)

    w_rank = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = sampled.select(
        "event_type",
        "event_id",
        "value",
        "n",
        "lvl",
        (F.row_number().over(w_rank).cast("bigint") * F.col("weight")).alias("est_rank"),
        F.count("*").over(Window.partitionBy("event_type")).cast("bigint").alias("n_sampled"),
    )
    # probe quantiles: explode a 3-element literal array over the ~k-row
    # sample (never over the fact)
    probes = F.array(
        *[
            F.struct(
                F.lit(pct).alias("q_pct"), F.lit(float(q)).alias("q")
            )
            for pct, q in _QS_PCTS
        ]
    )
    cand = ranked.select("*", F.explode(probes).alias("p")).select(
        "event_type", "event_id", "value", "n", "lvl", "n_sampled", "est_rank",
        F.col("p.q_pct").alias("q_pct"),
        F.ceil(F.col("p.q") * F.col("n").cast("double")).cast("bigint").alias("target_rank"),
    )
    w_pick = Window.partitionBy("event_type", "q_pct").orderBy(
        F.abs(F.col("est_rank") - F.col("target_rank")), F.col("value"), F.col("event_id")
    )
    picks = cand.withColumn("sel", F.row_number().over(w_pick)).filter(
        F.col("sel") == 1
    ).select(
        "event_type", "q_pct", "n", "lvl", "n_sampled", "target_rank",
        F.col("value").alias("est_value"), F.col("event_id").alias("est_id"),
    )
    # accuracy contract: exact rank of the estimated value in the FULL
    # group, under the same (value, event_id) total order the sample rank
    # used. LITERAL-PROBE form (r10, the dsir literal-map idiom): the 15
    # picks are collected at BUILD time (eager-build contract, see the
    # QuerySpec description) and become 15 conditional sums over ONE
    # un-amplified scan — the probe-join form generated 3× the fact as
    # join output before its partial aggregation, the measured ~2 s slice
    # of the sf10 ladder (PERF.md round 10). The oracle keeps the join
    # form (values identical; DuckDB's hash join doesn't pay the
    # amplification the same way).
    pk = picks.collect()
    pk.sort(key=lambda r: (r["event_type"], r["q_pct"]))
    conds = [
        F.sum(
            (
                (F.col("event_type") == r["event_type"])
                & (
                    (F.col("value") < F.lit(float(r["est_value"])))
                    | (
                        (F.col("value") == F.lit(float(r["est_value"])))
                        & (F.col("event_id") <= F.lit(int(r["est_id"])))
                    )
                )
            ).cast("long")
        ).alias(f"tr_{i}")
        for i, r in enumerate(pk)
    ]
    truth = base.agg(*conds).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r["event_type"]).alias("event_type"),
                        F.lit(int(r["q_pct"])).alias("q_pct"),
                        F.col(f"tr_{i}").cast("bigint").alias("true_rank"),
                    )
                    for i, r in enumerate(pk)
                ]
            )
        ).alias("t")
    ).select("t.*")
    picks_lit = spark.createDataFrame(
        [
            (
                r["event_type"],
                int(r["q_pct"]),
                int(r["n"]),
                int(r["lvl"]),
                int(r["n_sampled"]),
                int(r["target_rank"]),
                float(r["est_value"]),
            )
            for r in pk
        ],
        "event_type string, q_pct int, n bigint, lvl int, n_sampled bigint, "
        "target_rank bigint, est_value double",
    )
    return (
        picks_lit.join(truth, ["event_type", "q_pct"])
        .select(
            "event_type",
            F.col("q_pct").cast("int").alias("q_pct"),
            "n",
            F.col("lvl").cast("int").alias("lvl"),
            "n_sampled",
            micro(F.col("est_value")).alias("est_value_micro"),
            "target_rank",
            "true_rank",
            F.round(
                F.abs(F.col("true_rank") - F.col("target_rank")).cast("double")
                / F.col("n").cast("double")
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("rank_err_ppm"),
        )
        .orderBy("event_type", "q_pct")
    )


def _qsketch_sql() -> str:
    from ..functions.xxh64_sql import xxh64_u64_sql_from

    probes = ", ".join(f"({pct}, CAST({q} AS DOUBLE))" for pct, q in _QS_PCTS)
    # the content hash is Spark's native xxhash64 (low 48 bits) — the
    # oracle replays it as generated SQL (hll_distinct_x64 precedent;
    # the replay is a parity proof, and the decade row's denominator is
    # flagged accordingly)
    hashed = xxh64_u64_sql_from(
        "event_id",
        "SELECT b.event_type, b.event_id, b.value, l.n, l.lvl "
        "FROM base b JOIN lv l USING (event_type)",
        "event_type, event_id, value, n, lvl",
    )
    # PUSHDOWN BARRIER (measured, round 10): a WHERE over the chain's h_u
    # gets pushed down through the 14 projection levels by substitution —
    # each level references its input 2-3×, so the inlined predicate
    # explodes exponentially (sf1: 166 s vs 0.94 s for the bare chain;
    # AS MATERIALIZED helped only fragilely). A window column blocks the
    # pushdown LEGALLY — a filter on non-partition columns cannot move
    # below a window without changing its input set — so the sample
    # predicate references ``_b`` = MIN(lvl) OVER (PARTITION BY
    # event_type), which is identically ``lvl`` (constant per group) but
    # forces the filter to stay above the window: sf1 1.77 s.
    barrier = (
        "SELECT event_type, event_id, value, n, lvl, h_u, "
        "MIN(lvl) OVER (PARTITION BY event_type) AS _b "
        f"FROM ({hashed})"
    )
    return f"""
WITH base AS (
    SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
sizes AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM base GROUP BY 1
),
lv AS (
    SELECT event_type, n,
           CAST(CASE WHEN m <= 1 THEN 0
                     ELSE length(bin(CAST(m - 1 AS BIGINT))) END AS INTEGER) AS lvl
    FROM (SELECT event_type, n,
                 CAST(FLOOR((n + {_QS_K - 1}) / {_QS_K}) AS BIGINT) AS m
          FROM sizes)
),
sampled AS (
    SELECT event_type, event_id, value, n, lvl,
           CAST(POW(2, lvl) AS BIGINT) AS weight
    FROM ({barrier})
    WHERE (CAST(h_u & {(1 << 48) - 1}::UBIGINT AS BIGINT)
           & (CAST(POW(2, _b) AS BIGINT) - 1)) = 0
),
ranked AS (
    SELECT event_type, event_id, value, n, lvl,
           CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT)
             * weight AS est_rank,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_sampled
    FROM sampled
),
cand AS (
    SELECT r.event_type, r.event_id, r.value, r.n, r.lvl, r.n_sampled, r.est_rank,
           p.q_pct,
           CAST(CEIL(p.q * CAST(r.n AS DOUBLE)) AS BIGINT) AS target_rank
    FROM ranked r CROSS JOIN (VALUES {probes}) AS p(q_pct, q)
),
picks AS (
    SELECT event_type, q_pct, n, lvl, n_sampled, target_rank,
           value AS est_value, event_id AS est_id
    FROM (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, q_pct
                                  ORDER BY ABS(est_rank - target_rank), value, event_id) AS sel
        FROM cand
    ) WHERE sel = 1
),
truth AS (
    SELECT b.event_type, p.q_pct,
           CAST(SUM(CASE WHEN b.value < p.est_value
                          OR (b.value = p.est_value AND b.event_id <= p.est_id)
                     THEN 1 ELSE 0 END) AS BIGINT) AS true_rank
    FROM base b JOIN picks p USING (event_type)
    GROUP BY 1, 2
)
SELECT p.event_type,
       CAST(p.q_pct AS INTEGER) AS q_pct,
       p.n,
       p.lvl,
       p.n_sampled,
       {sql_micro('p.est_value')} AS est_value_micro,
       p.target_rank,
       t.true_rank,
       CAST(ROUND(ABS(t.true_rank - p.target_rank) / CAST(p.n AS DOUBLE) * 1000000.0) AS BIGINT)
           AS rank_err_ppm
FROM picks p JOIN truth t USING (event_type, q_pct)
ORDER BY p.event_type, p.q_pct
"""


register(
    QuerySpec(
        "kll_quantile_sketch",
        q_kll_quantile_sketch,
        _qsketch_sql(),
        "SK-quantile,A-quantile",
        False,
        "Mergeable quantile sketch (KLL-shape hash-geometric level sample): "
        "p50/p90/p99 per event_type from ~256-row state with exact true-rank "
        "accuracy contract (rank_err_ppm vs target rank). EAGER BUILD: "
        "constructing the DataFrame runs the sizes+sample+picks jobs and "
        "freezes the 15 probes as literals for the truth pass (the dsir "
        "literal-map contract — see q_kll_quantile_sketch)",
    )
)
