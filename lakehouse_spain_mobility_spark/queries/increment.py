"""Incremental (index-vs-batch) dedup — the production crawl shape.

Every dedup operator so far is full-corpus; a real training-data pipeline
dedups each INCOMING crawl batch against the already-curated corpus
index, then within itself. Split here is deterministic by key (60%
"index" / 40% "batch", ``doc_id % 5``); each batch document is classified
with the standard precedence:

- ``exact_dup``  — content hash collides with an index document,
- ``near_dup``   — shares ≥1 MinHash-LSH band with an index document,
- ``batch_dup``  — exact or band collision with an EARLIER batch
  document (keep-first within the batch),
- ``kept``       — survives into the corpus.

Spark-first / 100 TB shape: at scale the index side is a STORED
fingerprint table (hashes + band values — the reference pattern of
pre-materialized silver), so none of the index text is ever re-read;
every decision is a semi join on a hash or a band key, never a pair
enumeration. The within-batch keep-first is the skew-proof
min-aggregation (cf. ``operators/skew.py``); the batch band self-join is
bounded by bucket sizes exactly like ``dedup_minhash_lsh``. The batch
side is crawl-sized — orders of magnitude smaller than the index — so
its band table broadcasts on a real cluster.

Reuses the public MinHash/LSH machinery (``operators/dedup.py``) on both
engines, so the signature math is oracle-proven by the existing family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import sql_dsum
from ..operators import dedup as dd
from . import QuerySpec, register
from .tables import load

_MOD = 5
_BATCH_MIN = 3  # doc_id % 5 in {3, 4} -> batch (40%); else index


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    is_batch = (F.col("doc_id") % _MOD) >= _BATCH_MIN
    h = F.md5(F.col("text").cast("binary"))

    hashed = d.select("doc_id", h.alias("h"), is_batch.alias("is_batch"))
    idx_h = hashed.filter(~F.col("is_batch")).select("h").distinct()
    new_h = hashed.filter(F.col("is_batch")).select("doc_id", "h")

    # band table for the WHOLE corpus in one pass, split by key after
    bands = dd.lsh_bands(
        dd.minhash_signatures(dd.shingles(d, "doc_id", "text"))
    ).localCheckpoint(eager=True)  # consumed by three joins below; EAGER
    # because those surface as concurrent AQE broadcast stages and a lazy
    # local checkpoint materialized from two threads races in the block
    # manager (cf. the bitext_margin sf3 finding)
    idx_b = bands.filter((F.col("doc_id") % _MOD) < _BATCH_MIN).select(
        "band_idx", "band_val"
    ).distinct()
    new_b = bands.filter((F.col("doc_id") % _MOD) >= _BATCH_MIN)

    exact_idx = new_h.join(idx_h, "h", "left_semi").select("doc_id")
    near_idx = (
        new_b.join(idx_b, ["band_idx", "band_val"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    # within-batch earlier collisions: exact (first doc per hash keeps)
    # and banded (any earlier batch doc in the same bucket)
    first_h = new_h.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    batch_exact = (
        new_h.join(first_h, "h")
        .filter(F.col("doc_id") > F.col("first_id"))
        .select("doc_id")
    )
    earlier = new_b.select(
        F.col("doc_id").alias("e_id"), "band_idx", "band_val"
    )
    batch_band = (
        new_b.join(earlier, ["band_idx", "band_val"])
        .filter(F.col("e_id") < F.col("doc_id"))
        .select("doc_id")
        .distinct()
    )

    flag = lambda df, name: df.distinct().withColumn(name, F.lit(True))  # noqa: E731
    out = (
        new_h.select("doc_id")
        .join(flag(exact_idx, "f_exact"), "doc_id", "left")
        .join(flag(near_idx, "f_near"), "doc_id", "left")
        .join(flag(batch_exact, "f_bexact"), "doc_id", "left")
        .join(flag(batch_band, "f_bband"), "doc_id", "left")
    )
    status = (
        F.when(F.col("f_exact"), F.lit("exact_dup"))
        .when(F.col("f_near"), F.lit("near_dup"))
        .when(F.col("f_bexact") | F.col("f_bband"), F.lit("batch_dup"))
        .otherwise(F.lit("kept"))
    )
    return out.select("doc_id", status.alias("status"))


def _sql() -> str:
    bands_sql = dd.sql_lsh_bands(
        dd.sql_minhash_signatures(
            dd.sql_shingles("documents", "doc_id", "text")
        )
    )
    return f"""
WITH hashed AS (
    SELECT doc_id, md5(text) AS h, (doc_id % {_MOD}) >= {_BATCH_MIN} AS is_batch
    FROM documents
),
idx_h AS (SELECT DISTINCT h FROM hashed WHERE NOT is_batch),
new_h AS (SELECT doc_id, h FROM hashed WHERE is_batch),
bands AS ({bands_sql}),
idx_b AS (
    SELECT DISTINCT band_idx, band_val FROM bands
    WHERE (doc_id % {_MOD}) < {_BATCH_MIN}
),
new_b AS (SELECT * FROM bands WHERE (doc_id % {_MOD}) >= {_BATCH_MIN}),
exact_idx AS (SELECT doc_id FROM new_h WHERE h IN (SELECT h FROM idx_h)),
near_idx AS (
    SELECT DISTINCT n.doc_id FROM new_b n
    JOIN idx_b i ON n.band_idx = i.band_idx AND n.band_val = i.band_val
),
first_h AS (SELECT h, MIN(doc_id) AS first_id FROM new_h GROUP BY h),
batch_exact AS (
    SELECT n.doc_id FROM new_h n JOIN first_h f ON n.h = f.h
    WHERE n.doc_id > f.first_id
),
batch_band AS (
    SELECT DISTINCT a.doc_id FROM new_b a
    JOIN new_b e ON a.band_idx = e.band_idx AND a.band_val = e.band_val
              AND e.doc_id < a.doc_id
)
SELECT doc_id,
       CASE WHEN doc_id IN (SELECT doc_id FROM exact_idx) THEN 'exact_dup'
            WHEN doc_id IN (SELECT doc_id FROM near_idx) THEN 'near_dup'
            WHEN doc_id IN (SELECT doc_id FROM batch_exact)
              OR doc_id IN (SELECT doc_id FROM batch_band) THEN 'batch_dup'
            ELSE 'kept' END AS status
FROM new_h
"""


register(
    QuerySpec(
        "incremental_dedup",
        q_incremental_dedup,
        _sql(),
        "TD-dedup-incr",
        False,
        "Incremental crawl dedup: batch classified vs corpus index (exact/LSH) then within itself, all semi joins",
    )
)


# --- incremental view maintenance (signed-delta aggregate) -------------------
# The OTHER incremental shape a lakehouse needs: keep a materialized
# aggregate current under a CDC batch of inserts AND retractions without
# recomputing from scratch. The change batch derives deterministically
# from the events table (event_id % 10 == 0 → late-arriving insert of a
# value-shifted copy; event_id % 17 == 0 → retraction of the original),
# and the maintained view is the per-event-type (count, sum) aggregate:
#
#     base_agg ⊕ Σ signed deltas  ==  from-scratch recompute
#
# Spark-first / 100 TB: the base aggregate stands in for a stored silver
# table (catalog.create_or_replace at warehouse scale); the delta is ONE
# map-side-combined aggregation over the (crawl-sized) CDC batch with
# ±1 sign columns; the merge is a |groups|-sized union-aggregate —
# nothing fact-sized moves twice. The fixed-point dsum makes ⊕
# associative AND retraction-exact byte for byte — IEEE float sums are
# not ((a+b)-b ≠ a), which is why float-summed materialized views drift
# under retraction; integer micros cannot. The re-aggregation of the two
# double partials passes through dsum_rollup_guard, so past the 2^53
# double-exact envelope the query degrades loudly, never silently
# (ADVICE r3 q11 convention). The oracle recomputes the final state from
# scratch — a double-applied delta or a missed retraction shifts counts
# or micros and fails the hash.


def q_ivm_delta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.deterministic import dsum, dsum_rollup_guard

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    base_agg = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        dsum(F.col("value")).alias("total"),
    )
    inserts = ev.filter(F.col("event_id") % 10 == 0).select(
        "event_type",
        (F.col("value") + F.lit(0.5)).alias("value"),
        F.lit(1).alias("sign"),
    )
    retracts = ev.filter(F.col("event_id") % 17 == 0).select(
        "event_type", "value", F.lit(-1).alias("sign")
    )
    delta = (
        inserts.unionByName(retracts)
        .groupBy("event_type")
        .agg(
            F.sum("sign").cast("bigint").alias("n"),
            dsum(F.col("value") * F.col("sign")).alias("total"),
        )
    )
    return (
        base_agg.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            dsum(dsum_rollup_guard(F.col("total"))).alias("total_value"),
        )
    )


_IVM_SQL = f"""
WITH final_state AS (
    SELECT event_type, value FROM events WHERE event_id % 17 <> 0
    UNION ALL
    SELECT event_type, value + 0.5 AS value FROM events WHERE event_id % 10 = 0
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum('value')} AS total_value
FROM final_state
GROUP BY 1
"""


register(
    QuerySpec(
        "ivm_delta_agg",
        q_ivm_delta_agg,
        _IVM_SQL,
        "K2,A4,§2.10",
        False,
        "Incremental view maintenance: signed-delta merge equals from-scratch recompute",
    )
)
