"""Skew-handling operators (SURVEY §4.3 / BASELINE north star: "salted
aggregation for skewed OD pairs").

At 100 TB a handful of hot OD pairs (e.g. Madrid-center ↔ Madrid-center)
can hold a single reducer hostage. Two mitigations, composable with every
aggregation in this engine:

- AQE skew-join splitting is ON by default (``session.py``) — joins
  self-heal.
- ``salted_aggregate`` here fixes skewed *aggregations*: phase 1
  aggregates on (keys, salt) spreading each hot key over ``n_salts``
  reducers, phase 2 merges the partials. Because the engine's
  deterministic sums are associative decimals, salting cannot change a
  single output bit — asserted by tests against the unsalted plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase SUM/COUNT battery over a possibly-skewed key set.

    Output: keys + total (deterministic double sum), n_rows. Extend the
    partial set as needed — any commutative-monoid aggregate (decimal
    sums, counts, min/max) merges exactly.
    """
    keys = list(keys)
    v = F.col(value_col)
    scale = F.lit(1000000.0)
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(F.round(v * scale).cast("decimal(38,0)")).alias("_s"),
        F.count(v).alias("_n"),
    )
    merged = partial.groupBy(*keys).agg(
        (F.sum("_s").cast("string").cast("double") / scale).alias("total"),
        F.sum("_n").alias("n_rows"),
    )
    return merged


def unsalted_aggregate(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """Reference single-phase form for equivalence testing."""
    from ..functions.deterministic import dsum

    v = F.col(value_col)
    return df.groupBy(*list(keys)).agg(
        dsum(v).alias("total"), F.count(v).alias("n_rows")
    )


def keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    payload: Sequence[str] = (),
) -> DataFrame:
    """Skew-proof keep-first: one row per ``keys`` group, minimal under
    ``order`` (which must be unique within each group).

    Equivalent to ``row_number().over(Window.partitionBy(keys)
    .orderBy(order)) == 1`` but executes as a plain hash aggregation over
    ``MIN(STRUCT(order..., payload...))``: map-side partial MINs absorb
    any key skew — a line duplicated 10⁶ times collapses to one candidate
    per input partition BEFORE the exchange, and no per-key sort ever
    happens (the row_number form sorts the whole hot group in one task).
    Struct comparison is lexicographic field-by-field, so with ``order``
    unique per group the ``payload`` fields ride along without ever
    deciding the winner. (SCALE.md §8c line_dedup fallback — VERDICT r3 #6.)
    """
    keys, order, payload = list(keys), list(order), list(payload)
    first = df.groupBy(*keys).agg(
        F.min(F.struct(*[F.col(c) for c in order + payload])).alias("_first")
    )
    return first.select(
        *keys, *[F.col(f"_first.{c}").alias(c) for c in order + payload]
    )


def quota_keep_by_hash(
    df: DataFrame,
    bucket_col: str,
    key_col: str,
    cap: int,
    prefix_len: int = 2,
) -> DataFrame:
    """Exact per-bucket quota — keep the ``cap`` md5-smallest keys of each
    bucket — without sorting any whole bucket (SCALE.md §132
    diversity_prune fallback — VERDICT r3 #6).

    The row_number form serializes a hot bucket into ONE task. Here the
    md5 key is split on its first ``prefix_len`` hex chars (16^len
    sub-ranges): per-(bucket, prefix) counts are tiny (|buckets|·16^len
    rows, collected once), the driver locates each bucket's boundary
    prefix and residual rank by cumulative sum, and only the boundary
    slice — 16^len× smaller than the bucket — is window-ranked. Rows in
    prefixes strictly below the boundary are kept by a broadcast-joined
    threshold; the keep-set is bit-identical to the global
    ``ORDER BY md5(key), key`` ranking because the prefix order IS the
    md5 order restricted to prefix classes.
    """
    k = F.md5(F.col(key_col).cast("string").cast("binary"))
    t = df.withColumn("_k", k).withColumn(
        "_p", F.substring("_k", 1, prefix_len)
    )
    counts = t.groupBy(bucket_col, "_p").agg(F.count("*").alias("_n")).collect()
    per: dict = {}
    for r in counts:
        per.setdefault(r[bucket_col], []).append((r["_p"], r["_n"]))
    cuts = []  # (bucket, boundary_prefix, residual_rank)
    for b, lst in per.items():
        lst.sort()
        cum = 0
        bp, resid = None, None
        for p, n in lst:
            if cum + n >= cap:
                bp, resid = p, cap - cum
                break
            cum += n
        cuts.append((b, bp, resid))  # bp None -> bucket under quota, keep all
    spark = df.sparkSession
    # Boundary-table bucket field mirrors the source column's type — a
    # string/domain bucket (the natural domain-capping case) must not hit a
    # hardcoded `long` at createDataFrame.
    from pyspark.sql.types import LongType, StructField, StructType, StringType

    cut_df = spark.createDataFrame(
        cuts,
        StructType(
            [
                StructField(bucket_col, df.schema[bucket_col].dataType),
                StructField("_bp", StringType()),
                StructField("_resid", LongType()),
            ]
        ),
    )
    joined = t.join(F.broadcast(cut_df), bucket_col)
    below = joined.filter(F.col("_bp").isNull() | (F.col("_p") < F.col("_bp")))
    boundary = joined.filter(F.col("_p") == F.col("_bp"))
    from pyspark.sql import Window

    w = Window.partitionBy(bucket_col, "_p").orderBy("_k", key_col)
    boundary_kept = (
        boundary.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_resid"))
        .drop("_rn")
    )
    return below.unionByName(boundary_kept).drop("_k", "_p", "_bp", "_resid")


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: the fact side gets a random salt, the
    (small) dim side is exploded ``n_salts``× so every (key, salt)
    combination exists, and the join keys on (key, salt). No single
    reducer ever owns a whole hot key. When the dim fits in memory Spark
    broadcasts it anyway (making the salt moot — broadcast joins don't
    shuffle the fact side at all); the salted form is the fallback
    pattern for when the dim is too big to broadcast but the fact keys
    are skewed, and AQE's skew splitting can't see the skew (e.g. it is
    introduced by an upstream narrow transform). Row multiplicity is
    unchanged: each fact row matches exactly its own salt copy."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_salted = dim.select("*", salts)
    fact_salted = fact.withColumn("_salt", (F.rand(seed=7) * n_salts).cast("int"))
    return fact_salted.join(dim_salted, [key, "_salt"]).drop("_salt")
