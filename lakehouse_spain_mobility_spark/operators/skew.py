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
