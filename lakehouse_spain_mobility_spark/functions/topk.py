"""Scale-safe global top-k (SCALE.md:16 — "top-k never sorts the world").

``row_number().over(Window.orderBy(...))`` with an empty ``partitionBy``
shuffles EVERY row to one partition and sorts there — a single-task sort
of the full scored relation. ``orderBy(...).limit(k)`` instead compiles to
``TakeOrderedAndProject``: each input partition keeps a k-element heap and
the driver merges per-partition heaps, so the exchanged data is O(k ×
partitions) regardless of corpus size.

``global_topk`` runs that plan, then attaches ``rank`` with the same
window ORDER BY over the ≤k survivors — the single-partition window still
exists in the plan but its input is bounded by k rows, so it is a no-op
at any scale. Ranks equal the global ranks iff the ordering is total
(callers must tie-break to a unique key set, which every registered query
does); oracle hashes are therefore unchanged relative to the
rank-then-filter form.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_topk(
    df: DataFrame,
    k: int,
    order: Sequence[Column],
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k of ``df`` under total order ``order``, with a 1-based
    ``rank_col`` attached. Plan contract (pinned in tests/test_plans.py):
    TakeOrderedAndProject on the full relation; the rank window sees only
    the k survivors."""
    top = df.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn(rank_col, F.row_number().over(w))


def salted_group_topk(
    df: DataFrame,
    keys: Sequence[str],
    salt_expr: Column,
    k: int,
    order: Sequence[Column],
    salts: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Per-GROUP top-k without sorting any whole group in one task — the
    group-level analog of ``global_topk`` (SCALE.md's single-partition
    pathology, one level down: a per-key window sorts the hottest key's
    entire population in ONE task).

    Phase 1 ranks within (keys…, salt) — ``salt_expr % salts`` splits the
    hottest group across ``salts`` bounded partitions (the skew dial:
    raise it with cluster width). Phase 2 re-ranks the ≤ salts·k
    survivors per group — a provable superset of the true per-group
    top-k, so the final rank is exact. Callers must make ``order`` a
    total order (unique tie-break) for cross-engine determinism.
    """
    w1 = Window.partitionBy(*keys, F.pmod(salt_expr, F.lit(salts))).orderBy(*order)
    survivors = (
        df.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
