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
