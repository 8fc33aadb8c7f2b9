"""Parallel bounded-ROWS-frame windows (stencil / ghost-cell decomposition).

Spark's WindowExec computes ordered frames ONE TASK per PARTITION BY value:
a low-cardinality partition domain (window_frames_battery's ~5 event
types) serializes the whole relation onto a handful of cores no matter the
cluster size — measured at sf10 as 23 s of window compute on ≤5 tasks with
27 cores idle, and unbounded at 100 TB. For a BOUNDED rows frame the data
dependency is local — a row's frame spans at most ``h = max(|lo|, hi)``
neighbors per side — so the relation can be chunked along the composite
(partition, order) key, each chunk windowed independently in parallel, and
only chunk-border rows need replicating into the neighbor chunk (a halo of
h rows per border: the ghost-cell scheme of stencil computations).

Chunk assignment must be a DETERMINISTIC projection: the chunk ids are
consulted twice (once to derive the tiny border table at build time, once
in the executed plan), and ``repartitionByRange`` re-samples boundaries
with a fresh seed per execution — a literalized border table against its
chunks silently mis-halos (measured: 55/10000 wrong frames at sf0.01). So
the operator draws its OWN boundaries: a seeded sample of the composite
key, collected once, n−1 evenly-ranked split points re-embedded as literal
struct comparisons — the chunk id is then a pure when-chain over the row's
key, identical in every execution, and the plan pays exactly ONE fact
exchange (the per-chunk hash shuffle feeding the parallel sorts).

Border rows (the h smallest/largest keys per chunk) come from a broadcast
min/max chain — h−1 partial-aggregating passes, no sort, no buffering —
also collected once and re-embedded as a literal local relation.

Exactness: over-shipping halo rows is harmless (extra rows sort beyond the
frame reach of every base row and are themselves dropped), but an
UNDERSIZED middle chunk would need a halo from two chunks away, so a guard
checks chunk contiguity and ``count ≥ h`` for all middle chunks, falling
back LOUDLY to the serial window when sampling produced a degenerate
chunking (only plausible when the relation is about as small as the chunk
count). End chunks may be small: their truncated halo is exactly the
frame's own truncation.

Contract: (part_cols + order_cols) must be row-unique (the usual
deterministic-window requirement) and the frame must straddle the current
row (lo ≤ 0 ≤ hi).
"""

from __future__ import annotations

import warnings
from typing import Callable

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

_CHUNK = "_pw_chunk"
_TGT = "_pw_target"
_HALO = "_pw_halo"
_SAMPLES_PER_CHUNK = 24
_SEED = 0x5EED


def _serial(df, part_cols, order_cols, aggs, lo, hi, out_cols):
    w = Window.partitionBy(*part_cols).orderBy(*order_cols).rowsBetween(lo, hi)
    return df.select(*out_cols, *[fn(w).alias(a) for a, fn in aggs.items()])


def _lit_key(values, keys) -> Column:
    return F.struct(*[F.lit(v).alias(k) for v, k in zip(values, keys)])


def _chunk_bounds(tagged: DataFrame, key: Column, h: int):
    """Per-chunk h-th smallest/largest key + count via a broadcast min/max
    chain — h−1 passes, each a partial-aggregating scan (no sort, no
    per-chunk buffering). Returns (collected rows, lo col, hi col)."""
    bounds = tagged.groupBy(_CHUNK).agg(
        F.min(key).alias("lo1"), F.max(key).alias("hi1"), F.count("*").alias("cnt")
    )
    lo_col, hi_col = "lo1", "hi1"
    for step in range(2, h + 1):
        nxt = (
            tagged.join(F.broadcast(bounds), _CHUNK)
            .groupBy(_CHUNK)
            .agg(
                F.min(F.when(key > F.col(lo_col), key)).alias(f"lo{step}"),
                F.max(F.when(key < F.col(hi_col), key)).alias(f"hi{step}"),
            )
        )
        bounds = bounds.join(nxt, _CHUNK)
        lo_col, hi_col = f"lo{step}", f"hi{step}"
    return bounds.collect(), lo_col, hi_col


def _guard_ok(stats, h: int) -> bool:
    if not stats:
        return False
    ids = sorted(r[_CHUNK] for r in stats)
    if ids != list(range(ids[0], ids[-1] + 1)):
        return False  # empty middle chunk: a halo would hop two chunks
    return all(
        r["cnt"] >= h for r in stats if ids[0] < r[_CHUNK] < ids[-1]
    )  # end chunks may be small


def sliding_rows_window(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    aggs: dict[str, Callable[[WindowSpec], Column]],
    lo: int,
    hi: int,
    chunks: int | None = None,
) -> DataFrame:
    """Add the frame aggregates in ``aggs`` (name -> builder taking the
    WindowSpec) to ``df``, computed chunk-parallel. Result rows and values
    are identical to the serial ``Window.partitionBy(part).orderBy(order)
    .rowsBetween(lo, hi)`` form."""
    if not (lo <= 0 <= hi):
        raise ValueError(f"rows frame must straddle the current row: [{lo}, {hi}]")
    spark = df.sparkSession
    n = chunks or spark.sparkContext.defaultParallelism
    h = max(-lo, hi)
    keys = [*part_cols, *order_cols]
    out_cols = df.columns
    if h == 0:
        return _serial(df, part_cols, order_cols, aggs, 0, 0, out_cols)

    key = F.struct(*[F.col(k) for k in keys])

    # deterministic boundaries: seeded sample of the composite key, n−1
    # evenly-ranked split points (one scan; the count bounds the fraction)
    total = df.count()
    if total <= max(n * h * 2, 64):
        return _serial(df, part_cols, order_cols, aggs, lo, hi, out_cols)
    frac = min(1.0, (_SAMPLES_PER_CHUNK * n) / total)
    sampled = sorted(
        map(
            lambda r: tuple(r[k] for k in keys),
            df.select(*keys).sample(False, frac, seed=_SEED).collect(),
        )
    )
    if len(sampled) < n:
        return _serial(df, part_cols, order_cols, aggs, lo, hi, out_cols)
    splits = []
    for i in range(1, n):
        b = sampled[(i * len(sampled)) // n]
        if not splits or b != splits[-1]:
            splits.append(b)  # dedupe — fewer, larger chunks, still exact

    # chunk id = number of split points strictly below the key, evaluated
    # as a balanced binary-search WHEN tree over literal structs (≈log₂
    # compares per row instead of |splits| — the chunk expression runs in
    # every boundary pass and in the executed plan, so its per-row cost
    # multiplies); identical in every execution.
    def _bsearch(lo_i: int, hi_i: int) -> Column:
        if lo_i == hi_i:
            return F.lit(lo_i)
        mid = (lo_i + hi_i) // 2
        return (
            F.when(key > _lit_key(splits[mid], keys), _bsearch(mid + 1, hi_i))
            .otherwise(_bsearch(lo_i, mid))
        )

    ch = _bsearch(0, len(splits)).cast("int")
    tagged = df.withColumn(_CHUNK, ch)
    stats, lo_col, hi_col = _chunk_bounds(tagged, key, h)
    if not _guard_ok(stats, h):
        warnings.warn(
            "sliding_rows_window: degenerate chunking (undersized or empty "
            "middle chunk) — falling back to the serial window"
        )
        return _serial(df, part_cols, order_cols, aggs, lo, hi, out_cols)

    # literal border table: chunk -> h-th smallest/largest key
    schema = tagged.select(
        F.col(_CHUNK), key.alias("_blo"), key.alias("_bhi")
    ).schema
    lit_bounds = spark.createDataFrame(
        [(r[_CHUNK], r[lo_col], r[hi_col]) for r in stats], schema
    )
    max_chunk = max(r[_CHUNK] for r in stats)
    min_chunk = min(r[_CHUNK] for r in stats)

    joined = tagged.join(F.broadcast(lit_bounds), _CHUNK)
    is_head = (F.col(_CHUNK) > min_chunk) & (
        F.col("_blo").isNull() | (key <= F.col("_blo"))
    )
    is_tail = (F.col(_CHUNK) < max_chunk) & (
        F.col("_bhi").isNull() | (key >= F.col("_bhi"))
    )
    # one pass emits each row's target list: its own chunk, plus chunk−1
    # for head-border rows, chunk+1 for tail-border rows (≤ h each side; a
    # NULL bound means the chunk has < h keys — every row is a border row).
    # Null targets are dropped by a plain row filter AFTER the explode: an
    # array-filter lambda here would run interpreted per row (trap #25 —
    # measured ~5 s of the exec at sf10), while Generate + Filter stay
    # inside whole-stage codegen.
    targets = F.array(
        F.struct(F.col(_CHUNK).alias("t"), F.lit(False).alias("h")),
        F.struct(
            F.when(is_head, F.col(_CHUNK) - 1).alias("t"),
            F.lit(True).alias("h"),
        ),
        F.struct(
            F.when(is_tail, F.col(_CHUNK) + 1).alias("t"),
            F.lit(True).alias("h"),
        ),
    )
    aug = (
        joined.select(*out_cols, F.explode(targets).alias("_e"))
        .filter(F.col("_e.t").isNotNull())
        .select(*out_cols, F.col("_e.t").alias(_TGT), F.col("_e.h").alias(_HALO))
    )
    # explicit-count exchange: AQE must not coalesce the compute-heavy
    # sort stage toward its 64 MB advisory target (trap #27)
    aug = aug.repartition(n, F.col(_TGT), *[F.col(c) for c in part_cols])
    w = Window.partitionBy(_TGT, *part_cols).orderBy(*order_cols).rowsBetween(lo, hi)
    return (
        aug.select(*out_cols, _HALO, *[fn(w).alias(a) for a, fn in aggs.items()])
        .filter(~F.col(_HALO))
        .drop(_HALO)
    )
