"""Parallel bounded-ROWS-frame windows (stencil / ghost-cell decomposition)
and chunk-parallel rank/prefix windows (stencil with a scalar carry).

Spark's WindowExec computes ordered frames ONE TASK per PARTITION BY value:
a low-cardinality partition domain (window_frames_battery's ~5 event
types) serializes the whole relation onto a handful of cores no matter the
cluster size — measured at sf10 as 23 s of window compute on ≤5 tasks with
27 cores idle, and unbounded at 100 TB. Two decompositions fix this:

``sliding_rows_window`` — for a BOUNDED rows frame the data dependency is
local: a row's frame spans at most ``h = max(|lo|, hi)`` neighbors per
side, so the relation can be chunked along the composite (partition, order)
key, each chunk windowed independently in parallel, and only chunk-border
rows need replicating into the neighbor chunk (a halo of h rows per border:
the ghost-cell scheme of stencil computations).

``ranked_window`` — rank-family functions (row_number, running prefix
sums, lag/lead) have an UNBOUNDED backward dependency, but one that
collapses to a per-chunk SCALAR carry: global row_number = local row_number
+ (count of same-partition rows in earlier chunks); a running sum = local
running sum + (sum over earlier chunks); lag/lead at a chunk border = the
neighboring chunk's extreme order key, already known from the per-chunk
group stats. So one tiny (chunk × partition) aggregate, carried to the
driver, prefix-scanned there, and broadcast back, turns the whole family
chunk-parallel with ONE fact exchange.

Chunk assignment must be a DETERMINISTIC projection: the chunk ids are
consulted twice (once to derive the tiny border/carry table at build time,
once in the executed plan), and ``repartitionByRange`` re-samples
boundaries with a fresh seed per execution — a literalized border table
against its chunks silently mis-halos (measured: 55/10000 wrong frames at
sf0.01). So both operators draw their OWN boundaries: a seeded sample of
the composite key, collected once, n−1 evenly-ranked split points
re-embedded as literal struct comparisons — the chunk id is then a pure
when-chain over the row's key, identical in every execution, and the plan
pays exactly ONE fact exchange (the per-chunk hash shuffle feeding the
parallel sorts).

Border rows (the h smallest/largest keys per chunk) come from a broadcast
min/max chain — h−1 partial-aggregating passes, no sort, no buffering —
also collected once and re-embedded as a literal local relation.

Exactness (sliding): over-shipping halo rows is harmless (extra rows sort
beyond the frame reach of every base row and are themselves dropped), but
an UNDERSIZED chunk breaks the scheme (a middle chunk would need a halo
from two chunks away; an end chunk would have no h-th extreme key for the
border table), so a guard checks chunk contiguity and ``count ≥ h`` for
ALL chunks, falling back LOUDLY to the serial window when sampling
produced a degenerate chunking (only plausible when the relation is about
as small as the chunk count — where serial wins anyway).

Small-relation routing: the parallel forms pay a fixed toll (a stats job,
a sample-collect, the bound/carry passes) that serial WindowExec does not;
below ``MIN_PARALLEL_ROWS`` total rows the serial plan wins outright
(measured crossover on the frames battery: serial 0.9 s vs parallel 3.2 s
at 600k rows / sf0.1; parallel wins from the low millions up — see
PERF.md round 7), so both operators route small inputs to the serial form.
Callers that already know the relation's size pass ``total`` to skip the
stats job entirely.

Contract (both operators): (part_cols + order_cols) must be row-unique
(the usual deterministic-window requirement) and NULL-free — the split
sampler orders key tuples in Python and the literal struct comparisons
have no NULLS FIRST semantics, so a relation with a NULL key falls back
LOUDLY to the serial window (where Spark's own NULL ordering applies).
``sliding_rows_window`` additionally requires the frame to straddle the
current row (lo ≤ 0 ≤ hi).
"""

from __future__ import annotations

import decimal
import warnings
from typing import Callable

from pyspark.sql import Column, DataFrame, Row, Window, WindowSpec
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DecimalType, LongType, StructField, StructType

_CHUNK = "_pw_chunk"
_TGT = "_pw_target"
_HALO = "_pw_halo"
_SLOT = "_pw_slot"
_SAMPLES_PER_CHUNK = 24
_SEED = 0x5EED
# Serial-vs-parallel crossover (total rows). Below this the parallel
# machinery's fixed jobs cost more than WindowExec's serialization does —
# measured on the frames battery (PERF.md round 7): 600k rows serial wins
# ~3.5×; by ~6M rows (sf1) the parallel form wins and keeps widening.
MIN_PARALLEL_ROWS = 2_000_000
# ranked_window collects one stats row per (chunk, partition-value) group;
# range chunking keeps that ≤ chunks + |partition values| − 1, so hitting
# this cap means a partition domain so wide that WindowExec parallelizes
# fine on its own — serial is then the right plan anyway.
_GROUP_CAP = 4096


def _murmur3_int(x: int, seed: int = 42) -> int:
    """Spark's Murmur3Hash of one IntegerType value (x86 32-bit, seed 42 —
    the partitioner behind ``repartition(n, col)``), signed. Public
    algorithm (Appleby's MurmurHash3 / Spark Murmur3_x86_32.hashInt);
    pinned against F.hash in test_pwindow.py::test_murmur3_matches_spark."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k = ((x & 0xFFFFFFFF) * c1) & 0xFFFFFFFF
    k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
    k = (k * c2) & 0xFFFFFFFF
    h = (seed ^ k) & 0xFFFFFFFF
    h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
    h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    h ^= 4  # total bytes hashed
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _slot_map(m: int) -> list[int] | None:
    """``repartition(m, col)`` assigns partition ``pmod(murmur3(col), m)``;
    dense chunk ids collide (balls-in-bins leaves ~1/e of the partitions
    empty and piles 2-3 chunks on others — measured at sf30 as the battery
    stencil's fat-tail partition, PERF.md round 8). Invert the hash on the
    driver instead: slot[c] = the smallest int whose hash lands in
    partition c, so each chunk sits ALONE in its own partition and the
    final-stage balance is the chunk balance (even by construction)."""
    slots: dict[int, int] = {}
    for x in range(max(4096, 64 * m)):  # coupon-collector needs ~m·ln m
        slots.setdefault(_murmur3_int(x) % m, x)
        if len(slots) == m:
            return [slots[c] for c in range(m)]
    return None  # astronomically unlikely; callers degrade, not crash


def _slot_col(base: Column, m: int, offset: int = 0) -> Column:
    """Chunk id (``base``, ids offset..offset+m−1) → its repartition slot,
    as a literal-array lookup (codegen-friendly, 1-indexed element_at).

    If the 64·m search window ever failed to invert every residue
    (probability ≲ (1−1/m)^64m ≈ e^−64 per residue), the stencil DEGRADES
    to hashing the raw chunk id — the pre-round-8 balls-in-bins balance,
    slower but identical values — rather than failing the query (ADVICE
    r8: construction-time AssertionError broke the module's
    warn-and-fall-back convention)."""
    slots = _slot_map(m)
    if slots is None:
        warnings.warn(
            f"pwindow: slot inversion did not cover {m} residues in 64*m "
            "probes; degrading to raw chunk-id hash partitioning "
            "(balls-in-bins final-stage balance)",
            stacklevel=2,
        )
        return (base - F.lit(offset)).cast("int")
    return F.element_at(F.lit(slots), (base - F.lit(offset)).cast("int") + F.lit(1)).cast("int")


def _serial(df, part_cols, order_cols, aggs, lo, hi, out_cols):
    w = Window.partitionBy(*part_cols).orderBy(*order_cols).rowsBetween(lo, hi)
    return df.select(*out_cols, *[fn(w).alias(a) for a, fn in aggs.items()])


def _lit_key(values, keys) -> Column:
    return F.struct(*[F.lit(v).alias(k) for v, k in zip(values, keys)])


def _nullable(dt: DataType) -> DataType:
    """Deep-copy a type with every struct field nullable — literal border
    tables carry NULLs (end chunks with < h keys, first/last carries) that
    F.struct-derived schemas would reject at createDataFrame time."""
    if isinstance(dt, StructType):
        return StructType(
            [StructField(f.name, _nullable(f.dataType), True) for f in dt.fields]
        )
    return dt


def _relation_stats(df: DataFrame, keys: list[str]) -> tuple[int, int]:
    """ONE aggregating pass: (total row count, rows with any NULL key)."""
    null_any = None
    for k in keys:
        c = F.col(k).isNull()
        null_any = c if null_any is None else (null_any | c)
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(null_any, F.lit(1))).alias("nulls"),
    ).first()
    return int(r["n"]), int(r["nulls"])


def _split_points(df: DataFrame, keys: list[str], n: int, total: int):
    """Deterministic chunk boundaries: seeded sample of the composite key,
    n−1 evenly-ranked split points, deduped (fewer, larger chunks — still
    exact). Returns None when the sample is too thin to chunk."""
    frac = min(1.0, (_SAMPLES_PER_CHUNK * n) / total)
    sampled = sorted(
        map(
            lambda r: tuple(r[k] for k in keys),
            df.select(*keys).sample(False, frac, seed=_SEED).collect(),
        )
    )
    if len(sampled) < n:
        return None
    splits = []
    for i in range(1, n):
        b = sampled[(i * len(sampled)) // n]
        if not splits or b != splits[-1]:
            splits.append(b)
    return splits or None


def _chunk_expr(key: Column, splits: list, keys: list[str]) -> Column:
    """Chunk id = number of split points strictly below the key, evaluated
    as a balanced binary-search WHEN tree over literal structs (≈log₂
    compares per row instead of |splits| — the chunk expression runs in
    every boundary pass and in the executed plan, so its per-row cost
    multiplies); identical in every execution."""

    def _bsearch(lo_i: int, hi_i: int) -> Column:
        if lo_i == hi_i:
            return F.lit(lo_i)
        mid = (lo_i + hi_i) // 2
        return F.when(key > _lit_key(splits[mid], keys), _bsearch(mid + 1, hi_i)).otherwise(
            _bsearch(lo_i, mid)
        )

    return _bsearch(0, len(splits)).cast("int")


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
    # ALL chunks must hold ≥ h keys: an undersized middle chunk would need
    # a halo from two chunks away, and an undersized END chunk would put
    # NULLs in the literal border table (its h-th extreme key doesn't
    # exist) — both only plausible when the relation is about as small as
    # the chunk count, where the serial window wins anyway.
    return all(r["cnt"] >= h for r in stats)


def sliding_rows_window(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    aggs: dict[str, Callable[[WindowSpec], Column]],
    lo: int,
    hi: int,
    chunks: int | None = None,
    total: int | None = None,
    min_parallel_rows: int | None = None,
) -> DataFrame:
    """Add the frame aggregates in ``aggs`` (name -> builder taking the
    WindowSpec) to ``df``, computed chunk-parallel. Result rows and values
    are identical to the serial ``Window.partitionBy(part).orderBy(order)
    .rowsBetween(lo, hi)`` form. ``total``, when the caller already knows
    the relation's row count, skips the internal stats job."""
    if not (lo <= 0 <= hi):
        raise ValueError(f"rows frame must straddle the current row: [{lo}, {hi}]")
    spark = df.sparkSession
    n = chunks or spark.sparkContext.defaultParallelism
    h = max(-lo, hi)
    keys = [*part_cols, *order_cols]
    out_cols = df.columns
    if h == 0:
        return _serial(df, part_cols, order_cols, aggs, 0, 0, out_cols)
    floor = MIN_PARALLEL_ROWS if min_parallel_rows is None else min_parallel_rows

    key = F.struct(*[F.col(k) for k in keys])

    if total is None:
        total, nulls = _relation_stats(df, keys)
        if nulls:
            warnings.warn(
                "sliding_rows_window: NULL keys sampled — deterministic "
                "struct chunking has no NULLS FIRST; falling back to the "
                "serial window"
            )
            return _serial(df, part_cols, order_cols, aggs, lo, hi, out_cols)
    if total <= max(n * h * 2, 64, floor):
        return _serial(df, part_cols, order_cols, aggs, lo, hi, out_cols)
    splits = _split_points(df, keys, n, total)
    if splits is None:
        return _serial(df, part_cols, order_cols, aggs, lo, hi, out_cols)
    if any(v is None for s in splits for v in s):
        warnings.warn(
            "sliding_rows_window: NULL keys sampled — deterministic struct "
            "chunking has no NULLS FIRST; falling back to the serial window"
        )
        return _serial(df, part_cols, order_cols, aggs, lo, hi, out_cols)

    tagged = df.withColumn(_CHUNK, _chunk_expr(key, splits, keys))
    stats, lo_col, hi_col = _chunk_bounds(tagged, key, h)
    if not _guard_ok(stats, h):
        warnings.warn(
            "sliding_rows_window: degenerate chunking (undersized or empty "
            "middle chunk) — falling back to the serial window"
        )
        return _serial(df, part_cols, order_cols, aggs, lo, hi, out_cols)

    # literal border table: chunk -> h-th smallest/largest key (non-NULL —
    # the guard requires cnt ≥ h in every chunk). The schema is rebuilt
    # nullable anyway: F.struct-derived fields are non-nullable, and
    # createDataFrame rejects Rows against them if any inner key column is
    # nullable in the source relation.
    schema = StructType(
        [
            StructField(f.name, _nullable(f.dataType), True)
            for f in tagged.select(
                F.col(_CHUNK), key.alias("_blo"), key.alias("_bhi")
            ).schema.fields
        ]
    )
    lit_bounds = spark.createDataFrame(
        [(r[_CHUNK], r[lo_col], r[hi_col]) for r in stats], schema
    )
    max_chunk = max(r[_CHUNK] for r in stats)
    min_chunk = min(r[_CHUNK] for r in stats)

    joined = tagged.join(F.broadcast(lit_bounds), _CHUNK)
    is_head = (F.col(_CHUNK) > min_chunk) & (key <= F.col("_blo"))
    is_tail = (F.col(_CHUNK) < max_chunk) & (key >= F.col("_bhi"))
    # one pass emits each row's target list: its own chunk, plus chunk−1
    # for head-border rows, chunk+1 for tail-border rows (exactly h each
    # side — the guard pins cnt ≥ h per chunk). Null targets are dropped
    # by a plain row filter AFTER the explode: an array-filter lambda here
    # would run interpreted per row (trap #25 — measured ~5 s of the exec
    # at sf10), while Generate + Filter stay inside whole-stage codegen.
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
    # sort stage toward its 64 MB advisory target (trap #27). Partitioned
    # by the chunk's inverted-hash SLOT, not hash(_TGT, part): hashing m
    # chunk ids into m bins leaves ~1/e of them empty and stacks 2-3
    # chunks on others — the stacked bin is the stage's tail. The slot
    # puts exactly one chunk per partition; it leads the window
    # partitionBy so HashPartitioning(_SLOT) satisfies the window's
    # clustering (slot is a pure function of _TGT — no semantic change).
    m = max_chunk - min_chunk + 1
    aug = aug.withColumn(_SLOT, _slot_col(F.col(_TGT), m, min_chunk)).repartition(
        m, F.col(_SLOT)
    )
    w = (
        Window.partitionBy(_SLOT, _TGT, *part_cols)
        .orderBy(*order_cols)
        .rowsBetween(lo, hi)
    )
    return (
        aug.select(*out_cols, _HALO, *[fn(w).alias(a) for a, fn in aggs.items()])
        .filter(~F.col(_HALO))
        .drop(_HALO)
    )


# --- chunk-parallel rank / prefix windows ------------------------------------
_OKEY = "_rw_okey"


def _ranked_serial(df, part_cols, order_cols, sums, rn_col, total_col, prev_cols, next_cols):
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sel = [*df.columns, F.row_number().over(w).cast("long").alias(rn_col)]
    if total_col:
        sel.append(
            F.count(F.lit(1)).over(Window.partitionBy(*part_cols)).alias(total_col)
        )
    for name, expr in (sums or {}).items():
        sel.append(F.sum(expr).over(wrun).alias(name))
    for out, oc in (prev_cols or {}).items():
        sel.append(F.lag(F.col(oc)).over(w).alias(out))
    for out, oc in (next_cols or {}).items():
        sel.append(F.lead(F.col(oc)).over(w).alias(out))
    return df.select(*sel)


def ranked_window(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    sums: dict[str, Column] | None = None,
    rn_col: str = "rn",
    total_col: str | None = None,
    prev_cols: dict[str, str] | None = None,
    next_cols: dict[str, str] | None = None,
    chunks: int | None = None,
    total: int | None = None,
    min_parallel_rows: int | None = None,
) -> DataFrame:
    """Per-partition ROW_NUMBER (``rn_col``, long), partition row count
    (``total_col``), inclusive running prefix sums (``sums``: out-name ->
    summable column expression), and ±1-row order-column offsets
    (``prev_cols`` / ``next_cols``: out-name -> order column, i.e. LAG/LEAD
    of an ORDER BY column) — value-identical to the serial
    ``Window.partitionBy(part).orderBy(order)`` forms, computed
    chunk-parallel with ONE fact exchange.

    The unbounded backward dependency of each function collapses to a
    per-(chunk, partition) scalar carry: the tiny group-stats aggregate
    (count, per-sum totals, min/max order key) is collected, exclusive-
    prefix-scanned on the driver, and broadcast-joined back; the parallel
    sort then computes local row numbers / running sums / lags per chunk
    and adds the carry. LAG at a chunk head is the previous same-partition
    group's MAX order key (range chunking makes it the true predecessor);
    LEAD at a chunk tail is the next group's MIN — both restricted to
    ORDER BY columns, which is what the carry table already holds.

    Contract: (part_cols + order_cols) row-unique and NULL-free (serial
    fallback otherwise, loudly); ``sums`` expressions must be exactly
    summable (long / decimal) — float prefix sums would be order-sensitive.
    """
    sums = sums or {}
    prev_cols = prev_cols or {}
    next_cols = next_cols or {}
    spark = df.sparkSession
    n = chunks or spark.sparkContext.defaultParallelism
    keys = [*part_cols, *order_cols]
    floor = MIN_PARALLEL_ROWS if min_parallel_rows is None else min_parallel_rows

    def serial():
        return _ranked_serial(
            df, part_cols, order_cols, sums, rn_col, total_col, prev_cols, next_cols
        )

    if total is None:
        total, nulls = _relation_stats(df, keys)
        if nulls:
            warnings.warn(
                "ranked_window: NULL keys — deterministic struct chunking "
                "has no NULLS FIRST; falling back to the serial window"
            )
            return serial()
    if total <= max(n * 2, 64, floor):
        return serial()
    splits = _split_points(df, keys, n, total)
    if splits is None:
        return serial()
    if any(v is None for s in splits for v in s):
        warnings.warn(
            "ranked_window: NULL keys sampled — deterministic struct "
            "chunking has no NULLS FIRST; falling back to the serial window"
        )
        return serial()

    key = F.struct(*[F.col(k) for k in keys])
    okey = F.struct(*[F.col(k).alias(k) for k in order_cols])
    sv = {name: f"_rw_sv_{i}" for i, name in enumerate(sums)}
    tagged = df.withColumn(_CHUNK, _chunk_expr(key, splits, keys))
    for name, expr in sums.items():
        tagged = tagged.withColumn(sv[name], expr)

    gstats = tagged.groupBy(_CHUNK, *part_cols).agg(
        F.count(F.lit(1)).alias("_rw_cnt"),
        *[F.sum(F.col(sv[name])).alias(f"_rw_s_{sv[name]}") for name in sums],
        F.min(okey).alias("_rw_mn"),
        F.max(okey).alias("_rw_mx"),
    )
    groups = gstats.limit(_GROUP_CAP + 1).collect()
    if len(groups) > _GROUP_CAP:
        warnings.warn(
            "ranked_window: partition domain too wide for the carry table "
            f"(> {_GROUP_CAP} (chunk, partition) groups) — WindowExec "
            "parallelizes such domains natively; using the serial window"
        )
        return serial()

    # driver-side exclusive prefix scan per partition value, in chunk order
    # (range chunking ⇒ chunk id is monotone in the order key within a
    # partition value, so group-adjacency == row-adjacency at the borders)
    gschema = {f.name: f.dataType for f in gstats.schema.fields}
    part_of = lambda r: tuple(r[c] for c in part_cols)
    by_part: dict[tuple, list[Row]] = {}
    for r in sorted(groups, key=lambda r: r[_CHUNK]):
        by_part.setdefault(part_of(r), []).append(r)
    def _zero(dt):
        # createDataFrame's verifier wants decimal.Decimal for DecimalType
        return decimal.Decimal(0) if isinstance(dt, DecimalType) else 0

    carry_rows = []
    for part, grs in by_part.items():
        part_total = sum(r["_rw_cnt"] for r in grs)
        cnt_off = 0
        sum_off = {name: _zero(gschema[f"_rw_s_{sv[name]}"]) for name in sums}
        for i, r in enumerate(grs):
            prev_k = grs[i - 1]["_rw_mx"] if i > 0 else None
            next_k = grs[i + 1]["_rw_mn"] if i + 1 < len(grs) else None
            carry_rows.append(
                (
                    r[_CHUNK],
                    *part,
                    cnt_off,
                    part_total,
                    *[sum_off[name] for name in sums],
                    prev_k,
                    next_k,
                )
            )
            cnt_off += r["_rw_cnt"]
            for name in sums:
                sum_off[name] += r[f"_rw_s_{sv[name]}"]

    okey_t = _nullable(gschema["_rw_mn"])
    carry_schema = StructType(
        [
            StructField(_CHUNK, gschema[_CHUNK], True),
            *[
                StructField(c, _nullable(gschema[c]), True)
                for c in part_cols
            ],
            StructField("_rw_cnt_off", LongType(), True),
            StructField("_rw_tot", LongType(), True),
            *[
                StructField(
                    f"_rw_soff_{sv[name]}",
                    gschema[f"_rw_s_{sv[name]}"],
                    True,
                )
                for name in sums
            ],
            StructField("_rw_prev", okey_t, True),
            StructField("_rw_next", okey_t, True),
        ]
    )
    carry = spark.createDataFrame(carry_rows, carry_schema)

    # One chunk per partition via the inverted-hash slot (not hash(_CHUNK):
    # m ids into m bins leaves ~1/e empty and stacks others — measured at
    # sf30 as this stencil's fat-tail partition; the stacked partition also
    # serializes last in a driver transfer). Slot leads the window
    # partitionBy so the exchange satisfies its clustering; slot is a pure
    # function of the chunk id, so values are unchanged.
    m = len(splits) + 1
    joined = (
        tagged.withColumn(_OKEY, okey)
        .join(F.broadcast(carry), [_CHUNK, *part_cols])
        .withColumn(_SLOT, _slot_col(F.col(_CHUNK), m))
        .repartition(m, F.col(_SLOT))
    )
    wloc = Window.partitionBy(_SLOT, _CHUNK, *part_cols).orderBy(*order_cols)
    wrun = wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sel = [
        *df.columns,
        (F.row_number().over(wloc) + F.col("_rw_cnt_off")).cast("long").alias(rn_col),
    ]
    if total_col:
        sel.append(F.col("_rw_tot").alias(total_col))
    for name in sums:
        dt = gschema[f"_rw_s_{sv[name]}"]
        sel.append(
            (F.sum(F.col(sv[name])).over(wrun) + F.col(f"_rw_soff_{sv[name]}"))
            .cast(dt)
            .alias(name)
        )
    if prev_cols:
        prev_k = F.coalesce(F.lag(F.col(_OKEY)).over(wloc), F.col("_rw_prev"))
        for out, oc in prev_cols.items():
            sel.append(prev_k[oc].alias(out))
    if next_cols:
        next_k = F.coalesce(F.lead(F.col(_OKEY)).over(wloc), F.col("_rw_next"))
        for out, oc in next_cols.items():
            sel.append(next_k[oc].alias(out))
    return joined.select(*sel)
