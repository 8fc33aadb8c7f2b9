"""Mergeable quantile sketch: hash-geometric level sampling (the KLL shape).

The missing member of the sketch family (VERDICT r9 #7): HLL/CMS/KMV give
constant-size mergeable state for distinct-count / heavy-hitter / set
overlap, but a 100 TB profiling pass also wants QUANTILES from
constant-size mergeable state — ``percentile_summary`` is exact and
therefore sort-based.

This operator pins the mergeable, order-free core that KLL (Karnin, Lang,
Liberty 2016, arXiv:1603.05346) builds its top compactor levels from —
geometric subsampling: an item survives to level L iff the low L bits of
a content hash are zero (probability 2^-L), so the kept set at level L is
a deterministic 1/2^L uniform sample and the rank of a kept item in the
full stream is estimated by (rank among kept) * 2^L with standard error
sqrt(rank_true * 2^L). Choosing L = ceil(log2(ceil(n / k))) keeps at most
~k items per group regardless of n — constant-size state at any scale.

Why not full KLL / t-digest: their compaction paths are ORDER-DEPENDENT
(which pairs collapse depends on arrival order / merge tree), so two
engines — or two partitionings of the same data — produce different (all
individually valid) sketches, which is untestable under this repo's
bit-parity differential gate. Hash-level sampling is the subfamily whose
state is a pure FUNCTION OF THE MULTISET: both engines, any partitioning,
any merge order, the same sketch — the same property that made the HLL
register file and KMV bottom-k exactly twinnable in DuckDB SQL.

Mergeability (the 100 TB property): state = (n, L, kept values). Merge of
sketches A, B: n = nA + nB, L' = the target level for n (>= max(LA, LB)),
kept = re-filter(keptA ∪ keptB, L') — valid because level sets NEST
(h & (2^L'-1) == 0 implies h & (2^L-1) == 0 for L <= L'): a level-L' kept
set is recoverable from any level-L <= L' kept set by re-filtering, never
by resampling. ``merge_level_samples`` implements it;
``tests/test_sketches.py`` pins merge == direct-build.

Spark-side plumbing (see queries/qsketch.py for the oracle twin): the
per-group (n, L) table is a tiny aggregate broadcast back onto an
unshuffled scan; the sample predicate filters map-side, so only ~k rows
per group ever reach an exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 48-bit content hash: low 48 bits of Spark's native xxhash64. The md5
# hex-prefix convention (queries/sketches.py) costs a ~6-op string chain
# per row in codegen — measured +0.63 s on the sf10 sample pass vs this
# one intrinsic (PERF.md round 10); the DuckDB twin replays the exact
# xxh64 arithmetic via functions/xxh64_sql (the hll_distinct_x64
# precedent — the oracle pays a parity-proof replay, flagged in the
# decade row, while both engines agree bit-for-bit).
HASH_BITS = 48


def content_hash48(id_col: Column) -> Column:
    """48-bit uniform hash of a BIGINT row identity: xxhash64 & (2^48-1),
    native codegen here, exactly replayable in DuckDB SQL."""
    return F.xxhash64(id_col).bitwiseAND(F.lit((1 << HASH_BITS) - 1))


def level_for(n: Column, k: int) -> Column:
    """Smallest L with n / 2^L <= k, in pure integer arithmetic (no float
    log2 — engine-portable): L = bit_length(ceil(n/k) - 1), via
    length(bin(x)) which both engines define identically for x >= 1."""
    m = F.floor((n + F.lit(k - 1)) / F.lit(k)).cast("bigint")  # ceil(n/k)
    return (
        F.when(m <= 1, F.lit(0))
        .otherwise(F.length(F.bin((m - F.lit(1)).cast("bigint"))))
        .cast("int")
    )


def level_mask(lvl: Column) -> Column:
    """2^lvl - 1 as BIGINT; pow is exact for lvl <= 48."""
    return (F.pow(F.lit(2.0), lvl).cast("bigint") - F.lit(1))


def level_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
) -> DataFrame:
    """Per-group geometric level sample: returns df rows whose hash
    survives the group's level, with ``n`` (group size), ``lvl`` and
    ``weight`` (2^lvl) columns attached.

    Plan shape: one tiny per-group COUNT aggregate, broadcast back onto a
    second unshuffled scan (the reference's scalar-k pattern,
    dags/gravity/calculate_gold.py:11-45); the filter drops all but
    ~k rows per group BEFORE anything downstream shuffles."""
    sizes = df.groupBy(*group_cols).agg(F.count("*").cast("bigint").alias("n"))
    sizes = sizes.select(
        *group_cols, "n", level_for(F.col("n"), k).alias("lvl")
    )
    h = content_hash48(F.col(id_col))
    return (
        df.join(F.broadcast(sizes), group_cols)
        .filter(h.bitwiseAND(level_mask(F.col("lvl"))) == 0)
        .withColumn("weight", F.pow(F.lit(2.0), F.col("lvl")).cast("bigint"))
    )


def merge_level_samples(
    a: DataFrame, b: DataFrame, group_cols: list[str], id_col: str, k: int
) -> DataFrame:
    """Merge two per-group level samples (columns as produced by
    ``level_sample``) WITHOUT touching the base data: n adds, the target
    level is recomputed for the merged n, and each side's kept set is
    re-filtered to the merged level (level sets nest — see module doc).
    Constant-size in, constant-size out: the 100 TB tree-reduce step."""
    data_cols = [c for c in a.columns if c not in ("n", "lvl", "weight")]
    sa = a.select(*group_cols, F.col("n").alias("na")).distinct()
    sb = b.select(*group_cols, F.col("n").alias("nb")).distinct()
    merged_n = (
        sa.join(sb, group_cols, "full_outer")
        .select(
            *group_cols,
            (F.coalesce(F.col("na"), F.lit(0)) + F.coalesce(F.col("nb"), F.lit(0)))
            .cast("bigint")
            .alias("n"),
        )
    )
    merged_n = merged_n.select(
        *group_cols, "n", level_for(F.col("n"), k).alias("lvl")
    )
    u = a.select(*data_cols).unionByName(b.select(*data_cols))
    h = content_hash48(F.col(id_col))
    return (
        u.join(F.broadcast(merged_n), group_cols)
        .filter(h.bitwiseAND(level_mask(F.col("lvl"))) == 0)
        .withColumn("weight", F.pow(F.lit(2.0), F.col("lvl")).cast("bigint"))
    )
