"""Deterministic (order-independent, engine-portable) float aggregation.

Distributed SUM/AVG/STDDEV over DOUBLE are order-dependent in the last
ulps — Spark's shuffle-merge order differs run to run, and differs from a
single-threaded columnar engine. The reference's gold stats battery
(SUM/AVG/STDDEV_SAMP — ``dags/mitma/new_gold.py:33-45,68-78``) must however
hash-match a DuckDB oracle exactly.

Strategy: fixed-point aggregation. Per-row expressions stay DOUBLE (IEEE
ops are bit-identical across engines); at the aggregation boundary each
value is scaled by 1e6, rounded (both engines round the *same* exact
binary value half-away-from-zero), summed exactly as DECIMAL(38,0)
(associative — order can't change the result), and the closing scalar math
(unscale, avg division, variance, sqrt) runs in DOUBLE with an identical
expression tree on both engines. Each Spark helper has a SQL twin
(``sql_*``) generating the equivalent DuckDB text.

Two portability traps this design dodges (found empirically):
- double→DECIMAL(38,6) casts round differently between engines near ties;
  ROUND(x*1e6) into DECIMAL(38,0) agrees on every value tested.
- DECIMAL→DOUBLE casts can differ by 1 ulp beyond 15 significant digits
  (DuckDB's int128 path vs Java's BigDecimal); casting through a string is
  correctly rounded in both.

This costs a few % vs native double sums but buys bit-exact reproducibility
across partitionings — a 1000-executor run returns the same bytes as a
laptop run, a property worth keeping at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1000000.0  # 6 fixed decimal places


def _dec2dbl(c: Column) -> Column:
    """DECIMAL -> DOUBLE via string (correctly rounded in both engines)."""
    return c.cast("string").cast("double")


def _scaled_sum(col: Column) -> Column:
    """Exact fixed-point sum: ROUND(x·1e6) summed as DECIMAL(38,0)."""
    return F.sum(F.round(col * F.lit(_SCALE)).cast("decimal(38,0)"))


def _sql_scaled_sum(expr: str) -> str:
    return f"SUM(CAST(ROUND(({expr}) * 1000000.0) AS DECIMAL(38,0)))"


def dsum(col: Column) -> Column:
    """Order-independent SUM(double) -> double."""
    return _dec2dbl(_scaled_sum(col)) / F.lit(_SCALE)


def sql_dsum(expr: str) -> str:
    return f"(CAST(CAST({_sql_scaled_sum(expr)} AS VARCHAR) AS DOUBLE) / 1000000.0)"


def davg(col: Column) -> Column:
    """Order-independent AVG(double) -> double."""
    return dsum(col) / F.count(col)


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"


def micro(col: Column) -> Column:
    """DOUBLE -> exact integer micro-units: CAST(ROUND(x*1e6) AS BIGINT).

    Output-boundary armor: a DOUBLE result column is hash-fragile across
    oracle engine versions (float repr / normalization deltas outside our
    control), while two BIGINTs computed from the same exact binary double
    cannot disagree. Use for every ratio/score/duration output column."""
    return F.round(col * F.lit(_SCALE)).cast("bigint")


def sql_micro(expr: str) -> str:
    """DuckDB twin of :func:`micro`."""
    return f"CAST(ROUND(({expr}) * 1000000.0) AS BIGINT)"


def dstddev_samp(col: Column) -> Column:
    """Order-independent sample stddev; NULL for n<=1 (DuckDB semantics).

    var = (sum(x²) - sum(x)²/n) / (n-1), both sums fixed-point-exact, the
    closing arithmetic in DOUBLE with the same expression shape as the SQL
    twin so every IEEE operation matches bit-for-bit.
    """
    n = F.count(col)
    s1 = dsum(col)
    s2 = dsum(col * col)
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).otherwise(F.lit(None).cast("double"))


def sql_dstddev_samp(expr: str) -> str:
    s1 = sql_dsum(expr)
    s2 = sql_dsum(f"({expr}) * ({expr})")
    n = f"COUNT({expr})"
    var = f"(({s2} - {s1} * {s1} / {n}) / ({n} - 1))"
    return f"(CASE WHEN {n} > 1 THEN SQRT(GREATEST({var}, 0.0)) ELSE NULL END)"


def dstddev_samp0(col: Column) -> Column:
    """COALESCE(stddev_samp, 0) — the reference's σ=0-for-singletons
    convention (``dags/mitma/new_gold.py:75``)."""
    return F.coalesce(dstddev_samp(col), F.lit(0.0))


def sql_dstddev_samp0(expr: str) -> str:
    return f"COALESCE({sql_dstddev_samp(expr)}, 0.0)"
