"""Deterministic (order-independent) floating-point aggregation.

Distributed SUM/AVG/STDDEV over DOUBLE are order-dependent in the last
ulps — Spark's shuffle-merge order differs run to run, and differs from a
single-threaded columnar engine. The reference's gold stats battery
(SUM/AVG/STDDEV_SAMP — ``dags/mitma/new_gold.py:33-45,68-78``) must however
hash-match a DuckDB oracle exactly.

Strategy: aggregate through DECIMAL. Per-row expressions stay DOUBLE
(IEEE ops are bit-identical across engines); at the aggregation boundary
values are cast to a fixed-scale DECIMAL, summed exactly (decimal addition
is associative — order can't change the result), and the final scalar math
(avg division, variance, sqrt) is done in DOUBLE with an identical
expression tree on both engines. Each Spark helper therefore has a SQL
twin (``sql_*``) that generates the equivalent DuckDB text.

This costs a few % vs native double sums but buys bit-exact reproducibility
across partitionings — which also means a 1000-executor run returns the
same bytes as a laptop run, a property worth keeping at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits, fixed scale: plenty of integer headroom for 1e12-row sums
# of business-magnitude doubles.
_SCALE = 6
_DEC = f"decimal(38,{_SCALE})"


def dsum(col: Column) -> Column:
    """Order-independent SUM(double) -> double (exact via decimal)."""
    return F.sum(col.cast(_DEC)).cast("double")


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,{_SCALE}))) AS DOUBLE)"


def davg(col: Column) -> Column:
    """Order-independent AVG(double) -> double: exact decimal sum / count."""
    return F.sum(col.cast(_DEC)).cast("double") / F.count(col)


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"


def dstddev_samp(col: Column) -> Column:
    """Order-independent sample stddev; NULL for n<=1 (DuckDB semantics).

    var = (sum(x^2) - sum(x)^2/n) / (n-1), with both sums decimal-exact and
    the closing arithmetic in DOUBLE using the same expression shape as the
    SQL twin, so every IEEE operation matches bit-for-bit.
    """
    n = F.count(col)
    s1 = F.sum(col.cast(_DEC)).cast("double")
    s2 = F.sum((col * col).cast(_DEC)).cast("double")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).otherwise(F.lit(None).cast("double"))


def sql_dstddev_samp(expr: str) -> str:
    s1 = sql_dsum(expr)
    s2 = f"CAST(SUM(CAST((({expr}) * ({expr})) AS DECIMAL(38,{_SCALE}))) AS DOUBLE)"
    n = f"COUNT({expr})"
    var = f"(({s2} - {s1} * {s1} / {n}) / ({n} - 1))"
    return f"(CASE WHEN {n} > 1 THEN SQRT(GREATEST({var}, 0.0)) ELSE NULL END)"


def dstddev_samp0(col: Column) -> Column:
    """COALESCE(stddev_samp, 0) — the reference's σ=0-for-singletons
    convention (``dags/mitma/new_gold.py:75``)."""
    return F.coalesce(dstddev_samp(col), F.lit(0.0))


def sql_dstddev_samp0(expr: str) -> str:
    return f"COALESCE({sql_dstddev_samp(expr)}, 0.0)"
