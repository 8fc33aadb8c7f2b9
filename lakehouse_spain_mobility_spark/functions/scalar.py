"""Scalar expression helpers mirroring the reference's SQL function surface
(SURVEY §2.8): day-type encoding, Spanish-locale numerics, code splitting,
try-casts. All JVM-side (whole-stage-codegen'd) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# day_type encoding from the reference (dags/mitma/silver_mitma.py:66-83):
# {0: Sunday, 1: Monday, 2: Tue-Thu, 5: Friday, 6: Saturday, 8: Holiday}.
DAY_TYPE_LABELS = {0: "Sunday", 1: "Monday", 2: "Tue-Thu", 5: "Friday", 6: "Saturday", 8: "Holiday"}


def day_type(date_col: Column, is_holiday: Column | None = None) -> Column:
    """Weekday→day_type mapping, natively (no per-file Python scalar as the
    reference does — dags/mitma/silver_mitma.py:54-83,106).

    ``F.weekday``: 0=Monday … 6=Sunday.
    """
    wd = F.weekday(date_col)
    expr = (
        F.when(wd == 0, F.lit(1))
        .when(wd == 4, F.lit(5))
        .when(wd == 5, F.lit(6))
        .when(wd == 6, F.lit(0))
        .otherwise(F.lit(2))
    )
    if is_holiday is not None:
        expr = F.when(F.coalesce(is_holiday, F.lit(False)), F.lit(8)).otherwise(expr)
    return expr.cast("int")


def day_type_from_epoch_days(days: Column) -> Column:
    """:func:`day_type` from an epoch-days column, in pure long arithmetic.

    1970-01-01 was a Thursday, so ``pmod(days + 3, 7)`` reproduces
    ``F.weekday`` (0=Monday … 6=Sunday) without the per-row java.time
    path — worth a measured ~0.3 s per 10M-row pass against the calendar
    form (round-9 typical_day A/B, PERF.md). Equality with
    :func:`day_type` over 1970–2100 is pinned by
    ``test_day_type_epoch_days_matches_calendar``.
    """
    wd = F.pmod(days + F.lit(3), F.lit(7))
    return (
        F.when(wd == 0, F.lit(1))
        .when(wd == 4, F.lit(5))
        .when(wd == 5, F.lit(6))
        .when(wd == 6, F.lit(0))
        .otherwise(F.lit(2))
        .cast("int")
    )


def sql_day_type(ts_expr: str) -> str:
    """DuckDB twin of :func:`day_type` (isodow: 1=Monday … 7=Sunday)."""
    wd = f"(isodow({ts_expr}) - 1)"
    return (
        f"CAST(CASE {wd} WHEN 0 THEN 1 WHEN 4 THEN 5 WHEN 5 THEN 6 "
        f"WHEN 6 THEN 0 ELSE 2 END AS INTEGER)"
    )


def spanish_decimal(col: Column) -> Column:
    """Parse '1.234,56' → 1234.56 (dags/Economy/transform_silver_economy.py:48-50)."""
    return F.replace(F.replace(col, F.lit("."), F.lit("")), F.lit(","), F.lit(".")).try_cast("double")


def digits_only(col: Column) -> Column:
    """Keep digits only — regexp_replace(col,'[^0-9]','','g')
    (dags/Population/transform_silver_population.py:44)."""
    return F.regexp_replace(col, "[^0-9]", "")


def code_before_space(col: Column) -> Column:
    """split_part(col, ' ', 1): INE '"46250 Valencia"' → '46250'
    (dags/Economy/transform_silver_economy.py:35-37)."""
    return F.split_part(col, F.lit(" "), F.lit(1))


def strip_zone_suffix(col: Column) -> Column:
    """Drop MITMA '_AM'/'_AD' zone-id suffixes
    (dags/mitma/silver_mitma.py:124-125)."""
    return F.regexp_replace(col, "_AM|_AD", "")


def zone_to_municipality(col: Column) -> Column:
    """LEFT(zone_id, 5) municipality rollup key
    (dags/gravity/aggregate_trips.py:13-14)."""
    return F.substring(col, 1, 5)
