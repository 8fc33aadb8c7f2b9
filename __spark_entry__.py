"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``lakehouse_spain_mobility_spark.queries``: each registry
entry pairs a Spark DataFrame builder with an equivalent DuckDB oracle SQL
string (tagged with the SURVEY §2 operator ids it covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakehouse_spain_mobility_spark.queries import load_all

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the gold typical-day 3σ
    pattern model (reference: dags/mitma/new_gold.py:22-86)."""
    registry = load_all()
    return registry["typical_day"].build(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
