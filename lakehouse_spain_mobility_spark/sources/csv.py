"""CSV scan connectors (SURVEY §2.1 S1/S2).

The reference's two CSV modes:
- S1: error-tolerant all-VARCHAR schema-on-read for MITMA daily files
  (``read_csv_auto(url, compression='gzip', ignore_errors=true,
  all_varchar=true)`` — dags/mitma/bronze_mitma.py:49-69). Spark reads
  gzip CSV transparently by extension; ``mode=PERMISSIVE`` keeps malformed
  rows as NULL-padded (all-string schema can't fail to parse), matching
  ``ignore_errors``.
- S2: type-inferring local CSV for INE files with Spanish headers and
  ``;`` separators (``read_csv(path, ignore_errors=true)`` —
  dags/Economy/ingestion_bronze_economy.py:13-18).

Spark cannot stream ``https://`` URLs natively — download to a staging
path first (sources.http), as SURVEY §2.1 S1 prescribes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_all_varchar(
    spark: SparkSession,
    path: str,
    column_names: list[str] | None = None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """S1: every column StringType; typing happens in the silver hop."""
    if column_names is not None:
        schema = T.StructType([T.StructField(c, T.StringType()) for c in column_names])
        return (
            spark.read.schema(schema)
            .option("header", header)
            .option("sep", sep)
            .option("mode", "DROPMALFORMED")
            .csv(path)
        )
    df = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("inferSchema", "false")  # no inference → all strings
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    return df


def read_csv_inferred(
    spark: SparkSession, path: str, sep: str = ";", header: bool = True
) -> DataFrame:
    """S2: header + type inference, malformed rows dropped; Spanish column
    names (with spaces) survive as-is and are accessed with backticks."""
    return (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("inferSchema", "true")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
