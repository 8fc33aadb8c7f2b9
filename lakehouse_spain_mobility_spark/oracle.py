"""Differential-test harness: run a registry query on Spark and its oracle
SQL on DuckDB over the same parquet tables, and compare results exactly.

This mimics the driver's correctness gate (CORRECTNESS_r{N}.json): columns
sorted by name, rows compared as an order-insensitive multiset, values
compared exactly (the engine's deterministic decimal aggregation makes
float outputs bit-identical across engines — see functions/deterministic.py).
"""

from __future__ import annotations

import datetime
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from .queries import QuerySpec
from .queries.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with the testdata registered as views, as
    the driver pre-registers them."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)  # +0.0 folds -0.0 into 0.0
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


@dataclass
class DiffResult:
    name: str
    rows: int
    oracle_rows: int
    match: bool
    detail: str = ""


def compare(spark: SparkSession, spec: QuerySpec, sf_dir: str) -> DiffResult:
    sdf = spec.build(spark, sf_dir)
    cols = sorted(sdf.columns)
    spark_rows = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in sdf.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )
    if spec.oracle is None:
        return DiffResult(spec.name, len(spark_rows), -1, len(spark_rows) >= 0, "rows-only")

    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(spec.oracle)
        duck_cols = [d[0] for d in cur.description]
        order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        duck_rows = sorted(
            (tuple(_norm(row[i]) for i in order) for row in cur.fetchall()),
            key=lambda t: tuple(str(x) for x in t),
        )
    finally:
        con.close()

    if sorted(duck_cols) != cols:
        return DiffResult(
            spec.name, len(spark_rows), len(duck_rows), False,
            f"column mismatch: spark={cols} duckdb={sorted(duck_cols)}",
        )
    if len(spark_rows) != len(duck_rows):
        return DiffResult(
            spec.name, len(spark_rows), len(duck_rows), False,
            f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}",
        )
    for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
        if a != b:
            return DiffResult(
                spec.name, len(spark_rows), len(duck_rows), False,
                f"first differing row #{i}:\n  spark : {a}\n  duckdb: {b}\n  cols  : {cols}",
            )
    return DiffResult(spec.name, len(spark_rows), len(duck_rows), True)
