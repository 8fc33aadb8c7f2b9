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


def main() -> int:
    """CLI sweep: ``python -m lakehouse_spain_mobility_spark.oracle [sf_dir]``
    runs every registry query against its oracle and prints a verdict line
    per query (exit 1 on any mismatch)."""
    import sys

    from .queries import load_all
    from .session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(extra_conf={"spark.ui.showConsoleProgress": "false"})
    failed = 0
    for spec in load_all().values():
        r = compare(spark, spec, sf_dir)
        status = "MATCH" if r.match else "MISMATCH"
        extra = "(rows-only)" if spec.oracle is None else ""
        print(f"{spec.name:24s} {status} {r.rows} rows {extra}")
        if not r.match:
            failed += 1
            print(f"    {r.detail}")
    print(f"\n{len(load_all()) - failed}/{len(load_all())} queries verified")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
