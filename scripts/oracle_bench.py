"""Time the DuckDB oracle SQL for the bench query sets at a given sf dir.

The driver computes Spark-vs-DuckDB ratios from its own runs at sf0.1; this
gives the same comparison at any locally generated scale (e.g. the sf1
dataset from scripts/make_sf1.py). One JSON line to stdout, same shape as
bench.py so the two are diffable.

Usage: python scripts/oracle_bench.py [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import BENCH2
from lakehouse_spain_mobility_spark.queries import load_all
from lakehouse_spain_mobility_spark.queries.tables import TABLE_NAMES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    skip = set((os.environ.get("ORACLE_BENCH_SKIP") or "").split(","))
    registry = load_all()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written dataset directory
            path = f"{path}/*.parquet"
            assert glob.glob(path), path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    def run_set(names):
        timings, total = {}, 0.0
        for name in names:
            spec = registry[name]
            if spec.oracle is None or name in skip:
                continue
            con.execute(spec.oracle).fetchall()  # warmup (buffer cache)
            t0 = time.perf_counter()
            n = len(con.execute(spec.oracle).fetchall())
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 3)
            total += dt
            print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        return timings, total

    bench_names = [s.name for s in registry.values() if s.bench]
    timings, total = run_set(bench_names)
    timings2, total2 = run_set(BENCH2)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf if not sf.replace(".", "").isdigit() else float(sf),
                "metric2": "duckdb_oracle_headline2_wall_clock",
                "value2": round(total2, 3),
                "queries2": timings2,
            }
        )
    )


if __name__ == "__main__":
    main()
