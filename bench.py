"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lakehouse_spain_mobility_spark.queries import load_all
    from lakehouse_spain_mobility_spark.session import build_session

    registry = load_all()
    bench_specs = [s for s in registry.values() if s.bench]

    spark = build_session(app_name="lakehouse-bench")
    # Warm the JVM/codegen path so per-query timings measure the queries.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total = 0.0
    for spec in bench_specs:
        # One warmup run amortizes JVM/codegen compilation, then measure.
        # collect(), not count(): count() lets Catalyst prune the output
        # expressions (aggregate values are never computed), which
        # under-measures the declared query; collect() materializes the
        # same rows DuckDB's fetchall does.
        spec.build(spark, sf_dir).collect()
        t0 = time.perf_counter()
        n = len(spec.build(spark, sf_dir).collect())
        dt = time.perf_counter() - t0
        timings[spec.name] = round(dt, 3)
        total += dt
        print(f"# {spec.name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
