"""Spark-vs-DuckDB timing harness behind PERF.md.

``python -m lakehouse_spain_mobility_spark.perf [sf_dir] [--all]`` times
every bench-flagged registry query (``--all``: every oracle-checked
query) in both engines — one warm-up run then one timed run each,
sequentially (concurrent timing runs trample each other on this host) —
and prints a markdown table plus one machine-readable JSON line.

The DuckDB side runs the exact ``oracle_sql()`` text, so the comparison
is same-semantics by construction.
"""

from __future__ import annotations

import json
import sys
import time


def time_query(fn) -> float:
    fn()  # warm: plan/codegen/file caches
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> int:
    from .oracle import duckdb_connection
    from .queries import load_all
    from .session import build_session

    args = [a for a in sys.argv[1:]]
    include_all = "--all" in args
    args = [a for a in args if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    spark = build_session(extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb_connection(sf_dir)
    specs = [
        s for s in load_all().values() if s.oracle is not None and (s.bench or include_all)
    ]
    # two sequential passes (all Spark, then all DuckDB): interleaving the
    # engines cools Spark's executor/JIT state and inflates its numbers
    spark_times = {
        s.name: time_query(lambda s=s: s.build(spark, sf_dir).collect()) for s in specs
    }
    duck_times = {s.name: time_query(lambda s=s: con.execute(s.oracle).fetchall()) for s in specs}
    rows = []
    for s in specs:
        ts, td = spark_times[s.name], duck_times[s.name]
        rows.append((s.name, ts, td))
        print(f"| {s.name} | {ts:.2f} | {td:.2f} | {ts / td:.2f}x |", file=sys.stderr)
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows)
    print(
        f"| **total ({len(rows)} queries)** | **{tot_s:.1f}** | **{tot_d:.1f}** "
        f"| **{tot_s / tot_d:.2f}x** |",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "spark_total_sec": round(tot_s, 3),
                "duckdb_total_sec": round(tot_d, 3),
                "ratio": round(tot_s / tot_d, 3),
                "queries": {n: {"spark": round(s, 3), "duckdb": round(d, 3)} for n, s, d in rows},
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
