"""Executed-plan audit: build + execute every registry query at a small sf
and report per-query final-plan shape counters — parquet scan nodes,
in-memory scans, ReusedExchange nodes — sorted by scan count.

Redundant-execution shapes show up as high scan counts with low reuse:
round 7b found `pagerank_nations` re-deriving its loop-invariant
fact-scale edge pipeline once per iteration this way (54 scan nodes → 7
after checkpointing; PERF.md "plan audit" section). Suites (UNION-ALL
bundles) and genuinely multi-pass algorithms (triangle wedges, KMV
sketch pairs) legitimately score high — read the counts against what the
query IS before calling a number a defect, and confirm with the final
executed plan (AQE's runtime exchange reuse shares subtrees the static
pre-execution plan prints twice).

Usage: python scripts/plan_audit.py [sf_dir] [top_n]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_spain_mobility_spark.plans.inspect import audit_counts
from lakehouse_spain_mobility_spark.queries import load_all
from lakehouse_spain_mobility_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = build_session(master="local[8]", shuffle_partitions=8)
    rows = []
    for name, spec in load_all().items():
        try:
            df = spec.build(spark, sf_dir)
            df.collect()  # finalize the AQE plan for THIS DataFrame
            rows.append((name, *audit_counts(df)))
        except Exception as ex:  # noqa: BLE001 — audit must survive one bad query
            rows.append((name, -1, -1, f"{type(ex).__name__}: {ex}"[:80]))
    rows.sort(key=lambda r: -(r[1] if isinstance(r[1], int) else 0))
    print(f"{'query':34} {'scans':>5} {'mem':>4} {'reused':>6}")
    for r in rows[:top_n]:
        print(f"{r[0]:34} {r[1]:>5} {r[2]:>4} {r[3]:>6}")
    spark.stop()


if __name__ == "__main__":
    main()
