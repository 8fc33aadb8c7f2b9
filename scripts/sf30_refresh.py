"""Refresh CHANGED rows of SCALING_sf30.json in place (VERDICT r6 #1).

Protocol unchanged from rounds 4/5 (PERF.md): single COLD run per query
(one fresh session per query — at 10-600 s runtimes the ~2 s plan-compile
floor is noise), Spark-only (the sf1/sf3/sf10 decade artifacts carry the
cross-engine ratios), splittable 32-file layout, 16g driver heap (the
round-5 capacity finding: 8g/32 cores starves concurrent map tasks).

Usage: python scripts/sf30_refresh.py [sf_dir] q1 q2 ...
Reads SCALING_sf30.json, re-times the named queries on current code,
updates their rows and the refresh note, writes the file back.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = """
import os, sys, time
os.environ["SPARK_DRIVER_MEMORY"] = "16g"
sys.path.insert(0, {repo!r})
from lakehouse_spain_mobility_spark.queries import load_all
from lakehouse_spain_mobility_spark.session import build_session
spark = build_session(app_name="sf30-refresh")
spec = load_all()[{name!r}]
if {name!r} in ("tpch_q2", "tpch_q11", "tpch_q16"):
    # one-time layout ETL timed separately (the session-scoped cache is
    # cold in this fresh child; the decade protocol excludes layout ETL
    # from per-query numbers)
    from lakehouse_spain_mobility_spark.queries.tpch import bucketed_ps_lineitem
    t0 = time.perf_counter()
    bucketed_ps_lineitem(spark, {sf_dir!r}).count()
    print("ETL", round(time.perf_counter() - t0, 1))
t0 = time.perf_counter()
n = len(spec.build(spark, {sf_dir!r}).collect())
print("RESULT", round(time.perf_counter() - t0, 1), n)
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata_sf30"
    names = sys.argv[2:]
    path = os.path.join(REPO, "SCALING_sf30.json")
    with open(path) as f:
        doc = json.load(f)
    for name in names:
        # cold: a fresh interpreter + session per query, like rounds 4/5
        code = CHILD.format(repo=REPO, name=name, sf_dir=sf_dir)
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
        if not line:
            print(f"# {name}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        sec, rows = line[0].split()[1:3]
        doc["queries"][name] = float(sec)
        etl = [l for l in out.stdout.splitlines() if l.startswith("ETL")]
        if etl:
            doc.setdefault("notes", {})[f"{name}_layout_etl_excluded_sec"] = float(
                etl[0].split()[1]
            )
        print(
            f"# {name}: {sec}s ({rows} rows; wall {time.time()-t0:.0f}s"
            + (f"; etl {etl[0].split()[1]}s excluded" if etl else "") + ")",
            file=sys.stderr,
        )
    doc.setdefault("notes", {})["refresh"] = (
        "rows refreshed on round-7 code (single cold run, 16g): "
        + ", ".join(names)
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({n: doc["queries"].get(n) for n in names}))


if __name__ == "__main__":
    main()
