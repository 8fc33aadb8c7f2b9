"""Refresh the sf30 Arrow-transfer / compute rows for the chunk-parallel
window batteries (VERDICT r7 #3).

Round 7 left a residual: battery's Arrow transfer ran ~35-50 s heavier
than frames' at the same 30M rows over near-identical computes, partially
attributed to output width (11 vs 8 columns) and a fat tail partition
(3.0M vs 2.4M rows) from hash-of-32-chunk-id collisions. Round 8 replaced
that hash with an inverted-murmur3 slot (one chunk per partition,
operators/pwindow.py) — this script re-measures the pair on current code
and records per-query structured rows (compute / arrow / partition-size
spread) into SCALING_sf30.json["arrow_rows"].

Protocol: one COLD child process per query (sf30_refresh.py's), 24 g heap
(the round-7b capacity note for 30M-row transfers), maxResultSize=8g (the
documented knob for an intentional full-relation driver fetch). Compute =
avg(xxhash64(struct(*))) consumer; partition sizes from a separate
mapPartitions count pass (its own execution, printed for the skew
attribution, not added to either timing).

Usage: python scripts/sf30_arrow.py [sf_dir] q1 q2 ...
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
os.environ["SPARK_DRIVER_MEMORY"] = "24g"
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from lakehouse_spain_mobility_spark.queries import load_all
from lakehouse_spain_mobility_spark.session import build_session
spark = build_session(
    app_name="sf30-arrow",
    extra_conf={{"spark.driver.maxResultSize": "8g"}},
)
spec = load_all()[{name!r}]
df = spec.build(spark, {sf_dir!r})
t0 = time.perf_counter()
df.select(F.avg(F.xxhash64(F.struct(*df.columns)))).collect()
print("COMPUTE", round(time.perf_counter() - t0, 1))
df2 = spec.build(spark, {sf_dir!r})
t0 = time.perf_counter()
n = df2.toArrow().num_rows
print("ARROW", round(time.perf_counter() - t0, 1), n)
sizes = sorted(
    spec.build(spark, {sf_dir!r})
    .rdd.mapPartitions(lambda it: [sum(1 for _ in it)])
    .collect()
)
print("PARTS", len(sizes), min(sizes), sizes[len(sizes) // 2], max(sizes))
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata_sf30"
    names = sys.argv[2:] or ["window_battery", "window_frames_battery"]
    path = os.path.join(REPO, "SCALING_sf30.json")
    with open(path) as f:
        doc = json.load(f)
    rows = doc.setdefault("arrow_rows", {})
    for name in names:
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO, name=name, sf_dir=sf_dir)],
            capture_output=True,
            text=True,
        )
        vals: dict[str, object] = {}
        for l in out.stdout.splitlines():
            p = l.split()
            if l.startswith("COMPUTE"):
                vals["compute_sec"] = float(p[1])
            elif l.startswith("ARROW"):
                vals["arrow_sec"], vals["rows"] = float(p[1]), int(p[2])
            elif l.startswith("PARTS"):
                vals["partitions"] = int(p[1])
                vals["part_rows_min_med_max"] = [int(p[2]), int(p[3]), int(p[4])]
        if "arrow_sec" not in vals:
            print(f"# {name}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        vals["protocol"] = "cold child, 24g heap, maxResultSize=8g, round-8 slot partitioning"
        rows[name] = vals
        print(f"# {name}: {vals} (wall {time.time()-t0:.0f}s)", file=sys.stderr)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({n: rows.get(n) for n in names}))


if __name__ == "__main__":
    main()
