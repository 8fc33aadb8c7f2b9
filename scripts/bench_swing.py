"""Re-emit BENCH_FULL.json as a min/median/max swing band over N runs
(VERDICT r8 "bench-record hygiene": a single favorable sample is not a
committed record; the decade rows carry swing bands, the headline record
should too).

Runs bench.py N times sequentially (fresh process each — the bench's own
protocol), parses the LAST JSON line of each run (JVM GC warnings can land
on stdout mid-stream), and writes BENCH_FULL.json with:
- the headline values of the MEDIAN run (by total h1+h2) as the record,
- min/median/max bands for both headline totals,
- per-query times from the median run,
- a swing_note naming the protocol.

Usage: python scripts/bench_swing.py [N=3]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runs = []
    for i in range(n):
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            capture_output=True, text=True, cwd=repo,
        )
        lines = [l for l in r.stdout.splitlines() if l.lstrip().startswith('{"metric"')]
        if not lines:
            print(f"# run {i}: NO JSON\n{r.stderr[-800:]}", file=sys.stderr)
            continue
        d = json.loads(lines[-1])
        runs.append(d)
        print(f"# run {i}: h1={d['value']} h2={d['value2']}", file=sys.stderr)
    if not runs:
        raise SystemExit("no successful bench runs")
    totals = [r["value"] + r["value2"] for r in runs]
    # median-adjacent pick: for even N statistics.median averages the two
    # middle totals (no run has that total), so the record is the run
    # CLOSEST to the band median — keeps headline value/value2 consistent
    # with the reported h1/h2 medians for odd N and documented-nearest for
    # even N (ADVICE r9 #4)
    band_med = statistics.median(totals)
    med_i = min(range(len(runs)), key=lambda i: abs(totals[i] - band_med))
    rec = dict(runs[med_i])
    h1 = [r["value"] for r in runs]
    h2 = [r["value2"] for r in runs]
    rec["swing"] = {
        "runs": len(runs),
        "h1_min": min(h1), "h1_median": statistics.median(h1), "h1_max": max(h1),
        "h2_min": min(h2), "h2_median": statistics.median(h2), "h2_max": max(h2),
    }
    rec["swing_note"] = (
        "record = the run whose total is closest to the band median, over "
        "sequential fresh-process bench.py "
        "executions on a quiet host; committed bands replace the single-"
        "sample record (VERDICT r8 bench-record hygiene)"
    )
    out = os.path.join(repo, "BENCH_FULL.json")
    with open(out, "w") as f:
        json.dump(rec, f)
    print(json.dumps({k: rec[k] for k in ("value", "value2", "swing")}))


if __name__ == "__main__":
    main()
