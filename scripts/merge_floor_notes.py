"""Inject per-row floor_notes into a fresh decade JSON artifact.

The decade chain emits raw measurements; floor_notes carry each weak
row's measured decomposition (the ladder/A-B evidence lives in PERF.md).
Round-10 edition: carries the surviving r9 notes forward verbatim and
replaces the rows whose shape changed this round (tpch_q16, scd2_history,
line_dedup, inverted_index, typical_day/report_rollup unchanged, new
rows report_rollup_gold / kll_quantile_sketch / inverted_index_relational).

Usage: python scripts/merge_floor_notes.py IN.json OUT.json
"""

import json
import sys

NOTES = {
    "typical_day": (
        "round-9: int64-arithmetic silver (java.time eliminated; paired A/B "
        "3.28->2.95s) and int-surrogate join keys measured and REJECTED "
        "(PERF.md round 9). Two fact passes + 12k-row broadcast probe are "
        "the reference stats-CTE semantics; engine floor, hypothesis "
        "measured, not argued"
    ),
    "report_rollup": (
        "END-TO-END pipeline contract: recomputes silver+stats+gold from raw "
        "then reaggregates - kept deliberately as the pipeline-cost row. The "
        "reference's own report shape (gold stored once, report reads gold) "
        "is the report_rollup_gold row: 0.58s vs 0.35s = 1.66x (r10, "
        "VERDICT r9 #1 closed)"
    ),
    "report_rollup_gold": (
        "round-10 (VERDICT r9 #1): K3-materialized gold (clustered on "
        "day_type,hour_period) built once at warmup - the amortized one-time "
        "step, like the bucketed family's layout ETL; timed runs read the "
        "~12k-row stored table. The oracle recomputes gold as a CTE every "
        "run, so the ratio is spark-favoring by construction (flagged in "
        "denominator); the honest pair is this row + report_rollup"
    ),
    "tpch_q16": (
        "round-10 A/B (VERDICT r9 #4): countDistinct 2.38s -> explicit "
        "pair-dedup+count 1.90s; dim_id surrogate REJECTED (2.54s - "
        "broadcast-probe constant outweighs wire width, same verdict as "
        "r9's typical_day key A/B). Floor: the _ps aggregation alone is "
        "1.03s (zero-exchange bucketed scan, ~3M groups) = 1.4x the "
        "oracle's WHOLE query; q16's own machinery is ~0.9s"
    ),
    "scd2_history": (
        "round-10 ladder (VERDICT r9 #3): yearly agg (15M-row single "
        "exchange) 1.32s / +lag heads 1.61 / full compute (noop) 1.50 vs "
        "duck compute 0.53 = 2.8x; the in-chain collect number is ~90% "
        "driver row-codec transfer of the 5.17M-row history (16.8s collect "
        "vs 1.5s compute) - the arrow/compute pairs are the honest fields. "
        "Two-key-agg alternative measured and rejected (2.08 vs 1.75s); "
        "residual = one unavoidable exchange vs DuckDB's in-process hash "
        "table (pre-bucketing orders would delete it - mechanism proven in "
        "test_scale_patterns.py)"
    ),
    "line_dedup": (
        "round-10 ladder (VERDICT r9 #5): lines 0.66 / +md5 hashes 0.85 / "
        "+keep_first 1.07 / +per_doc 1.26 / full compute (noop) 1.69 vs "
        "duck compute 0.85 = 2.0x; collect adds 1.5s of row-codec transfer "
        "(500k rows). Micro-A/Bs rejected: ntok-arithmetic (1.81), 60-bit "
        "line key (1.70, and weakens the dedup contract). Floor = lines "
        "explode + two hash aggs over 10.9M ~100B strings"
    ),
    "inverted_index": (
        "round-10 kernel (VERDICT r9 #2): mapInPandas emits vocab-bounded "
        "per-batch term partials, so the postings relation (11.6M rows, the "
        "measured 1.47s pair-agg floor) never crosses an exchange; posting "
        "hash now xxh64(doc_id,tf)&2^40 (native codegen / one numpy pass; "
        "md5 was 0.9s of kernel wall). 2.11 -> 0.99s standalone. The "
        "oracle replays the xxh64 in SQL (denominator flagged); vs the "
        "retired md5-oracle denominator (0.49s) the kernel is 2.0x, and "
        "0.58s of that is the measured Arrow passthrough floor"
    ),
    "inverted_index_relational": (
        "the unbounded-vocab route (explode + pair agg + term agg, "
        "xxh64 checksum): per-batch kernel partials degenerate when every "
        "token is unique, so this twin stays registered; same flagged "
        "replay denominator as the kernel row"
    ),
    "kll_quantile_sketch": (
        "round-10 new operator (VERDICT r9 #7): hash-geometric level "
        "sample, ~k-row mergeable state per group; spark side = 2 fact "
        "passes (sizes, sample) + 1 verification pass (15 literal "
        "conditional sums - the probe-JOIN form amplified the fact 3x and "
        "cost 4.75s; literal form 2.8s). Oracle pays the SQL-replayed "
        "xxh64 over 10M rows plus a window pushdown-barrier (without it "
        "DuckDB's filter inlining through the 14-level chain is "
        "exponential - 166s at sf1); denominator flagged, parity proof "
        "not engine race"
    ),
    "dsir_weights": (
        "round-9: scoring via element_at on a literal map of the collected "
        "31-row model under _DSIR_MAP_CAP=1024 (broadcast join past the "
        "cap); paired standalone 1.96x. Two corpus passes are the algorithm"
    ),
    "spatial_dissolve": (
        "round-9 batch-vectorized kernel (one C-level parse per Arrow batch "
        "+ reduceat ring reductions; 4.67->1.09s). round-10: the fast path "
        "now ENFORCES its exactness precondition at runtime "
        "(quarter-integral coords, ring<=64 - ADVICE r9 #1), so output is "
        "independent of Arrow batch composition; remaining ratio is the "
        "sub-1.1s-absolute regime vs a 0.3s oracle"
    ),
    "hll_distinct": (
        "round-9 FINAL form: raw-row registers (r8 dedup-first reverted on "
        "sf30 evidence); twin verdict: md5 is NOT the floor - the "
        "exact-contract COUNT DISTINCT column is"
    ),
    "hll_distinct_x64": (
        "raw-row xxhash64 registers. CAUTION: the oracle recomputes Spark's "
        "exact XXH64 as generated SQL - this row is a bit-parity proof, "
        "not an engine comparison; the md5 row is the fair denominator"
    ),
    "boilerplate_removal": (
        "round-9: order-free multiset checksum - line text never crosses "
        "an exchange (5.26->4.74s); branch decomposition in PERF.md round "
        "9; the remainder is the irreducible two-phase structure plus "
        "per-job constants"
    ),
    "bitext_margin_lsh_dedup": (
        "round-9: 64-term chains text-built + memoized (r10: the cache "
        "holds SQL text, not py4j Columns - ADVICE r9 #2); 0.58s "
        "DataFrame-construction py4j floor + ~1.8s exec; paired standalone "
        "1.61x, plan contract intact (2 scans, no pair enumeration)"
    ),
    "t_closeness_audit": (
        "round-9 single-exchange window form (A/B committed: 2.17->1.19s); "
        "remaining floor: corpus pair-count agg + per-job constants, the "
        "audit-family regime"
    ),
    "url_canonicalize": (
        "sub-second fixed-overhead family: per-row string codegen + one "
        "canonical-string hash agg (r10: default-port strip made "
        "scheme-conditional in both twins - ADVICE r9 #5); ratios fall "
        "monotonically across the decade (documented regime)"
    ),
    "frequent_itemsets": (
        "round-10 (VERDICT r9 #6): oracle row REPAIRED - ran to completion "
        "under the new disk budget (DECADE_DUCK_TMP + "
        "max_temp_directory_size=35GiB); no DNF, real ratio recorded. "
        "Spark wins the row outright (pair fan-out is bounded by the "
        "per-basket cap before the support prune)"
    ),
}


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    with open(src) as f:
        payload = json.load(f)
    hit = 0
    for name, note in NOTES.items():
        row = payload["queries"].get(name)
        if row is not None:
            row["floor_note"] = note
            hit += 1
    payload["floor_notes_merged"] = hit
    with open(dst, "w") as f:
        json.dump(payload, f)
    print(f"merged {hit} floor notes -> {dst}")


if __name__ == "__main__":
    main()
