"""Decade check (VERDICT r3 #5): time the ≥2×-at-sf1 weak set plus the
round-4-rewritten operators on BOTH engines at one sf dir, same session,
and emit one JSON line {query: {spark, duckdb, ratio}}. Run at sf1 and
sf3 (scripts/make_sf1.py with replicas=30) to see whether each ratio is
flat-or-falling across the decade step — the claim the sf1 pass left as
extrapolation.

Usage: python scripts/decade_bench.py [sf_dir] [label]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from lakehouse_spain_mobility_spark.queries import load_all
from lakehouse_spain_mobility_spark.queries.tables import TABLE_NAMES
from lakehouse_spain_mobility_spark.session import build_session

# the sf1 weak set (PERF.md round 3) + the operators round 4 rewrote
QUERIES = [
    "tpch_q2", "tpch_q11", "tpch_q16",          # partsupp surrogate (bucketed r4)
    "scd2_history", "window_frames_battery",     # >3x at sf1
    "substring_span_dedup",                      # 1.96x at sf1 (single-shuffle r4)
    "typical_day", "report_rollup",              # reference headliners, 7x at sf1
    "pq_adc_search", "bm25_search", "perplexity_filter",
    "dsir_weights", "pmi_bigrams",               # global-topk rewrites r4
    "line_dedup", "diversity_prune",             # skew-fallback rewrites r4
    # round-4 new operators: scale-measured from birth
    "incremental_dedup", "maxsim_rerank", "bitext_margin", "bpe_merges",
    "stream_tumbling_exec", "spatial_dissolve", "zorder_cluster",
    # round-4b sketch/set-join/fusion/LM operators: scale-measured from birth
    "hll_distinct", "cms_heavy_hitters", "rrf_fusion", "prefix_filter_join",
    "kmv_distinct", "kmv_jaccard", "kn_bigram_lm", "entropy_diversity",
    "source_quota_cap", "stream_dedup_exec", "curriculum_order",
    "ivm_delta_agg", "k_anonymity_audit",
    # round-4d operators: scale-measured from birth
    "l_diversity_audit", "join_size_estimate", "frequent_itemsets",
    "unimax_mix", "stream_join_exec", "inverted_index",
    "stream_stateful_exec", "boilerplate_removal",
    # round-5 new operator: scale-measured from birth
    "bitext_margin_lsh",
    # round-6: replica-free decade curve for the candidate-bounded plan
    # + the native-SQL dissolve alongside the kernel form
    "bitext_margin_lsh_dedup", "spatial_dissolve_native",
    # round-7: rank-family battery now chunk-parallel (ranked_window) —
    # scale-measured from the rewrite on
    "window_battery",
]

# Queries whose plan reads the bucketed ps_lineitem layout (the one-time
# layout write is timed separately and excluded from their numbers).
BUCKETED_FAMILY = {"tpch_q2", "tpch_q11", "tpch_q16"}
# Streaming-execution entries: their DuckDB twin is a trivial batch GROUP
# BY, so the printed ratio's denominator is not an equivalent engine run
# (PERF.md streaming cost model) — marked machine-readably in the output.
STREAM_EXEC = {
    "stream_tumbling_exec", "stream_session_exec", "stream_dedup_exec",
    "stream_join_exec", "stream_stateful_exec",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata_sf1"
    label = sys.argv[2] if len(sys.argv) > 2 else sf_dir.rstrip("/").rsplit("/", 1)[-1]
    registry = load_all()
    # DECADE_SKIP: comma-separated names to leave out at a given scale —
    # used at sf10 for bitext_margin, whose exact A×B grid is quadratic
    # BY CONSTRUCTION on both engines (the candidate-generation scale
    # path is LSH/Hamming; the grid is the bounded oracle form).
    skip = set(filter(None, os.environ.get("DECADE_SKIP", "").split(",")))
    specs = [registry[n] for n in QUERIES if n not in skip]

    # DECADE_SINK: names (or 'all') additionally timed to a parquet SINK on
    # both engines — the pipeline-realistic grading for transfer-bound
    # queries (full-relation outputs pay ~4x row-collect on Spark but both
    # engines pay a comparable columnar write; VERDICT r4 #5).
    sink = set(filter(None, os.environ.get("DECADE_SINK", "").split(",")))
    if "all" in sink:
        sink = {s.name for s in specs}
    # DECADE_ARROW: names (or 'all') additionally timed through the
    # Arrow-native driver transfer — Spark df.toArrow() vs DuckDB
    # fetch_arrow_table(), both yielding a pyarrow.Table. The default
    # collect protocol pairs Spark's JVM→pickle→Row path against DuckDB's
    # C-level fetchall; for full-relation outputs that prices the row
    # codec, not the plan (PERF.md round 7) — the Arrow pair is the
    # transfer-parity measurement for those rows.
    arrow = set(filter(None, os.environ.get("DECADE_ARROW", "").split(",")))
    if "all" in arrow:
        arrow = {s.name for s in specs}
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="decade_sink_")
    spark_t: dict[str, float] = {}
    spark_sink_t: dict[str, float] = {}
    spark_arrow_t: dict[str, float] = {}
    duck_t: dict[str, float] = {}
    duck_sink_t: dict[str, float] = {}
    duck_arrow_t: dict[str, float] = {}
    duck_note: dict[str, str] = {}
    bucket_etl: float | None = None
    # try/finally: a failed query or sink write must not leak the sink dir
    # (it can hold full query outputs at decade scale).
    try:
        # An intentional full-relation Arrow fetch needs the result-size
        # guard raised: the 1g maxResultSize default rejects a 30M-row
        # transfer (measured at sf30 — PERF.md round 7b).
        extra = {"spark.driver.maxResultSize": "8g"} if arrow else {}
        spark = build_session(app_name="decade-bench", extra_conf=extra)
        spark.range(1000).selectExpr("sum(id)").collect()
        if any(s.name in BUCKETED_FAMILY for s in specs):
            # The one-time bucketed-layout write (ps_lineitem) is timed
            # SEPARATELY, before any warmup, so the per-query numbers
            # measure the query, never the amortized ETL (VERDICT r5 #1).
            from lakehouse_spain_mobility_spark.queries.tpch import (
                bucketed_ps_lineitem,
            )

            t0 = time.perf_counter()
            bucketed_ps_lineitem(spark, sf_dir).count()
            bucket_etl = round(time.perf_counter() - t0, 3)
            print(f"# bucket-etl ps_lineitem layout: {bucket_etl:.3f}s", file=sys.stderr)
        for spec in specs:
            spec.build(spark, sf_dir).collect()  # warmup (codegen)
            t0 = time.perf_counter()
            n = len(spec.build(spark, sf_dir).collect())
            spark_t[spec.name] = round(time.perf_counter() - t0, 3)
            print(f"# spark {spec.name}: {spark_t[spec.name]:.3f}s ({n} rows)", file=sys.stderr)
            if spec.name in sink:
                t0 = time.perf_counter()
                spec.build(spark, sf_dir).write.mode("overwrite").parquet(
                    f"{tmp}/{spec.name}_spark.parquet"
                )
                spark_sink_t[spec.name] = round(time.perf_counter() - t0, 3)
                print(f"# spark-sink {spec.name}: {spark_sink_t[spec.name]:.3f}s", file=sys.stderr)
            if spec.name in arrow:
                t0 = time.perf_counter()
                n = spec.build(spark, sf_dir).toArrow().num_rows
                spark_arrow_t[spec.name] = round(time.perf_counter() - t0, 3)
                print(
                    f"# spark-arrow {spec.name}: {spark_arrow_t[spec.name]:.3f}s ({n} rows)",
                    file=sys.stderr,
                )
        spark.stop()

        con = duckdb.connect()
        for t in TABLE_NAMES:
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):
                path = f"{path}/*.parquet"
                assert glob.glob(path), path
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        # DECADE_DUCK_SKIP: oracle runs to skip with a DNF note (e.g.
        # kmv_jaccard at sf10 spills past the disk budget — measured
        # 45 GB temp and still climbing in rounds 5 and 7; a wedged
        # oracle must not take the whole run's JSON with it).
        duck_skip = set(filter(None, os.environ.get("DECADE_DUCK_SKIP", "").split(",")))
        for spec in specs:
            if spec.name in duck_skip:
                duck_note[spec.name] = "DNF: skipped via DECADE_DUCK_SKIP (known disk-budget spill)"
                print(f"# duckdb {spec.name}: SKIPPED", file=sys.stderr)
                continue
            try:
                con.execute(spec.oracle).fetchall()
                t0 = time.perf_counter()
                n = len(con.execute(spec.oracle).fetchall())
                duck_t[spec.name] = round(time.perf_counter() - t0, 3)
                print(f"# duckdb {spec.name}: {duck_t[spec.name]:.3f}s ({n} rows)", file=sys.stderr)
            except Exception as ex:  # keep the run; record the DNF
                duck_note[spec.name] = f"DNF: {type(ex).__name__}: {ex}"[:200]
                print(f"# duckdb {spec.name}: FAILED {ex}", file=sys.stderr)
            if spec.name in sink:
                t0 = time.perf_counter()
                con.execute(
                    f"COPY ({spec.oracle}) TO '{tmp}/{spec.name}_duck.parquet' (FORMAT PARQUET)"
                )
                duck_sink_t[spec.name] = round(time.perf_counter() - t0, 3)
                print(f"# duckdb-sink {spec.name}: {duck_sink_t[spec.name]:.3f}s", file=sys.stderr)
            if spec.name in arrow and spec.name not in duck_skip:
                t0 = time.perf_counter()
                n = con.execute(spec.oracle).fetch_arrow_table().num_rows
                duck_arrow_t[spec.name] = round(time.perf_counter() - t0, 3)
                print(
                    f"# duckdb-arrow {spec.name}: {duck_arrow_t[spec.name]:.3f}s ({n} rows)",
                    file=sys.stderr,
                )
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out = {}
    for q in QUERIES:
        if q not in spark_t:  # DECADE_SKIP names have no measurements
            continue
        row = {
            "spark": spark_t[q],
            "duckdb": duck_t.get(q),
            "ratio": round(spark_t[q] / duck_t[q], 3) if duck_t.get(q) else None,
        }
        if q in duck_note:
            row["duckdb_note"] = duck_note[q]
        if q in BUCKETED_FAMILY and bucket_etl is not None:
            row["layout_etl_excluded_sec"] = bucket_etl
        if q in STREAM_EXEC:
            # The oracle twin is a plain batch GROUP BY; the ratio contrasts
            # a real StateStore micro-batch execution against a trivial
            # batch denominator — a cost-model note, not an engine defect.
            row["denominator"] = "batch-oracle"
        if q in spark_sink_t and q in duck_sink_t:
            row["spark_sink"] = spark_sink_t[q]
            row["duckdb_sink"] = duck_sink_t[q]
            if duck_sink_t[q] > 0:
                row["ratio_sink"] = round(spark_sink_t[q] / duck_sink_t[q], 3)
        if q in spark_arrow_t and q in duck_arrow_t:
            row["spark_arrow"] = spark_arrow_t[q]
            row["duckdb_arrow"] = duck_arrow_t[q]
            if duck_arrow_t[q] > 0:
                row["ratio_arrow"] = round(spark_arrow_t[q] / duck_arrow_t[q], 3)
        out[q] = row
    payload = {"label": label, "sf_dir": sf_dir, "queries": out}
    if bucket_etl is not None:
        payload["bucket_etl_sec"] = bucket_etl
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
