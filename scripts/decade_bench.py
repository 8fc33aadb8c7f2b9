"""Decade check (VERDICT r3 #5): time the ≥2×-at-sf1 weak set plus the
round-4-rewritten operators on BOTH engines at one sf dir, same session,
and emit one JSON line {query: {spark, duckdb, ratio}}. Run at sf1 and
sf3 (scripts/make_sf1.py with replicas=30) to see whether each ratio is
flat-or-falling across the decade step — the claim the sf1 pass left as
extrapolation.

Usage: python scripts/decade_bench.py [sf_dir] [label]

Env knobs (comma-separated names, or 'all'; see inline comments):
DECADE_SKIP, DECADE_DUCK_SKIP, DECADE_SINK, DECADE_ARROW,
DECADE_COMPUTE (same-session compute-vs-compute: both engines through a
hash-aggregate consumer), DECADE_STANDALONE (names or 'auto': fresh-JVM
min-of-3 re-timing for rows whose in-chain number carries session aging).
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
    # round-9: fast-hash HLL twin (md5-vs-xxhash64 floor probe, VERDICT r8 #2)
    "hll_distinct_x64",
    # round-9 additions: scale-measured from birth
    "t_closeness_audit", "url_canonicalize",
    # round-10: the read-from-gold report twin (VERDICT r9 #1). Its Spark
    # warmup run MATERIALIZES the gold table (the amortized one-time step,
    # like the bucketed family's layout ETL); the timed runs then read the
    # stored ~12k-row gold — the reference's own report shape. The DuckDB
    # twin recomputes gold as a CTE each run (the harness views are the raw
    # tables), so its denominator INCLUDES the model build: the printed
    # ratio is Spark-favoring by construction and annotated in the row.
    "report_rollup_gold",
    # round-10: mergeable quantile sketch (VERDICT r9 #7) — scale-measured
    # from birth like the rest of the sketch family
    "kll_quantile_sketch",
    # round-10: inverted_index's relational twin (the unbounded-vocab
    # route) rides along so kernel-vs-relational stays measured at scale
    "inverted_index_relational",
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
# Rows whose Spark side reads a warmup-materialized gold table while the
# DuckDB oracle recomputes the model in-query — the ratio numerator and
# denominator price different (both legitimate) shapes; machine-annotated.
AMORTIZED_GOLD = {"report_rollup_gold"}
# Rows whose oracle recomputes Spark's exact xxhash64 as generated DuckDB
# SQL (functions/xxh64_sql): the denominator pays a ~14-level arithmetic
# replay of a hash Spark evaluates natively — a PARITY PROOF, not an
# engine race (the hll_distinct_x64 precedent, VERDICT r8/r9).
SQL_REPLAY_ORACLE = {
    "hll_distinct_x64", "inverted_index", "inverted_index_relational",
    "kll_quantile_sketch",
}


# Fresh-process re-timing for the standalone pins: sf30_refresh.py's cold
# protocol, plus warmup + min-of-3 (the 2-4 s absolutes being pinned sit at
# the wobble floor where a single run is ±50%).
_STANDALONE_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from lakehouse_spain_mobility_spark.queries import load_all
from lakehouse_spain_mobility_spark.session import build_session
spark = build_session(app_name="decade-standalone")
spark.range(1000).selectExpr("sum(id)").collect()
spec = load_all()[{name!r}]
if {bucketed!r}:
    from lakehouse_spain_mobility_spark.queries.tpch import bucketed_ps_lineitem
    bucketed_ps_lineitem(spark, {sf_dir!r}).count()  # layout ETL excluded
spec.build(spark, {sf_dir!r}).collect()  # warmup (codegen)
best = None
for _ in range(3):
    t0 = time.perf_counter()
    spec.build(spark, {sf_dir!r}).collect()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print("STANDALONE", round(best, 3))
"""

# DuckDB twin of the standalone child: same fresh-process, warmup,
# min-of-3 protocol, so ratio_standalone divides like-for-like numbers
# (ADVICE r8: the old ratio mixed a fresh-JVM Spark min-of-3 against the
# single-run in-chain DuckDB time — systematically Spark-favoring).
_STANDALONE_DUCK_CHILD = """
import glob, os, sys, time
sys.path.insert(0, {repo!r})
import duckdb
from lakehouse_spain_mobility_spark.queries import load_all
from lakehouse_spain_mobility_spark.queries.tables import TABLE_NAMES
con = duckdb.connect()
duck_tmp = os.environ.get("DECADE_DUCK_TMP")
if duck_tmp:  # same disk budget as the in-chain oracle connection
    os.makedirs(duck_tmp, exist_ok=True)
    con.execute("SET temp_directory='" + duck_tmp + "'")
    con.execute("SET max_temp_directory_size='"
                + os.environ.get("DECADE_DUCK_TMPCAP", "40GiB") + "'")
sf_dir = {sf_dir!r}
for t in TABLE_NAMES:
    path = sf_dir + "/" + t + ".parquet"
    if os.path.isdir(path):
        path = path + "/*.parquet"
        assert glob.glob(path), path
    con.execute("CREATE VIEW " + t + " AS SELECT * FROM '" + path + "'")
sql = load_all()[{name!r}].oracle
con.execute(sql).fetchall()  # warmup
best = None
for _ in range(3):
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print("STANDALONE", round(best, 3))
"""


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
    # DECADE_COMPUTE: names (or 'all') additionally timed COMPUTE-ONLY on
    # both engines, same session: each side runs the full query through a
    # hash-aggregate consumer (Spark sum(xxhash64(struct(*))), DuckDB
    # SELECT sum(hash(t)) FROM (...) t) — every output row/column is
    # computed and consumed, nothing is transferred or written. This is
    # the number the 100×-scale grading needs for full-relation outputs:
    # collect prices the driver transfer, sink prices the writer; compute
    # prices the plan (VERDICT r7 #2).
    compute = set(filter(None, os.environ.get("DECADE_COMPUTE", "").split(",")))
    if "all" in compute:
        compute = {s.name for s in specs}
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="decade_sink_")
    spark_t: dict[str, float] = {}
    spark_sink_t: dict[str, float] = {}
    spark_arrow_t: dict[str, float] = {}
    spark_comp_t: dict[str, float] = {}
    duck_t: dict[str, float] = {}
    duck_sink_t: dict[str, float] = {}
    duck_arrow_t: dict[str, float] = {}
    duck_comp_t: dict[str, float] = {}
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
            if spec.name in compute:
                from pyspark.sql import functions as F

                df = spec.build(spark, sf_dir)
                t0 = time.perf_counter()
                # avg, not sum: long-sum of 64-bit hashes overflows under
                # ANSI mode; avg consumes every row/column identically
                df.select(F.avg(F.xxhash64(F.struct(*df.columns)))).collect()
                spark_comp_t[spec.name] = round(time.perf_counter() - t0, 3)
                print(
                    f"# spark-compute {spec.name}: {spark_comp_t[spec.name]:.3f}s",
                    file=sys.stderr,
                )
        spark.stop()

        con = duckdb.connect()
        # DECADE_DUCK_TMP: a disk BUDGET for the oracle side (VERDICT r9
        # #6 — frequent_itemsets' sf10 row went ratio-less on an operator
        # "No space left on device" instead of a measured verdict). With a
        # temp dir + size cap, an oracle that out-spills the budget raises
        # a DuckDB error that lands in the row as a DNF note naming the
        # budget, and can never take the host's disk (or the rest of the
        # run) with it.
        duck_tmp = os.environ.get("DECADE_DUCK_TMP")
        if duck_tmp:
            os.makedirs(duck_tmp, exist_ok=True)
            con.execute(f"SET temp_directory='{duck_tmp}'")
            cap = os.environ.get("DECADE_DUCK_TMPCAP", "40GiB")
            con.execute(f"SET max_temp_directory_size='{cap}'")
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
                duck_note[spec.name] = (
                    "DNF: skipped via DECADE_DUCK_SKIP (known disk-budget "
                    "spill — kmv_jaccard's oracle wrote 45 GB of temp and "
                    "was still climbing at sf10, rounds 5/7). Decade trend "
                    "where the oracle fits: sf1 Spark 3.9 vs DuckDB 22.3 s "
                    "(0.18x), sf3 9.5 vs 67.2 s (0.14x) — the oracle side "
                    "is superlinear, Spark's salted two-level k-min is not; "
                    "extrapolated sf10 oracle >200 s (VERDICT r8 #8)."
                )
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
            if spec.name in compute and spec.name not in duck_skip:
                t0 = time.perf_counter()
                con.execute(
                    f"SELECT sum(hash(t)) FROM ({spec.oracle}) t"
                ).fetchall()
                duck_comp_t[spec.name] = round(time.perf_counter() - t0, 3)
                print(
                    f"# duckdb-compute {spec.name}: {duck_comp_t[spec.name]:.3f}s",
                    file=sys.stderr,
                )
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # DECADE_STANDALONE: names, or 'auto' = every row that printed >2×
    # in-chain at a >2 s Spark absolute. In-chain numbers carry 40+
    # queries of shared-session aging (transient, not monotone — PERF.md
    # round 7 instrumentation), so each selected query is re-timed in a
    # FRESH interpreter + JVM: warm layout (bucketed family), one warmup
    # run, then min of 3 fresh builds. The standalone field is the honest
    # engine number; the in-chain field stays as the chain-context number.
    standalone_sel = set(
        filter(None, os.environ.get("DECADE_STANDALONE", "").split(","))
    )
    if "auto" in standalone_sel:
        standalone_sel.discard("auto")
        # auto skips rows whose printed ratio is already machine-annotated
        # as not an engine comparison: stream_* (batch-oracle denominator)
        # and rows carrying arrow/compute pairs (full-relation outputs
        # whose collect ratio prices the Row codec — re-timing a 3×40 s
        # 10M-row collect in a child JVM buys nothing the arrow/compute
        # fields don't already say). Explicit names still force a pin.
        standalone_sel |= {
            q
            for q in spark_t
            if spark_t[q] > 2.0
            and duck_t.get(q)
            and spark_t[q] / duck_t[q] > 2.0
            and q not in STREAM_EXEC
            and not (q in spark_arrow_t and q in spark_comp_t)
        }
    spark_solo_t: dict[str, float] = {}
    duck_solo_t: dict[str, float] = {}
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import subprocess

    def _run_child(code: str, tag: str, q: str, store: dict[str, float]) -> None:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        line = [l for l in r.stdout.splitlines() if l.startswith("STANDALONE")]
        if line:
            store[q] = float(line[0].split()[1])
            print(f"# {tag} {q}: {store[q]:.3f}s", file=sys.stderr)
        else:
            print(f"# {tag} {q}: FAILED\n{r.stderr[-1500:]}", file=sys.stderr)

    for q in sorted(standalone_sel & set(spark_t)):
        _run_child(
            _STANDALONE_CHILD.format(
                repo=repo_dir, name=q, sf_dir=sf_dir, bucketed=q in BUCKETED_FAMILY
            ),
            "spark-standalone", q, spark_solo_t,
        )
        # Pair every Spark pin with a DuckDB pin under the SAME protocol
        # (fresh process, warmup, min-of-3) — a ratio mixing fresh-process
        # Spark against in-chain DuckDB is systematically Spark-favoring
        # (ADVICE r8). Known-DNF oracles (duck_skip) stay skipped.
        if q not in duck_skip and q in duck_t:
            _run_child(
                _STANDALONE_DUCK_CHILD.format(repo=repo_dir, name=q, sf_dir=sf_dir),
                "duckdb-standalone", q, duck_solo_t,
            )

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
        if q in SQL_REPLAY_ORACLE:
            row["denominator"] = "sql-replayed-xxh64"
        if q in AMORTIZED_GOLD:
            row["denominator"] = "recomputes-gold-in-query"
            row["note"] = (
                "spark reads the K3-materialized gold (one-time build paid "
                "at warmup, amortized across reports — the reference's "
                "generate_report shape); the oracle rebuilds gold as a CTE "
                "every run, so the ratio is spark-favoring by construction"
            )
        # spark-side sink/arrow/compute emit even when the DuckDB twin is
        # absent (DNF/skip) — dropping a measured number wastes a decade-
        # scale execution (ADVICE r7). Membership tests, not truthiness: a
        # legitimately measured 0.0 s must be RECORDED (ADVICE r8); only
        # the ratio needs a nonzero denominator.
        if q in spark_sink_t:
            row["spark_sink"] = spark_sink_t[q]
            if q in duck_sink_t:
                row["duckdb_sink"] = duck_sink_t[q]
                if duck_sink_t[q] > 0:
                    row["ratio_sink"] = round(spark_sink_t[q] / duck_sink_t[q], 3)
        if q in spark_arrow_t:
            row["spark_arrow"] = spark_arrow_t[q]
            if q in duck_arrow_t:
                row["duckdb_arrow"] = duck_arrow_t[q]
                if duck_arrow_t[q] > 0:
                    row["ratio_arrow"] = round(spark_arrow_t[q] / duck_arrow_t[q], 3)
        if q in spark_comp_t:
            row["spark_compute"] = spark_comp_t[q]
            if q in duck_comp_t:
                row["duckdb_compute"] = duck_comp_t[q]
                if duck_comp_t[q] > 0:
                    row["ratio_compute"] = round(spark_comp_t[q] / duck_comp_t[q], 3)
        if q in spark_solo_t:
            row["spark_standalone"] = spark_solo_t[q]
            if q in duck_solo_t:
                # like-for-like pair: both sides fresh-process min-of-3
                row["duckdb_standalone"] = duck_solo_t[q]
                if duck_solo_t[q] > 0:
                    row["ratio_standalone"] = round(spark_solo_t[q] / duck_solo_t[q], 3)
                row["standalone_note"] = (
                    "both engines: fresh process, warmup then min of 3; "
                    "the in-chain numbers carry 40+ queries of "
                    "shared-session aging"
                )
            else:
                # no DuckDB pin (DNF/skip) — the mixed-protocol ratio is
                # machine-visible in the field name (ADVICE r8)
                if duck_t.get(q):
                    row["ratio_standalone_vs_inchain_duck"] = round(
                        spark_solo_t[q] / duck_t[q], 3
                    )
                row["standalone_note"] = (
                    "fresh interpreter+JVM, warmup then min of 3 fresh "
                    "builds; DuckDB side is the in-chain single run"
                )
        out[q] = row
    payload = {"label": label, "sf_dir": sf_dir, "queries": out}
    if bucket_etl is not None:
        payload["bucket_etl_sec"] = bucket_etl
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
