"""Suite queries: driver-checkable bundles of registry queries.

The external driver correctness-checks a bounded window of ``queries()``
entries. A suite packs the full result of N member queries into ONE
hash-comparable entry: every member's result is canonicalized to
``(part, row_str)`` — ``part`` is the member name, ``row_str`` joins the
member's columns (sorted by name) canonicalized to engine-portable strings
— and the suite is the UNION ALL of the members. The DuckDB oracle applies
the identical canonicalization in SQL, so a suite row can only match if the
member query matches, column for column, row for row.

Canonical forms (the driver-portable subset proven by round-1 results +
``test_oracle_outputs_are_driver_portable``):

- ``str``  — as-is;
- ``int``  — CAST AS VARCHAR (BIGINT text is identical in both engines);
- ``dbl``  — CAST(ROUND(x*1e6) AS BIGINT) micro-units then VARCHAR: both
  engines round the same exact binary double, integers cannot diverge;
- ``bool`` — via INT (TRUE/true spelling differs between engines);
- ``date`` — CAST AS VARCHAR (ISO '2020-01-01' in both);
- NULL     — COALESCE to a sentinel AFTER the casts.

Member kinds come from the generated ``_suite_schemas.py`` (DuckDB-derived
by ``_gen_schemas.py``, test-pinned) so the SQL twin needs no runtime
introspection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import REGISTRY, QuerySpec, register

# Member modules must be registered before the suite definitions below run
# (idempotent: Python caches modules, so load_all() re-importing is free).
from . import core  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import gravity  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import extra  # noqa: F401,E402
from . import battery  # noqa: F401,E402
from . import tpch  # noqa: F401,E402
from . import mlprep  # noqa: F401,E402
from . import advanced  # noqa: F401,E402
from . import storage  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
from . import bloom  # noqa: F401,E402
from . import search  # noqa: F401,E402
from . import graphrank  # noqa: F401,E402
from . import scd  # noqa: F401,E402
from . import pq  # noqa: F401,E402
from . import spatialx  # noqa: F401,E402
from . import lm  # noqa: F401,E402
from . import funnel  # noqa: F401,E402
from . import curation  # noqa: F401,E402
from . import nested  # noqa: F401,E402
from . import qsketch  # noqa: F401,E402
from . import webcur  # noqa: F401,E402
from . import selection  # noqa: F401,E402
from . import increment  # noqa: F401,E402
from . import streamx  # noqa: F401,E402
from . import sketches  # noqa: F401,E402
from . import setjoin  # noqa: F401,E402
from ._suite_schemas import SCHEMAS

_SEP = "|"
_NULL = "<null>"

_SPARK_KIND = {
    "string": "str",
    "bigint": "int",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "double": "dbl",
    "float": "dbl",
    "boolean": "bool",
    "date": "date",
}


def spark_canonical(df: DataFrame, part: str) -> DataFrame:
    """Canonicalize a member result to (part, row_str); asserts the live
    Spark schema agrees with the pinned oracle schema."""
    pinned = dict(SCHEMAS[part])
    live = {f.name: _SPARK_KIND.get(f.dataType.simpleString(), f.dataType.simpleString())
            for f in df.schema.fields}
    if live != pinned:
        raise AssertionError(
            f"suite member {part}: schema drift spark={sorted(live.items())} "
            f"pinned={sorted(pinned.items())} — regenerate _suite_schemas.py"
        )
    exprs = []
    for name in sorted(pinned):
        c = F.col(name)
        kind = pinned[name]
        if kind == "dbl":
            c = F.round(c * F.lit(1000000.0)).cast("bigint")
        elif kind == "bool":
            c = c.cast("int")
        exprs.append(F.coalesce(c.cast("string"), F.lit(_NULL)))
    return df.select(
        F.lit(part).alias("part"), F.concat_ws(_SEP, *exprs).alias("row_str")
    )


def _sql_canonical_expr(name: str, kind: str) -> str:
    if kind == "dbl":
        inner = f"CAST(CAST(ROUND(({name}) * 1000000.0) AS BIGINT) AS VARCHAR)"
    elif kind == "bool":
        inner = f"CAST(CAST({name} AS INTEGER) AS VARCHAR)"
    else:
        inner = f"CAST({name} AS VARCHAR)"
    return f"COALESCE({inner}, '{_NULL}')"


def sql_canonical(part: str) -> str:
    """The DuckDB twin: wrap the member's oracle SQL into (part, row_str)."""
    oracle = REGISTRY[part].oracle
    exprs = ", ".join(
        _sql_canonical_expr(name, kind) for name, kind in sorted(SCHEMAS[part])
    )
    return (
        f"SELECT '{part}' AS part, concat_ws('{_SEP}', {exprs}) AS row_str\n"
        f"FROM (\n{oracle}\n) AS _{part}"
    )


def make_suite(name: str, members: list[str], survey: str, description: str) -> None:
    for m in members:
        if m not in REGISTRY:
            raise ValueError(f"suite {name}: unknown member {m}")
        if REGISTRY[m].oracle is None:
            raise ValueError(f"suite {name}: member {m} has no oracle")

    def build(spark: SparkSession, sf_dir: str, _members=tuple(members)) -> DataFrame:
        out = None
        for m in _members:
            part = spark_canonical(REGISTRY[m].build(spark, sf_dir), m)
            out = part if out is None else out.unionByName(part)
        return out

    oracle = "\nUNION ALL\n".join(sql_canonical(m) for m in members)
    register(QuerySpec(name, build, oracle, survey, False, description))


# --- Suite definitions -------------------------------------------------------
# Membership is the driver-window covering set: every SURVEY §2 operator id
# and every LLM-pipeline operator keeps a hard correctness signal through
# exactly one window entry (single query or suite).

SUITES: dict[str, list[str]] = {
    # P6,P8,P12,J2,J4,J5,J6,A3,A6,A7,A8 relational battery
    "relational_suite": [
        "membership_in", "suffix_expr_groupby", "distinct_enumeration",
        "multiway_left_join", "disjunctive_join", "semi_join",
        "null_aware_left_join", "conditional_agg", "dup_key_qa",
        "union_distinct",
    ],
    # P10,A9 spatial predicates + spatial aggregates
    "spatial_suite": ["bbox_extract", "centroid_fallback"],
    # K1-K6 catalog update patterns, MERGE, snapshot time travel
    "storage_suite": [
        "storage_lifecycle", "storage_partition_replace",
        "storage_merge_upsert", "storage_snapshot",
    ],
    # training-data prep (SURVEY beyond-reference §TD)
    "mlprep_suite": [
        "sequence_packing", "train_test_split", "stratified_sample",
        "quantize_int8", "tfidf_terms", "kmeans_clusters",
    ],
    # the dedup family end to end
    "dedup_suite": [
        "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_simhash", "dedup_clusters", "dedup_pipeline",
        "dedup_edit_distance",
    ],
    # text analysis / fingerprinting / chunking
    "text_suite": [
        "token_stats", "lang_id", "quality_scores", "doc_winnowing",
        "heavy_hitters", "json_props_rollup", "doc_chunking",
    ],
    # embedding similarity / ANN
    "similarity_suite": [
        "knn_bruteforce", "ann_lsh", "ann_ivf", "embedding_topk_pairs",
        "label_centroids", "embedding_dup_clusters",
    ],
    # OLAP shapes: rollup/cube/grouping-sets/pivot/percentiles/approx/stats
    "olap_suite": [
        "gravity_ranking", "long_trip_dependency", "cohort_retention",
        "pivot_daily", "unpivot_metrics", "rollup_grouping", "grouping_sets",
        "cube_agg", "percentile_summary", "approx_quantile",
        "approx_distinct", "corr_battery", "argmax_battery",
    ],
    # round-2 additions: time-series, retrieval, graph, SCD2, PQ, LM
    # scoring, recall contracts, and the partsupp-surrogate TPC-H analogs
    "round2_suite": [
        "gap_fill_interpolate", "bloom_decontamination", "bm25_search",
        "pagerank_nations", "scd2_history", "pq_adc_search",
        "perplexity_filter", "dsir_weights", "minhash_recall",
        "tpch_q2", "tpch_q11", "tpch_q16", "tpch_q20", "curation_funnel",
        # round-3 fold-in (VERDICT r2 "Next round" #1 and #7): the three
        # post-freeze operators plus the ST_Transform driver signal
        "multimodal_frames", "triangle_count", "dedup_containment",
        "spatial_transform",
        # round-3 curation additions (queries/curation.py, queries/nested.py)
        "substring_span_dedup", "temperature_mix", "diversity_prune",
        "vocab_growth", "quality_logreg", "nested_types_battery",
        "window_frames_battery",
        # round-3b web-curation additions (queries/webcur.py)
        "line_dedup", "hamming_ann", "pmi_bigrams", "snapshot_diff",
        # round-3c selection additions (queries/selection.py)
        "cluster_representatives", "shard_manifest",
        # round-4 fold-in (VERDICT r3 #4): the J7 dissolve driver signal
        "spatial_dissolve", "incremental_dedup", "zorder_cluster", "maxsim_rerank", "bitext_margin", "bpe_merges", "stream_tumbling_exec",
        # round-4b sketch/set-join/fusion additions (queries/sketches.py,
        # queries/setjoin.py)
        "hll_distinct", "cms_heavy_hitters", "rrf_fusion", "prefix_filter_join",
        "kmv_distinct", "kn_bigram_lm", "kmv_jaccard", "entropy_diversity",
        "weighted_sample", "stream_session_exec", "source_quota_cap",
        "stream_dedup_exec", "curriculum_order", "ivm_delta_agg",
        "k_anonymity_audit",
        # round-4d additions: privacy/planner/mining/mixing/streaming/IR
        "l_diversity_audit", "join_size_estimate", "frequent_itemsets",
        "unimax_mix", "stream_join_exec", "inverted_index",
        "stream_stateful_exec", "boilerplate_removal",
        "python_datasource_scan",
        # round-5 fold-in (VERDICT r4 #2): the candidate-bounded bitext path
        "bitext_margin_lsh",
        # round-6 fold-in (VERDICT r5 #2, #6): dedup-before-mine composition
        # + the native-SQL shoelace dissolve
        "bitext_margin_lsh_dedup", "spatial_dissolve_native",
        # round-9 fold-in (VERDICT r8 #2): the xxhash64 HLL twin, whose
        # oracle recomputes Spark's exact XXH64 in SQL (functions/xxh64_sql)
        "hll_distinct_x64",
        # round-9 additions: the privacy-audit triple's third member and
        # the web-curation URL-dedup front door
        "t_closeness_audit", "url_canonicalize",
        # round-10 fold-in (VERDICT r9 #1, #7): the read-from-gold report
        # form + the mergeable quantile sketch's accuracy contract
        "report_rollup_gold", "kll_quantile_sketch",
    ],
    # time-windowed analytics and specialty joins
    "analytic_window_suite": [
        "range_join", "asof_join", "crossmodal_join", "rolling_time_window",
        "sliding_window", "set_ops_all", "explode_positional",
        "typical_day_nofilter", "pandas_dim_join",
    ],
}

_DESCR = {
    "relational_suite": "Canonicalized bundle: the 9 small relational operator checks",
    "spatial_suite": "Canonicalized bundle: spatial predicate + centroid queries",
    "storage_suite": "Canonicalized bundle: K1-K6 catalog ops + MERGE + snapshots",
    "mlprep_suite": "Canonicalized bundle: the training-data prep (mlprep) set",
    "dedup_suite": "Canonicalized bundle: the full dedup family",
    "text_suite": "Canonicalized bundle: text analysis + fingerprint + chunking",
    "similarity_suite": "Canonicalized bundle: embedding similarity / ANN set",
    "olap_suite": "Canonicalized bundle: OLAP rollup/pivot/percentile/stats set",
    "round2_suite": "Canonicalized bundle: round-2/3/4 operators (ts/retrieval/graph/SCD2/PQ/LM + Q2/Q11/Q16/Q20 + frames/triangles/containment/ST_Transform/dissolve + curation: substring-spans/temperature-mix/diversity-prune/vocab-growth + line-dedup/hamming-ANN/PMI)",
    "analytic_window_suite": "Canonicalized bundle: time-window + specialty joins",
}

_SURVEY = {
    "relational_suite": "P6,P8,P12,J2,J4,J5,J6,A3,A6,A7,A8",
    "spatial_suite": "P10,A9",
    "storage_suite": "K1,K2,K3,K4,K5,K6",
    "mlprep_suite": "TD-mlprep",
    "dedup_suite": "TD-dedup",
    "text_suite": "TXT",
    "similarity_suite": "TD-ann",
    "olap_suite": "A4,W-olap",
    "round2_suite": "TS-gapfill,BLOOM,TXT-bm25,GRAPH-pagerank,K-scd2,ANN-pq,TXT-ppl,TXT-dsir,DD-recall,MM-frames,GRAPH-tri,DD-containment,F-geo,J7,TD-dedup,TD-mix,TD-prune,TXT-vocab,TXT-clf,F-nested,TD-linededup,TD-ann,TXT-pmi,TD-cdc,TD-reps,TD-shard",
    "analytic_window_suite": "W,S5,U",
}

for _name, _members in SUITES.items():
    make_suite(_name, _members, _SURVEY[_name], _DESCR[_name])


