"""The operator-inventory query registry.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB oracle SQL string over the same parquet tables,
plus tags back to SURVEY §2 rows. ``__spark_entry__.py`` and ``bench.py``
are thin views over this registry.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → rows-only check (non-SQL-expressible)
    survey: str = ""  # SURVEY §2 operator ids covered, e.g. "A1,A2,J1,P7"
    bench: bool = False  # include in bench.py headline set
    description: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


# The external driver correctness-checks the FIRST 50 registry entries in
# order. This window is therefore a curated covering set: every SURVEY §2
# operator id, every TPC-H analog, every battery, and every LLM-pipeline
# operator has a hard driver signal through exactly one window entry —
# either a single query or a canonicalized suite bundle (queries/suites.py).
# Everything past the window stays registered for pytest/bench/diagnosis.
DRIVER_WINDOW: list[str] = [
    # §2 anchor singles (pass = the operator row in COVERAGE.md is green)
    "typical_day", "report_rollup", "sessionize", "typed_projection",
    "filter_battery", "window_topk", "tumbling_window",
    "gravity_data", "gravity_analysis",
    # canonicalized bundles (see queries/suites.py for membership)
    "relational_suite", "spatial_suite", "storage_suite",
    # function batteries
    "scalar_battery", "datetime_battery", "window_battery", "set_ops",
    "array_battery",
    # TPC-H analogs (each needs its own green row)
    "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7",
    "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q14",
    "tpch_q15", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q21", "tpch_q22",
    # LLM-data-pipeline families
    "mlprep_suite", "dedup_suite", "text_suite", "similarity_suite",
    "multimodal_features",
    # the 8 round-1 hash-mismatch queries, individually re-verified
    "decontamination", "repetition_quality", "pii_scrub", "chunk_dedup",
    "ann_recall", "table_profile", "event_funnel",
    # remaining analytic surface + the round-2 operator bundle
    # (union_distinct moved into relational_suite to free this slot)
    "olap_suite", "analytic_window_suite", "round2_suite",
]


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registration) and return the
    registry, reordered so DRIVER_WINDOW comes first."""
    from . import core  # noqa: F401
    from . import relational  # noqa: F401
    from . import gravity  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import extra  # noqa: F401
    from . import battery  # noqa: F401
    from . import tpch  # noqa: F401
    from . import mlprep  # noqa: F401
    from . import advanced  # noqa: F401
    from . import storage  # noqa: F401
    from . import timeseries  # noqa: F401
    from . import bloom  # noqa: F401
    from . import search  # noqa: F401
    from . import graphrank  # noqa: F401
    from . import scd  # noqa: F401
    from . import pq  # noqa: F401
    from . import spatialx  # noqa: F401
    from . import lm  # noqa: F401
    from . import funnel  # noqa: F401
    from . import curation  # noqa: F401
    from . import nested  # noqa: F401
    from . import webcur  # noqa: F401
    from . import selection  # noqa: F401
    from . import increment  # noqa: F401
    from . import streamx  # noqa: F401
    from . import sketches  # noqa: F401
    from . import setjoin  # noqa: F401
    from . import qsketch  # noqa: F401
    from . import suites  # noqa: F401  (must come after all member modules)

    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    for n, spec in REGISTRY.items():
        if n not in ordered:
            ordered[n] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
