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


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side-effect: registration) and return the
    registry."""
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

    return REGISTRY
