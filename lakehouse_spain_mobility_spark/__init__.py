"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference lakehouse (IsmaelHA/lakehouse-spain-mobility).

Layout:
- ``session``     — SparkSession builder mirroring the reference's engine
                    session setup (reference: dags/ducklake_utils.py:31-141).
- ``sources``     — scan-side connectors (CSV all-varchar, inferred CSV,
                    parquet glob, pandas bridge, shapefile, HTTP probing).
- ``functions``   — scalar/aggregate expression helpers (deterministic
                    decimal-backed stats, geo math, text analysis).
- ``operators``   — composed relational operators (3σ outlier stats,
                    gravity model, long-trip dependency, dedup, similarity).
- ``pipelines``   — medallion bronze→silver→gold pipelines for the
                    mobility / economy / population / geometry domains.
- ``queries``     — the operator inventory as (Spark builder, DuckDB oracle
                    SQL) pairs over the synthetic testdata tables; consumed
                    by ``__spark_entry__.py`` and ``bench.py``.
- ``streaming``   — structured-streaming variants of the incremental loads.
"""

__version__ = "0.1.0"
