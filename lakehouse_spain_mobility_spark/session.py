"""SparkSession construction.

Mirrors the engine-session bootstrap of the reference
(``dags/ducklake_utils.py:31-141``: thread count, memory budget, temp/spill
dir, insertion-order relaxation, S3 tuning) re-expressed as Spark conf.

Design notes for scale (100 TB / 1000-executor target):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting.
- shuffle.partitions defaults to cores locally; on a real cluster AQE's
  ``advisoryPartitionSizeInBytes`` governs, so the static number only
  seeds the initial plan.
- Arrow enabled so every pandas-UDF boundary is vectorized.
- Session timezone pinned UTC so timestamp semantics are portable and
  match columnar engines (DuckDB oracle) bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "lakehouse-spain-mobility-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession.

    Parallelism mirrors the reference's ``SET threads = cpu_count``
    (dags/ducklake_utils.py:52-58); spill/temp management is delegated to
    Spark (the reference hand-configures ``temp_directory`` /
    ``max_temp_directory_size``, dags/ducklake_utils.py:28,65).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Match DuckDB's NULL (not NaN) for 1-row STDDEV_SAMP (SURVEY §7.3).
        .config("spark.sql.legacy.statisticalAggregate", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
