"""Storage / catalog-surface queries: the K1-K6 update patterns, MERGE
and snapshot time travel exercised end-to-end through a real parquet
warehouse, then verified against a pure-SQL DuckDB oracle that computes
the equivalent FINAL state directly from the source tables.

Reference parity: the reference's idempotent load patterns are Airflow
tasks issuing DuckLake DDL/DML (CREATE TABLE IF NOT EXISTS /
INSERT INTO ... SELECT / CREATE OR REPLACE / partition-scoped
DELETE+INSERT / UPDATE ... SET ... WHERE — dags/mitma/bronze_mitma.py:7-47,
dags/mitma/silver_mitma.py:108-140, dags/mitma/gold_mitma.py:103-107).
Here each query drives the Spark-side ``Warehouse`` (catalog.py) through
the same sequence against a throwaway temp warehouse, reads the final
table back FROM DISK (so the parquet round-trip, partition layout and
dynamic-partition-overwrite semantics are all on the hook), aggregates to
a small deterministic summary, pins it with an eager localCheckpoint, and
deletes the warehouse — the result survives while nothing leaks.

Output columns are str/int only (no floats): these are the engine-portable
kinds the driver's hash compare cannot normalize apart.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import (
    Warehouse,
    snapshot_read,
    snapshot_replace,
    snapshot_rollback,
)
from . import QuerySpec, register
from .tables import load


def _pinned(df: DataFrame) -> DataFrame:
    """Materialize a (small) result independent of its source files, so the
    temp warehouse can be deleted before the caller collects."""
    return df.localCheckpoint(eager=True)


# --- K1/K2/K3/K5: create-or-replace, append, update-where ------------------
def q_storage_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE OR REPLACE AS (K3) -> INSERT INTO ... SELECT append (K2) ->
    UPDATE ... SET ... WHERE (K5) -> read-back aggregate. The oracle
    replays the same final state with one SELECT."""
    root = tempfile.mkdtemp(prefix="wh_lifecycle_")
    try:
        wh = Warehouse(spark, root)
        cust = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
        )
        wh.create_or_replace("cust", cust.filter(F.col("c_mktsegment") == "BUILDING"))
        wh.append("cust", cust.filter(F.col("c_mktsegment") == "AUTOMOBILE"))
        wh.update_where(
            "cust", F.col("c_acctbal") < 0, {"c_mktsegment": F.lit("DELINQUENT")}
        )
        out = (
            wh.read("cust")
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("c_custkey").alias("key_sum"),
                F.sum("c_nationkey").cast("bigint").alias("nation_sum"),
            )
        )
        return _pinned(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_LIFECYCLE_SQL = """
WITH loaded AS (
    SELECT c_custkey, c_nationkey, c_acctbal,
           CASE WHEN c_acctbal < 0 THEN 'DELINQUENT' ELSE c_mktsegment END
               AS c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
       CAST(SUM(c_nationkey) AS BIGINT) AS nation_sum
FROM loaded
GROUP BY c_mktsegment
"""


# --- K4: partition-scoped DELETE+INSERT ------------------------------------
def q_storage_partition_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite = the reference's per-key DELETE+INSERT
    unit (dags/mitma/silver_mitma.py:108-140): rewrite ONE o_orderpriority
    partition, leave the others byte-identical, and verify the merged
    directory read-back."""
    root = tempfile.mkdtemp(prefix="wh_partrepl_")
    try:
        wh = Warehouse(spark, root)
        orders = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
        )
        wh.create_or_replace("ord", orders, partition_by=["o_orderpriority"])
        urgent_fixed = orders.filter(
            (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_custkey") % 2 == 0)
        )
        wh.replace_partition("ord", urgent_fixed, "o_orderpriority")
        out = (
            wh.read("ord")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("o_orderkey").alias("key_sum"),
                F.countDistinct("o_orderstatus").alias("n_statuses"),
            )
        )
        return _pinned(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_PART_REPLACE_SQL = """
WITH final AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderpriority <> '1-URGENT'
       OR (o_custkey % 2 = 0)
)
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
FROM final
GROUP BY o_orderpriority
"""


# --- MERGE INTO (upsert) ----------------------------------------------------
def q_storage_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE emulation (anti-join + union, catalog.py:113): updates replace
    matched keys, unmatched keys insert; verified by a per-nation rollup of
    the merged table."""
    root = tempfile.mkdtemp(prefix="wh_merge_")
    try:
        wh = Warehouse(spark, root)
        cust = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_mktsegment"
        )
        wh.create_or_replace("cust", cust)
        updates = (
            cust.filter(F.col("c_custkey") % 5 == 0)
            .withColumn("c_nationkey", F.col("c_nationkey") + F.lit(100))
        ).unionByName(
            cust.filter(F.col("c_custkey") % 7 == 0).select(
                (F.col("c_custkey") + F.lit(1000000)).alias("c_custkey"),
                "c_nationkey",
                F.lit("INSERTED").alias("c_mktsegment"),
            )
        )
        wh.merge_upsert("cust", updates, keys=["c_custkey"])
        out = (
            wh.read("cust")
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("c_custkey").alias("key_sum"),
                F.sum("c_nationkey").cast("bigint").alias("nation_sum"),
            )
        )
        return _pinned(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_MERGE_SQL = """
WITH kept AS (
    SELECT c_custkey, c_nationkey, c_mktsegment
    FROM customer
    WHERE c_custkey % 5 <> 0
), upserts AS (
    SELECT c_custkey, c_nationkey + 100 AS c_nationkey, c_mktsegment
    FROM customer WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey + 1000000 AS c_custkey, c_nationkey,
           'INSERTED' AS c_mktsegment
    FROM customer WHERE c_custkey % 7 = 0
), final AS (
    SELECT * FROM kept UNION ALL SELECT * FROM upserts
)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
       CAST(SUM(c_nationkey) AS BIGINT) AS nation_sum
FROM final
GROUP BY c_mktsegment
"""


# --- Snapshots / time travel ------------------------------------------------
def q_storage_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckLake-style snapshot versioning (catalog.py:199-235): publish v0,
    publish v1, time-travel-read both, roll the current pointer back to v0
    — four reads whose contents the oracle derives straight from source."""
    root = tempfile.mkdtemp(prefix="wh_snap_")
    try:
        wh = Warehouse(spark, root)
        cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        snapshot_replace(wh, "cust", cust.filter(F.col("c_custkey") % 2 == 0))
        snapshot_replace(wh, "cust", cust.filter(F.col("c_custkey") % 3 == 0))

        def summarize(label: str, df: DataFrame) -> DataFrame:
            return df.agg(
                F.lit(label).alias("snapshot"),
                F.count("*").alias("n_rows"),
                F.sum("c_custkey").alias("key_sum"),
            )

        v0 = summarize("v0", snapshot_read(wh, "cust", 0))
        v1 = summarize("v1", snapshot_read(wh, "cust", 1))
        head = summarize("head_before_rollback", snapshot_read(wh, "cust"))
        snapshot_rollback(wh, "cust", 0)
        rolled = summarize("head_after_rollback", snapshot_read(wh, "cust"))
        out = v0.unionByName(v1).unionByName(head).unionByName(rolled)
        return _pinned(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SNAPSHOT_SQL = """
WITH v0 AS (
    SELECT COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey % 2 = 0
), v1 AS (
    SELECT COUNT(*) AS n_rows, CAST(SUM(c_custkey) AS BIGINT) AS key_sum
    FROM customer WHERE c_custkey % 3 = 0
)
SELECT 'v0' AS snapshot, n_rows, key_sum FROM v0
UNION ALL
SELECT 'v1' AS snapshot, n_rows, key_sum FROM v1
UNION ALL
SELECT 'head_before_rollback' AS snapshot, n_rows, key_sum FROM v1
UNION ALL
SELECT 'head_after_rollback' AS snapshot, n_rows, key_sum FROM v0
"""


register(
    QuerySpec(
        "storage_lifecycle",
        q_storage_lifecycle,
        _LIFECYCLE_SQL,
        survey="K1,K2,K3,K5",
        description="create-or-replace + append + update-where via parquet warehouse",
    )
)
register(
    QuerySpec(
        "storage_partition_replace",
        q_storage_partition_replace,
        _PART_REPLACE_SQL,
        survey="K4",
        description="dynamic partition overwrite = partition-scoped DELETE+INSERT",
    )
)
register(
    QuerySpec(
        "storage_merge_upsert",
        q_storage_merge_upsert,
        _MERGE_SQL,
        survey="K2,K5",
        description="MERGE INTO emulation (anti-join + union) with insert+update mix",
    )
)
register(
    QuerySpec(
        "storage_snapshot",
        q_storage_snapshot,
        _SNAPSHOT_SQL,
        survey="K3,U5",
        description="snapshot publish / time-travel read / pointer rollback",
    )
)
