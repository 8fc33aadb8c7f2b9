"""Structured Streaming upgrades of the reference's batch incrementality
(SURVEY §2.10: per-date files + count-check-skip + DELETE+INSERT → the
idiomatic mapping is readStream + foreachBatch with idempotent partition
overwrite; event-time windows replace nothing in the reference but are the
streaming form of the tumbling-window query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import Warehouse

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_windowed_counts(
    spark: SparkSession, input_dir: str, window: str = "6 hours", watermark: str = "1 hour"
) -> DataFrame:
    """readStream → watermarked tumbling-window aggregation. Late data
    beyond the watermark is dropped instead of the reference's
    reprocess-the-date batch pattern."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def run_stream_to_memory(df: DataFrame, query_name: str) -> None:
    """Drive a streaming frame to completion over the currently-available
    files (memory sink; synchronous — for tests/smoke)."""
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def stream_silver_upsert(
    spark: SparkSession, bronze_dir: str, wh: Warehouse, table: str, checkpoint_dir: str
):
    """foreachBatch idempotent loader: every micro-batch is written with
    per-date dynamic partition overwrite — re-delivered files overwrite
    their own partition instead of duplicating (the streaming form of the
    reference's DELETE+INSERT, dags/mitma/silver_mitma.py:108)."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(bronze_dir)

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        silver = batch_df.withColumn("date", F.to_date("ts"))
        if silver.isEmpty():
            return
        wh.replace_partition(table, silver, "date")

    return (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    spark: SparkSession, input_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exactly-once dedup of re-delivered events:
    dropDuplicatesWithinWatermark keys state on event_id and expires it
    once the watermark passes — bounded state, unlike a plain
    dropDuplicates whose key set grows forever. This is the streaming form
    of the reference's count-check-skip re-delivery guard
    (dags/mitma/bronze_mitma.py:38-47)."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def stream_static_enrich(spark: SparkSession, input_dir: str, dim: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch broadcast-joins the static dim
    (re-read per batch, so slowly-changing dims are picked up). The stream
    side never shuffles for the join."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return events.join(F.broadcast(dim), "event_type").select(
        "event_id", "ts", "user_id", "event_type", "type_label", "value"
    )
