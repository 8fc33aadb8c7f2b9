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


def attribution_join(views: DataFrame, purchases: DataFrame, horizon: str = "2 hours") -> DataFrame:
    """The view→purchase attribution join, shared by the streaming and
    batch forms so the parity test compares one plan expressed two ways:
    same user, purchase within ``horizon`` after the view."""
    return views.join(
        purchases,
        F.expr(
            f"""view_user = buy_user
                AND buy_ts >= view_ts
                AND buy_ts <= view_ts + INTERVAL {horizon}"""
        ),
    ).select("view_user", "view_ts", "buy_ts", "buy_value")


def _split_views_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("view_user"), F.col("ts").alias("view_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("buy_user"),
        F.col("ts").alias("buy_ts"),
        F.col("value").alias("buy_value"),
    )
    return views, purchases


def stream_stream_attribution(
    spark: SparkSession, input_dir: str, horizon: str = "2 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream self-join with event-time range condition: views
    joined to purchases by the same user within ``horizon``. Both sides
    carry watermarks and the join condition bounds buy_ts relative to
    view_ts, so Spark can expire view-side state once
    ``watermark + horizon`` passes — bounded state at any stream length,
    the property that matters at production scale. Reference analog: none
    (its incrementality is per-date batch reprocessing); this is the
    §2.10 idiomatic upgrade of correlating two event feeds."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    views, purchases = _split_views_purchases(events)
    return attribution_join(
        views.withWatermark("view_ts", watermark),
        purchases.withWatermark("buy_ts", watermark),
        horizon,
    )


def batch_attribution(events: DataFrame, horizon: str = "2 hours") -> DataFrame:
    """Batch form of stream_stream_attribution over a static events frame
    (the parity oracle for the streaming test)."""
    views, purchases = _split_views_purchases(events)
    return attribution_join(views, purchases, horizon)


def stream_session_windows(
    spark: SparkSession, input_dir: str, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming sessionization: session_window merges events into
    per-user sessions that close once ``gap`` passes without activity;
    the watermark lets Spark finalize (and emit, in append mode) sessions
    whose close time has passed, keeping state bounded. Streaming form of
    the batch `sessionize` query (which cross-validates the lag+cumsum
    formulation against this same native operator)."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_audited_snapshots(
    spark: SparkSession, input_dir: str, wh: Warehouse, table: str, checkpoint_dir: str, audits: list
):
    """Streaming write-audit-publish: every micro-batch aggregates the
    events seen so far into a fresh snapshot version that only becomes
    current if the audits pass (catalog.snapshot_publish_audited) — the
    streaming form of the reference's QA-test-between-hops pattern
    (dags/*/test_*.py run as DAG tasks). A failing batch raises inside
    foreachBatch, stopping the query instead of publishing bad data."""
    from ..catalog import snapshot_publish_audited

    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)

    def publish(batch_df: DataFrame, epoch_id: int) -> None:
        summary = batch_df.groupBy("event_type").agg(
            F.count("*").alias("n_events"), F.sum("value").alias("total_value")
        )
        snapshot_publish_audited(wh, table, summary, audits)

    return (
        events.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
