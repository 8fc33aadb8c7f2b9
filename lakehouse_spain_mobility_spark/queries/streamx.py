"""Driver-checkable Structured Streaming EXECUTION (§2.10 hard signal).

``tumbling_window`` proves the windowed-aggregation SEMANTICS batch-side;
this query runs the actual streaming engine end to end inside the driver
contract: ``readStream`` over the events parquet → watermark-free
complete-mode tumbling aggregation through the real StateStore →
``availableNow`` trigger → memory sink — and the DuckDB oracle checks the
final materialized state against the batch SQL. A bounded file source
with ``availableNow`` is exactly how Spark replays history into a
streaming pipeline, so equality with the batch aggregation is the
exactly-once replay contract (streaming/incremental.py holds the
continuous forms: watermarks, append mode, foreachBatch upserts).

Engine parity: the aggregation reuses the deterministic fixed-point sum,
so state-merge order (which the streaming engine controls) cannot change
a byte; window starts are emitted as formatted strings (the
tumbling_window timezone convention).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.deterministic import sql_dsum, xdsum
from . import QuerySpec, register
from .tables import ensure_read_convention



def _stream_session(spark: SparkSession) -> SparkSession:
    """Clone the session with streaming-sized state partitioning.

    AQE cannot coalesce streaming shuffles, so every micro-batch commits
    one StateStore per ``spark.sql.shuffle.partitions`` — with the batch
    default (= core count) the replay's wall-clock is dominated by state
    commits over near-empty partitions (guide §2.2: fewer, larger
    partitions; measured r10 same-session: tumbling 1.52→0.78 s, dedup
    1.89→1.07 s at 8 partitions). The partition count is pinned at the
    query's FIRST run from session conf, so the clone (own SQLConf, shared
    SparkContext) scopes the setting to this one stream without touching
    the session's batch plans. ``SPARK_GRAFT_STREAM_SHUFFLE`` overrides
    for real deployments where state volume, not core count, should size
    it (state here is a few hundred rows; at production state sizes set
    it to cores or higher).
    """
    import os

    n = int(os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8"))
    clone = spark.newSession()
    clone.conf.set("spark.sql.shuffle.partitions", str(n))
    return clone


def q_stream_tumbling_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    spark = _stream_session(spark)
    ensure_read_convention(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        src = spark.readStream.schema(schema).parquet(path)
    else:
        # FileStreamSource only accepts directories; a single-file table
        # streams from its parent dir with a glob pinned to the one file
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if isinstance(src.schema["ts"].dataType, T.LongType):
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    win = F.window(F.col("ts"), "6 hours")
    agg = src.groupBy(win.alias("w"), F.col("event_type")).agg(
        F.count("*").alias("n_events"), xdsum("value").alias("total_value")
    )
    name = f"stream_tumbling_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return spark.table(name).localCheckpoint(eager=True).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


_SQL = f"""
SELECT strftime(to_timestamp(floor(epoch(ts) / 21600) * 21600), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
"""


register(
    QuerySpec(
        "stream_tumbling_exec",
        q_stream_tumbling_exec,
        _SQL,
        "§2.10-exec",
        False,
        "REAL Structured Streaming run: availableNow replay through the StateStore vs the batch oracle",
    )
)


def q_stream_session_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window aggregation through the REAL streaming engine: the
    merging-session StateStore path (a different state format than the
    tumbling query's fixed windows), availableNow replay, memory sink.
    Oracle: the classic lag/island reconstruction in integer microseconds
    — Spark opens a new session iff the gap to the previous event is
    >= 30 min (session end is exclusive), which is exactly the
    ``diff_us >= gap_us`` island rule."""
    import os

    spark = _stream_session(spark)
    ensure_read_convention(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        src = spark.readStream.schema(schema).parquet(path)
    else:
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if isinstance(src.schema["ts"].dataType, T.LongType):
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    sess = F.session_window(F.col("ts"), "30 minutes")
    agg = src.groupBy(sess.alias("s"), F.col("user_id")).agg(
        F.count("*").alias("n_events"), xdsum("value").alias("total_value")
    )
    name = f"stream_session_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return spark.table(name).localCheckpoint(eager=True).select(
        F.date_format(F.col("s.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("n_events").cast("bigint").alias("n_events"),
        "total_value",
    )


_SESSION_SQL = f"""
WITH lagd AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
grp AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd
)
SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {sql_dsum('value')} AS total_value
FROM grp GROUP BY user_id, sid
"""


register(
    QuerySpec(
        "stream_session_exec",
        q_stream_session_exec,
        _SESSION_SQL,
        "§2.10-exec,W2",
        False,
        "REAL streaming session windows: merging-session StateStore via availableNow vs lag/island batch oracle",
    )
)


def q_stream_dedup_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DEDUPLICATION through the real engine: the events stream
    is unioned with a second reader of the same files (every row now
    arrives exactly twice) and ``dropDuplicates`` on the event key runs
    through the streaming state store under availableNow replay — the
    exactly-once re-delivery contract. The memory sink then rolls up per
    event_type, and the DuckDB oracle aggregates the ORIGINAL events
    table: if even one duplicate leaked through the state store, every
    count and checksum doubles and the hash compare fails.

    Determinism: the duplicate arrivals are byte-identical rows, so
    whichever arrival the state store keeps yields the same output. The
    production form for unbounded streams is the watermarked
    ``dropDuplicatesWithinWatermark`` (streaming/incremental.py:90 —
    bounded state); availableNow replay of a bounded history is the one
    case where infinite-retention dedup state is the right tool.
    """
    import os

    spark = _stream_session(spark)
    ensure_read_convention(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema

    def reader():
        if os.path.isdir(path):
            s = spark.readStream.schema(schema).parquet(path)
        else:
            s = (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "events.parquet")
                .parquet(sf_dir)
            )
        if isinstance(s.schema["ts"].dataType, T.LongType):
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return s

    doubled = reader().union(reader())
    deduped = doubled.dropDuplicates(["event_id"])
    # The rollup runs INSIDE the streaming query (dedup state feeding a
    # streaming aggregation), so the memory sink holds |event_types|
    # rows, never the corpus — sinking the raw post-dedup stream put the
    # whole table on the driver heap and OOM'd at sf10 (the measured
    # failure that motivated this shape). Dedup state itself is one key
    # per event_id; at a real 100 TB replay that state lives in the
    # RocksDB state store provider, not executor heap.
    agg = deduped.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("event_id").cast("bigint").alias("id_checksum"),
        xdsum("value").alias("total_value"),
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return spark.table(name).localCheckpoint(eager=True).select(
        "event_type", "n_events", "id_checksum", "total_value"
    )


_DEDUP_EXEC_SQL = f"""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1
"""


register(
    QuerySpec(
        "stream_dedup_exec",
        q_stream_dedup_exec,
        _DEDUP_EXEC_SQL,
        "§2.10-exec,TD-dedup",
        False,
        "REAL streaming dedup: doubled arrivals through dropDuplicates state, rollup vs single-copy oracle",
    )
)


def q_stream_join_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join through the REAL engine: the click
    stream joins the purchase stream on user_id with a [0, 30 min]
    event-time range — the attribution shape — under availableNow
    replay, append mode, memory sink. Both sides carry 1-hour
    watermarks, which is what BOUNDS the join state on an unbounded
    run: a buffered click can be evicted once the purchase-side
    watermark passes click_ts + 30 min (Spark's state-cleanup condition
    derives from the range predicate). Inner-join emission does not
    WAIT on the watermark, so the bounded availableNow replay emits
    every match even though the final watermark never closes.

    The DuckDB oracle runs the identical interval join batch-side; a
    dropped or duplicated buffered row shifts the match set and fails
    the hash. Sink size is |matches| (pair keys + integer delay), not
    the corpus — measured 23 rows at sf0.01, linear in sf (trap #8f
    sink discipline).
    """
    import os

    spark = _stream_session(spark)
    ensure_read_convention(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema

    def reader():
        if os.path.isdir(path):
            s = spark.readStream.schema(schema).parquet(path)
        else:
            s = (
                spark.readStream.schema(schema)
                .option("pathGlobFilter", "events.parquet")
                .parquet(sf_dir)
            )
        if isinstance(s.schema["ts"].dataType, T.LongType):
            s = s.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # withWatermark requires TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
        # on NTZ); the session tz is UTC and only ts DIFFERENCES leave this
        # query, so the NTZ→LTZ reinterpretation cannot shift any output.
        return s.withColumn("ts", F.col("ts").cast("timestamp"))

    clicks = (
        reader()
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        reader()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts "
            "AND p_ts <= c_ts + INTERVAL 30 MINUTES"
        ),
    )
    out = joined.select(
        F.col("c_user").cast("bigint").alias("user_id"),
        F.col("click_id").cast("bigint").alias("click_id"),
        F.col("purchase_id").cast("bigint").alias("purchase_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("delay_us"),
    )
    name = f"stream_join_{uuid.uuid4().hex[:12]}"
    # A stream-stream join runs FOUR state store instances per shuffle
    # partition, and each pays per-microbatch setup/commit regardless of
    # row count — measured 6.4 s at 32 partitions vs 2.9 s at 8 for the
    # same sf1 replay. r10: the bounded state partitioning now comes from
    # the _stream_session clone (shared with the whole exec family, env-
    # overridable) instead of a set/restore on the caller's conf.
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return spark.table(name).localCheckpoint(eager=True)


_JOIN_EXEC_SQL = """
SELECT CAST(c.user_id AS BIGINT) AS user_id,
       CAST(c.event_id AS BIGINT) AS click_id,
       CAST(p.event_id AS BIGINT) AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


register(
    QuerySpec(
        "stream_join_exec",
        q_stream_join_exec,
        _JOIN_EXEC_SQL,
        "§2.10-exec,J3",
        False,
        "REAL stream-stream interval join (attribution): watermarked range join via availableNow vs batch oracle",
    )
)


def q_stream_stateful_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful operator through the real engine:
    ``applyInPandasWithState`` maintains per-event-type running
    (count, id checksum, value-micro sum) across micro-batches —
    the arbitrary-state API (cf. streaming/stateful.py for the
    continuous form) under availableNow replay, update-mode memory
    sink. Because update mode emits a row per (micro-batch, key), the
    batch query reduces the sink to each key's FINAL state via
    MAX(STRUCT(n, ...)) — n is monotone in batch order, so the max
    struct is the last emission (the trap-#6/#7 unordered-max idiom).

    Determinism: the state is pure integers — value enters as Spark-side
    ``micro()`` (SQL ROUND half-away; NOT pandas/numpy round, which is
    banker's and would diverge from the DuckDB oracle), so state-merge
    and pandas-batch order cannot move a bit. A dropped or re-applied
    micro-batch shifts n/checksum and fails the hash — the exactly-once
    contract for CUSTOM state, complementing stream_dedup_exec's
    built-in dropDuplicates state.
    """
    import os

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.deterministic import micro

    spark = _stream_session(spark)
    ensure_read_convention(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        src = spark.readStream.schema(schema).parquet(path)
    else:
        src = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    feed = src.select(
        "event_type",
        F.col("event_id").cast("long").alias("event_id"),
        micro(F.col("value")).alias("vm"),
    )

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("id_checksum", T.LongType()),
            T.StructField("value_micros", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("ids", T.LongType()),
            T.StructField("vms", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, ids, vms = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            ids += int(pdf["event_id"].sum()) if len(pdf) else 0
            vms += int(pdf["vm"].sum()) if len(pdf) else 0
        state.update((n, ids, vms))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "id_checksum": [ids],
                "value_micros": [vms],
            }
        )

    agg = feed.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stream_stateful_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="stream_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    sink = spark.table(name).localCheckpoint(eager=True)
    final = sink.groupBy("event_type").agg(
        F.max(
            F.struct("n_events", "id_checksum", "value_micros")
        ).alias("s")
    )
    return final.select(
        "event_type",
        F.col("s.n_events").alias("n_events"),
        F.col("s.id_checksum").alias("id_checksum"),
        F.col("s.value_micros").alias("value_micros"),
    )


_STATEFUL_EXEC_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum,
       CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS BIGINT) AS value_micros
FROM events
GROUP BY 1
"""


register(
    QuerySpec(
        "stream_stateful_exec",
        q_stream_stateful_exec,
        _STATEFUL_EXEC_SQL,
        "§2.10-exec,A1",
        False,
        "REAL custom stateful streaming: applyInPandasWithState integer running totals vs batch oracle",
    )
)
