"""Streaming (windowed agg, foreachBatch idempotent upsert) and multimodal
(decode/feature/frame-sample plumbing) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_spain_mobility_spark.catalog import Warehouse
from lakehouse_spain_mobility_spark.operators import multimodal as mm
from lakehouse_spain_mobility_spark.queries.tables import load_events
from lakehouse_spain_mobility_spark.streaming import incremental as st

SF = "/root/testdata/sf0.001"


def _stage_events(spark, tmp_path) -> str:
    """Materialize events with µs timestamps (streaming reader can't take
    the raw nanos file)."""
    p = str(tmp_path / "events_staged")
    load_events(spark, SF).write.mode("overwrite").parquet(p)
    return p


def test_stream_windowed_counts_matches_batch(spark, tmp_path):
    staged = _stage_events(spark, tmp_path)
    sdf = st.stream_windowed_counts(spark, staged, window="6 hours")
    st.run_stream_to_memory(sdf, "win_smoke")
    streamed = spark.sql("SELECT * FROM win_smoke")
    batch = (
        spark.read.parquet(staged)
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    assert streamed.count() == batch.count() > 0
    j = streamed.select("window_start", "event_type", "n_events").exceptAll(
        batch.select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    assert j.count() == 0  # streaming result == batch result


def test_foreachbatch_upsert_idempotent(spark, tmp_path):
    staged = _stage_events(spark, tmp_path)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    q = st.stream_silver_upsert(spark, staged, wh, "silver_events", str(tmp_path / "ckpt1"))
    q.awaitTermination()
    n1 = wh.read("silver_events").count()
    # re-deliver everything with a fresh checkpoint → partitions overwritten, not duplicated
    q2 = st.stream_silver_upsert(spark, staged, wh, "silver_events", str(tmp_path / "ckpt2"))
    q2.awaitTermination()
    n2 = wh.read("silver_events").count()
    assert n1 == n2 > 0


def test_multimodal_decode_features(spark):
    media = mm.synthetic_media(spark, n=30)
    feats = mm.decode_features(media, n_features=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"])
    # deterministic: same payload → same features
    again = {r["media_id"]: r["features"] for r in mm.decode_features(media, 16).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)


def test_multimodal_frame_sample(spark):
    media = mm.synthetic_media(spark, n=30)
    frames = mm.frame_sample(media, n_frames=4)
    pdf = frames.toPandas()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(pdf) == n_videos * 4
    assert set(pdf["frame_idx"]) == {0, 1, 2, 3}
    assert (pdf["frame_bytes"].map(len) > 0).all()


def test_multimodal_metadata_pruning(spark):
    media = mm.synthetic_media(spark, n=30)
    stats = mm.metadata_stats(media)
    rows = {(r["kind"], r["format"]): r for r in stats.collect()}
    assert ("image", "png") in rows and ("video", "mp4") in rows
    assert rows[("image", "png")]["avg_duration_ms"] is None  # images have no duration
    assert all(r["total_bytes"] > 0 for r in rows.values())


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: per-key state accumulates across batches and
    final totals equal the batch aggregation."""
    from lakehouse_spain_mobility_spark.streaming import stateful as stf

    staged = _stage_events(spark, tmp_path)
    stf.run_stateful_to_memory(spark, staged, "state_smoke")
    out = spark.sql(
        "SELECT event_type, max(n_events) AS n, max(total_value) AS v "
        "FROM state_smoke GROUP BY event_type"
    )
    batch = (
        spark.read.parquet(staged)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    got = {r["event_type"]: (r["n"], round(r["v"], 6)) for r in out.collect()}
    want = {r["event_type"]: (r["n"], round(r["v"], 6)) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_sessionize_matches_native_session_window(spark):
    """The lag+cumsum sessionization (oracle-checkable) must agree with
    Spark's native session_window on per-user session counts."""
    from lakehouse_spain_mobility_spark.queries import load_all

    ours = (
        load_all()["sessionize"].build(spark, SF)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    ev = load_events(spark, SF)
    native = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    diff = ours.exceptAll(native)
    assert diff.count() == 0 and ours.count() > 0


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Re-delivered (duplicated) input files collapse back to the distinct
    event set."""
    staged = _stage_events(spark, tmp_path)
    dup_dir = str(tmp_path / "events_dup")
    ev = spark.read.parquet(staged)
    ev.write.mode("overwrite").parquet(dup_dir)
    ev.write.mode("append").parquet(dup_dir)  # every event delivered twice
    assert spark.read.parquet(dup_dir).count() == 2 * ev.count()

    q = (
        st.stream_dedup(spark, dup_dir)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_smoke")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_smoke").first()
    assert got.n == got.d == ev.count()


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    staged = _stage_events(spark, tmp_path)
    dim = spark.createDataFrame(
        [(t, t.upper()) for t in ["click", "error", "purchase", "signup", "view"]],
        ["event_type", "type_label"],
    )
    q = (
        st.stream_static_enrich(spark, staged, dim)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_smoke")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT * FROM enrich_smoke")
    batch = spark.read.parquet(staged).join(dim, "event_type")
    assert streamed.count() == batch.count() > 0
    assert streamed.filter(F.col("type_label") != F.upper("event_type")).count() == 0


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    """The watermarked stream-stream view→purchase join must produce
    exactly the rows of the batch interval join over the same files
    (availableNow processes everything, so no rows are watermark-dropped)."""
    staged = _stage_events(spark, tmp_path)
    sdf = st.stream_stream_attribution(spark, staged, horizon="2 hours", watermark="10 minutes")
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("attr_stream")
    want = st.batch_attribution(spark.read.parquet(staged), horizon="2 hours")
    key = lambda r: (r["view_user"], r["view_ts"], r["buy_ts"])
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)
    assert got.count() > 0


def test_stream_session_windows_match_batch(spark, tmp_path):
    """Streaming session_window (complete mode over availableNow) must
    reproduce the batch session_window sessions exactly."""
    staged = _stage_events(spark, tmp_path)
    sdf = st.stream_session_windows(spark, staged, gap="30 minutes")
    q = (
        sdf.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("sess_stream")
    ev = spark.read.parquet(staged)
    want = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    key = lambda r: (r["user_id"], r["session_start"])
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)
    assert got.count() > 0


def test_stream_audited_snapshot_publish(spark, tmp_path):
    """The streaming WAP hop publishes a snapshot per micro-batch when
    audits pass, and a poisoned audit never flips the current pointer."""
    from lakehouse_spain_mobility_spark.catalog import (
        Warehouse,
        snapshot_read,
        snapshot_versions,
    )

    staged = _stage_events(spark, tmp_path)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ok_audit = lambda df: (df.count() > 0, "empty summary")
    q = st.stream_audited_snapshots(
        spark, staged, wh, "event_summary", str(tmp_path / "ck1"), [ok_audit]
    )
    q.awaitTermination(120)
    assert snapshot_versions(wh, "event_summary") == [0]
    assert snapshot_read(wh, "event_summary").count() == 5  # 5 event types

    bad_audit = lambda df: (False, "poisoned")
    q2 = st.stream_audited_snapshots(
        spark, staged, wh, "event_summary", str(tmp_path / "ck2"), [bad_audit]
    )
    try:
        q2.awaitTermination(120)
        raised = False
    except Exception:
        raised = True
    assert raised
    assert snapshot_read(wh, "event_summary").count() == 5  # still v0


def test_stream_tumbling_exec_equals_batch_form(spark):
    """§2.10 replay contract: the REAL streaming run (availableNow through
    the StateStore, memory sink) must reproduce the batch tumbling
    aggregation byte for byte — the deterministic fixed-point sum makes
    state-merge order irrelevant."""
    from lakehouse_spain_mobility_spark.queries import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    stream = sorted(map(tuple, reg["stream_tumbling_exec"].build(spark, sf).collect()))
    batch = sorted(map(tuple, reg["tumbling_window"].build(spark, sf).collect()))
    assert stream == batch and len(stream) > 0


def test_stream_dedup_exec_collapses_doubled_arrivals(spark):
    """§2.10 dedup contract: the doubled stream (every event delivered
    twice) must collapse through dropDuplicates state to EXACTLY the
    single-copy batch aggregate — counts and id checksums would double if
    one duplicate leaked through the state store."""
    from pyspark.sql import functions as F

    from lakehouse_spain_mobility_spark.queries import load_all
    from lakehouse_spain_mobility_spark.queries.tables import load

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r.asDict() for r in
           reg["stream_dedup_exec"].build(spark, sf).collect()}
    ev = load(spark, sf, "events")
    want = {r["event_type"]: r.asDict() for r in
            ev.groupBy("event_type").agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
            ).collect()}
    assert set(got) == set(want) and len(got) > 0
    for k, w in want.items():
        assert got[k]["n_events"] == w["n_events"]
        assert got[k]["id_checksum"] == w["id_checksum"]
