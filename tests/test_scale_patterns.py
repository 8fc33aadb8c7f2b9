"""Scale-pattern tests: bucketed co-located joins (no shuffle), salted
aggregation (bit-identical to unsalted), AQE skew handling config."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_spain_mobility_spark.operators.skew import salted_aggregate, unsalted_aggregate
from lakehouse_spain_mobility_spark.plans import inspect as pi
from lakehouse_spain_mobility_spark.queries.tables import load

from conftest import SF_DIR_ORACLE


def test_salted_aggregate_bit_identical(spark):
    """Salting spreads hot keys over reducers; decimal associativity means
    the merged result is byte-equal to the single-phase aggregation."""
    li = load(spark, SF_DIR_ORACLE, "lineitem")
    a = salted_aggregate(li, ["l_returnflag", "l_linestatus"], "l_extendedprice", n_salts=8)
    b = unsalted_aggregate(li, ["l_returnflag", "l_linestatus"], "l_extendedprice")
    rows_a = {tuple(r[:2]): (r["total"], r["n_rows"]) for r in a.collect()}
    rows_b = {tuple(r[:2]): (r["total"], r["n_rows"]) for r in b.collect()}
    assert rows_a == rows_b and len(rows_a) == 6


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """bucketBy co-location: a join between two tables bucketed on the join
    key plans without any Exchange — the 100 TB fact-fact join strategy."""
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    li = load(spark, SF_DIR_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, SF_DIR_ORACLE, "orders").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "b_lineitem"
    )
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "b_orders"
    )
    bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
    joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
    # disable broadcast so the co-located sort-merge path is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n_shuffles = pi.count_shuffles(joined)
        assert n_shuffles == 0, pi.executed_plan(joined)
        assert joined.count() == 60000  # sf0.01 lineitem rows, all matched
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_aqe_skew_join_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_clustered_write_layout(spark, tmp_path):
    """create_or_replace_clustered range-partitions and sorts by the
    cluster keys — each output file covers a narrow key range, so parquet
    min/max stats can prune scans on those columns."""
    from lakehouse_spain_mobility_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    li = load(spark, SF_DIR_ORACLE, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    )
    wh.create_or_replace_clustered("clustered", li, ["l_returnflag", "l_linestatus"], n_files=4)
    back = wh.read("clustered")
    assert back.count() == li.count()
    # per input file (= cluster) the key range must be narrow: every file
    # holds at most 2 of the 6 (returnflag, linestatus) combos
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.countDistinct("l_returnflag", "l_linestatus").alias("combos"))
    )
    assert per_file.agg(F.max("combos")).first()[0] <= 2


def test_merge_upsert(spark, tmp_path):
    """MERGE emulation: matched keys replaced, unmatched appended,
    untouched rows preserved."""
    from lakehouse_spain_mobility_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh_merge"))
    base = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
                                 "id int, tag string, v double")
    wh.merge_upsert("t", base, ["id"])
    updates = spark.createDataFrame([(2, "b2", 21.0), (4, "d", 40.0)],
                                    "id int, tag string, v double")
    wh.merge_upsert("t", updates, ["id"])
    rows = {r["id"]: (r["tag"], r["v"]) for r in wh.read("t").collect()}
    assert rows == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    # idempotent re-merge
    wh.merge_upsert("t", updates, ["id"])
    assert wh.read("t").count() == 4


def test_salted_broadcast_join_same_rows(spark):
    """Salting must not change join semantics: same row multiset as the
    plain equi-join, for a skewed fact (90% one key)."""
    from lakehouse_spain_mobility_spark.operators.skew import salted_broadcast_join

    fact = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("label"))
    got = salted_broadcast_join(fact, dim, "k", n_salts=8)
    want = fact.join(dim, "k")
    key = lambda r: (r["k"], r["v"])
    assert sorted(got.collect(), key=key) == sorted(want.collect(), key=key)


def test_compact_files(spark, tmp_path):
    """64-file table compacts to the row-count-derived file budget with
    identical contents."""
    from lakehouse_spain_mobility_spark.catalog import Warehouse, compact_files

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(0, 5000).select(F.col("id"), (F.col("id") % 7).alias("g"))
    df.repartition(64).write.parquet(wh.path("frag"))
    before, after = compact_files(wh, "frag", target_rows_per_file=2500)
    assert before == 64 and after == 2
    got = sorted(r["id"] for r in wh.read("frag").collect())
    assert got == list(range(5000))


def test_snapshot_time_travel(spark, tmp_path):
    """DuckLake-style snapshots: versions are immutable, the current
    pointer flips atomically, rollback never rewrites data."""
    from lakehouse_spain_mobility_spark.catalog import (
        Warehouse,
        snapshot_read,
        snapshot_replace,
        snapshot_rollback,
        snapshot_versions,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    v0 = snapshot_replace(wh, "t", spark.range(0, 100))
    v1 = snapshot_replace(wh, "t", spark.range(0, 50))
    assert (v0, v1) == (0, 1)
    assert snapshot_versions(wh, "t") == [0, 1]
    assert snapshot_read(wh, "t").count() == 50          # current = v1
    assert snapshot_read(wh, "t", version=0).count() == 100  # time travel
    snapshot_rollback(wh, "t", 0)
    assert snapshot_read(wh, "t").count() == 100
    assert snapshot_read(wh, "t", version=1).count() == 50   # v1 intact


def test_queries_survive_empty_tables(spark, tmp_path):
    """Zero-row inputs (fresh partitions, filtered-out dates) must yield
    empty or zero-filled results, never exceptions — the behavior 100 TB
    pipelines hit on every cold partition. Covers one query per plan
    family: scan-agg, broadcast join, window, explode+agg, LSH dedup,
    and the CC loop."""
    import os

    from lakehouse_spain_mobility_spark.queries import load_all
    from lakehouse_spain_mobility_spark.queries.tables import load

    src = "/root/testdata/sf0.001"
    empty_dir = str(tmp_path / "empty_sf")
    os.makedirs(empty_dir)
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        load(spark, src, t).limit(0).write.parquet(f"{empty_dir}/{t}.parquet")

    reg = load_all()
    for name in [
        "tpch_q1", "tpch_q5", "window_battery", "token_stats",
        "dedup_minhash_lsh", "dedup_clusters", "typical_day", "event_funnel",
        # round-4 additions, incl. the driver-collect query-vector /
        # argmax-rule patterns that must degrade to empty, not crash
        "incremental_dedup", "maxsim_rerank", "bitext_margin", "bpe_merges",
        "zorder_cluster", "spatial_dissolve", "pq_adc_search", "vocab_growth",
    ]:
        rows = reg[name].build(spark, empty_dir).collect()  # must not raise
        assert isinstance(rows, list)


def test_snapshot_vacuum_and_write_audit_publish(spark, tmp_path):
    """WAP: a failing audit must leave the current pointer untouched;
    vacuum must never remove the current version."""
    import pytest

    from lakehouse_spain_mobility_spark.catalog import (
        Warehouse,
        snapshot_publish_audited,
        snapshot_read,
        snapshot_replace,
        snapshot_vacuum,
        snapshot_versions,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    not_empty = lambda df: (df.count() > 0, "empty table")
    v0 = snapshot_publish_audited(wh, "t", spark.range(0, 10), [not_empty])
    assert v0 == 0 and snapshot_read(wh, "t").count() == 10

    with pytest.raises(ValueError, match="audit failed"):
        snapshot_publish_audited(wh, "t", spark.range(0, 0), [not_empty])
    assert snapshot_read(wh, "t").count() == 10      # pointer untouched
    assert snapshot_versions(wh, "t") == [0, 1]      # staged version on disk

    for n in (20, 30, 40):
        snapshot_replace(wh, "t", spark.range(0, n))
    removed = snapshot_vacuum(wh, "t", keep_last=2)
    assert set(removed) == {0, 1, 2}
    assert snapshot_read(wh, "t").count() == 40      # current survives
    assert snapshot_versions(wh, "t") == [3, 4]


def test_sharded_export_max_records_per_file(spark, tmp_path):
    """Training-shard export: maxRecordsPerFile bounds shard size without
    a repartition shuffle — the writer splits files as it goes."""
    import os

    from lakehouse_spain_mobility_spark.queries.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    out = str(tmp_path / "shards")
    docs.coalesce(1).write.option("maxRecordsPerFile", 100).parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= n // 100
    assert spark.read.parquet(out).count() == n


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Appends with added columns (the schema-drift every long-lived
    table suffers) must be readable with mergeSchema: old rows NULL-fill
    the new column."""
    import pyspark.sql.functions as F

    p = str(tmp_path / "evolving")
    spark.range(0, 10).select("id").write.parquet(p)
    spark.range(10, 20).select("id", (F.col("id") * 2).alias("extra")).write.mode(
        "append"
    ).parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "extra"}
    assert merged.count() == 20
    assert merged.filter(F.col("extra").isNull()).count() == 10


def test_partition_diagnostics(spark):
    """partition_sizes must account for every row; skew_factor must call
    out a hash-partitioned hot key and clear a balanced repartition."""
    from lakehouse_spain_mobility_spark.operators.diagnostics import (
        partition_sizes,
        skew_factor,
    )

    skewed = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k")
    ).repartition(8, "k")
    sizes = {r["partition_id"]: r["n_rows"] for r in partition_sizes(skewed).collect()}
    assert sum(sizes.values()) == 10000
    assert skew_factor(skewed) > 4.0          # 90% of rows share one key
    balanced = spark.range(0, 10000).repartition(8)
    assert skew_factor(balanced) < 1.5


def test_broadcast_kernel_size_guard_falls_back_to_lsh(spark):
    """The collect()+broadcast numpy kernels must route to the LSH-bucketed
    path once the corpus exceeds the broadcast cap — a driver OOM guard.
    With the cap forced below the corpus size, the returned plan must be
    pure relational (no MapInPandas) and still produce ranked neighbors."""
    from lakehouse_spain_mobility_spark.operators import similarity as sim
    from lakehouse_spain_mobility_spark.queries.tables import load

    from conftest import SF_DIR_ORACLE

    from pyspark.sql import functions as F

    v = load(spark, SF_DIR_ORACLE, "embeddings").select(
        F.col("vec_id").alias("id"), "embedding"
    )

    knn = sim.knn_broadcast_numpy(v.filter("id < 10"), v, k=5, max_broadcast_rows=100)
    plan = knn._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "CartesianProduct" not in plan
    rows = knn.collect()
    assert len(rows) > 0 and all(r["rank"] <= 5 for r in rows)

    topk = sim.topk_pairs_broadcast_numpy(v, k=10, max_broadcast_rows=100)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "CartesianProduct" not in plan
    assert len(topk.collect()) == 10

    # under the cap the exact broadcast kernel stays in charge
    exact = sim.knn_broadcast_numpy(v.filter("id < 10"), v, k=5)
    assert "MapInPandas" in exact._jdf.queryExecution().executedPlan().toString()


def test_queries_run_under_vanilla_session():
    """Driver-environment armor: the external driver builds its OWN
    SparkSession (not build_session), so every query must survive default
    configs — this round's testdata regeneration turned tz-naive parquet
    timestamps into TIMESTAMP_NTZ under Spark 4's default inference and
    broke unix_micros() call sites until the loader normalized them.
    Run the NTZ-sensitive queries in a subprocess with a bare session and
    diff them against the oracle."""
    import json
    import subprocess
    import sys

    code = r"""
import json
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .getOrCreate())
from lakehouse_spain_mobility_spark.oracle import compare
from lakehouse_spain_mobility_spark.queries import load_all
reg = load_all()
out = {}
for name in ("sessionize", "tumbling_window", "event_funnel", "tpch_q4", "gap_fill_interpolate"):
    r = compare(spark, reg[name], "/root/testdata/sf0.001")
    out[name] = bool(r.match)
print("RESULT:" + json.dumps(out))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=420,
        cwd="/root/repo",
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, f"no result line; stderr tail: {proc.stderr[-2000:]}"
    results = json.loads(line[0][len("RESULT:"):])
    assert all(results.values()), results


def test_line_dedup_skew_paths_identical_keepsets(spark, tmp_path):
    """VERDICT r3 #6: the documented single-line-skew fallback must exist
    and be provably equivalent. Adversarial corpus: ONE 15-token
    boilerplate line shared by 50k documents (one giant hash group). The
    skew-safe MIN(STRUCT) path and the row_number window path must return
    identical rows, and the skew path's plan must collapse the hot group
    map-side (partial_min BEFORE the exchange)."""
    import pandas as pd

    boiler = " ".join(f"tok{i}" for i in range(15))
    n = 50_000
    docs = pd.DataFrame(
        {
            "doc_id": list(range(n + 3)),
            "text": [boiler] * n
            + [
                boiler + " unique one alpha",
                "totally different line of words",
                boiler,
            ],
            "lang": ["en"] * (n + 3),
            "source": ["t"] * (n + 3),
        }
    )
    spark.createDataFrame(docs).write.parquet(str(tmp_path / "documents.parquet"))
    from lakehouse_spain_mobility_spark.queries.webcur import q_line_dedup

    safe = q_line_dedup(spark, str(tmp_path), skew_safe=True)
    want = sorted(map(tuple, q_line_dedup(spark, str(tmp_path), skew_safe=False).collect()))
    got = sorted(map(tuple, safe.collect()))
    assert got == want
    # keep-first semantics: the boilerplate line survives only in doc 0
    by_doc = {t[0]: t for t in got}
    assert by_doc[0][3] == 1  # n_kept_lines
    assert by_doc[1][3] == 0
    plan = pi.executed_plan(safe)
    assert "partial_min" in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]


def test_diversity_prune_quota_paths_identical(spark, tmp_path):
    """VERDICT r3 #6: the md5-threshold quota (no whole-bucket sort) must
    produce the EXACT keep-set of the per-bucket row_number ranking, on an
    adversarially skewed bucket layout (93% of rows in one bucket)."""
    from pyspark.sql import Window

    from lakehouse_spain_mobility_spark.operators.skew import quota_keep_by_hash

    n, cap = 30_000, 1_500
    b = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 16 < 2, F.col("id") % 16).otherwise(F.lit(7)).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col("vec_id").cast("string").cast("binary")), "vec_id"
    )
    want = sorted(
        map(
            tuple,
            b.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= cap)
            .select("bucket", "vec_id")
            .collect(),
        )
    )
    kept = quota_keep_by_hash(b, "bucket", "vec_id", cap)
    got = sorted(map(tuple, kept.select("bucket", "vec_id").collect()))
    assert got == want and len(got) > 0
    # and the registered query agrees with itself across both paths
    from lakehouse_spain_mobility_spark.queries.curation import q_diversity_prune

    sf = SF_DIR_ORACLE
    a = sorted(map(tuple, q_diversity_prune(spark, sf, skew_safe=True).collect()))
    c = sorted(map(tuple, q_diversity_prune(spark, sf, skew_safe=False).collect()))
    assert a == c


def test_bucketed_ps_aggregation_no_exchange(spark):
    """VERDICT r3 #2 + r5 #1: the partsupp surrogate aggregates
    ~|lineitem| groups, so map-side partials reduce nothing and the whole
    relation shuffles. With lineitem bucketed on l_partkey ALONE (the
    subset key: hash(partkey) satisfies ClusteredDistribution over any
    key set containing it) the one layout serves the (partkey, suppkey)
    aggregation, q2's per-part window MIN, and q11's per-part rollup —
    the _ps subplan AND the whole of q2 must contain ZERO shuffle
    Exchange, and the full Q16/Q2 routed through it must return exactly
    the raw-path rows."""
    from lakehouse_spain_mobility_spark.queries.tpch import (
        _ps,
        bucketed_ps_lineitem,
        q_tpch_q2,
        q_tpch_q16,
    )

    bli = bucketed_ps_lineitem(spark, SF_DIR_ORACLE, n_buckets=8)
    ps = _ps(spark, SF_DIR_ORACLE, lineitem=bli)
    assert pi.count_shuffles(ps) == 0, pi.executed_plan(ps)[:2000]
    # the group-key semi-join pushdown must not reintroduce an exchange
    p_keys = load(spark, SF_DIR_ORACLE, "part").filter(
        F.col("p_type") == "LARGE"
    ).select("p_partkey")
    ps_pushed = _ps(spark, SF_DIR_ORACLE, lineitem=bli, part_keys=p_keys)
    assert pi.count_shuffles(ps_pushed) == 0, pi.executed_plan(ps_pushed)[:2000]
    # q2 end-to-end: window keyed on the bucket subset key + heap top-k →
    # zero shuffle anywhere in the plan
    q2 = q_tpch_q2(spark, SF_DIR_ORACLE, lineitem=bli)
    assert pi.count_shuffles(q2) == 0, pi.executed_plan(q2)[:2000]
    # default route = bucketed; the raw scan-and-shuffle path is the A/B
    # reference and must agree row-for-row
    raw = load(spark, SF_DIR_ORACLE, "lineitem")
    got = sorted(map(tuple, q_tpch_q16(spark, SF_DIR_ORACLE, lineitem=bli).collect()))
    want = sorted(
        map(tuple, q_tpch_q16(spark, SF_DIR_ORACLE, lineitem=raw).collect())
    )
    assert got == want and len(got) > 0
    got2 = sorted(map(tuple, q2.collect()))
    want2 = sorted(
        map(tuple, q_tpch_q2(spark, SF_DIR_ORACLE, lineitem=raw).collect())
    )
    assert got2 == want2 and len(got2) > 0


def test_s3a_session_conf_and_storage_suite_under_it():
    """VERDICT r3 #8: the build_session S3A mirror of the reference's
    connect_ducklake S3 attach must (a) land in the Hadoop configuration
    of a fresh session and (b) not perturb execution — the storage_suite
    (K1-K6 battery) must still match its oracle under the aliased session.
    A live s3a:// round-trip needs the hadoop-aws artifact (deploy-time
    jar, absent in this sandbox); the boto3 artifact path is covered by
    test_reports.py::test_s3_artifact_store_moto_roundtrip against a real
    mocked S3."""
    import json
    import subprocess
    import sys

    code = r"""
import json
from lakehouse_spain_mobility_spark.session import build_session, s3a_conf
conf = s3a_conf("http://localhost:9000")
spark = build_session(app_name="s3a-smoke", master="local[4]",
                      shuffle_partitions=4, extra_conf=conf)
hc = spark.sparkContext._jsc.hadoopConfiguration()
ok_conf = (hc.get("fs.s3a.endpoint") == "http://localhost:9000"
           and hc.get("fs.s3a.path.style.access") == "true"
           and hc.get("fs.s3a.connection.ssl.enabled") == "false")
from lakehouse_spain_mobility_spark.oracle import compare
from lakehouse_spain_mobility_spark.queries import load_all
r = compare(spark, load_all()["storage_suite"], "/root/testdata/sf0.001")
print("RESULT:" + json.dumps({"conf": ok_conf, "storage_suite": bool(r.match)}))
"""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=420,
        cwd="/root/repo",
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, f"no result line; stderr tail: {proc.stderr[-2000:]}"
    results = json.loads(line[0][len("RESULT:"):])
    assert all(results.values()), results


def test_zordered_layout_is_locality_preserving_in_both_dims(spark, tmp_path):
    """K-layout: Z-order clustering must give every output file a small
    (x, y) RECTANGLE — per-file spans bounded in BOTH dimensions, which
    single-key range clustering cannot do (its second dimension spans the
    whole domain). That per-file tightness is exactly what parquet
    min/max stats need to prune scans filtered on either column."""
    from lakehouse_spain_mobility_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    pts = spark.range(200_000).select(
        (F.col("id") % 251).alias("x"), ((F.col("id") * 7) % 241).alias("y")
    )
    wh.create_or_replace_zordered("zpts", pts, "x", "y", bits=8, n_files=16)
    back = wh.read("zpts")
    spans = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .agg(F.avg("dx").alias("mdx"), F.avg("dy").alias("mdy"))
        .first()
    )
    # comparison baseline: the same data range-clustered on x alone —
    # perfect x locality, but every file spans the ENTIRE y domain
    wh.create_or_replace_clustered("xpts", pts, ["x"], n_files=16)
    base = (
        wh.read("xpts")
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg((F.max("y") - F.min("y")).alias("dy"))
        .agg(F.avg("dy").alias("mdy"))
        .first()
    )
    # z-order: mean per-file span well under the domain in BOTH dims
    # (quantile-boundary files straddle high-bit flips, hence mean not
    # max); single-key clustering leaves its second dimension unclustered
    assert spans["mdx"] <= 170 and spans["mdy"] <= 120, dict(spans.asDict())
    assert base["mdy"] >= 230, base["mdy"]  # the failure mode z-order fixes
    assert back.count() == 200_000


def test_salted_group_topk_bit_identical_under_skew(spark):
    """VERDICT r4 #7: the two-phase salted per-group top-k must be
    bit-identical to the plain per-group window ranking on an adversarial
    layout — one group holds 90% of all rows — at every salt width
    (salts=1 degenerates to the unsalted plan; 2 and 16 split the hot
    group). Exactness argument under test: phase-1 survivors are a
    superset of the true top-k because each (group, salt) class keeps its
    own k best, and the true i-th best (i ≤ k) ranks ≤ i within ANY
    subset containing it."""
    from pyspark.sql import Window

    from lakehouse_spain_mobility_spark.functions.topk import salted_group_topk

    n, k = 40_000, 25
    # group 0 = 90% of rows; score deliberately collides (id % 97) so the
    # doc-id tie-break is load-bearing; total order = (score desc, id asc)
    base = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.floor(F.col("id") / 10) % 5) + 1)
        .alias("g"),
        (F.col("id") % 97).alias("score"),
    )
    order = [F.col("score").desc(), F.col("id").asc()]
    w = Window.partitionBy("g").orderBy(*order)
    want = sorted(
        map(
            tuple,
            base.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("g", "id", "rk")
            .collect(),
        )
    )
    for salts in (1, 2, 16):
        got = sorted(
            map(
                tuple,
                salted_group_topk(base, ["g"], F.col("id"), k, order, salts)
                .select("g", "id", "rk")
                .collect(),
            )
        )
        assert got == want, f"salts={salts} diverged"
    assert len(want) == 25 * 6


def test_quota_keep_by_hash_string_bucket_and_skew(spark):
    """quota_keep_by_hash must accept a non-long bucket column (ADVICE r4:
    the boundary table hardcoded `long`, breaking the natural string-domain
    capping case) and still match the whole-bucket window ranking exactly
    under 90% single-bucket skew."""
    from pyspark.sql import Window

    from lakehouse_spain_mobility_spark.operators.skew import quota_keep_by_hash

    n, cap = 20_000, 700
    b = spark.range(n).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 10 < 9, F.lit("web"))
        .otherwise(F.concat(F.lit("src_"), (F.col("id") % 4).cast("string")))
        .alias("domain"),
    )
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.col("key").cast("string").cast("binary")), "key"
    )
    want = sorted(
        map(
            tuple,
            b.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= cap)
            .select("domain", "key")
            .collect(),
        )
    )
    kept = quota_keep_by_hash(b, "domain", "key", cap)
    got = sorted(map(tuple, kept.select("domain", "key").collect()))
    assert got == want and len(got) > 0
    # every domain is over quota here (web 18k, src_1/src_3 1k each — odd
    # ids only), so each must be capped at exactly `cap` kept rows
    from collections import Counter

    counts = Counter(d for d, _ in got)
    assert counts == {"web": cap, "src_1": cap, "src_3": cap}
