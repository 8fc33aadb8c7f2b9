"""Semantic invariants for the sketch/set-join/fusion operators
(queries/sketches.py, queries/setjoin.py). Exact cross-engine parity is
covered by the parametrized sweep in test_oracle_parity.py; these pin the
*meaning* of each result — sketch error bounds, exact-algorithm recall,
fusion arithmetic — plus the plan-shape scale contracts."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from lakehouse_spain_mobility_spark.queries import load_all

from conftest import SF_DIR_ORACLE

REG = load_all()


def test_hll_estimate_within_sketch_error(spark):
    rows = REG["hll_distinct"].build(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 5  # one per event_type
    for r in rows:
        assert 1 <= r["registers_nonzero"] <= 64
        est = r["hll_estimate_ppm"] / 1e6
        # HLL standard error is 1.04/sqrt(m) = 13% at m=64; 3 sigma = 39%.
        assert abs(est - r["n_exact"]) <= max(3.0, 0.39 * r["n_exact"]), (
            r["event_type"], est, r["n_exact"])


def test_xxh64_sql_matches_spark_xxhash64(spark):
    """The x64 HLL twin's oracle recomputes Spark's xxhash64 in DuckDB SQL
    (functions/xxh64_sql.py). Pin the three-way agreement — Spark builtin,
    driver-side Python model, generated DuckDB SQL — over a sign-covering
    value range plus NULL (which Spark hashes to the bare seed, 42)."""
    import duckdb

    from lakehouse_spain_mobility_spark.functions.xxh64_sql import (
        xxh64_long,
        xxh64_u64_sql_from,
    )

    vals = [0, 1, -1, 42, 2**62, -(2**62), 2**63 - 1, -(2**63) + 1, None] + [
        (7919 * k) ** 3 % (2**63) - 2**62 for k in range(1, 60)
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v long")
    got = {
        r["i"]: r["h"]
        for r in df.select("i", F.xxhash64(F.col("v")).alias("h")).collect()
    }
    M = 1 << 64
    for i, v in enumerate(vals):
        exp = 42 if v is None else xxh64_long(v)
        assert got[i] == exp, (v, got[i], exp)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, {'NULL' if v is None else v}::BIGINT)" for i, v in enumerate(vals)
        )
        + ") AS x(i, v)"
    )
    sql = xxh64_u64_sql_from("v", "SELECT i, v FROM t", "i")
    for i, h_u in con.execute(f"SELECT i, h_u FROM ({sql})").fetchall():
        assert h_u == got[i] % M, (vals[i], h_u, got[i])


def test_xxh64_pair_matches_spark_two_column_hash(spark):
    """Round-10 generalization: Spark's xxhash64(a, b) chains field hashes
    as seeds. Pin the FOUR-way agreement — Spark builtin, driver Python
    model, vectorized numpy twin (the inverted_index kernel's hash), and
    the seeded DuckDB SQL generator — over sign-covering pairs + NULLs
    (a null field leaves the running hash untouched in Spark)."""
    import duckdb
    import numpy as np

    from lakehouse_spain_mobility_spark.functions.xxh64_sql import (
        xxh64_pair_long,
        xxh64_pair_np,
        xxh64_pair_u64_sql_from,
    )

    pairs = [(0, 0), (1, 1), (-1, 5), (2**62, -(2**62)), (42, 42),
             (2**63 - 1, -(2**63) + 1), (999, 1000)] + [
        ((7919 * k) ** 3 % (2**63) - 2**62, (104729 * k) ** 3 % (2**63) - 2**62)
        for k in range(1, 40)
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "i int, a long, b long"
    )
    got = {r["i"]: r["h"] for r in df.select("i", F.xxhash64("a", "b").alias("h")).collect()}
    exp = [xxh64_pair_long(a, b) for a, b in pairs]
    assert [got[i] for i in range(len(pairs))] == exp
    np_h = xxh64_pair_np(
        np.array([p[0] for p in pairs]), np.array([p[1] for p in pairs])
    )
    assert list(np_h) == exp
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
                   for i, (a, b) in enumerate(pairs))
        + ") AS x(i, a, b)"
    )
    sql = xxh64_pair_u64_sql_from("a", "b", "SELECT i, a, b FROM t", "i")
    M = 1 << 64
    for i, h_u in con.execute(f"SELECT i, h_u FROM ({sql})").fetchall():
        assert h_u == exp[i] % M, (pairs[i], h_u, exp[i])


def test_hll_x64_estimate_within_sketch_error(spark):
    rows = REG["hll_distinct_x64"].build(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r["registers_nonzero"] <= 64
        est = r["hll_estimate_ppm"] / 1e6
        assert abs(est - r["n_exact"]) <= max(3.0, 0.39 * r["n_exact"]), (
            r["event_type"], est, r["n_exact"])


def test_hll_registers_are_bounded_state(spark):
    # The register relation (pre-estimate) must be <= m rows per group —
    # the mergeable-state contract that makes HLL shuffle O(groups * m).
    plan = REG["hll_distinct"].build(spark, SF_DIR_ORACLE)._jdf.queryExecution(
    ).executedPlan().toString()
    # two-level aggregate: partial MAX(rho) before the exchange
    assert "partial_max" in plan.lower() or "partial" in plan.lower()


def test_cms_never_undercounts_and_is_tight_here(spark):
    rows = REG["cms_heavy_hitters"].build(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 20
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, 21))
    for r in rows:
        # the CMS guarantee: estimates are one-sided (never below truth)
        assert r["overcount"] >= 0
        assert r["cms_cnt"] == r["exact_cnt"] + r["overcount"]
    # error bound: with w=512 >> vocab/heavy mass, expected inflation is
    # small; assert the aggregate overcount stays below 10% of exact mass
    total_exact = sum(r["exact_cnt"] for r in rows)
    total_over = sum(r["overcount"] for r in rows)
    assert total_over <= 0.10 * total_exact


def test_rrf_fusion_arithmetic_and_membership(spark):
    rows = REG["rrf_fusion"].build(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 10
    for r in rows:
        contrib = 0.0
        if r["rank_bm25"] > 0:
            contrib += 1.0 / (60.0 + r["rank_bm25"])
        if r["rank_tf"] > 0:
            contrib += 1.0 / (60.0 + r["rank_tf"])
        assert r["rrf_ppm"] == round(contrib * 1e6)
        # a fused doc must appear in at least one source toplist
        assert r["rank_bm25"] > 0 or r["rank_tf"] > 0
    # fused order is descending in score
    scores = [r["rrf_ppm"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_prefix_filter_join_is_exact(spark):
    """Recall contract: the prefix-filtered join must find EXACTLY the
    pairs a brute-force all-pairs Jaccard>=0.6 scan finds (on the small
    oracle corpus where brute force is feasible)."""
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in REG["prefix_filter_join"].build(spark, SF_DIR_ORACLE).collect()
    }
    from lakehouse_spain_mobility_spark.operators.dedup import shingles

    d = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    sets = {
        r["doc_id"]: set(r["sh"])
        for r in shingles(d, "doc_id", "text")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
        .collect()
    }
    expected = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter * 5 >= 3 * union:
            expected[(a, b)] = (inter, union)
    assert set(got) == set(expected)
    for (a, b), (inter, union) in expected.items():
        assert got[(a, b)]["inter"] == inter
        assert got[(a, b)]["n_a"] + got[(a, b)]["n_b"] - inter == union
        assert got[(a, b)]["jacc_ppm"] == round(inter / union * 1e6)


def test_prefix_filter_join_plan_has_no_cartesian(spark):
    df = REG["prefix_filter_join"].build(spark, SF_DIR_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmv_two_level_topk_is_exact_and_estimate_in_band(spark):
    rows = REG["kmv_distinct"].build(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 5  # one per lang
    for r in rows:
        assert r["k_used"] == 128  # every lang has >= k distinct shingles
        est = r["kmv_estimate_ppm"] / 1e6
        # KMV std error ~ 1/sqrt(k-2) = 8.9% at k=128; allow 4 sigma.
        assert abs(est - r["n_exact"]) <= 0.36 * r["n_exact"], (
            r["lang"], est, r["n_exact"])


def test_kmv_kth_min_matches_bruteforce(spark):
    """The salted two-level rank must produce the true k-th smallest hash
    (superset property of per-subgroup minima)."""
    from lakehouse_spain_mobility_spark.queries.sketches import _kmv_w
    from lakehouse_spain_mobility_spark.operators.dedup import shingles

    d = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    sh = shingles(d, "doc_id", "text").join(d.select("doc_id", "lang"), "doc_id")
    hashed = sh.select(
        "lang", F.expr(_kmv_w("md5(cast(shingle as binary))")).alias("wv")
    ).distinct()
    truth = {}
    for r in hashed.collect():
        truth.setdefault(r["lang"], []).append(r["wv"])
    got = {r["lang"]: r["kth_min_hash"]
           for r in REG["kmv_distinct"].build(spark, SF_DIR_ORACLE).collect()}
    for lang, vals in truth.items():
        assert got[lang] == sorted(vals)[127]


def test_kn_bigram_probabilities_are_coherent(spark):
    rows = REG["kn_bigram_lm"].build(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 20
    for r in rows:
        p = r["pkn_ppm"] / 1e6
        assert 0.0 < p <= 1.0
        assert r["c_uw"] <= r["c_u"]
        assert 1 <= r["n_follow"] and 1 <= r["n_prec"]
        # the discounted ML term alone is a lower bound on P_kn
        assert p >= (r["c_uw"] - 0.75) / r["c_u"] - 1e-6


def test_kn_distribution_sums_to_one_per_history(spark):
    """Σ_w P_kn(w|u) over OBSERVED continuations = 1 - unseen mass; with
    P_cont summed over the observed w's, the identity is
    Σ_w_obs P_kn(w|u) = 1 - D*N1+(u,*)/c(u) * (1 - Σ_w_obs P_cont(w)).
    Verify it exactly (float tolerance) for the most frequent history."""
    from lakehouse_spain_mobility_spark.queries.lm import q_kn_bigram_lm  # noqa: F401

    d = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    docs = d.select(F.explode(F.array(toks)).alias("wa"))
    pairs = F.when(
        F.size("wa") >= 2,
        F.arrays_zip(F.slice("wa", 1, F.size("wa") - 1),
                     F.slice("wa", 2, F.size("wa") - 1)),
    )
    bg = docs.select(F.explode(pairs).alias("p")).select(
        F.col("p.0").alias("u"), F.col("p.1").alias("w"))
    c_uw = {}
    for r in bg.groupBy("u", "w").count().collect():
        c_uw[(r["u"], r["w"])] = r["count"]
    from collections import Counter
    c_u = Counter(); n_follow = Counter(); n_prec = Counter()
    for (u, w), c in c_uw.items():
        c_u[u] += c; n_follow[u] += 1; n_prec[w] += 1
    n_types = len(c_uw)
    u0 = max(c_u, key=lambda u: (c_u[u], u))
    obs = [w for (u, w) in c_uw if u == u0]
    total = sum(
        max(c_uw[(u0, w)] - 0.75, 0.0) / c_u[u0]
        + 0.75 * n_follow[u0] / c_u[u0] * (n_prec[w] / n_types)
        for w in obs
    )
    pcont_obs = sum(n_prec[w] for w in obs) / n_types
    expected = 1.0 - 0.75 * n_follow[u0] / c_u[u0] * (1.0 - pcont_obs)
    assert abs(total - expected) < 1e-9


def test_kmv_jaccard_estimator_definition_and_accuracy(spark):
    """The estimate must equal |U_k ∩ S_A ∩ S_B| / |U_k| computed from
    brute-force sketches, and sit within sampling error of the exact
    Jaccard."""
    from lakehouse_spain_mobility_spark.queries.sketches import _kmv_w
    from lakehouse_spain_mobility_spark.operators.dedup import shingles

    d = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    sh = shingles(d, "doc_id", "text").join(d.select("doc_id", "lang"), "doc_id")
    hashed = (
        sh.select("lang", F.expr(_kmv_w("md5(cast(shingle as binary))")).alias("wv"))
        .distinct()
        .collect()
    )
    by_lang = {}
    for r in hashed:
        by_lang.setdefault(r["lang"], set()).add(r["wv"])
    sk = {lang: set(sorted(v)[:128]) for lang, v in by_lang.items()}
    rows = REG["kmv_jaccard"].build(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 10  # C(5,2) language pairs
    for r in rows:
        a, b = r["lang_a"], r["lang_b"]
        uk = set(sorted(sk[a] | sk[b])[:128])
        inter_in_sketch = len(uk & sk[a] & sk[b])
        assert r["ku"] == len(uk)
        assert r["kmv_inter"] == inter_in_sketch
        # SQL ROUND is half-away-from-zero; Python round() is half-even
        assert r["kmv_jacc_ppm"] == int(inter_in_sketch / len(uk) * 1e6 + 0.5)
        # accuracy: binomial std err sqrt(J(1-J)/k) — allow 5 sigma + floor
        j = r["exact_jacc_ppm"] / 1e6
        tol = 5.0 * ((j * (1 - j) / 128) ** 0.5) + 0.02
        assert abs(r["kmv_jacc_ppm"] / 1e6 - j) <= tol, (a, b)


def test_entropy_diversity_metrics_are_coherent(spark):
    import math

    rows = REG["entropy_diversity"].build(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 5
    for r in rows:
        h = r["entropy_ppm"] / 1e6
        simpson = r["simpson_ppm"] / 1e6
        # entropy bounded by ln(n_types); Simpson >= 1/n_types (uniform min)
        assert 0.0 < h <= math.log(r["n_types"]) + 1e-6
        assert 1.0 / r["n_types"] - 1e-6 <= simpson < 1.0
        # Renyi ordering: H (Shannon) >= H2 = -ln(Simpson)
        assert h >= -math.log(simpson) - 1e-4
        assert 0 < r["ttr_ppm"] <= 1_000_000


def test_weighted_sample_is_aes(spark):
    """The sample must be exactly the k largest u^(1/w) keys computed by
    brute force, and heavier docs must be overrepresented relative to a
    uniform draw."""
    import math

    rows = REG["weighted_sample"].build(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 50
    d = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet").select(
        "doc_id", "n_chars").collect()
    from lakehouse_spain_mobility_spark.queries.sketches import _kmv_w  # noqa: F401
    import hashlib

    def key(doc_id, wt):
        hx = hashlib.md5(str(doc_id).encode()).hexdigest()
        wv = int(hx[:12], 16)
        u = (wv + 1) / (2 ** 48 + 1)
        lnq = round(math.log(u) * 1e6) / 1e6
        return lnq / wt

    brute = sorted(
        ((key(r["doc_id"], r["n_chars"]), r["doc_id"]) for r in d if r["n_chars"] > 0),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    assert [b[1] for b in brute] == [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    # weighting bias: mean weight of the sample exceeds the corpus mean
    corpus_mean = sum(r["n_chars"] for r in d) / len(d)
    sample_mean = sum(r["wt"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_curriculum_order_decile_exactness(spark):
    """The value-domain CDF binning must equal the exact global decile
    definition (floor(10 * #docs-strictly-shorter / total)), heads must
    follow the md5 order, and the accounting must cover every document
    exactly once."""
    from lakehouse_spain_mobility_spark.queries import load_all
    from lakehouse_spain_mobility_spark.queries.mlprep import CURRICULUM_HEAD

    reg = load_all()
    sf = "/root/testdata/sf0.01"
    rows = reg["curriculum_order"].build(spark, sf).collect()
    from lakehouse_spain_mobility_spark.queries.tables import load as tload

    docs = tload(spark, sf, "documents").select("doc_id", "n_chars").toPandas()
    total = len(docs)
    below = {v: int((docs["n_chars"] < v).sum()) for v in docs["n_chars"].unique()}
    exact_decile = {
        int(r.doc_id): int(below[r.n_chars] * 10 // total)
        for r in docs.itertuples()
    }
    import hashlib

    # accounting covers the corpus once
    stats = {r["decile"]: (r["dec_docs"], r["dec_checksum"]) for r in rows}
    assert sum(d for d, _ in stats.values()) == total
    assert sum(c for _, c in stats.values()) == int(docs["doc_id"].sum())
    for r in rows:
        assert r["decile"] == exact_decile[r["doc_id"]]
        assert 0 <= r["decile"] <= 9
        assert 1 <= r["rk"] <= CURRICULUM_HEAD
    # per-decile heads are the md5-minimal members
    byd = {}
    for r in rows:
        byd.setdefault(r["decile"], []).append(r)
    md5 = lambda i: hashlib.md5(str(i).encode()).hexdigest()
    for dec, rs in byd.items():
        members = [i for i, d in exact_decile.items() if d == dec]
        want = sorted(members, key=lambda i: (md5(i), i))[: len(rs)]
        got = [r["doc_id"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert got == want


def test_ivm_delta_merge_equals_recompute(spark):
    """IVM algebra: base_agg ⊕ signed deltas must equal the from-scratch
    aggregate of the final state — including exact retraction of float
    values (the fixed-point sum makes (a+b)-b == a hold in micros)."""
    from pyspark.sql import functions as F

    from lakehouse_spain_mobility_spark.functions.deterministic import dsum
    from lakehouse_spain_mobility_spark.queries import load_all
    from lakehouse_spain_mobility_spark.queries.tables import load as tload

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r.asDict() for r in
           reg["ivm_delta_agg"].build(spark, sf).collect()}
    ev = tload(spark, sf, "events").select("event_id", "event_type", "value")
    final_state = ev.filter(F.col("event_id") % 17 != 0).select(
        "event_type", "value"
    ).unionByName(
        ev.filter(F.col("event_id") % 10 == 0).select(
            "event_type", (F.col("value") + F.lit(0.5)).alias("value")
        )
    )
    want = {r["event_type"]: r.asDict() for r in
            final_state.groupBy("event_type").agg(
                F.count("*").cast("bigint").alias("n_events"),
                dsum(F.col("value")).alias("total_value"),
            ).collect()}
    assert set(got) == set(want) and len(got) == 5
    for k in want:
        assert got[k]["n_events"] == want[k]["n_events"]
        assert got[k]["total_value"] == want[k]["total_value"]  # bit-equal


def test_k_anonymity_audit_flags_planted_small_groups(spark):
    """A planted events table with one singleton quasi-identifier group
    must surface exactly that group as risky."""
    import os
    import tempfile

    import pandas as pd

    from lakehouse_spain_mobility_spark.queries import load_all

    reg = load_all()
    base = pd.Timestamp("2024-01-01 10:00:00")
    rows = []
    # 6 clicks in the same (type, hour, band) -> safe group
    for i in range(6):
        rows.append((i, base, 100 + i, "click", 50.0, "{}"))
    # 1 purchase alone in its (type, hour, band) -> risky singleton
    rows.append((6, base, 200, "purchase", 950.0, "{}"))
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(ev).write.mode("overwrite").parquet(
            os.path.join(td, "events.parquet")
        )
        got = {r["event_type"]: r.asDict()
               for r in reg["k_anonymity_audit"].build(spark, td).collect()}
    assert got["click"]["n_risky_groups"] == 0
    assert got["click"]["min_group_size"] == 6
    assert got["purchase"]["n_risky_groups"] == 1
    assert got["purchase"]["n_rows_at_risk"] == 1
    assert got["purchase"]["min_group_size"] == 1


def test_quantile_sketch_merge_equals_direct_build(spark):
    """The mergeability contract (VERDICT r9 #7): splitting the fact into
    two halves, sketching each, and merging must reproduce EXACTLY the
    sketch built over the full relation — kept-row sets and levels both —
    because level sets nest and membership is a pure function of the
    content hash. This is the tree-reduce step a 1000-executor profiling
    pass relies on."""
    from pyspark.sql import functions as F

    from lakehouse_spain_mobility_spark.operators.quantile_sketch import (
        level_sample,
        merge_level_samples,
    )
    from lakehouse_spain_mobility_spark.queries.tables import load

    sf = "/root/testdata/sf0.01"
    base = (
        load(spark, sf, "events")
        .select("event_type", "event_id", "value")
        .filter(F.col("value").isNotNull())
    )
    k = 64  # small k => nonzero levels even per half
    direct = level_sample(base, ["event_type"], "event_id", k)
    half_a = base.filter(F.col("event_id") % 2 == 0)
    half_b = base.filter(F.col("event_id") % 2 == 1)
    merged = merge_level_samples(
        level_sample(half_a, ["event_type"], "event_id", k),
        level_sample(half_b, ["event_type"], "event_id", k),
        ["event_type"],
        "event_id",
        k,
    )
    key = lambda rows: sorted(
        (r["event_type"], r["event_id"], r["n"], r["lvl"], r["weight"]) for r in rows
    )
    d, m = key(direct.collect()), key(merged.collect())
    assert d == m and len(d) > 0
    # constant-size contract: every group kept <= ~2k rows (level overshoot
    # is bounded by a factor of 2 in expectation; 4x is a safe hard bound)
    from collections import Counter

    per_group = Counter(r[0] for r in d)
    assert max(per_group.values()) <= 4 * k


def test_quantile_sketch_rank_error_within_bound(spark):
    """Accuracy contract on the planted corpus: the reported true-rank
    error must stay inside ~4 standard errors (se = sqrt(rank * 2^lvl)/n)
    for every probe — a deterministic assertion because the corpus and
    the hash are fixed."""
    import math

    from lakehouse_spain_mobility_spark.queries import load_all

    reg = load_all()
    rows = reg["kll_quantile_sketch"].build(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 15  # 5 event types x 3 probes
    for r in rows:
        se = math.sqrt(r["target_rank"] * (2 ** r["lvl"])) / r["n"]
        assert r["rank_err_ppm"] / 1e6 <= max(4 * se, 2.0 / r["n"]), r.asDict()
