"""Semantic invariants for the round-3b web-curation operators
(queries/webcur.py). Exact cross-engine parity is covered by the
parametrized sweep in test_oracle_parity.py; these pin the *meaning* of
each result plus the plan-shape contracts (no cartesian blowups, probe
sides stay narrow)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lakehouse_spain_mobility_spark.queries import load_all
from lakehouse_spain_mobility_spark.plans import inspect as pi

from conftest import SF_DIR_ORACLE

REG = load_all()


def test_line_dedup_keep_first_accounting(spark):
    rows = {r["doc_id"]: r.asDict() for r in
            REG["line_dedup"].build(spark, SF_DIR_ORACLE).collect()}
    assert len(rows) == 500  # one row per document
    removed_total = 0
    for r in rows.values():
        assert 0 <= r["n_kept_lines"] <= r["n_lines"]
        assert 0 <= r["n_kept_tokens"] <= r["n_tokens"]
        # a kept line carries at most _LINE_TOKENS tokens
        assert r["n_kept_tokens"] <= 15 * r["n_kept_lines"]
        removed_total += r["n_lines"] - r["n_kept_lines"]
    # the corpus carries injected duplicates: some line must be removed,
    # and the globally-first doc (doc_id 0) must keep all of its lines
    assert removed_total > 0
    assert rows[0]["n_kept_lines"] == rows[0]["n_lines"]
    # conservation: kept lines across the corpus == distinct line strings
    d = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    distinct_lines = (
        d.select(F.explode(F.array(toks)).alias("w"))
        .select(
            F.explode(
                F.sequence(F.lit(0), F.ceil(F.size("w") / F.lit(15)).cast("int") - 1)
            ).alias("i"),
            "w",
        )
        .select(F.array_join(F.slice("w", F.col("i") * 15 + 1, 15), " ").alias("line"))
        .distinct()
        .count()
    )
    assert sum(r["n_kept_lines"] for r in rows.values()) == distinct_lines


def test_hamming_ann_is_true_topk_of_signature_space(spark):
    df = REG["hamming_ann"].build(spark, SF_DIR_ORACLE)
    rows = df.collect()
    assert len(rows) == 10 * 5  # 10 queries x top-5
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        hs = [r["hamming"] for r in rs]
        assert hs == sorted(hs)  # ranked by distance
        assert all(0 <= h <= 64 for h in hs)
        assert all(r["vec_id"] >= 10 for r in rs)  # corpus side only
    # the plan must broadcast the 10-query side, never shuffle the corpus
    plan = pi.executed_plan(df)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_hamming_approximates_cosine_neighbourhood(spark):
    """Sign-bit Hamming distance is a monotone proxy for angular distance:
    the expected Hamming for angle theta is 64*theta/pi (Charikar 2002).
    Check the top-1 neighbour's true cosine beats the corpus median."""
    e = spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")
    rows = REG["hamming_ann"].build(spark, SF_DIR_ORACLE).collect()
    top1 = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    vecs = {r["vec_id"]: r["embedding"] for r in e.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    import statistics

    corpus_ids = [v for v in vecs if v >= 10]
    better = 0
    for q, n1 in top1.items():
        c_top = cos(vecs[q], vecs[n1])
        med = statistics.median(cos(vecs[q], vecs[c]) for c in corpus_ids)
        if c_top > med:
            better += 1
    assert better >= 8  # at least 8 of 10 queries beat the median


def test_snapshot_diff_partitions_the_union_of_keys(spark):
    rows = REG["snapshot_diff"].build(spark, SF_DIR_ORACLE).collect()
    by_status = {}
    for r in rows:
        by_status[r["status"]] = by_status.get(r["status"], 0) + r["n_docs"]
    # every key in either snapshot is classified exactly once: the four
    # statuses partition the union (500 docs, none dropped from both sides
    # since 8 and 9 differ mod 10)
    assert sum(by_status.values()) == 500
    # mod-arithmetic ground truth on doc_ids 0..499
    added = sum(1 for i in range(500) if i % 10 == 9)
    removed = sum(1 for i in range(500) if i % 10 == 8)
    changed = sum(
        1 for i in range(500) if i % 10 not in (8, 9) and i % 7 == 3
    )
    assert by_status["added"] == added
    assert by_status["removed"] == removed
    assert by_status["changed"] == changed
    assert by_status["unchanged"] == 500 - added - removed - changed


def test_pmi_bigrams_ranked_and_consistent(spark):
    rows = REG["pmi_bigrams"].build(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 20
    pmis = [r["pmi_ppm"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert pmis == sorted(pmis, reverse=True)
    assert all(r["c12"] >= 5 for r in rows)
    # hand-verify PMI for the top bigram from raw counts
    top = min(rows, key=lambda r: r["rank"])
    d = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    toks = d.select(F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("t"))
    n_tok = toks.count()
    c1 = toks.filter(F.col("t") == top["w1"]).count()
    c2 = toks.filter(F.col("t") == top["w2"]).count()
    docs = d.select(F.filter(F.split("text", " "), lambda x: x != "").alias("w"))
    n_bg = docs.select(F.explode(F.when(F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1))).alias("i")).count()
    expect = round(
        math.log((top["c12"] / n_bg) / ((c1 / n_tok) * (c2 / n_tok))) * 1e6
    )
    assert abs(expect - top["pmi_ppm"]) <= 1  # ppm rounding slack


def test_cluster_representatives_pick_best_member(spark):
    reps = {r["component"]: r.asDict() for r in
            REG["cluster_representatives"].build(spark, SF_DIR_ORACLE).collect()}
    assert len(reps) > 0  # injected near-dups form clusters
    clusters = {r["component"]: r.asDict() for r in
                REG["dedup_clusters"].build(spark, SF_DIR_ORACLE).collect()}
    # same multi-doc components, same sizes as the keep-first view
    assert set(reps) == set(clusters)
    scores = {r["doc_id"]: r["score_ppm"] for r in
              REG["quality_logreg"].build(spark, SF_DIR_ORACLE).collect()}
    for comp, r in reps.items():
        assert r["n_docs"] == clusters[comp]["n_docs"]
        assert r["n_removed"] == r["n_docs"] - 1
        # the elected representative carries its own (maximal) score
        assert scores[r["rep_doc"]] == r["rep_score_ppm"]


def test_shard_manifest_partitions_the_corpus(spark):
    rows = REG["shard_manifest"].build(spark, SF_DIR_ORACLE).collect()
    assert {r["shard"] for r in rows} <= set(range(16))
    assert sum(r["n_docs"] for r in rows) == 500
    assert sum(r["id_checksum"] for r in rows) == sum(range(500))  # every doc once
    # md5 sharding balances: no shard holds more than 3x the mean
    mean = 500 / len(rows)
    assert all(r["n_docs"] < 3 * mean for r in rows)


def test_line_dedup_plan_single_hash_shuffle_and_pruned_scan(spark):
    """PLANS.md contract: the keep-first rank is ONE exchange on the line
    hash (never a self-join or pair enumeration), reassembly is one
    doc-key aggregation, and the scan reads only (doc_id, text)."""
    df = REG["line_dedup"].build(spark, SF_DIR_ORACLE)
    plan = pi.executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1
    # column pruning reaches the parquet scan on the lines branch
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_line_dedup_empty_documents_produce_zero_lines(spark, tmp_path):
    """ADVICE r3: sequence(0, -1) is a DESCENDING [0, -1] in Spark — an
    unguarded explode turns an empty document into two phantom empty
    'lines' that also poison the global keep-first (every real doc's
    trailing short line competes with ''). The guard must yield zero line
    rows for empty/whitespace-only docs, matching range(0,0) semantics."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["alpha beta gamma", "", "   "],
            "lang": ["en", "en", "en"],
            "source": ["t", "t", "t"],
        }
    )
    spark.createDataFrame(docs).write.parquet(str(tmp_path / "documents.parquet"))
    from lakehouse_spain_mobility_spark.queries.webcur import q_line_dedup

    rows = {r["doc_id"]: r.asDict() for r in q_line_dedup(spark, str(tmp_path)).collect()}
    assert rows[0]["n_kept_lines"] == 1 and rows[0]["n_kept_tokens"] == 3
    for d in (1, 2):
        assert rows[d]["n_lines"] == 0
        assert rows[d]["n_kept_lines"] == 0
        assert rows[d]["n_kept_tokens"] == 0


def test_source_quota_cap_semantics_and_skew_equivalence(spark):
    """The salted two-phase top-N must produce EXACTLY the naive
    per-source window's keep-set — including under adversarial skew
    (one source holding ~all documents, heavy n_chars ties) — and the
    accounting column must carry the full per-source population."""
    from lakehouse_spain_mobility_spark.queries.selection import (
        QUOTA_CAP, q_source_quota_cap,
    )

    rows = REG["source_quota_cap"].build(spark, SF_DIR_ORACLE).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        assert len(rs) <= QUOTA_CAP
        assert sorted(r["rk"] for r in rs) == list(range(1, len(rs) + 1))
        # keep-best: survivors ordered by (n_chars desc, doc_id asc)
        ordered = sorted(rs, key=lambda r: (-r["n_chars"], r["doc_id"]))
        assert [r["rk"] for r in ordered] == list(range(1, len(rs) + 1))
        assert all(r["src_total"] >= len(rs) for r in rs)

    # adversarial skew: 9,000 of 9,030 docs in ONE source, n_chars taking
    # only 3 distinct values (the per-salt rank must not disagree with
    # the global rank under mass ties)
    import pandas as pd

    skew = pd.DataFrame(
        {
            "doc_id": range(9030),
            "source": ["hot"] * 9000 + ["cold%d" % (i % 3) for i in range(30)],
            "n_chars": [(i * 7) % 3 + 100 for i in range(9030)],
            "text": ["x"] * 9030,
            "lang": ["en"] * 9030,
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(skew).write.mode("overwrite").parquet(
            os.path.join(td, "documents.parquet")
        )
        got = {
            (r["source"], r["doc_id"]): r["rk"]
            for r in q_source_quota_cap(spark, td).collect()
        }
    naive = {}
    for src in skew["source"].unique():
        sub = skew[skew["source"] == src].sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        )
        for rk, (_, row) in enumerate(sub.head(QUOTA_CAP).iterrows(), 1):
            naive[(src, int(row["doc_id"]))] = rk
    assert got == naive
