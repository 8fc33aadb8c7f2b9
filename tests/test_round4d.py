"""Semantic invariants for the round-4d operators: l-diversity,
CMS join-size estimation, frequent itemsets, UniMax allocation,
stream-stream join execution, and the materialized inverted index.
Exact cross-engine parity is covered by test_oracle_parity.py; these pin
what the numbers MEAN (planted corpora, closed-form recomputation,
batch-equivalence for the streaming path)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from lakehouse_spain_mobility_spark.queries import load_all
from lakehouse_spain_mobility_spark.queries.tables import load

from conftest import SF_DIR_ORACLE, SF_DIR_SMALL

REG = load_all()


def test_l_diversity_flags_homogeneous_groups(spark):
    """A QID group whose rows all share one sensitive value must be
    flagged even though it is large enough to pass k-anonymity."""
    import os
    import tempfile

    import pandas as pd

    base = pd.Timestamp("2024-01-01 10:00:00")
    rows = []
    # 6 clicks, same QID group, ALL the same user -> l = 1 (homogeneous)
    for i in range(6):
        rows.append((i, base, 42, "click", 50.0, "{}"))
    # 6 views, same QID group, 3 distinct users -> l = 3 (passes L=3)
    for i in range(6):
        rows.append((10 + i, base, 100 + (i % 3), "view", 50.0, "{}"))
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(ev).write.mode("overwrite").parquet(
            os.path.join(td, "events.parquet")
        )
        got = {r["event_type"]: r.asDict()
               for r in REG["l_diversity_audit"].build(spark, td).collect()}
    assert got["click"]["n_low_diversity"] == 1
    assert got["click"]["n_rows_exposed"] == 6
    assert got["click"]["min_l"] == 1
    assert got["view"]["n_low_diversity"] == 0
    assert got["view"]["min_l"] == 3


def test_join_size_estimate_exact_and_one_sided(spark):
    row = REG["join_size_estimate"].build(spark, SF_DIR_ORACLE).collect()[0]
    # the exact inner product must equal the materialized join count
    li = load(spark, SF_DIR_ORACLE, "lineitem")
    a = li.select(F.col("l_partkey").alias("k"))
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("k")
    )
    true_pairs = a.join(b, "k").count()
    assert row["exact_pairs"] == true_pairs
    # Count-Min inner products never undercount
    assert row["overcount"] >= 0
    assert row["cms_estimate"] == row["exact_pairs"] + row["overcount"]
    # CMS inner-product error bound: overcount <= e * |A| * |B| / w
    na, nb = a.count(), b.count()
    assert row["overcount"] <= 2.7182818 * na * nb / 16384


def test_frequent_itemsets_supports_and_lift(spark):
    rows = REG["frequent_itemsets"].build(spark, SF_DIR_ORACLE).collect()
    assert 1 <= len(rows) <= 20
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    li = load(spark, SF_DIR_ORACLE, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, SF_DIR_ORACLE, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n = baskets.select("o").distinct().count()
    top = rows[0]
    assert top["item_a"] < top["item_b"]
    # recompute the top pair's support directly
    got = (
        baskets.filter(F.col("item") == top["item_a"]).select("o")
        .join(baskets.filter(F.col("item") == top["item_b"]).select("o"), "o")
        .count()
    )
    assert top["support"] == got
    for r in rows:
        assert r["support"] * 500 >= n  # pair floor honored
        assert r["lift_ppm"] > 0


def test_unimax_allocation_waterfill_identities(spark):
    rows = REG["unimax_mix"].build(spark, SF_DIR_ORACLE).collect()
    d = load(spark, SF_DIR_ORACLE, "documents")
    total = d.agg(F.sum("n_chars")).collect()[0][0]
    budget = total // 2
    # exact conservation: integer shares sum to exactly the budget
    assert sum(r["allocated"] for r in rows) == budget
    for r in rows:
        assert r["allocated"] <= r["capacity"]
        assert r["capacity"] == 3 * r["n_tokens"]
        if r["capped"]:
            assert r["allocated"] == r["capacity"]
    # waterfill property: every uncapped language gets at least as much
    # as any capped one, and uncapped shares differ by at most 1
    capped = [r["allocated"] for r in rows if r["capped"]]
    open_ = [r["allocated"] for r in rows if not r["capped"]]
    assert open_, "E=3, B=total/2 must leave at least one uncapped language"
    if capped:
        assert min(open_) >= max(capped)
    assert max(open_) - min(open_) <= 1


def test_stream_join_exec_matches_batch_join(spark):
    got = sorted(
        (r["user_id"], r["click_id"], r["purchase_id"], r["delay_us"])
        for r in REG["stream_join_exec"].build(spark, SF_DIR_SMALL).collect()
    )
    ev = load(spark, SF_DIR_SMALL, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("c_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("p_ts"),
    )
    want = sorted(
        (r["u"], r["click_id"], r["purchase_id"], r["delay_us"])
        for r in c.join(
            p,
            (F.col("u") == F.col("pu"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            "u", "click_id", "purchase_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("delay_us"),
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_inverted_index_postings_checksum(spark):
    rows = REG["inverted_index"].build(spark, SF_DIR_SMALL).collect()
    assert rows and sorted(r["rank"] for r in rows) == list(
        range(1, len(rows) + 1)
    )
    # recompute the top term's posting list driver-side
    top = rows[0]
    d = load(spark, SF_DIR_SMALL, "documents")
    tf = {}
    for r in d.select("doc_id", "text").collect():
        k = sum(1 for t in (r["text"] or "").split(" ") if t == top["term"])
        if k:
            tf[r["doc_id"]] = k
    assert top["df"] == len(tf)
    assert top["total_tf"] == sum(tf.values())
    # round-5 contract, r10 hash: order-free checksum — SUM over postings
    # of the low 40 bits of xxhash64(doc_id, tf) (pins the posting
    # multiset while partial-aggregating map-side; md5's hex-string fold
    # was the measured 0.6-0.9 s slice of the sf10 ladder on BOTH the
    # codegen and kernel paths — PERF.md round 10)
    from lakehouse_spain_mobility_spark.functions.xxh64_sql import xxh64_pair_long

    check = sum(
        xxh64_pair_long(doc, k) & ((1 << 40) - 1) for doc, k in tf.items()
    )
    assert top["postings_check"] == str(check)
    # and the kernel form is bit-identical to the relational twin
    rel = REG["inverted_index_relational"].build(spark, SF_DIR_SMALL).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rel]
    # df ordering is the ranking contract
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)


def test_stream_stateful_exec_matches_batch_integers(spark):
    from lakehouse_spain_mobility_spark.functions.deterministic import micro

    got = {r["event_type"]: r.asDict()
           for r in REG["stream_stateful_exec"].build(spark, SF_DIR_SMALL).collect()}
    ev = load(spark, SF_DIR_SMALL, "events")
    want = {r["event_type"]: r.asDict()
            for r in ev.groupBy("event_type").agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.sum("event_id").cast("bigint").alias("id_checksum"),
                F.sum(micro(F.col("value"))).cast("bigint").alias("value_micros"),
            ).collect()}
    assert set(got) == set(want) and len(got) == 5
    for k in want:
        for c in ("n_events", "id_checksum", "value_micros"):
            assert got[k][c] == want[k][c]  # integers: bit-equal or bust


def test_boilerplate_removal_planted_template(spark):
    """Source with >= 4 docs sharing a template line drops it everywhere;
    the same line on a 2-doc source survives (per-source rule, not
    global dedup)."""
    import hashlib
    import os
    import tempfile

    import pandas as pd

    template = " ".join(f"t{i}" for i in range(15))  # exactly one line
    rows = []
    for i in range(5):  # source A: template + unique second line
        rows.append((i, f"{template} u{i}", "en", "srcA", 1))
    for i in range(2):  # source B: template only, below min-docs
        rows.append((10 + i, template, "en", "srcB", 1))
    rows.append((20, "", "en", "srcB", 0))  # empty doc
    docs = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(docs).write.mode("overwrite").parquet(
            os.path.join(td, "documents.parquet")
        )
        got = {r["doc_id"]: r.asDict()
               for r in REG["boilerplate_removal"].build(spark, td).collect()}
    def check(pairs):
        # the round-9 order-free multiset checksum (line_no-pinned):
        # 40-bit md5 prefix per (line_no, line) pair, hi/lo partial sums
        phs = [int(hashlib.md5(f"{no}:{line}".encode()).hexdigest()[:10], 16)
               for no, line in pairs]
        return str(sum(p >> 31 for p in phs) * (1 << 31)
                   + sum(p & ((1 << 31) - 1) for p in phs))

    for i in range(5):
        assert got[i]["n_lines"] == 2
        assert got[i]["n_boiler_lines"] == 1  # template dropped
        assert got[i]["clean_check"] == check([(1, f"u{i}")])
    for i in (10, 11):
        assert got[i]["n_boiler_lines"] == 0  # 2-doc source keeps it
        assert got[i]["clean_check"] == check([(0, template)])
    assert got[20]["n_lines"] == 0
    assert got[20]["clean_check"] == "0"


def test_python_datasource_pushdown_semantics(spark):
    """The reader's pushFilters must narrow generation (range pruning +
    bucket stride), and the query result must be invariant to whether
    Catalyst pushes or re-evaluates the predicates."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    from lakehouse_spain_mobility_spark.sources.pydatasource import (
        NBUCKETS,
        LedgerReader,
    )

    r = LedgerReader({})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("entry_id",), 10_000),
                LessThan(("entry_id",), 60_000),
                EqualTo(("bucket",), 3),
                EqualTo(("amount_cents",), 42),  # unsupported -> returned
            ]
        )
    )
    assert (r.lo, r.hi, r.bucket) == (10_000, 60_000, 3)
    assert len(leftover) == 1 and leftover[0].attribute == ("amount_cents",)
    parts = r.partitions()
    assert parts and all(lo < hi for lo, hi in (p.value for p in parts))
    ids = [row[0] for p in parts for row in r.read(p)]
    # strided generation: ONLY matching ids are ever produced
    assert ids and all(i % NBUCKETS == 3 and 10_000 <= i < 60_000 for i in ids)
    assert len(ids) == len(set(ids)) == (60_000 - 10_000) // NBUCKETS

    # engine-level: the scan result equals the closed form (Spark refuses
    # to run a pushFilters reader with pushdown disabled — the
    # DATA_SOURCE_PUSHDOWN_DISABLED guard — so "pushdown off" is not a
    # reachable state to compare against; the DuckDB oracle is the
    # independent recomputation instead)
    from collections import defaultdict
    from datetime import date, timedelta

    want = defaultdict(lambda: [0, 0, None, None])
    for i in ids:
        m = (date(2024, 1, 1) + timedelta(days=i % 365)).strftime("%Y-%m")
        w = want[m]
        w[0] += 1
        w[1] += (i * 97) % 10000
        w[2] = i if w[2] is None else min(w[2], i)
        w[3] = i if w[3] is None else max(w[3], i)
    got = {
        r["month"]: [r["n_entries"], r["total_cents"], r["first_id"], r["last_id"]]
        for r in REG["python_datasource_scan"].build(spark, SF_DIR_SMALL).collect()
    }
    assert got == dict(want)


def test_t_closeness_flags_skewed_groups(spark):
    """Groups whose sensitive distribution is disjoint from each other sit
    at TVD=0.5 against the 50/50 global; identically-distributed groups
    sit at 0. Exact closed-form check of the ppm outputs."""
    import os
    import tempfile

    import pandas as pd

    base = pd.Timestamp("2024-01-01 10:00:00")
    rows = []
    eid = 0
    # type 'skew': two QID groups (hh 10 / 11), disjoint sensitive users
    for hh, uid in ((10, 1), (11, 2)):
        for _ in range(4):
            rows.append((eid, base + pd.Timedelta(hours=hh - 10), uid, "skew", 50.0, "{}"))
            eid += 1
    # type 'mix': two QID groups, each 50/50 users 1 and 2 -> TVD 0
    for hh in (10, 11):
        for uid in (1, 1, 2, 2):
            rows.append((eid, base + pd.Timedelta(hours=hh - 10), uid, "mix", 50.0, "{}"))
            eid += 1
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(ev).write.mode("overwrite").parquet(
            os.path.join(td, "events.parquet")
        )
        got = {r["event_type"]: r.asDict()
               for r in REG["t_closeness_audit"].build(spark, td).collect()}
    assert got["skew"]["n_groups"] == 2
    assert got["skew"]["n_violating"] == 2  # TVD 0.5 > t=0.4
    assert got["skew"]["max_t_ppm"] == 500000
    assert got["mix"]["n_groups"] == 2
    assert got["mix"]["n_violating"] == 0
    assert got["mix"]["max_t_ppm"] == 0


def test_url_canonicalize_collapses_tracking_variants(spark):
    """doc_ids congruent mod 3000 with the same source/lang synthesize
    URLs differing only in case/port/fragment/tracking-params/param-order
    — they must collapse to one canonical URL; distinct paths must not."""
    import os
    import tempfile

    import pandas as pd

    docs = pd.DataFrame(
        [
            (1, "text a", "en", "src1", 6),
            (3001, "text b", "en", "src1", 6),  # same canonical as doc 1
            (2, "text c", "en", "src1", 6),  # different path/parity
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(docs).write.mode("overwrite").parquet(
            os.path.join(td, "documents.parquet")
        )
        rows = {r["host"]: r.asDict()
                for r in REG["url_canonicalize"].build(spark, td).collect()}
    assert set(rows) == {"src1.example.org"}
    r = rows["src1.example.org"]
    assert r["n_raw"] == 3 and r["n_canonical"] == 2
    assert r["dup_rate_ppm"] == 333333


def test_url_canonicalize_output_invariants(spark):
    rows = REG["url_canonicalize"].build(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["host"] == r["host"].lower()
        assert r["host"].endswith(".example.org") and ":" not in r["host"]
        assert 0 < r["n_canonical"] <= r["n_raw"]
        assert 0 <= r["dup_rate_ppm"] <= 1000000
