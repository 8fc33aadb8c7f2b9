"""Advanced relational surface: the remaining partsupp-free TPC-H analogs
(Q21 waiting-supplier EXISTS/NOT-EXISTS, Q9 profit rollup), deterministic
correlation/covariance, argmax (max_by/arg_max), overlapping document
chunking for training-data prep, and CUBE aggregation.

The reference has no TPC workload (SURVEY §6); these extend the relational
battery the same way `tpch.py` does. The chunking query is a
training-data-pipeline extension (fixed-width overlapping windows over
`documents.text`, the shape an LLM-pretraining tokenizer feed uses).

Scale notes:
- Q21's two correlated quantifiers become one semi- and one anti-join on
  ``l_orderkey`` with a ``l_suppkey <>`` residual — both shuffle lineitem
  on the same key, so AQE reuses the exchange; no per-row subquery.
- Q9 broadcasts part/supplier/nation (dims), shuffling only on
  ``l_orderkey`` for the orders join, then one partial-agg shuffle on
  (nation, year).
- corr/covar run as a single map-side-combinable aggregation: six
  fixed-point sums per group, closing scalar math on the driver-free
  reduced row — the classic one-pass moments formulation.
- Chunking is a narrow explode: rows expand ~(len/stride)× with no
  shuffle; at 100 TB the output partitioning inherits the input's, and
  ``spark.sql.files.maxPartitionBytes`` bounds the expansion per task.
- argmax is a plain hash aggregate; the composite fixed-width key makes
  ties impossible, so the result is partition-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, sql_dsum
from . import QuerySpec, register
from .tables import load


# --- TPC-H Q21 analog: suppliers who kept orders waiting --------------------
# Classic Q21 needs l_commitdate/l_receiptdate; the synthetic lineitem has
# l_shipdate only, so "late" := shipped >60 days after o_orderdate.

_LATE_DAYS = 60


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > _LATE_DAYS
        ).alias("late"),
    )
    l1 = lo.filter("late")
    others = lo.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"),
        F.col("late").alias("late2"),
    )
    # EXISTS another supplier in the same order …
    waited = l1.join(
        others,
        (l1.l_orderkey == others.o2) & (l1.l_suppkey != others.s2),
        "left_semi",
    )
    # … and NOT EXISTS another supplier who was also late.
    others_late = others.filter("late2")
    sole = waited.join(
        others_late,
        (waited.l_orderkey == others_late.o2) & (waited.l_suppkey != others_late.s2),
        "left_anti",
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


_Q21_SQL = f"""
WITH lo AS (
    SELECT l.l_orderkey, l.l_suppkey,
           (date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))
              > {_LATE_DAYS}) AS late
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, COUNT(*) AS numwait
FROM lo l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lo l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


# --- TPC-H Q9 analog: product-type profit by nation and year ----------------
# No partsupp table, so profit omits the ps_supplycost term:
# sum(extendedprice * (1 - discount)) for parts whose name contains 'red'.


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red")).select("p_partkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year(F.col("o_orderdate").cast("timestamp")).alias("o_year")
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("profit"),
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(dsum(F.col("profit")).alias("sum_profit"))
    )


_Q9_SQL = f"""
SELECT n.n_name AS nation,
       EXTRACT(YEAR FROM CAST(o.o_orderdate AS TIMESTAMP)) AS o_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
GROUP BY nation, o_year
"""


# --- Deterministic correlation / covariance ---------------------------------
# One-pass moments: six order-independent fixed-point sums per group, then
# identical closing double expressions on both engines (sqrt is IEEE-exact,
# so equal inputs give equal bits).


def q_corr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("double")
    y = F.col("l_extendedprice")
    g = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
    )
    n = F.col("n_rows")
    cov_num = F.col("sxy") - F.col("sx") * F.col("sy") / n
    return g.select(
        "l_returnflag",
        "n_rows",
        (cov_num / (n - F.lit(1))).alias("covar_qty_price"),
        (
            cov_num
            / F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / n)
                * (F.col("syy") - F.col("sy") * F.col("sy") / n)
            )
        ).alias("corr_qty_price"),
    )


_CORR_SQL = f"""
WITH g AS (
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {sql_dsum('CAST(l_quantity AS DOUBLE)')} AS sx,
           {sql_dsum('l_extendedprice')} AS sy,
           {sql_dsum('CAST(l_quantity AS DOUBLE) * l_extendedprice')} AS sxy,
           {sql_dsum('CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)')} AS sxx,
           {sql_dsum('l_extendedprice * l_extendedprice')} AS syy
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows,
       (sxy - sx * sy / n_rows) / (n_rows - 1) AS covar_qty_price,
       (sxy - sx * sy / n_rows)
         / sqrt((sxx - sx * sx / n_rows) * (syy - sy * sy / n_rows))
         AS corr_qty_price
FROM g
"""


# --- argmax battery: max_by / min_by <-> arg_max / arg_min ------------------
# Composite fixed-width key (offset-scaled acctbal || name) makes the
# ordering total, so the winner is unique and partition-order-independent.

_KEY_EXPR = (
    "lpad(CAST(CAST(round((c_acctbal + 1000.0) * 100.0) AS BIGINT) AS VARCHAR), 10, '0')"
    " || c_name"
)


def q_argmax_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    key = F.concat(
        F.lpad(
            F.round((F.col("c_acctbal") + F.lit(1000.0)) * F.lit(100.0))
            .cast("bigint")
            .cast("string"),
            10,
            "0",
        ),
        F.col("c_name"),
    )
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.max_by(F.col("c_name"), key).alias("richest_customer"),
        F.min_by(F.col("c_name"), key).alias("poorest_customer"),
        F.max(F.col("c_acctbal")).alias("max_acctbal"),
        F.min(F.col("c_acctbal")).alias("min_acctbal"),
    )


_ARGMAX_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       arg_max(c_name, {_KEY_EXPR}) AS richest_customer,
       arg_min(c_name, {_KEY_EXPR}) AS poorest_customer,
       MAX(c_acctbal) AS max_acctbal,
       MIN(c_acctbal) AS min_acctbal
FROM customer
GROUP BY c_mktsegment
"""


# --- Overlapping document chunking (training-data prep) ---------------------
# Fixed-width windows (256 chars) at a 200-char stride — the standard
# pretraining chunker shape. Narrow explode, no shuffle; chunk identity is
# hashed so the parity check covers content, not just counts.

_CHUNK_WIDTH = 256
_CHUNK_STRIDE = 200


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_last = F.floor((F.length("text") - F.lit(1)) / F.lit(_CHUNK_STRIDE)).cast("int")
    chunks = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_last)).alias("chunk_id"),
    )
    chunk = F.expr(
        f"substring(text, chunk_id * {_CHUNK_STRIDE} + 1, {_CHUNK_WIDTH})"
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.md5(chunk).alias("chunk_hash"),
        F.length(chunk).alias("chunk_len"),
    )


# DuckDB 1.0.0 cannot bind a lateral generate_series(0, f(d.text)); the
# portable form is unnest(generate_series(...)) in the SELECT list over a CTE
# (same pattern as queries/text.py chunk_dedup oracle).
_CHUNK_SQL = f"""
WITH idx AS (
    SELECT doc_id, text,
           unnest(generate_series(
               0, CAST(floor((length(text) - 1) / {_CHUNK_STRIDE}.0) AS BIGINT)
           )) AS gs
    FROM documents
    WHERE length(text) > 0
)
SELECT doc_id,
       CAST(gs AS INTEGER) AS chunk_id,
       md5(substr(text, CAST(gs AS INTEGER) * {_CHUNK_STRIDE} + 1, {_CHUNK_WIDTH}))
           AS chunk_hash,
       length(substr(text, CAST(gs AS INTEGER) * {_CHUNK_STRIDE} + 1, {_CHUNK_WIDTH}))
           AS chunk_len
FROM idx
"""


# --- CUBE aggregation --------------------------------------------------------


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
        F.grouping_id().cast("int").alias("gid"),
    )


_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total_price,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


for _spec in [
    QuerySpec("tpch_q21", q_tpch_q21, _Q21_SQL, "J5-semi,J-anti,A8", False,
              "TPC-H Q21 analog: EXISTS + NOT-EXISTS waiting-supplier quantifiers"),
    QuerySpec("tpch_q9", q_tpch_q9, _Q9_SQL, "J2,A3", False,
              "TPC-H Q9 analog: profit by nation and order year (3 broadcast dims)"),
    QuerySpec("corr_battery", q_corr_battery, _CORR_SQL, "A1-moments", False,
              "Deterministic corr/covar via one-pass fixed-point moments"),
    QuerySpec("argmax_battery", q_argmax_battery, _ARGMAX_SQL, "A7-arg", False,
              "max_by/min_by vs arg_max/arg_min on a tie-proof composite key"),
    QuerySpec("doc_chunking", q_doc_chunking, _CHUNK_SQL, "TD-chunking", False,
              "Overlapping fixed-width text chunking (256w/200s), hashed chunks"),
    QuerySpec("cube_agg", q_cube_agg, _CUBE_SQL, "A-cube", False,
              "CUBE over status x priority with grouping ids"),
]:
    register(_spec)


# --- frequent itemset mining (market-basket, A-priori pruned) ----------------
# Public method (Agrawal & Srikant 1994): find item PAIRS that co-occur
# in many baskets. Basket := order; item := p_brand of the ordered parts.
# The A-priori property prunes before any pair is enumerated: a pair can
# only reach pair-support if BOTH items reach item-support, so the
# within-basket self-join runs over support-filtered items only. The
# training-data analog is co-occurrence mining over tag/source sets.
#
# 100 TB shape: item counting is ONE map-side-combinable hash agg; the
# pair enumeration is a within-basket self-join whose fan-out is bounded
# by (frequent items per basket choose 2) — baskets have ≤7 line items,
# so ≤21 pair rows per basket, and the support floor caps the item
# domain at ≤|brands| regardless of corpus size. Supports compare as
# integers (cnt·100 ≥ N) — no float thresholds to drift; lift is a
# ppm-quantized output column. Top-20 via the heap top-k discipline.

_FIS_ITEM_PCT = 100   # item support floor: cnt * 100 >= N  (1%)
_FIS_PAIR_PCT = 500   # pair support floor: cnt * 500 >= N  (0.2%)
_FIS_TOPK = 20


def q_frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.topk import global_topk

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # ONE wide exchange for the whole query: repartition the joined
    # (order, brand) projection on the basket key up front. hash(o)
    # satisfies every downstream clustered requirement (distinct on
    # (o,item), distinct on o, the pair self-join on o — the scd2_history
    # subset-key idiom), and because all consumers share the identical
    # exchange subtree, ReuseExchange materializes it once. NOT a
    # localCheckpoint: a 57M-row checkpoint under the 8 GB local heap got
    # its blocks evicted at sf10 and, with lineage truncated, the query
    # died ("Block rdd_* does not exist") — exchange reuse keeps lineage.
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("item"))
        .repartition(F.col("o"))
        .distinct()
    )
    n_baskets = baskets.select("o").distinct().agg(
        F.count("*").cast("bigint").alias("n_baskets")
    )
    item_cnt = baskets.groupBy("item").agg(
        F.count("*").cast("bigint").alias("sup")
    )
    freq = (
        item_cnt.crossJoin(F.broadcast(n_baskets))
        .filter(F.col("sup") * _FIS_ITEM_PCT >= F.col("n_baskets"))
        .select("item", "sup")
    )
    fb = baskets.join(F.broadcast(freq.select("item")), "item", "left_semi")
    pairs = (
        fb.select("o", F.col("item").alias("item_a"))
        # merge hint: AQE's shuffled-hash conversion builds a per-partition
        # hash map of a fact-sized side (no spill path) — OOM'd the 8 GB
        # local heap at sf30. Sort-merge spills; both sides are already
        # hash(o)-clustered so the sorts are partition-local.
        .hint("merge")
        .join(fb.select("o", F.col("item").alias("item_b")), "o")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("bigint").alias("sup_ab"))
    )
    scored = (
        pairs.crossJoin(F.broadcast(n_baskets))
        .filter(F.col("sup_ab") * _FIS_PAIR_PCT >= F.col("n_baskets"))
        .join(
            F.broadcast(freq.select(F.col("item").alias("item_a"),
                                    F.col("sup").alias("sup_a"))),
            "item_a",
        )
        .join(
            F.broadcast(freq.select(F.col("item").alias("item_b"),
                                    F.col("sup").alias("sup_b"))),
            "item_b",
        )
    )
    from ..functions.deterministic import micro

    lift = (
        F.col("sup_ab").cast("double")
        * F.col("n_baskets")
        / (F.col("sup_a") * F.col("sup_b"))
    )
    out = scored.select(
        "item_a", "item_b", F.col("sup_ab").alias("support"),
        micro(lift).alias("lift_ppm"),
    )
    return global_topk(
        out, _FIS_TOPK,
        [F.desc("support"), F.asc("item_a"), F.asc("item_b")],
    ).select("rank", "item_a", "item_b", "support", "lift_ppm")


def _fis_sql() -> str:
    from ..functions.deterministic import sql_micro

    lift = "CAST(sup_ab AS DOUBLE) * n_baskets / (sup_a * sup_b)"
    return f"""
WITH baskets AS (
    SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS item
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
nb AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_baskets FROM baskets),
item_cnt AS (
    SELECT item, CAST(COUNT(*) AS BIGINT) AS sup FROM baskets GROUP BY item
),
freq AS (
    SELECT item, sup FROM item_cnt, nb WHERE sup * {_FIS_ITEM_PCT} >= n_baskets
),
fb AS (SELECT b.o, b.item FROM baskets b WHERE b.item IN (SELECT item FROM freq)),
pairs AS (
    SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS sup_ab
    FROM fb a JOIN fb b ON a.o = b.o AND a.item < b.item
    GROUP BY 1, 2
),
scored AS (
    SELECT p.item_a, p.item_b, p.sup_ab, fa.sup AS sup_a, fb2.sup AS sup_b,
           nb.n_baskets
    FROM pairs p CROSS JOIN nb
    JOIN freq fa ON p.item_a = fa.item
    JOIN freq fb2 ON p.item_b = fb2.item
    WHERE p.sup_ab * {_FIS_PAIR_PCT} >= nb.n_baskets
)
SELECT rank, item_a, item_b, support, lift_ppm FROM (
    SELECT ROW_NUMBER() OVER (
               ORDER BY sup_ab DESC, item_a ASC, item_b ASC) AS rank,
           item_a, item_b, sup_ab AS support,
           {sql_micro(lift)} AS lift_ppm
    FROM scored
) WHERE rank <= {_FIS_TOPK}
"""


register(
    QuerySpec(
        "frequent_itemsets",
        q_frequent_itemsets,
        _fis_sql(),
        "A3,J3,TD-cooccur",
        False,
        "A-priori-pruned frequent brand pairs per order basket with ppm lift, heap top-20",
    )
)
