"""Weighted PageRank over the nation-level trade graph.

Second iterative-algorithm family next to Lloyd k-means
(``operators/clustering.py``): fixed-iteration PageRank is SQL-expressible
by unrolling, so the whole computation stays inside the differential
correctness gate. The graph: an edge customer-nation → supplier-nation
weighted by lineitem count (the same join spine as TPC-H Q7), self-edges
excluded. Semantics: damping d=0.85, uniform teleport (1-d)/N over all
nations (nodes without in-edges keep the teleport mass; dangling mass is
not redistributed — identical convention on both engines).

Scale shape: the edge aggregation is the only heavy stage (one shuffle of
lineitem width-pruned to two keys after broadcast-joining the three dims);
each of the 3 iterations is a |nodes|-sized broadcast join + dsum
re-aggregation — at 1000 executors the per-iteration cost is a map-side
broadcast lookup plus a tiny shuffle on dst. Rank sums use fixed-point
aggregation so a different executor count cannot change a single output
bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, micro, sql_dsum, sql_micro
from . import QuerySpec, register
from .tables import load

_D = 0.85
_ITERS = 3

# Broadcast guard (same policy as operators/similarity.py MAX_BROADCAST_ROWS):
# the rank vector is a dimension table until it stops fitting in executor
# memory. 1M nodes × (name + double) ≈ 50 MB broadcast per iteration — past
# that the per-iteration F.broadcast would OOM the driver at web-graph vertex
# counts, so the rank join degrades to a plain shuffle join on src (still one
# shuffle per iteration, which is the textbook large-graph PageRank plan).
PAGERANK_BROADCAST_CAP = 1_000_000


def _pagerank_iterate(
    nodes: DataFrame,
    trans: DataFrame,
    n_nodes: int,
    iters: int = _ITERS,
    damping: float = _D,
    broadcast_cap: int = PAGERANK_BROADCAST_CAP,
) -> DataFrame:
    """The rank-propagation loop, rank-side join strategy guarded by
    ``broadcast_cap``: broadcast below it, shuffle join on ``src`` above it
    (plan-asserted both ways in tests/test_plans.py)."""
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iters):
        rank_side = ranks.select(F.col("node").alias("src"), "rank")
        if n_nodes <= broadcast_cap:
            rank_side = F.broadcast(rank_side)
        else:
            # Past the cap the rank vector no longer fits as a broadcast:
            # pin a shuffled-hash join on src (no sort needed for an
            # equi-join of two hash-partitioned sides; Catalyst would
            # otherwise auto-broadcast whatever its stale size stats allow).
            rank_side = rank_side.hint("shuffle_hash")
        contrib = (
            trans.join(rank_side, "src")
            .groupBy("dst")
            .agg(dsum(F.col("rank") * F.col("p")).alias("inflow"))
        )
        ranks = (
            nodes.join(contrib.select(F.col("dst").alias("node"), "inflow"), "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("rank"),
            )
        )
    return ranks


def _nation_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-scale edge build, un-checkpointed — factored out so the
    plan contract (dimension joins broadcast) stays assertable: the
    checkpoint in q_pagerank_nations truncates lineage, hiding this
    sub-plan from the outer query's plan string."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")

    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst"))
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


def q_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    # Lazy localCheckpoint (the graph.py frontier idiom): the edge
    # relation is LOOP-INVARIANT but referenced by every iteration plus
    # out_w and the final join — unrolled lineage re-derived the whole
    # fact-scale join pipeline per reference (measured: 27 final-tree
    # scan nodes → 3, sf0.1 3.8 s → 2.4 s with the checkpoint). The checkpointed
    # relation is domain-bounded (≤ |nations|² rows), and at web-graph
    # scale caching the edge/transition table across iterations is the
    # textbook plan. Cluster caveat (ADVICE r7): localCheckpoint stores
    # blocks executor-locally with TRUNCATED lineage — an executor loss or
    # dynamic-allocation decommission makes the job unrecoverable. On a
    # real cluster prefer persist(DISK_AND_MEMORY)+count (recoverable
    # lineage) or a reliable checkpoint dir; local mode has no executor to
    # lose, and the truncated lineage is what kills the per-iteration
    # re-derivation.
    edges = _nation_edges(spark, sf_dir).localCheckpoint(eager=False)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    trans = edges.join(out_w, "src").select(
        "src", "dst", (F.col("w").cast("double") / F.col("out_w").cast("double")).alias("p")
    )
    nodes = n.select(F.col("n_name").alias("node"))
    n_nodes = nodes.count()  # dimension-table cardinality: driver scalar, like gravity's k
    ranks = _pagerank_iterate(nodes, trans, n_nodes)
    return (
        ranks.join(out_w.select(F.col("src").alias("node"), "out_w"), "node", "left")
        .select(
            "node",
            micro(F.col("rank")).alias("rank_ppm"),
            F.coalesce(F.col("out_w"), F.lit(0)).cast("bigint").alias("out_weight"),
        )
    )


def _sql() -> str:
    it_prev = "it0"
    iters_sql = ""
    for k in range(1, _ITERS + 1):
        iters_sql += f""",
contrib{k} AS (
    SELECT t.dst, {sql_dsum(f'r.rank * t.p')} AS inflow
    FROM trans t JOIN {it_prev} r ON t.src = r.node
    GROUP BY t.dst
),
it{k} AS (
    SELECT n.node,
           ((CAST(1.0 AS DOUBLE) - CAST({_D} AS DOUBLE)) / nc.n_nodes) + {_D} * COALESCE(c.inflow, 0.0) AS rank
    FROM nodes n
    CROSS JOIN node_count nc
    LEFT JOIN contrib{k} c ON n.node = c.dst
)"""
        it_prev = f"it{k}"
    return f"""
WITH edges AS (
    SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY 1, 2
),
out_w AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
trans AS (
    SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(o.out_w AS DOUBLE) AS p
    FROM edges e JOIN out_w o ON e.src = o.src
),
nodes AS (SELECT n_name AS node FROM nation),
node_count AS (SELECT COUNT(*) AS n_nodes FROM nodes),
it0 AS (
    SELECT node, CAST(1.0 AS DOUBLE) / nc.n_nodes AS rank FROM nodes CROSS JOIN node_count nc
){iters_sql}
SELECT r.node,
       {sql_micro('r.rank')} AS rank_ppm,
       CAST(COALESCE(o.out_w, 0) AS BIGINT) AS out_weight
FROM it{_ITERS} r LEFT JOIN out_w o ON r.node = o.src
"""


register(
    QuerySpec(
        "pagerank_nations",
        q_pagerank_nations,
        _sql(),
        "GRAPH-pagerank,J2,A5",
        False,
        "Fixed-iteration weighted PageRank on the trade graph (unrolled-CTE oracle)",
    )
)


# --- Triangle counting -------------------------------------------------------
# The standard graph-analytics companion to PageRank/CC: count triangles
# on the undirected trade graph. Scale-canonical formulation (the one that
# survives skew): orient every edge low→high, then one self-join on the
# shared low vertex proposes wedges and one hash-semi-join closes them —
# cost O(Σ deg²) on the ORIENTED graph, which caps wedge fan-out at the
# low-degree endpoint (the classic Schank–Wagner trick), never O(n³).
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")

    pairs = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.least(F.col("c_nationkey"), F.col("s_nationkey")).alias("u"),
            F.greatest(F.col("c_nationkey"), F.col("s_nationkey")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 10)  # prune noise edges so the graph has structure
        .select("u", "v")
    )
    e1 = pairs.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = pairs.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    closing = pairs.select(F.col("u").alias("b"), F.col("v").alias("c"))
    triangles = wedges.join(closing, ["b", "c"], "left_semi")
    return (
        pairs.agg(F.count("*").cast("bigint").alias("n_edges"))
        .crossJoin(wedges.agg(F.count("*").cast("bigint").alias("n_wedges")))
        .crossJoin(triangles.agg(F.count("*").cast("bigint").alias("n_triangles")))
    )


_TRIANGLE_SQL = """
WITH pairs AS (
    SELECT u, v FROM (
        SELECT LEAST(c.c_nationkey, s.s_nationkey) AS u,
               GREATEST(c.c_nationkey, s.s_nationkey) AS v,
               COUNT(*) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE c.c_nationkey <> s.s_nationkey
        GROUP BY 1, 2
    ) WHERE w >= 10
),
wedges AS (
    SELECT e1.a, e1.b, e2.c FROM
        (SELECT u AS a, v AS b FROM pairs) e1
        JOIN (SELECT u AS a, v AS c FROM pairs) e2 USING (a)
    WHERE e1.b < e2.c
),
triangles AS (
    SELECT w.a, w.b, w.c FROM wedges w
    WHERE EXISTS (SELECT 1 FROM pairs p WHERE p.u = w.b AND p.v = w.c)
)
SELECT (SELECT COUNT(*) FROM pairs) AS n_edges,
       (SELECT COUNT(*) FROM wedges) AS n_wedges,
       (SELECT COUNT(*) FROM triangles) AS n_triangles
"""


register(
    QuerySpec(
        "triangle_count",
        q_triangle_count,
        _TRIANGLE_SQL,
        "GRAPH-triangles,J5",
        False,
        "Oriented-wedge triangle counting on the trade graph (Schank-Wagner, no O(n^3))",
    )
)
