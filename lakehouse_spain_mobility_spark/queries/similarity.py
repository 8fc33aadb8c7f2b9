"""Similarity-search queries over the ``embeddings`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import davg, sql_davg
from ..operators import similarity as sim
from . import QuerySpec, register
from .tables import load


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding"), F.col("label")
    )


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for the first 10 vectors as queries."""
    v = _vectors(spark, sf_dir)
    return sim.knn_bruteforce(v.filter(F.col("id") < 10), v, k=5)


_KNN_SQL = f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {sim.sql_cosine('q.embedding', 'c.embedding')} AS cosine
    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 10
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
    FROM scored
)
SELECT * FROM ranked WHERE rank <= 5
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH sign-bucketed candidate pairs with exact cosine re-scoring."""
    v = _vectors(spark, sf_dir)
    return sim.ann_lsh_pairs(v, n_bits=8)


_ANN_LSH_SQL = f"""
WITH withb AS (
    SELECT vec_id AS id, embedding,
           {sim.sql_sign_bucket('embedding', 8)} AS bucket
    FROM embeddings
)
SELECT a.bucket, a.id AS v1, b.id AS v2,
       {sim.sql_cosine('a.embedding', 'b.embedding')} AS cosine
FROM withb a JOIN withb b ON a.bucket = b.bucket AND a.id < b.id
"""


def q_embedding_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup shortlist: global top-20 most similar
    pairs via the broadcast-numpy brute-force kernel (bit-identical to the
    SQL oracle thanks to dimension-sequential accumulation)."""
    v = _vectors(spark, sf_dir)
    return sim.topk_pairs_broadcast_numpy(v, k=20)


_EMB_TOPK_SQL = f"""
SELECT a.vec_id AS v1, b.vec_id AS v2,
       {sim.sql_cosine('a.embedding', 'b.embedding')} AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
ORDER BY cosine DESC, v1, v2
LIMIT 20
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components via posexplode (vector averaging as a
    relational rollup — row form keeps it engine-portable)."""
    v = _vectors(spark, sf_dir)
    exploded = v.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    ).select("label", (F.col("pos") + 1).alias("dim"), F.col("val").cast("double").alias("val"))
    return (
        exploded.groupBy("label", "dim")
        .agg(davg(F.col("val")).alias("avg_val"), F.count("*").alias("n_vecs"))
        .filter(F.col("dim") <= 8)
    )


_LABEL_CENTROIDS_SQL = f"""
SELECT label, CAST(i AS INTEGER) AS dim,
       {sql_davg('CAST(embedding[i] AS DOUBLE)')} AS avg_val,
       COUNT(*) AS n_vecs
FROM embeddings, generate_series(1, 8) t(i)
GROUP BY label, i
"""


for _spec in [
    QuerySpec("knn_bruteforce", q_knn_bruteforce, _KNN_SQL, "SIM-knn", True,
              "Exact cosine top-5 neighbors (brute-force baseline)"),
    QuerySpec("ann_lsh", q_ann_lsh, _ANN_LSH_SQL, "SIM-lsh", False,
              "Sign-bit LSH bucketed ANN candidate pairs"),
    QuerySpec("embedding_topk_pairs", q_embedding_topk_pairs, _EMB_TOPK_SQL, "DD-embedding", True,
              "Embedding-cosine near-dup top-20 pair shortlist"),
    QuerySpec("label_centroids", q_label_centroids, _LABEL_CENTROIDS_SQL, "SIM-centroid", False,
              "Per-label embedding centroid components"),
]:
    register(_spec)
