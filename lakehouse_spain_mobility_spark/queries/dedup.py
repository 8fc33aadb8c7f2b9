"""Deduplication queries over the ``documents`` table: exact, n-gram
Jaccard, MinHash+LSH (candidates → verified), SimHash."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from . import QuerySpec, register
from .tables import load


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return dd.exact_dedup_groups(d, "doc_id", "text")


_DEDUP_EXACT_SQL = dd.sql_exact_dedup_groups("documents", "doc_id", "text")

_SHINGLES_SQL = dd.sql_shingles("documents", "doc_id", "text")


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard ≥ 0.5 (the planted near-dup
    threshold in the corpus)."""
    d = load(spark, sf_dir, "documents")
    sh = dd.shingles(d, "doc_id", "text")
    return dd.jaccard_pairs(sh, min_jaccard=0.5)


_DEDUP_NGRAM_SQL = dd.sql_jaccard_pairs(_SHINGLES_SQL, min_jaccard=0.5)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: MinHash signatures → LSH band buckets → candidate pairs
    (the shuffle is bounded by bucket sizes, never O(n²))."""
    d = load(spark, sf_dir, "documents")
    sh = dd.shingles(d, "doc_id", "text")
    sigs = dd.minhash_signatures(sh)
    return dd.lsh_candidate_pairs(dd.lsh_bands(sigs))


_DEDUP_MINHASH_SQL = dd.sql_lsh_candidate_pairs(
    dd.sql_lsh_bands(dd.sql_minhash_signatures(_SHINGLES_SQL))
)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over 32-bit fingerprints at Hamming ≤ 3
    (16 bits saturates with collisions once the corpus passes a few
    hundred docs of shared vocabulary)."""
    d = load(spark, sf_dir, "documents")
    fps = dd.simhash_fingerprints(d, "doc_id", "text")
    return dd.simhash_pairs(fps, max_hamming=3)


_DEDUP_SIMHASH_SQL = dd.sql_simhash_pairs(
    dd.sql_simhash_fingerprints("documents", "doc_id", "text"), max_hamming=3
)


for _spec in [
    QuerySpec("dedup_exact", q_dedup_exact, _DEDUP_EXACT_SQL, "DD-exact", False,
              "Exact dedup groups via md5 hash-groupBy"),
    QuerySpec("dedup_ngram_jaccard", q_dedup_ngram_jaccard, _DEDUP_NGRAM_SQL, "DD-jaccard", True,
              "Word-3-gram Jaccard near-dup pairs (verification path)"),
    QuerySpec("dedup_minhash_lsh", q_dedup_minhash_lsh, _DEDUP_MINHASH_SQL, "DD-minhash", True,
              "MinHash signatures + LSH banding candidate pairs (scale path)"),
    QuerySpec("dedup_simhash", q_dedup_simhash, _DEDUP_SIMHASH_SQL, "DD-simhash", False,
              "SimHash 16-bit fingerprints, Hamming<=3 pair scan"),
]:
    register(_spec)
