"""Round-3c corpus-selection operators: duplicate-cluster representative
election and training-shard manifests.

They close the curation loop the existing families open: the dedup
family *detects* near-duplicates and clusters them (`dedup_clusters`);
the quality family *scores* documents (`quality_logreg`); these two
operators make the decisions a pipeline materializes from those signals:

- ``cluster_representatives`` — keep-BEST (not keep-first) per near-dup
  cluster: join the connected components of the Jaccard>=0.5 graph with
  the logistic quality scores and elect each multi-doc cluster's
  highest-scoring member (ties broken by doc_id). Real curation keeps
  the best duplicate, not the earliest — keep-first throws away the
  cleanest copy whenever it arrived late.
- ``shard_manifest`` — the materialize-the-mix step: deterministic
  md5-hash sharding into 16 shards with a per-shard manifest (doc count,
  token count, char count, doc_id range and checksum) — what a writer
  publishes next to each shard so a trainer can verify and resume.

Scale notes (100 TB):

- ``cluster_representatives`` adds exactly one per-component window to
  the CC machinery (`operators/graph.py`: one shuffle per round, 2-3
  rounds on near-dup cliques); the quality scores are scan-speed codegen
  (queries/curation.py). Near-dup components are small by construction
  (df-capped candidate generation), so the per-component rank never sees
  a giant group.
- ``shard_manifest`` is ONE hash aggregation on a 16-value key; the
  shard assignment is a pure md5 expression, so membership is stable
  under repartitioning and appends (the temperature_mix/train_test_split
  convention), and the manifest never moves document payloads — at a
  real 100 TB write the same expression becomes the partitionBy column
  of the writer and this query is its audit twin.

Reference anchor: the reference (a mobility lakehouse) has no corpus
curation surface; these extend the training-data north star alongside
queries/dedup.py, queries/curation.py and queries/webcur.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, register
from .curation import _LOGREG_SQL, q_quality_logreg
from .dedup import _DEDUP_NGRAM_SQL, MAX_SHINGLE_DF
from .tables import load
from ..functions.topk import salted_group_topk
from ..operators import dedup as dd
from ..operators.graph import connected_components, sql_connected_components

# --- keep-best representative per near-dup cluster ---------------------------


def q_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = dd.shingles(d, "doc_id", "text")
    edges = dd.capped_jaccard_pairs(
        sh, MAX_SHINGLE_DF, min_jaccard=0.5,
        broadcast_sizes=dd.docs_fit_broadcast(sf_dir),
    )
    cc = connected_components(edges.select("d1", "d2"))
    scores = q_quality_logreg(spark, sf_dir).select("doc_id", "score_ppm")
    members = cc.join(scores, cc.vertex == scores.doc_id).select(
        "component", "doc_id", "score_ppm"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("score_ppm"), F.asc("doc_id")
    )
    ranked = members.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("component")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).cast("bigint").alias(
                "rep_doc"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("score_ppm"))).cast("bigint").alias(
                "rep_score_ppm"
            ),
        )
        .filter(F.col("n_docs") >= 2)
        .withColumn("n_removed", (F.col("n_docs") - 1).cast("bigint"))
    )


def _reps_sql() -> str:
    edges = f"SELECT d1, d2 FROM ({_DEDUP_NGRAM_SQL})"
    cc = sql_connected_components(edges)
    return f"""
WITH cc AS ({cc}),
scored AS (SELECT doc_id, score_ppm FROM ({_LOGREG_SQL}) q),
ranked AS (
    SELECT cc.component, s.doc_id, s.score_ppm,
           ROW_NUMBER() OVER (PARTITION BY cc.component
                              ORDER BY s.score_ppm DESC, s.doc_id ASC) AS rn
    FROM cc JOIN scored s ON cc.vertex = s.doc_id
)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_doc,
       CAST(MAX(CASE WHEN rn = 1 THEN score_ppm END) AS BIGINT) AS rep_score_ppm,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_removed
FROM ranked GROUP BY component HAVING COUNT(*) >= 2
"""


# --- deterministic shard manifests -------------------------------------------

_N_SHARDS = 16
_HEX = "0123456789abcdef"


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # First md5 hex nibble of the stringified key — engine-portable and
    # stable under repartition/append (same convention as diversity_prune).
    shard = (
        F.instr(
            F.lit(_HEX),
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1),
        )
        - F.lit(1)
    ) % F.lit(_N_SHARDS)
    toks = F.size(F.array_remove(F.split(F.col("text"), " "), ""))
    return (
        d.select(
            shard.cast("int").alias("shard"),
            "doc_id",
            toks.alias("n_tok"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


_MANIFEST_SQL = f"""
SELECT CAST((instr('{_HEX}', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
            % {_N_SHARDS} AS INTEGER) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS n_tokens,
       CAST(SUM(len(text)) AS BIGINT) AS n_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM documents
GROUP BY 1
"""


register(
    QuerySpec(
        "cluster_representatives",
        q_cluster_representatives,
        _reps_sql(),
        survey="TD-dedup,TXT-clf",
        description="Keep-best per near-dup cluster: CC components joined with quality scores, argmax member",
    )
)
register(
    QuerySpec(
        "shard_manifest",
        q_shard_manifest,
        _MANIFEST_SQL,
        survey="TD-shard",
        description="Training-shard manifests: md5 hash sharding, per-shard doc/token/byte counts + checksums",
    )
)


# --- per-source quota capping (domain capping) -------------------------------
# Public method (RefinedWeb / CommonCrawl curation): web corpora are
# power-law concentrated per domain, so an uncapped corpus is mostly its
# top few hosts. The cap keeps at most QUOTA_CAP docs per source,
# electing the BEST ones (longest content, ties by doc_id), with the
# per-source population carried alongside for mix accounting.
#
# 100 TB design — the salted TWO-PHASE top-k:
#   phase 1 ranks within (source, salt) where salt = doc_id % QUOTA_SALTS,
#   so the hottest domain's sort is split across QUOTA_SALTS bounded
#   partitions (the skew dial: raise it with cluster width);
#   phase 2 re-ranks the <= QUOTA_SALTS*QUOTA_CAP survivors per source —
#   a provable superset of the true per-source top-CAP, so the final
#   rank is exact. A single per-source window (the naive form) would
#   sort the hottest domain in ONE task — the same single-partition
#   pathology SCALE.md bans for global top-k, one level down.
# The per-source totals are a map-side-combined count whose output is
# |sources| rows — broadcast back onto the <=CAP survivors.

QUOTA_CAP = 8
QUOTA_SALTS = 8


def q_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    kept = salted_group_topk(
        d, ["source"], F.col("doc_id"), QUOTA_CAP, order, QUOTA_SALTS
    )
    totals = d.groupBy("source").agg(F.count("*").cast("bigint").alias("src_total"))
    return kept.join(F.broadcast(totals), "source").select(
        "source",
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("rk").cast("int").alias("rk"),
        "src_total",
    )


_QUOTA_SQL = f"""
WITH ranked AS (
    SELECT source, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id ASC) AS rk,
           COUNT(*) OVER (PARTITION BY source) AS src_total
    FROM documents
)
SELECT source,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(rk AS INTEGER) AS rk,
       CAST(src_total AS BIGINT) AS src_total
FROM ranked
WHERE rk <= {QUOTA_CAP}
"""


register(
    QuerySpec(
        "source_quota_cap",
        q_source_quota_cap,
        _QUOTA_SQL,
        survey="TD-mix",
        description="Domain capping: salted two-phase keep-best top-N per source with population accounting",
    )
)
