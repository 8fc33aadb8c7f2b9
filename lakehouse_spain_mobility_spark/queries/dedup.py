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


# Discriminative-shingle cap (CCNet/RefinedWeb): shingles in > this many
# docs are corpus-common phrases, not copying evidence — dropping them
# bounds the Jaccard self-join at O(max_df · |shingles|), i.e. linear.
MAX_SHINGLE_DF = 32


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard ≥ 0.5 over df-capped shingles
    (≥ 0.5 is the planted near-dup threshold in the corpus)."""
    d = load(spark, sf_dir, "documents")
    # r10: fused posting-list form — the shingle frame has ONE consumer
    # (the posting aggregation), so no checkpoint; pair generation happens
    # inside the aggregated rows instead of a second+third shuffle of the
    # exploded corpus (operators/dedup.py:capped_jaccard_pairs).
    sh = dd.shingles(d, "doc_id", "text")
    return dd.capped_jaccard_pairs(
        sh, MAX_SHINGLE_DF, min_jaccard=0.5,
        broadcast_sizes=dd.docs_fit_broadcast(sf_dir),
    )


_CAPPED_SHINGLES_SQL = dd.sql_df_capped_shingles(_SHINGLES_SQL, MAX_SHINGLE_DF)
_DEDUP_NGRAM_SQL = dd.sql_jaccard_pairs(_CAPPED_SHINGLES_SQL, min_jaccard=0.5)


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


# --- End-to-end dedup pipeline ----------------------------------------------
def q_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pass a training-data pipeline runs: exact dedup
    (md5 keep-first) → MinHash/LSH candidates among survivors → Jaccard
    verification (≥0.5) restricted to candidates → keep-first removal;
    reported as per-lang funnel counts.

    Scale path: every stage is the bounded form — the verification join
    only sees shingles of candidate docs (semi-join pushes the candidate
    set into the scan), so the O(pairs) work is LSH-bounded, never corpus-
    wide. The shingle table feeds three consumers (signatures, the
    candidate semi-join, verification), so it is materialized once with
    localCheckpoint (MEMORY_AND_DISK — spill-safe) instead of being
    recomputed per consumer: 5.4s → 3.5s at sf0.1, and at 100 TB it
    saves two full explode+hash passes over the corpus. Reference
    analog: none (beyond-reference training-data surface).
    """
    from ..operators import text_analysis as ta

    from .tables import spread

    d = load(spark, sf_dir, "documents")
    exact_keep = dd.exact_dedup_groups(d, "doc_id", "text").select(
        F.col("keep_doc_id").alias("doc_id")
    )
    docs_kept = d.join(exact_keep, "doc_id", "left_semi")
    # Eager checkpoint, then spread: docs_kept is a post-shuffle frame that
    # AQE coalesces to ~1 partition at this data size, so the exploded
    # shingle frame (and every stage reading the checkpoint) would run
    # serial. spread() needs the REAL partition count, which only exists
    # after materialization — eager first, then the (conditional, no-op at
    # scale) repartition of the materialized rows (guide §2.5 input skew).
    sh = spread(
        dd.shingles(docs_kept, "doc_id", "text").localCheckpoint(eager=True), spark
    )
    cands = (
        dd.lsh_candidate_pairs(dd.lsh_bands(dd.minhash_signatures(sh)))
        .select("d1", "d2")
        .localCheckpoint(eager=False)
    )
    cand_docs = (
        cands.select(F.col("d1").alias("doc_id"))
        .union(cands.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    sh_c = sh.join(cand_docs, "doc_id", "left_semi")
    # r11 array verification (the prefix_filter_join move): the r10 form
    # ran jaccard_pairs over sh_c — a shingle self-join + pair
    # re-aggregation + two sizes joins, consuming the candidate-restricted
    # shingle frame three times (sizes, both join sides) and generating
    # pairs for EVERY co-shingled candidate-doc pair before intersecting
    # with cands. Here each candidate doc's (per-doc distinct) shingles
    # collapse once into an array — group state bounded by document
    # length, the committed spill argument of setjoin.py — the LSH pairs
    # join one row per side, and size(array_intersect) computes the exact
    # intersection in-row: sh_c has ONE consumer and only cands-pairs are
    # ever verified (guide §2.3/§3.3; paired same-session A/B, rows
    # identical: sf0.1 3.26 → 2.77 s, sf1 3.64 → 3.30 s min-of-3).
    arrs = sh_c.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("arr"), F.count("*").alias("n")
    )
    inter = (
        cands.join(
            arrs.select(F.col("doc_id").alias("d1"), F.col("arr").alias("a1"),
                        F.col("n").alias("n1")), "d1")
        .join(
            arrs.select(F.col("doc_id").alias("d2"), F.col("arr").alias("a2"),
                        F.col("n").alias("n2")), "d2")
        .withColumn("i", F.size(F.array_intersect("a1", "a2")))
    )
    verified = inter.filter(
        F.col("i").cast("double") / (F.col("n1") + F.col("n2") - F.col("i")) >= 0.5
    )
    removed = verified.select(F.col("d2").alias("doc_id")).distinct()
    flagged = (
        d.join(exact_keep.withColumn("is_kept", F.lit(1)), "doc_id", "left")
        .join(removed.withColumn("is_removed", F.lit(1)), "doc_id", "left")
    )
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("is_kept") == 1, 1)).alias("n_exact_kept"),
        F.count(
            F.when((F.col("is_kept") == 1) & F.col("is_removed").isNull(), 1)
        ).alias("n_final_kept"),
    )


def _dedup_pipeline_sql() -> str:
    from ..operators import text_analysis as ta

    sh_kept = dd.sql_shingles("docs_kept", "doc_id", "text")
    cands = dd.sql_lsh_candidate_pairs(dd.sql_lsh_bands(dd.sql_minhash_signatures("SELECT * FROM sh")))
    jac = dd.sql_jaccard_pairs("SELECT * FROM sh_c", min_jaccard=0.5)
    return f"""
WITH exact_keep AS (
    SELECT MIN(doc_id) AS doc_id FROM documents
    GROUP BY {ta.sql_fingerprint_md5('text')}
),
docs_kept AS (SELECT d.* FROM documents d JOIN exact_keep USING (doc_id)),
sh AS ({sh_kept}),
cands AS (SELECT d1, d2 FROM ({cands})),
cand_docs AS (SELECT d1 AS doc_id FROM cands UNION SELECT d2 FROM cands),
sh_c AS (SELECT sh.* FROM sh JOIN cand_docs USING (doc_id)),
verified AS (SELECT j.d1, j.d2 FROM ({jac}) j JOIN cands USING (d1, d2)),
removed AS (SELECT DISTINCT d2 AS doc_id FROM verified)
SELECT d.lang,
       COUNT(*) AS n_total,
       COUNT(CASE WHEN k.doc_id IS NOT NULL THEN 1 END) AS n_exact_kept,
       COUNT(CASE WHEN k.doc_id IS NOT NULL AND r.doc_id IS NULL THEN 1 END) AS n_final_kept
FROM documents d
LEFT JOIN exact_keep k ON d.doc_id = k.doc_id
LEFT JOIN removed r ON d.doc_id = r.doc_id
GROUP BY d.lang
"""


# --- Duplicate clusters: connected components over near-dup pairs -----------
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the near-dup *pair* set (word-3-gram Jaccard >= 0.5) into
    *clusters* via iterative min-label connected components, then report
    each multi-doc cluster (component representative, member count,
    docs-to-remove under keep-one). Pairwise keep-first over-deletes on
    chains A~B~C; the cluster view is what a curation pipeline actually
    acts on. Scale path: one shuffle per CC round, 2-3 rounds for the
    small-clique graphs near-dup corpora produce (see operators/graph.py).
    """
    from ..operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    sh = dd.shingles(d, "doc_id", "text")
    edges = dd.capped_jaccard_pairs(
        sh, MAX_SHINGLE_DF, min_jaccard=0.5,
        broadcast_sizes=dd.docs_fit_broadcast(sf_dir),
    )
    cc = connected_components(edges.select("d1", "d2"))
    return (
        cc.groupBy("component")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .withColumn("n_removed", F.col("n_docs") - 1)
    )


def _dedup_clusters_sql() -> str:
    from ..operators.graph import sql_connected_components

    edges = f"SELECT d1, d2 FROM ({_DEDUP_NGRAM_SQL})"
    cc = sql_connected_components(edges)
    return f"""
SELECT component, COUNT(*) AS n_docs, COUNT(*) - 1 AS n_removed
FROM ({cc}) cc
GROUP BY component
HAVING COUNT(*) >= 2
"""


# --- Edit-distance verification of LSH candidates ----------------------------
_EDIT_PREFIX = 120  # chars compared; bounds the O(m·n) DP per pair


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second verification signal for LSH candidate pairs: Levenshtein
    distance over the first 120 chars (both engines implement the same
    classic DP), normalized by the longer prefix. Jaccard sees shared
    vocabulary; edit distance sees ORDER — transposed near-dups score
    differently. Cost is bounded: the DP runs only on LSH candidates
    (never all pairs) and on fixed-length prefixes, so per-pair work is
    O(120²) regardless of document length."""
    d = load(spark, sf_dir, "documents")
    sh = dd.shingles(d, "doc_id", "text")
    cands = dd.lsh_candidate_pairs(dd.lsh_bands(dd.minhash_signatures(sh))).select("d1", "d2")
    pref = d.select("doc_id", F.substring("text", 1, _EDIT_PREFIX).alias("p"))
    t1 = pref.select(F.col("doc_id").alias("d1"), F.col("p").alias("p1"))
    t2 = pref.select(F.col("doc_id").alias("d2"), F.col("p").alias("p2"))
    dist = F.levenshtein("p1", "p2")
    longer = F.greatest(F.length("p1"), F.length("p2"))
    return (
        cands.join(t1, "d1")
        .join(t2, "d2")
        .select(
            "d1",
            "d2",
            dist.alias("edit_distance"),
            (dist.cast("double") / longer).alias("norm_distance"),
        )
    )


def _edit_distance_sql() -> str:
    cands = dd.sql_lsh_candidate_pairs(dd.sql_lsh_bands(dd.sql_minhash_signatures(_SHINGLES_SQL)))
    return f"""
WITH cands AS (SELECT d1, d2 FROM ({cands})),
pref AS (SELECT doc_id, substr(text, 1, {_EDIT_PREFIX}) AS p FROM documents)
SELECT d1, d2,
       levenshtein(p1.p, p2.p) AS edit_distance,
       CAST(levenshtein(p1.p, p2.p) AS DOUBLE) / GREATEST(len(p1.p), len(p2.p))
           AS norm_distance
FROM cands
JOIN pref p1 ON cands.d1 = p1.doc_id
JOIN pref p2 ON cands.d2 = p2.doc_id
"""


for _spec in [
    QuerySpec("dedup_edit_distance", q_dedup_edit_distance, _edit_distance_sql(), "DD-editdist", False,
              "Levenshtein verification of LSH candidates (order-sensitive signal)"),
    QuerySpec("dedup_clusters", q_dedup_clusters, _dedup_clusters_sql(), "DD-clusters", True,
              "Connected-components duplicate clusters over Jaccard>=0.5 pairs"),
    QuerySpec("dedup_pipeline", q_dedup_pipeline, _dedup_pipeline_sql(), "DD-pipeline", True,
              "End-to-end curation funnel: exact -> LSH candidates -> Jaccard verify -> keep-first"),
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


# --- MinHash-LSH recall contract --------------------------------------------
# The dedup analog of ann_recall: how much of the true Jaccard>=0.5 pair
# set do the 8-hash/2-band LSH candidates recover? One integer row that a
# pipeline operator watches when tuning (hashes, bands) — and a hard
# driver-checkable measurement of the quality/cost tradeoff the scale
# path makes.
def q_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.deterministic import micro

    from concurrent.futures import ThreadPoolExecutor

    d = load(spark, sf_dir, "documents")
    sh = dd.shingles(d, "doc_id", "text").localCheckpoint(eager=True)
    # Both pair sets feed two consumers each (their own COUNT and the hits
    # semi-join): checkpoint so the Jaccard posting pass and the full
    # MinHash/band pipeline run once, not twice. r11: the two branches are
    # independent job chains over the materialized sh — build them on a
    # 2-thread pool so their stages overlap deliberately (guide §2.6)
    # instead of via the lazy-checkpoint race the r10 form relied on.
    def _truth() -> DataFrame:
        return (
            dd.capped_jaccard_pairs(
                sh, MAX_SHINGLE_DF, min_jaccard=0.5,
                broadcast_sizes=dd.docs_fit_broadcast(sf_dir),
            )
            .select("d1", "d2")
            .localCheckpoint(eager=True)
        )

    def _cands() -> DataFrame:
        return (
            dd.lsh_candidate_pairs(dd.lsh_bands(dd.minhash_signatures(sh)))
            .select("d1", "d2")
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        ft, fc = pool.submit(_truth), pool.submit(_cands)
        truth, cands = ft.result(), fc.result()
    hits = truth.join(cands, ["d1", "d2"], "left_semi")
    return (
        truth.agg(F.count("*").alias("n_true"))
        .crossJoin(cands.agg(F.count("*").alias("n_candidates")))
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
        .select(
            "n_true",
            "n_candidates",
            "n_hits",
            # Zero guard: a degenerate corpus with no truth pairs must stay
            # engine-identical (Spark 0/0 → NULL, DuckDB → inf).
            micro(
                F.when(F.col("n_true") == 0, F.lit(0.0)).otherwise(
                    F.col("n_hits").cast("double") / F.col("n_true").cast("double")
                )
            ).alias("recall_ppm"),
        )
    )


def _minhash_recall_sql() -> str:
    from ..functions.deterministic import sql_micro

    truth = dd.sql_jaccard_pairs(_CAPPED_SHINGLES_SQL, min_jaccard=0.5)
    cands = dd.sql_lsh_candidate_pairs(dd.sql_lsh_bands(dd.sql_minhash_signatures(_SHINGLES_SQL)))
    return f"""
WITH truth AS (SELECT d1, d2 FROM ({truth})),
cands AS (SELECT d1, d2 FROM ({cands})),
hits AS (SELECT t.d1, t.d2 FROM truth t JOIN cands c ON t.d1 = c.d1 AND t.d2 = c.d2)
SELECT (SELECT COUNT(*) FROM truth) AS n_true,
       (SELECT COUNT(*) FROM cands) AS n_candidates,
       (SELECT COUNT(*) FROM hits) AS n_hits,
       {sql_micro('CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN 0.0 ELSE CAST((SELECT COUNT(*) FROM hits) AS DOUBLE) / CAST((SELECT COUNT(*) FROM truth) AS DOUBLE) END')}
           AS recall_ppm
"""


register(
    QuerySpec(
        "minhash_recall",
        q_minhash_recall,
        _minhash_recall_sql(),
        "DD-minhash,DD-jaccard",
        False,
        "LSH recall contract: candidates vs true Jaccard>=0.5 pairs, one integer row",
    )
)


# --- Containment pairs -------------------------------------------------------
# One-sided near-dup signal: containment(a,b) = |A∩B| / min(|A|,|B|)
# catches a short document embedded inside a long one, which symmetric
# Jaccard dilutes below threshold (|A∩B|/|A∪B| shrinks as the long side
# grows). Same df-capped shingle join as the Jaccard path — identical
# scale bound — with the min-size denominator; emitted in integer
# micro-units.
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.deterministic import micro

    d = load(spark, sf_dir, "documents")
    # r10: same fused posting-list shape as capped_jaccard_pairs — one
    # corpus exchange on shingle, pair enumeration inside the bounded
    # posting rows, one pair count (guide §2.3/§2.4). r11: eager
    # checkpoints (concurrent consumers), sizes materialized once, and
    # the broadcast hint gated on its real count (per-doc relation —
    # unbounded at corpus scale; see capped_jaccard_pairs).
    sh = dd.shingles(d, "doc_id", "text")
    post = dd.posting_lists(sh, MAX_SHINGLE_DF).localCheckpoint(eager=True)
    inter = dd.posting_pair_counts(post)
    sizes = dd.capped_sizes(post)
    bcast = dd.docs_fit_broadcast(sf_dir)
    if not bcast:
        sizes = sizes.localCheckpoint(eager=True)
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    if bcast:
        s1, s2 = F.broadcast(s1), F.broadcast(s2)
    cont = F.col("intersection").cast("double") / F.least("n1", "n2").cast("double")
    return (
        inter.join(s1, "d1")
        .join(s2, "d2")
        .filter(cont >= 0.8)
        .select("d1", "d2", "intersection", micro(cont).alias("containment_ppm"))
    )


def _containment_sql() -> str:
    from ..functions.deterministic import sql_micro

    c = "CAST(intersection AS DOUBLE) / CAST(LEAST(s1.n, s2.n) AS DOUBLE)"
    return f"""
WITH sh AS ({_CAPPED_SHINGLES_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
inter AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS intersection
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT d1, d2, intersection, {sql_micro(c)} AS containment_ppm
FROM inter
JOIN sizes s1 ON inter.d1 = s1.doc_id
JOIN sizes s2 ON inter.d2 = s2.doc_id
WHERE {c} >= 0.8
"""


register(
    QuerySpec(
        "dedup_containment",
        q_dedup_containment,
        _containment_sql(),
        "DD-containment",
        False,
        "One-sided containment near-dup pairs (|A∩B|/min — catches embedded sub-documents)",
    )
)
