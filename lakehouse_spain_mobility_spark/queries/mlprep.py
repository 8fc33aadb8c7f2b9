"""Training-data preparation operators: deterministic dataset splitting
and TF-IDF term statistics over the documents table.

Both are engine-portable by construction: the split key is an md5 prefix
(identical lowercase hex in Spark and DuckDB — no reliance on either
engine's private hash), and the only transcendental (ln in idf) is
rounded to 6 decimals on both sides.

Scale notes: the split is a narrow map (no shuffle) — at 100 TB it
streams; bucketing by hash prefix also makes the split stable under
re-partitioning and appends, unlike sample()/RAND which reshuffle
membership every run. TF-IDF is explode → two hash aggregations; the
token dictionary (distinct tokens) is the only reduce-side state, and
the doc-count scalar is collected once and broadcast as a literal
(same pattern as the gravity k constant, SURVEY §2.5 A5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import davg, dsum, sql_davg, sql_dsum
from . import QuerySpec, register
from .tables import load


# --- Deterministic train/val/test split -------------------------------------
def _split_col(key: F.Column) -> F.Column:
    """md5-prefix bucket: '00'..'bf' train (75%), 'c0'..'df' val (12.5%),
    'e0'..'ff' test (12.5%). Lexicographic compare on fixed-width lowercase
    hex == numeric compare on the first byte."""
    b = F.substring(F.md5(key.cast("string").cast("binary")), 1, 2)
    return (
        F.when(b < "c0", "train").when(b < "e0", "val").otherwise("test")
    )


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("split", _split_col(F.col("doc_id")))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            davg(F.col("n_chars").cast("double")).alias("avg_chars"),
        )
    )


_SPLIT_SQL = f"""
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e0' THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       {sql_davg('CAST(n_chars AS DOUBLE)')} AS avg_chars
FROM documents
GROUP BY 1
"""


# --- TF-IDF term statistics -------------------------------------------------
def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token document frequency, total term frequency, and idf
    (ln(N/df), 6-dp-rounded) for tokens seen in >= 5 documents."""
    d = load(spark, sf_dir, "documents")
    n_docs = d.count()  # grand-aggregate scalar -> literal (A5 pattern)
    tokens = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"),
    ).filter(F.col("token") != "")
    per_doc = tokens.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    return (
        per_doc.groupBy("token")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("total_tf"))
        .filter(F.col("df") >= 5)
        .withColumn(
            "idf6",
            F.round(F.log(F.lit(float(n_docs)) / F.col("df")) * 1000000.0)
            / F.lit(1000000.0),
        )
    )


_TFIDF_SQL = """
WITH tok AS (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
    FROM documents
),
per_doc AS (
    SELECT doc_id, token, COUNT(*) AS tf
    FROM tok WHERE token <> ''
    GROUP BY doc_id, token
)
SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
       ROUND(ln((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / COUNT(*)) * 1000000.0)
           / 1000000.0 AS idf6
FROM per_doc
GROUP BY token
HAVING COUNT(*) >= 5
"""


# --- Stratified deterministic sampling --------------------------------------
_STRATUM_THRESHOLDS = {"en": "40", "es": "80"}  # md5-prefix cut: 25% / 50%
_DEFAULT_THRESHOLD = "c0"  # 75% for every other language


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language downsampling with deterministic membership: a doc is
    kept iff its md5(doc_id) first byte is below the language's threshold
    (en 25%, es 50%, rest 75% — the up/down-weighting a training-mix
    pipeline applies). Membership is a pure function of doc_id, so it is
    stable under repartitioning, appends, and reruns — unlike
    ``sample()``/RAND — and the whole operator is a narrow map + one
    aggregation. Reports per-language totals, kept counts, the realized
    rate, and average kept-doc length."""
    d = load(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    thr = F.when(F.col("lang") == "en", _STRATUM_THRESHOLDS["en"]) \
        .when(F.col("lang") == "es", _STRATUM_THRESHOLDS["es"]) \
        .otherwise(_DEFAULT_THRESHOLD)
    kept = (b < thr).cast("int")
    return (
        d.select("lang", "n_chars", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("total_docs"),
            F.sum("kept").alias("kept_docs"),
            (F.sum("kept").cast("double") / F.count("*")).alias("realized_rate"),
            (
                dsum(F.when(F.col("kept") == 1, F.col("n_chars").cast("double")).otherwise(0.0))
                / F.sum("kept")
            ).alias("avg_kept_chars"),
        )
    )


_STRATIFIED_SQL = f"""
WITH tagged AS (
    SELECT lang, n_chars,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
                     (CASE lang WHEN 'en' THEN '{_STRATUM_THRESHOLDS["en"]}'
                                WHEN 'es' THEN '{_STRATUM_THRESHOLDS["es"]}'
                                ELSE '{_DEFAULT_THRESHOLD}' END)
                THEN 1 ELSE 0 END AS kept
    FROM documents
)
SELECT lang,
       COUNT(*) AS total_docs,
       CAST(SUM(kept) AS BIGINT) AS kept_docs,
       CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS realized_rate,
       ({sql_dsum("CASE WHEN kept = 1 THEN CAST(n_chars AS DOUBLE) ELSE 0.0 END")} / SUM(kept))
           AS avg_kept_chars
FROM tagged
GROUP BY lang
"""


# --- int8 scalar quantization of embeddings ---------------------------------
def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q = clamp(round(x/scale)), plus the reconstruction-error contract
    max|x - q*scale| <= scale/2. Every step is exact IEEE arithmetic in
    index order, so both engines produce bit-identical errors. At scale
    this is a narrow map that cuts vector storage 4x before ANN indexing."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    maxabs = F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double"))))
    scale = maxabs / F.lit(127.0)
    raw = F.transform(emb, lambda x: F.round(x.cast("double") / scale))
    q = F.transform(raw, lambda r: F.greatest(F.least(r, F.lit(127.0)), F.lit(-127.0)))
    max_err = F.array_max(
        F.zip_with(emb, q, lambda x, qi: F.abs(x.cast("double") - qi * scale))
    )
    return (
        e.select("vec_id", scale.alias("scale"), raw.alias("raw"), q.alias("q"), emb.alias("emb"))
        .select(
            "vec_id",
            "scale",
            F.size(F.filter("raw", lambda r: F.abs(r) > 127)).alias("n_clipped"),
            F.array_max(
                F.zip_with("emb", "q", lambda x, qi: F.abs(x.cast("double") - qi * F.col("scale")))
            ).alias("max_err"),
            (
                F.array_max(
                    F.zip_with("emb", "q", lambda x, qi: F.abs(x.cast("double") - qi * F.col("scale")))
                )
                <= F.col("scale") * F.lit(0.5000001)
            ).alias("err_ok"),
        )
    )


_QUANTIZE_SQL = """
WITH scaled AS (
    SELECT vec_id, embedding,
           list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max')
               / 127.0 AS scale
    FROM embeddings
),
quantized AS (
    SELECT vec_id, embedding, scale,
           list_transform(embedding, x -> ROUND(CAST(x AS DOUBLE) / scale)) AS raw
    FROM scaled
),
clamped AS (
    SELECT vec_id, embedding, scale, raw,
           list_transform(raw, r -> LEAST(GREATEST(r, -127.0), 127.0)) AS q
    FROM quantized
)
SELECT vec_id, scale,
       CAST(len(list_filter(raw, r -> abs(r) > 127)) AS INTEGER) AS n_clipped,
       list_aggregate(list_transform(list_zip(embedding, q),
           p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale)), 'max') AS max_err,
       list_aggregate(list_transform(list_zip(embedding, q),
           p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale)), 'max')
           <= scale * 0.5000001 AS err_ok
FROM clamped
"""


# --- k-means clustering (oracle: Lloyd unrolled as chained CTEs) ------------
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster size and inertia share after 4 Lloyd iterations (k=8,
    deterministic smallest-id init)."""
    from ..functions.deterministic import dsum
    from ..operators.clustering import kmeans

    e = load(spark, sf_dir, "embeddings")
    assigned, _history = kmeans(e, "vec_id", "embedding", k=8, iters=4)
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        dsum(F.col("sqdist")).alias("inertia"),
    )


_KM_DIM, _KM_K, _KM_ITERS = 64, 8, 4


def _km_dist(e: str = "emb.e", c: str = "c.c") -> str:
    # dimension-sequential squared-L2 fold — the exact accumulation order
    # of the Spark kernel (operators/clustering.py:_assign), so distances
    # (and therefore assignments and inertia) are bit-identical.
    return (
        f"list_reduce(list_transform(generate_series(1, {_KM_DIM}), "
        f"i -> (CAST({e}[i] AS DOUBLE) - {c}[i]) * (CAST({e}[i] AS DOUBLE) - {c}[i])), "
        f"(x, y) -> x + y)"
    )


def _kmeans_sql() -> str:
    """Lloyd's algorithm IS SQL-expressible for a fixed iteration count:
    unroll assign -> recompute as chained CTEs (init = k smallest ids;
    centroid means via the fixed-point davg; empty clusters keep the
    previous iteration's centroid via COALESCE)."""
    parts = [
        f"""emb AS (
    SELECT vec_id, embedding AS e FROM embeddings
), c0 AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
           list_transform(e, x -> CAST(x AS DOUBLE)) AS c
    FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {_KM_K})
)"""
    ]
    for it in range(1, _KM_ITERS + 1):
        parts.append(f"""a{it} AS (
    SELECT vec_id, cluster, dist FROM (
        SELECT emb.vec_id, c.cluster, {_km_dist()} AS dist,
               ROW_NUMBER() OVER (PARTITION BY emb.vec_id
                                  ORDER BY {_km_dist()}, c.cluster) AS rn
        FROM emb CROSS JOIN c{it - 1} c
    ) WHERE rn = 1
)""")
        if it < _KM_ITERS:
            parts.append(f"""x{it} AS (
    SELECT a.cluster, emb.e, unnest(generate_series(1, {_KM_DIM})) AS j
    FROM a{it} a JOIN emb USING (vec_id)
), m{it} AS (
    SELECT cluster, j, {sql_davg("CAST(e[j] AS DOUBLE)")} AS m
    FROM x{it} GROUP BY cluster, j
), g{it} AS (
    SELECT cluster, list(m ORDER BY j) AS c FROM m{it} GROUP BY cluster
), c{it} AS (
    SELECT p.cluster, COALESCE(g.c, p.c) AS c
    FROM c{it - 1} p LEFT JOIN g{it} g USING (cluster)
)""")
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT cluster, COUNT(*) AS n_vectors, {sql_dsum("dist")} AS inertia
FROM a{_KM_ITERS} GROUP BY cluster"""


_KMEANS_SQL = _kmeans_sql()


# --- Sequence packing (contiguous-stream bin assignment) ---------------------
_SEQ_LEN = 2048


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing accounting: docs are concatenated per
    language in doc_id order into a contiguous token stream cut into
    2048-token sequences; each doc is attributed to the bin where it
    starts. One window cumsum (partitioned by lang, ordered by the unique
    doc_id — deterministic) assigns bins without any pairwise logic, so
    packing parallelizes per language and, at 100 TB, per (lang,
    shard-range) partition. Reports bins, docs/bin, and mean bin load."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    toks = d.select("doc_id", "lang", n_tok.alias("n_tok"))
    binned = toks.select(
        "lang",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(_SEQ_LEN)).alias("bin"),
    )
    per_bin = binned.groupBy("lang", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("bin_tokens")
    )
    return per_bin.groupBy("lang").agg(
        F.count("*").alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("bin_tokens").alias("total_tokens"),
        davg(F.col("bin_tokens").cast("double")).alias("avg_bin_tokens"),
        F.max("n_docs").alias("max_docs_per_bin"),
    )


_PACKING_SQL = f"""
WITH toks AS (
    SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok FROM documents
),
binned AS (
    SELECT lang, n_tok,
           CAST(floor((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tok) / {_SEQ_LEN}) AS BIGINT) AS bin
    FROM toks
),
per_bin AS (
    SELECT lang, bin, COUNT(*) AS n_docs, SUM(n_tok) AS bin_tokens
    FROM binned GROUP BY lang, bin
)
SELECT lang,
       COUNT(*) AS n_bins,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
       {sql_davg('CAST(bin_tokens AS DOUBLE)')} AS avg_bin_tokens,
       MAX(n_docs) AS max_docs_per_bin
FROM per_bin
GROUP BY lang
"""


for _spec in [
    QuerySpec("sequence_packing", q_sequence_packing, _PACKING_SQL, "ML-packing", False,
              "Contiguous-stream sequence packing accounting via window cumsum"),
    QuerySpec("kmeans_clusters", q_kmeans_clusters, _KMEANS_SQL, "ML-cluster", False,
              "Iterative k-means (Lloyd): oracle unrolls 4 iterations as chained CTEs; "
              "dimension-sequential distance fold keeps inertia bit-identical"),
    QuerySpec("train_test_split", q_train_test_split, _SPLIT_SQL, "ML-split", False,
              "Deterministic md5-bucketed train/val/test split with per-split stats"),
    QuerySpec("stratified_sample", q_stratified_sample, _STRATIFIED_SQL, "ML-sample", False,
              "Per-language deterministic downsampling with stable md5 membership"),
    QuerySpec("quantize_int8", q_quantize_int8, _QUANTIZE_SQL, "ML-quant", False,
              "Symmetric int8 embedding quantization with reconstruction-error contract"),
    QuerySpec("tfidf_terms", q_tfidf_terms, _TFIDF_SQL, "ML-tfidf", False,
              "TF-IDF term statistics: df, total tf, rounded idf per token"),
]:
    register(_spec)


# --- weighted sampling without replacement (Efraimidis–Spirakis A-ES) --------
# Quality-weighted corpus subsampling: draw k documents WITHOUT replacement
# with inclusion probability proportional to a weight (here n_chars — the
# stand-in for a quality score). A-ES (Efraimidis & Spirakis 2006): each
# item gets key u^(1/w) with u ~ Uniform(0,1); the k largest keys ARE a
# weighted sample without replacement. Distributed virtue: keys are
# computed row-local (u from md5, so the "randomness" is deterministic and
# repartition-stable) and the k largest is the repo's standard heap top-k —
# one pass, no global sort, trivially mergeable across 1000 executors.
# Engine parity: ranking happens on ln(u)/w (monotone in u^(1/w)); the ln
# is quantized to 6 decimals (the repo's transcendental convention) before
# the one exact-input division, and ties (impossible in practice at 48-bit
# u) would break on doc_id.

_AES_K = 50
_AES_POW48P1 = f"{2 ** 48 + 1}e0"  # u = (W+1)/(2^48+1) ∈ (0, 1]


def _aes_key() -> str:
    """ln(u)/w from the 48-bit md5 value W and weight wt — identical text
    on both engines."""
    u = f"(CAST(wv + 1 AS DOUBLE) / {_AES_POW48P1})"
    lnq = f"(ROUND(ln({u}) * 1e6) / 1e6)"
    return f"({lnq} / CAST(wt AS DOUBLE))"


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.topk import global_topk
    from .sketches import _kmv_w

    d = load(spark, sf_dir, "documents")
    keyed = d.filter(F.col("n_chars") > 0).select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("wt"),
        F.expr(
            _kmv_w("md5(cast(cast(doc_id as string) as binary))")
        ).alias("wv"),
    ).withColumn("es_key", F.expr(_aes_key()))
    top = global_topk(
        keyed, _AES_K, [F.desc("es_key"), F.asc("doc_id")]
    )
    return top.select(
        F.col("rank").cast("bigint").alias("rank"),
        "doc_id",
        "wt",
        F.expr("CAST(ROUND(es_key * 1000000000.0) AS BIGINT)").alias("key_ppb"),
    )


def _aes_sql() -> str:
    from .sketches import _kmv_w

    return f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS wt,
         {_kmv_w("md5(CAST(doc_id AS VARCHAR))", spark_dialect=False)} AS wv
  FROM documents WHERE n_chars > 0
),
scored AS (
  SELECT doc_id, wt, {_aes_key()} AS es_key FROM keyed
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, wt,
       CAST(ROUND(es_key * 1000000000.0) AS BIGINT) AS key_ppb
FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id ASC) AS rank, *
  FROM scored
) WHERE rank <= {_AES_K}
"""


register(
    QuerySpec(
        "weighted_sample",
        q_weighted_sample,
        _aes_sql(),
        "ML-sample,TD-mix",
        False,
        "Efraimidis-Spirakis weighted sampling without replacement (k=50, deterministic md5 uniforms, heap top-k)",
    )
)


# --- curriculum ordering (difficulty deciles + stable intra-bin shuffle) -----
# Public method (curriculum learning, Bengio et al.): training data is
# ordered easy→hard, with examples SHUFFLED inside each difficulty bin.
# Difficulty proxy here is document length; bins are exact global deciles.
#
# 100 TB design — the value-domain CDF trick: a global NTILE would sort
# the whole corpus in one task (the SCALE.md single-partition
# pathology). Instead the decile boundary function is computed on the
# per-VALUE histogram: group by n_chars (bounded value domain — a few
# hundred distinct lengths regardless of corpus size), one running-sum
# window over that tiny relation (single-partition BY DESIGN: its input
# is |distinct values|, not |corpus|), and the resulting value→decile
# map broadcasts back onto the corpus as a map-side join. The intra-bin
# shuffle order is md5 (repartition/append-stable, the split-key
# convention); each bin's curriculum HEAD is elected with the salted
# two-phase group top-k, so no decile is ever sorted in one task.

CURRICULUM_HEAD = 3
_CURR_SALTS = 8


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.topk import salted_group_topk

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    hist = d.groupBy("n_chars").agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cdf = hist.select(
        "n_chars", (F.sum("c").over(w) - F.col("c")).alias("below")
    )
    total = hist.agg(F.sum("c").alias("total"))
    dmap = cdf.crossJoin(F.broadcast(total)).select(
        "n_chars",
        F.floor(F.col("below") * F.lit(10.0) / F.col("total"))
        .cast("int")
        .alias("decile"),
    )
    docs = d.join(F.broadcast(dmap), "n_chars").select(
        "decile",
        "doc_id",
        "n_chars",
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    )
    stats = docs.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("dec_docs"),
        F.sum("doc_id").cast("bigint").alias("dec_checksum"),
    )
    head = salted_group_topk(
        docs,
        ["decile"],
        F.col("doc_id"),
        CURRICULUM_HEAD,
        [F.asc("h"), F.asc("doc_id")],
        _CURR_SALTS,
    )
    return head.join(F.broadcast(stats), "decile").select(
        "decile",
        F.col("rk").cast("int").alias("rk"),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        "dec_docs",
        "dec_checksum",
    )


_CURRICULUM_SQL = f"""
WITH hist AS (SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY 1),
cdf AS (
    SELECT n_chars,
           SUM(c) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) - c AS below
    FROM hist
),
tot AS (SELECT COUNT(*) AS total FROM documents),
dmap AS (
    SELECT n_chars, CAST(FLOOR(below * 10.0 / total) AS INTEGER) AS decile
    FROM cdf, tot
),
docs AS (
    SELECT m.decile, d.doc_id, d.n_chars,
           md5(CAST(d.doc_id AS VARCHAR)) AS h
    FROM documents d JOIN dmap m USING (n_chars)
),
stats AS (
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS dec_docs,
           CAST(SUM(doc_id) AS BIGINT) AS dec_checksum
    FROM docs GROUP BY 1
),
ranked AS (
    SELECT decile, doc_id, n_chars,
           ROW_NUMBER() OVER (PARTITION BY decile ORDER BY h, doc_id) AS rk
    FROM docs
)
SELECT r.decile,
       CAST(r.rk AS INTEGER) AS rk,
       CAST(r.doc_id AS BIGINT) AS doc_id,
       CAST(r.n_chars AS BIGINT) AS n_chars,
       s.dec_docs,
       s.dec_checksum
FROM ranked r JOIN stats s USING (decile)
WHERE r.rk <= {CURRICULUM_HEAD}
"""


register(
    QuerySpec(
        "curriculum_order",
        q_curriculum_order,
        _CURRICULUM_SQL,
        "TD-mix,W1",
        False,
        "Curriculum ordering: value-domain CDF deciles, md5 intra-bin shuffle, salted per-bin heads",
    )
)
