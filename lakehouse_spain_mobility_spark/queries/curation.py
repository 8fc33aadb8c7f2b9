"""Round-3 corpus-curation operators over the documents/embeddings tables.

Four training-data-pipeline operators the round-2 inventory lacked, each
engine-portable by construction (integer/ppm outputs, md5 keys, matched
IEEE expression shapes — the repo's standard parity conventions):

- ``substring_span_dedup`` — exact duplicated-substring *span* detection
  (the "Deduplicating Training Data Makes Language Models Better"
  operator, arXiv:2107.06499): mark every token k-gram whose hash occurs
  in >= 2 distinct documents, then merge overlapping marked windows into
  maximal spans per document (gaps-and-islands). Unlike document-level
  near-dedup (dedup_minhash_lsh), this finds *embedded* duplicated
  passages and reports how much of each document is boilerplate.
- ``temperature_mix`` — multi-source mixing weights with alpha-temperature
  rebalancing (alpha = 0.5, the multilingual-LM convention): per-language
  weights w_l ∝ n_l^alpha, deterministic keep-decision per document via a
  Knuth multiplicative hash so membership is stable under repartition.
- ``diversity_prune`` — cluster-balanced corpus pruning: bucket embeddings
  by sign-contrast LSH bits, cap every bucket at a fixed fraction of the
  corpus (md5-ordered keep-first), report per-bucket kept/dropped — the
  quota-sampling step of DataComp-style curation.
- ``vocab_growth`` — Heaps'-law vocabulary-growth profile: new vs
  cumulative token types per corpus decile, the standard corpus-health
  diagnostic for tokenizer planning.

Scale notes (100 TB): every operator here is linear and shuffle-light.
substring_span_dedup never enumerates document *pairs* — duplicated grams
are marked with one hash aggregation and joined back (semi join), so cost
is O(total grams) regardless of how many documents share a passage (the
all-pairs trap the LSH family avoids is structurally absent here too);
the island merge is one window over (doc_id, start_pos). temperature_mix
and vocab_growth reduce to one hash aggregation each plus a broadcast
scalar (the A5 pattern). diversity_prune is one shuffle on a 16-value
bucket key; at real scale the row_number-per-bucket ranking would be
salted or replaced by a per-bucket threshold on the md5 key itself
(documented in SCALE.md) — the quota semantics are unchanged.

Reference anchor: the reference has no corpus-curation surface at all
(it is a mobility lakehouse); these extend the BASELINE.json
training-data north star alongside queries/dedup.py and queries/lm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, register
from .tables import load, spread

# --- exact duplicated-substring spans ---------------------------------------

_K = 8  # tokens per window; spans are maximal unions of duplicated windows

_TOKENIZE = "[^a-z]+"


def _tokens_col() -> F.Column:
    return F.array_remove(F.split(F.lower("text"), _TOKENIZE), "")


def q_substring_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span accounting: token count, number of
    maximal duplicated spans, tokens covered by them, and coverage ppm."""
    d = load(spark, sf_dir, "documents")
    # Spread the tokenize+explode across all cores BEFORE the checkpoint:
    # the few-file scan otherwise pins the ~100× gram expansion to the
    # scan's partition count (measured at sf30: 4 partitions, 4.4 GiB
    # cached blocks spilling to disk, 28 idle cores — trap #11). spread()
    # skips the exchange when the scan is already wide enough.
    toks = spread(d, spark).select("doc_id", _tokens_col().alias("l"))
    # Guard: Spark's sequence(1, stop) is DESCENDING for stop < 1, so an
    # under-length document must yield an empty start list explicitly.
    starts = F.when(
        F.size("l") >= _K, F.sequence(F.lit(1), F.size("l") - F.lit(_K - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id", F.explode(starts).alias("start_pos"), "l"
    ).select(
        "doc_id",
        "start_pos",
        F.md5(
            F.array_join(F.slice(F.col("l"), F.col("start_pos"), _K), " ").cast(
                "binary"
            )
        ).alias("gh"),
    ).repartition(F.col("gh"))
    # ^ ONE spill-safe exchange instead of the round-3 localCheckpoint:
    # the checkpoint materialized the ~100×-exploded gram relation in the
    # block manager (measured sf30: 4 × 4.4 GiB deserialized blocks; with
    # 32-way parallelism the concurrent materialization OOM'd the 8 GB
    # heap outright — SCALE.md §8g). Both consumers (the dup agg and the
    # mark-back semi join) require hash(gh), so ReuseExchange shuffles
    # the grams once and everything downstream is exchange-free; the
    # shuffle streams and spills, it never holds the relation.
    # One hash aggregation marks cross-document grams; no pair enumeration.
    # "occurs in >= 2 distinct documents" ≡ min(doc_id) != max(doc_id) —
    # COUNT(DISTINCT doc_id) would expand to a two-level aggregate and
    # shuffle the gram relation TWICE ((gh,doc_id) then gh); min/max are
    # plain partial aggregates, so the grams shuffle once (VERDICT r3 #3).
    dup = (
        grams.groupBy("gh")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("gh")
    )
    marked = grams.join(dup, "gh", "left_semi").select(
        "doc_id",
        "start_pos",
        (F.col("start_pos") + F.lit(_K - 1)).alias("end_pos"),
    )
    # Gaps-and-islands: a window starts a new span iff it begins past the
    # running max end + 1 (adjacent windows merge — they share k-1 tokens).
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("start_pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        marked.withColumn("prev_end", F.max("end_pos").over(w_prev))
        .withColumn(
            "new_span",
            F.when(
                F.col("start_pos") > F.coalesce(F.col("prev_end"), F.lit(-1)) + 1, 1
            ).otherwise(0),
        )
        .withColumn("span_id", F.sum("new_span").over(w_run))
    )
    spans = islands.groupBy("doc_id", "span_id").agg(
        (F.max("end_pos") - F.min("start_pos") + 1).alias("span_len")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"), F.sum("span_len").alias("dup_tokens")
    )
    base = toks.select("doc_id", F.size("l").cast("bigint").alias("n_tokens"))
    joined = base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("bigint").alias("n_dup_spans"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias("dup_tokens"),
    )
    return joined.withColumn(
        "dup_ratio_ppm",
        F.when(F.col("n_tokens") == 0, F.lit(0)).otherwise(
            F.round(F.col("dup_tokens") * 1000000.0 / F.col("n_tokens"))
        ).cast("bigint"),
    )


_SPAN_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{_TOKENIZE}'), x -> x <> '') AS l
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(range(1, CASE WHEN len(l) >= {_K} THEN len(l) - {_K - 1} ELSE 0 END + 1)) AS start_pos,
         l
  FROM toks
), hashed AS (
  SELECT doc_id, start_pos,
         md5(array_to_string(list_slice(l, start_pos, start_pos + {_K - 1}), ' ')) AS gh
  FROM grams
), dup AS (
  SELECT gh FROM hashed GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2
), marked AS (
  SELECT doc_id, start_pos, start_pos + {_K - 1} AS end_pos
  FROM hashed WHERE gh IN (SELECT gh FROM dup)
), islands AS (
  SELECT doc_id, start_pos, end_pos,
         SUM(CASE WHEN start_pos > COALESCE(prev_end, -1) + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY start_pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
  FROM (
    SELECT doc_id, start_pos, end_pos,
           MAX(end_pos) OVER (PARTITION BY doc_id ORDER BY start_pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
    FROM marked
  ) m
), spans AS (
  SELECT doc_id, span_id, MAX(end_pos) - MIN(start_pos) + 1 AS span_len
  FROM islands GROUP BY doc_id, span_id
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_dup_spans, SUM(span_len) AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.l) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(CASE WHEN len(t.l) = 0 THEN 0
                 ELSE ROUND(CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) * 1000000.0
                            / CAST(len(t.l) AS BIGINT)) END AS BIGINT) AS dup_ratio_ppm
FROM toks t LEFT JOIN per_doc p USING (doc_id)
"""


# --- alpha-temperature source mixing ----------------------------------------

_KNUTH = 2654435761  # Knuth multiplicative hash; mod 2^32 below
_M32 = 4294967296


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mixing weights w_l ∝ n_l^0.5 plus the deterministic
    downsample they imply. sqrt is quantized to micro-units BEFORE the
    cross-language sum so the normalizer is an order-free integer sum
    (the repo's fixed-point convention); the keep-decision hashes doc_id
    with a Knuth multiplicative hash — no rand(), membership is stable
    under repartitioning and appends like train_test_split."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.groupBy("lang")
        .agg(F.count("*").alias("n_before"))
        .withColumn(
            "wq",
            F.round(F.sqrt(F.col("n_before").cast("double")) * 1000000.0).cast(
                "bigint"
            ),
        )
    )
    tot = counts.agg(
        F.sum("wq").alias("tot_wq"), F.sum("n_before").alias("tot_docs")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_before",
        F.round(F.col("wq") * 1000000.0 / F.col("tot_wq")).cast("bigint").alias(
            "weight_ppm"
        ),
        F.least(
            F.lit(1.0),
            F.col("tot_docs").cast("double")
            * F.col("wq")
            / F.col("tot_wq")
            / F.col("n_before"),
        ).alias("rate"),
    )
    u = (F.col("doc_id").cast("bigint") * F.lit(_KNUTH)) % F.lit(_M32)
    return (
        d.select("lang", "doc_id")
        .join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_before", "weight_ppm", "rate")
        .agg(
            F.sum(
                F.when(u.cast("double") < F.col("rate") * float(_M32), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_kept")
        )
        .select(
            "lang",
            "n_before",
            "weight_ppm",
            F.round(F.col("rate") * 1000000.0).cast("bigint").alias("rate_ppm"),
            "n_kept",
        )
    )


_MIX_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_before,
         CAST(ROUND(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000000.0) AS BIGINT) AS wq
  FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(SUM(wq) AS BIGINT) AS tot_wq,
         CAST(SUM(n_before) AS BIGINT) AS tot_docs
  FROM counts
), rates AS (
  SELECT lang, n_before,
         CAST(ROUND(wq * 1000000.0 / tot_wq) AS BIGINT) AS weight_ppm,
         least(1.0, CAST(tot_docs AS DOUBLE) * wq / tot_wq / n_before) AS rate
  FROM counts, tot
)
SELECT r.lang,
       CAST(r.n_before AS BIGINT) AS n_before,
       r.weight_ppm,
       CAST(ROUND(r.rate * 1000000.0) AS BIGINT) AS rate_ppm,
       CAST(SUM(CASE WHEN CAST((CAST(d.doc_id AS BIGINT) * {_KNUTH}) % {_M32} AS DOUBLE)
                          < r.rate * {_M32}.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d JOIN rates r USING (lang)
GROUP BY r.lang, r.n_before, r.weight_ppm, r.rate
"""


# --- cluster-balanced diversity pruning -------------------------------------

_CAP_FRAC = 0.1  # per-bucket quota as a fraction of the whole corpus
# Sign-contrast LSH bits: pairs of embedding dimensions spread across the
# vector. Pure column arithmetic — the identical expressions run in DuckDB.
_BIT_PAIRS = ((1, 9, 8), (17, 25, 4), (33, 41, 2), (49, 57, 1))


# Above this corpus size the per-bucket row_number ranking (which
# serializes a hot bucket into one sorted task) flips to the exact
# md5-threshold quota (operators/skew.py quota_keep_by_hash) — same
# keep-set, no whole-bucket sort. SCALE.md §132, implemented r4.
_QUOTA_WINDOW_CAP = 5_000_000


def q_diversity_prune(
    spark: SparkSession, sf_dir: str, skew_safe: bool | None = None
) -> DataFrame:
    """Quota-cap every LSH bucket at a fixed fraction of the corpus and
    report per-bucket kept/dropped counts (DataComp-style cluster-balanced
    pruning; SemDeDup's cheaper cousin). ``skew_safe=None`` picks the path
    by corpus size (the _QUOTA_WINDOW_CAP gate); both paths produce the
    identical keep-set (property-tested in test_scale_patterns.py)."""
    e = load(spark, sf_dir, "embeddings")
    bucket = None
    for i, j, w in _BIT_PAIRS:
        bit = F.when(
            F.element_at("embedding", i) > F.element_at("embedding", j), w
        ).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    b = e.select("vec_id", bucket.alias("bucket"))
    # corpus count doubles as the path gate and the literal quota (the A5
    # scalar pattern — the oracle recomputes it relationally)
    import math

    n_total_all = b.count()
    cap = int(math.ceil(n_total_all * _CAP_FRAC))
    if skew_safe is None:
        skew_safe = n_total_all > _QUOTA_WINDOW_CAP
    if skew_safe:
        from ..operators.skew import quota_keep_by_hash

        kept = quota_keep_by_hash(b, "bucket", "vec_id", cap)
        n_kept = kept.groupBy("bucket").agg(
            F.count("*").cast("bigint").alias("n_kept")
        )
        return (
            b.groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("n_total"))
            .join(n_kept, "bucket", "left")
            .select(
                "bucket",
                "n_total",
                F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            )
            .withColumn(
                "n_dropped", (F.col("n_total") - F.col("n_kept")).cast("bigint")
            )
        )
    w_rank = Window.partitionBy("bucket").orderBy(
        F.md5(F.col("vec_id").cast("string").cast("binary")), "vec_id"
    )
    ranked = b.withColumn("rn", F.row_number().over(w_rank))
    return (
        ranked.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("rn") <= F.lit(cap), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .withColumn("n_dropped", (F.col("n_total") - F.col("n_kept")).cast("bigint"))
    )


_PRUNE_SQL = f"""
WITH b AS (
  SELECT vec_id,
         (CASE WHEN embedding[1]  > embedding[9]  THEN 8 ELSE 0 END
        + CASE WHEN embedding[17] > embedding[25] THEN 4 ELSE 0 END
        + CASE WHEN embedding[33] > embedding[41] THEN 2 ELSE 0 END
        + CASE WHEN embedding[49] > embedding[57] THEN 1 ELSE 0 END) AS bucket
  FROM embeddings
), tot AS (SELECT COUNT(*) AS n_total_all FROM b),
ranked AS (
  SELECT bucket,
         ROW_NUMBER() OVER (PARTITION BY bucket
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn,
         CAST(CEIL(n_total_all * {_CAP_FRAC}) AS BIGINT) AS cap
  FROM b, tot
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN rn <= cap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(CASE WHEN rn <= cap THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM ranked GROUP BY bucket
"""


# --- Heaps'-law vocabulary growth -------------------------------------------


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New vs cumulative token types per corpus decile (docs bucketed by
    doc_id). The decile denominator is collected once and injected as a
    literal (A5 pattern); the oracle recomputes it with a scalar subquery
    — integer equality is exact, so the twins agree by construction."""
    d = load(spark, sf_dir, "documents")
    max_id = d.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:  # cold partition: empty profile, no crash
        return spark.createDataFrame(
            [],
            "decile bigint, n_tokens bigint, new_types bigint, "
            "cum_types bigint, cum_tokens bigint",
        )
    max_plus1 = max_id + 1
    tokens = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), _TOKENIZE)).alias("token"),
        )
        .filter(F.col("token") != "")
        .withColumn(
            "decile",
            F.expr(
                f"least(CAST(9 AS BIGINT), (CAST(doc_id AS BIGINT) * 10) div {max_plus1})"
            ),
        )
    )
    occ = tokens.groupBy("decile").agg(F.count("*").alias("n_tokens"))
    first = (
        tokens.groupBy("token")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count("*").alias("new_types"))
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        occ.join(first, "decile", "left")
        .select(
            "decile",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("new_types"), F.lit(0)).cast("bigint").alias("new_types"),
        )
        .withColumn("cum_types", F.sum("new_types").over(w_cum).cast("bigint"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w_cum).cast("bigint"))
    )


_VOCAB_SQL = f"""
WITH tok AS (
  SELECT least(CAST(9 AS BIGINT),
               (CAST(doc_id AS BIGINT) * 10)
                 // (SELECT CAST(MAX(doc_id) AS BIGINT) + 1 FROM documents)) AS decile,
         token
  FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '{_TOKENIZE}')) AS token
    FROM documents
  ) raw
  WHERE token <> ''
), occ AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tok GROUP BY decile
), first AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS new_types
  FROM (SELECT token, MIN(decile) AS decile FROM tok GROUP BY token) f
  GROUP BY decile
)
SELECT o.decile, o.n_tokens,
       CAST(COALESCE(f.new_types, 0) AS BIGINT) AS new_types,
       CAST(SUM(COALESCE(f.new_types, 0))
              OVER (ORDER BY o.decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_types,
       CAST(SUM(o.n_tokens)
              OVER (ORDER BY o.decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
FROM occ o LEFT JOIN first f USING (decile)
"""


# --- classifier-based quality filtering -------------------------------------

# Fixed logistic-regression weights over cheap lexical features — the
# linear-inference stand-in for the fastText/DSIR-style learned quality
# gates real curation pipelines run. Inference is pure codegen arithmetic;
# the only transcendental (exp in the sigmoid) gets bit-identical inputs
# on both engines (integer-derived doubles through identical expression
# shapes) and its output is ppm-quantized, the repo's standard
# transcendental-parity convention (cf. queries/lm.py).
_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for")
_LOGREG_B0 = -2.0
_LOGREG_W = (0.8, -0.25, 2.5, 1.5)  # n_tok/100, mean_wlen, stop_ratio, distinct_ratio
_LOGREG_THRESHOLD = 145000  # ppm; ~median of the synthetic corpus


def q_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score from a fixed logistic model over lexical
    features, plus the keep decision at the ppm threshold."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    n_dist = F.size(F.array_distinct(toks))
    dbl = lambda c: c.cast("double")  # noqa: E731
    mean_wlen = dbl(F.length("text") - n_tok + 1) / dbl(n_tok)
    z = (
        F.lit(_LOGREG_B0)
        + F.lit(_LOGREG_W[0]) * (dbl(n_tok) / F.lit(100.0))
        + F.lit(_LOGREG_W[1]) * mean_wlen
        + F.lit(_LOGREG_W[2]) * (dbl(n_stop) / dbl(n_tok))
        + F.lit(_LOGREG_W[3]) * (dbl(n_dist) / dbl(n_tok))
    )
    score = F.round(F.lit(1000000.0) / (F.lit(1.0) + F.exp(-z))).cast("bigint")
    return d.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        score.alias("score_ppm"),
        (score >= _LOGREG_THRESHOLD).cast("int").alias("kept"),
    )


_LOGREG_SQL = f"""
WITH feats AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tok,
         len(list_filter(string_split(text, ' '),
             x -> x IN ({', '.join("'" + w + "'" for w in _STOPWORDS)}))) AS n_stop,
         len(list_distinct(string_split(text, ' '))) AS n_dist,
         len(text) AS n_chars
  FROM documents
), scored AS (
  SELECT doc_id, n_tok,
         CAST(ROUND(1000000.0 / (1.0 + exp(-(
             {_LOGREG_B0}
             + {_LOGREG_W[0]} * (CAST(n_tok AS DOUBLE) / 100.0)
             + {_LOGREG_W[1]} * (CAST(n_chars - n_tok + 1 AS DOUBLE) / CAST(n_tok AS DOUBLE))
             + {_LOGREG_W[2]} * (CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE))
             + {_LOGREG_W[3]} * (CAST(n_dist AS DOUBLE) / CAST(n_tok AS DOUBLE))
         )))) AS BIGINT) AS score_ppm
  FROM feats
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens, score_ppm,
       CAST(score_ppm >= {_LOGREG_THRESHOLD} AS INTEGER) AS kept
FROM scored
"""


register(
    QuerySpec(
        "substring_span_dedup",
        q_substring_span_dedup,
        _SPAN_SQL,
        survey="TD-dedup",
        description="Exact duplicated-substring spans per doc (k-gram islands, Lee et al. 2021 style)",
    )
)
register(
    QuerySpec(
        "temperature_mix",
        q_temperature_mix,
        _MIX_SQL,
        survey="TD-mix",
        description="Alpha-temperature (0.5) language rebalancing with deterministic keep-hash",
    )
)
register(
    QuerySpec(
        "diversity_prune",
        q_diversity_prune,
        _PRUNE_SQL,
        survey="TD-prune",
        description="Cluster-balanced corpus pruning: LSH-bucket quota cap, kept/dropped per bucket",
    )
)
register(
    QuerySpec(
        "vocab_growth",
        q_vocab_growth,
        _VOCAB_SQL,
        survey="TXT-vocab",
        description="Heaps'-law vocabulary growth per corpus decile (new vs cumulative types)",
    )
)
register(
    QuerySpec(
        "quality_logreg",
        q_quality_logreg,
        _LOGREG_SQL,
        survey="TXT-clf",
        description="Logistic quality classifier inference (fixed weights, ppm sigmoid, keep flag)",
    )
)


# --- UniMax language-budget allocation ----------------------------------------
# Public method (Chung et al. 2023, "UniMax: Fairer and More Effective
# Language Sampling"): given per-language corpus sizes n_l, a total
# training budget B, and an epoch cap E, allocate budget uniformly
# across languages EXCEPT that no language may exceed E·n_l tokens —
# low-resource languages are capped at E epochs and their unused share
# waterfills into the rest. This is the successor to temperature mixing
# (cf. q_temperature_mix) in multilingual pretraining.
#
# Closed form instead of iteration: sort languages by capacity c_l=E·n_l
# ascending; language i is capped iff its capacity is below the fair
# share of the budget remaining after all smaller languages took theirs:
# c_i·(L−i+1) ≤ B−P_{i−1} (P = running capacity prefix sum). Cap state
# is monotone in i, so the uncapped suffix splits the leftover evenly —
# floor division, with the remainder going to the first r uncapped
# languages in sort order, keeping every allocation an exact integer
# (sums to exactly min(B, ΣC); no float shares to drift cross-engine).
#
# 100 TB shape: ONE hash agg to |langs| rows; every window below runs on
# that ≤|langs| relation (the bounded-domain exception to the global-
# window rule, cf. vocab_growth's 10-row window); B and L broadcast as
# 1-row scalars. The allocation table then drives the actual sampling
# pass the way temperature_mix's rate table does.

_UNIMAX_EPOCH_CAP = 3
_UNIMAX_BUDGET_DEN = 2  # B = total_tokens // 2


def q_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    langs = d.groupBy("lang").agg(
        F.sum("n_chars").cast("bigint").alias("n_tokens")
    )
    tot = langs.agg(
        F.expr(f"CAST(sum(n_tokens) DIV {_UNIMAX_BUDGET_DEN} AS BIGINT)").alias(
            "budget"
        ),
        F.count("*").cast("bigint").alias("n_langs"),
    )
    w = Window.orderBy("cap", "lang")
    staged = (
        langs.crossJoin(F.broadcast(tot))
        .withColumn("cap", (F.col("n_tokens") * _UNIMAX_EPOCH_CAP).cast("bigint"))
        .withColumn("i", F.row_number().over(w))
        .withColumn("p", F.sum("cap").over(w))
    )
    capped = (
        F.col("cap") * (F.col("n_langs") - F.col("i") + 1)
        <= F.col("budget") - (F.col("p") - F.col("cap"))
    )
    staged = staged.withColumn("is_capped", capped)
    k_row = staged.agg(
        F.max(F.when(F.col("is_capped"), F.col("i")).otherwise(F.lit(0)))
        .cast("bigint").alias("k"),
        F.max(F.when(F.col("is_capped"), F.col("p")).otherwise(F.lit(0)))
        .cast("bigint").alias("p_k"),
    )
    alloc = (
        staged.crossJoin(F.broadcast(k_row))
        .withColumn("n_open", F.col("n_langs") - F.col("k"))
        .withColumn("leftover", F.col("budget") - F.col("p_k"))
        .withColumn(
            "allocated",
            F.when(F.col("is_capped"), F.col("cap")).otherwise(
                F.expr("CAST(leftover DIV n_open AS BIGINT)")
                + F.when(
                    F.col("i") - F.col("k") <= F.col("leftover") % F.col("n_open"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("bigint"),
        )
    )
    from ..functions.deterministic import micro

    return alloc.select(
        "lang",
        "n_tokens",
        F.col("cap").alias("capacity"),
        F.col("is_capped").alias("capped"),
        "allocated",
        micro(F.col("allocated").cast("double") / F.col("n_tokens")).alias(
            "epochs_ppm"
        ),
    )


def _unimax_sql() -> str:
    from ..functions.deterministic import sql_micro

    return f"""
WITH langs AS (
    SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
),
tot AS (
    SELECT CAST(SUM(n_tokens) // {_UNIMAX_BUDGET_DEN} AS BIGINT) AS budget,
           CAST(COUNT(*) AS BIGINT) AS n_langs
    FROM langs
),
staged AS (
    SELECT l.lang, l.n_tokens, t.budget, t.n_langs,
           CAST(l.n_tokens * {_UNIMAX_EPOCH_CAP} AS BIGINT) AS cap,
           ROW_NUMBER() OVER (ORDER BY l.n_tokens * {_UNIMAX_EPOCH_CAP}, l.lang) AS i,
           SUM(l.n_tokens * {_UNIMAX_EPOCH_CAP})
               OVER (ORDER BY l.n_tokens * {_UNIMAX_EPOCH_CAP}, l.lang) AS p
    FROM langs l CROSS JOIN tot t
),
flagged AS (
    SELECT *, cap * (n_langs - i + 1) <= budget - (p - cap) AS is_capped
    FROM staged
),
k_row AS (
    SELECT CAST(MAX(CASE WHEN is_capped THEN i ELSE 0 END) AS BIGINT) AS k,
           CAST(MAX(CASE WHEN is_capped THEN p ELSE 0 END) AS BIGINT) AS p_k
    FROM flagged
),
alloc AS (
    SELECT f.*, k.k, k.p_k,
           f.n_langs - k.k AS n_open,
           f.budget - k.p_k AS leftover
    FROM flagged f CROSS JOIN k_row k
)
SELECT lang, n_tokens, cap AS capacity, is_capped AS capped,
       CAST(CASE WHEN is_capped THEN cap
                 ELSE CAST(leftover // n_open AS BIGINT)
                      + CASE WHEN i - k <= leftover % n_open THEN 1 ELSE 0 END
            END AS BIGINT) AS allocated,
       {sql_micro("CAST(CASE WHEN is_capped THEN cap ELSE CAST(leftover // n_open AS BIGINT) + CASE WHEN i - k <= leftover % n_open THEN 1 ELSE 0 END END AS DOUBLE) / n_tokens")} AS epochs_ppm
FROM alloc
"""


register(
    QuerySpec(
        "unimax_mix",
        q_unimax_mix,
        _unimax_sql(),
        "TD-mix,A5",
        description="UniMax language-budget allocation: epoch-capped uniform waterfill, exact integer shares",
    )
)
