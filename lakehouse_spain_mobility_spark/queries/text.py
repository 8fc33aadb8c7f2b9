"""Text-analysis queries over the ``documents`` table + JSON props over
``events`` — the training-data-pipeline text surface (language ID, quality
scoring, token counting, fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import davg, dsum, micro, sql_davg, sql_dsum, sql_micro, xdavg
from ..operators import text_analysis as ta
from . import QuerySpec, register
from .tables import load


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) rolled up per source."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    per_doc = d.select(
        "doc_id",
        "source",
        ta.word_count(t).alias("n_words"),
        ta.bpe_token_count(t).alias("n_bpe_tokens"),
        F.length(t).cast("bigint").alias("n_chars"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        xdavg("CAST(n_chars AS DOUBLE)").alias("avg_chars"),
    )


_TOKEN_STATS_SQL = f"""
WITH per_doc AS (
    SELECT doc_id, source,
           {ta.sql_word_count('text')} AS n_words,
           {ta.sql_bpe_token_count('text')} AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       {sql_davg('CAST(n_chars AS DOUBLE)')} AS avg_chars
FROM per_doc
GROUP BY source
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID vs the labelled ``lang`` column —
    confusion-matrix-style rollup."""
    d = load(spark, sf_dir, "documents")
    scored = d.select("doc_id", "lang", ta.predicted_lang(F.col("text")).alias("predicted_lang"))
    return scored.groupBy("lang", "predicted_lang").agg(F.count("*").alias("n_docs"))


_LANG_ID_SQL = f"""
SELECT lang, {ta.sql_predicted_lang('text')} AS predicted_lang, COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + composite score (top 100 worst docs
    — the filtering shortlist a data pipeline would drop)."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    feats = ta.quality_features(t)
    return (
        d.select(
            "doc_id",
            feats["n_words"].alias("n_words"),
            feats["avg_word_len"].alias("avg_word_len"),
            feats["punct_ratio"].alias("punct_ratio"),
            feats["stopword_ratio"].alias("stopword_ratio"),
            ta.quality_score(t).alias("quality_score"),
        )
        .orderBy("quality_score", "doc_id")
        .limit(100)
    )


_F = ta.sql_quality_features("text")
_QUALITY_SCORES_SQL = f"""
SELECT doc_id,
       {_F['n_words']} AS n_words,
       {_F['avg_word_len']} AS avg_word_len,
       {_F['punct_ratio']} AS punct_ratio,
       {_F['stopword_ratio']} AS stopword_ratio,
       {ta.sql_quality_score('text')} AS quality_score
FROM documents
ORDER BY quality_score, doc_id
LIMIT 100
"""


def q_json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``k`` out of the JSON ``props``
    column of events and aggregate per event_type."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    return ev.groupBy("event_type").agg(
        F.count(k).cast("bigint").alias("n_with_k"),
        davg(k).alias("avg_k"),
        dsum(k).alias("sum_k"),
    )


_JSON_PROPS_SQL = f"""
SELECT event_type,
       CAST(COUNT(CAST(props->>'$.k' AS DOUBLE)) AS BIGINT) AS n_with_k,
       {sql_davg("CAST(props->>'$.k' AS DOUBLE)")} AS avg_k,
       {sql_dsum("CAST(props->>'$.k' AS DOUBLE)")} AS sum_k
FROM events
GROUP BY event_type
"""


# --- Winnowing document fingerprints (rolling-hash family) ------------------
# Char-5-gram hashes, sliding-window (size 4) minima, distinct per doc —
# the plagiarism/near-dup fingerprinting scheme, fully relational:
# explode positions → hash gram → window-min → distinct. The md5-prefix
# hash keeps both engines identical (xxhash64 would differ per engine).
_WK = 5  # gram length
_WW = 4  # winnowing window (positions)


def q_doc_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    norm = d.select("doc_id", F.lower(F.trim(F.col("text"))).alias("norm"))
    grams = (
        norm.select(
            "doc_id",
            F.explode(F.expr(f"sequence(1, greatest(length(norm) - {_WK - 1}, 1))")).alias("i"),
            "norm",
        )
        .select(
            "doc_id", "i",
            F.substring(F.col("norm"), F.col("i").cast("int"), _WK).alias("gram"),
        )
        .withColumn("h", F.substring(F.md5(F.col("gram").cast("binary")), 1, 8))
    )
    w = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, _WW - 1)
    minima = grams.withColumn("fp", F.min("h").over(w))
    fps = minima.select("doc_id", "fp").distinct()
    return fps.groupBy("doc_id").agg(
        F.count("*").alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


_DOC_WINNOWING_SQL = f"""
WITH norm AS (SELECT doc_id, lower(trim(text)) AS norm FROM documents),
positions AS (
    SELECT doc_id, norm,
           unnest(generate_series(1, GREATEST(length(norm) - {_WK - 1}, 1))) AS i
    FROM norm
),
grams AS (
    SELECT doc_id, i, substring(md5(substring(norm, CAST(i AS INTEGER), {_WK})), 1, 8) AS h
    FROM positions
),
minima AS (
    SELECT doc_id,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND {_WW - 1} FOLLOWING) AS fp
    FROM grams
),
fps AS (SELECT DISTINCT doc_id, fp FROM minima)
SELECT doc_id, COUNT(*) AS n_fingerprints, MIN(fp) AS min_fp, MAX(fp) AS max_fp
FROM fps GROUP BY doc_id
"""


# --- Chunk-level (line-level) dedup -----------------------------------------
_CHUNK_W = 8  # words per chunk


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup analog for documents without line structure: split
    each doc into consecutive 8-word chunks and measure, per language, how
    much of the corpus is chunk-duplicated across documents (the signal
    line-dedup pipelines like CCNet/RefinedWeb remove). Two hash
    aggregations — chunk → distinct-doc count, then doc → dup share — both
    shuffle-partitioned on their keys; nothing is quadratic, and at 100 TB
    the chunk table is the same explode→groupBy shape as the shingle stage
    of the MinHash pipeline."""
    w = _CHUNK_W
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    chunks = (
        d.select(
            "doc_id",
            "lang",
            words.alias("words"),
            F.explode(
                F.sequence(F.lit(0), (F.ceil(F.size(words) / F.lit(float(w)))).cast("int") - 1)
            ).alias("i"),
        )
        .select(
            "doc_id",
            "lang",
            F.concat_ws(" ", F.slice("words", F.col("i") * w + 1, w)).alias("chunk"),
        )
    )
    chunk_docs = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("n_docs_with_chunk")
    )
    per_doc = (
        chunks.join(chunk_docs, "chunk")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("n_docs_with_chunk") > 1, 1).otherwise(0)).alias("dup_chunks"),
        )
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chunks").alias("total_chunks"),
        F.sum("dup_chunks").alias("total_dup_chunks"),
        micro(davg(F.col("dup_chunks").cast("double") / F.col("n_chunks"))).alias(
            "avg_dup_ratio_ppm"
        ),
    )


_CHUNK_DEDUP_SQL = f"""
WITH w AS (
    SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents
),
idx AS (
    SELECT doc_id, lang, words,
           unnest(generate_series(0, CAST(ceil(len(words) / {float(_CHUNK_W)}) AS BIGINT) - 1)) AS i
    FROM w
),
chunks AS (
    SELECT doc_id, lang,
           array_to_string(words[(i*{_CHUNK_W}+1):(i*{_CHUNK_W}+{_CHUNK_W})], ' ') AS chunk
    FROM idx
),
chunk_docs AS (
    SELECT chunk, COUNT(DISTINCT doc_id) AS n_docs_with_chunk FROM chunks GROUP BY chunk
),
per_doc AS (
    SELECT c.doc_id, c.lang,
           COUNT(*) AS n_chunks,
           SUM(CASE WHEN cd.n_docs_with_chunk > 1 THEN 1 ELSE 0 END) AS dup_chunks
    FROM chunks c JOIN chunk_docs cd ON c.chunk = cd.chunk
    GROUP BY c.doc_id, c.lang
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chunks) AS BIGINT) AS total_chunks,
       CAST(SUM(dup_chunks) AS BIGINT) AS total_dup_chunks,
       {sql_micro(sql_davg('CAST(dup_chunks AS DOUBLE) / n_chunks'))} AS avg_dup_ratio_ppm
FROM per_doc
GROUP BY lang
"""


# --- Heavy hitters: global top-k frequent tokens -----------------------------
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 most frequent tokens with deterministic tie-break.
    The top-k over the aggregated token counts is a
    TakeOrderedAndProject (per-partition heap + driver merge), never a
    full sort — the pattern that survives a 100 TB token table."""
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token")
    ).filter(F.col("token") != "")
    return (
        tokens.groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(20)
    )


_HEAVY_HITTERS_SQL = """
WITH tok AS (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS token
    FROM documents
)
SELECT token, COUNT(*) AS n_occurrences
FROM tok WHERE token <> ''
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 20
"""


# --- Gopher-style repetition quality filter ----------------------------------
def q_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals per document (Gopher rules G5-G13
    family: duplicate-n-gram fraction, top-n-gram concentration), rolled
    up per language with a flag rate. One explode -> (doc, bigram) count
    aggregation feeds all three stats; everything stays in whole-stage
    codegen, and the per-doc state is bounded by its own bigram
    vocabulary — the shape that streams at 100 TB."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    grams = (
        d.select(
            "doc_id",
            "lang",
            words.alias("w"),
            # guard: split() yields [""] for an empty doc (size == 1), and
            # sequence(1, 0) is a DESCENDING [1, 0] — two phantom bigram
            # rows — while the oracle's generate_series(1, 0) is empty
            # (the line_dedup empty-doc convention, ADVICE r3)
            F.explode(
                F.when(F.size(words) >= 2, F.sequence(F.lit(1), F.size(words) - 1))
            ).alias("i"),
        )
        .select(
            "doc_id",
            "lang",
            F.concat_ws(" ", F.element_at("w", F.col("i")), F.element_at("w", F.col("i") + 1)).alias("g"),
        )
        .groupBy("doc_id", "lang", "g")
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = grams.groupBy("doc_id", "lang").agg(
        F.sum("cnt").alias("total_bi"),
        F.count("*").alias("distinct_bi"),
        F.max("cnt").alias("max_bi"),
    )
    dup_frac = (F.col("total_bi") - F.col("distinct_bi")).cast("double") / F.col("total_bi")
    top_share = F.col("max_bi").cast("double") / F.col("total_bi")
    flagged = (dup_frac > 0.2) | (top_share > 0.05)
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(flagged.cast("int")).alias("n_flagged"),
        micro(davg(dup_frac)).alias("avg_dup_bigram_frac_ppm"),
        micro(davg(top_share)).alias("avg_top_bigram_share_ppm"),
    )


_REPETITION_SQL = f"""
WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
g AS (
    SELECT doc_id, lang, w[i] || ' ' || w[i+1] AS g, COUNT(*) AS cnt
    FROM (SELECT doc_id, lang, w, unnest(generate_series(1, len(w) - 1)) AS i FROM w)
    GROUP BY doc_id, lang, g
),
per_doc AS (
    SELECT doc_id, lang,
           SUM(cnt) AS total_bi, COUNT(*) AS distinct_bi, MAX(cnt) AS max_bi
    FROM g GROUP BY doc_id, lang
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN CAST(total_bi - distinct_bi AS DOUBLE) / total_bi > 0.2
                  OR CAST(max_bi AS DOUBLE) / total_bi > 0.05
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       {sql_micro(sql_davg('CAST(total_bi - distinct_bi AS DOUBLE) / total_bi'))} AS avg_dup_bigram_frac_ppm,
       {sql_micro(sql_davg('CAST(max_bi AS DOUBLE) / total_bi'))} AS avg_top_bigram_share_ppm
FROM per_doc
GROUP BY lang
"""


# --- PII redaction -----------------------------------------------------------
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+34 [0-9]{3} [0-9]{3}"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a deterministically synthesized contact header
    (the corpus itself is PII-free, so each doc gets
    ``user<id>@example.com call +34 NNN NNN`` prepended): replace emails
    and phone numbers with placeholder tags, report per-language match
    counts and total characters removed, plus a residual-PII invariant
    (must be 0). Narrow map (regexp_replace/regexp_count are codegen'd
    JVM expressions — no UDF), so it streams at any scale."""
    d = load(spark, sf_dir, "documents")
    phone = F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0")
    contact = F.concat(
        F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com call +34 "),
        phone, F.lit(" "), phone, F.lit(" "), F.col("text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(contact, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        d.select(
            "lang",
            F.regexp_count(contact, F.lit(_EMAIL_RE)).alias("n_emails"),
            F.regexp_count(contact, F.lit(_PHONE_RE)).alias("n_phones"),
            (F.length(contact) - F.length(scrubbed)).alias("chars_removed"),
            F.regexp_count(scrubbed, F.lit(_EMAIL_RE)).alias("residual"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_emails").alias("total_emails"),
            F.sum("n_phones").alias("total_phones"),
            F.sum("chars_removed").alias("total_chars_removed"),
            F.sum("residual").alias("residual_pii"),
        )
    )


_PII_SQL = f"""
WITH c AS (
    SELECT lang,
           'user' || CAST(doc_id AS VARCHAR) || '@example.com call +34 ' ||
           lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || ' ' ||
           lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || ' ' || text AS contact
    FROM documents
),
s AS (
    SELECT lang, contact,
           regexp_replace(regexp_replace(contact, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
    FROM c
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(contact, '{_EMAIL_RE}'))) AS BIGINT) AS total_emails,
       CAST(SUM(len(regexp_extract_all(contact, '{_PHONE_RE}'))) AS BIGINT) AS total_phones,
       CAST(SUM(len(contact) - len(scrubbed)) AS BIGINT) AS total_chars_removed,
       CAST(SUM(len(regexp_extract_all(scrubbed, '{_EMAIL_RE}'))) AS BIGINT) AS residual_pii
FROM s
GROUP BY lang
"""


# --- Benchmark decontamination -----------------------------------------------
_DECON_W = 8  # gram width, the usual decontamination n
_DECON_BENCH = 20  # doc_id < 20 stands in for the benchmark set


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing at
    least one word-8-gram with the held-out benchmark set (docs with
    doc_id < 20 stand in for it) — the overlap check LLM pipelines run
    before training so eval data never leaks into the corpus. The
    benchmark gram set is tiny and broadcast; the training side is one
    explode → semi-join → distinct-doc aggregate, so the corpus is
    touched once and nothing is quadratic. Per-language counts plus the
    contaminated-doc rate."""
    w = _DECON_W
    d = load(spark, sf_dir, "documents")

    def grams(df):
        words = F.split(F.col("text"), " ")
        # the size filter matters: Spark's sequence(1, n) DESCENDS for
        # n < 1 while DuckDB's generate_series is empty — sub-w docs
        # must be excluded, not relied on to vanish
        return (
            df.filter(F.size(words) >= w)
            .select(
                "doc_id",
                "lang",
                words.alias("w"),
                F.explode(F.sequence(F.lit(1), F.size(words) - (w - 1))).alias("i"),
            )
            .select("doc_id", "lang", F.concat_ws(" ", F.slice("w", F.col("i"), w)).alias("g"))
        )

    bench_grams = (
        grams(d.filter(F.col("doc_id") < _DECON_BENCH)).select("g").distinct()
    )
    train = d.filter(F.col("doc_id") >= _DECON_BENCH)
    contaminated = (
        grams(train)
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contaminated", F.lit(1))
    )
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_train_docs"),
            F.sum(F.coalesce(F.col("is_contaminated"), F.lit(0))).alias("n_contaminated"),
            micro(
                F.sum(F.coalesce(F.col("is_contaminated"), F.lit(0))).cast("double")
                / F.count("*")
            ).alias("contamination_rate_ppm"),
        )
    )


_DECON_SQL = f"""
WITH g AS (
    SELECT doc_id, lang,
           array_to_string(w[i:i+{_DECON_W - 1}], ' ') AS g
    FROM (
        SELECT doc_id, lang, w,
               unnest(generate_series(1, len(w) - {_DECON_W - 1})) AS i
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    )
),
bench AS (SELECT DISTINCT g FROM g WHERE doc_id < {_DECON_BENCH}),
contaminated AS (
    SELECT DISTINCT g.doc_id FROM g JOIN bench USING (g)
    WHERE g.doc_id >= {_DECON_BENCH}
)
SELECT lang,
       COUNT(*) AS n_train_docs,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       {sql_micro('CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)')}
           AS contamination_rate_ppm
FROM documents d
LEFT JOIN contaminated c ON d.doc_id = c.doc_id
WHERE d.doc_id >= {_DECON_BENCH}
GROUP BY lang
"""


for _spec in [
    QuerySpec("decontamination", q_decontamination, _DECON_SQL, "TXT-decontam", False,
              "Benchmark 8-gram overlap decontamination (broadcast bench grams)"),
    QuerySpec("repetition_quality", q_repetition_quality, _REPETITION_SQL, "TXT-gopher", False,
              "Gopher-style duplicate/top-bigram repetition quality flags per language"),
    QuerySpec("pii_scrub", q_pii_scrub, _PII_SQL, "TXT-pii", False,
              "Email/phone redaction with match counts and residual-PII invariant"),
    QuerySpec("chunk_dedup", q_chunk_dedup, _CHUNK_DEDUP_SQL, "TXT-linededup", False,
              "Chunk-level (line-level analog) cross-document dedup share per language"),
    QuerySpec("heavy_hitters", q_heavy_hitters, _HEAVY_HITTERS_SQL, "TXT-topk", False,
              "Global top-20 frequent tokens (TakeOrderedAndProject top-k)"),
    QuerySpec("doc_winnowing", q_doc_winnowing, _DOC_WINNOWING_SQL, "TXT-fingerprint", False,
              "Winnowing rolling-hash document fingerprints"),
    QuerySpec("token_stats", q_token_stats, _TOKEN_STATS_SQL, "TXT-tokens", True,
              "Whitespace + BPE-ish token counting rolled up per source"),
    QuerySpec("lang_id", q_lang_id, _LANG_ID_SQL, "TXT-langid", False,
              "Stopword-heuristic language identification confusion rollup"),
    QuerySpec("quality_scores", q_quality_scores, _QUALITY_SCORES_SQL, "TXT-quality", False,
              "Document quality features + composite score shortlist"),
    QuerySpec("json_props_rollup", q_json_props_rollup, _JSON_PROPS_SQL, "TXT-json", False,
              "JSON field extraction + per-type aggregation over events"),
]:
    register(_spec)


# --- corpus diversity audit ---------------------------------------------------
# The lexical-diversity metrics a curation pipeline tracks per shard/language
# before and after filtering (cf. Gopher's diversity analyses): Shannon
# entropy of the token distribution, Simpson concentration, type-token
# ratio. Entropy follows the repo's transcendental convention — each ln is
# quantized to 6 decimals on both engines, contributions aggregate through
# the fixed-point sum — while Simpson is EXACT integer arithmetic
# (sum of squared counts over a squared total). One token explode + one
# (lang, token) aggregation + one lang rollup; all map-side combinable.


def q_entropy_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    counts = toks.groupBy("lang", "term").agg(F.count("*").alias("c"))
    totals = counts.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
    )
    # -p*ln(p) per type with the quantized-ln convention; dsum makes the
    # per-lang reduction order-independent.
    contrib = counts.join(totals.select("lang", "n_tokens"), "lang").select(
        "lang",
        (
            -(F.col("c").cast("double") / F.col("n_tokens").cast("double"))
            * (
                F.round(
                    F.log(F.col("c").cast("double") / F.col("n_tokens").cast("double"))
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            )
        ).alias("h"),
    )
    ent = contrib.groupBy("lang").agg(micro(dsum(F.col("h"))).alias("entropy_ppm"))
    return (
        totals.join(ent, "lang")
        .select(
            "lang",
            "n_tokens",
            F.col("n_types").cast("bigint").alias("n_types"),
            F.expr(
                "CAST(ROUND(CAST(n_types AS DOUBLE)"
                " / CAST(n_tokens AS DOUBLE) * 1000000.0) AS BIGINT)"
            ).alias("ttr_ppm"),
            "entropy_ppm",
            F.expr(
                "CAST(ROUND(CAST(sum_c2 AS DOUBLE)"
                " / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE))"
                " * 1000000.0) AS BIGINT)"
            ).alias("simpson_ppm"),
        )
    )


def _entropy_sql() -> str:
    return f"""
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
),
counts AS (
  SELECT lang, term, COUNT(*) AS c FROM toks WHERE term <> '' GROUP BY 1, 2
),
totals AS (
  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_types,
         CAST(SUM(c * c) AS BIGINT) AS sum_c2
  FROM counts GROUP BY 1
),
contrib AS (
  SELECT c.lang,
         -(CAST(c.c AS DOUBLE) / CAST(t.n_tokens AS DOUBLE))
           * (ROUND(ln(CAST(c.c AS DOUBLE) / CAST(t.n_tokens AS DOUBLE)) * 1e6) / 1e6)
           AS h
  FROM counts c JOIN totals t ON c.lang = t.lang
),
ent AS (
  SELECT lang, {sql_micro(sql_dsum('h'))} AS entropy_ppm FROM contrib GROUP BY lang
)
SELECT t.lang, t.n_tokens,
       CAST(t.n_types AS BIGINT) AS n_types,
       CAST(ROUND(CAST(t.n_types AS DOUBLE)
            / CAST(t.n_tokens AS DOUBLE) * 1000000.0) AS BIGINT) AS ttr_ppm,
       e.entropy_ppm,
       CAST(ROUND(CAST(t.sum_c2 AS DOUBLE)
            / (CAST(t.n_tokens AS DOUBLE) * CAST(t.n_tokens AS DOUBLE))
            * 1000000.0) AS BIGINT) AS simpson_ppm
FROM totals t JOIN ent e USING (lang)
"""


register(
    QuerySpec(
        "entropy_diversity",
        q_entropy_diversity,
        _entropy_sql(),
        "TXT-diversity",
        False,
        "Per-language lexical diversity audit: Shannon entropy (quantized-ln + fixed-point sum), Simpson, TTR",
    )
)


# --- k-anonymity audit (privacy QA before release) ---------------------------
# Public method (Sweeney): a released table re-identifies people when a
# QUASI-IDENTIFIER combination (here: event_type × hour-of-day × coarse
# value band) isolates fewer than K rows. Training-data releases run
# this audit before publishing event-derived features. Output is the
# per-event-type risk profile: group counts, <K groups, rows at risk,
# and the smallest group size.
#
# 100 TB shape: ONE hash aggregation on the quasi-identifier key (map-
# side partials absorb the key skew), then a |qid-groups|-sized rollup —
# nothing row-sized crosses the second exchange. The coarse band keeps
# the QID domain bounded (|types|·24·|bands|), which is also what makes
# the k-anonymity decision meaningful (raw values would make every row
# unique — and make the grouped relation corpus-sized).

_K_ANON = 5


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    qid = e.select(
        "event_type",
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") / F.lit(100.0)).cast("bigint").alias("band"),
    )
    groups = qid.groupBy("event_type", "hh", "band").agg(
        F.count("*").alias("n")
    )
    risky = F.col("n") < _K_ANON
    return (
        groups.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum(risky.cast("int")).cast("bigint").alias("n_risky_groups"),
            F.sum(F.when(risky, F.col("n")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_rows_at_risk"),
            F.min("n").cast("bigint").alias("min_group_size"),
        )
    )


_KANON_SQL = f"""
WITH groups AS (
    SELECT event_type, hour(ts) AS hh,
           CAST(FLOOR(value / 100.0) AS BIGINT) AS band,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
       CAST(SUM(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       CAST(MIN(n) AS BIGINT) AS min_group_size
FROM groups
GROUP BY 1
"""


register(
    QuerySpec(
        "k_anonymity_audit",
        q_k_anonymity_audit,
        _KANON_SQL,
        "TXT-pii,A8",
        False,
        "k-anonymity audit: quasi-identifier group sizes, <K groups and rows at risk per event type",
    )
)


# --- l-diversity audit (the k-anonymity companion) ---------------------------
# Public method (Machanavajjhala et al. 2007): k-anonymity alone fails
# when a small QID group is HOMOGENEOUS in the sensitive attribute —
# every member shares the value, so membership alone discloses it.
# l-diversity demands >= L distinct sensitive values per released QID
# group. Same QID key as q_k_anonymity_audit (event_type × hour × value
# band); the sensitive attribute is the user bucket (user_id % 97 — a
# bounded pseudonym domain, the released-feature shape).
#
# 100 TB shape: COUNT(DISTINCT sensitive) per group is deliberately NOT
# the two-level expansion Spark plans for count_distinct (trap #4,
# SCALE.md): aggregate the (qid, sensitive) pairs first — map-side
# partials collapse the corpus to |distinct pairs| rows — then count
# rows per qid group, then roll up per event type. Three hash aggs, each
# input strictly smaller than the last; nothing row-sized moves twice.

_L_DIV = 3
_SENS_MOD = 97


def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pairs = e.select(
        "event_type",
        F.hour("ts").alias("hh"),
        F.floor(F.col("value") / F.lit(100.0)).cast("bigint").alias("band"),
        (F.col("user_id") % _SENS_MOD).alias("sens"),
    ).groupBy("event_type", "hh", "band", "sens").agg(
        F.count("*").alias("n_rows")
    )
    groups = pairs.groupBy("event_type", "hh", "band").agg(
        F.count("*").alias("l"),  # distinct sensitive values in the group
        F.sum("n_rows").alias("n"),
    )
    low = F.col("l") < _L_DIV
    return (
        groups.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum(low.cast("int")).cast("bigint").alias("n_low_diversity"),
            F.sum(F.when(low, F.col("n")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_rows_exposed"),
            F.min("l").cast("bigint").alias("min_l"),
        )
    )


_LDIV_SQL = f"""
WITH pairs AS (
    SELECT event_type, hour(ts) AS hh,
           CAST(FLOOR(value / 100.0) AS BIGINT) AS band,
           user_id % {_SENS_MOD} AS sens,
           COUNT(*) AS n_rows
    FROM events GROUP BY 1, 2, 3, 4
),
groups AS (
    SELECT event_type, hh, band, COUNT(*) AS l, SUM(n_rows) AS n
    FROM pairs GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN l < {_L_DIV} THEN 1 ELSE 0 END) AS BIGINT) AS n_low_diversity,
       CAST(SUM(CASE WHEN l < {_L_DIV} THEN n ELSE 0 END) AS BIGINT) AS n_rows_exposed,
       CAST(MIN(l) AS BIGINT) AS min_l
FROM groups
GROUP BY 1
"""


register(
    QuerySpec(
        "l_diversity_audit",
        q_l_diversity_audit,
        _LDIV_SQL,
        "TXT-pii,A8",
        False,
        "l-diversity audit: distinct sensitive values per QID group, homogeneous groups exposed",
    )
)


# --- t-closeness audit (completing the privacy-audit triple) -----------------
# Public method (Li, Li & Venkatasubramanian 2007): l-diversity still
# leaks when a QID group's sensitive-value DISTRIBUTION diverges from the
# table's — distinct values can be present yet skewed enough to infer.
# t-closeness bounds the distance between each group's distribution and
# the global one; for categorical attributes the distance is total
# variation: d(g) = ½ Σ_v |n_gv/n_g − N_v/N|.
#
# Exactness: the per-group distance is computed as ONE exact integer
# numerator Σ_v |n_gv·N − N_v·n_g| (values absent from a group fold in
# algebraically: Σ_{v∈g}(|n_gv·N − N_v·n_g| − N_v·n_g) + n_g·N, so the
# inner join carries the whole sum) before a single double division,
# micro-quantized — the repo's fixed-point convention. BIGINT products
# hold to ~3·10⁹ rows per event type; past that the numerator becomes
# DECIMAL(38,0) (same expression, wider type — noted, not needed here).
#
# 100 TB shape: ONE corpus-sized aggregation (the (qid, sens) pair
# counts — the same relation the l-diversity audit builds); every other
# relation (group sizes, global marginals, totals) derives from it by
# further aggregation, so nothing row-sized moves twice. Joins are
# group-grain × value-grain — bounded by the coarse QID/sensitive
# domains, broadcastable at any corpus size.

_T_CLOSE_PPM = 400000  # t = 0.40


def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pairs = (
        e.select(
            "event_type",
            F.hour("ts").alias("hh"),
            F.floor(F.col("value") / F.lit(100.0)).cast("bigint").alias("band"),
            (F.col("user_id") % _SENS_MOD).alias("sens"),
        )
        .groupBy("event_type", "hh", "band", "sens")
        .agg(F.count("*").alias("n_gv"))
    )
    # The three marginals (per-value, per-group, per-type totals) are
    # WINDOW sums over the tiny pairs relation, not join-backs: one
    # explicit repartition on event_type satisfies every downstream
    # window partitionBy and both groupBys (subset-clustering), so the
    # whole post-corpus computation runs on a SINGLE exchange of the
    # |QID|x|sens|-bounded relation — the join form cost five broadcast
    # stages on group-grain data (sf10 A/B in PERF.md round 9).
    from pyspark.sql import Window as W

    p = pairs.repartition("event_type")
    n_v = F.sum("n_gv").over(W.partitionBy("event_type", "sens"))
    n_g = F.sum("n_gv").over(W.partitionBy("event_type", "hh", "band"))
    n_tot = F.sum("n_gv").over(W.partitionBy("event_type"))
    term = (
        p.select(
            "event_type", "hh", "band", "n_gv",
            n_v.alias("n_v"), n_g.alias("n_g"), n_tot.alias("n_tot"),
        )
        .groupBy("event_type", "hh", "band", "n_g", "n_tot")
        .agg(
            F.sum(
                F.abs(F.col("n_gv") * F.col("n_tot") - F.col("n_v") * F.col("n_g"))
                - F.col("n_v") * F.col("n_g")
            ).alias("present_part")
        )
    )
    per_group = term.select(
        "event_type",
        micro(
            (F.col("present_part") + F.col("n_g") * F.col("n_tot")).cast("double")
            / (F.lit(2.0) * F.col("n_g") * F.col("n_tot"))
        ).alias("t_ppm"),
    )
    viol = F.col("t_ppm") > _T_CLOSE_PPM
    return per_group.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(viol.cast("int")).cast("bigint").alias("n_violating"),
        F.max("t_ppm").alias("max_t_ppm"),
    )


_TCLOSE_SQL = f"""
WITH pairs AS (
    SELECT event_type, hour(ts) AS hh,
           CAST(FLOOR(value / 100.0) AS BIGINT) AS band,
           user_id % {_SENS_MOD} AS sens,
           COUNT(*) AS n_gv
    FROM events GROUP BY 1, 2, 3, 4
),
marg AS (
    SELECT event_type, sens, SUM(n_gv) AS n_v FROM pairs GROUP BY 1, 2
),
grp AS (
    SELECT event_type, hh, band, SUM(n_gv) AS n_g FROM pairs GROUP BY 1, 2, 3
),
tot AS (
    SELECT event_type, SUM(n_v) AS n_tot FROM marg GROUP BY 1
),
term AS (
    SELECT p.event_type, p.hh, p.band, g.n_g, t.n_tot,
           SUM(ABS(p.n_gv * t.n_tot - v.n_v * g.n_g) - v.n_v * g.n_g)
             AS present_part
    FROM pairs p
    JOIN marg v ON p.event_type = v.event_type AND p.sens = v.sens
    JOIN grp g ON p.event_type = g.event_type AND p.hh = g.hh AND p.band = g.band
    JOIN tot t ON p.event_type = t.event_type
    GROUP BY 1, 2, 3, 4, 5
),
per_group AS (
    SELECT event_type,
           CAST(ROUND(CAST(present_part + n_g * n_tot AS DOUBLE)
                      / (2.0 * n_g * n_tot) * 1000000.0) AS BIGINT) AS t_ppm
    FROM term
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN t_ppm > {_T_CLOSE_PPM} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       MAX(t_ppm) AS max_t_ppm
FROM per_group
GROUP BY 1
"""


register(
    QuerySpec(
        "t_closeness_audit",
        q_t_closeness_audit,
        _TCLOSE_SQL,
        "TXT-pii,A8",
        False,
        "t-closeness audit: exact-integer total-variation distance of each QID group's sensitive distribution vs the global",
    )
)
