"""Full-text relevance ranking: BM25 over an inverted-index shape.

The retrieval step of a RAG / training-data curation pipeline: score every
document against a query term set with Okapi BM25 (k1=1.2, b=0.75) and
return the top-k. Spark-first decomposition — the "inverted index" is the
exploded (doc, term) relation:

- one explode produces term frequencies (narrow, map-side),
- document length and corpus stats (N, avgdl) are tiny aggregates
  broadcast back via cross join (the reference's scalar-k pattern,
  ``dags/gravity/calculate_gold.py:11-45``),
- per-term document frequency is a distinct-aggregate over the few query
  terms only — the full vocabulary is never materialized,
- the score is per-row IEEE double math over integer counts, so it is
  bit-identical across engines; the one transcendental (ln in the IDF) is
  quantized to 6 decimals on both sides before use, and the output score
  is emitted in integer micro-units.

At 100 TB: the corpus-side work is a single scan + explode filtered to
query terms (predicate pushdown keeps it narrow), shuffled once on doc_id.
Nothing is quadratic; df/avgdl/N are scalars or |terms|-row tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import davg, dsum, micro, sql_davg, sql_micro
from ..functions.topk import global_topk
from . import QuerySpec, register
from .tables import load, spread

_TERMS = ("spark", "hash", "window")
_K1 = 1.2
_B = 0.75
_TOP_K = 20


def _bm25_doc_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE tokenize pass + ONE doc-grain shuffle: per-doc token count (dl)
    and per-query-term tf via conditional aggregation. _TERMS is a fixed
    literal list, so the (doc, term) grain is a pivot of |terms| columns,
    not a join — the round-7 shape tokenized the corpus once per consumer
    (dl / tf / df derived from separate explode subtrees sharing only the
    scan: three full tokenizations, measured as the bulk of bm25's 3.0 s
    standalone floor at sf10; rrf_fusion added a fourth)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    return toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(_TERMS)
        ],
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = _bm25_doc_table(spark, sf_dir)
    # n_docs / avgdl / per-term df in ONE scalar row (the reference's
    # scalar-k pattern): df_t = docs where the term appears, identical to
    # the (doc, term)-distinct aggregate of the row form.
    stats = doc.agg(
        F.count("*").alias("n_docs"),
        davg(F.col("dl").cast("double")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(_TERMS))
        ],
    )

    # idf quantized to 6 decimals on both engines before entering the score:
    # ln() is the one non-IEEE-exact op in the pipeline, and double-rounding
    # through a fixed grid removes the cross-libm last-ulp exposure.
    def _idf(i: int):
        return F.round(
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
                / (F.col(f"df_{i}") + F.lit(0.5))
            )
            * F.lit(1e6)
        ) / F.lit(1e6)

    def _contrib(i: int):
        tf = F.col(f"tf_{i}").cast("double")
        return (
            _idf(i)
            * tf
            / (
                tf
                + F.lit(_K1)
                * (
                    F.lit(1.0)
                    - F.lit(_B)
                    + F.lit(_B) * F.col("dl").cast("double") / F.col("avgdl")
                )
            )
        )

    # score = Σ_t ROUND(contrib_t·1e6) over MATCHED terms — exactly the
    # row form's micro(dsum(contrib)) (dsum rounds each row to integer
    # micro-units and sums exactly, so the sum is order- and shape-free).
    matched = [F.col(f"tf_{i}") > 0 for i in range(len(_TERMS))]
    score_ppm = None
    for i in range(len(_TERMS)):
        term_ppm = F.when(
            matched[i], F.round(_contrib(i) * F.lit(1e6)).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        score_ppm = term_ppm if score_ppm is None else score_ppm + term_ppm
    n_matched = None
    for m in matched:
        c = m.cast("long")
        n_matched = c if n_matched is None else n_matched + c

    doc_scores = (
        doc.crossJoin(F.broadcast(stats))
        .filter(F.greatest(*[F.col(f"tf_{i}") for i in range(len(_TERMS))]) > 0)
        .select(
            "doc_id",
            score_ppm.alias("score_ppm"),
            n_matched.alias("n_terms_matched"),
        )
    )
    # TakeOrderedAndProject, not a global-window sort of the scored corpus.
    return global_topk(
        doc_scores, _TOP_K, [F.desc("score_ppm"), F.asc("doc_id")]
    ).select("rank", "doc_id", "score_ppm", "n_terms_matched")


def _sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _TERMS)
    from ..functions.deterministic import sql_dsum

    return f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
toks_f AS (SELECT doc_id, term FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks_f GROUP BY doc_id),
stats AS (
    SELECT COUNT(*) AS n_docs, {sql_davg('CAST(dl AS DOUBLE)')} AS avgdl FROM dl
),
qtoks AS (SELECT doc_id, term FROM toks_f WHERE term IN ({terms})),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qtoks GROUP BY doc_id, term),
df AS (
    SELECT term, COUNT(*) AS df
    FROM (SELECT DISTINCT doc_id, term FROM qtoks) GROUP BY term
),
scored AS (
    SELECT t.doc_id,
           (ROUND(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)) * 1e6) / 1e6)
             * CAST(t.tf AS DOUBLE)
             / (CAST(t.tf AS DOUBLE)
                + {_K1} * (1.0 - {_B} + {_B} * CAST(l.dl AS DOUBLE) / s.avgdl)) AS contrib
    FROM tf t
    JOIN df f ON t.term = f.term
    JOIN dl l ON t.doc_id = l.doc_id
    CROSS JOIN stats s
),
doc_scores AS (
    SELECT doc_id,
           {sql_micro(sql_dsum('contrib'))} AS score_ppm,
           COUNT(*) AS n_terms_matched
    FROM scored GROUP BY doc_id
)
SELECT * FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id ASC) AS rank,
           doc_id, score_ppm, n_terms_matched
    FROM doc_scores
) WHERE rank <= {_TOP_K}
"""


register(
    QuerySpec(
        "bm25_search",
        q_bm25_search,
        _sql(),
        "TXT-bm25,A5,W",
        False,
        "Okapi BM25 top-k relevance ranking over exploded inverted-index relation",
    )
)


# --- materialized inverted index ---------------------------------------------
# BM25 above EXPLODES an ephemeral postings relation per query; a search
# system materializes the index ONCE: term → posting list (doc_id, tf) +
# document frequency. Emitted here for the top-50 terms by df (ties
# term-asc) with the posting list reduced to integer audit columns
# (length, tf sum, order-free checksum over every "doc:tf" posting) so
# the result stays bounded and hash-comparable while still pinning the
# full posting MULTISET.
#
# 100 TB shape — two partial-aggregated exchanges, nothing single-task:
# (1) (term, doc) tf agg: docs are contiguous in the scan, so map-side
# combine collapses occurrences to distinct pairs BEFORE the exchange;
# (2) per-term stats agg: ≤|vocab| rows leave each partition. The
# checksum is a SUM of 40-bit per-posting hashes (hi/lo long split,
# recombined in DECIMAL(38,0) once per term — the dsum trick without the
# scaling), so it partial-aggregates like any sum. The round-4 form
# md5'd the SORTED posting string per term: one task per term sorting
# and concatenating the term's whole posting list — with the corpus's
# 31-term vocabulary that plan was ≤31 active tasks and the measured
# 3.9×-at-sf10 bottleneck (and before that, the full-vocabulary
# collect_list OOM). A production writer partitionBy(term-bucket)s the
# postings relation with sort-on-write instead of checksumming; the plan
# is identical up to the sink. Exact-envelope note: the lo-sum holds to
# ~2³¹ postings per term; past that, bucket the checksum by
# (term, doc_id % B) — the same dial the writer uses.

_IDX_TOPK = 50
_IDX_MASK31 = (1 << 31) - 1
_IDX_POW31 = 1 << 31
# 40-bit posting hash (r10: low 40 bits of Spark's xxhash64(doc_id, tf),
# replacing the md5 hex prefix — same overflow envelope, but computable as
# ONE vectorized numpy pass in the kernel, native codegen in the
# relational twin, and exactly replayable in DuckDB via
# functions/xxh64_sql.xxh64_pair_u64_sql_from)
_IDX_MASK40 = (1 << 40) - 1


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel form (default since r10): per-BATCH term partials from a
    mapInPandas kernel, so the postings relation never crosses an
    exchange.

    The round-9 floor decomposition (PERF.md round 10) measured the
    sf10 standalone at 2.11 s with this ladder: tokenize+explode 0.44 s,
    + (term, doc) pair aggregation 1.47 s (THE floor — an 11.6M-group
    two-level hash aggregate whose exchange Spark requires for
    correctness), + md5/decimal checksum 0.64 s. But the pair exchange
    is semantically REDUNDANT on this data layout: a document's tokens
    never span scan partitions (explode preserves row locality), so the
    map-side pair counts are already exact. DataFrame groupBy cannot be
    told that; a mapInPandas kernel CAN exploit it — each Arrow batch
    of (doc_id, text) rows is tokenized in Python (Counter per doc =
    the exact tf), each posting is md5-folded into the SAME 40-bit
    hi/lo checksum the relational form computes, and only per-batch
    TERM PARTIALS (term, df, tf, hi, lo — vocab-bounded) are emitted.
    The one exchange then carries |vocab|·n_batches tiny rows. Measured
    sf10 standalone: 2.11 s → ~0.8 s (PERF.md round 10).

    Output is bit-identical to ``q_inverted_index_relational`` (pinned
    by test + the unchanged oracle): same split(' ') semantics, same
    md5("doc:tf") postings hash, same order-free hi/lo sum recombined
    in DECIMAL(38,0).

    Route choice at 100 TB: per-batch partials are vocab-bounded state —
    the win whenever |vocab per batch| ≪ |postings per batch| (every
    natural-language corpus; here 31 ≪ 230k). For adversarial vocab
    (every token unique — partials degenerate to the postings relation
    plus Python overhead) the relational form below remains the plan,
    exactly like pwindow's warn-and-degrade routing."""
    import pandas as pd

    d = spread(load(spark, sf_dir, "documents"), spark).select("doc_id", "text")

    def batch_partials(batches):
        from collections import Counter

        import numpy as np

        from lakehouse_spain_mobility_spark.functions.xxh64_sql import (
            xxh64_pair_np,
        )

        for pdf in batches:
            terms: list = []
            docs: list = []
            tfs: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue
                c = Counter(text.split(" "))
                c.pop("", None)
                for term, tf in c.items():
                    terms.append(term)
                    docs.append(doc_id)
                    tfs.append(tf)
            if not terms:
                continue
            tf_arr = np.asarray(tfs, dtype=np.int64)
            # per-posting 40-bit hash, ONE vectorized pass (the md5 form
            # spent ~0.9 s of kernel wall in 11.6M hashlib calls at sf10;
            # the numpy xxh64 twin is ~20 array ops total — PERF.md r10)
            h = xxh64_pair_np(np.asarray(docs, dtype=np.int64), tf_arr) & np.int64(
                _IDX_MASK40
            )
            part = pd.DataFrame(
                {
                    "term": terms,
                    "df": np.ones(len(terms), dtype=np.int64),
                    "tf": tf_arr,
                    "hi": h >> np.int64(31),
                    "lo": h & np.int64(_IDX_MASK31),
                }
            ).groupby("term", sort=False, as_index=False).sum()
            yield part

    partials = d.mapInPandas(
        batch_partials,
        "term string, df bigint, tf bigint, hi bigint, lo bigint",
    )
    stats = partials.groupBy("term").agg(
        F.sum("df").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        (
            F.sum(F.col("hi").cast("decimal(38,0)")) * F.lit(_IDX_POW31).cast("decimal(38,0)")
            + F.sum(F.col("lo").cast("decimal(38,0)"))
        ).cast("string").alias("postings_check"),
    )
    top = global_topk(stats, _IDX_TOPK, [F.desc("df"), F.asc("term")])
    return top.select("rank", "term", "df", "total_tf", "postings_check")


def q_inverted_index_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spread the (few-file) documents scan before the explode: the map
    # side — tokenize + the full (term, doc) partial aggregation — is
    # otherwise serialized into as many tasks as the table has row-group
    # splits (ONE at the decade scales; the measured 2.9×-at-sf10
    # residue). Doc rows are tiny relative to their exploded tokens, so
    # the exchange is ~2% of the relation it parallelizes — and spread()
    # SKIPS it entirely when the scan already has enough splits (a
    # production corpus with thousands of files pays nothing; AQE would
    # NOT coalesce an explicit-count repartition away).
    d = spread(load(spark, sf_dir, "documents"), spark)
    tf = (
        d.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    # 40-bit posting hash: low 40 bits of xxhash64(doc_id, tf) — small
    # enough that the lo/hi long partials never overflow at any realistic
    # per-term df, native codegen here, one numpy pass in the kernel form,
    # and SQL-replayed in the oracle (functions/xxh64_sql).
    h = F.xxhash64("doc_id", "tf").bitwiseAND(F.lit(_IDX_MASK40))
    stats = tf.select("term", "tf", h.alias("h")).groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        (
            F.sum(F.shiftright(F.col("h"), 31)).cast("decimal(38,0)")
            * F.lit(_IDX_POW31).cast("decimal(38,0)")
            + F.sum(F.col("h").bitwiseAND(F.lit(_IDX_MASK31))).cast("decimal(38,0)")
        ).cast("string").alias("postings_check"),
    )
    top = global_topk(stats, _IDX_TOPK, [F.desc("df"), F.asc("term")])
    return top.select("rank", "term", "df", "total_tf", "postings_check")


def _invidx_sql() -> str:
    from ..functions.xxh64_sql import xxh64_pair_u64_sql_from

    # tf is both a hash input and a carried output; the generator consumes
    # its b_expr from the carry chain, so it rides along under an alias
    tf_sql = """
    SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf, CAST(COUNT(*) AS BIGINT) AS tf_out
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ) WHERE term <> ''
    GROUP BY 1, 2
"""
    hashed_sql = xxh64_pair_u64_sql_from("doc_id", "tf", tf_sql, "term, tf_out")
    return f"""
WITH hashed AS (
    SELECT term, tf_out AS tf,
           CAST(h_u & {_IDX_MASK40}::UBIGINT AS BIGINT) AS h
    FROM ({hashed_sql})
),
stats AS (
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           CAST(CAST(SUM(h >> 31) AS DECIMAL(38,0)) * {_IDX_POW31}
                + CAST(SUM(h & {_IDX_MASK31}) AS DECIMAL(38,0)) AS VARCHAR) AS postings_check
    FROM hashed
    GROUP BY term
)
SELECT rank, term, df, total_tf, postings_check FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY df DESC, term ASC) AS rank, *
    FROM stats
) WHERE rank <= {_IDX_TOPK}
"""


_INVIDX_SQL = _invidx_sql()


register(
    QuerySpec(
        "inverted_index",
        q_inverted_index,
        _INVIDX_SQL,
        "TXT-index,A3",
        False,
        "Materialized inverted index: per-term df/tf + xxh64-pinned posting-multiset checksums, "
        "top-50 by df (mapInPandas vocab-partial kernel — postings never cross an exchange)",
    )
)
register(
    QuerySpec(
        "inverted_index_relational",
        q_inverted_index_relational,
        _INVIDX_SQL,
        "TXT-index,A3",
        False,
        "Relational twin of inverted_index (explode + pair-agg + term-agg): the "
        "unbounded-vocab route and the kernel form's bit-equality A/B reference",
    )
)
