"""End-to-end training-data curation funnel: one auditable accounting row
per pipeline stage.

The flagship composition of the LLM-pipeline families — the query a data
lead actually runs before a training launch: how many documents survive
each gate, in order. Stages (each filters the previous stage's
survivors):

0. corpus        — the train pool (benchmark stand-ins excluded)
1. quality       — ≥30 words and mean word length ≤12 chars, checked in
                   pure integer arithmetic (chars-minus-gaps ≤ 12·words),
2. exact_dedup   — keep-first per md5 fingerprint of normalized text,
3. fuzzy_dedup   — drop the higher doc_id of every df-capped word-3-gram
                   Jaccard ≥0.5 pair among survivors,
4. decontaminated— drop docs sharing any word-8-gram with the benchmark,
5-7. split_*     — md5-bucket train/val/test counts of the final set.

Every output is an integer (stage_idx, n_docs) so the row set is
hash-trivial across engines. At 100 TB the funnel is the same DAG the
individual operators already argue for (SCALE.md §4): each stage is one
narrow map or one bounded shuffle over the survivor set, the bench grams
broadcast, and nothing is quadratic — the funnel adds accounting, not new
data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import text_analysis as ta
from . import QuerySpec, register
from .dedup import MAX_SHINGLE_DF
from .tables import load, spread

_BENCH = 20  # doc_id < 20 = benchmark stand-in (decontamination convention)
_MIN_WORDS = 30
_MAX_MEAN_WLEN = 12
_DECON_W = 8


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") >= _BENCH).select("doc_id", "text")

    n_words = F.size(F.split(F.col("text"), " "))
    # mean word length <= 12 in integer math: chars excluding separators
    # is len(text) - (n_words - 1); compare cross-multiplied.
    quality = corpus.filter(
        (n_words >= _MIN_WORDS)
        & ((F.length("text") - n_words + 1) <= F.lit(_MAX_MEAN_WLEN) * n_words)
    )

    fp = quality.select("doc_id", ta.fingerprint_md5(F.col("text")).alias("fp"))
    keep_first = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    # Stage frontiers below are eager-checkpointed: every later stage count
    # (and the split rollup) consumes each survivor set, and because all
    # eight stage counts union into ONE action a lazy checkpoint would
    # still recompute the chain per branch within that job — eager
    # materializes each survivor set exactly once.
    # r10: each eager-checkpointed frontier is spread() — the post-join
    # frames AQE-coalesce to ~1 partition at this size, which would run
    # the downstream explode stages (shingles, decon 8-grams, split md5)
    # on one core; spread reads the REAL materialized partition count and
    # no-ops at scale. Ladder evidence in OPTIMIZATION_r10.md.
    exact = spread(
        quality.join(keep_first.select("doc_id"), "doc_id", "left_semi")
        .localCheckpoint(eager=True),
        spark,
    )

    pairs = (
        dd.capped_jaccard_pairs(
            dd.shingles(exact, "doc_id", "text"), MAX_SHINGLE_DF, min_jaccard=0.5,
            broadcast_sizes=dd.docs_fit_broadcast(sf_dir),
        )
        .select("d2")
        .distinct()
    )
    fuzzy = spread(
        exact.join(
            pairs.select(F.col("d2").alias("doc_id")), "doc_id", "left_anti"
        ).localCheckpoint(eager=True),
        spark,
    )

    def grams(df, w):
        words = F.split(F.col("text"), " ")
        return (
            df.filter(F.size(words) >= w)
            .select(
                "doc_id",
                words.alias("w"),
                F.explode(F.sequence(F.lit(1), F.size(words) - (w - 1))).alias("i"),
            )
            .select("doc_id", F.concat_ws(" ", F.slice("w", F.col("i"), w)).alias("g"))
        )

    bench_grams = (
        grams(d.filter(F.col("doc_id") < _BENCH).select("doc_id", "text"), _DECON_W)
        .select("g")
        .distinct()
    )
    contaminated = (
        grams(fuzzy, _DECON_W)
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = spread(
        fuzzy.join(contaminated, "doc_id", "left_anti").localCheckpoint(eager=True),
        spark,
    )

    b = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    split = clean.select(
        "doc_id",
        F.when(b < "c0", "train").when(b < "e0", "val").otherwise("test").alias("split"),
    )

    def stage(idx, name, df):
        return df.agg(F.count("*").cast("bigint").alias("n_docs")).select(
            F.lit(idx).alias("stage_idx"), F.lit(name).alias("stage"), "n_docs"
        )

    out = (
        stage(0, "corpus", corpus)
        .unionByName(stage(1, "quality", quality))
        .unionByName(stage(2, "exact_dedup", exact))
        .unionByName(stage(3, "fuzzy_dedup", fuzzy))
        .unionByName(stage(4, "decontaminated", clean))
    )
    splits = (
        split.groupBy("split")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select(
            F.when(F.col("split") == "train", 5)
            .when(F.col("split") == "val", 6)
            .otherwise(7)
            .alias("stage_idx"),
            F.concat(F.lit("split_"), F.col("split")).alias("stage"),
            "n_docs",
        )
    )
    return out.unionByName(splits)


def _sql() -> str:
    shingles_sql = dd.sql_shingles("exact_docs", "doc_id", "text")
    capped_sql = dd.sql_df_capped_shingles(shingles_sql, MAX_SHINGLE_DF)
    pairs_sql = dd.sql_jaccard_pairs(capped_sql, min_jaccard=0.5)
    return f"""
WITH corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id >= {_BENCH}
),
quality AS (
    SELECT doc_id, text FROM corpus
    WHERE len(string_split(text, ' ')) >= {_MIN_WORDS}
      AND (len(text) - len(string_split(text, ' ')) + 1)
          <= {_MAX_MEAN_WLEN} * len(string_split(text, ' '))
),
fp AS (
    SELECT doc_id, {ta.sql_fingerprint_md5('text')} AS fp FROM quality
),
keep_first AS (SELECT fp, MIN(doc_id) AS doc_id FROM fp GROUP BY fp),
exact_docs AS (
    SELECT q.doc_id, q.text FROM quality q
    JOIN keep_first k ON q.doc_id = k.doc_id
),
dup_victims AS (SELECT DISTINCT d2 AS doc_id FROM ({pairs_sql})),
fuzzy AS (
    SELECT e.doc_id, e.text FROM exact_docs e
    WHERE e.doc_id NOT IN (SELECT doc_id FROM dup_victims)
),
bench_grams AS (
    SELECT DISTINCT array_to_string(w[i:i+{_DECON_W - 1}], ' ') AS g
    FROM (
        SELECT w, unnest(generate_series(1, len(w) - {_DECON_W - 1})) AS i
        FROM (SELECT string_split(text, ' ') AS w FROM documents
              WHERE doc_id < {_BENCH})
    )
),
train_grams AS (
    SELECT doc_id, array_to_string(w[i:i+{_DECON_W - 1}], ' ') AS g
    FROM (
        SELECT doc_id, w, unnest(generate_series(1, len(w) - {_DECON_W - 1})) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM fuzzy)
    )
),
contaminated AS (
    SELECT DISTINCT t.doc_id FROM train_grams t JOIN bench_grams b USING (g)
),
clean AS (
    SELECT f.doc_id FROM fuzzy f
    WHERE f.doc_id NOT IN (SELECT doc_id FROM contaminated)
),
split AS (
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e0' THEN 'val'
                ELSE 'test' END AS split
    FROM clean
)
SELECT 0 AS stage_idx, 'corpus' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM corpus
UNION ALL SELECT 1, 'quality', CAST(COUNT(*) AS BIGINT) FROM quality
UNION ALL SELECT 2, 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM exact_docs
UNION ALL SELECT 3, 'fuzzy_dedup', CAST(COUNT(*) AS BIGINT) FROM fuzzy
UNION ALL SELECT 4, 'decontaminated', CAST(COUNT(*) AS BIGINT) FROM clean
UNION ALL
SELECT CASE split WHEN 'train' THEN 5 WHEN 'val' THEN 6 ELSE 7 END,
       'split_' || split, CAST(COUNT(*) AS BIGINT)
FROM split GROUP BY split
"""


register(
    QuerySpec(
        "curation_funnel",
        q_curation_funnel,
        _sql(),
        "TD-funnel,DD-exact,DD-jaccard,TXT-decontam,ML-split",
        False,
        "End-to-end curation accounting: quality -> exact -> fuzzy -> decontam -> split, integer rows",
    )
)
