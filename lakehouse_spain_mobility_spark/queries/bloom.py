"""Bloom-filter decontamination: probabilistic benchmark-overlap screening.

The exact decontamination operator (``queries/text.py:q_decontamination``)
broadcasts the full benchmark gram set. At 100 TB the bench set itself can
be large (every eval suite × every paraphrase), and what a production
pipeline actually ships to executors is a *Bloom filter* over bench grams:
a fixed-size bitmap (here 16 Ki bits = 512 64-row words, kilobytes instead
of the gram strings), k=3 md5-derived probes per gram, zero false
negatives, tunable false positives. This query materializes the filter as
a relational bitmap (word_idx → 32-bit word, OR-aggregated), collects the
≤512 words once and injects them as a literal array (the A5 scalar
pattern), probes every training gram with row-local bit arithmetic, and
reports per-language: docs flagged by the filter, docs flagged by the
exact semi-join truth, and the false-positive overhang — the number a
pipeline operator watches to size ``m``.

Engine-portable by construction: probe positions come from fixed md5 hex
substrings (identical in both engines), the bitmap is built with integer
``bit_or`` aggregation, and membership is integer mask arithmetic. Words
are 32-bit so no shift ever reaches the BIGINT sign bit (DuckDB raises on
``1 << 63``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, register
from .tables import load, spread

_W = 8  # gram width — same as the exact decontamination operator
_BENCH = 20  # doc_id < 20 stands in for the benchmark set
_M_BITS = 16384  # filter size (2^14 bits)
_WORD_BITS = 32
_K = 3  # probes per gram

_HEX = "0123456789abcdef"


def _sql_hex_val(h: str, pos: int) -> str:
    return f"(instr('{_HEX}', substring({h}, {pos}, 1)) - 1)"


def _sql_probe(h: str, i: int) -> str:
    """16-bit integer from md5 hex chars [4i+1 .. 4i+4], mod m."""
    c1 = _sql_hex_val(h, 4 * i + 1)
    c2 = _sql_hex_val(h, 4 * i + 2)
    c3 = _sql_hex_val(h, 4 * i + 3)
    c4 = _sql_hex_val(h, 4 * i + 4)
    return f"(((({c1}) * 16 + ({c2})) * 16 + ({c3})) * 16 + ({c4})) % {_M_BITS}"


def _probe_cols(h: F.Column) -> list[F.Column]:
    out = []
    for i in range(_K):
        val = None
        for j in range(4):
            c = F.instr(F.lit(_HEX), F.substring(h, 4 * i + 1 + j, 1)) - F.lit(1)
            val = c if val is None else val * F.lit(16) + c
        out.append((val % F.lit(_M_BITS)).alias(f"p{i}"))
    return out


def q_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")

    def grams(df):
        words = F.split(F.col("text"), " ")
        return (
            df.filter(F.size(words) >= _W)
            .select(
                "doc_id",
                "lang",
                words.alias("w"),
                F.explode(F.sequence(F.lit(1), F.size(words) - (_W - 1))).alias("i"),
            )
            .select(
                "doc_id", "lang", F.concat_ws(" ", F.slice("w", F.col("i"), _W)).alias("g")
            )
        )

    bench_grams = grams(d.filter(F.col("doc_id") < _BENCH)).select("g").distinct()

    # Build: gram → k probe positions → (word_idx, mask) → OR-aggregate.
    # <= m/32 rows regardless of bench size. The bitmap is collected once
    # (a tiny aggregate over the pushdown-pruned bench docs — the A5
    # scalar-injection pattern) and shipped to executors as a 512-word
    # literal array: the filter probe then compiles to row-local codegen
    # arithmetic with ZERO joins and ZERO extra shuffles on the training
    # side. (The round-2 form stacked 3 probe rows per gram, joined the
    # bitmap relationally, and re-grouped by the gram string — two full
    # shuffles of the ~100M-row gram relation that this removes; measured
    # 18.5 s → single-digit seconds at sf1.)
    probes = bench_grams.select(F.md5(F.col("g").cast("binary")).alias("h")).select(
        *_probe_cols(F.col("h"))
    )
    positions = probes.selectExpr(
        f"stack({_K}, {', '.join(f'p{i}' for i in range(_K))}) AS pos"
    )
    mask_expr = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))")
    bitmap = (
        positions.select(
            (F.col("pos") / F.lit(_WORD_BITS)).cast("bigint").alias("word_idx"),
            mask_expr.alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    words = [0] * (_M_BITS // _WORD_BITS)
    for row in bitmap.collect():
        words[int(row["word_idx"])] = int(row["word"])
    # F.lit(list) builds ONE ArrayType Literal node (constant, folded once)
    # — never F.array(*lits), which re-evaluates a 512-element CreateArray
    # per row per probe (measured 28 s vs 3.4 s at sf0.1).
    word_arr = F.lit(words).cast("array<bigint>")

    # Training side: one narrow map per pass, no gram distinct — flagging
    # is existential per doc_id, so duplicate grams cannot change it.
    # The explode multiplies work ~200× past the scan, so spread the RAW
    # documents (cheap, pre-explosion) across the cluster first: a small
    # parquet file arrives as one split, and without the round-2 distinct
    # shuffle the whole gram pipeline would otherwise run in that single
    # task (measured 24 s single-task vs ~3 s at 32-way, sf0.1).
    train_docs = spread(d.filter(F.col("doc_id") >= _BENCH), spark)
    train_grams = grams(train_docs)

    def _bit_set(i: int) -> F.Column:
        pos = F.col(f"p{i}")
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p{i} % {_WORD_BITS} AS INT))")
        word = F.element_at(word_arr, (pos / F.lit(_WORD_BITS)).cast("int") + F.lit(1))
        return word.bitwiseAND(mask) == mask

    # The explode(array(...)) wrappers are PROJECTION BARRIERS: Catalyst's
    # CollapseProject inlines select-chain expressions into every use site,
    # so without them each p{i} reference re-evaluates its md5 (9 md5s per
    # gram across the three bit tests — measured 46 s vs 2.3 s at sf1).
    # Generate nodes are not collapsed, so h and the probe struct are each
    # computed exactly once per gram.
    #
    # r11 fused flags: ONE pass over the gram stream computes BOTH signals
    # — the bloom probe is row-local arithmetic, the exact truth a LEFT
    # broadcast join against the (bounded, benchmark-sized) gram set —
    # and one per-doc max-aggregation replaces the r10 twin pipelines
    # (two full gram constructions + two doc-level DISTINCTs + two flag
    # joins). The gram explode and its md5 are the query's dominant map
    # work; building them once instead of twice is guide §2.3 "aggregate
    # before you shuffle" / the boilerplate_removal shared-projection
    # move, fused instead of checkpointed because the two consumers fold
    # into one aggregation (no materialization barrier needed). Paired
    # same-session A/Bs, rows identical: sf1 3.74 → 2.94 s (−21%); sf0.1
    # wash (2.20 vs 2.13 — below saturation the twin pipelines overlapped
    # across idle cores, so fusing is free there and wins once the map
    # side saturates).
    tp = (
        train_grams.select(
            "doc_id", "g",
            F.explode(F.array(F.md5(F.col("g").cast("binary")))).alias("h"),
        )
        .select(
            "doc_id", "g",
            F.explode(F.array(F.struct(*_probe_cols(F.col("h"))))).alias("p"),
        )
        .select("doc_id", "g", "p.*")
    )
    all_set = None
    for i in range(_K):
        bit = _bit_set(i)
        all_set = bit if all_set is None else all_set & bit
    flags = (
        tp.join(F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.max(all_set.cast("int")).alias("_bloom"),
            F.max(F.coalesce(F.col("_hit"), F.lit(0))).alias("_exact"),
        )
        .select(
            "doc_id",
            # NULL (not 0) when unflagged — the per-lang rollup below is
            # written against the r10 left-join-of-flagged-docs shape.
            F.when(F.col("_bloom") == 1, 1).alias("bloom"),
            F.when(F.col("_exact") == 1, 1).alias("exact"),
        )
    )
    train = d.filter(F.col("doc_id") >= _BENCH)
    return (
        train.join(flags, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_train_docs"),
            F.sum(F.coalesce(F.col("bloom"), F.lit(0))).cast("bigint").alias("n_bloom_flagged"),
            F.sum(F.coalesce(F.col("exact"), F.lit(0))).cast("bigint").alias("n_exact_flagged"),
            F.sum(
                F.when((F.coalesce(F.col("bloom"), F.lit(0)) == 1) & F.col("exact").isNull(), 1)
                .otherwise(0)
            ).cast("bigint").alias("n_false_positives"),
        )
    )


def _sql() -> str:
    probe_exprs = ", ".join(f"({_sql_probe('h', i)}) AS p{i}" for i in range(_K))
    probe_list = ", ".join(f"p{i}" for i in range(_K))
    return f"""
WITH g AS (
    SELECT doc_id, lang, array_to_string(w[i:i+{_W - 1}], ' ') AS g
    FROM (
        SELECT doc_id, lang, w,
               unnest(generate_series(1, len(w) - {_W - 1})) AS i
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
    )
),
bench AS (SELECT DISTINCT g FROM g WHERE doc_id < {_BENCH}),
bench_probes AS (
    SELECT {probe_exprs} FROM (SELECT md5(g) AS h FROM bench)
),
bench_pos AS (
    SELECT unnest([{probe_list}]) AS pos FROM bench_probes
),
bitmap AS (
    SELECT CAST(pos // {_WORD_BITS} AS BIGINT) AS word_idx,
           bit_or(CAST(1 AS BIGINT) << (pos % {_WORD_BITS})) AS word
    FROM bench_pos GROUP BY 1
),
train_grams AS (
    SELECT DISTINCT doc_id, lang, g FROM g WHERE doc_id >= {_BENCH}
),
tp AS (
    SELECT doc_id, lang, g, {probe_exprs}
    FROM (SELECT doc_id, lang, g, md5(g) AS h FROM train_grams)
),
tpos AS (
    SELECT doc_id, lang, g,
           CAST(pos // {_WORD_BITS} AS BIGINT) AS word_idx,
           CAST(1 AS BIGINT) << (pos % {_WORD_BITS}) AS mask
    FROM (SELECT doc_id, lang, g, unnest([{probe_list}]) AS pos FROM tp)
),
hits AS (
    SELECT t.doc_id, t.lang, t.g,
           SUM(CASE WHEN (COALESCE(b.word, 0) & t.mask) = t.mask THEN 1 ELSE 0 END) AS n_hit
    FROM tpos t LEFT JOIN bitmap b ON t.word_idx = b.word_idx
    GROUP BY 1, 2, 3
),
bloom_flagged AS (SELECT DISTINCT doc_id FROM hits WHERE n_hit = {_K}),
exact_flagged AS (
    SELECT DISTINCT t.doc_id FROM train_grams t JOIN bench USING (g)
)
SELECT d.lang,
       COUNT(*) AS n_train_docs,
       CAST(SUM(CASE WHEN bf.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_flagged,
       CAST(SUM(CASE WHEN ef.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_flagged,
       CAST(SUM(CASE WHEN bf.doc_id IS NOT NULL AND ef.doc_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positives
FROM documents d
LEFT JOIN bloom_flagged bf ON d.doc_id = bf.doc_id
LEFT JOIN exact_flagged ef ON d.doc_id = ef.doc_id
WHERE d.doc_id >= {_BENCH}
GROUP BY d.lang
"""


register(
    QuerySpec(
        "bloom_decontamination",
        q_bloom_decontamination,
        _sql(),
        "TXT-decontam,BLOOM",
        False,
        "Bloom-filter benchmark screening: broadcast bitmap, k=3 md5 probes, FP-vs-exact audit",
    )
)
