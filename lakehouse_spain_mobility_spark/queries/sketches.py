"""Mergeable sketch operators: HyperLogLog distinct-count and Count-Min
frequency estimation, plus reciprocal-rank fusion for hybrid retrieval.

Streaming/OLAP engines ship sketch aggregates (HLL, CMS, theta) because at
100 TB an exact COUNT(DISTINCT ...) over a high-cardinality key is a full
shuffle of the key universe, while a sketch is a constant-size mergeable
state per group that composes with partial aggregation. These operators
implement the sketches from first principles over md5 (identical lowercase
hex in Spark and DuckDB — the repo's standard determinism anchor) so the
estimate itself is oracle-checkable bit-for-bit, which neither engine's
built-in approx aggregates are (Spark HLL++ and DuckDB approx_count_distinct
hash differently).

- ``hll_distinct`` — classic Flajolet et al. HyperLogLog (m=64 registers,
  8-bit bucket index folded to 6 bits, 48-bit rho stream): per
  ``event_type``, the register table is a ``GROUP BY (type, bucket) MAX
  (rho)`` — map-side combinable, constant state — and the harmonic-mean
  estimate (with the small-range linear-counting branch) is evaluated from
  EXACT integers: ``sum(2^(49-rho))`` is carried as a scaled BIGINT so no
  float accumulation order can diverge between engines; the only
  transcendental (``ln`` in linear counting) is absorbed by the repo's
  ppm-quantization convention. Exact distinct counts ride along so the
  result doubles as an accuracy contract.
- ``cms_heavy_hitters`` — Count-Min sketch (Cormode & Muthukrishnan 2005):
  d=4 salted md5 rows x w=512 buckets; the sketch build is one hash
  aggregation over (salt, bucket) — 2048 cells regardless of vocabulary
  size — and the estimate for each of the exact top-20 tokens is the MIN
  over its 4 cells. Pure integer arithmetic end to end; the ``overcount``
  column exposes the sketch's one-sided error for the accuracy contract.
- ``rrf_fusion`` — reciprocal rank fusion (Cormack et al. 2009), the
  standard hybrid-retrieval combiner: fuse the BM25 ranking
  (``queries/search.py``) with an independent term-frequency ranking via
  ``sum 1/(60+rank)`` over a full-outer rank join, and return the fused
  top-10. The oracle nests the registered BM25 oracle verbatim, so the
  fusion is parity-checked against exactly the ranking the driver already
  verifies.

At 100 TB: HLL registers are 64 rows per group (map-side partial MAX
collapses each input partition to <= 64*groups rows before the exchange);
the CMS is 2048 cells built in one narrow aggregation and broadcast to the
probe side; RRF joins two k-row toplists. Nothing here scales with corpus
size except the initial scans. The reference (a DuckDB mobility lakehouse)
has no sketch surface; these extend the training-data/curation north star
(cf. ``dags/gravity/calculate_gold.py:11-45`` for the scalar-broadcast
pattern the estimates reuse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.topk import global_topk
from . import QuerySpec, register
from .tables import load

_HEX = "0123456789abcdef"

# --- HyperLogLog ------------------------------------------------------------

_HLL_M = 64  # registers
_HLL_RHO_BITS = 48  # rho stream width (12 md5 hex chars)
# alpha_64 * m^2 * 2^49, precomputed exactly once so both engines parse the
# same decimal literal (alpha_64 = 0.709, Flajolet et al. 2007 Fig. 3).
_HLL_NUM = repr(0.709 * _HLL_M * _HLL_M * float(2 ** 49))
_POW49 = 2 ** 49


def _hexval(h: str, pos: int) -> str:
    """0-15 value of 1-based hex char ``pos`` — instr is 1-based in both
    engines, so this string is dialect-neutral."""
    return f"(instr('{_HEX}', substring({h}, {pos}, 1)) - 1)"


def _hll_bucket(h: str) -> str:
    """6-bit register index from md5 hex chars 1-2 (8 bits folded mod m)."""
    return f"((({_hexval(h, 1)}) * 16 + ({_hexval(h, 2)})) % {_HLL_M})"


def _hex_bigint(h: str, start: int, n: int, spark_dialect: bool) -> str:
    """BIGINT from ``n`` hex chars of ``h`` starting at 1-based ``start``.
    One engine-native hex parse instead of an n-step instr fold (the fold
    is correct but costs ~2n string ops per row): Spark via conv(base 16),
    DuckDB via its 0x-literal cast. Both yield the same exact integer for
    n <= 15 (60 bits)."""
    sub = f"substring({h}, {start}, {n})"
    if spark_dialect:
        return f"CAST(conv({sub}, 16, 10) AS BIGINT)"
    return f"CAST(concat('0x', {sub}) AS BIGINT)"


def _hll_w(h: str, spark_dialect: bool = True) -> str:
    """48-bit rho stream from md5 hex chars 3-14 as one BIGINT."""
    return _hex_bigint(h, 3, 12, spark_dialect)


def _hll_rho(h: str, spark_dialect: bool = True) -> str:
    """Position of the first 1-bit of the 48-bit stream (1-based), 49 when
    the stream is all zeros. bin() drops leading zeros and returns '0' for
    zero in BOTH engines, so 49 - length(bin(w)) is the leading-zero count
    + 1 without any float log."""
    w = _hll_w(h, spark_dialect)
    return (
        f"(CASE WHEN ({w}) = 0 THEN {_HLL_RHO_BITS + 1} "
        f"ELSE {_HLL_RHO_BITS + 1} - length(bin(CAST({w} AS BIGINT))) END)"
    )


def _hll_estimate_ppm() -> str:
    """Estimate in integer micro-units from (nb, s_present) — identical
    expression text on both engines. s_present carries sum(2^(49-rho)) as
    an exact integer; absent registers (rho=0) contribute 2^49 each, so the
    harmonic sum is exact before the single double division."""
    s_total = f"(s_present + ({_HLL_M} - nb) * {_POW49})"
    e_raw = f"({_HLL_NUM} / CAST({s_total} AS DOUBLE))"
    v = f"({_HLL_M} - nb)"
    est = (
        f"(CASE WHEN {e_raw} <= {2.5 * _HLL_M} AND {v} > 0 "
        f"THEN {float(_HLL_M)} * ln({float(_HLL_M)} / CAST({v} AS DOUBLE)) "
        f"ELSE {e_raw} END)"
    )
    return f"CAST(ROUND({est} * 1000000.0) AS BIGINT)"


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RAW-ROW registers (round 9, reverting the round-8 dedup-first form):
    # register extraction runs on every scanned row with O(m) map-side MAX
    # state — the textbook mergeable-sketch shuffle shape SCALE.md §8e
    # documents — and the exact-contract column pays its own
    # COUNT(DISTINCT). The r8 dedup-first form derived both branches from
    # a distinct (event_type, user_id) exchange; that wins only when
    # distincts ≪ raw (the replica-degenerate sf10 testdata, 1.5 vs 2.1 s)
    # and LOSES 2.7× at sf30 where the 2.25M-pair distinct hashtable is
    # the dominator (measured: distinct 7.0 s vs raw-row registers 1.0 s,
    # PERF.md round 9). At corpus scale the distinct relation is
    # fact-sized; the sketch must never depend on its collapse.
    ev = load(spark, sf_dir, "events")
    # explode(array(...)) is the repo's projection barrier (SCALE.md §8c):
    # bucket + rho reference `h` repeatedly; CollapseProject would
    # otherwise inline the md5 into every reference.
    hashed = ev.select(
        "event_type",
        F.explode(
            F.array(F.expr("md5(cast(cast(user_id as string) as binary))"))
        ).alias("h"),
    )
    rows = hashed.select(
        "event_type",
        F.expr(_hll_bucket("h")).alias("bucket"),
        F.expr(_hll_rho("h")).alias("rho"),
    )
    # Register table: constant-size mergeable state (<= m rows per group
    # survive the map-side partial MAX). MAX is duplicate-insensitive, so
    # raw-row and distinct-row registers are value-identical.
    regs = rows.groupBy("event_type", "bucket").agg(F.max("rho").alias("r"))
    per = regs.groupBy("event_type").agg(
        F.count("*").alias("nb"),
        F.sum(F.expr(f"CAST(power(2.0, {_HLL_RHO_BITS + 1} - r) AS BIGINT)")).alias(
            "s_present"
        ),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        exact.join(per, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.col("nb").cast("bigint").alias("registers_nonzero"),
            F.expr(_hll_estimate_ppm()).alias("hll_estimate_ppm"),
        )
    )


def _hll_sql() -> str:
    # the oracle mirrors the raw-row plan: md5 per scanned row, distinct
    # only inside the exact-contract COUNT
    return f"""
WITH hashed AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events
),
rows_ AS (
  SELECT event_type, {_hll_bucket('h')} AS bucket,
         {_hll_rho('h', spark_dialect=False)} AS rho
  FROM hashed
),
regs AS (
  SELECT event_type, bucket, MAX(rho) AS r FROM rows_ GROUP BY 1, 2
),
per AS (
  SELECT event_type, COUNT(*) AS nb,
         CAST(SUM(CAST(power(2.0, {_HLL_RHO_BITS + 1} - r) AS BIGINT)) AS BIGINT)
           AS s_present
  FROM regs GROUP BY 1
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT e.event_type, e.n_exact,
       CAST(p.nb AS BIGINT) AS registers_nonzero,
       {_hll_estimate_ppm()} AS hll_estimate_ppm
FROM exact e JOIN per p USING (event_type)
"""


register(
    QuerySpec(
        "hll_distinct",
        q_hll_distinct,
        _hll_sql(),
        "SK-hll,A1",
        False,
        "HyperLogLog distinct-user estimate per event_type (m=64, exact-integer harmonic sum) vs exact",
    )
)


def q_hll_distinct_x64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast-hash twin of ``hll_distinct`` (VERDICT r8 #2): registers from
    ``xxhash64(user_id)`` — one JVM hash of the raw long, pure integer
    bucket/rho extraction, no md5-of-string and no hex parsing. Fully
    oracle-checkable: the DuckDB side recomputes Spark's exact xxhash64
    via ``functions/xxh64_sql.py`` (XXH64-of-8-bytes in HUGEINT wrapping
    arithmetic), so the estimate hash-matches bit for bit — the
    ``spatial_dissolve_native`` twin pattern, answering whether the md5
    form's residual ratio is hash-choice tax or engine constant."""
    ev = load(spark, sf_dir, "events")
    # raw-row registers, like the md5 form (round 9): O(m) map-side MAX
    # state, never a dependency on distinct-pair collapse. One xxhash64 of
    # the raw long per scanned row costs ~1 s at sf30's 30M rows —
    # measured against 7 s for the distinct exchange it replaces.
    # explode(array(...)) projection barrier as in the md5 form: bucket
    # and rho reference h 3 times; the barrier keeps ONE hash per row.
    hashed = ev.select(
        "event_type",
        F.explode(F.array(F.xxhash64(F.col("user_id")))).alias("h"),
    )
    # bucket = low 6 bits (two's-complement & matches the oracle's
    # unsigned % 64); rho stream = the 48 bits above bit 16.
    rows = hashed.select(
        "event_type",
        F.expr(f"CAST((h & {_HLL_M - 1}) AS INT)").alias("bucket"),
        F.expr(
            f"CAST(CASE WHEN shiftrightunsigned(h, 16) = 0 THEN {_HLL_RHO_BITS + 1} "
            f"ELSE {_HLL_RHO_BITS + 1} - length(bin(shiftrightunsigned(h, 16))) END AS INT)"
        ).alias("rho"),
    )
    regs = rows.groupBy("event_type", "bucket").agg(F.max("rho").alias("r"))
    per = regs.groupBy("event_type").agg(
        F.count("*").alias("nb"),
        F.sum(F.expr(f"CAST(power(2.0, {_HLL_RHO_BITS + 1} - r) AS BIGINT)")).alias(
            "s_present"
        ),
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return exact.join(per, "event_type").select(
        "event_type",
        "n_exact",
        F.col("nb").cast("bigint").alias("registers_nonzero"),
        F.expr(_hll_estimate_ppm()).alias("hll_estimate_ppm"),
    )


def _hll_x64_sql() -> str:
    from ..functions.xxh64_sql import xxh64_u64_sql_from

    hashed = xxh64_u64_sql_from(
        "user_id", "SELECT event_type, user_id FROM events", "event_type"
    )
    return f"""
WITH hashed AS ({hashed}),
rows_ AS (
  SELECT event_type,
         CAST(h_u % {_HLL_M} AS INTEGER) AS bucket,
         CAST(CASE WHEN (h_u >> 16) = 0 THEN {_HLL_RHO_BITS + 1}
              ELSE {_HLL_RHO_BITS + 1} - length(bin(CAST(h_u >> 16 AS BIGINT)))
              END AS INTEGER) AS rho
  FROM hashed
),
regs AS (
  SELECT event_type, bucket, MAX(rho) AS r FROM rows_ GROUP BY 1, 2
),
per AS (
  SELECT event_type, COUNT(*) AS nb,
         CAST(SUM(CAST(power(2.0, {_HLL_RHO_BITS + 1} - r) AS BIGINT)) AS BIGINT)
           AS s_present
  FROM regs GROUP BY 1
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT e.event_type, e.n_exact,
       CAST(p.nb AS BIGINT) AS registers_nonzero,
       {_hll_estimate_ppm()} AS hll_estimate_ppm
FROM exact e JOIN per p USING (event_type)
"""


register(
    QuerySpec(
        "hll_distinct_x64",
        q_hll_distinct_x64,
        _hll_x64_sql(),
        "SK-hll,A1",
        False,
        "HLL twin on xxhash64 registers (oracle recomputes Spark's exact XXH64 in SQL) — md5-vs-fast-hash floor probe",
    )
)

# --- Count-Min sketch heavy hitters -----------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 512  # buckets per row
_CMS_TOPK = 20


def _cms_bucket(salt: int, spark_dialect: bool) -> str:
    """Bucket of ``term`` under salted hash row ``salt``: 16-bit value from
    md5 hex chars 1-4 of 'salt:term', mod w."""
    if spark_dialect:
        h = f"md5(cast(concat('{salt}:', term) as binary))"
    else:
        h = f"md5('{salt}:' || term)"
    expr = _hexval(h, 1)
    for pos in range(2, 5):
        expr = f"(({expr}) * 16 + {_hexval(h, pos)})"
    return f"(({expr}) % {_CMS_W})"


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    # Sketch build: one narrow aggregation to 2048 cells. The per-salt
    # bucket rows explode from the distinct-term counts (not raw
    # occurrences) — same cell totals, |vocab| x d intermediate instead of
    # |corpus| x d. explode(array(...)) is the repo's standard projection
    # barrier so the md5 probes evaluate once per salt.
    cells = counts.select(
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("salt"),
                        F.expr(_cms_bucket(s, True)).alias("bucket"),
                    )
                    for s in range(_CMS_D)
                ]
            )
        ).alias("sb"),
    ).select("cnt", F.col("sb.salt").alias("salt"), F.col("sb.bucket").alias("bucket"))
    sketch = cells.groupBy("salt", "bucket").agg(
        F.sum("cnt").cast("bigint").alias("c")
    )
    top = global_topk(counts, _CMS_TOPK, [F.desc("cnt"), F.asc("term")])
    probes = top.select(
        "rank",
        "term",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("salt"),
                        F.expr(_cms_bucket(s, True)).alias("bucket"),
                    )
                    for s in range(_CMS_D)
                ]
            )
        ).alias("sb"),
    ).select("rank", "term", "cnt", F.col("sb.salt").alias("salt"),
             F.col("sb.bucket").alias("bucket"))
    est = (
        F.broadcast(probes)
        .join(sketch, ["salt", "bucket"])
        .groupBy("rank", "term", "cnt")
        .agg(F.min("c").alias("cms_cnt"))
    )
    return est.select(
        "rank",
        "term",
        F.col("cnt").alias("exact_cnt"),
        "cms_cnt",
        (F.col("cms_cnt") - F.col("cnt")).cast("bigint").alias("overcount"),
    )


def _cms_sql() -> str:
    cell_rows = "\n  UNION ALL ".join(
        f"SELECT term, cnt, {s} AS salt, {_cms_bucket(s, False)} AS bucket FROM counts"
        for s in range(_CMS_D)
    )
    probe_rows = "\n  UNION ALL ".join(
        f"SELECT rank, term, cnt, {s} AS salt, {_cms_bucket(s, False)} AS bucket FROM top"
        for s in range(_CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
counts AS (
  SELECT term, COUNT(*) AS cnt FROM toks WHERE term <> '' GROUP BY term
),
cells AS (
  {cell_rows}
),
sketch AS (
  SELECT salt, bucket, CAST(SUM(cnt) AS BIGINT) AS c FROM cells GROUP BY 1, 2
),
top AS (
  SELECT * FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS rank, term, cnt
    FROM counts
  ) WHERE rank <= {_CMS_TOPK}
),
probes AS (
  {probe_rows}
),
est AS (
  SELECT p.rank, p.term, p.cnt, MIN(s.c) AS cms_cnt
  FROM probes p JOIN sketch s USING (salt, bucket)
  GROUP BY 1, 2, 3
)
SELECT rank, term, cnt AS exact_cnt, cms_cnt,
       CAST(cms_cnt - cnt AS BIGINT) AS overcount
FROM est
"""


register(
    QuerySpec(
        "cms_heavy_hitters",
        q_cms_heavy_hitters,
        _cms_sql(),
        "SK-cms,TXT",
        False,
        "Count-Min sketch (4x512) frequency estimates for the exact top-20 tokens, with one-sided error exposed",
    )
)

# --- Reciprocal rank fusion --------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant
_RRF_TOPK = 10
_FUSE_INPUT_K = 20  # toplist depth fused from each system


def _rrf_ppm() -> str:
    """Fused score in micro-units from nullable rank columns — identical
    text both engines; a doc absent from a system contributes 0."""
    a = f"COALESCE(1.0 / ({_RRF_K}.0 + CAST(rank_bm25 AS DOUBLE)), 0.0)"
    b = f"COALESCE(1.0 / ({_RRF_K}.0 + CAST(rank_tf AS DOUBLE)), 0.0)"
    return f"CAST(ROUND(({a} + {b}) * 1000000.0) AS BIGINT)"


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .search import _TERMS, _bm25_doc_table, q_bm25_search

    bm = q_bm25_search(spark, sf_dir).select(
        "doc_id", F.col("rank").cast("bigint").alias("rank_bm25")
    )
    # tf_total (query-term token count per doc) = Σ tf_t of the SAME
    # per-doc conditional aggregation bm25 scores from — the canonical
    # subtree matches bm25's, so the executed plan shares the doc-grain
    # exchange (one corpus tokenization for the whole fusion, where the
    # round-7 shape paid bm25's three plus its own fourth).
    doc = _bm25_doc_table(spark, sf_dir)
    tf_sum = None
    for i in range(len(_TERMS)):
        c = F.col(f"tf_{i}")
        tf_sum = c if tf_sum is None else tf_sum + c
    tf_total = (
        doc.select("doc_id", tf_sum.alias("tf_total")).filter(F.col("tf_total") > 0)
    )
    tf_top = global_topk(
        tf_total, _FUSE_INPUT_K, [F.desc("tf_total"), F.asc("doc_id")],
        rank_col="rank_tf",
    ).select("doc_id", F.col("rank_tf").cast("bigint").alias("rank_tf"))
    fused = bm.join(tf_top, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("rank_bm25", F.lit(0)).cast("bigint").alias("rank_bm25_0"),
        F.coalesce("rank_tf", F.lit(0)).cast("bigint").alias("rank_tf_0"),
        F.expr(_rrf_ppm()).alias("rrf_ppm"),
    )
    return global_topk(
        fused, _RRF_TOPK, [F.desc("rrf_ppm"), F.asc("doc_id")]
    ).select(
        F.col("rank").cast("bigint").alias("rank"),
        "doc_id",
        "rrf_ppm",
        F.col("rank_bm25_0").alias("rank_bm25"),
        F.col("rank_tf_0").alias("rank_tf"),
    )


def _rrf_sql() -> str:
    from . import REGISTRY
    from .search import _TERMS

    bm_oracle = REGISTRY["bm25_search"].oracle
    terms = ", ".join(f"'{t}'" for t in _TERMS)
    return f"""
WITH bm AS (
  SELECT doc_id, CAST(rank AS BIGINT) AS rank_bm25
  FROM ({bm_oracle})
),
qtoks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf_total AS (
  SELECT doc_id, COUNT(*) AS tf_total FROM qtoks
  WHERE term IN ({terms}) GROUP BY doc_id
),
tf_top AS (
  SELECT doc_id, CAST(rank_tf AS BIGINT) AS rank_tf FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY tf_total DESC, doc_id ASC) AS rank_tf
    FROM tf_total
  ) WHERE rank_tf <= {_FUSE_INPUT_K}
),
fused AS (
  SELECT COALESCE(b.doc_id, t.doc_id) AS doc_id,
         CAST(COALESCE(rank_bm25, 0) AS BIGINT) AS rank_bm25_0,
         CAST(COALESCE(rank_tf, 0) AS BIGINT) AS rank_tf_0,
         {_rrf_ppm()} AS rrf_ppm
  FROM bm b FULL OUTER JOIN tf_top t ON b.doc_id = t.doc_id
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, rrf_ppm,
       rank_bm25_0 AS rank_bm25, rank_tf_0 AS rank_tf
FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY rrf_ppm DESC, doc_id ASC) AS rank, *
  FROM fused
) WHERE rank <= {_RRF_TOPK}
"""


register(
    QuerySpec(
        "rrf_fusion",
        q_rrf_fusion,
        _rrf_sql(),
        "TXT-rrf,TXT-bm25",
        False,
        "Reciprocal-rank fusion of the BM25 and term-frequency toplists (hybrid retrieval combiner)",
    )
)

# --- K-minimum-values distinct sketch ---------------------------------------

_KMV_K = 128
_POW48 = float(2 ** 48)


def _kmv_w(h: str, spark_dialect: bool = True) -> str:
    """48-bit uniform hash value from md5 hex chars 1-12 (one engine-native
    hex parse; see _hex_bigint)."""
    return _hex_bigint(h, 1, 12, spark_dialect)


def _kmv_estimate_ppm() -> str:
    """(k-1)/u_k estimator (Bar-Yossef et al. 2002; Beyer et al. 2007)
    from the k-th smallest normalized hash; when the group holds fewer
    than k distinct hashes the sketch is exhaustive and the estimate is
    the exact count. Identical text both engines."""
    # NB: exponent-notation literals — DuckDB types plain decimal literals
    # as DECIMAL and overflows the product; `e0` forces DOUBLE in both
    # engines.
    est = (
        f"(CASE WHEN n_hashes < {_KMV_K} THEN CAST(n_hashes AS DOUBLE) "
        f"ELSE {_KMV_K - 1}e0 * {2 ** 48}e0 / CAST(mk AS DOUBLE) END)"
    )
    return f"CAST(ROUND({est} * 1000000.0) AS BIGINT)"


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.dedup import shingles

    d = load(spark, sf_dir, "documents")
    # r10: lang rides through the explode (no join-back), and the
    # (shingle -> langs) posting aggregation computes the md5 ONCE per
    # distinct shingle instead of once per (doc, shingle) row; the exact
    # per-lang distinct count falls out of the same aggregation without a
    # second corpus-wide distinct (guide §2.3 aggregate before you
    # shuffle). The explode of the langs set is bounded by the language
    # count. The (lang, wv) distinct stays: two shingles may fold to the
    # same 48-bit wv, and the sketch contract counts distinct hashes.
    sh = shingles(d, "doc_id", "text", extra=("lang",))
    post = (
        sh.groupBy("shingle")
        .agg(F.collect_set("lang").alias("langs"))
        # eager: post roots several independently-materializing AQE stages
        # (hashed, exact) — the lazy form can compute the aggregation twice
        .localCheckpoint(eager=True)
    )
    hashed = (
        post.select(
            F.expr(_kmv_w("md5(cast(shingle as binary))")).alias("wv"), "langs"
        )
        .select(F.explode("langs").alias("lang"), "wv")
        .distinct()
    )
    # Per-group k-smallest WITHOUT sorting the group in one task: level 1
    # ranks inside (lang, wv % 64) salted subgroups — each holds ~1/64 of
    # the group — and only the per-subgroup k-minima (<= 64k rows/group)
    # reach the level-2 rank. The union of subgroup k-minima is a superset
    # of the global k-minima, so the result is exact.
    w1 = Window.partitionBy("lang", F.expr("wv % 64")).orderBy("wv")
    lvl1 = (
        hashed.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= _KMV_K)
        .drop("rn1")
    )
    w2 = Window.partitionBy("lang").orderBy("wv")
    sketch = lvl1.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= _KMV_K
    )
    per = sketch.groupBy("lang").agg(
        F.count("*").alias("n_in_sketch"), F.max("wv").alias("mk")
    )
    stats = hashed.groupBy("lang").agg(F.count("*").alias("n_hashes"))
    exact = (
        post.select(F.explode("langs").alias("lang"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_exact"))
    )
    return (
        exact.join(stats, "lang")
        .join(per, "lang")
        .select(
            "lang",
            "n_exact",
            F.col("n_in_sketch").cast("bigint").alias("k_used"),
            F.col("mk").cast("bigint").alias("kth_min_hash"),
            F.expr(_kmv_estimate_ppm()).alias("kmv_estimate_ppm"),
        )
    )


def _kmv_sql() -> str:
    from ..operators.dedup import sql_shingles

    return f"""
WITH sh AS (
  SELECT s.doc_id, s.shingle, d.lang
  FROM ({sql_shingles('documents', 'doc_id', 'text')}) s
  JOIN documents d ON s.doc_id = d.doc_id
),
hashed AS (
  SELECT DISTINCT lang, {_kmv_w('md5(shingle)', spark_dialect=False)} AS wv FROM sh
),
ranked AS (
  SELECT lang, wv, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY wv) AS rn
  FROM hashed
),
per AS (
  SELECT lang, COUNT(*) AS n_in_sketch, MAX(wv) AS mk
  FROM ranked WHERE rn <= {_KMV_K} GROUP BY lang
),
stats AS (SELECT lang, COUNT(*) AS n_hashes FROM hashed GROUP BY lang),
exact AS (
  SELECT lang, COUNT(DISTINCT shingle) AS n_exact FROM sh GROUP BY lang
)
SELECT e.lang, e.n_exact,
       CAST(p.n_in_sketch AS BIGINT) AS k_used,
       CAST(p.mk AS BIGINT) AS kth_min_hash,
       {_kmv_estimate_ppm()} AS kmv_estimate_ppm
FROM exact e JOIN stats s USING (lang) JOIN per p USING (lang)
"""


register(
    QuerySpec(
        "kmv_distinct",
        q_kmv_distinct,
        _kmv_sql(),
        "SK-kmv",
        False,
        "K-minimum-values distinct-shingle sketch per lang (k=128, salted two-level k-minima) vs exact",
    )
)

# --- KMV Jaccard between groups ---------------------------------------------
# The property HLL lacks: a KMV sketch supports SET-INTERSECTION estimation
# (Beyer et al., SIGMOD 2007): for groups A and B with k-minimum sketches
# S_A, S_B, take U = the k smallest of S_A ∪ S_B; then |U ∩ S_A ∩ S_B|/|U|
# is an unbiased Jaccard estimate. Cross-language shingle overlap is the
# curation use case (contamination/borrowing between language shards)
# where exact pairwise intersection would join the full shingle relations;
# the sketch version joins k-row tables.


def q_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.dedup import shingles

    d = load(spark, sf_dir, "documents")
    # r10: one (shingle -> langs) posting aggregation replaces the
    # (lang, shingle) distinct, the per-row md5 (once per distinct shingle
    # now), AND the exact-side full shingle self-join: the posting list is
    # bounded by the LANGUAGE COUNT, so the exact pairwise intersection is
    # a map-side pair enumeration over <=|langs| elements followed by one
    # tiny aggregation — the same posting idiom as capped_jaccard_pairs
    # with a constant group bound (guide §2.3/§2.4). Exchange count for
    # the exact side: 1 (was: dsh distinct + two self-join shuffles + pair
    # groupBy). `langs` is sorted so pair enumeration orders by value.
    sh = shingles(d, "doc_id", "text", extra=("lang",))
    post = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_set("lang")).alias("langs"))
        # eager: three consumers (dsh, hashed, inter) materialize as
        # independent AQE stages — see kmv_distinct note
        .localCheckpoint(eager=True)
    )
    dsh = post.select(F.explode("langs").alias("lang"), "shingle")
    hashed = (
        post.select(
            F.expr(_kmv_w("md5(cast(shingle as binary))")).alias("wv"), "langs"
        )
        .select(F.explode("langs").alias("lang"), "wv")
        .distinct()
    )
    # per-group sketch: same salted two-level k-minima as kmv_distinct
    w1 = Window.partitionBy("lang", F.expr("wv % 64")).orderBy("wv")
    w2 = Window.partitionBy("lang").orderBy("wv")
    sk = (
        hashed.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= _KMV_K)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _KMV_K)
        .select("lang", "wv")
    )
    langs = sk.select("lang").distinct()
    pairs = (
        langs.select(F.col("lang").alias("lang_a"))
        .crossJoin(langs.select(F.col("lang").alias("lang_b")))
        .filter(F.col("lang_a") < F.col("lang_b"))
    )
    # per-pair union rows with membership flags, then k smallest of the union
    ua = pairs.join(sk.select(F.col("lang").alias("lang_a"), "wv"), "lang_a").select(
        "lang_a", "lang_b", "wv", F.lit(1).alias("fa"), F.lit(0).alias("fb")
    )
    ub = pairs.join(sk.select(F.col("lang").alias("lang_b"), "wv"), "lang_b").select(
        "lang_a", "lang_b", "wv", F.lit(0).alias("fa"), F.lit(1).alias("fb")
    )
    u = (
        ua.unionByName(ub)
        .groupBy("lang_a", "lang_b", "wv")
        .agg(F.max("fa").alias("in_a"), F.max("fb").alias("in_b"))
    )
    wp = Window.partitionBy("lang_a", "lang_b").orderBy("wv")
    uk = u.withColumn("rn", F.row_number().over(wp)).filter(F.col("rn") <= _KMV_K)
    est = uk.groupBy("lang_a", "lang_b").agg(
        F.count("*").alias("ku"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("bigint")).alias("kmv_inter"),
    )
    # exact side (the accuracy contract): lang-pair enumeration inside the
    # bounded posting rows — no shingle-relation self-join.
    pair = F.expr(
        "flatten(transform(langs, x -> transform(filter(langs, y -> y > x),"
        " y -> struct(x AS lang_a, y AS lang_b))))"
    )
    inter = (
        post.select(F.explode(pair).alias("p"))
        .select("p.lang_a", "p.lang_b")
        .groupBy("lang_a", "lang_b")
        .agg(F.count("*").alias("exact_inter"))
    )
    sizes = dsh.groupBy("lang").agg(F.count("*").alias("n"))
    exact = (
        pairs.join(sizes.select(F.col("lang").alias("lang_a"), F.col("n").alias("n_a")), "lang_a")
        .join(sizes.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_b")), "lang_b")
        .join(inter, ["lang_a", "lang_b"], "left")
        .select(
            "lang_a", "lang_b", "n_a", "n_b",
            F.coalesce("exact_inter", F.lit(0)).cast("bigint").alias("exact_inter"),
        )
    )
    return (
        exact.join(est, ["lang_a", "lang_b"])
        .select(
            "lang_a", "lang_b", "n_a", "n_b", "exact_inter",
            F.expr(
                "CAST(ROUND(CAST(exact_inter AS DOUBLE)"
                " / CAST(n_a + n_b - exact_inter AS DOUBLE) * 1000000.0) AS BIGINT)"
            ).alias("exact_jacc_ppm"),
            F.col("ku").cast("bigint").alias("ku"),
            F.col("kmv_inter").cast("bigint").alias("kmv_inter"),
            F.expr(
                "CAST(ROUND(CAST(kmv_inter AS DOUBLE)"
                " / CAST(ku AS DOUBLE) * 1000000.0) AS BIGINT)"
            ).alias("kmv_jacc_ppm"),
        )
    )


def _kmv_jaccard_sql() -> str:
    from ..operators.dedup import sql_shingles

    return f"""
WITH sh AS (
  SELECT s.doc_id, s.shingle, d.lang
  FROM ({sql_shingles('documents', 'doc_id', 'text')}) s
  JOIN documents d ON s.doc_id = d.doc_id
),
dsh AS (SELECT DISTINCT lang, shingle FROM sh),
hashed AS (
  SELECT DISTINCT lang, {_kmv_w('md5(shingle)', spark_dialect=False)} AS wv FROM dsh
),
sk AS (
  SELECT lang, wv FROM (
    SELECT lang, wv, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY wv) AS rn
    FROM hashed
  ) WHERE rn <= {_KMV_K}
),
langs AS (SELECT DISTINCT lang FROM sk),
pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b
  FROM langs a, langs b WHERE a.lang < b.lang
),
u AS (
  SELECT lang_a, lang_b, wv, MAX(fa) AS in_a, MAX(fb) AS in_b FROM (
    SELECT p.lang_a, p.lang_b, s.wv, 1 AS fa, 0 AS fb
    FROM pairs p JOIN sk s ON s.lang = p.lang_a
    UNION ALL
    SELECT p.lang_a, p.lang_b, s.wv, 0 AS fa, 1 AS fb
    FROM pairs p JOIN sk s ON s.lang = p.lang_b
  ) GROUP BY 1, 2, 3
),
uk AS (
  SELECT * FROM (
    SELECT u.*, ROW_NUMBER() OVER (
      PARTITION BY lang_a, lang_b ORDER BY wv) AS rn
    FROM u
  ) WHERE rn <= {_KMV_K}
),
est AS (
  SELECT lang_a, lang_b, COUNT(*) AS ku,
         CAST(SUM(in_a * in_b) AS BIGINT) AS kmv_inter
  FROM uk GROUP BY 1, 2
),
inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS exact_inter
  FROM dsh a JOIN dsh b ON a.shingle = b.shingle AND a.lang < b.lang
  GROUP BY 1, 2
),
sizes AS (SELECT lang, COUNT(*) AS n FROM dsh GROUP BY lang),
exact AS (
  SELECT p.lang_a, p.lang_b, sa.n AS n_a, sb.n AS n_b,
         CAST(COALESCE(i.exact_inter, 0) AS BIGINT) AS exact_inter
  FROM pairs p
  JOIN sizes sa ON sa.lang = p.lang_a
  JOIN sizes sb ON sb.lang = p.lang_b
  LEFT JOIN inter i ON i.lang_a = p.lang_a AND i.lang_b = p.lang_b
)
SELECT e.lang_a, e.lang_b, e.n_a, e.n_b, e.exact_inter,
       CAST(ROUND(CAST(e.exact_inter AS DOUBLE)
            / CAST(e.n_a + e.n_b - e.exact_inter AS DOUBLE) * 1000000.0) AS BIGINT)
         AS exact_jacc_ppm,
       CAST(s.ku AS BIGINT) AS ku,
       s.kmv_inter,
       CAST(ROUND(CAST(s.kmv_inter AS DOUBLE)
            / CAST(s.ku AS DOUBLE) * 1000000.0) AS BIGINT) AS kmv_jacc_ppm
FROM exact e JOIN est s USING (lang_a, lang_b)
"""


register(
    QuerySpec(
        "kmv_jaccard",
        q_kmv_jaccard,
        _kmv_jaccard_sql(),
        "SK-kmv",
        False,
        "Pairwise cross-language Jaccard from merged KMV sketches (k-smallest-of-union estimator) vs exact",
    )
)


# --- CMS join-size estimation (the planner's question) -----------------------
# Public method (Cormode & Muthukrishnan 2005 §4.2; the AMS line of
# work): the size of an equi-join |A ⋈_k B| = Σ_k cntA(k)·cntB(k) is the
# inner product of the two key-frequency vectors, and the Count-Min
# inner-product estimator — per salted row, the dot product of the two
# sketch rows; take the MIN over rows — upper-bounds it with one-sided
# error ε·|A|·|B|/w. Query optimizers answer "how big is this join"
# exactly this way before choosing a strategy. The join estimated here
# has real multiplicity on BOTH sides: lineitem keyed by l_partkey vs
# the returned-items subset (l_returnflag = 'R') on the same key — the
# filtered-fact self-join shape a planner must size to pick broadcast vs
# shuffle.
#
# 100 TB shape: each side collapses to a 2048-cell sketch in ONE
# map-side-combinable hash aggregation (cells ← the per-key count
# relation, never raw rows); the estimate is an O(d·w) sketch-sketch
# join. The exact inner product rides along as the accuracy contract —
# it is a |keys|-sized join of the two count relations, NOT the
# materialized pair join (Σ cnt² pairs never exist anywhere). Pure
# integer arithmetic end to end; `overcount >= 0` is the one-sided
# guarantee the hash would catch if the bucketing ever diverged.


_JSE_W = 16384  # join-size rows need w >> |A|·|B|/|A⋈B| for tight relative
# error (the estimator's expected overcount is |A|·|B|/w); 4×16 Ki cells
# is still a constant-size sketch


def _jse_bucket(salt: int, spark_dialect: bool) -> str:
    """Bucket of ``term`` under salted row ``salt``: 16-bit value from md5
    hex chars 1-4 of 'salt:term', mod _JSE_W."""
    if spark_dialect:
        h = f"md5(cast(concat('{salt}:', term) as binary))"
    else:
        h = f"md5('{salt}:' || term)"
    expr = _hexval(h, 1)
    for pos in range(2, 5):
        expr = f"(({expr}) * 16 + {_hexval(h, pos)})"
    return f"(({expr}) % {_JSE_W})"


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    key = F.col("l_partkey").cast("string").alias("term")

    # BOTH frequency vectors in one scan/agg (cnt_b is the conditional
    # count), materialized once: the |keys|-sized relation feeds four
    # consumers (two sketch builds + both sides of the exact join) —
    # recomputing it four times re-scanned lineitem four times.
    counts = (
        li.select(key, (F.col("l_returnflag") == "R").alias("r"))
        .groupBy("term")
        .agg(
            F.count("*").cast("bigint").alias("cnt_a"),
            F.sum(F.col("r").cast("int")).cast("bigint").alias("cnt_b"),
        )
        .localCheckpoint(eager=True)
    )
    counts_a = counts.select("term", F.col("cnt_a").alias("cnt"))
    counts_b = counts.filter(F.col("cnt_b") > 0).select(
        "term", F.col("cnt_b").alias("cnt")
    )

    def sketch(counts: DataFrame) -> DataFrame:
        cells = counts.select(
            "cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("salt"),
                            F.expr(_jse_bucket(s, True)).alias("bucket"),
                        )
                        for s in range(_CMS_D)
                    ]
                )
            ).alias("sb"),
        ).select(
            "cnt", F.col("sb.salt").alias("salt"), F.col("sb.bucket").alias("bucket")
        )
        return cells.groupBy("salt", "bucket").agg(
            F.sum("cnt").cast("bigint").alias("c")
        )

    dots = (
        sketch(counts_a)
        .withColumnRenamed("c", "ca")
        .join(sketch(counts_b).withColumnRenamed("c", "cb"), ["salt", "bucket"])
        .groupBy("salt")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dot"))
    )
    est = dots.agg(F.min("dot").cast("bigint").alias("cms_estimate"))
    # the exact inner product needs no join at all once both vectors live
    # on one row per key (cnt_b = 0 rows contribute nothing)
    exact = counts.agg(
        F.sum(F.col("cnt_a") * F.col("cnt_b")).cast("bigint").alias("exact_pairs")
    )
    return (
        exact.crossJoin(est)  # two 1-row aggregates (A5 scalar pattern)
        .select(
            "exact_pairs",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_pairs"))
            .cast("bigint")
            .alias("overcount"),
            F.floor(
                (F.col("cms_estimate") - F.col("exact_pairs"))
                * F.lit(1000000)
                / F.col("exact_pairs")
            )
            .cast("bigint")
            .alias("err_ppm"),
        )
    )


def _join_size_sql() -> str:
    def cells(src: str) -> str:
        return "\n  UNION ALL ".join(
            f"SELECT term, cnt, {s} AS salt, {_jse_bucket(s, False)} AS bucket FROM {src}"
            for s in range(_CMS_D)
        )

    return f"""
WITH counts AS (
  SELECT CAST(l_partkey AS VARCHAR) AS term,
         CAST(COUNT(*) AS BIGINT) AS cnt_a,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
  FROM lineitem GROUP BY 1
),
counts_a AS (SELECT term, cnt_a AS cnt FROM counts),
counts_b AS (SELECT term, cnt_b AS cnt FROM counts WHERE cnt_b > 0),
cells_a AS ({cells("counts_a")}),
cells_b AS ({cells("counts_b")}),
sk_a AS (SELECT salt, bucket, CAST(SUM(cnt) AS BIGINT) AS c FROM cells_a GROUP BY 1, 2),
sk_b AS (SELECT salt, bucket, CAST(SUM(cnt) AS BIGINT) AS c FROM cells_b GROUP BY 1, 2),
dots AS (
  SELECT a.salt, CAST(SUM(a.c * b.c) AS BIGINT) AS dot
  FROM sk_a a JOIN sk_b b USING (salt, bucket)
  GROUP BY 1
),
est AS (SELECT CAST(MIN(dot) AS BIGINT) AS cms_estimate FROM dots),
exact AS (
  SELECT CAST(SUM(cnt_a * cnt_b) AS BIGINT) AS exact_pairs FROM counts
)
SELECT exact_pairs, cms_estimate,
       CAST(cms_estimate - exact_pairs AS BIGINT) AS overcount,
       CAST(FLOOR((cms_estimate - exact_pairs) * 1000000.0 / exact_pairs) AS BIGINT) AS err_ppm
FROM exact, est
"""


register(
    QuerySpec(
        "join_size_estimate",
        q_join_size_estimate,
        _join_size_sql(),
        "SK-cms,J3,A5",
        False,
        "CMS inner-product join-cardinality estimate vs the exact count-vector inner product",
    )
)
