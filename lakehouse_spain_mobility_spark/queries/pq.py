"""Product quantization with asymmetric-distance search (IVF-PQ scale path).

The stated successor to the broadcast-numpy exact kernels
(``operators/similarity.py``): at 100 TB an embedding corpus is stored as
m per-subspace byte codes (here m=4 subspaces × 16 dims, k=4 codes), and
a query is answered from an m×k lookup table of query-to-centroid
distances (ADC) — the corpus side never touches floats at search time.

Spark-first decomposition:
- codebook training = m independent Lloyd runs over ``slice()``d
  subvectors (``operators/clustering.py:kmeans_fit``; k×16 centroid
  matrices live on the driver like gravity's calibration scalar),
- encoding = the final assignment pass (mapInPandas, narrow),
- the ADC lookup table is 16 doubles injected as literals (broadcast-by-
  closure), so search is a 4-way integer-keyed map lookup + 3 additions
  per row — whole-stage-codegen territory, no join, no shuffle until the
  final top-k,
- exact re-ranking distance rides the same dimension-sequential fold as
  the k-means kernel, so every double matches the unrolled-CTE oracle
  bit-for-bit.

The oracle unrolls all four subspace Lloyd runs as chained CTEs (the
``kmeans_clusters`` pattern), computes the same LUT relationally, and
reproduces ADC + exact distances with identical fold orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import micro, sql_davg, sql_micro
from ..functions.topk import global_topk
from . import QuerySpec, register
from .tables import load

_DIM = 64
_M = 4  # subspaces
_SUB = _DIM // _M  # dims per subspace
_K = 4  # codes per subspace
_ITERS = 2
_QUERY_ID = 0
_TOP_K = 10


def _fold_dist_py(a, b) -> float:
    """Dimension-sequential squared-L2 — the oracle's list_reduce order."""
    acc = 0.0
    for x, y in zip(a, b):
        d = float(x) - float(y)
        acc = acc + d * d
    return acc


def q_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import _assign, kmeans_fit

    import numpy as np

    e = load(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == _QUERY_ID).select("embedding").first()
    if qrow is None:  # cold partition: no query vector -> no result, no crash
        return spark.createDataFrame(
            [], "rank int, vec_id bigint, adc_ppm bigint, exact_ppm bigint"
        )
    qvec = np.asarray(qrow[0], dtype=np.float64)

    # r10 (guide §2.6 overlap independent jobs): the m subspace Lloyd runs
    # are INDEPENDENT — each is a chain of small driver-blocking jobs
    # (init collect, per-iter assign checkpoint + inertia + means), so run
    # them from a thread pool and let the scheduler interleave; results
    # are consumed in subspace order, so the output is unchanged. Measured
    # r10 (back-to-back fresh sessions, min-of-4): 3.73 -> 1.34 s.
    from concurrent.futures import ThreadPoolExecutor

    def _fit(s: int):
        sub = e.select(
            "vec_id", F.slice("embedding", s * _SUB + 1, _SUB).alias("sub")
        )
        return kmeans_fit(sub, "vec_id", "sub", k=_K, iters=_ITERS)

    with ThreadPoolExecutor(max_workers=_M) as pool:
        fits = list(pool.map(_fit, range(_M)))

    codes = None
    luts: list[list[float]] = []
    for s, (assigned, cents) in enumerate(fits):
        a = assigned.select(F.col("id").alias("vec_id"), F.col("cluster").alias(f"c{s}"))
        codes = a if codes is None else codes.join(a, "vec_id")
        q_sub = qvec[s * _SUB : (s + 1) * _SUB]
        luts.append([_fold_dist_py(q_sub, cents[c]) for c in range(_K)])

    # ADC: 4 integer-indexed literal-array lookups + left-to-right adds —
    # no join, no shuffle; the "search" is a narrow codegen map.
    lut_cols = [
        F.array(*[F.lit(v) for v in luts[s]])[F.col(f"c{s}")] for s in range(_M)
    ]
    adc = lut_cols[0]
    for c in lut_cols[1:]:
        adc = adc + c
    approx = codes.select("vec_id", adc.alias("adc"))

    exact = _assign(e, "vec_id", "embedding", qvec[None, :]).select(
        F.col("id").alias("vec_id"), F.col("sqdist").alias("exact")
    )
    joined = approx.join(exact, "vec_id").filter(F.col("vec_id") != _QUERY_ID)
    scored = joined.select(
        "vec_id", micro(F.col("adc")).alias("adc_ppm"), micro(F.col("exact")).alias("exact_ppm")
    )
    # TakeOrderedAndProject, not a global-window sort of the scored corpus.
    return global_topk(
        scored, _TOP_K, [F.asc("adc_ppm"), F.asc("vec_id")]
    ).select("rank", "vec_id", "adc_ppm", "exact_ppm")


def _fold_sql(e: str, c: str, lo: int, n: int, c_off: bool = True) -> str:
    """Dimension-sequential fold over dims [lo, lo+n) (1-based list index).
    ``c`` is a centroid list indexed from 1 when c_off else aligned to e."""
    ci = f"i - {lo - 1}" if c_off else "i"
    return (
        f"list_reduce(list_transform(generate_series({lo}, {lo + n - 1}), "
        f"i -> (CAST({e}[i] AS DOUBLE) - {c}[{ci}]) * (CAST({e}[i] AS DOUBLE) - {c}[{ci}])), "
        f"(x, y) -> x + y)"
    )


def _sub_kmeans_ctes(s: int) -> str:
    """Unrolled Lloyd over subspace ``s`` (CTE prefix ``s{s}_``)."""
    lo = s * _SUB + 1
    dist = _fold_sql("emb.e", "c.c", lo, _SUB)
    parts = [
        f"""s{s}_c0 AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
           list_transform(e[{lo}:{lo + _SUB - 1}], x -> CAST(x AS DOUBLE)) AS c
    FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {_K})
)"""
    ]
    for it in range(1, _ITERS + 1):
        parts.append(f"""s{s}_a{it} AS (
    SELECT vec_id, cluster FROM (
        SELECT emb.vec_id, c.cluster,
               ROW_NUMBER() OVER (PARTITION BY emb.vec_id
                                  ORDER BY {dist}, c.cluster) AS rn
        FROM emb CROSS JOIN s{s}_c{it - 1} c
    ) WHERE rn = 1
)""")
        if it < _ITERS:
            parts.append(f"""s{s}_x{it} AS (
    SELECT a.cluster, emb.e, unnest(generate_series({lo}, {lo + _SUB - 1})) AS j
    FROM s{s}_a{it} a JOIN emb USING (vec_id)
), s{s}_m{it} AS (
    SELECT cluster, j, {sql_davg("CAST(e[j] AS DOUBLE)")} AS m
    FROM s{s}_x{it} GROUP BY cluster, j
), s{s}_g{it} AS (
    SELECT cluster, list(m ORDER BY j) AS c FROM s{s}_m{it} GROUP BY cluster
), s{s}_c{it} AS (
    SELECT p.cluster, COALESCE(g.c, p.c) AS c
    FROM s{s}_c{it - 1} p LEFT JOIN s{s}_g{it} g USING (cluster)
)""")
    return ",\n".join(parts)


def _pq_sql() -> str:
    subs = ",\n".join(_sub_kmeans_ctes(s) for s in range(_M))
    lut_ctes = ",\n".join(
        f"""lut{s} AS (
    SELECT c.cluster, {_fold_sql('q.e', 'c.c', s * _SUB + 1, _SUB)} AS d
    FROM s{s}_c{_ITERS - 1} c CROSS JOIN q
)"""
        for s in range(_M)
    )
    code_joins = " ".join(
        f"JOIN s{s}_a{_ITERS} a{s} ON emb.vec_id = a{s}.vec_id" for s in range(_M)
    )
    lut_joins = " ".join(f"JOIN lut{s} l{s} ON a{s}.cluster = l{s}.cluster" for s in range(_M))
    adc = "l0.d"
    for s in range(1, _M):
        adc = f"({adc} + l{s}.d)"
    exact = _fold_sql("emb.e", "q.e", 1, _DIM, c_off=False)
    return f"""
WITH emb AS (
    SELECT vec_id, embedding AS e FROM embeddings
),
q AS (
    SELECT list_transform(e, x -> CAST(x AS DOUBLE)) AS e FROM emb
    WHERE vec_id = {_QUERY_ID}
),
{subs},
{lut_ctes},
scored AS (
    SELECT emb.vec_id,
           {adc} AS adc,
           {exact} AS exact
    FROM emb {code_joins} {lut_joins} CROSS JOIN q
    WHERE emb.vec_id <> {_QUERY_ID}
)
SELECT * FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY {sql_micro('adc')} ASC, vec_id ASC) AS rank,
           vec_id,
           {sql_micro('adc')} AS adc_ppm,
           {sql_micro('exact')} AS exact_ppm
    FROM scored
) WHERE rank <= {_TOP_K}
"""


register(
    QuerySpec(
        "pq_adc_search",
        q_pq_adc_search,
        _pq_sql(),
        "ANN-pq,ML-cluster",
        False,
        "Product-quantization ADC top-k: 4×4 codebooks, literal LUT lookup, exact re-rank column",
    )
)
