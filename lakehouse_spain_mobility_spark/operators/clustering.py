"""Iterative k-means over an embedding column — the canonical
non-SQL-expressible iterative algorithm (cluster-based curation /
diversity sampling in training-data pipelines).

Spark-idiomatic iteration: the k×dim centroid matrix is tiny, so it lives
on the driver and ships to executors inside the mapInPandas closure
(Lloyd's algorithm is a repeated broadcast join in disguise); the data
side never collects. Per iteration: one Arrow-batched numpy assignment
pass (narrow) + one explode/groupBy shuffle to recompute centroids.
Centroid means use the deterministic fixed-point average so reruns and
repartitionings converge identically.

Determinism: init = the k vectors with the smallest ids; numpy argmin
breaks distance ties toward the lower cluster index.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.deterministic import davg, dsum


def _assign(df: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray) -> DataFrame:
    """id → (id, cluster, sqdist, vec): argmin squared-L2 assignment."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("sqdist", T.DoubleType()),
            T.StructField("vec", T.ArrayType(T.FloatType())),
        ]
    )
    cen = centroids.astype(np.float64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (n, dim)
            # (n, k) squared distances, accumulated DIMENSION-SEQUENTIALLY:
            # acc = ((0 + t_1) + t_2) + ... — the exact fold order of the
            # DuckDB oracle's list_reduce, so sqdist is bit-identical across
            # engines (the ||x||² - 2x·c + ||c||² matmul form is faster but
            # sums in a different order and breaks parity in the last ulp).
            n, k = x.shape[0], cen.shape[0]
            d2 = np.zeros((n, k))
            for c in range(k):
                acc = np.zeros(n)
                for dd in range(x.shape[1]):
                    diff = x[:, dd] - cen[c, dd]
                    acc = acc + diff * diff
                d2[:, c] = acc
            lbl = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "cluster": lbl.astype(np.int32),
                    "sqdist": d2[np.arange(len(lbl)), lbl],
                    "vec": pdf[vec_col],
                }
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(kernel, out_schema)


def kmeans(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 8, iters: int = 5,
) -> tuple[DataFrame, list[float]]:
    """Lloyd's k-means. Returns (final assignment frame
    ``(id, cluster, sqdist)``, per-iteration inertia history)."""
    init = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = np.stack([np.asarray(r[0], dtype=np.float64) for r in init])
    inertia: list[float] = []
    assigned = None
    for _ in range(iters):
        assigned = _assign(df, id_col, vec_col, centroids).localCheckpoint(eager=True)
        inertia.append(assigned.agg(dsum(F.col("sqdist"))).first()[0])
        dim = centroids.shape[1]
        means = (
            assigned.select("cluster", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(davg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        nxt = centroids.copy()  # empty clusters keep their old centroid
        seen = {}
        for r in means:
            seen.setdefault(r.cluster, np.zeros(dim))[r.pos] = r.m
        for c, vec in seen.items():
            nxt[c] = vec
        centroids = nxt
    return assigned.select("id", "cluster", "sqdist"), inertia


def kmeans_fit(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 8, iters: int = 5,
) -> tuple[DataFrame, np.ndarray]:
    """Lloyd's k-means for encoders: returns the final assignment AND the
    centroid matrix that produced it (what a product-quantization codebook
    needs). Same convention as :func:`kmeans` / the unrolled-CTE oracle:
    assignment ``a_iters`` uses centroids ``c_{iters-1}`` — the update
    after the last assignment is skipped, not just discarded."""
    init = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = np.stack([np.asarray(r[0], dtype=np.float64) for r in init])
    assigned = None
    for it in range(iters):
        assigned = _assign(df, id_col, vec_col, centroids).localCheckpoint(eager=True)
        if it == iters - 1:
            break
        dim = centroids.shape[1]
        means = (
            assigned.select("cluster", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(davg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        nxt = centroids.copy()  # empty clusters keep their old centroid
        seen = {}
        for r in means:
            seen.setdefault(r.cluster, np.zeros(dim))[r.pos] = r.m
        for c, vec in seen.items():
            nxt[c] = vec
        centroids = nxt
    return assigned.select("id", "cluster", "sqdist"), centroids
