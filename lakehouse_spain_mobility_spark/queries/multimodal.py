"""Multimodal-column query: documents' text bytes stand in as opaque
payloads to exercise the binary → mapInPandas decode → feature → rollup
path on driver testdata. Non-SQL-expressible (pandas-UDF decode) → rows-
only correctness check."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as mm
from . import QuerySpec, register
from .tables import load


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    feats = mm.decode_features(media, n_features=16)
    return feats.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg(F.element_at("features", 1)).alias("avg_f0"),
    )


register(
    QuerySpec(
        name="multimodal_features",
        build=q_multimodal_features,
        oracle=None,  # mapInPandas decode — rows-only check
        survey="MM-decode",
        description="Binary payload → mapInPandas decode → feature rollup (stubbed decoder)",
    )
)
