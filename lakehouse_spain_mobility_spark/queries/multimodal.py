"""Multimodal-column query: documents' text bytes stand in as opaque
payloads to exercise the binary → mapInPandas decode → feature → rollup
path on driver testdata.

Oracle-checked: the FakeDecoder's feature vector is the first 16 bytes of
sha256(payload) scaled to [0,1] (operators/multimodal.py:53-55), and DuckDB
has ``sha256()`` — so the rollup emits exact-integer byte checksums that the
oracle re-derives from the hex digest. Every output column is BIGINT/str:
the mapInPandas plumbing stays on the hook, while the compared values are
integers that cannot hash-diverge.
"""

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
    # features[i] = digest_byte_i / 255.0 — reconstruct the exact integer
    # bytes JVM-side (round() is safe: the double is within 1e-13 of b).
    with_bytes = feats.select(
        "kind",
        "n_bytes",
        F.expr("CAST(round(element_at(features, 1) * 255) AS BIGINT)").alias("f0_byte"),
        F.expr(
            "aggregate(transform(features, x -> CAST(round(x * 255) AS BIGINT)),"
            " 0L, (acc, b) -> acc + b)"
        ).alias("feat_checksum"),
    )
    return with_bytes.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("f0_byte").alias("f0_sum"),
        F.sum("feat_checksum").alias("checksum_sum"),
    )


# hex pair -> byte without unhex/blob indexing (portable across DuckDB
# versions): positional lookup in the hex alphabet.
_HEXPOS = "strpos('0123456789abcdef', substr(hx, {pos}, 1)) - 1"

_MM_SQL = f"""
WITH h AS (
    SELECT doc_id, sha256(text) AS hx, strlen(text) AS n_bytes
    FROM documents
), expanded AS (
    SELECT doc_id, n_bytes, hx,
           unnest(generate_series(1, 16)) AS j
    FROM h
), bytes AS (
    SELECT doc_id, n_bytes, j,
           ({_HEXPOS.format(pos="2 * j - 1")}) * 16
           + ({_HEXPOS.format(pos="2 * j")}) AS byte
    FROM expanded
), per_doc AS (
    SELECT doc_id,
           MAX(n_bytes) AS n_bytes,
           SUM(CASE WHEN j = 1 THEN byte ELSE 0 END) AS f0_byte,
           SUM(byte) AS feat_checksum
    FROM bytes
    GROUP BY doc_id
)
SELECT 'text' AS kind,
       COUNT(*) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(f0_byte) AS BIGINT) AS f0_sum,
       CAST(SUM(feat_checksum) AS BIGINT) AS checksum_sum
FROM per_doc
"""


register(
    QuerySpec(
        name="multimodal_features",
        build=q_multimodal_features,
        oracle=_MM_SQL,
        survey="MM-decode",
        description="Binary payload → mapInPandas decode → integer-checksum rollup "
        "(sha256 FakeDecoder, oracle re-derives bytes from the hex digest)",
    )
)
