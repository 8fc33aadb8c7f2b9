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


# --- Frame sampling, oracle-checked ------------------------------------------
# frame_sample slices the payload BYTES; the oracle reproduces the slices
# with substr on the text, which is only byte-equivalent for ASCII — so
# the media set is restricted to payloads whose byte length equals their
# character length (checked on both sides). Frames are compared through
# integer md5-derived checksums per frame_idx.
_N_FRAMES = 4


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(
        (F.octet_length("text") == F.char_length("text")) & (F.col("doc_id") % 3 == 0)
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    frames = mm.frame_sample(media, n_frames=_N_FRAMES)
    hexv = F.md5(F.col("frame_bytes"))
    b0 = (
        (F.instr(F.lit("0123456789abcdef"), F.substring(hexv, 1, 1)) - 1) * 16
        + (F.instr(F.lit("0123456789abcdef"), F.substring(hexv, 2, 1)) - 1)
    )
    return (
        frames.select(
            "frame_idx",
            F.length("frame_bytes").cast("bigint").alias("flen"),
            b0.cast("bigint").alias("b0"),
        )
        .groupBy("frame_idx")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum("flen").alias("total_frame_bytes"),
            F.sum("b0").alias("frame_checksum"),
        )
    )


_FRAMES_SQL = f"""
WITH src AS (
    SELECT doc_id AS media_id, text,
           GREATEST(1, strlen(text) // {_N_FRAMES}) AS step,
           strlen(text) AS n
    FROM documents
    WHERE strlen(text) = length(text) AND doc_id % 3 = 0
),
fr AS (
    SELECT media_id, i AS frame_idx,
           substr(text, i * step + 1, step) AS frame
    FROM (SELECT media_id, text, step, n,
                 unnest(generate_series(0, {_N_FRAMES - 1})) AS i
          FROM src)
    WHERE i * step < n
),
scored AS (
    SELECT frame_idx, strlen(frame) AS flen,
           (strpos('0123456789abcdef', substr(md5(frame), 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(frame), 2, 1)) - 1) AS b0
    FROM fr
)
SELECT frame_idx,
       COUNT(*) AS n_frames,
       CAST(SUM(flen) AS BIGINT) AS total_frame_bytes,
       CAST(SUM(b0) AS BIGINT) AS frame_checksum
FROM scored
GROUP BY frame_idx
"""


register(
    QuerySpec(
        name="multimodal_frames",
        build=q_multimodal_frames,
        oracle=_FRAMES_SQL,
        survey="MM-frames",
        description="Video frame sampling (flatMap mapInPandas) with per-frame-index "
        "integer checksum parity against substr-sliced oracle",
    )
)
