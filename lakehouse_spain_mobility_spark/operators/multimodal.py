"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata structs, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The real decode step (PIL/ffmpeg/soundfile) is STUBBED — those libraries
are not in this image — behind ``set_decoder``/``FakeDecoder``: the
deterministic fake parses a tiny header convention from the payload bytes
so the Spark-side plumbing (schema, partitioning, UDF signature, Arrow
batch shape) is real and tested end-to-end. Swapping in a real decoder is
a one-function change.

Scale notes: payloads stay opaque bytes until the last possible operator
(no decode-then-shuffle); metadata lives in a separate struct column so
predicate pushdown/pruning on width/duration/format never touches the
bytes; ``spark.sql.parquet.columnarReaderBatchSize`` and
``maxRecordsPerBatch`` bound Arrow batch memory when payloads are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


class FakeDecoder:
    """Deterministic stand-in for PIL/ffmpeg: 'decodes' a payload into a
    fixed-length pseudo-pixel vector derived from its bytes."""

    def decode(self, payload: bytes, n: int = 16) -> list[float]:
        h = hashlib.sha256(payload).digest()
        return [b / 255.0 for b in h[:n]]

    def resize(self, pixels: list[float], size: int) -> list[float]:
        if len(pixels) >= size:
            return pixels[:size]
        return pixels + [0.0] * (size - len(pixels))


_decoder: Callable[[], FakeDecoder] = FakeDecoder


def set_decoder(factory: Callable[[], object]) -> None:
    """Swap in a real decoder (e.g. PIL-backed) — called once per task."""
    global _decoder
    _decoder = factory


def decode_features(df: DataFrame, n_features: int = 16) -> DataFrame:
    """payload → feature vector + byte stats, per Arrow batch.

    Real work happens inside ``mapInPandas`` so payload bytes never cross
    the Python boundary more than once; the decoder is instantiated per
    partition (NOT per row)."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _decoder()
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "features": [dec.decode(p, n_features) for p in payloads],
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, out_schema)


def frame_sample(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: split the payload into ``n_frames`` evenly
    spaced chunks, one output row per sampled frame (payload→frames is a
    flatMap — mapInPandas yields more rows than it takes)."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    start = i * step
                    if start >= len(payload):
                        break
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[start : start + step]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        run, out_schema
    )


def metadata_stats(df: DataFrame) -> DataFrame:
    """Pure-relational rollup over the typed metadata struct — decode-free
    (the plan should show only ``meta.*`` and ``kind`` read, payload
    pruned)."""
    return df.groupBy("kind", F.col("meta.format").alias("format")).agg(
        F.count("*").alias("n_media"),
        F.avg(F.col("meta.width")).alias("avg_width"),
        F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
        F.sum(F.length(F.col("payload")).cast("bigint")).alias("total_bytes"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/smoke (payload = seeded
    bytes with a size convention per kind)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        meta = {
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
            "width": 64 + (i % 8) * 16 if kind != "audio" else None,
            "height": 64 + (i % 4) * 16 if kind != "audio" else None,
            "duration_ms": 1000 * (1 + i % 30) if kind != "image" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
