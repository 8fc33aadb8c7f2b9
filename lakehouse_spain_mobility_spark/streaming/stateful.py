"""Custom stateful streaming operator via ``applyInPandasWithState``:
running per-key counters that survive across micro-batches.

The reference has no streaming (SURVEY §2.10); this is the engine's
scale-path upgrade for its count-based idempotency guards — instead of
re-counting the partition per run (dags/mitma/bronze_mitma.py:38-47), a
stateful stream maintains per-key totals incrementally with explicit
state schema and timeout semantics.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .incremental import EVENTS_SCHEMA

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"event_type": [key[0]], "n_events": [n], "total_value": [total]})


def stream_running_totals(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream → per-event_type running (count, sum) maintained in
    state; each micro-batch emits the updated totals."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_to_memory(spark: SparkSession, input_dir: str, query_name: str) -> None:
    q = (
        stream_running_totals(spark, input_dir)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
