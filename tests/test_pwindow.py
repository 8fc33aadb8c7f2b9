"""Parallel sliding-window operator (operators/pwindow.py): exactness vs
the serial WindowExec form, strategy/fallback behavior, and the halo
contract. The frames battery's oracle hash (driver gate) covers the
integrated use; these pin the operator's own guarantees."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_spain_mobility_spark.plans import inspect as pi
from lakehouse_spain_mobility_spark.operators.pwindow import sliding_rows_window
from lakehouse_spain_mobility_spark.queries.tables import load

from conftest import SF_DIR_ORACLE


def _events(spark):
    return (
        load(spark, SF_DIR_ORACLE, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
    )


def _serial(ev, lo, hi):
    w = (
        Window.partitionBy("event_type")
        .orderBy("value", "event_id")
        .rowsBetween(lo, hi)
    )
    return ev.select(
        "event_id",
        F.count("*").over(w).cast("bigint").alias("c"),
        F.sum(F.round(F.col("value") * F.lit(1e6)).cast("long"))
        .over(w)
        .cast("long")
        .alias("s"),
    )


AGGS = {
    "c": lambda w: F.count("*").over(w).cast("bigint"),
    "s": lambda w: F.sum(F.round(F.col("value") * F.lit(1e6)).cast("long"))
    .over(w)
    .cast("long"),
}


@pytest.mark.parametrize("frame", [(-2, 2), (-3, 1), (0, 4), (-5, 0)])
def test_parallel_equals_serial(spark, frame):
    ev = _events(spark)
    lo, hi = frame
    par = sliding_rows_window(ev, ["event_type"], ["value", "event_id"], AGGS, lo, hi)
    got = sorted(map(tuple, par.select("event_id", "c", "s").collect()))
    want = sorted(map(tuple, _serial(ev, lo, hi).collect()))
    assert got == want and len(got) > 0


def test_parallel_window_distributes_past_part_domain(spark):
    """The point of the operator: the sort/window stage must run on the
    chunk count, not on the ~5-value event_type domain — the final
    exchange hashes on (chunk, part)."""
    ev = _events(spark)
    par = sliding_rows_window(
        ev, ["event_type"], ["value", "event_id"], AGGS, -2, 2, chunks=16
    )
    assert par.rdd.getNumPartitions() == 16
    plan = pi.executed_plan(par)
    assert "_pw_target" in plan  # the chunk id leads the window partition


def test_small_relation_falls_back_serial(spark):
    ev = _events(spark).limit(40)  # below the n*h*2 floor
    par = sliding_rows_window(
        ev, ["event_type"], ["value", "event_id"], AGGS, -2, 2
    )
    got = sorted(map(tuple, par.select("event_id", "c", "s").collect()))
    want = sorted(
        map(
            tuple,
            _serial(_events(spark).limit(40), -2, 2).collect(),
        )
    )
    assert got == want


def test_frame_must_straddle_current_row(spark):
    with pytest.raises(ValueError):
        sliding_rows_window(
            _events(spark), ["event_type"], ["value", "event_id"], AGGS, 1, 2
        )
