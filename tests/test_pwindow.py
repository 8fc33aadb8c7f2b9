"""Parallel window operators (operators/pwindow.py): exactness vs the
serial WindowExec forms, strategy/fallback behavior, and the halo/carry
contracts. The frames/window batteries' oracle hashes (driver gate) cover
the integrated use; these pin the operators' own guarantees.

Direct operator calls pass ``min_parallel_rows=0`` — the production
default routes relations below the measured crossover to the serial
window, and the oracle tables are far below it."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_spain_mobility_spark.plans import inspect as pi
from lakehouse_spain_mobility_spark.operators.pwindow import (
    _murmur3_int,
    _slot_map,
    ranked_window,
    sliding_rows_window,
)
from lakehouse_spain_mobility_spark.queries.battery import (
    q_window_battery,
    q_window_frames_battery,
)
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
    par = sliding_rows_window(
        ev, ["event_type"], ["value", "event_id"], AGGS, lo, hi,
        min_parallel_rows=0,
    )
    got = sorted(map(tuple, par.select("event_id", "c", "s").collect()))
    want = sorted(map(tuple, _serial(ev, lo, hi).collect()))
    assert got == want and len(got) > 0


def test_parallel_window_distributes_past_part_domain(spark):
    """The point of the operator: the sort/window stage must run on the
    chunk count, not on the ~5-value event_type domain — the final
    exchange hashes on (chunk, part)."""
    ev = _events(spark)
    par = sliding_rows_window(
        ev, ["event_type"], ["value", "event_id"], AGGS, -2, 2,
        chunks=16, min_parallel_rows=0,
    )
    assert par.rdd.getNumPartitions() == 16
    plan = pi.executed_plan(par)
    assert "_pw_target" in plan  # the chunk id leads the window partition


def test_small_relation_falls_back_serial(spark):
    # a deterministic 40-row subset (an unordered .limit() can differ
    # between the operator's internal passes), reused for both sides
    ev = _events(spark).filter(F.col("event_id") % 1500 == 0)
    par = sliding_rows_window(
        ev, ["event_type"], ["value", "event_id"], AGGS, -2, 2,
        min_parallel_rows=0,
    )
    got = sorted(map(tuple, par.select("event_id", "c", "s").collect()))
    want = sorted(map(tuple, _serial(ev, -2, 2).collect()))
    assert got == want and 0 < len(got) < 64


def test_small_input_routes_serial_by_default(spark):
    """The production default (min_parallel_rows unset) must route an
    oracle-sized relation straight to WindowExec — no chunk machinery in
    the plan."""
    ev = _events(spark)
    par = sliding_rows_window(ev, ["event_type"], ["value", "event_id"], AGGS, -2, 2)
    assert "_pw_target" not in pi.executed_plan(par)


def test_null_order_key_falls_back_serial(spark):
    """NULL keys break Python split sorting and literal struct comparison
    NULLS FIRST semantics — the operator must detect and route serial,
    still producing WindowExec's own (NULLS FIRST) answer."""
    ev = _events(spark).withColumn(
        "value", F.when(F.col("event_id") % 97 == 0, None).otherwise(F.col("value"))
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        par = sliding_rows_window(
            ev, ["event_type"], ["value", "event_id"], AGGS, -2, 2,
            min_parallel_rows=0,
        )
        assert any("NULL keys" in str(w.message) for w in caught)
    got = sorted(map(tuple, par.select("event_id", "c", "s").collect()))
    want = sorted(map(tuple, _serial(ev, -2, 2).collect()))
    assert got == want


def test_guard_rejects_undersized_and_gapped_chunkings():
    """ALL chunks must hold ≥ h keys (an undersized END chunk would put a
    NULL h-th extreme into the literal border table — the
    FIELD_NOT_NULLABLE createDataFrame failure; an undersized MIDDLE chunk
    would need a two-hop halo) and chunk ids must be contiguous."""
    from pyspark.sql import Row

    from lakehouse_spain_mobility_spark.operators.pwindow import _guard_ok

    mk = lambda *cnts, ids=None: [
        Row(_pw_chunk=(ids[i] if ids else i), cnt=c) for i, c in enumerate(cnts)
    ]
    assert _guard_ok(mk(5, 9, 7), h=5)
    assert not _guard_ok(mk(5, 9, 3), h=5)  # undersized END chunk
    assert not _guard_ok(mk(5, 3, 7), h=5)  # undersized middle chunk
    assert not _guard_ok(mk(5, 9, 7, ids=[0, 1, 3]), h=5)  # gap
    assert not _guard_ok([], h=1)


def test_frame_must_straddle_current_row(spark):
    with pytest.raises(ValueError):
        sliding_rows_window(
            _events(spark), ["event_type"], ["value", "event_id"], AGGS, 1, 2
        )


# --- ranked_window (rank/prefix stencil with scalar carry) -------------------
def _ranked_serial_ref(ev):
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
        F.sum(F.round(F.col("value") * F.lit(1e6)).cast("decimal(38,0)"))
        .over(wrun)
        .alias("run"),
        F.lag("value").over(w).alias("pv"),
        F.lead("value").over(w).alias("nv"),
    )


def _ranked_par(ev, **kw):
    return ranked_window(
        ev,
        ["event_type"],
        ["value", "event_id"],
        sums={"run": F.round(F.col("value") * F.lit(1e6)).cast("decimal(38,0)")},
        rn_col="rn",
        total_col="n",
        prev_cols={"pv": "value"},
        next_cols={"nv": "value"},
        **kw,
    ).select("event_id", "rn", "n", "run", "pv", "nv")


def test_ranked_window_equals_serial(spark):
    ev = _events(spark)
    got = sorted(map(tuple, _ranked_par(ev, min_parallel_rows=0).collect()))
    want = sorted(map(tuple, _ranked_serial_ref(ev).collect()))
    assert got == want and len(got) > 0


def test_ranked_window_distribution_contract(spark):
    """The carry decomposition's point: the final sort/window stage runs on
    the CHUNK count, not the ~5-value partition domain — and since round 8,
    exactly ONE chunk per partition (inverted-hash slot): hashing chunk ids
    left ~1/e of the partitions empty and stacked others into a fat tail."""
    ev = _events(spark)
    par = _ranked_par(ev, min_parallel_rows=0, chunks=16)
    assert par.rdd.getNumPartitions() == 16
    assert "_pw_chunk" in pi.executed_plan(par)
    sizes = par.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert min(sizes) > 0, f"empty partition — slot mapping broken: {sizes}"
    # even chunks (range split): no partition should dominate
    assert max(sizes) < 2 * (sum(sizes) / len(sizes)), sizes


def test_murmur3_matches_spark(spark):
    """The slot inversion reimplements Spark's Murmur3Hash(int, seed 42) on
    the driver; a drift would silently cost balance (never correctness).
    Pin it against F.hash over a sign-covering range."""
    rows = (
        spark.range(-3, 4000)
        .select(F.col("id").cast("int").alias("x"), F.hash(F.col("id").cast("int")).alias("h"))
        .collect()
    )
    for r in rows:
        assert _murmur3_int(r["x"]) == r["h"], r["x"]
    # and the derived map is a true inverse: slot s at index c hashes to c
    for m in (1, 2, 5, 16, 32, 100):
        assert [_murmur3_int(s) % m for s in _slot_map(m)] == list(range(m))


def test_slot_col_degrades_not_crashes(spark, monkeypatch):
    """If slot inversion ever failed to cover every residue, _slot_col must
    warn and fall back to raw chunk-id hashing (the pre-r8 balance), never
    raise at query-construction time (ADVICE r8)."""
    import warnings as _w

    from lakehouse_spain_mobility_spark.operators import pwindow as pw

    monkeypatch.setattr(pw, "_slot_map", lambda m: None)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        col = pw._slot_col(F.lit(7), 4, offset=2)
    assert any("slot inversion" in str(c.message) for c in caught)
    # fallback is the identity (base - offset) — values still partition-pure
    assert spark.range(1).select(col.alias("s")).first()["s"] == 5


def test_sliding_window_no_empty_partitions(spark):
    ev = _events(spark)
    par = sliding_rows_window(
        ev, ["event_type"], ["value", "event_id"], AGGS, -2, 2,
        chunks=16, min_parallel_rows=0,
    )
    sizes = par.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
    assert len(sizes) == 16 and min(sizes) > 0, sizes


def test_ranked_window_small_input_routes_serial(spark):
    ev = _events(spark)
    par = _ranked_par(ev)  # production floor — oracle SF is far below it
    assert "_pw_chunk" not in pi.executed_plan(par)
    got = sorted(map(tuple, par.collect()))
    want = sorted(map(tuple, _ranked_serial_ref(ev).collect()))
    assert got == want


def test_ranked_window_null_key_falls_back_serial(spark):
    ev = _events(spark).withColumn(
        "value", F.when(F.col("event_id") % 97 == 0, None).otherwise(F.col("value"))
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        par = _ranked_par(ev, min_parallel_rows=0)
        assert any("NULL keys" in str(w.message) for w in caught)
    got = sorted(map(tuple, par.collect()))
    want = sorted(map(tuple, _ranked_serial_ref(ev).collect()))
    assert got == want


# --- battery-level serial/parallel A/B ---------------------------------------
def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_window_frames_battery_serial_parallel_ab(spark):
    par = q_window_frames_battery(spark, SF_DIR_ORACLE, serial=False, min_parallel_rows=0)
    ser = q_window_frames_battery(spark, SF_DIR_ORACLE, serial=True)
    assert par.columns == ser.columns
    assert _rows(par) == _rows(ser)


def test_window_battery_serial_parallel_ab(spark):
    par = q_window_battery(spark, SF_DIR_ORACLE, serial=False, min_parallel_rows=0)
    ser = q_window_battery(spark, SF_DIR_ORACLE, serial=True)
    assert par.columns == ser.columns
    assert _rows(par) == _rows(ser)


# --- adversarial relations through the carry stencil --------------------------
def _adversarial_cases():
    # (name, rows of (part, value, id)) — each shape attacks one carry
    # assumption: single-part (every chunk shares the partition), 90% skew
    # (one carry row dominates), tied ORDER values with a unique tiebreaker
    # (prefix/lag must follow the id), negative/extreme sums (decimal carry
    # signs), and a part count near the chunk count (borders everywhere)
    one = [("a", float(i % 7), i) for i in range(200)]
    skew = [("hot" if i % 10 else f"cold{i%3}", float(i % 13) - 6.0, i) for i in range(300)]
    ties = [("a" if i < 150 else "b", float(i % 3), i) for i in range(300)]
    ext = [("p", (-1) ** i * 1e6 * ((i % 11) + 1), i) for i in range(250)]
    many = [(f"p{i % 5}", float(i), i) for i in range(200)]
    return [("one_part", one), ("skew90", skew), ("order_ties", ties),
            ("extreme_sums", ext), ("parts_near_chunks", many)]


@pytest.mark.parametrize("case", _adversarial_cases(), ids=lambda c: c[0])
def test_ranked_window_adversarial_shapes(spark, case):
    _, rows = case
    df = spark.createDataFrame(rows, "part string, value double, id long")
    kw = dict(
        part_cols=["part"], order_cols=["value", "id"],
        sums={"run": F.round(F.col("value") * F.lit(1e3)).cast("decimal(38,0)")},
        rn_col="rn", total_col="n",
        prev_cols={"pv": "value"}, next_cols={"nv": "value"},
    )
    par = ranked_window(df, chunks=4, min_parallel_rows=0, **kw)
    ser = ranked_window(df, min_parallel_rows=2**62, **kw)  # forced serial
    cols = ["id", "rn", "n", "run", "pv", "nv"]
    got = sorted(map(tuple, par.select(*cols).collect()))
    want = sorted(map(tuple, ser.select(*cols).collect()))
    assert got == want and len(got) == len(rows)
