"""Unit tests for pure-Python function helpers: Easter computus, holiday
enumeration, day-type mapping, deterministic aggregation edge cases."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from lakehouse_spain_mobility_spark.functions import holidays_es, scalar
from lakehouse_spain_mobility_spark.functions.deterministic import (
    davg,
    dstddev_samp,
    dstddev_samp0,
    dsum,
)


def test_easter_computus_known_dates():
    assert holidays_es.easter_sunday(2023) == datetime.date(2023, 4, 9)
    assert holidays_es.easter_sunday(2024) == datetime.date(2024, 3, 31)
    assert holidays_es.easter_sunday(2025) == datetime.date(2025, 4, 20)


def test_good_friday_in_holidays():
    days = holidays_es.spain_holidays(2023)
    assert datetime.date(2023, 4, 7) in days  # Viernes Santo
    assert datetime.date(2023, 1, 1) in days and datetime.date(2023, 12, 25) in days
    assert len(days) == 10


def test_day_type_mapping(spark):
    # 2023-02-06 Mon, 07 Tue, 10 Fri, 11 Sat, 12 Sun, 08 Wed
    df = spark.createDataFrame(
        [("2023-02-06",), ("2023-02-07",), ("2023-02-08",), ("2023-02-10",),
         ("2023-02-11",), ("2023-02-12",)],
        "d string",
    ).select(scalar.day_type(F.to_date("d")).alias("dt"))
    assert [r["dt"] for r in df.collect()] == [1, 2, 2, 5, 6, 0]


def test_day_type_holiday_override(spark):
    df = spark.createDataFrame([("2023-02-06", True), ("2023-02-06", False)], "d string, h boolean")
    out = df.select(scalar.day_type(F.to_date("d"), F.col("h")).alias("dt")).collect()
    assert [r["dt"] for r in out] == [8, 1]


def test_deterministic_agg_edge_cases(spark):
    df = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("a", None), ("b", 7.25), ("c", None)], "k string, v double"
    )
    out = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            dsum(F.col("v")).alias("s"),
            davg(F.col("v")).alias("m"),
            dstddev_samp(F.col("v")).alias("sd"),
            dstddev_samp0(F.col("v")).alias("sd0"),
        )
        .collect()
    }
    assert out["a"]["s"] == 4.0 and out["a"]["m"] == 2.0
    assert abs(out["a"]["sd"] - 0.7071067811865476) < 1e-12
    assert out["b"]["sd"] is None and out["b"]["sd0"] == 0.0  # n=1 → NULL → 0
    assert out["c"]["s"] is None and out["c"]["sd0"] == 0.0  # all-NULL group


def test_spanish_decimal(spark):
    df = spark.createDataFrame([("1.234,56",), ("12,5",), ("junk",)], "s string")
    vals = [r[0] for r in df.select(scalar.spanish_decimal(F.col("s"))).collect()]
    assert vals == [1234.56, 12.5, None]


def test_connected_components_chain_merge(spark):
    """A~B, B~C, D~E: the chain must close into {A,B,C} even though A!~C
    (the case where pairwise keep-first over-deletes), plus a separate
    2-clique — and converge within the iteration budget."""
    from lakehouse_spain_mobility_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(10, 20), (20, 30), (40, 50)], "d1 bigint, d2 bigint"
    )
    got = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 40: 40, 50: 40}


def test_from_json_matches_get_json_object(spark):
    """Schema-ful from_json and path-based get_json_object must extract
    identical values from events.props (the two JSON surfaces §2.8 maps
    to)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from lakehouse_spain_mobility_spark.queries.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    schema = T.StructType([T.StructField("k", T.DoubleType())])
    both = ev.select(
        F.get_json_object("props", "$.k").cast("double").alias("path_k"),
        F.from_json("props", schema).getField("k").alias("struct_k"),
    )
    assert both.filter(
        ~(F.col("path_k").eqNullSafe(F.col("struct_k")))
    ).count() == 0
