"""Differential tests: every registry query must match its DuckDB oracle
exactly at sf0.01 — the same check the driver runs for CORRECTNESS_r{N}."""

from __future__ import annotations

import pytest

from lakehouse_spain_mobility_spark.oracle import compare
from lakehouse_spain_mobility_spark.queries import load_all

from conftest import SF_DIR_ORACLE

SPECS = list(load_all().values())


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, spec):
    res = compare(spark, spec, SF_DIR_ORACLE)
    assert res.match, f"{spec.name}: {res.detail}"
    assert res.rows > 0, f"{spec.name}: empty result"
