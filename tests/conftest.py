from __future__ import annotations

import os

import pytest

os.environ.setdefault("TZ", "UTC")

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from lakehouse_spain_mobility_spark.session import build_session

    spark = build_session(master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()
