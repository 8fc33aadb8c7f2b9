from __future__ import annotations

import os

import pytest

os.environ.setdefault("TZ", "UTC")

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from lakehouse_spain_mobility_spark.session import build_session

    warehouse = str(tmp_path_factory.mktemp("spark_warehouse"))
    spark = build_session(
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield spark
    spark.stop()
