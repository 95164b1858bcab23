from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from flink_table_store_spark.session import get_spark

    spark = get_spark("ftss-tests", shuffle_partitions=4)
    yield spark


@pytest.fixture()
def warehouse(tmp_path):
    from flink_table_store_spark.catalog import Catalog

    return Catalog(str(tmp_path / "wh"))
