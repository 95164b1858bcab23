"""Catalog views + function DDL procedures.

Reference parity: catalog view support with per-dialect query text
(paimon-api view/; alter_view_dialect procedure), catalog function
CRUD (Function.java:29-45, FunctionChange.java:60-78).
"""

from __future__ import annotations

import os

import pytest

from flink_table_store_spark.procedures import call
from flink_table_store_spark.sql import SqlSession

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _nation_table(spark, warehouse):
    nation = spark.read.parquet(os.path.join(SF, "nation.parquet"))
    t = warehouse.create_table("db.nation", nation.schema, ignore_if_exists=True)
    if not t.snapshots.latest_id():
        t.write(nation)
    return t


def test_view_lifecycle_and_select(spark, warehouse):
    _nation_table(spark, warehouse)
    call(
        spark, warehouse, "create_view",
        view="db.nation_v",
        query="SELECT n_regionkey, count(*) AS n FROM db.nation GROUP BY n_regionkey",
    )
    assert warehouse.list_views("db") == ["nation_v"]
    assert warehouse.is_view("db.nation_v")
    ses = SqlSession(spark, warehouse)
    rows = ses.sql("SELECT * FROM db.nation_v ORDER BY n_regionkey").collect()
    assert sum(r["n"] for r in rows) == 25

    # view-on-view resolution
    call(
        spark, warehouse, "create_view",
        view="db.nation_v2", query="SELECT sum(n) AS total FROM db.nation_v",
    )
    assert ses.sql("SELECT * FROM db.nation_v2").collect()[0]["total"] == 25

    # dialect management
    call(
        spark, warehouse, "alter_view_dialect",
        view="db.nation_v", dialect="flink", query="SELECT 1",
    )
    v = warehouse.get_view("db.nation_v")
    assert set(v["dialects"]) == {"spark", "flink"}

    with pytest.raises(RuntimeError):
        warehouse.create_view("db.nation_v", "SELECT 2")

    call(spark, warehouse, "drop_view", view="db.nation_v2")
    assert warehouse.list_views("db") == ["nation_v"]


def test_function_ddl_procedures(spark, warehouse):
    call(
        spark, warehouse, "create_function",
        function_name="disc_price", params=["p double", "d double"], expr="p * (1 - d)",
        returns="double",
    )
    assert warehouse.functions.list() == ["disc_price"]
    call(spark, warehouse, "alter_function", function_name="disc_price", expr="p * (1.0 - d)")
    assert warehouse.functions.load("disc_price")["expr"] == "p * (1.0 - d)"
    warehouse.functions.register_all(spark)
    assert spark.sql("SELECT disc_price(10.0, 0.1) AS v").collect()[0]["v"] == 9.0
    call(spark, warehouse, "drop_function", function_name="disc_price")
    assert warehouse.functions.list() == []
