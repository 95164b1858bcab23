"""metastore.tag-to-partition (+.preview): a non-partitioned PK table
reads as a tag-partitioned view, and the HiveCatalog mirror exposes the
tags as metastore partitions (migration/upsert-to-partitioned.md)."""

from __future__ import annotations

import pytest

DDL = "pk int, col1 string, col2 string"


def test_tag_partitioned_read(spark, warehouse):
    t = warehouse.create_table(
        "db.ttp1", DDL, primary_keys=["pk"],
        options={"metastore.tag-to-partition": "dt"},
    )
    t.write(spark.createDataFrame([(1, "10", "100"), (2, "20", "200")], DDL))
    t.create_tag("2023-10-16", 1)
    t.write(spark.createDataFrame([(1, "11", "101")], DDL))
    t.create_tag("2023-10-17", 2)
    df = t.tag_partition_view(spark)
    assert "dt" in df.columns
    # the engine's own relation is untouched: to_df stays the live table
    assert "dt" not in t.to_df(spark).columns
    day1 = {(r.pk, r.col1) for r in df.where("dt = '2023-10-16'").collect()}
    assert day1 == {(1, "10"), (2, "20")}
    day2 = {(r.pk, r.col1) for r in df.where("dt = '2023-10-17'").collect()}
    assert day2 == {(1, "11"), (2, "20")}
    # explicit travel still reads the raw table (no virtual column)
    assert "dt" not in t.to_df(spark, tag="2023-10-16").columns


def test_tag_partition_branch_pruning(spark, warehouse):
    """The dt filter constant-folds non-matching tag branches out of
    the plan — no scans of other tags."""
    t = warehouse.create_table(
        "db.ttp2", DDL, primary_keys=["pk"],
        options={"metastore.tag-to-partition": "dt"},
    )
    for i in range(3):
        t.write(spark.createDataFrame([(i, str(i), "x")], DDL))
        t.create_tag(f"day-{i}", i + 1)
    plan = (
        t.tag_partition_view(spark).where("dt = 'day-1'")._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert plan.count("Scan ") <= 2  # one live branch (+fallbacks), not 3


def test_preview_exposes_live_data(spark, warehouse):
    import datetime as dt

    t = warehouse.create_table(
        "db.ttp3", DDL, primary_keys=["pk"],
        options={
            "metastore.tag-to-partition": "dt",
            "metastore.tag-to-partition.preview": "process-time",
        },
    )
    t.write(spark.createDataFrame([(1, "10", "100")], DDL))
    t.create_tag("2023-10-16", 1)
    t.write(spark.createDataFrame([(3, "30", "300")], DDL))
    today = dt.datetime.utcnow().strftime("%Y-%m-%d")
    df = t.tag_partition_view(spark)
    live = {r.pk for r in df.where(f"dt = '{today}'").collect()}
    assert live == {1, 3}  # the unfinished day previews the live table
    old = {r.pk for r in df.where("dt = '2023-10-16'").collect()}
    assert old == {1}


def test_hive_mirror_partitions(spark, tmp_path):
    from flink_table_store_spark.hive_catalog import HiveCatalog

    cat = HiveCatalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        "db.ttphive", DDL, primary_keys=["pk"],
        options={"metastore.tag-to-partition": "dt"},
    )
    try:
        t.write(spark.createDataFrame([(1, "10", "100")], DDL))
        t.create_tag("2023-10-16", 1)
        parts = [r[0] for r in spark.sql("SHOW PARTITIONS db.ttphive").collect()]
        assert "dt=2023-10-16" in parts
    finally:
        cat.drop_table("db.ttphive")
        spark.sql("DROP DATABASE IF EXISTS db CASCADE")


def test_sql_surface_reads_view_and_dml_hits_live_table(spark, tmp_path):
    """Plain SELECTs route through the tag-partitioned view; DML and
    travel reads keep addressing the raw table (a DELETE must never
    scan resurrected tag history)."""
    from flink_table_store_spark.catalog import Catalog
    from flink_table_store_spark.sql import SqlSession
    from flink_table_store_spark import predicate as P

    cat = Catalog(str(tmp_path / "wh"))
    s = SqlSession(spark, cat)
    s.sql(
        "CREATE TABLE db.ttpsql (pk int, col1 string, col2 string) "
        "TBLPROPERTIES ('primary-key' = 'pk', "
        "'metastore.tag-to-partition' = 'dt')"
    )
    t = cat.get_table("db.ttpsql")
    t.write(spark.createDataFrame([(1, "10", "100")], DDL))
    t.create_tag("2023-10-16", 1)
    t.write(spark.createDataFrame([(2, "20", "200")], DDL))
    rows = {(r.pk, r.dt) for r in s.sql(
        "SELECT pk, dt FROM db.ttpsql WHERE dt = '2023-10-16'"
    ).collect()}
    assert rows == {(1, "2023-10-16")}
    # DML operates on the LIVE table, not the union of tags
    t.delete(spark, P.equal("pk", 1))
    live = {r.pk for r in t.refresh().to_df(spark).collect()}
    assert live == {2}
    # travel still raw
    assert "dt" not in [
        f.name for f in t.to_df(spark, tag="2023-10-16").schema.fields
    ]
