"""Append-table format tests: create/write/scan/filter/time-travel/
overwrite/maintenance (SURVEY M1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark import predicate as P


@pytest.fixture()
def t(spark, warehouse):
    df = spark.createDataFrame(
        [(i, f"u{i % 3}", float(i)) for i in range(100)], "id bigint, pt string, v double"
    )
    table = warehouse.create_table("db.t", df.schema, partition_keys=["pt"])
    table.write(df)
    return table


def test_roundtrip(spark, t):
    got = t.to_df(spark)
    assert got.count() == 100
    assert {r.id for r in got.collect()} == set(range(100))


def test_partition_prune_reads_only_matching_files(spark, t):
    plan = t.read_builder().with_filter(P.equal("pt", "u1")).plan()
    assert all(e.partition["pt"] == "u1" for e in plan.raw_entries)
    got = t.to_df(spark, predicate=P.equal("pt", "u1"))
    assert got.count() == 33  # ids 1,4,...,97


def test_stats_skipping(spark, t):
    # second commit with disjoint id range; filter should plan only file(s)
    df2 = spark.createDataFrame(
        [(i, f"u{i % 3}", float(i)) for i in range(1000, 1100)], "id bigint, pt string, v double"
    )
    t.write(df2)
    plan = t.read_builder().with_filter(P.greater_or_equal("id", 1000)).plan()
    lo = [e for e in plan.raw_entries if e.stats["id"]["max"] < 1000]
    assert not lo, "files with max id < 1000 must be pruned"
    assert t.to_df(spark, predicate=P.greater_or_equal("id", 1000)).count() == 100


def test_projection_and_limit(spark, t):
    got = t.to_df(spark, projection=["id"], limit=7)
    assert got.columns == ["id"]
    assert got.count() == 7


def test_time_travel_and_tags(spark, t):
    df2 = spark.createDataFrame([(200, "u0", 1.0)], "id bigint, pt string, v double")
    t.create_tag("v1")
    t.write(df2)
    assert t.to_df(spark).count() == 101
    assert t.to_df(spark, snapshot_id=1).count() == 100
    assert t.to_df(spark, tag="v1").count() == 100


def test_overwrite_partition(spark, t):
    new = spark.createDataFrame([(999, "u1", 9.9)], "id bigint, pt string, v double")
    t.write(new, overwrite=True, overwrite_partition_filter=P.equal("pt", "u1"))
    got = t.to_df(spark)
    assert got.where("pt = 'u1'").count() == 1
    assert got.count() == 100 - 33 + 1


def test_count_and_minmax_from_stats(t):
    assert t.count_rows() == 100
    assert t.count_rows(P.equal("pt", "u0")) == 34
    assert t.min_max("id") == (0, 99)
    assert t.max_pt() == "u2"


def test_rollback_and_expire(spark, t):
    for i in range(3):
        t.write(spark.createDataFrame([(300 + i, "u0", 0.0)], "id bigint, pt string, v double"))
    assert t.snapshots.latest_id() == 4
    t.rollback_to(2)
    assert t.snapshots.latest_id() == 2
    assert t.to_df(spark).count() == 101


def test_orphan_cleanup_keeps_live_data(spark, t):
    t.write(spark.createDataFrame([(500, "u0", 0.0)], "id bigint, pt string, v double"))
    t.rollback_to(1)
    removed = t.remove_orphan_files(older_than_millis=10**15)
    assert removed, "rollback leaves orphan data files"
    assert t.to_df(spark).count() == 100


def test_copy_on_write_delete_update(spark, t):
    t.delete(spark, P.less_than("id", 10))
    assert t.to_df(spark).count() == 90
    t.update(spark, P.equal("id", 50), {"v": F.lit(-1.0)})
    assert t.to_df(spark).where("v = -1.0").collect()[0].id == 50


def test_metadata_only_partition_delete(spark, t):
    before = t.snapshots.latest().total_record_count
    snap = t.delete(spark, P.equal("pt", "u2"))
    assert snap.commit_kind == "OVERWRITE"
    assert t.to_df(spark).where("pt = 'u2'").count() == 0
    assert t.to_df(spark).count() == before - 33


def test_commit_distributed_stats_threshold(spark, warehouse):
    """Above commit.distributed-stats-threshold staged files the commit
    collects per-file stats with one Spark aggregation instead of
    driver-side footer walks; entries and pruning stay identical."""
    from flink_table_store_spark import predicate as P

    t = warehouse.create_table(
        "db.dist_stats",
        "k bigint, v double",
        options={"commit.distributed-stats-threshold": "1"},
    )
    df = spark.createDataFrame([(i, float(i)) for i in range(64)], "k bigint, v double")
    t.write(df.repartition(4))  # 4 staged files > threshold 1
    t = t.refresh()
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    )
    assert sum(e.row_count for e in entries) == 64
    assert all(e.stats["k"]["min"] is not None for e in entries)
    got = t.to_df(spark, predicate=P.less_than("k", 10)).count()
    assert got == 10


def test_dynamic_partition_overwrite_default(spark, warehouse):
    """INSERT OVERWRITE on a partitioned table replaces only the
    partitions present in the new data (CoreOptions
    dynamic-partition-overwrite default true)."""
    t = warehouse.create_table(
        "db.dynow", "k bigint, pt string", partition_keys=["pt"]
    )
    t.write(spark.createDataFrame(
        [(1, "x"), (2, "y")], "k bigint, pt string"
    ))
    t.write(
        spark.createDataFrame([(9, "x")], "k bigint, pt string"),
        overwrite=True,
    )
    rows = {(r.k, r.pt) for r in t.to_df(spark).collect()}
    assert rows == {(9, "x"), (2, "y")}  # y untouched
    # empty overwrite replaces nothing
    t.write(spark.createDataFrame([], "k bigint, pt string"), overwrite=True)
    assert {(r.k, r.pt) for r in t.to_df(spark).collect()} == rows
    # opt-out: static whole-table overwrite
    t2 = warehouse.create_table(
        "db.statow", "k bigint, pt string", partition_keys=["pt"],
        options={"dynamic-partition-overwrite": "false"},
    )
    t2.write(spark.createDataFrame(
        [(1, "x"), (2, "y")], "k bigint, pt string"
    ))
    t2.write(
        spark.createDataFrame([(9, "x")], "k bigint, pt string"),
        overwrite=True,
    )
    assert {(r.k, r.pt) for r in t2.to_df(spark).collect()} == {(9, "x")}
    # unpartitioned tables keep full-replace semantics
    t3 = warehouse.create_table("db.unpow", "k bigint")
    t3.write(spark.createDataFrame([(1,), (2,)], "k bigint"))
    t3.write(spark.createDataFrame([(9,)], "k bigint"), overwrite=True)
    assert [r.k for r in t3.to_df(spark).collect()] == [9]


def test_partial_static_spec_dynamic_overwrite(spark, tmp_path):
    """INSERT OVERWRITE with a PARTIAL static PARTITION spec: under
    dynamic overwrite only (static, seen-dynamic) partitions replace —
    untouched sibling dynamic values survive."""
    from flink_table_store_spark.catalog import Catalog
    from flink_table_store_spark.sql import SqlSession

    cat = Catalog(str(tmp_path / "wh"))
    s = SqlSession(spark, cat)
    s.sql(
        "CREATE TABLE db.pso (k bigint, p1 string, p2 string) "
        "PARTITIONED BY (p1, p2)"
    )
    s.sql(
        "INSERT INTO db.pso VALUES (1, 'a', 'x'), (2, 'a', 'y'), (3, 'b', 'x')"
    )
    # static p1='a', dynamic p2: only (a, x) appears in the data
    s.sql("INSERT OVERWRITE db.pso PARTITION (p1='a') VALUES (9, 'x')")
    rows = {(r.k, r.p1, r.p2) for r in s.sql("SELECT * FROM db.pso").collect()}
    assert rows == {(9, "a", "x"), (2, "a", "y"), (3, "b", "x")}
