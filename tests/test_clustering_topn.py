"""Z-order/Hilbert sort-compact (O5) + TopN file pruning (O2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark import predicate as P


@pytest.fixture()
def t(spark, warehouse):
    """Table with interleaved key ranges across 4 commits — worst case
    for skipping before clustering."""
    table = warehouse.create_table("db.clu", "x bigint, y bigint, v double")
    for i in range(4):
        df = spark.createDataFrame(
            [(j, (j * 7919) % 1000, float(j)) for j in range(i, 1000, 4)],
            "x bigint, y bigint, v double",
        )
        table.write(df)
    return table


def _plan_files(table, pred):
    return table.read_builder().with_filter(pred).plan().file_count()


def test_zorder_improves_skipping(spark, t):
    before = _plan_files(t, P.and_(P.between("x", 100, 120), P.between("y", 0, 50)))
    assert before == 4  # every commit overlaps every x range
    t.sort_compact(spark, ["x", "y"], strategy="zorder", num_files=8)
    assert t.to_df(spark).count() == 1000  # content preserved
    after = _plan_files(t, P.and_(P.between("x", 100, 120), P.between("y", 0, 50)))
    assert after < 4, f"z-order should prune files, read {after}"
    total = t.read_builder().plan().file_count()
    assert total >= 8 - 1


def test_order_strategy_and_content(spark, t):
    t.sort_compact(spark, ["x"], strategy="order", num_files=4)
    got = t.to_df(spark, predicate=P.equal("x", 500)).collect()
    assert len(got) == 1 and got[0].v == 500.0
    assert _plan_files(t, P.equal("x", 500)) == 1  # disjoint x ranges


def test_hilbert_strategy_preserves_rows(spark, t):
    t.sort_compact(spark, ["x", "y"], strategy="hilbert", num_files=4)
    assert t.to_df(spark).count() == 1000
    assert _plan_files(t, P.between("x", 0, 50)) < 4


def test_topn_pushdown_prunes_files(spark, warehouse):
    t = warehouse.create_table("db.topn", "id bigint, v double")
    # disjoint ranges: commit i covers [i*100, i*100+100)
    for i in range(5):
        t.write(
            spark.createDataFrame(
                [(i * 100 + j, float(i * 100 + j)) for j in range(100)], "id bigint, v double"
            )
        )
    rb = t.read_builder().with_topn("v", 10, desc=True)
    df = rb.to_df(spark)
    got = [r.id for r in df.collect()]
    assert got == list(range(499, 489, -1))
    # planning read only the top file(s)
    pruned = __import__(
        "flink_table_store_spark.read", fromlist=["prune_topn"]
    ).prune_topn(t.read_builder().plan().raw_entries, "v", 10, desc=True)
    assert len(pruned) == 1

    asc = t.read_builder().with_topn("v", 3, desc=False).to_df(spark).collect()
    assert [r.id for r in asc] == [0, 1, 2]


def test_topn_with_predicate_stays_correct(spark, warehouse):
    t = warehouse.create_table("db.topn2", "id bigint, grp string, v double")
    t.write(
        spark.createDataFrame(
            [(i, "a" if i < 900 else "b", float(i)) for i in range(1000)],
            "id bigint, grp string, v double",
        )
    )
    df = t.read_builder().with_filter(P.equal("grp", "a")).with_topn("v", 2).to_df(spark)
    assert [r.id for r in df.collect()] == [899, 898]


def test_incremental_clustering_rewrites_only_new_files(spark, warehouse):
    t = warehouse.create_table("db.inc_cluster", "a int, b int, v string")
    t.write(spark.createDataFrame([(i, i * 2, f"x{i}") for i in range(100)], "a int, b int, v string"))
    t.sort_compact(spark, ["a", "b"], num_files=4)
    snap1 = t.snapshots.latest()
    clustered = {
        e.file_name
        for e in t.manifests.read_live_entries(snap1.base_manifest_list, snap1.delta_manifest_list)
    }
    # new unclustered batch
    t.write(spark.createDataFrame([(i, i, f"y{i}") for i in range(100, 120)], "a int, b int, v string"))
    t.sort_compact(spark, ["a", "b"], num_files=2, incremental=True)
    snap2 = t.snapshots.latest()
    after = t.manifests.read_live_entries(snap2.base_manifest_list, snap2.delta_manifest_list)
    # the first clustering run survived untouched; only the delta was rewritten
    assert clustered <= {e.file_name for e in after}
    assert all(e.level == 5 for e in after)
    assert t.to_df(spark).count() == 120
    # a second incremental pass with nothing new is a no-op
    assert t.sort_compact(spark, ["a", "b"], incremental=True).id == snap2.id


def test_option_driven_incremental_clustering(spark, warehouse):
    """incremental-clustering.md: with clustering.incremental=true and
    clustering.columns set, CALL sys.compact IS an incremental
    clustering run (no parameters); compact_strategy='full' reclusters;
    strategy defaults from the column count (2 cols -> zorder)."""
    from flink_table_store_spark.procedures import call

    ddl = "a int, b int, v string"
    t = warehouse.create_table(
        "db.inc_opt", ddl,
        options={"clustering.incremental": "true",
                 "clustering.columns": "a,b"},
    )
    t.write(spark.createDataFrame(
        [(i, i * 2, f"x{i}") for i in range(80)], ddl))
    call(spark, warehouse, "compact", table="db.inc_opt")
    snap1 = t.snapshots.latest()
    entries1 = t.manifests.read_live_entries(
        snap1.base_manifest_list, snap1.delta_manifest_list)
    assert all(e.level == 5 for e in entries1)  # clustered output level
    clustered = {e.file_name for e in entries1}
    t.write(spark.createDataFrame(
        [(i, i, f"y{i}") for i in range(80, 100)], ddl))
    # plain compact() on the table obeys the option too
    t.compact(spark, full=False)
    snap2 = t.snapshots.latest()
    after = t.manifests.read_live_entries(
        snap2.base_manifest_list, snap2.delta_manifest_list)
    assert clustered <= {e.file_name for e in after}  # old runs untouched
    assert t.to_df(spark).count() == 100
    # full mode reclusters everything
    call(spark, warehouse, "compact", table="db.inc_opt",
         compact_strategy="full")
    snap3 = t.snapshots.latest()
    final = t.manifests.read_live_entries(
        snap3.base_manifest_list, snap3.delta_manifest_list)
    assert not (clustered & {e.file_name for e in final})
    assert t.to_df(spark).count() == 100
    # sort_compact with no cols picks them from the options
    assert t.sort_compact(spark, incremental=True).id == snap3.id
