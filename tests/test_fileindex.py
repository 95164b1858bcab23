"""Embedded bloom file indexes (P9): plan-time whole-file skipping."""

from __future__ import annotations

from flink_table_store_spark import fileindex
from flink_table_store_spark import predicate as P
from flink_table_store_spark import read as read_mod


def _mk(spark, warehouse, name="db.bloom"):
    t = warehouse.create_table(
        name,
        "id bigint, v string",
        options={
            "file-index.bloom-filter.columns": "v",
            "file-index.bloom-filter.items": "1000",
        },
    )
    # three commits with disjoint value sets but overlapping min/max
    # ranges, so min/max stats alone cannot skip any file
    t.write(spark.createDataFrame([(1, "aa"), (2, "zz")], "id bigint, v string"))
    t.write(spark.createDataFrame([(3, "ab"), (4, "zy")], "id bigint, v string"))
    t.write(spark.createDataFrame([(5, "ac"), (6, "zx")], "id bigint, v string"))
    return t.refresh()


def _entries(t):
    snap = t.snapshots.latest()
    return t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)


def test_bloom_written_and_prunes(spark, warehouse):
    t = _mk(spark, warehouse)
    entries = _entries(t)
    assert all("bloom" in (e.stats.get("v") or {}) for e in entries)
    total = len(entries)

    pred = P.equal("v", "zy")
    fileindex.attach_bloom_positions(spark, pred, t.schema)
    plan = read_mod.plan_scan(entries, t.schema, pred)
    assert plan.file_count() < total  # bloom skipped sibling files
    assert [(r.id, r.v) for r in t.to_df(spark, predicate=pred).collect()] == [(4, "zy")]

    absent = P.equal("v", "not-there")
    fileindex.attach_bloom_positions(spark, absent, t.schema)
    assert read_mod.plan_scan(entries, t.schema, absent).file_count() == 0

    isin = P.isin("v", ["aa", "ac"])
    fileindex.attach_bloom_positions(spark, isin, t.schema)
    got = {
        (r.id, r.v)
        for r in t.to_df(spark, predicate=isin).collect()
    }
    assert got == {(1, "aa"), (5, "ac")}


def test_bloom_never_wrongly_prunes_without_positions(spark, warehouse):
    # un-attached predicates (no plan-time positions) fall back to
    # min/max-only pruning — correctness never depends on the index
    t = _mk(spark, warehouse, "db.bloom2")
    entries = _entries(t)
    plan = read_mod.plan_scan(entries, t.schema, P.equal("v", "zy"))
    assert plan.file_count() >= 1
    assert t.to_df(spark, predicate=P.equal("v", "zy")).count() == 1


def test_bloom_size_mismatch_is_ignored(spark, warehouse):
    t = _mk(spark, warehouse, "db.bloom3")
    entries = _entries(t)
    pred = P.equal("v", "zy")
    fileindex.attach_bloom_positions(spark, pred, t.schema)
    pred.bloom_m = 12345  # as if files were written under a different m
    plan = read_mod.plan_scan(entries, t.schema, pred)
    # mismatched m -> bloom skipped, min/max keeps all overlapping files
    assert plan.file_count() >= 1
    assert t.to_df(spark, predicate=pred).count() == 1


def test_bloom_survives_compaction(spark, warehouse):
    t = _mk(spark, warehouse, "db.bloom4")
    t.compact(spark, full=True)
    t = t.refresh()
    entries = _entries(t)
    pred = P.equal("v", "zz")
    fileindex.attach_bloom_positions(spark, pred, t.schema)
    assert t.to_df(spark, predicate=pred).count() == 1
