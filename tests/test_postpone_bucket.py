"""Postpone-bucket mode (S19, BucketMode.java:69-73): shuffle-free
ingest into bucket -2; compaction assigns real buckets."""

from __future__ import annotations

from flink_table_store_spark.operators.lookup import point_lookup


def _mk(warehouse):
    return warehouse.create_table(
        "db.pp",
        "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "-2", "postpone.bucket-num": "4"},
    )


def test_postpone_write_lands_in_postpone_bucket(spark, warehouse):
    t = _mk(warehouse)
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"))
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    assert {e.bucket for e in entries} == {-2}
    assert t.to_df(spark).count() == 2


def test_postpone_read_merges_across_batches(spark, warehouse):
    t = _mk(warehouse)
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"))
    t.write(spark.createDataFrame([(1, "a2")], "k bigint, v string"))
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    assert got == {1: "a2", 2: "b"}
    # point lookup must see postpone files
    rows = point_lookup(spark, t, {"k": 1})
    assert len(rows) == 1 and rows[0].v == "a2"


def test_postpone_compact_assigns_real_buckets(spark, warehouse):
    t = _mk(warehouse)
    t.write(spark.createDataFrame([(i, f"v{i}") for i in range(20)], "k bigint, v string"))
    t.write(spark.createDataFrame([(0, "updated")], "k bigint, v string"))
    t.compact(spark)
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    buckets = {e.bucket for e in entries}
    assert -2 not in buckets and buckets <= {0, 1, 2, 3} and len(buckets) > 1
    # all compacted -> single run per bucket -> raw (no-merge) plan
    from flink_table_store_spark import read as read_mod

    plan = read_mod.plan_scan(entries, t.schema)
    assert plan.merge_entries == []
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    assert got == {**{i: f"v{i}" for i in range(1, 20)}, 0: "updated"}
    # lookups prune to the real bucket post-compaction
    assert point_lookup(spark, t, {"k": 7})[0].v == "v7"


def test_postpone_mixed_live_disables_raw_shortcut(spark, warehouse):
    t = _mk(warehouse)
    t.write(spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k bigint, v string"))
    t.compact(spark)
    # new postpone batch after compaction: updated key must win even
    # though its old version sits in a compacted single-run bucket
    t.write(spark.createDataFrame([(3, "new")], "k bigint, v string"))
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    assert got[3] == "new" and len(got) == 10
