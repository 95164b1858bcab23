"""Incremental manifest inheritance (ManifestCommittable semantics +
manifest.merge-min-count): append commits reuse the previous snapshot's
manifest files untouched — O(delta) metadata per commit — and the fold
into one consolidated manifest is amortized or forced via
compact_manifest."""

from __future__ import annotations


def _base_manifests(t):
    snap = t.snapshots.latest()
    return t.manifests.read_manifest_list(snap.base_manifest_list)


def test_append_commits_inherit_manifest_files(spark, warehouse):
    t = warehouse.create_table("db.minh", "k bigint, v string")
    t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    t = t.refresh()
    m1 = _base_manifests(t)  # empty base after first commit
    t.write(spark.createDataFrame([(2, "b")], "k bigint, v string"))
    t = t.refresh()
    m2 = _base_manifests(t)
    t.write(spark.createDataFrame([(3, "c")], "k bigint, v string"))
    t = t.refresh()
    m3 = _base_manifests(t)
    # each commit's base = previous base + previous delta, files reused
    assert m3[: len(m2)] == m2 and len(m3) == len(m2) + 1
    assert m2[: len(m1)] == m1
    assert {(r.k, r.v) for r in t.to_df(spark).collect()} == {(1, "a"), (2, "b"), (3, "c")}


def test_fold_at_merge_min_count(spark, warehouse):
    t = warehouse.create_table(
        "db.minh2", "k bigint, v string", options={"manifest.merge-min-count": "4"}
    )
    for i in range(6):
        t.write(spark.createDataFrame([(i, f"v{i}")], "k bigint, v string"))
    t = t.refresh()
    # the chain folded at least once: far fewer than 6 base manifests
    assert len(_base_manifests(t)) < 5
    assert t.to_df(spark).count() == 6


def test_compact_manifest_forces_fold(spark, warehouse):
    t = warehouse.create_table("db.minh3", "k bigint, v string")
    for i in range(3):
        t.write(spark.createDataFrame([(i, f"v{i}")], "k bigint, v string"))
    t = t.refresh()
    assert len(_base_manifests(t)) > 1
    t.compact_manifest()
    t = t.refresh()
    assert len(_base_manifests(t)) == 1
    assert t.to_df(spark).count() == 3


def test_delete_entries_cancel_through_the_chain(spark, warehouse):
    """A DELETE in a later inherited manifest must cancel the ADD from an
    earlier one (read_live_entries applies the chain in commit order)."""
    from flink_table_store_spark import predicate as P

    t = warehouse.create_table("db.minh4", "k bigint, p string", partition_keys=["p"])
    t.write(spark.createDataFrame([(1, "A"), (2, "B")], "k bigint, p string"))
    t = t.refresh()
    t.write(
        spark.createDataFrame([(9, "A")], "k bigint, p string"),
        overwrite=True,
        overwrite_partition_filter=P.equal("p", "A"),
    )
    t = t.refresh()
    t.write(spark.createDataFrame([(3, "C")], "k bigint, p string"))
    t = t.refresh()
    rows = {(r.k, r.p) for r in t.to_df(spark).collect()}
    assert rows == {(9, "A"), (2, "B"), (3, "C")}
