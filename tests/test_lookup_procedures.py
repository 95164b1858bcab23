"""Lookup join/point query (J1/J2), procedures, partition expiry, variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark import predicate as P
from flink_table_store_spark.operators.lookup import LookupTable, lookup_join, point_lookup
from flink_table_store_spark.procedures import call


@pytest.fixture()
def dim(spark, warehouse):
    t = warehouse.create_table(
        "db.dim", "k bigint, name string", primary_keys=["k"], options={"bucket": "4"}
    )
    t.write(spark.createDataFrame([(i, f"n{i}") for i in range(20)], "k bigint, name string"))
    return t


def test_lookup_join_enriches(spark, dim):
    facts = spark.createDataFrame([(1, 10.0), (5, 50.0), (99, 0.0)], "k bigint, amt double")
    got = {r.k: r.name for r in lookup_join(spark, facts, dim, on="k").collect()}
    assert got == {1: "n1", 5: "n5", 99: None}


def test_lookup_table_refreshes_on_new_snapshot(spark, dim):
    lt = LookupTable(spark, dim, refresh_interval_sec=0.0)
    facts = spark.createDataFrame([(3,)], "k bigint")
    assert lt.join(facts, on="k").collect()[0].name == "n3"
    dim.write(spark.createDataFrame([(3, "updated")], "k bigint, name string"))
    assert lt.join(facts, on="k").collect()[0].name == "updated"


def test_point_lookup_prunes_to_bucket(spark, dim):
    rows = point_lookup(spark, dim, {"k": 7})
    assert len(rows) == 1 and rows[0].name == "n7"
    assert point_lookup(spark, dim, {"k": 12345}) == []


def test_procedures_dispatch(spark, warehouse):
    t = warehouse.create_table("db.proc", "id bigint, pt string", partition_keys=["pt"])
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, pt string"))
    call(spark, warehouse, "create_tag", table="db.proc", tag="v1")
    assert "v1" in t.snapshots.tags()
    call(spark, warehouse, "compact", table="db.proc")
    call(spark, warehouse, "expire_snapshots", table="db.proc", retain_last=1)
    assert len(t.snapshots.snapshot_ids()) == 1
    assert call(spark, warehouse, "remove_orphan_files", table="db.proc") == []
    with pytest.raises(ValueError):
        call(spark, warehouse, "no_such_proc")


def test_expire_partitions_by_filter(spark, warehouse):
    t = warehouse.create_table("db.expt", "id bigint, dt string", partition_keys=["dt"])
    t.write(
        spark.createDataFrame(
            [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-06-01")], "id bigint, dt string"
        )
    )
    doomed = t.expire_partitions(partition_filter=P.less_than("dt", "2024-02-01"))
    assert sorted(d["dt"] for d in doomed) == ["2024-01-01", "2024-01-02"]
    assert {r.dt for r in t.to_df(spark).collect()} == {"2024-06-01"}
    # nothing matches → no-op, and no implicit expire-everything
    assert t.expire_partitions() == []


def test_expire_snapshots_respects_consumers(spark, warehouse):
    t = warehouse.create_table("db.cons", "id bigint")
    for i in range(5):
        t.write(spark.createDataFrame([(i,)], "id bigint"))
    t.snapshots.write_consumer("slow-reader", 2)
    expired = t.expire_snapshots(retain_last=1)
    assert expired == [1]  # snapshots >= consumer cursor are pinned
    assert t.snapshots.snapshot_ids() == [2, 3, 4, 5]


def test_mark_partition_done(spark, warehouse):
    t = warehouse.create_table("db.mark", "id bigint, dt string", partition_keys=["dt"])
    t.write(spark.createDataFrame([(1, "d1")], "id bigint, dt string"))
    t.mark_partition_done({"dt": "d1"})
    assert t.done_partitions() == [{"dt": "d1"}]


def test_variant_access_on_json(spark):
    df = spark.createDataFrame(
        [(1, '{"a": 5, "b": {"c": "x"}}')], "id bigint, props string"
    ).select("id", F.parse_json("props").alias("v"))
    [r] = df.select(
        F.variant_get("v", "$.a", "int").alias("a"),
        F.variant_get("v", "$.b.c", "string").alias("c"),
    ).collect()
    assert r.a == 5 and r.c == "x"


def test_tag_maintenance_procedures(spark, warehouse, dim):
    from flink_table_store_spark.snapshot import now_millis

    cat = warehouse
    call(spark, cat, "create_tag", table="db.dim", tag="t1")
    call(spark, cat, "rename_tag", table="db.dim", tag="t1", target_tag="t2")
    assert "t2" in dim.snapshots.tags() and "t1" not in dim.snapshots.tags()
    dim.write(spark.createDataFrame([(100, "new")], "k bigint, name string"))
    call(spark, cat, "replace_tag", table="db.dim", tag="t2")  # repoint to latest
    assert dim.snapshots.tag("t2").id == dim.snapshots.latest_id()
    call(spark, cat, "create_tag_from_timestamp", table="db.dim", tag="t3", timestamp=now_millis() + 1000)
    assert dim.snapshots.tag("t3").id == dim.snapshots.latest_id()
    expired = call(spark, cat, "expire_tags", table="db.dim", older_than=now_millis() + 10_000)
    assert set(expired) == {"t2", "t3"} and dim.snapshots.tags() == {}


def test_repair_and_purge_procedures(spark, warehouse, dim):
    import os

    cat = warehouse
    # manually delete one data file -> remove_unexisting_files repairs
    snap = dim.snapshots.latest()
    entries = dim.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    victim = entries[0]
    os.unlink(os.path.join(dim.path, victim.file_name))
    missing = call(spark, cat, "remove_unexisting_files", table="db.dim", dry_run=True)
    assert missing == [victim.file_name]
    call(spark, cat, "remove_unexisting_files", table="db.dim")
    # table still readable, shorter by the dropped file's rows
    assert dim.to_df(spark).count() == 20 - victim.row_count
    # compact_manifest folds into a single base manifest list
    s = call(spark, cat, "compact_manifest", table="db.dim")
    assert s.delta_manifest_list is None and dim.to_df(spark).count() == 20 - victim.row_count
    # purge_files truncates
    call(spark, cat, "purge_files", table="db.dim")
    assert dim.to_df(spark).count() == 0


def test_rollback_to_watermark(spark, warehouse):
    t = warehouse.create_table("db.wm", "k bigint, v string", primary_keys=["k"])
    t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"), watermark=100)
    t.write(spark.createDataFrame([(2, "b")], "k bigint, v string"), watermark=200)
    t.write(spark.createDataFrame([(3, "c")], "k bigint, v string"), watermark=300)
    call(spark, warehouse, "rollback_to_watermark", table="db.wm", watermark=250)
    assert t.to_df(spark).count() == 2


def test_compact_database_procedure(spark, warehouse):
    from flink_table_store_spark.procedures import call

    for n in ("db.cdb1", "db.cdb2"):
        t = warehouse.create_table(n, "k bigint, v string", primary_keys=["k"], options={"bucket": "1"})
        t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))
        t.write(spark.createDataFrame([(2, "b")], "k bigint, v string"))
    out = call(spark, warehouse, "compact_database", databases="db")
    assert "db.cdb1" in out and "db.cdb2" in out
    for n in ("db.cdb1", "db.cdb2"):
        t = warehouse.get_table(n)
        assert t.snapshots.latest().commit_kind == "COMPACT"
        assert t.to_df(spark).count() == 2


def test_trigger_tag_automatic_creation(spark, warehouse):
    from flink_table_store_spark.procedures import call

    t = warehouse.create_table(
        "db.autotag",
        "k bigint, v string",
        primary_keys=["k"],
        options={
            "bucket": "1",
            "tag.automatic-creation": "process-time",
            "tag.creation-period": "daily",
            "tag.num-retained-max": "5",
        },
    )
    t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    created = call(spark, warehouse, "trigger_tag_automatic_creation", table="db.autotag")
    assert len(created) == 1 and created[0].count("-") == 2  # YYYY-MM-dd
    t = t.refresh()
    assert created[0] in t.snapshots.tags()
    # idempotent within the same period
    assert call(spark, warehouse, "trigger_tag_automatic_creation", table="db.autotag") == []
    # disabled mode is a no-op
    t2 = warehouse.create_table("db.autotag2", "k bigint", primary_keys=["k"], options={"bucket": "1"})
    t2.write(spark.createDataFrame([(1,)], "k bigint"))
    assert call(spark, warehouse, "trigger_tag_automatic_creation", table="db.autotag2") == []


def test_tag_retention_spares_user_tags(spark, warehouse):
    """ADVICE r2: tag.num-retained-max pruning must only delete tags that
    match this table's exact period-formatter pattern — a user tag like
    '2024-backup' starts with a digit but is NOT auto-created."""
    from flink_table_store_spark.procedures import call

    t = warehouse.create_table(
        "db.autotag3",
        "k bigint, v string",
        primary_keys=["k"],
        options={
            "bucket": "1",
            "tag.automatic-creation": "process-time",
            "tag.creation-period": "daily",
            "tag.num-retained-max": "1",
        },
    )
    t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    t = t.refresh()
    t.create_tag("2024-backup", snapshot_id=1)      # user tag, digit-leading
    t.create_tag("2001-01-01 07", snapshot_id=1)    # hourly spelling ≠ daily fmt
    t.create_tag("2001-01-01", snapshot_id=1)       # old auto-style daily tag
    t.create_tag("2001-01-02", snapshot_id=1)       # old auto-style daily tag
    call(spark, warehouse, "trigger_tag_automatic_creation", table="db.autotag3")
    t = t.refresh()
    tags = set(t.snapshots.tags())
    assert "2024-backup" in tags
    assert "2001-01-01 07" in tags
    # only the exact-daily-pattern tags were pruned down to max 1
    assert len([n for n in tags if len(n) == 10 and n[4] == "-"]) == 1


@pytest.mark.slow
def test_expire_keeps_changelog_of_consumer_pinned_snapshots(spark, warehouse):
    """ConsumerManager.java:44-70 contract for CHANGELOG files: a lagging
    consumer pins its cursor's snapshots, and expiry must keep those
    snapshots' changelog parquets readable — the consumer still has to
    stream them."""
    import glob
    import os

    t = warehouse.create_table(
        "db.conscl",
        "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "1", "changelog-producer": "lookup"},
    )
    for i in range(5):
        t.write(spark.createDataFrame([(1, f"v{i}")], "k bigint, v string"))
    t = t.refresh()
    before = set(glob.glob(os.path.join(t.path, "changelog", "*.parquet")))
    assert before, "lookup producer must have persisted changelog files"
    t.snapshots.write_consumer("lagging", 2)
    t.expire_snapshots(retain_last=1)
    # snapshots >= 2 are pinned; their changelog files must survive
    surviving = set(glob.glob(os.path.join(t.path, "changelog", "*.parquet")))
    pinned = {p for p in before if any(f"-s{sid}-" in p for sid in (2, 3, 4, 5))}
    assert pinned <= surviving
    # the stream from the consumer's cursor still replays
    from flink_table_store_spark.streaming.changelog import persisted_changelog

    total = 0
    for sid in (2, 3, 4, 5):
        df = persisted_changelog(spark, t, sid)
        if df is not None:
            total += df.count()
    assert total > 0


def test_partial_lookup_table_caches_buckets(spark, dim):
    """VERDICT r3 task 5 (PrimaryKeyPartialLookupTable.java analogue):
    a second lookup batch over the same keys reads ZERO new files;
    results match the merged read; a new snapshot invalidates."""
    from flink_table_store_spark.operators.lookup import PartialLookupTable

    lt = PartialLookupTable(spark, dim, refresh_interval_sec=0.0)
    batch = [{"k": 1}, {"k": 5}, {"k": 17}, {"k": 99}]
    got1 = lt.lookup_batch(batch)
    assert [r["name"] if r else None for r in got1] == ["n1", "n5", "n17", None]
    opened_after_first = lt.stats["files_opened"]
    assert opened_after_first > 0

    got2 = lt.lookup_batch(batch)
    assert got2 == got1
    assert lt.stats["files_opened"] == opened_after_first, "second batch must read no new files"
    assert lt.stats["hits"] >= len(batch)

    # a new snapshot invalidates: the updated value is visible
    dim.refresh().write(
        spark.createDataFrame([(5, "NEW")], "k bigint, name string")
    )
    assert lt.lookup({"k": 5})["name"] == "NEW"
    assert lt.stats["files_opened"] > opened_after_first


def test_partial_lookup_rejects_dynamic_bucket(spark, warehouse):
    from flink_table_store_spark.operators.lookup import PartialLookupTable

    t = warehouse.create_table(
        "db.dyn_dim", "k bigint, v string", primary_keys=["k"], options={"bucket": "-1"}
    )
    with pytest.raises(RuntimeError, match="fixed-bucket"):
        PartialLookupTable(spark, t)


def test_lookup_join_partial_no_broadcast(spark, dim):
    """Lookup join for dims too big to broadcast: probe shuffles on the
    dim's bucket function; tasks read only their buckets; no dim-side
    scan or broadcast in the plan; executor bucket cache reused."""
    from flink_table_store_spark.operators.lookup import lookup_join_partial

    facts = spark.createDataFrame(
        [(1, 10.0), (5, 50.0), (17, 2.0), (99, 0.0)], "k bigint, amt double"
    )
    got = lookup_join_partial(spark, facts, dim, on=[("k", "k")])
    rows = {r.k: (r.amt, r.name) for r in got.collect()}
    assert rows == {1: (10.0, "n1"), 5: (50.0, "n5"), 17: (2.0, "n17"), 99: (0.0, None)}
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" not in plan

    inner = lookup_join_partial(spark, facts, dim, on=[("k", "k")], how="inner")
    assert sorted(r.k for r in inner.collect()) == [1, 5, 17]

    # updated snapshot is visible on the next call (token changes)
    dim.refresh().write(
        spark.createDataFrame([(5, "NEW")], "k bigint, name string")
    )
    got2 = lookup_join_partial(spark, facts, dim.refresh(), on=[("k", "k")])
    assert {r.k: r.name for r in got2.collect()}[5] == "NEW"


def test_lookup_join_partial_key_collision_and_int_nulls(spark, warehouse):
    """Probe column named like the dim PK must not suffix-collide, and a
    missed lookup's integer output column stays a NULL bigint."""
    from flink_table_store_spark.operators.lookup import lookup_join_partial

    d = warehouse.create_table(
        "db.dim_int", "k bigint, score bigint", primary_keys=["k"], options={"bucket": "2"}
    )
    big = (1 << 53) + 7
    d.write(spark.createDataFrame([(1, big), (2, None)], "k bigint, score bigint"))
    probe = spark.createDataFrame([(1,), (2,), (42,)], "k bigint")
    out = lookup_join_partial(spark, probe, d.refresh(), on=[("k", "k")])
    rows = {r.k: r.score for r in out.collect()}
    assert rows == {1: big, 2: None, 42: None}
    assert dict(out.dtypes)["score"] == "bigint"


def test_lookup_join_partial_cache_shape_and_type_cast(spark, warehouse):
    """Review findings: (a) same-snapshot calls with different
    right_cols must not reuse an incompatible cached frame; (b) an int
    probe against a bigint dim key hashes with the DIM type, so rows
    route to the right bucket."""
    from flink_table_store_spark.operators.lookup import lookup_join_partial

    d = warehouse.create_table(
        "db.dim_shape",
        "k bigint, a string, b string",
        primary_keys=["k"],
        options={"bucket": "2"},
    )
    d.write(
        spark.createDataFrame([(i, f"a{i}", f"b{i}") for i in range(8)], "k bigint, a string, b string")
    )
    d = d.refresh()
    # int (not bigint) probe keys — must still match via dim-typed hash
    probe = spark.createDataFrame([(1,), (5,)], "k int")
    r1 = lookup_join_partial(spark, probe, d, on=[("k", "k")], right_cols=["a"])
    assert {r.k: r.a for r in r1.collect()} == {1: "a1", 5: "a5"}
    # same snapshot, different selection: fresh frame, not the cached one
    r2 = lookup_join_partial(spark, probe, d, on=[("k", "k")], right_cols=["b"])
    assert {r.k: r.b for r in r2.collect()} == {1: "b1", 5: "b5"}
