"""Snapshot expiry reclaims data files (ExpireSnapshotsImpl analogue):
newly-unreferenced files are computed from the expired snapshots' delta
manifests — O(expired commits) — and deleted at expire time; tags and
branches protect their references."""

from __future__ import annotations

import pytest

# r12 fast-tier split: this module is SLOW-tier (long fuzz loops /
# integration matrices); run `-m ""` for the full suite.
pytestmark = pytest.mark.slow
import os

from flink_table_store_spark import predicate as P


def _data_files(t) -> set[str]:
    out = set()
    for dirpath, _d, files in os.walk(os.path.join(t.path, "data")):
        for fn in files:
            if not fn.endswith(".index"):
                out.add(os.path.relpath(os.path.join(dirpath, fn), t.path))
    return out


def test_expire_reclaims_compacted_away_files(spark, warehouse):
    t = warehouse.create_table(
        "db.exp1", "k bigint, v string", primary_keys=["k"], options={"bucket": "2"}
    )
    for i in range(3):
        t.write(
            spark.createDataFrame(
                [(j, f"v{i}_{j}") for j in range(6)], "k bigint, v string"
            )
        )
    t = t.refresh()
    before = _data_files(t)
    t.compact(spark, full=True)
    t = t.refresh()
    assert _data_files(t) > before - before  # old + new files both on disk

    expired = t.expire_snapshots(retain_last=1)
    assert expired  # snapshots 1..3 gone
    after = _data_files(t)
    # every pre-compaction file was reclaimed at expire time
    assert not (after & before)
    # the table still reads correctly from the survivors
    rows = {(r.k, r.v) for r in t.to_df(spark).collect()}
    assert rows == {(j, f"v2_{j}") for j in range(6)}
    # and a full-tree orphan walk finds nothing left to do
    assert t.remove_orphan_files(dry_run=True, older_than_millis=10**15) == []


def test_remove_orphan_files_distributed_matches_driver(spark, warehouse):
    """spark-mode orphan scan (one manifest scan + parallel listing +
    anti-join) finds exactly what the driver walk finds."""
    t = warehouse.create_table(
        "db.orph_dist",
        "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "2", "file-index.bloom-filter.columns": "v"},
    )
    t.write(spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k bigint, v string"))
    t = t.refresh()
    # plant orphans: a fake data file + a fake sidecar
    import os

    bdir = os.path.join(t.path, "data")
    os.makedirs(bdir, exist_ok=True)
    open(os.path.join(bdir, "data-orphan.parquet"), "wb").write(b"x" * 10)
    open(os.path.join(bdir, "data-orphan.parquet.index"), "w").write("{}")

    driver_view = sorted(t.remove_orphan_files(dry_run=True, older_than_millis=10**15))
    spark_view = sorted(t.remove_orphan_files(dry_run=True, spark=spark, older_than_millis=10**15))
    assert driver_view == spark_view
    assert "data/data-orphan.parquet" in spark_view

    t.remove_orphan_files(spark=spark, older_than_millis=10**15)
    assert not os.path.exists(os.path.join(bdir, "data-orphan.parquet"))
    # live files + sidecars untouched, reads green
    assert t.to_df(spark).count() == 10
    assert t.remove_orphan_files(dry_run=True, older_than_millis=10**15) == []


def test_expire_keeps_tagged_references(spark, warehouse):
    t = warehouse.create_table(
        "db.exp2", "k bigint, v string", primary_keys=["k"], options={"bucket": "2"}
    )
    t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    t = t.refresh()
    t.create_tag("v1", snapshot_id=1)
    t.write(spark.createDataFrame([(1, "b")], "k bigint, v string"))
    t = t.refresh()
    t.compact(spark, full=True)
    t = t.refresh()
    t.expire_snapshots(retain_last=1)
    # tag v1 still reads the original state: its files were protected
    tagged = {(r.k, r.v) for r in t.to_df(spark, tag="v1").collect()}
    assert tagged == {(1, "a")}
    assert {(r.k, r.v) for r in t.to_df(spark).collect()} == {(1, "b")}


def test_expire_reclaims_overwritten_partition_files(spark, warehouse):
    t = warehouse.create_table(
        "db.exp3",
        "k bigint, p string",
        partition_keys=["p"],
    )
    t.write(
        spark.createDataFrame([(1, "A"), (2, "B")], "k bigint, p string")
    )
    t = t.refresh()
    before = _data_files(t)
    t.write(
        spark.createDataFrame([(9, "A")], "k bigint, p string"),
        overwrite=True,
        overwrite_partition_filter=P.equal("p", "A"),
    )
    t = t.refresh()
    t.expire_snapshots(retain_last=1)
    after = _data_files(t)
    # partition A's old file was replaced and is now reclaimed;
    # partition B's file was untouched (still live)
    gone = before - after
    assert len(gone) >= 1
    rows = {(r.k, r.p) for r in t.to_df(spark).collect()}
    assert rows == {(9, "A"), (2, "B")}
    assert t.remove_orphan_files(dry_run=True, older_than_millis=10**15) == []


def test_expire_after_rewrite_file_index_keeps_live_files(spark, warehouse):
    """ADVICE r2 (high): rewrite_file_index commits DELETE+ADD of the SAME
    file name in one delta. Expiring past that commit must NOT unlink the
    file — it is still live in every retained snapshot (the reference's
    ExpireSnapshotsImpl skipping-set)."""
    t = warehouse.create_table(
        "db.exp_rewrite",
        "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "1", "file-index.bloom-filter.columns": "v"},
    )
    t.write(
        spark.createDataFrame([(i, f"v{i}") for i in range(20)], "k bigint, v string")
    )
    t = t.refresh()
    t.rewrite_file_index(spark)
    t = t.refresh()
    t.expire_snapshots(retain_last=1)
    # the data file survives and the table is fully readable
    rows = {(r.k, r.v) for r in t.to_df(spark).collect()}
    assert rows == {(i, f"v{i}") for i in range(20)}
    assert t.remove_orphan_files(dry_run=True, older_than_millis=10**15) == []


def test_changelog_outlives_snapshot_expiry(spark, warehouse):
    """Decoupled changelog lifecycle (ExpireChangelogImpl /
    ChangelogManager): with changelog.num-retained.max set, an expired
    snapshot's changelog files survive as changelog/changelog-<id>
    entries and stay streamable; expire_changelogs prunes them by the
    longer changelog retention."""
    import glob

    t = warehouse.create_table(
        "db.cl_decouple",
        "k bigint, v string",
        primary_keys=["k"],
        options={
            "bucket": "1",
            "changelog-producer": "lookup",
            "changelog.num-retained.max": "10",
        },
    )
    for i in range(5):
        t.write(spark.createDataFrame([(1, f"v{i}")], "k bigint, v string"))
    t = t.refresh()
    cl_before = set(glob.glob(os.path.join(t.path, "changelog", "*.parquet")))
    assert cl_before

    t.expire_snapshots(retain_last=1)
    assert t.snapshots.snapshot_ids() == [5]
    # every expired snapshot's changelog was preserved (files + entry)
    assert set(glob.glob(os.path.join(t.path, "changelog", "*.parquet"))) == cl_before
    assert t.snapshots.changelog_entry_ids() == [1, 2, 3, 4]
    # the preserved changelog still replays
    from flink_table_store_spark.streaming.changelog import persisted_changelog

    assert persisted_changelog(spark, t, 2).count() > 0

    # the tighter changelog retention prunes old entries AND their files
    doomed = t.expire_changelogs(retain_last=2)
    assert doomed
    for sid in doomed:
        assert not glob.glob(
            os.path.join(t.path, "changelog", f"changelog-s{sid}-*.parquet")
        )
    assert set(t.snapshots.changelog_entry_ids()) & set(doomed) == set()


def test_changelog_expiry_default_still_reclaims(spark, warehouse):
    """WITHOUT changelog.num-retained.max, expiry reclaims changelog
    files with their snapshots (the r2 behavior stays the default)."""
    import glob

    t = warehouse.create_table(
        "db.cl_coupled",
        "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "1", "changelog-producer": "lookup"},
    )
    for i in range(4):
        t.write(spark.createDataFrame([(1, f"v{i}")], "k bigint, v string"))
    t = t.refresh()
    t.expire_snapshots(retain_last=1)
    for sid in (1, 2, 3):
        assert not glob.glob(
            os.path.join(t.path, "changelog", f"changelog-s{sid}-*.parquet")
        )
    assert t.snapshots.changelog_entry_ids() == []


def test_values_time_partition_expiry(spark, warehouse):
    """partition.expiration-strategy=values-time (manage-partitions.md
    :36-63): expiry compares the time PARSED FROM PARTITION VALUES,
    with partition.timestamp-formatter; unparseable values never
    expire."""
    import time as _time

    t = warehouse.create_table(
        "db.pexp_vt", "k bigint, dt string", partition_keys=["dt"],
        options={
            "partition.expiration-strategy": "values-time",
            "partition.timestamp-formatter": "yyyyMMdd",
        },
    )
    ddl = "k bigint, dt string"
    t.write(spark.createDataFrame(
        [(1, "20200101"), (2, "29990101"), (3, "not-a-date")], ddl))
    now = int(_time.time() * 1000)
    gone = t.expire_partitions(older_than_millis=now)
    assert [p["dt"] for p in gone] == ["20200101"]
    left = {r.dt for r in t.to_df(spark).collect()}
    # future + unparseable partitions survive
    assert left == {"29990101", "not-a-date"}


def test_option_driven_expiration_time(spark, warehouse):
    """partition.expiration-time supplies the cutoff when no explicit
    age is given; update-time strategy (files just written) keeps all."""
    t = warehouse.create_table(
        "db.pexp_opt", "k bigint, dt string", partition_keys=["dt"],
        options={"partition.expiration-time": "7 d",
                 "partition.expiration-strategy": "values-time",
                 "partition.timestamp-formatter": "yyyy-MM-dd"},
    )
    t.write(spark.createDataFrame(
        [(1, "2001-01-01"), (2, "2999-01-01")], "k bigint, dt string"))
    gone = t.expire_partitions()
    assert [p["dt"] for p in gone] == ["2001-01-01"]
    # reference default: option-driven expiry is values-time even with
    # no strategy set — old DATA dates expire despite fresh files
    t2 = warehouse.create_table(
        "db.pexp_ut", "k bigint, dt string", partition_keys=["dt"],
        options={"partition.expiration-time": "7 d"},
    )
    t2.write(spark.createDataFrame([(1, "2001-01-01")], "k bigint, dt string"))
    assert [p["dt"] for p in t2.expire_partitions()] == ["2001-01-01"]
    # forcing update-time keeps the freshly-written partition
    t3 = warehouse.create_table(
        "db.pexp_ut2", "k bigint, dt string", partition_keys=["dt"],
        options={"partition.expiration-time": "7 d",
                 "partition.expiration-strategy": "update-time"},
    )
    t3.write(spark.createDataFrame([(1, "2001-01-01")], "k bigint, dt string"))
    assert t3.expire_partitions() == []


def test_multi_field_timestamp_pattern(spark, warehouse):
    t = warehouse.create_table(
        "db.pexp_mf", "k bigint, y string, d string",
        partition_keys=["y", "d"],
        options={"partition.expiration-strategy": "values-time",
                 "partition.timestamp-pattern": "$y-$d",
                 "partition.timestamp-formatter": "yyyy-MM-dd"},
    )
    import time as _time

    t.write(spark.createDataFrame(
        [(1, "2001", "01-01"), (2, "2999", "01-01")],
        "k bigint, y string, d string"))
    gone = t.expire_partitions(older_than_millis=int(_time.time() * 1000))
    assert [(p["y"], p["d"]) for p in gone] == [("2001", "01-01")]


def test_clean_empty_directories(spark, warehouse):
    """snapshot.clean-empty-directories: an expired partition's dir
    disappears with its last file."""
    import os

    t = warehouse.create_table(
        "db.ced", "k bigint, p string", partition_keys=["p"],
        options={"snapshot.clean-empty-directories": "true"},
    )
    t.write(spark.createDataFrame([(1, "old"), (2, "new")], "k bigint, p string"))
    t.refresh().write(
        spark.createDataFrame([], "k bigint, p string"),
        overwrite=True,
        overwrite_partition_filter=P.equal("p", "old"),
    )
    t = t.refresh()
    t.expire_snapshots(retain_last=1)
    assert not os.path.isdir(os.path.join(t.path, "data", "p=old"))
    assert os.path.isdir(os.path.join(t.path, "data", "p=new"))


def test_partition_expiration_max_num_and_batch(spark, warehouse):
    """partition.expiration-max-num bounds one option-driven run
    (oldest first); batch-size splits the metadata deletes."""
    import time

    t = warehouse.create_table(
        "db.pexn", "k bigint, dt string", partition_keys=["dt"],
        options={
            "partition.expiration-time": "1 d",
            "partition.timestamp-pattern": "$dt",
            "partition.timestamp-formatter": "yyyy-MM-dd",
            "partition.expiration-max-num": "2",
            "partition.expiration-batch-size": "1",
        },
    )
    days = ["2001-01-01", "2001-01-02", "2001-01-03", "2999-01-01"]
    for i, d in enumerate(days):
        t.write(spark.createDataFrame([(i, d)], "k bigint, dt string"))
    before = t.snapshots.latest_id()
    expired = t.expire_partitions()
    assert len(expired) == 2  # capped, oldest values first
    assert {p["dt"] for p in expired} == {"2001-01-01", "2001-01-02"}
    # batch-size=1: one metadata commit per partition
    assert t.snapshots.latest_id() == before + 2
    expired = t.refresh().expire_partitions()
    assert {p["dt"] for p in expired} == {"2001-01-03"}
    left = {r.dt for r in t.refresh().to_df(spark).collect()}
    assert left == {"2999-01-01"}


def test_plan_sort_partition(spark, warehouse):
    """scan.plan-sort-partition: the PLAN's splits come back
    partition-ordered (the reference's contract is on the scan plan;
    row order inside a distributed read is never contractual)."""
    t = warehouse.create_table(
        "db.psp", "k bigint, p string", partition_keys=["p"],
        options={"scan.plan-sort-partition": "true"},
    )
    for p in ["c", "a", "b"]:
        t.write(spark.createDataFrame([(1, p)], "k bigint, p string"))
    plan = t.read_builder().plan()
    order = [e.partition["p"] for e in plan.raw_entries or plan.merge_entries]
    assert order == sorted(order)
    t2 = warehouse.create_table(
        "db.psp2", "k bigint, p string", partition_keys=["p"]
    )
    for p in ["c", "a", "b"]:
        t2.write(spark.createDataFrame([(1, p)], "k bigint, p string"))
    order2 = [
        e.partition["p"]
        for e in (lambda pl: pl.raw_entries or pl.merge_entries)(
            t2.read_builder().plan()
        )
    ]
    assert order2 == ["c", "a", "b"]  # default: commit order


def test_orphan_safety_lag_default(spark, warehouse):
    """remove_orphan_files defaults to the reference's 1-day cutoff
    (OrphanFilesClean.olderThanMillis): a just-staged unreferenced file
    — e.g. an in-flight writer mid-commit — is NOT reaped; an explicit
    future cutoff (or a real day passing) reclaims it."""
    import os
    import time

    t = warehouse.create_table("db.orph_lag", "k bigint")
    t.write(spark.createDataFrame([(1,), (2,)], "k bigint"))
    staged = os.path.join(t.path, "data", "data-inflight.parquet")
    with open(staged, "wb") as f:
        f.write(b"not yet committed")
    assert t.remove_orphan_files() == []  # fresh: protected
    assert os.path.exists(staged)
    # distributed mode honors the same lag
    assert t.remove_orphan_files(spark=spark) == []
    got = t.remove_orphan_files(
        older_than_millis=int(time.time() * 1000) + 60_000
    )
    assert got == [os.path.join("data", "data-inflight.parquet")]
    assert not os.path.exists(staged)


def test_expire_partitions_procedure_args(spark, warehouse):
    """ExpirePartitionsProcedure: expiration_time + timestamp_pattern/
    formatter overrides + max_expires."""
    from flink_table_store_spark import procedures

    t = warehouse.create_table(
        "db.exp_args", "k bigint, dt string", partition_keys=["dt"]
    )
    t.write(spark.createDataFrame(
        [(1, "20200101"), (2, "20200102"), (3, "29990101")],
        "k bigint, dt string",
    ))
    # values-time via compact pattern: two ancient partitions qualify,
    # max_expires keeps only the OLDEST
    out = procedures.call(
        spark, warehouse, "expire_partitions", table="db.exp_args",
        expiration_time="1 d", expire_strategy="values-time",
        timestamp_formatter="yyyyMMdd", max_expires=1,
    )
    assert out == [{"dt": "20200101"}]
    left = {r.dt for r in t.refresh().to_df(spark).collect()}
    assert left == {"20200102", "29990101"}
    # second run expires the next one; the future partition survives
    out = procedures.call(
        spark, warehouse, "expire_partitions", table="db.exp_args",
        expiration_time="1 d", expire_strategy="values-time",
        timestamp_formatter="yyyyMMdd",
    )
    assert out == [{"dt": "20200102"}]
    assert {r.dt for r in t.refresh().to_df(spark).collect()} == {"29990101"}
