"""Option-driven snapshot retention (ExpireSnapshotsImpl.java:44-96;
CoreOptions snapshot.num-retained.min/.max, snapshot.time-retained,
snapshot.expire.limit, snapshot.ignore-empty-commit) and the
post-commit auto-expire hook (TableCommitImpl)."""

from __future__ import annotations

import time

import pytest


def _write_n(spark, t, n, start=0):
    for i in range(start, start + n):
        t.write(spark.createDataFrame([(i,)], "id bigint"))
        time.sleep(0.002)  # strictly increasing snapshot times


def test_option_driven_time_gate(spark, warehouse):
    """Young snapshots never expire even past num-retained.min."""
    t = warehouse.create_table(
        "db.exp1", "id bigint",
        options={"snapshot.num-retained.min": "2"},  # time-retained: 1 h default
    )
    _write_n(spark, t, 5)
    assert t.expire_snapshots() == []
    assert len(t.snapshots.snapshot_ids()) == 5


def test_option_driven_count_and_time(spark, warehouse):
    t = warehouse.create_table(
        "db.exp2", "id bigint",
        options={
            "snapshot.num-retained.min": "2",
            "snapshot.time-retained": "0 ms",
        },
    )
    # the auto-expire hook fires at every commit: by the end, history
    # is already trimmed to num-retained.min
    _write_n(spark, t, 6)
    time.sleep(0.01)
    t.expire_snapshots()
    ids = t.snapshots.snapshot_ids()
    assert len(ids) == 2
    assert ids[-1] == 6  # newest kept


def test_num_retained_max_forces_young_snapshots_out(spark, warehouse):
    t = warehouse.create_table(
        "db.exp3", "id bigint",
        options={
            "snapshot.num-retained.min": "1",
            "snapshot.num-retained.max": "2",
            "snapshot.time-retained": "1 d",  # everything is young
        },
    )
    _write_n(spark, t, 5)
    assert len(t.snapshots.snapshot_ids()) == 2  # auto-expire enforced max


def test_expire_limit_bounds_one_call(spark, warehouse):
    t = warehouse.create_table("db.exp4", "id bigint")
    _write_n(spark, t, 6)
    time.sleep(0.01)
    expired = t.expire_snapshots(
        retain_min=1, retain_max=2**31 - 1, older_than_millis=2**62,
        max_deletes=2,
    )
    assert expired == [1, 2]  # capped at 2 oldest
    expired = t.expire_snapshots(
        retain_min=1, older_than_millis=2**62, max_deletes=100
    )
    assert expired == [3, 4, 5]


def test_retain_min_max_validation(spark, warehouse):
    t = warehouse.create_table("db.exp5", "id bigint")
    _write_n(spark, t, 2)
    with pytest.raises(ValueError, match="retainMax"):
        t.expire_snapshots(retain_min=5, retain_max=2)


def test_consumer_pins_option_driven_expire(spark, warehouse):
    t = warehouse.create_table("db.exp6", "id bigint")
    _write_n(spark, t, 3)
    t.snapshots.write_consumer("reader", 2)
    _write_n(spark, t, 2, start=3)
    time.sleep(0.01)
    t.expire_snapshots(retain_min=1, older_than_millis=2**62)
    assert t.snapshots.snapshot_ids()[0] == 2  # consumer cursor pins


def test_legacy_retain_last_unchanged(spark, warehouse):
    t = warehouse.create_table("db.exp7", "id bigint")
    _write_n(spark, t, 5)
    # young snapshots, but the explicit API form ignores time
    assert t.expire_snapshots(retain_last=2) == [1, 2, 3]


def test_ignore_empty_commit(spark, warehouse):
    t = warehouse.create_table(
        "db.exp8", "id bigint",
        options={"snapshot.ignore-empty-commit": "true"},
    )
    t.write(spark.createDataFrame([(1,)], "id bigint"))
    snap = t.write(spark.createDataFrame([], "id bigint"))
    assert snap.id == 1  # no new snapshot for the empty batch
    assert t.snapshots.snapshot_ids() == [1]
    # default behavior unchanged: empty commits still snapshot
    t2 = warehouse.create_table("db.exp9", "id bigint")
    t2.write(spark.createDataFrame([(1,)], "id bigint"))
    t2.write(spark.createDataFrame([], "id bigint"))
    assert t2.snapshots.snapshot_ids() == [1, 2]
    # commit.force-create-snapshot overrides the ignore
    t3 = warehouse.create_table(
        "db.exp10", "id bigint",
        options={
            "snapshot.ignore-empty-commit": "true",
            "commit.force-create-snapshot": "true",
        },
    )
    t3.write(spark.createDataFrame([(1,)], "id bigint"))
    t3.write(spark.createDataFrame([], "id bigint"))
    assert t3.snapshots.snapshot_ids() == [1, 2]


def test_time_travel_survives_auto_expire_window(spark, warehouse):
    """Snapshots inside the retention window stay time-travelable while
    the hook trims beyond it."""
    t = warehouse.create_table(
        "db.exp11", "id bigint",
        options={
            "snapshot.num-retained.min": "3",
            "snapshot.time-retained": "0 ms",
        },
    )
    _write_n(spark, t, 6)
    ids = t.snapshots.snapshot_ids()
    assert len(ids) == 3
    oldest = ids[0]
    assert t.to_df(spark, snapshot_id=oldest).count() == oldest


def test_expire_snapshots_procedure_forms(spark, tmp_path):
    from flink_table_store_spark.catalog import Catalog
    from flink_table_store_spark.sql import SqlSession

    cat = Catalog(str(tmp_path / "wh"))
    s = SqlSession(spark, cat)
    s.sql("CREATE TABLE db.expp (id bigint)")
    t = cat.get_table("db.expp")
    _write_n(spark, t, 5)
    time.sleep(0.01)
    # reference form: retain_min/older_than
    s.sql(
        "CALL sys.expire_snapshots(table => 'db.expp', retain_min => 3, "
        "older_than => '2099-01-01 00:00:00')"
    )
    assert len(t.snapshots.snapshot_ids()) == 3
    # legacy form still honored
    s.sql("CALL sys.expire_snapshots(table => 'db.expp', retain_last => 1)")
    assert len(t.snapshots.snapshot_ids()) == 1


def test_commit_user_and_knobs(spark, warehouse):
    """Snapshot.commitUser + commit.user-prefix / commit.max-retries
    (Snapshot.java commitUser; CoreOptions commit.*)."""
    t = warehouse.create_table(
        "db.cu", "id bigint",
        options={"commit.user-prefix": "etl-job", "commit.max-retries": "3"},
    )
    assert t.committer.max_retries == 3
    t.write(spark.createDataFrame([(1,)], "id bigint"))
    snap = t.snapshots.latest()
    assert snap.commit_user.startswith("etl-job-")
    [r] = warehouse.read_system(spark, "db.cu$snapshots").collect()
    assert r.commit_user == snap.commit_user


def test_end_input_check_partition_expire(spark, warehouse):
    """end-input.check-partition-expire: a batch write expires
    out-of-lifetime partitions when its input ends."""
    t = warehouse.create_table(
        "db.eipe", "id bigint, dt string", partition_keys=["dt"],
        options={
            "end-input.check-partition-expire": "true",
            "partition.expiration-time": "7 d",
            "partition.timestamp-pattern": "$dt",
            "partition.timestamp-formatter": "yyyy-MM-dd",
        },
    )
    t.write(spark.createDataFrame(
        [(1, "2001-01-01")], "id bigint, dt string"
    ))
    # first write: the ancient partition itself was just written; the
    # expire check runs at THIS write's end and drops it
    t.write(spark.createDataFrame([(2, "2999-01-01")], "id bigint, dt string"))
    dts = {r.dt for r in t.refresh().to_df(spark).collect()}
    assert dts == {"2999-01-01"}
