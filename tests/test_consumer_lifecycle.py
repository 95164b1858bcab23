"""Consumer lifecycle: consumer.expiration-time (ConsumerManager.expire
— stale consumers stop pinning snapshots), consumer.ignore-progress
(scan from the startup mode, not the stored cursor), and pattern-based
clear_consumers (ClearConsumersProcedure)."""

from __future__ import annotations

import os
import time


def test_expire_consumers_by_idle_time(spark, warehouse):
    t = warehouse.create_table("db.cl1", "id bigint")
    for i in range(3):
        t.write(spark.createDataFrame([(i,)], "id bigint"))
    t.snapshots.write_consumer("stale", 1)
    t.snapshots.write_consumer("fresh", 2)
    # age the stale consumer's file mtime
    p = os.path.join(t.snapshots.consumer_dir(), "consumer-stale")
    old = time.time() - 3600
    os.utime(p, (old, old))
    expired = t.snapshots.expire_consumers(older_than_ms=60_000)
    assert expired == ["stale"]
    assert set(t.snapshots.consumers()) == {"fresh"}


def test_stale_consumer_stops_pinning_expire(spark, warehouse):
    t = warehouse.create_table(
        "db.cl2", "id bigint",
        options={"consumer.expiration-time": "1 s"},
    )
    for i in range(5):
        t.write(spark.createDataFrame([(i,)], "id bigint"))
    t.snapshots.write_consumer("old-reader", 1)
    p = os.path.join(t.snapshots.consumer_dir(), "consumer-old-reader")
    past = time.time() - 3600
    os.utime(p, (past, past))
    expired = t.expire_snapshots(retain_last=1)
    # without consumer expiry this would stop at snapshot 1
    assert expired == [1, 2, 3, 4]
    assert t.snapshots.consumers() == {}


def test_clear_consumers_patterns(spark, warehouse):
    t = warehouse.create_table("db.cl3", "id bigint")
    t.write(spark.createDataFrame([(1,)], "id bigint"))
    for cid in ("job-a", "job-b", "etl-1"):
        t.snapshots.write_consumer(cid, 1)
    cleared = t.snapshots.clear_consumers(including="job-.*", excluding="job-b")
    assert cleared == ["job-a"]
    assert set(t.snapshots.consumers()) == {"job-b", "etl-1"}
    cleared = t.snapshots.clear_consumers()
    assert sorted(cleared) == ["etl-1", "job-b"]


def test_clear_consumers_procedure(spark, tmp_path):
    from flink_table_store_spark.catalog import Catalog
    from flink_table_store_spark.sql import SqlSession

    cat = Catalog(str(tmp_path / "wh"))
    s = SqlSession(spark, cat)
    s.sql("CREATE TABLE db.clp (id bigint)")
    t = cat.get_table("db.clp")
    t.write(spark.createDataFrame([(1,)], "id bigint"))
    t.snapshots.write_consumer("myid1-a", 1)
    t.snapshots.write_consumer("other", 1)
    s.sql(
        "CALL sys.clear_consumers(table => 'db.clp', "
        "excludingConsumers => 'myid1.*')"
    )
    assert set(t.snapshots.consumers()) == {"myid1-a"}


def test_consumer_ignore_progress(spark, warehouse):
    from flink_table_store_spark.streaming.source import SnapshotStream

    t = warehouse.create_table("db.cl4", "id bigint")
    for i in range(3):
        t.write(spark.createDataFrame([(i,)], "id bigint"))
    # a previous run left the cursor at snapshot 4 (fully caught up)
    t.snapshots.write_consumer("c1", 4)
    src = SnapshotStream(t, startup_mode="from-snapshot",
                         from_snapshot=1, consumer_id="c1")
    src._resolve_start()
    assert src._next == 4  # resumes by default
    t2 = warehouse.create_table(
        "db.cl5", "id bigint",
        options={"consumer.ignore-progress": "true"},
    )
    for i in range(3):
        t2.write(spark.createDataFrame([(i,)], "id bigint"))
    t2.snapshots.write_consumer("c1", 4)
    src2 = SnapshotStream(t2, startup_mode="from-snapshot",
                          from_snapshot=1, consumer_id="c1")
    src2._resolve_start()
    assert src2._next == 1  # stored cursor ignored, startup mode rules
