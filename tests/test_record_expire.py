"""Record-level expire (reference io/RecordLevelExpire.java): rows
whose time field exceeds the TTL drop lazily during compaction."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F


def _mk(spark, warehouse, name, time_type="bigint", **extra_opts):
    t = warehouse.create_table(
        name, f"k bigint, v string, ts {time_type}",
        primary_keys=["k"],
        options={
            "bucket": "1",
            "record-level.expire-time": "1h",
            "record-level.time-field": "ts",
            **extra_opts,
        },
    )
    return t


def test_expired_rows_drop_at_compaction(spark, warehouse):
    t = _mk(spark, warehouse, "db.re")
    now = int(time.time())
    t.write(spark.createDataFrame(
        [(1, "fresh", now), (2, "stale", now - 7200),
         (3, "never", None), (4, "edge", now - 100)],
        "k bigint, v string, ts bigint"))
    # reads BEFORE compaction still show everything (lazy contract)
    assert t.to_df(spark).count() == 4
    t.compact(spark, full=True)
    got = sorted(r.k for r in warehouse.get_table("db.re").to_df(spark).collect())
    assert got == [1, 3, 4]  # stale dropped; NULL time never expires


def test_millis_autodetect_and_timestamp_type(spark, warehouse):
    now_ms = int(time.time() * 1000)
    t = _mk(spark, warehouse, "db.rems")
    t.write(spark.createDataFrame(
        [(1, "fresh", now_ms), (2, "stale", now_ms - 7_200_000)],
        "k bigint, v string, ts bigint"))
    t.compact(spark, full=True)
    assert [r.k for r in warehouse.get_table("db.rems").to_df(spark).collect()] == [1]

    import datetime

    t2 = _mk(spark, warehouse, "db.rets", time_type="timestamp")
    nowdt = datetime.datetime.now()
    t2.write(spark.createDataFrame(
        [(1, "fresh", nowdt), (2, "stale", nowdt - datetime.timedelta(hours=3))],
        "k bigint, v string, ts timestamp"))
    t2.compact(spark, full=True)
    assert [r.k for r in warehouse.get_table("db.rets").to_df(spark).collect()] == [1]


def test_missing_time_field_refused(spark, warehouse):
    t = warehouse.create_table(
        "db.ref", "k bigint, v string", primary_keys=["k"],
        options={"bucket": "1", "record-level.expire-time": "1h"},
    )
    t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    with pytest.raises(ValueError, match="time-field"):
        t.compact(spark, full=True)


def test_upserts_keep_winning_before_expiry(spark, warehouse):
    """An expired OLD version must not resurrect: the merge happens
    first, then expiry applies to the merged winner."""
    t = _mk(spark, warehouse, "db.reu")
    now = int(time.time())
    t.write(spark.createDataFrame(
        [(1, "old", now - 7200)], "k bigint, v string, ts bigint"))
    t.write(spark.createDataFrame(
        [(1, "new", now)], "k bigint, v string, ts bigint"))
    t.compact(spark, full=True)
    got = [(r.k, r.v) for r in warehouse.get_table("db.reu").to_df(spark).collect()]
    assert got == [(1, "new")]
