"""Cross-partition primary-key update (J5; GlobalIndexAssigner.java:79).

A key whose partition column changes must disappear from its old
partition (retraction via the global key index) and appear in the new
one — and partition-pruned reads must stay consistent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_table_store_spark import predicate as P


def _make(spark, warehouse):
    t = warehouse.create_table(
        "db.users_xp",
        "id bigint, name string, region string",
        partition_keys=["region"],
        primary_keys=["id"],
        options={"bucket": "2", "cross-partition-update": "true"},
    )
    # cross-partition mode must NOT fold partition keys into the PK
    assert t.schema.primary_keys == ["id"]
    return t


def test_key_moves_partition(spark, warehouse):
    t = _make(spark, warehouse)
    rows = lambda data: spark.createDataFrame(data, "id bigint, name string, region string")
    t.write(rows([(1, "ada", "eu"), (2, "bob", "us"), (3, "eve", "eu")]))
    t = t.refresh()
    assert t.to_df(spark).count() == 3

    # key 1 moves eu → us; key 2 updates in place
    t.write(rows([(1, "ada2", "us"), (2, "bob2", "us")]))
    t = t.refresh()

    got = {r["id"]: (r["name"], r["region"]) for r in t.to_df(spark).collect()}
    assert got == {1: ("ada2", "us"), 2: ("bob2", "us"), 3: ("eve", "eu")}

    # partition-pruned reads see the move (no stale row in eu)
    eu = t.to_df(spark, predicate=P.equal("region", "eu")).collect()
    assert [r["id"] for r in eu] == [3]
    us = {r["id"] for r in t.to_df(spark, predicate=P.equal("region", "us")).collect()}
    assert us == {1, 2}


def test_batch_internal_last_wins_and_compaction(spark, warehouse):
    t = _make(spark, warehouse)
    rows = lambda data: spark.createDataFrame(data, "id bigint, name string, region string")
    # same key twice in one batch: the LAST occurrence wins
    t.write(rows([(7, "v1", "eu"), (7, "v2", "ap")]))
    t = t.refresh()
    got = t.to_df(spark).collect()
    assert [(r["id"], r["name"], r["region"]) for r in got] == [(7, "v2", "ap")]

    # move again, then compact — merged result must survive compaction
    t.write(rows([(7, "v3", "eu")]))
    t = t.refresh()
    t.compact(spark, full=True)
    t = t.refresh()
    got = t.to_df(spark).collect()
    assert [(r["id"], r["name"], r["region"]) for r in got] == [(7, "v3", "eu")]
    assert t.to_df(spark, predicate=P.equal("region", "ap")).count() == 0
