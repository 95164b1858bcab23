"""Dynamic bucket mode (S18): key→bucket via persistent hash index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def t(spark, warehouse):
    return warehouse.create_table(
        "db.dyn",
        "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "-1", "dynamic-bucket.target-row-num": "100"},
    )


def _buckets(t):
    snap = t.snapshots.latest()
    return {
        e.bucket
        for e in t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    }


def test_new_keys_fill_buckets_to_target(spark, t):
    t.write(spark.createDataFrame([(i, f"v{i}") for i in range(350)], "k bigint, v string"))
    assert t.to_df(spark).count() == 350
    assert _buckets(t) == {0, 1, 2, 3}  # 350 keys / 100 per bucket


@pytest.mark.slow
def test_existing_keys_keep_their_bucket(spark, t):
    t.write(spark.createDataFrame([(i, "old") for i in range(150)], "k bigint, v string"))
    t.write(spark.createDataFrame([(i, "new") for i in range(100, 250)], "k bigint, v string"))
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    assert len(got) == 250  # upserts dedup — keys did not move buckets
    assert got[120] == "new" and got[20] == "old"


@pytest.mark.slow
def test_growth_appends_buckets(spark, t):
    for start in range(0, 600, 200):
        t.write(
            spark.createDataFrame([(i, "x") for i in range(start, start + 200)], "k bigint, v string")
        )
    assert t.to_df(spark).count() == 600
    assert max(_buckets(t)) >= 5  # 600 keys / 100 target

    # the index survives orphan cleanup
    assert t.remove_orphan_files(older_than_millis=10**15) == []
    t.write(spark.createDataFrame([(1, "y")], "k bigint, v string"))
    assert t.to_df(spark).count() == 600


def test_partitioned_dynamic_bucket(spark, warehouse):
    t = warehouse.create_table(
        "db.dynpt",
        "k bigint, pt string, v double",
        partition_keys=["pt"],
        primary_keys=["pt", "k"],
        options={"bucket": "-1", "dynamic-bucket.target-row-num": "50"},
    )
    df = spark.createDataFrame(
        [(i, f"p{i % 2}", float(i)) for i in range(200)], "k bigint, pt string, v double"
    )
    t.write(df)
    assert t.to_df(spark).count() == 200
    # per-partition assignment: each partition has its own bucket range
    snap = t.snapshots.latest()
    per_pt = {}
    for e in t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list):
        per_pt.setdefault(e.partition["pt"], set()).add(e.bucket)
    assert set(per_pt) == {"p0", "p1"}
    assert all(len(b) == 2 for b in per_pt.values())  # 100 keys / 50 target


def test_initial_buckets_spread_early_keys(spark, warehouse):
    """dynamic-bucket.initial-buckets: first keys round-robin across N
    buckets instead of filling bucket 0 sequentially."""
    t = warehouse.create_table(
        "db.dyninit", "k bigint, v string",
        primary_keys=["k"],
        options={
            "bucket": "-1",
            "dynamic-bucket.target-row-num": "100",
            "dynamic-bucket.initial-buckets": "4",
        },
    )
    t.write(spark.createDataFrame(
        [(i, "v") for i in range(40)], "k bigint, v string"
    ))
    from flink_table_store_spark.operators.dynamic_bucket import load_index

    idx = load_index(spark, t.path)
    buckets = {r.bucket for r in idx.collect()}
    assert buckets == {0, 1, 2, 3}
    assert t.to_df(spark).count() == 40


@pytest.mark.slow
def test_max_buckets_caps_growth(spark, warehouse):
    """dynamic-bucket.max-buckets: new keys overflow into hash%max once
    the cap is reached; existing keys keep their bucket."""
    t = warehouse.create_table(
        "db.dynmax", "k bigint, v string",
        primary_keys=["k"],
        options={
            "bucket": "-1",
            "dynamic-bucket.target-row-num": "5",
            "dynamic-bucket.max-buckets": "2",
        },
    )
    t.write(spark.createDataFrame(
        [(i, "v") for i in range(50)], "k bigint, v string"
    ))
    from flink_table_store_spark.operators.dynamic_bucket import load_index

    idx = load_index(spark, t.path)
    assert {r.bucket for r in idx.collect()} <= {0, 1}
    before = {r.k: r.v for r in t.to_df(spark).collect()}
    assert len(before) == 50
    # updates keep keys in their assigned bucket (no duplicates)
    t.write(spark.createDataFrame(
        [(i, "u") for i in range(50)], "k bigint, v string"
    ))
    after = {r.k: r.v for r in t.to_df(spark).collect()}
    assert len(after) == 50 and set(after.values()) == {"u"}


def test_max_buckets_validation(spark, warehouse):
    import pytest

    t = warehouse.create_table(
        "db.dynbad", "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "-1", "dynamic-bucket.max-buckets": "0"},
    )
    with pytest.raises(ValueError, match="max-buckets"):
        t.write(spark.createDataFrame([(1, "v")], "k bigint, v string"))
