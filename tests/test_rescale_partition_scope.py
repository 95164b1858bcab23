"""Partition-scoped / progressive rescale (RescaleProcedure.java:63-73:
``bucket_num`` optional, ``partitions``/``where`` mutually exclusive).
A mid-rescale table mixes bucket layouts: scans, bucket pruning and
point lookups must stay correct (other-generation entries are
layout-less), bucketed joins refuse loudly until converged."""

from __future__ import annotations

import pytest

from flink_table_store_spark import predicate as P
from flink_table_store_spark import procedures

DDL = "k bigint, v bigint, pt string"


def _t(warehouse, spark, name, **opts):
    t = warehouse.create_table(
        f"db.{name}", DDL, primary_keys=["k", "pt"], partition_keys=["pt"],
        options={"bucket": "2", **opts},
    )
    t.write(spark.createDataFrame(
        [(i, i * 10, p) for i in range(40) for p in ("a", "b")], DDL
    ))
    return t


@pytest.mark.slow
def test_progressive_rescale_reads_stay_correct(spark, warehouse):
    t = _t(warehouse, spark, "rs1")
    want = {(r.k, r.v, r.pt) for r in t.to_df(spark).collect()}
    procedures.call(
        spark, warehouse, "rescale", table="db.rs1", bucket_num=8,
        partitions="pt=a",
    )
    t = t.refresh()
    # mixed layouts: full scan, filtered scan and point lookups all exact
    assert {(r.k, r.v, r.pt) for r in t.to_df(spark).collect()} == want
    got = t.to_df(spark, predicate=P.and_(P.equal("k", 7), P.equal("pt", "b")))
    assert [(r.k, r.pt) for r in got.collect()] == [(7, "b")]
    from flink_table_store_spark.operators.lookup import point_lookup

    # keyed by the trimmed PK: both partitions' rows, INCLUDING the
    # old-layout pt=b one (its files live in another generation's
    # bucket id — dropping them was the pre-fix hole)
    rows = point_lookup(spark, t, {"k": 7})
    assert {(r.pt, r.v) for r in rows} == {("a", 70), ("b", 70)}
    # bucketed join refuses mid-rescale
    from flink_table_store_spark.operators.bucketed_join import join_bucketed

    with pytest.raises(ValueError, match="bucket layout"):
        join_bucketed(spark, t, t).count()
    # converge: re-apply the CURRENT option to the remaining partition
    procedures.call(
        spark, warehouse, "rescale", table="db.rs1", where="pt = 'b'"
    )
    t = t.refresh()
    assert {(r.k, r.v, r.pt) for r in t.to_df(spark).collect()} == want
    # self-join on k: each key matches both partitions -> 40 * 4
    assert join_bucketed(spark, t, t).count() == 160


def test_rescale_args_validation(spark, warehouse):
    _t(warehouse, spark, "rs2")
    with pytest.raises(ValueError, match="cannot be used together"):
        procedures.call(
            spark, warehouse, "rescale", table="db.rs2",
            partitions="pt=a", where="pt = 'b'",
        )
    with pytest.raises(ValueError, match="partition columns"):
        procedures.call(
            spark, warehouse, "rescale", table="db.rs2", where="v = 1"
        )


def test_postpone_rescale_requires_bucket_num(spark, warehouse):
    t = warehouse.create_table(
        "db.rs3", DDL, primary_keys=["k", "pt"], partition_keys=["pt"],
        options={"bucket": "-2", "postpone.bucket-num": "2"},
    )
    t.write(spark.createDataFrame([(i, i, "a") for i in range(10)], DDL))
    with pytest.raises(ValueError, match="resulting bucket number"):
        t.refresh().rescale(spark)
    t.refresh().rescale(spark, num_buckets=4)
    t = t.refresh()
    assert t.schema.options["postpone.bucket-num"] == "4"
    # rows intact, real buckets assigned (no -2 files remain)
    assert t.to_df(spark).count() == 10
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    )
    assert all(e.bucket >= 0 for e in entries)
    # table stays postpone for NEW writes
    t.write(spark.createDataFrame([(99, 99, "a")], DDL))
    assert t.refresh().to_df(spark).count() == 11
