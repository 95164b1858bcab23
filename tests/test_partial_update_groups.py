"""Sequence-group -D retraction (PartialUpdateMergeFunction.java
retractWithSequenceGroup + partial-update.remove-record-on-sequence-
group): a -D carrying a group sequence retracts that group's fields;
listed groups remove the whole row; a -D with all group sequences null
stays a whole-row delete."""

from __future__ import annotations

import pytest

DDL = "k bigint, a string, b string, g1 bigint, g2 bigint"
SCH = DDL


def _t(warehouse, name, extra=None):
    opts = {
        "merge-engine": "partial-update",
        "fields.g1.sequence-group": "a",
        "fields.g2.sequence-group": "b",
    }
    opts.update(extra or {})
    return warehouse.create_table(
        f"db.{name}", DDL, primary_keys=["k"], options=opts
    )


def test_group_delete_retracts_only_its_fields(spark, warehouse):
    t = _t(warehouse, "pg1")
    t.write(spark.createDataFrame([(1, "a1", "b1", 1, 1)], SCH))
    # -D with g1 set: retract group g1 (field a), keep b
    d = spark.createDataFrame([(1, None, None, 2, None, "-D")], SCH + ", rk string")
    t.write(d, row_kind_col="rk")
    [r] = t.to_df(spark).collect()
    assert r.a is None  # g1 retracted
    assert r.b == "b1"  # g2 untouched
    assert r.g1 == 2  # retraction advances the group sequence


def test_group_delete_older_than_upsert_loses(spark, warehouse):
    t = _t(warehouse, "pg2")
    t.write(spark.createDataFrame([(1, "a5", None, 5, None)], SCH))
    d = spark.createDataFrame([(1, None, None, 3, None, "-D")], SCH + ", rk string")
    t.write(d, row_kind_col="rk")  # g1=3 < 5: stale retract
    [r] = t.to_df(spark).collect()
    assert r.a == "a5"


def test_remove_record_on_sequence_group(spark, warehouse):
    t = _t(
        warehouse, "pg3",
        extra={"partial-update.remove-record-on-sequence-group": "g1"},
    )
    t.write(spark.createDataFrame(
        [(1, "a1", "b1", 1, 1), (2, "x", "y", 1, 1)], SCH
    ))
    d = spark.createDataFrame([(1, None, None, 2, None, "-D")], SCH + ", rk string")
    t.write(d, row_kind_col="rk")
    rows = {r.k for r in t.to_df(spark).collect()}
    assert rows == {2}  # key 1's whole row removed


def test_all_null_group_seqs_is_noop(spark, warehouse):
    """retractWithSequenceGroup skips empty sequence groups: a -D with
    every group sequence NULL changes nothing (under sequence groups
    there is no whole-row delete path)."""
    t = _t(warehouse, "pg4")
    t.write(spark.createDataFrame([(1, "a1", "b1", 1, 1)], SCH))
    d = spark.createDataFrame([(1, None, None, None, None, "-D")], SCH + ", rk string")
    t.write(d, row_kind_col="rk")
    [r] = t.to_df(spark).collect()
    assert (r.a, r.b) == ("a1", "b1")


def test_unknown_rr_group_refused(spark, warehouse):
    t = _t(
        warehouse, "pg5",
        extra={"partial-update.remove-record-on-sequence-group": "nope"},
    )
    t.write(spark.createDataFrame([(1, "a", "b", 1, 1)], SCH))
    with pytest.raises(ValueError, match="non-sequence-group"):
        t.to_df(spark).collect()


def test_local_merge_parity(spark, warehouse):
    """The in-task pandas merge (local read) matches the Spark plan."""
    t = _t(warehouse, "pg6", extra={"bucket": "2", "bucket-key": "k"})
    t.write(spark.createDataFrame(
        [(i, f"a{i}", f"b{i}", 1, 1) for i in range(8)], SCH
    ))
    d = spark.createDataFrame(
        [(i, None, None, 2, None, "-D") for i in range(0, 8, 2)],
        SCH + ", rk string",
    )
    t.write(d, row_kind_col="rk")
    spark_side = {
        r.k: (r.a, r.b) for r in t.to_df(spark).collect()
    }
    local = {r["k"]: (r["a"], r["b"]) for r in t.to_arrow().to_pylist()}
    assert local == spark_side
    assert spark_side[0] == (None, "b0") and spark_side[1] == ("a1", "b1")


def test_rr_group_local_parity(spark, warehouse):
    t = _t(
        warehouse, "pg7",
        extra={
            "bucket": "2",
            "bucket-key": "k",
            "partial-update.remove-record-on-sequence-group": "g2",
        },
    )
    t.write(spark.createDataFrame(
        [(i, f"a{i}", f"b{i}", 1, 1) for i in range(6)], SCH
    ))
    d = spark.createDataFrame(
        [(i, None, None, None, 2, "-D") for i in (1, 3)],
        SCH + ", rk string",
    )
    t.write(d, row_kind_col="rk")
    spark_side = {r.k for r in t.to_df(spark).collect()}
    local = {r["k"] for r in t.to_arrow().to_pylist()}
    assert local == spark_side == {0, 2, 4, 5}
