"""Sequence-group retraction (PartialUpdateMergeFunction.java
retractWithSequenceGroup + partial-update.remove-record-on-sequence-
group): a retract (-D or -U) carrying a group sequence retracts that
group's fields; rr-listed groups remove the whole row (for -D only); a
retract with all group sequences null is a NO-OP; a key whose records
are all retracts merges to RowKind.DELETE (meetInsert) and is hidden."""

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


def test_all_retract_key_is_hidden_meet_insert(spark, warehouse):
    """A key whose records are ALL retracts merges to RowKind.DELETE
    (meetInsert stays false, PartialUpdateMergeFunction.java:363) —
    hidden from merged reads even when a group retract carries values."""
    t = _t(warehouse, "pg_meet")
    d = spark.createDataFrame(
        [(1, None, "bX", None, 5, "-U"), (2, None, None, 3, None, "-D")],
        SCH + ", rk string",
    )
    t.write(d, row_kind_col="rk")
    assert t.to_df(spark).count() == 0
    # a later +I makes the key visible, with the retract's group seq
    # still the winner (its value fields stay retracted)
    t.refresh().write(spark.createDataFrame([(1, "a1", "b1", 1, 2)], SCH))
    [r] = t.refresh().to_df(spark).collect()
    assert (r.k, r.a, r.g2) == (1, "a1", 5)
    assert r.b is None  # g2's winning activity is still the -U


def test_update_before_is_group_retract(spark, warehouse):
    """-U routes through retractWithSequenceGroup exactly like -D
    (kv.valueKind().isRetract()): a winning -U nulls the group's value
    fields and advances its sequence; non-group... (there are none
    here) and OTHER groups stay untouched; an rr-listed group does NOT
    drop the row for -U (only -D takes the remove-record path)."""
    t = _t(
        warehouse, "pg_ub",
        extra={"partial-update.remove-record-on-sequence-group": "g2"},
    )
    t.write(spark.createDataFrame([(1, "a1", "b1", 1, 1)], SCH))
    d = spark.createDataFrame(
        [(1, "aCARRIED", "bCARRIED", 2, 2, "-U")], SCH + ", rk string"
    )
    t.write(d, row_kind_col="rk")
    [r] = t.refresh().to_df(spark).collect()
    # both groups retracted (values nulled, NOT the -U's carried
    # values), sequences advanced, row NOT dropped despite g2 being rr
    assert (r.a, r.b, r.g1, r.g2) == (None, None, 2, 2)


def test_update_before_passthrough_compacts_to_level0(spark, warehouse):
    """Regression: universal compaction passes retract keys through
    unfolded; buckets containing -U must land at level 0 like -D ones,
    or the single-run raw-read shortcut would serve the unfolded rows
    VERBATIM (observed: a never-inserted key surfacing with the -U's
    carried values, and merged keys appearing once per input row)."""
    t = warehouse.create_table(
        "db.pg_ucompact", "k bigint, a string, b string, g bigint, c string",
        primary_keys=["k"],
        options={
            "bucket": "2",
            "merge-engine": "partial-update",
            "fields.g.sequence-group": "c",
        },
    )
    wddl = "k bigint, a string, b string, g bigint, c string, rk string"
    t.write(spark.createDataFrame(
        [(4, None, None, 26, None, "-U"), (2, None, None, 5, "c8", "-U")], wddl
    ), row_kind_col="rk")
    t.refresh().write(spark.createDataFrame(
        [(4, "a76", None, 3, "c87", "+I")], wddl), row_kind_col="rk")
    t.refresh().write(spark.createDataFrame(
        [(4, "a1", "b67", 17, "c10", "+I")], wddl), row_kind_col="rk")
    want = [(4, "a1", "b67", 26, None)]
    got = [(r.k, r.a, r.b, r.g, r.c) for r in t.refresh().to_df(spark).collect()]
    assert got == want
    t.refresh().compact(spark, full=False, trigger_runs=2)
    got = [(r.k, r.a, r.b, r.g, r.c) for r in t.refresh().to_df(spark).collect()]
    assert got == want


def test_plain_partial_update_ignores_update_before(spark, warehouse):
    """Without sequence groups, -U hits the reference's silent return
    inside the removeRecordOnDelete branch — its values never land."""
    t = warehouse.create_table(
        "db.pg_plainu", "k bigint, v string", primary_keys=["k"],
        options={"merge-engine": "partial-update"},
    )
    t.write(spark.createDataFrame([(1, "v1")], "k bigint, v string"))
    t.write(spark.createDataFrame(
        [(1, "vCARRIED", "-U"), (2, "only-u", "-U")],
        "k bigint, v string, rk string",
    ), row_kind_col="rk")
    got = {r.k: r.v for r in t.refresh().to_df(spark).collect()}
    assert got == {1: "v1"}  # -U ignored; retract-only key hidden


def test_dedup_update_before_winner_hides_record(spark, warehouse):
    """deduplicate: a -U winner is a retract — DropDeleteReader keeps
    only RowKind.isAdd rows, so the record is hidden until a newer add
    arrives."""
    t = warehouse.create_table(
        "db.pg_dedupu", "k bigint, v string", primary_keys=["k"],
    )
    t.write(spark.createDataFrame([(1, "v1"), (2, "keep")], "k bigint, v string"))
    t.write(spark.createDataFrame(
        [(1, "v1", "-U")], "k bigint, v string, rk string"), row_kind_col="rk")
    got = {r.k: r.v for r in t.refresh().to_df(spark).collect()}
    assert got == {2: "keep"}
    # the +U half arriving restores visibility
    t.refresh().write(spark.createDataFrame(
        [(1, "v2", "+U")], "k bigint, v string, rk string"), row_kind_col="rk")
    got = {r.k: r.v for r in t.refresh().to_df(spark).collect()}
    assert got == {1: "v2", 2: "keep"}
