"""sequence.field.sort-order=descending (CoreOptions.java:891-894;
UserDefinedSeqComparator.java): the SMALLEST user version is the newest
record; ties still fall to the later input."""

from __future__ import annotations

import pytest


def _t(warehouse, name, extra=None, ddl="k bigint, v string, ver bigint"):
    opts = {"sequence.field": "ver", "sequence.field.sort-order": "descending"}
    opts.update(extra or {})
    return warehouse.create_table(
        f"db.{name}", ddl, primary_keys=["k"], options=opts
    )


def test_descending_dedup(spark, warehouse):
    t = _t(warehouse, "sd1")
    t.write(spark.createDataFrame(
        [(1, "rank3", 3), (1, "rank1", 1), (2, "b5", 5)],
        "k bigint, v string, ver bigint",
    ))
    t.write(spark.createDataFrame(
        [(1, "rank2", 2), (2, "b9", 9)], "k bigint, v string, ver bigint"
    ))
    rows = {r.k: (r.v, r.ver) for r in t.to_df(spark).collect()}
    # smallest ver wins; a LARGER later write loses
    assert rows == {1: ("rank1", 1), 2: ("b5", 5)}


def test_descending_tie_later_input_wins(spark, warehouse):
    t = _t(warehouse, "sd2")
    t.write(spark.createDataFrame([(1, "first", 7)], "k bigint, v string, ver bigint"))
    t.write(spark.createDataFrame([(1, "second", 7)], "k bigint, v string, ver bigint"))
    [r] = t.to_df(spark).collect()
    assert r.v == "second"


def test_ascending_default_unchanged(spark, warehouse):
    t = warehouse.create_table(
        "db.sd3", "k bigint, v string, ver bigint",
        primary_keys=["k"], options={"sequence.field": "ver"},
    )
    t.write(spark.createDataFrame(
        [(1, "low", 1), (1, "high", 9)], "k bigint, v string, ver bigint"
    ))
    [r] = t.to_df(spark).collect()
    assert r.v == "high"


def test_descending_timestamp_field(spark, warehouse):
    import datetime as dt

    t = _t(warehouse, "sd4", ddl="k bigint, v string, ver timestamp")
    t.write(spark.createDataFrame(
        [
            (1, "late", dt.datetime(2024, 7, 2)),
            (1, "early", dt.datetime(2024, 7, 1)),
        ],
        "k bigint, v string, ver timestamp",
    ))
    [r] = t.to_df(spark).collect()
    assert r.v == "early"


def test_descending_string_field_refused(spark, warehouse):
    t = _t(warehouse, "sd5", ddl="k bigint, v string, ver string")
    t.write(spark.createDataFrame(
        [(1, "a", "x")], "k bigint, v string, ver string"
    ))
    with pytest.raises(ValueError, match="descending"):
        t.to_df(spark).collect()


def test_descending_partial_update(spark, warehouse):
    t = _t(
        warehouse, "sd6",
        extra={"merge-engine": "partial-update"},
        ddl="k bigint, a string, b string, ver bigint",
    )
    t.write(spark.createDataFrame(
        [(1, "a2", None, 2)], "k bigint, a string, b string, ver bigint"
    ))
    t.write(spark.createDataFrame(
        [(1, None, "b1", 1)], "k bigint, a string, b string, ver bigint"
    ))
    [r] = t.to_df(spark).collect()
    # ver=1 is NEWER under descending: b set by the newer row, a kept
    # from the older one (last non-null per field in version order)
    assert (r.a, r.b) == ("a2", "b1")


def test_descending_survives_compaction(spark, warehouse):
    t = _t(warehouse, "sd7")
    t.write(spark.createDataFrame([(1, "v9", 9), (2, "w5", 5)], "k bigint, v string, ver bigint"))
    t.write(spark.createDataFrame([(1, "v3", 3)], "k bigint, v string, ver bigint"))
    t.write(spark.createDataFrame([(1, "v6", 6), (2, "w2", 2)], "k bigint, v string, ver bigint"))
    before = {r.k: r.v for r in t.to_df(spark).collect()}
    t.compact(spark, full=True)
    t = t.refresh()
    after = {r.k: r.v for r in t.to_df(spark).collect()}
    assert before == after == {1: "v3", 2: "w2"}


def test_descending_bucketed_local_merge_parity(spark, warehouse):
    """The in-task pandas merge (bucketed join / local read) follows
    the same reversed order."""
    t = _t(warehouse, "sd8", extra={"bucket": "2", "bucket-key": "k"})
    t.write(spark.createDataFrame(
        [(i, f"v{i % 3}", i % 3) for i in range(20)],
        "k bigint, v string, ver bigint",
    ))
    t.write(spark.createDataFrame(
        [(i, "zz", 10) for i in range(20)], "k bigint, v string, ver bigint"
    ))
    spark_side = {r.k: r.v for r in t.to_df(spark).collect()}
    local = {r["k"]: r["v"] for r in t.to_arrow().to_pylist()}
    assert local == spark_side
    assert all(v != "zz" for v in spark_side.values())  # ver=10 never wins


def test_descending_upsert_key(spark, warehouse):
    t = warehouse.create_table(
        "db.sd9", "k bigint, v string, ver bigint",
        options={
            "upsert-key": "k",
            "sequence.field": "ver",
            "sequence.field.sort-order": "descending",
        },
    )
    t.write(spark.createDataFrame([(1, "v5", 5)], "k bigint, v string, ver bigint"))
    t.write(spark.createDataFrame([(1, "v9", 9)], "k bigint, v string, ver bigint"))
    [r] = t.refresh().to_df(spark).collect()
    assert (r.v, r.ver) == ("v5", 5)  # larger version is OLDER: no replace
    t.refresh().write(spark.createDataFrame([(1, "v2", 2)], "k bigint, v string, ver bigint"))
    [r] = t.refresh().to_df(spark).collect()
    assert (r.v, r.ver) == ("v2", 2)
