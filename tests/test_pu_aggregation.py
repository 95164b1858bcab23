"""Aggregation for partial-update + multi-field sequence groups
(docs/content/primary-key-table/merge-engine/partial-update.md:150-263;
PartialUpdateMergeFunction.updateWithSequenceGroup agg/aggReversed,
getAggFuncName validation). The three doc examples are asserted
verbatim. Order-dependent aggregators under OUT-OF-ORDER group versions
are path-dependent in the reference (the pairwise agg/aggReversed fold
depends on compaction timing); this engine uses the materialization-
independent sorted-(version, seq) fold, identical for in-order streams
— the same documented stance as sequence.field partial folds."""

from __future__ import annotations

import pytest

S = "k int, a int, b int, c int, d int"


@pytest.mark.slow
def test_doc_example_agg_for_partial_update(spark, warehouse):
    """partial-update.md:156-183 — first_value + sum, exact output."""
    t = warehouse.create_table(
        "db.pua1", S, primary_keys=["k"],
        options={
            "merge-engine": "partial-update",
            "fields.a.sequence-group": "b",
            "fields.b.aggregate-function": "first_value",
            "fields.c.sequence-group": "d",
            "fields.d.aggregate-function": "sum",
        },
    )
    for row in [(1, 1, 1, None, None), (1, None, None, 1, 1),
                (1, 2, 2, None, None), (1, None, None, 2, 2)]:
        t.refresh().write(spark.createDataFrame([row], S))
    [r] = t.refresh().to_df(spark).collect()
    assert tuple(r) == (1, 2, 1, 2, 3)
    # local no-Spark read parity
    [lr] = t.refresh().to_arrow().to_pylist()
    assert (lr["k"], lr["a"], lr["b"], lr["c"], lr["d"]) == (1, 2, 1, 2, 3)


def test_doc_example_multi_field_group(spark, warehouse):
    """partial-update.md:186-228 — fields.g_1,g_3.sequence-group with a
    sum aggregate; both intermediate and final outputs exact."""
    ddl = "k int, a int, b int, g_1 int, c string, g_2 int, g_3 int"
    t = warehouse.create_table(
        "db.pua2", ddl, primary_keys=["k"],
        options={
            "merge-engine": "partial-update",
            "fields.a.aggregate-function": "sum",
            "fields.g_1,g_3.sequence-group": "a",
            "fields.g_2.sequence-group": "c",
        },
    )
    t.write(spark.createDataFrame([(1, 1, 1, 1, "1", 1, 1)], ddl))
    t.refresh().write(
        spark.createDataFrame([(1, 2, 2, 2, "2", None, 2)], ddl))
    [r] = t.refresh().to_df(spark).collect()
    assert tuple(r) == (1, 3, 2, 2, "1", 1, 2)  # g_2 null: c kept
    t.refresh().write(spark.createDataFrame([(1, 3, 3, 2, "3", 3, 1)], ddl))
    [r] = t.refresh().to_df(spark).collect()
    # a sums even for the losing (2,1) version (aggReversed); g_1,g_3
    # keep the winning (2,2) pair
    assert tuple(r) == (1, 6, 3, 2, "3", 3, 2)
    [lr] = t.refresh().to_arrow().to_pylist()
    assert tuple(lr[c] for c in ["k", "a", "b", "g_1", "c", "g_2", "g_3"]) == (
        1, 6, 3, 2, "3", 3, 2)


def test_doc_example_default_aggregate_function(spark, warehouse):
    """partial-update.md:240-263 — fields.default-aggregate-function."""
    t = warehouse.create_table(
        "db.pua3", S, primary_keys=["k"],
        options={
            "merge-engine": "partial-update",
            "fields.a.sequence-group": "b",
            "fields.c.sequence-group": "d",
            "fields.default-aggregate-function": "last_non_null_value",
            "fields.d.aggregate-function": "sum",
        },
    )
    for row in [(1, 1, 1, None, None), (1, None, None, 1, 1),
                (1, 2, 2, None, None), (1, None, None, 2, 2)]:
        t.refresh().write(spark.createDataFrame([row], S))
    [r] = t.refresh().to_df(spark).collect()
    assert tuple(r) == (1, 2, 2, 2, 3)


def test_agg_function_requires_sequence_group(spark, warehouse):
    """getAggFuncName: any aggregator other than last_non_null_value on
    a field outside every sequence group is refused."""
    t = warehouse.create_table(
        "db.pua4", "k int, a int, g int, x int", primary_keys=["k"],
        options={
            "merge-engine": "partial-update",
            "fields.g.sequence-group": "a",
            "fields.x.aggregate-function": "sum",
        },
    )
    t.write(spark.createDataFrame([(1, 1, 1, 1)], "k int, a int, g int, x int"))
    with pytest.raises(ValueError, match="sequence group"):
        t.to_df(spark).collect()


def test_agg_retract_subtracts(spark, warehouse):
    """A retract (-D) whose group sequence is non-null RETRACTS the
    aggregated field (winning or not) instead of nulling it; the group
    sequence still advances only for winners."""
    ddl = "k int, g int, total int"
    t = warehouse.create_table(
        "db.pua5", ddl, primary_keys=["k"],
        options={
            "merge-engine": "partial-update",
            "fields.g.sequence-group": "total",
            "fields.total.aggregate-function": "sum",
        },
    )
    w = ddl + ", rk string"
    t.write(spark.createDataFrame(
        [(1, 1, 10, "+I"), (1, 2, 5, "+I")], w), row_kind_col="rk")
    t.refresh().write(spark.createDataFrame(
        [(1, 1, 10, "-D")], w), row_kind_col="rk")  # losing version: still retracts
    [r] = t.refresh().to_df(spark).collect()
    assert (r.g, r.total) == (2, 5)
    [lr] = t.refresh().to_arrow().to_pylist()
    assert (lr["g"], lr["total"]) == (2, 5)


def test_agg_empty_group_rows_do_not_contribute(spark, warehouse):
    """isEmptySequenceGroup: a row whose group sequence is NULL never
    reaches the group's aggregator, even when the value is non-null."""
    ddl = "k int, g int, total int"
    t = warehouse.create_table(
        "db.pua6", ddl, primary_keys=["k"],
        options={
            "merge-engine": "partial-update",
            "fields.g.sequence-group": "total",
            "fields.total.aggregate-function": "sum",
        },
    )
    t.write(spark.createDataFrame([(1, 1, 10), (1, None, 99)], ddl))
    [r] = t.refresh().to_df(spark).collect()
    assert (r.g, r.total) == (1, 10)  # the g-less 99 never lands


@pytest.mark.slow
def test_fold_safe_agg_survives_universal_compaction(spark, warehouse):
    """sum is group-fold-safe: universal compaction folds partial sums
    that stay correct against older unmerged runs."""
    ddl = "k bigint, g int, total bigint"
    t = warehouse.create_table(
        "db.pua7", ddl, primary_keys=["k"],
        options={
            "bucket": "2",
            "merge-engine": "partial-update",
            "fields.g.sequence-group": "total",
            "fields.total.aggregate-function": "sum",
        },
    )
    import random
    rng = random.Random(7)
    oracle: dict[int, int] = {}
    gclock: dict[int, int] = {}
    for batch in range(6):
        rows = []
        for k in rng.sample(range(10), 4):
            gclock[k] = gclock.get(k, 0) + 1
            v = rng.randint(1, 100)
            oracle[k] = oracle.get(k, 0) + v
            rows.append((k, gclock[k], v))
        t.refresh().write(spark.createDataFrame(rows, ddl))
        if batch in (2, 4):
            t.refresh().compact(spark, full=False, trigger_runs=2)
    got = {r.k: r.total for r in t.refresh().to_df(spark).collect()}
    assert got == oracle
    local = {r["k"]: r["total"] for r in t.refresh().to_arrow().to_pylist()}
    assert local == oracle


def test_order_dependent_agg_promotes_to_whole_bucket(spark, warehouse):
    """first_value is NOT group-fold-safe (a folded first relabeled
    with the winner's version would lose to older runs it shouldn't):
    fold_supported refuses, compaction promotes to whole-bucket merges,
    and results stay correct."""
    from flink_table_store_spark.operators import merge_engines

    ddl = "k int, g int, first int"
    t = warehouse.create_table(
        "db.pua8", ddl, primary_keys=["k"],
        options={
            "bucket": "1",
            "merge-engine": "partial-update",
            "fields.g.sequence-group": "first",
            "fields.first.aggregate-function": "first_value",
        },
    )
    assert not merge_engines.fold_supported(t.schema)
    t.write(spark.createDataFrame([(1, 1, 10)], ddl))
    t.refresh().write(spark.createDataFrame([(1, 2, 20)], ddl))
    t.refresh().compact(spark, full=False, trigger_runs=2)
    t.refresh().write(spark.createDataFrame([(1, 3, 30)], ddl))
    [r] = t.refresh().to_df(spark).collect()
    assert (r.g, r.first) == (3, 10)


def test_multi_field_group_retract_and_rr(spark, warehouse):
    """A -D winning a MULTI-FIELD group (g1,g2) nulls its value field;
    remove-record-on-sequence-group selects the group by any member
    sequence field."""
    ddl = "k int, g1 int, g2 int, v string"
    t = warehouse.create_table(
        "db.pua9", ddl, primary_keys=["k"],
        options={
            "merge-engine": "partial-update",
            "fields.g1,g2.sequence-group": "v",
        },
    )
    w = ddl + ", rk string"
    t.write(spark.createDataFrame([(1, 1, 5, "x", "+I")], w), row_kind_col="rk")
    # lexicographic: (2, 0) > (1, 5) -> the retract wins
    t.refresh().write(spark.createDataFrame(
        [(1, 2, 0, None, "-D")], w), row_kind_col="rk")
    [r] = t.refresh().to_df(spark).collect()
    assert (r.g1, r.g2, r.v) == (2, 0, None)
    # rr via a member field name
    t2 = warehouse.create_table(
        "db.pua10", ddl, primary_keys=["k"],
        options={
            "merge-engine": "partial-update",
            "fields.g1,g2.sequence-group": "v",
            "partial-update.remove-record-on-sequence-group": "g2",
        },
    )
    t2.write(spark.createDataFrame(
        [(1, 1, 1, "x", "+I"), (2, 1, 1, "y", "+I")], w), row_kind_col="rk")
    t2.refresh().write(spark.createDataFrame(
        [(1, 2, 2, None, "-D")], w), row_kind_col="rk")
    assert {r.k for r in t2.refresh().to_df(spark).collect()} == {2}


def test_duplicate_group_membership_refused(spark, warehouse):
    t = warehouse.create_table(
        "db.pua11", "k int, a int, g1 int, g2 int", primary_keys=["k"],
        options={
            "merge-engine": "partial-update",
            "fields.g1.sequence-group": "a",
            "fields.g2.sequence-group": "a",
        },
    )
    t.write(spark.createDataFrame([(1, 1, 1, 1)], "k int, a int, g1 int, g2 int"))
    with pytest.raises(ValueError, match="repeatedly"):
        t.to_df(spark).collect()
