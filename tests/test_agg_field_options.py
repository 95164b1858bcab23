"""Per-field aggregation options: ``fields.<f>.distinct`` (collect +
listagg, FieldCollectAgg/FieldListaggAgg), ``fields.<f>.
list-agg-delimiter`` (CoreOptions LIST_AGG_DELIMITER) and ``fields.<f>.
count-limit`` (FieldNestedUpdateAgg; aggregation.md:311). Checked on
the Spark merge path AND the in-task pandas twin (local read)."""

from __future__ import annotations


import pytest
@pytest.mark.slow
def test_listagg_delimiter_and_distinct(spark, warehouse):
    t = warehouse.create_table(
        "db.aglist", "k int, tags string, plain string",
        primary_keys=["k"],
        options={
            "merge-engine": "aggregation",
            "fields.tags.aggregate-function": "listagg",
            "fields.tags.list-agg-delimiter": "|",
            "fields.tags.distinct": "true",
            "fields.plain.aggregate-function": "listagg",
        },
    )
    ddl = "k int, tags string, plain string"
    t.write(spark.createDataFrame([(1, "a|b", "x")], ddl))
    t.refresh().write(spark.createDataFrame([(1, "b|c", "y")], ddl))
    t.refresh().write(spark.createDataFrame([(1, "a", "x")], ddl))
    [r] = t.refresh().to_df(spark).collect()
    assert r.tags == "a|b|c"  # first occurrences, custom delimiter
    assert r.plain == "x,y,x"  # default comma, no dedup
    [lr] = t.refresh().to_arrow().to_pylist()
    assert (lr["tags"], lr["plain"]) == ("a|b|c", "x,y,x")


def test_collect_distinct_option(spark, warehouse):
    t = warehouse.create_table(
        "db.agcoll", "k int, vs array<int>", primary_keys=["k"],
        options={
            "merge-engine": "aggregation",
            "fields.vs.aggregate-function": "collect",
            "fields.vs.distinct": "true",
        },
    )
    ddl = "k int, vs array<int>"
    t.write(spark.createDataFrame([(1, [1, 2])], ddl))
    t.refresh().write(spark.createDataFrame([(1, [2, 3, 1])], ddl))
    [r] = t.refresh().to_df(spark).collect()
    assert sorted(r.vs) == [1, 2, 3]
    [lr] = t.refresh().to_arrow().to_pylist()
    assert sorted(lr["vs"]) == [1, 2, 3]


def test_nested_update_count_limit(spark, warehouse):
    ddl = "k int, rows array<struct<id:int, v:string>>"
    t = warehouse.create_table(
        "db.agnest", ddl, primary_keys=["k"],
        options={
            "merge-engine": "aggregation",
            "fields.rows.aggregate-function": "nested_update",
            "fields.rows.count-limit": "3",
        },
    )
    t.write(spark.createDataFrame([(1, [(1, "a"), (2, "b")])], ddl))
    t.refresh().write(spark.createDataFrame([(1, [(3, "c"), (4, "d")])], ddl))
    [r] = t.refresh().to_df(spark).collect()
    assert [(x.id, x.v) for x in r.rows] == [(1, "a"), (2, "b"), (3, "c")]
    [lr] = t.refresh().to_arrow().to_pylist()
    assert [(x["id"], x["v"]) for x in lr["rows"]] == [(1, "a"), (2, "b"), (3, "c")]


def test_nested_update_keyed_count_limit(spark, warehouse):
    ddl = "k int, rows array<struct<id:int, v:string>>"
    t = warehouse.create_table(
        "db.agnestk", ddl, primary_keys=["k"],
        options={
            "merge-engine": "aggregation",
            "fields.rows.aggregate-function": "nested_update",
            "fields.rows.nested-key": "id",
            "fields.rows.count-limit": "2",
        },
    )
    t.write(spark.createDataFrame([(1, [(1, "a"), (2, "b")])], ddl))
    t.refresh().write(spark.createDataFrame([(1, [(1, "a2"), (3, "c")])], ddl))
    [r] = t.refresh().to_df(spark).collect()
    # keyed dedup first (latest per id, survivors keep their own
    # positions: b@2, a2@3, c@4), then the cap
    assert [(x.id, x.v) for x in r.rows] == [(2, "b"), (1, "a2")]


def test_options_flow_into_partial_update_aggregation(spark, warehouse):
    """The same per-field options compose with aggregation-for-
    partial-update (shared _agg_field_expr dispatch)."""
    ddl = "k int, g int, tags string"
    t = warehouse.create_table(
        "db.aglistpu", ddl, primary_keys=["k"],
        options={
            "merge-engine": "partial-update",
            "fields.g.sequence-group": "tags",
            "fields.tags.aggregate-function": "listagg",
            "fields.tags.list-agg-delimiter": ";",
            "fields.tags.distinct": "true",
        },
    )
    t.write(spark.createDataFrame([(1, 1, "a;b")], ddl))
    t.refresh().write(spark.createDataFrame([(1, 2, "b;c")], ddl))
    t.refresh().write(spark.createDataFrame([(1, None, "zz")], ddl))  # empty group: skipped
    [r] = t.refresh().to_df(spark).collect()
    assert (r.g, r.tags) == (2, "a;b;c")
    [lr] = t.refresh().to_arrow().to_pylist()
    assert (lr["g"], lr["tags"]) == (2, "a;b;c")


def test_nested_partial_update(spark, warehouse):
    """nested_partial_update (FieldNestedPartialUpdateAgg): rows merge
    per nested key with non-null fields overwriting — unlike
    nested_update, a later row with a NULL column keeps the
    accumulated value instead of replacing the whole row."""
    ddl = "k int, rows array<struct<id:int, a:string, b:string>>"
    t = warehouse.create_table(
        "db.agnpu", ddl, primary_keys=["k"],
        options={
            "merge-engine": "aggregation",
            "fields.rows.aggregate-function": "nested_partial_update",
            "fields.rows.nested-key": "id",
        },
    )
    t.write(spark.createDataFrame([(1, [(1, "a1", None), (2, "x", "y")])], ddl))
    t.refresh().write(spark.createDataFrame([(1, [(1, None, "b2")])], ddl))
    [r] = t.refresh().to_df(spark).collect()
    got = sorted([(x.id, x.a, x.b) for x in r.rows])
    assert got == [(1, "a1", "b2"), (2, "x", "y")]
    [lr] = t.refresh().to_arrow().to_pylist()
    lgot = sorted([(x["id"], x["a"], x["b"]) for x in lr["rows"]])
    assert lgot == got
    # survives a full compaction (fold-safe: per-field last-non-null)
    t.refresh().compact(spark, full=True)
    [r] = t.refresh().to_df(spark).collect()
    assert sorted([(x.id, x.a, x.b) for x in r.rows]) == got


def test_nested_partial_update_requires_key(spark, warehouse):
    import pytest as _pytest

    ddl = "k int, rows array<struct<id:int, a:string>>"
    t = warehouse.create_table(
        "db.agnpu2", ddl, primary_keys=["k"],
        options={
            "merge-engine": "aggregation",
            "fields.rows.aggregate-function": "nested_partial_update",
        },
    )
    t.write(spark.createDataFrame([(1, [(1, "a")])], ddl))
    with _pytest.raises(ValueError, match="nested-key"):
        t.to_df(spark).collect()


def test_pu_agg_options_parity_in_bucketed_join(spark, warehouse):
    """Review regression: the pandas bucket fold must apply the same
    collect->collect_distinct rewrite as the Spark expression path, and
    refuse unfoldable partial-update aggregators UPFRONT."""
    import pytest as _pytest

    from flink_table_store_spark.operators.bucketed_join import join_bucketed

    ddl = "k bigint, g int, vs array<int>"
    t = warehouse.create_table(
        "db.agpu_join", ddl, primary_keys=["k"],
        options={
            "bucket": "2",
            "bucket-key": "k",
            "merge-engine": "partial-update",
            "fields.g.sequence-group": "vs",
            "fields.vs.aggregate-function": "collect",
            "fields.vs.distinct": "true",
        },
    )
    t.write(spark.createDataFrame([(1, 1, [1, 2]), (2, 1, [9])], ddl))
    t.refresh().write(spark.createDataFrame([(1, 2, [2, 3])], ddl))
    table_read = {r.k: sorted(r.vs) for r in t.refresh().to_df(spark).collect()}
    assert table_read[1] == [1, 2, 3]  # deduped
    joined = join_bucketed(spark, t.refresh(), t.refresh()).collect()
    join_read = {r.k: sorted(r.vs) for r in joined}
    assert join_read == table_read
    # unfoldable aggregator: loud upfront refusal, not an executor crash
    t2 = warehouse.create_table(
        "db.agpu_join2", "k bigint, g int, h bigint", primary_keys=["k"],
        options={
            "bucket": "2",
            "bucket-key": "k",
            "merge-engine": "partial-update",
            "fields.g.sequence-group": "h",
            "fields.h.aggregate-function": "hll_sketch",
        },
    )
    t2.write(spark.createDataFrame([(1, 1, 5)], "k bigint, g int, h bigint"))
    with _pytest.raises(ValueError, match="cannot fold"):
        join_bucketed(spark, t2.refresh(), t2.refresh()).collect()
