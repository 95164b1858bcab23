"""Column DEFAULT values (reference DataField.defaultValue, docs
spark/default-value.md): NULL inputs substitute the default at WRITE
time, on every writer; maintenance rewrites never touch stored nulls."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark import predicate as P

SCHEMA = "a bigint, b string, c int"


def test_defaults_from_table_properties(spark, warehouse):
    t = warehouse.create_table(
        "db.d1", SCHEMA,
        options={
            "fields.b.default-value": "'my_value'",
            "fields.c.default-value": "5",
        },
    )
    t.write(spark.createDataFrame(
        [(1, None, None), (2, "x", 7)], SCHEMA))
    got = sorted((r.a, r.b, r.c) for r in t.to_df(spark).collect())
    assert got == [(1, "my_value", 5), (2, "x", 7)]


def test_sql_insert_and_alter_default(spark, warehouse):
    from flink_table_store_spark import SqlSession

    s = SqlSession(spark, warehouse)
    s.sql("CREATE TABLE db.d2 (a BIGINT, b STRING, c INT)")
    s.sql("ALTER TABLE db.d2 ALTER COLUMN b SET DEFAULT 'fallback'")
    s.sql("INSERT INTO db.d2 VALUES (1, NULL, NULL)")
    got = s.sql("SELECT * FROM db.d2").collect()
    assert [(r.a, r.b, r.c) for r in got] == [(1, "fallback", None)]
    # DROP DEFAULT: later nulls stay null
    s.sql("ALTER TABLE db.d2 ALTER COLUMN b DROP DEFAULT")
    s.sql("INSERT INTO db.d2 VALUES (2, NULL, NULL)")
    got = {r.a: r.b for r in s.sql("SELECT * FROM db.d2").collect()}
    assert got == {1: "fallback", 2: None}


def test_expression_default_and_evolution(spark, warehouse):
    t = warehouse.create_table("db.d3", SCHEMA)
    t.write(spark.createDataFrame([(1, None, None)], SCHEMA))
    t.evolve_schema([
        {"action": "update_column_default", "name": "c", "value": "2 + 3"}
    ])
    t2 = warehouse.get_table("db.d3")
    t2.write(spark.createDataFrame([(2, None, None)], SCHEMA))
    got = {r.a: r.c for r in t2.to_df(spark).collect()}
    # the pre-default null is NOT rewritten; the new write gets 5
    assert got == {1: None, 2: 5}
    # compaction must not resurrect defaults into old nulls
    t2.compact(spark, full=True)
    got = {r.a: r.c for r in warehouse.get_table("db.d3").to_df(spark).collect()}
    assert got == {1: None, 2: 5}


def test_pk_upsert_with_default(spark, warehouse):
    t = warehouse.create_table(
        "db.d4", SCHEMA, primary_keys=["a"],
        options={"bucket": "2", "fields.b.default-value": "'dflt'"},
    )
    t.write(spark.createDataFrame([(1, None, 1), (2, "x", 2)], SCHEMA))
    t.write(spark.createDataFrame([(2, None, 20)], SCHEMA))  # upsert
    got = sorted((r.a, r.b, r.c) for r in t.to_df(spark).collect())
    assert got == [(1, "dflt", 1), (2, "dflt", 20)]


def test_partial_update_refuses_defaults(spark, warehouse):
    t = warehouse.create_table(
        "db.d5", SCHEMA, primary_keys=["a"],
        options={
            "bucket": "1", "merge-engine": "partial-update",
            "fields.b.default-value": "'x'",
        },
    )
    with pytest.raises(ValueError, match="merge-engine"):
        t.write(spark.createDataFrame([(1, "a", 1)], SCHEMA))


def test_local_writer_literal_defaults(spark, warehouse):
    import pyarrow as pa

    t = warehouse.create_table(
        "db.d6", SCHEMA,
        options={"fields.c.default-value": "9", "fields.b.default-value": "'L'"},
    )
    t.write_arrow(pa.table({"a": [1, 2], "b": ["q", None], "c": [None, 3]}))
    got = sorted((r["a"], r["b"], r["c"]) for r in t.to_arrow().to_pylist())
    assert got == [(1, "q", 9), (2, "L", 3)]
    # non-literal default refuses on the no-Spark path
    t.evolve_schema([
        {"action": "update_column_default", "name": "c", "value": "2 + 3"}
    ])
    t2 = warehouse.get_table("db.d6")
    with pytest.raises(ValueError, match="plain literal"):
        t2.write_arrow(pa.table({"a": [3], "b": [None], "c": [None]}))
    # ...but the Spark writer evaluates it fine
    t2.write(spark.createDataFrame([(3, None, None)], SCHEMA))
    got = {r.a: (r.b, r.c) for r in t2.to_df(spark).collect()}
    assert got[3] == ("L", 5)
