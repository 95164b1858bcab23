"""rowkind.field (CoreOptions.ROWKIND_FIELD, reference docs/content/
primary-key-table/sequence-rowkind.md:64-75): a data column carries the
changelog kind, so batch CDC backfills land without the CDC connector."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.schema import ROW_KIND

DDL = "k bigint, v string, rk string"


@pytest.fixture()
def rk_table(spark, warehouse):
    return warehouse.create_table(
        "db.rk", DDL, primary_keys=["k"],
        options={"bucket": "2", "rowkind.field": "rk"},
    )


def test_mixed_kinds_batch(spark, rk_table):
    t = rk_table
    t.write(spark.createDataFrame(
        [(1, "a", "+I"), (2, "b", "+I"), (3, "c", "+I")], DDL))
    # a CDC-style backfill batch: update 1, delete 2, insert 4
    t.write(spark.createDataFrame(
        [(1, "a2", "+U"), (2, "b", "-D"), (4, "d", "+I")], DDL))
    got = sorted((r.k, r.v) for r in t.to_df(spark).collect())
    assert got == [(1, "a2"), (3, "c"), (4, "d")]
    # the rowkind column is ordinary data: it survives in the row
    assert {r.rk for r in t.to_df(spark).collect()} <= {"+I", "+U", "-D"}


@pytest.mark.slow
def test_parity_with_cdc_connector_path(spark, warehouse):
    """The same logical events through rowkind.field and through the
    engine's internal ROW_KIND column produce identical tables."""
    events = [(1, "a", "+I"), (2, "b", "+I"), (1, "a2", "+U"),
              (2, "b", "-D"), (3, "c", "+I"), (3, "c2", "+U")]
    ta = warehouse.create_table(
        "db.rk_a", DDL, primary_keys=["k"],
        options={"bucket": "2", "rowkind.field": "rk"},
    )
    for e in events:
        ta.write(spark.createDataFrame([e], DDL))
    tb = warehouse.create_table(
        "db.rk_b", DDL, primary_keys=["k"], options={"bucket": "2"},
    )
    for e in events:
        df = spark.createDataFrame([e], DDL).withColumn(ROW_KIND, F.col("rk"))
        tb.write(df, row_kind_col=ROW_KIND)
    a = sorted(map(tuple, ta.to_df(spark).collect()))
    b = sorted(map(tuple, tb.to_df(spark).collect()))
    assert a == b == [(1, "a2", "+U"), (3, "c2", "+U")]


def test_invalid_kind_fails_loudly(spark, rk_table):
    with pytest.raises(Exception, match="invalid row"):
        rk_table.write(spark.createDataFrame([(9, "x", "DELETE")], DDL))


def test_missing_column_refused(spark, warehouse):
    t = warehouse.create_table(
        "db.rk_m", "k bigint, v string", primary_keys=["k"],
        options={"bucket": "1", "rowkind.field": "rk"},
    )
    with pytest.raises(ValueError, match="rowkind.field"):
        t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))


def test_composes_with_ignore_delete(spark, warehouse):
    t = warehouse.create_table(
        "db.rk_ig", DDL, primary_keys=["k"],
        options={"bucket": "1", "rowkind.field": "rk",
                 "ignore-delete": "true"},
    )
    t.write(spark.createDataFrame([(1, "a", "+I")], DDL))
    # the -D is extracted from the field, then dropped by ignore-delete
    t.write(spark.createDataFrame([(1, "a", "-D")], DDL))
    assert [(r.k, r.v) for r in t.to_df(spark).collect()] == [(1, "a")]
