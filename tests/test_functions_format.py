"""Catalog functions (F7), bucket function (F4), format/object tables (S9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_table_store_spark.functions import bucket, register_builtins
from flink_table_store_spark.sources.format_table import object_table


def test_bucket_matches_writer_assignment(spark, warehouse):
    t = warehouse.create_table(
        "db.bk", "k bigint, v double", primary_keys=["k"], options={"bucket": "4"}
    )
    df = spark.createDataFrame([(i, float(i)) for i in range(50)], "k bigint, v double")
    t.write(df)
    # files' bucket dirs must match the SQL-side bucket() of their keys
    got = t.to_df(spark)
    from flink_table_store_spark.write import bucket_expr

    a = got.select("k", bucket(4, "k").alias("b")).collect()
    b = got.select("k", bucket_expr(t.schema).alias("b")).collect()
    assert {(r.k, r.b) for r in a} == {(r.k, r.b) for r in b}


def test_sql_function_registration(spark):
    register_builtins(spark)
    [r] = spark.sql("SELECT paimon_bucket(4, CAST(42 AS BIGINT)) AS b").collect()
    assert 0 <= r.b < 4


def test_catalog_sql_functions(spark, warehouse):
    fm = warehouse.functions
    fm.create("revenue", ["p double", "d double"], "p * (1 - d)", returns="DOUBLE")
    assert fm.list() == ["revenue"]
    df = spark.createDataFrame([(10.0, 0.1)], "p double, d double")
    [r] = df.select(fm.column("revenue", F.col("p"), F.col("d")).alias("r")).collect()
    assert abs(r.r - 9.0) < 1e-9
    assert fm.register_all(spark) == ["revenue"]
    [r2] = spark.sql("SELECT revenue(10.0, 0.1) AS r").collect()
    assert abs(r2.r - 9.0) < 1e-9
    fm.drop("revenue")
    assert fm.list() == []


def test_format_table_roundtrip(spark, warehouse, tmp_path):
    loc = str(tmp_path / "csvdir")
    ft = warehouse.create_format_table(
        "db.rawcsv", loc, "csv", options={"header": "true", "inferSchema": "true"}
    )
    ft.write(spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"), mode="overwrite")
    ft2 = warehouse.get_format_table("db.rawcsv")
    got = ft2.to_df(spark)
    assert got.count() == 2 and set(got.columns) == {"id", "s"}


def test_object_table(spark, tmp_path):
    d = tmp_path / "objs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x89PNG1234")
    (d / "b.txt").write_bytes(b"hello")
    df = object_table(spark, str(d))
    rows = {r.path.split("/")[-1]: bytes(r.content) for r in df.collect()}
    assert rows["a.bin"].startswith(b"\x89PNG") and rows["b.txt"] == b"hello"


def test_object_table_catalog_metadata_index(spark, warehouse, tmp_path):
    """ObjectTable (table/object/ObjectTable.java:34): reference SCHEMA
    metadata index, content pruned unless asked for."""
    d = tmp_path / "store"
    (d / "sub").mkdir(parents=True)
    (d / "a.bin").write_bytes(b"0123456789")
    (d / "sub" / "b.txt").write_bytes(b"hello")

    ot = warehouse.create_object_table("db.objects", str(d))
    meta = warehouse.get_object_table("db.objects").to_df(spark)
    assert meta.columns == ["path", "name", "length", "mtime", "atime", "owner"]
    rows = {r.path: r for r in meta.collect()}
    assert set(rows) == {"a.bin", "sub/b.txt"}
    assert rows["a.bin"].length == 10 and rows["a.bin"].name == "a.bin"
    assert rows["sub/b.txt"].name == "b.txt" and rows["sub/b.txt"].mtime > 0
    # metadata-only plan never reads payloads: content column absent
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan

    content = ot.with_content(spark)
    got = {r.path: bytes(r.content) for r in content.collect()}
    assert got["sub/b.txt"] == b"hello" and got["a.bin"] == b"0123456789"


def test_variant_column_storage(spark, warehouse):
    """VARIANT as a STORED column type (F6; reference paimon-common
    data/variant/): append + PK tables write Spark 4's parquet VARIANT
    logical type, merge-on-read and compaction keep it intact, and
    variant_get reads typed paths back. Stats for such tables come from
    the distributed job (pyarrow cannot read VARIANT footers)."""
    from pyspark.sql import functions as F

    src = spark.createDataFrame(
        [(1, '{"a": 1, "b": "x"}'), (2, '{"a": 2, "c": [1,2]}')], "k bigint, j string"
    ).select("k", F.parse_json("j").alias("v"))
    t = warehouse.create_table("db.variant_app", src.schema)
    t.write(src)
    t = t.refresh()
    got = {
        r.k: r.a
        for r in t.to_df(spark)
        .select("k", F.variant_get("v", "$.a", "bigint").alias("a"))
        .collect()
    }
    assert got == {1: 1, 2: 2}
    # entries committed with real row counts despite the footer gap
    snap = t.snapshots.latest()
    es = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    assert sum(e.row_count for e in es) == 2

    t2 = warehouse.create_table(
        "db.variant_pk", src.schema, primary_keys=["k"], options={"bucket": "1"}
    )
    t2.write(src)
    t2.write(
        spark.createDataFrame([(1, '{"a": 99}')], "k bigint, j string").select(
            "k", F.parse_json("j").alias("v")
        )
    )
    t2 = t2.refresh()
    read_a = lambda tt: {  # noqa: E731
        r.k: r.a
        for r in tt.to_df(spark)
        .select("k", F.variant_get("v", "$.a", "bigint").alias("a"))
        .collect()
    }
    assert read_a(t2) == {1: 99, 2: 2}
    t2.compact(spark)
    assert read_a(t2.refresh()) == {1: 99, 2: 2}
