"""migrate_table / migrate_database / copy_files (clone).

Reference parity: MigrateTableProcedure / MigrateDatabaseProcedure /
CopyFilesProcedure (paimon-spark procedure/); hive migrator moves
files without rewrite (paimon-hive migrate/HiveMigrator.java).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark import predicate as P
from flink_table_store_spark.procedures import call

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_migrate_parquet_in_place(spark, warehouse, tmp_path):
    # build a hive-partitioned parquet dir from testdata
    src = str(tmp_path / "raw_orders")
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    orders.withColumn("pt", F.col("o_orderpriority")).write.partitionBy("pt").parquet(src)

    t = call(
        spark, warehouse, "migrate_table", source_location=src, table="db.orders_migrated"
    )
    assert t.schema.partition_keys == ["pt"]
    df = t.to_df(spark)
    assert df.count() == orders.count()
    # partition pruning must work on the imported layout
    one_pt = df.select("pt").first()["pt"]
    sub = t.to_df(spark, predicate=P.equal("pt", one_pt))
    expect = orders.where(F.col("o_orderpriority") == one_pt).count()
    assert sub.count() == expect
    # metadata-only import: data files are the originals (same inode count ≥ linked)
    snap = t.snapshots.latest()
    assert snap.id == 1 and snap.total_record_count == orders.count()


def test_migrate_csv_rewrite(spark, warehouse, tmp_path):
    src = str(tmp_path / "raw_csv")
    spark.read.parquet(os.path.join(SF, "region.parquet")).write.option(
        "header", "true"
    ).csv(src)
    t = call(
        spark, warehouse, "migrate_table", source_location=src, table="db.region_csv", format="csv"
    )
    assert t.to_df(spark).count() == 5


def test_migrate_database(spark, warehouse, tmp_path):
    root = tmp_path / "rawdb"
    for name in ("region", "nation"):
        spark.read.parquet(os.path.join(SF, f"{name}.parquet")).write.parquet(
            str(root / name)
        )
    tables = call(
        spark, warehouse, "migrate_database", source_dir=str(root), database="mig"
    )
    assert {t.name.split(".")[-1] for t in tables} == {"region", "nation"}
    assert warehouse.get_table("mig.nation").to_df(spark).count() == 25


def test_copy_files_clone(spark, warehouse):
    nation = spark.read.parquet(os.path.join(SF, "nation.parquet"))
    t = warehouse.create_table(
        "db.nat_pk", nation.schema, primary_keys=["n_nationkey"], options={"bucket": "2"}
    )
    t.write(nation)
    t.write(nation.withColumn("n_name", F.lit("v2")))  # second snapshot (upsert)
    t = t.refresh()
    t.create_tag("v1", snapshot_id=1)

    clone = call(
        spark, warehouse, "copy_files", source_table="db.nat_pk", target_table="db.nat_clone"
    )
    got = clone.to_df(spark)
    assert got.count() == 25
    assert got.where(F.col("n_name") == "v2").count() == 25
    # single-snapshot history in the clone
    assert clone.snapshots.latest().id == 1

    tagged = call(
        spark, warehouse, "copy_files",
        source_table="db.nat_pk", target_table="db.nat_clone_v1", tag="v1",
    )
    assert tagged.to_df(spark).where(F.col("n_name") == "v2").count() == 0

    with pytest.raises(RuntimeError):
        call(
            spark, warehouse, "copy_files",
            source_table="db.nat_pk", target_table="db.nat_clone",
        )


def test_migrate_hudi_cow_table(spark, warehouse, tmp_path):
    """Hudi COPY-ON-WRITE migration (paimon-hudi analog): keep the
    newest completed base file per file group, ignore inflight
    instants, hide _hoodie_* meta columns, refuse MERGE-ON-READ."""
    import os

    import pyspark.sql.functions as F
    import pytest

    from flink_table_store_spark.migrate import migrate_hudi_table

    src = str(tmp_path / "hudi_src")
    hoodie = os.path.join(src, ".hoodie")
    os.makedirs(hoodie)

    def base_file(part_dir, file_id, instant, rows):
        df = spark.createDataFrame(rows, "k bigint, v string").select(
            F.lit(instant).alias("_hoodie_commit_time"),
            F.lit("seq").alias("_hoodie_commit_seqno"),
            F.col("k").cast("string").alias("_hoodie_record_key"),
            F.lit(part_dir).alias("_hoodie_partition_path"),
            F.lit("f").alias("_hoodie_file_name"),
            "k",
            "v",
        )
        d = os.path.join(src, part_dir) if part_dir else src
        os.makedirs(d, exist_ok=True)
        tmp = str(tmp_path / "stage")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(
            os.path.join(tmp, part),
            os.path.join(d, f"{file_id}_0-1-0_{instant}.parquet"),
        )

    # file group fg1 in partition p=a: two slices; the later one wins
    base_file("p=a", "fg1-0", "20240101000000000", [(1, "old"), (2, "old")])
    base_file("p=a", "fg1-0", "20240102000000000", [(1, "new"), (2, "new")])
    # second file group, same partition
    base_file("p=a", "fg2-0", "20240101000000000", [(3, "x")])
    # another partition
    base_file("p=b", "fg3-0", "20240102000000000", [(4, "y")])
    # an INFLIGHT instant: its base file must be ignored
    base_file("p=b", "fg4-0", "20240103000000000", [(9, "inflight")])
    for instant in ("20240101000000000", "20240102000000000"):
        open(os.path.join(hoodie, f"{instant}.commit"), "w").write("{}")
    open(os.path.join(hoodie, "20240103000000000.inflight"), "w").write("")

    t = migrate_hudi_table(spark, warehouse, src, "db.from_hudi")
    got = {r.k: (r.v, r.p) for r in t.to_df(spark).collect()}
    assert got == {1: ("new", "a"), 2: ("new", "a"), 3: ("x", "a"), 4: ("y", "b")}
    assert not any(c.startswith("_hoodie_") for c in t.to_df(spark).columns)

    # MOR refusal: a delta log file
    open(os.path.join(src, "p=a", ".fg1-0_20240104.log.1"), "w").write("")
    with pytest.raises(ValueError, match="MERGE-ON-READ"):
        migrate_hudi_table(spark, warehouse, src, "db.from_hudi2")


def test_migrate_hudi_replacecommit_and_evolution(spark, warehouse, tmp_path):
    """replacecommit (clustering / INSERT OVERWRITE) kills the replaced
    file groups even though their parquet is still on disk; the table
    schema merges footers so later-commit columns survive."""
    import json
    import os

    import pyspark.sql.functions as F
    import pytest

    from flink_table_store_spark.migrate import migrate_hudi_table

    src = str(tmp_path / "hudi_rc")
    hoodie = os.path.join(src, ".hoodie")
    os.makedirs(hoodie)

    def base_file(part_dir, file_id, instant, df):
        d = os.path.join(src, part_dir) if part_dir else src
        os.makedirs(d, exist_ok=True)
        tmp = str(tmp_path / "stage_rc")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(
            os.path.join(tmp, part),
            os.path.join(d, f"{file_id}_0-1-0_{instant}.parquet"),
        )

    # original group g1 (commit t1), then an insert_overwrite
    # replacecommit t2 replaces g1 with g2 — g1's parquet stays on disk.
    # g2's file (written at t2) adds a column "extra" to test schema merge.
    base_file("p=a", "g1-0", "t1", spark.createDataFrame([(1, "pre")], "k bigint, v string"))
    base_file(
        "p=a",
        "g2-0",
        "t2",
        spark.createDataFrame([(2, "post", "e2")], "k bigint, v string, extra string"),
    )
    open(os.path.join(hoodie, "t1.commit"), "w").write("{}")
    with open(os.path.join(hoodie, "t2.replacecommit"), "w") as fh:
        json.dump({"partitionToReplaceFileIds": {"p=a": ["g1-0"]}}, fh)

    t = migrate_hudi_table(spark, warehouse, src, "db.hudi_rc")
    rows = t.to_df(spark).collect()
    # ONLY the post-overwrite row — g1 excluded despite being on disk
    assert [(r.k, r.v, r.extra, r.p) for r in rows] == [(2, "post", "e2", "a")]
    assert "extra" in t.to_df(spark).columns

    # unparseable replacecommit metadata must refuse, not duplicate
    with open(os.path.join(hoodie, "t2.replacecommit"), "w") as fh:
        fh.write("not json")
    with pytest.raises(ValueError, match="replacecommit"):
        migrate_hudi_table(spark, warehouse, src, "db.hudi_rc2")


def test_migrate_hudi_non_hive_partitions_refused(spark, warehouse, tmp_path):
    """Default hudi layout (bare value dirs, hive_style=false) must be
    refused loudly — keys are unrecoverable from paths."""
    import os

    import pytest

    from flink_table_store_spark.migrate import migrate_hudi_table

    src = str(tmp_path / "hudi_bare")
    hoodie = os.path.join(src, ".hoodie")
    os.makedirs(os.path.join(src, "2021", "03"))
    os.makedirs(hoodie)
    df = spark.createDataFrame([(1, "x")], "k bigint, v string")
    tmp = str(tmp_path / "stage_bare")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, part), os.path.join(src, "2021", "03", "g1-0_0-1-0_t1.parquet"))
    open(os.path.join(hoodie, "t1.commit"), "w").write("{}")
    with pytest.raises(ValueError, match="non-hive-style"):
        migrate_hudi_table(spark, warehouse, src, "db.hudi_bare")


def test_sys_copy_with_partition_where(spark, warehouse):
    """CALL sys.copy(source_table, target_table, where) — the
    procedures.md partition-restricted clone."""
    from flink_table_store_spark.procedures import call

    t = warehouse.create_table(
        "db.cp_src", "k bigint, pt string", partition_keys=["pt"],
    )
    t.write(spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "k bigint, pt string"))
    out = call(spark, warehouse, "copy", source_table="db.cp_src",
               target_table="db.cp_tgt", where="pt = 'a'")
    got = sorted((r.k, r.pt) for r in out.to_df(spark).collect())
    assert got == [(1, "a"), (2, "a")]
    # row-level predicates are refused (they would copy partial files)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="partition"):
        call(spark, warehouse, "copy", source_table="db.cp_src",
             target_table="db.cp_tgt2", where="k = 1")
