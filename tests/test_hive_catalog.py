"""Hive-metastore catalog adapter (reference: paimon-hive HiveCatalog):
table data lives in the filesystem warehouse; the metastore holds typed
registrations with path-pointer TBLPROPERTIES."""

from __future__ import annotations

import pytest

# r12 fast-tier split: this module is SLOW-tier (long fuzz loops /
# integration matrices); run `-m ""` for the full suite.
pytestmark = pytest.mark.slow
import subprocess
import sys
import textwrap


def test_hive_catalog_round_trip_session(spark, tmp_path):
    """create/load/drop round-trip against the session catalog: the
    registration carries the path pointer, get_table resolves the REAL
    engine table (merge-on-read), drop removes both layers."""
    from flink_table_store_spark.hive_catalog import HiveCatalog

    cat = HiveCatalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        "hdb.users",
        "id bigint, name string",
        primary_keys=["id"],
        options={"bucket": "2"},
    )
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string"))
    t.write(spark.createDataFrame([(1, "a2")], "id bigint, name string"))

    # discoverable through plain Spark SQL
    assert "users" in [r.tableName for r in spark.sql("SHOW TABLES IN hdb").collect()]
    props = {r.key: r.value for r in spark.sql("SHOW TBLPROPERTIES hdb.users").collect()}
    assert props["flink_table_store.table_type"] == "FLINK_TABLE_STORE"
    assert props["flink_table_store.path"].endswith("hdb.db/users")

    # catalog protocol resolves the engine table with MoR semantics
    assert "users" in cat.list_tables("hdb")
    got = {(r.id, r.name) for r in cat.get_table("hdb.users").to_df(spark).collect()}
    assert got == {(1, "a2"), (2, "b")}

    cat.rename_table("hdb.users", "hdb.users2")
    assert "users2" in cat.list_tables("hdb") and "users" not in cat.list_tables("hdb")
    assert {r.id for r in cat.get_table("hdb.users2").to_df(spark).collect()} == {1, 2}

    cat.drop_table("hdb.users2")
    assert "users2" not in cat.list_tables("hdb")
    assert "users2" not in [r.tableName for r in spark.sql("SHOW TABLES IN hdb").collect()]


def test_hive_catalog_derby_metastore_persists(tmp_path):
    """Derby-backed metastore round-trip in dedicated JVMs: session 1
    creates + registers; session 2 (fresh process, same metastore)
    discovers the registration and reads the table through it."""
    d = str(tmp_path)
    common = textwrap.dedent(
        f"""
        import os
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]").appName("hivecat")
          .config("spark.sql.catalogImplementation", "hive")
          .config("spark.sql.warehouse.dir", os.path.join({d!r}, "spark-wh"))
          .config("javax.jdo.option.ConnectionURL",
                  "jdbc:derby:;databaseName={d}/metastore_db;create=true")
          .config("spark.ui.enabled", "false")
          .getOrCreate())
        from flink_table_store_spark.hive_catalog import HiveCatalog
        cat = HiveCatalog(spark, os.path.join({d!r}, "wh"))
        """
    )
    s1 = common + textwrap.dedent(
        """
        t = cat.create_table("hdb.ev", "k bigint, v string", primary_keys=["k"],
                             options={"bucket": "1"})
        t.write(spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, v string"))
        print("S1OK")
        """
    )
    s2 = common + textwrap.dedent(
        """
        assert "ev" in cat.list_tables("hdb"), cat.list_tables("hdb")
        rows = {(r.k, r.v) for r in cat.get_table("hdb.ev").to_df(spark).collect()}
        assert rows == {(1, "x"), (2, "y")}, rows
        cat.drop_table("hdb.ev")
        assert "ev" not in cat.list_tables("hdb")
        print("S2OK")
        """
    )
    import os

    env = {**os.environ, "SPARK_GRAFT_CPUS": "2"}
    for script, marker in [(s1, "S1OK"), (s2, "S2OK")]:
        r = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            timeout=300,
            cwd="/root/repo",
            env=env,
        )
        assert marker in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]


def test_hive_catalog_sync_after_schema_evolution(spark, tmp_path):
    """sync_table refreshes the metastore entry so DESCRIBE shows the
    evolved columns (reference HiveCatalog alterTable sync)."""
    from flink_table_store_spark.hive_catalog import HiveCatalog

    cat = HiveCatalog(spark, str(tmp_path / "wh_sync"))
    t = cat.create_table("syncdb.t", "k bigint, v string")
    t.evolve_schema([{"action": "add_column", "name": "extra", "type": "double"}])
    cols = {r.col_name for r in spark.sql("DESCRIBE `syncdb`.`t`").collect()}
    assert "extra" not in cols  # stale until synced
    cat.sync_table("syncdb.t")
    cols = {r.col_name for r in spark.sql("DESCRIBE `syncdb`.`t`").collect()}
    assert "extra" in cols
    # engine-side reads see the evolved schema regardless
    assert "extra" in cat.get_table("syncdb.t").schema.field_names()


def test_metastore_partition_sync(spark, tmp_path):
    """metastore.partitioned-table: commits register new partitions in
    the metastore (AddPartitionCommitCallback.java analogue) — SHOW
    PARTITIONS tracks engine commits, idempotently."""
    from pyspark.sql import types as T

    from flink_table_store_spark.hive_catalog import HiveCatalog

    cat = HiveCatalog(spark, str(tmp_path / "wh"))
    sch = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("pt", T.StringType()),
    ])
    spark.sql("DROP TABLE IF EXISTS psync.t")
    t = cat.create_table(
        "psync.t", sch, partition_keys=["pt"],
        options={"metastore.partitioned-table": "true"},
    )
    t.write(spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], sch))
    parts = {r[0] for r in spark.sql("SHOW PARTITIONS psync.t").collect()}
    assert parts == {"pt=x", "pt=y"}
    # a later commit adds only the new partition; repeats are idempotent
    t.write(spark.createDataFrame([(3, "c", "y"), (4, "d", "z")], sch))
    parts = {r[0] for r in spark.sql("SHOW PARTITIONS psync.t").collect()}
    assert parts == {"pt=x", "pt=y", "pt=z"}
    # a fresh handle (get_table) keeps syncing
    t2 = cat.get_table("psync.t")
    t2.write(spark.createDataFrame([(5, "e", "w")], sch))
    parts = {r[0] for r in spark.sql("SHOW PARTITIONS psync.t").collect()}
    assert "pt=w" in parts
    # the hive-side registration scans per partition
    got = spark.sql("SELECT k FROM psync.t WHERE pt = 'y' ORDER BY k").collect()
    assert [r.k for r in got] == [2, 3]
    cat.drop_table("psync.t")
