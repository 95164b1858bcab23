"""JDBC catalog (paimon-core jdbc/JdbcCatalog.java + SqlLiteDistributed
LockDialect.java): registry-in-database catalog over a shared sqlite
file, distributed row-as-lock with steal-on-expiry."""

from __future__ import annotations

import os
import sqlite3
import subprocess
import sys
import threading
import time

import pytest
from pyspark.sql import types as T

from flink_table_store_spark.jdbc_catalog import (
    CATALOG_TABLE_NAME,
    DISTRIBUTED_LOCKS_TABLE_NAME,
    JdbcCatalog,
)

KV = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


@pytest.fixture()
def jcat(tmp_path):
    return JdbcCatalog(
        f"jdbc:sqlite:{tmp_path}/meta.db", str(tmp_path / "wh"), catalog_key="c1"
    )


def _second(cat: JdbcCatalog) -> JdbcCatalog:
    return JdbcCatalog(cat.db_path, cat.warehouse, catalog_key=cat.catalog_key)


class TestRegistry:
    def test_create_list_get_drop_across_clients(self, spark, jcat):
        t = jcat.create_table("db.kv", KV, primary_keys=["k"], options={"bucket": "2"})
        t.write(spark.createDataFrame([(1, "a"), (2, "b")], KV))
        other = _second(jcat)
        assert other.list_databases() == ["db"]
        assert other.list_tables("db") == ["kv"]
        got = sorted((r.k, r.v) for r in other.get_table("db.kv").to_df(spark).collect())
        assert got == [(1, "a"), (2, "b")]
        other.drop_table("db.kv")
        assert jcat.list_tables("db") == []
        with pytest.raises(RuntimeError, match="not found"):
            jcat.get_table("db.kv")
        # directory removed too
        assert not os.path.isdir(os.path.join(jcat.warehouse, "db.db", "kv"))

    def test_registry_is_source_of_truth(self, jcat):
        """A directory dropped into the warehouse without a registry row
        is invisible — the database, not the filesystem, lists tables
        (the whole point of the JDBC catalog)."""
        os.makedirs(os.path.join(jcat.warehouse, "db.db", "ghost"))
        jcat.create_database("db")
        assert jcat.list_tables("db") == []
        with pytest.raises(RuntimeError, match="not found in jdbc catalog"):
            jcat.get_table("db.ghost")

    def test_duplicate_create_rejected(self, jcat):
        jcat.create_table("db.t", KV)
        with pytest.raises(RuntimeError, match="exists"):
            jcat.create_table("db.t", KV)
        # ignore_if_exists returns the existing table
        t = jcat.create_table("db.t", KV, ignore_if_exists=True)
        assert t.name == "db.t" or t.name.endswith("t")

    def test_failed_fs_create_rolls_back_registry(self, jcat, monkeypatch):
        import flink_table_store_spark.catalog as base

        def boom(self, *a, **kw):
            raise OSError("disk full")

        monkeypatch.setattr(base.Catalog, "create_table", boom)
        with pytest.raises(OSError):
            jcat.create_table("db.t2", KV)
        monkeypatch.undo()
        assert jcat.list_tables("db") == []
        jcat.create_table("db.t2", KV)  # retry succeeds — no phantom row

    def test_concurrent_create_one_winner(self, tmp_path):
        cat = JdbcCatalog(str(tmp_path / "m.db"), str(tmp_path / "wh"))
        results = []

        def try_create():
            c = _second(cat)
            try:
                c.create_table("db.race", KV)
                results.append("ok")
            except RuntimeError as e:
                results.append(str(e))

        ts = [threading.Thread(target=try_create) for _ in range(4)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert results.count("ok") == 1
        assert sum("exists" in r for r in results) == 3

    def test_rename_updates_registry_and_directory(self, spark, jcat):
        t = jcat.create_table("db.old", KV, primary_keys=["k"], options={"bucket": "1"})
        t.write(spark.createDataFrame([(1, "a")], KV))
        jcat.rename_table("db.old", "db2.new")
        assert jcat.list_tables("db") == []
        assert jcat.list_tables("db2") == ["new"]
        assert [r.v for r in jcat.get_table("db2.new").to_df(spark).collect()] == ["a"]
        # rename onto an existing name refuses
        jcat.create_table("db.other", KV)
        with pytest.raises(RuntimeError, match="exists"):
            jcat.rename_table("db.other", "db2.new")
        with pytest.raises(RuntimeError, match="not found"):
            jcat.rename_table("db.gone", "db.x")


class TestDatabases:
    def test_properties_roundtrip_and_alter(self, jcat):
        jcat.create_database("lake", properties={"owner": "etl", "tier": "gold"})
        assert jcat.get_database("lake") == {"owner": "etl", "tier": "gold"}
        jcat.alter_database("lake", set_properties={"tier": "silver", "ttl": "7d"},
                            remove_keys=["owner"])
        assert jcat.get_database("lake") == {"tier": "silver", "ttl": "7d"}
        # 'exists' marker is internal: cannot be removed, never shown
        jcat.alter_database("lake", remove_keys=["exists"])
        assert "exists" not in jcat.get_database("lake")
        assert "lake" in jcat.list_databases()

    def test_drop_database_semantics(self, jcat):
        jcat.create_database("d1")
        jcat.create_table("d1.t", KV)
        with pytest.raises(RuntimeError, match="not empty"):
            jcat.drop_database("d1")
        jcat.drop_database("d1", cascade=True)
        assert jcat.list_databases() == []
        with pytest.raises(RuntimeError, match="does not exist"):
            jcat.drop_database("d1", ignore_if_not_exists=False)
        with pytest.raises(RuntimeError, match="does not exist"):
            jcat.get_database("d1")

    def test_create_database_exists(self, jcat):
        jcat.create_database("d")
        jcat.create_database("d")  # ignore_if_exists default
        with pytest.raises(RuntimeError, match="exists"):
            jcat.create_database("d", ignore_if_exists=False)


class TestDistributedLock:
    def test_mutual_exclusion_and_blocking(self, jcat):
        order = []

        def hold():
            def body():
                order.append("a-in")
                time.sleep(0.4)
                order.append("a-out")

            jcat.run_with_lock("db.t", body)

        def wait():
            time.sleep(0.1)  # let A win
            _second(jcat).run_with_lock("db.t", lambda: order.append("b-in"))

        ta, tb = threading.Thread(target=hold), threading.Thread(target=wait)
        ta.start(); tb.start(); ta.join(); tb.join()
        assert order == ["a-in", "a-out", "b-in"]

    def test_expired_lock_is_stolen(self, tmp_path):
        cat = JdbcCatalog(
            str(tmp_path / "m.db"), str(tmp_path / "wh"),
            options={"lock-ttl-ms": "150"},
        )
        assert cat.lock.try_acquire("c1.db.t")
        # holder "crashed": no release. TTL elapses -> next acquire steals
        time.sleep(0.25)
        assert cat.lock.try_acquire("c1.db.t")
        cat.lock.release("c1.db.t")

    def test_acquire_timeout_raises(self, tmp_path):
        cat = JdbcCatalog(
            str(tmp_path / "m.db"), str(tmp_path / "wh"),
            options={"lock-acquire-timeout-ms": "300", "lock-check-max-sleep-ms": "80"},
        )
        assert cat.lock.try_acquire("jdbc.db.t")
        with pytest.raises(RuntimeError, match="Acquire lock failed"):
            cat.run_with_lock("db.t", lambda: None)
        cat.lock.release("jdbc.db.t")
        # after release the same call goes through
        assert cat.run_with_lock("db.t", lambda: 42) == 42

    def test_lock_released_on_exception(self, jcat):
        with pytest.raises(ValueError):
            jcat.run_with_lock("db.t", lambda: (_ for _ in ()).throw(ValueError()))
        with sqlite3.connect(jcat.db_path) as c:
            rows = c.execute(f"SELECT * FROM {DISTRIBUTED_LOCKS_TABLE_NAME}").fetchall()
        assert rows == []

    def test_cross_process_lock(self, tmp_path):
        """A lock taken by another OS process blocks this one until
        released — the deployment the lock table exists for."""
        db = str(tmp_path / "m.db")
        JdbcCatalog(db, str(tmp_path / "wh"))  # create schema
        child = subprocess.Popen(
            [sys.executable, "-c", f"""
import sys, time
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from flink_table_store_spark.jdbc_catalog import JdbcCatalog
cat = JdbcCatalog({db!r}, {str(tmp_path / 'wh')!r})
def body():
    print("locked", flush=True)
    time.sleep(0.8)
cat.run_with_lock("db.t", body)
"""],
            stdout=subprocess.PIPE, text=True,
        )
        assert child.stdout.readline().strip() == "locked"
        cat = JdbcCatalog(db, str(tmp_path / "wh"))
        t0 = time.time()
        cat.run_with_lock("db.t", lambda: None)
        assert time.time() - t0 > 0.3  # had to wait for the child
        assert child.wait(10) == 0

    def test_catalog_keys_isolate(self, tmp_path):
        """Two catalogs on one database with different keys don't see
        each other's tables, and their lock namespaces differ."""
        a = JdbcCatalog(str(tmp_path / "m.db"), str(tmp_path / "wa"), catalog_key="a")
        b = JdbcCatalog(str(tmp_path / "m.db"), str(tmp_path / "wb"), catalog_key="b")
        a.create_table("db.t", KV)
        assert b.list_tables("db") == []
        assert a.lock.try_acquire("a.db.t") and b.lock.try_acquire("b.db.t")
        a.lock.release("a.db.t"); b.lock.release("b.db.t")


class TestEngineIntegration:
    def test_sql_session_over_jdbc_catalog(self, spark, jcat):
        from flink_table_store_spark import SqlSession

        s = SqlSession(spark, jcat)
        s.sql("CREATE TABLE db.orders (id BIGINT, status STRING, PRIMARY KEY (id)) "
              "TBLPROPERTIES ('bucket'='2')")
        s.sql("INSERT INTO db.orders VALUES (1, 'OPEN'), (2, 'DONE')")
        s.sql("INSERT INTO db.orders VALUES (2, 'SHIPPED')")
        got = sorted((r.id, r.status) for r in s.sql(
            "SELECT id, status FROM db.orders").collect())
        assert got == [(1, "OPEN"), (2, "SHIPPED")]
        assert jcat.list_tables("db") == ["orders"]
        s.sql("CALL sys.compact(table => 'db.orders')")
        got2 = sorted((r.id, r.status) for r in s.sql(
            "SELECT id, status FROM db.orders").collect())
        assert got2 == got


class TestLockStress:
    def test_mutual_exclusion_under_contention(self, tmp_path):
        """Property: N threads x M increments of an unprotected counter
        under the lock never lose an update — the lock is a real mutex
        across connections, including steal-on-expiry cycles."""
        cat = JdbcCatalog(str(tmp_path / "m.db"), str(tmp_path / "wh"))
        counter = {"v": 0}
        N, M = 6, 15

        def work():
            c = _second(cat)
            for _ in range(M):
                def bump():
                    cur = counter["v"]
                    time.sleep(0.001)  # widen the race window
                    counter["v"] = cur + 1
                c.run_with_lock("db.hot", bump)

        ts = [threading.Thread(target=work) for _ in range(N)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert counter["v"] == N * M
        with sqlite3.connect(cat.db_path) as c:
            assert c.execute(
                f"SELECT count(*) FROM {DISTRIBUTED_LOCKS_TABLE_NAME}"
            ).fetchone()[0] == 0  # all released
