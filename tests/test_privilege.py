"""Privilege system (paimon-core privilege/): file-based users+grants,
hierarchical checks, access-checked catalog and table proxies, and the
five CALL procedures."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from flink_table_store_spark.catalog import Catalog
from flink_table_store_spark.privilege import (
    FileBasedPrivilegeManager,
    NoPrivilegeException,
    PrivilegedCatalog,
    init_file_based_privilege,
)

KV = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


@pytest.fixture()
def wh(tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    cat.create_table("db.t", KV, primary_keys=["k"], options={"bucket": "1"})
    init_file_based_privilege(cat, "root-pw")
    return cat


def _as(cat, user, pw):
    return PrivilegedCatalog(Catalog(cat.warehouse), user, pw)


class TestManager:
    def test_init_once(self, wh):
        with pytest.raises(RuntimeError, match="already enabled"):
            init_file_based_privilege(wh, "again")

    def test_wrong_password_rejected(self, wh):
        bad = FileBasedPrivilegeManager(wh.warehouse, "root", "nope")
        with pytest.raises(RuntimeError, match="do not match"):
            bad.get_privilege_checker()
        ok = FileBasedPrivilegeManager(wh.warehouse, "root", "root-pw")
        ok.get_privilege_checker().assert_can_select("db.t")  # root: all granted

    def test_user_lifecycle_requires_admin(self, wh):
        root = _as(wh, "root", "root-pw")
        root.create_privileged_user("alice", "pw-a")
        with pytest.raises(ValueError, match="already exists"):
            root.create_privileged_user("alice", "other")
        # anonymous (no ADMIN) cannot create users
        anon = _as(wh, "anonymous", "anonymous")
        with pytest.raises(NoPrivilegeException):
            anon.create_privileged_user("bob", "pw")
        # root/anonymous cannot be dropped
        with pytest.raises(ValueError, match="cannot be dropped"):
            root.drop_privileged_user("root")
        with pytest.raises(ValueError, match="cannot be dropped"):
            root.drop_privileged_user("anonymous")
        root.drop_privileged_user("alice")
        with pytest.raises(RuntimeError, match="do not match"):
            _as(wh, "alice", "pw-a").privilege_manager.get_privilege_checker()

    def test_grant_revoke_rules(self, wh):
        root = _as(wh, "root", "root-pw")
        root.create_privileged_user("alice", "pw")
        # cannot grant to root; unknown privilege refused; level rules
        with pytest.raises(ValueError, match="Cannot change privilege"):
            root.grant_privilege("root", "SELECT", "db", "t")
        with pytest.raises(ValueError, match="unknown privilege"):
            root.grant_privilege("alice", "FLY", None, None)
        with pytest.raises(ValueError, match="can't be granted on a table"):
            root.grant_privilege("alice", "CREATE_TABLE", "db", "t")
        with pytest.raises(ValueError, match="can't be granted on a database"):
            root.grant_privilege("alice", "CREATE_DATABASE", "db")
        # table-level privileges CAN be granted on broader scopes
        root.grant_privilege("alice", "SELECT", "db")       # whole database
        root.grant_privilege("alice", "INSERT", "db", "t")  # one table
        assert root.privilege_manager.show_grants("alice") == [
            ("db", "SELECT"), ("db.t", "INSERT"),
        ]
        # revoking an absent grant is loud (higher-level grant hint)
        with pytest.raises(ValueError, match="higher level"):
            root.revoke_privilege("alice", "SELECT", "db", "t")
        assert root.revoke_privilege("alice", "SELECT", "db") == 1


class TestChecks:
    def test_hierarchical_resolution(self, wh):
        root = _as(wh, "root", "root-pw")
        root.create_privileged_user("alice", "pw")
        root.grant_privilege("alice", "SELECT")  # whole catalog
        alice = _as(wh, "alice", "pw")
        c = alice.privilege_manager.get_privilege_checker()
        c.assert_can_select("db.t")      # catalog grant covers any table
        c.assert_can_select("other.x")
        with pytest.raises(NoPrivilegeException):
            c.assert_can_insert("db.t")

    @pytest.mark.slow
    def test_table_proxy_read_write(self, spark, wh):
        root = _as(wh, "root", "root-pw")
        root.create_privileged_user("w", "pw")
        root.grant_privilege("w", "INSERT", "db", "t")
        as_w = _as(wh, "w", "pw")
        t = as_w.get_table("db.t")
        t.write(spark.createDataFrame([(1, "a")], KV))  # INSERT ok
        with pytest.raises(NoPrivilegeException):       # no SELECT
            t.to_df(spark)
        root.grant_privilege("w", "SELECT", "db", "t")
        assert as_w.get_table("db.t").to_df(spark).count() == 1
        # maintenance is INSERT-class
        as_w.get_table("db.t").compact(spark)
        # schema change needs ALTER_TABLE
        with pytest.raises(NoPrivilegeException):
            as_w.get_table("db.t").evolve_schema(add_columns=[("extra", "string")])

    def test_catalog_metadata_ops(self, spark, wh):
        root = _as(wh, "root", "root-pw")
        root.create_privileged_user("dev", "pw")
        dev = _as(wh, "dev", "pw")
        with pytest.raises(NoPrivilegeException):
            dev.create_database("newdb")
        with pytest.raises(NoPrivilegeException):
            dev.create_table("db.more", KV)
        with pytest.raises(NoPrivilegeException):
            dev.drop_table("db.t")
        with pytest.raises(NoPrivilegeException):
            dev.rename_table("db.t", "db.t2")
        root.grant_privilege("dev", "CREATE_TABLE", "db")
        t = dev.create_table("db.more", KV)
        # creating a table does NOT implicitly grant SELECT on it
        with pytest.raises(NoPrivilegeException):
            t.to_df(spark)
        # root can do everything
        root.drop_table("db.more")

    def test_grants_follow_rename_and_drop(self, spark, wh):
        root = _as(wh, "root", "root-pw")
        root.create_privileged_user("u", "pw")
        root.grant_privilege("u", "SELECT", "db", "t")
        root.grant_privilege("u", "ALTER_TABLE", "db", "t")
        u = _as(wh, "u", "pw")
        u.rename_table("db.t", "db.t9")  # ALTER_TABLE allows rename
        # the SELECT grant moved with the table
        assert u.get_table("db.t9").to_df(spark).count() == 0
        assert root.privilege_manager.show_grants("u") == [
            ("db.t9", "ALTER_TABLE"), ("db.t9", "SELECT"),
        ]
        root.drop_table("db.t9")
        assert root.privilege_manager.show_grants("u") == []

    def test_unprivileged_warehouse_refuses_wrapper(self, tmp_path):
        cat = Catalog(str(tmp_path / "plain"))
        with pytest.raises(RuntimeError, match="not enabled"):
            PrivilegedCatalog(cat)


class TestProcedures:
    def test_call_surface(self, spark, tmp_path):
        from flink_table_store_spark.procedures import call

        cat = Catalog(str(tmp_path / "wh"))
        cat.create_table("db.t", KV, primary_keys=["k"], options={"bucket": "1"})
        call(spark, cat, "init_file_based_privilege", root_password="rp")
        root = PrivilegedCatalog(cat, "root", "rp")
        call(spark, root, "create_privileged_user", user="a", password="ap")
        call(spark, root, "grant_privilege_to_user",
             user="a", privilege="SELECT", database="db", table="t")
        a = PrivilegedCatalog(Catalog(cat.warehouse), "a", "ap")
        assert a.get_table("db.t").to_df(spark).count() == 0
        call(spark, root, "revoke_privilege_from_user",
             user="a", privilege="SELECT", database="db", table="t")
        with pytest.raises(NoPrivilegeException):
            a.get_table("db.t").to_df(spark)
        call(spark, root, "drop_privileged_user", user="a")
        # procedures that need a privileged catalog refuse a plain one
        with pytest.raises(ValueError, match="privileged catalog"):
            call(spark, cat, "create_privileged_user", user="x", password="x")

    def test_sql_session_call(self, spark, tmp_path):
        from flink_table_store_spark import SqlSession

        cat = Catalog(str(tmp_path / "wh"))
        cat.create_table("db.t", KV, primary_keys=["k"], options={"bucket": "1"})
        s = SqlSession(spark, cat)
        s.sql("CALL sys.init_file_based_privilege(root_password => 'rp')")
        root = PrivilegedCatalog(cat, "root", "rp")
        sp = SqlSession(spark, root)
        sp.sql("CALL sys.create_privileged_user(user => 'bob', password => 'bp')")
        sp.sql("CALL sys.grant_privilege_to_user(user => 'bob', "
               "privilege => 'SELECT', database => 'db')")
        bob = PrivilegedCatalog(Catalog(cat.warehouse), "bob", "bp")
        assert bob.get_table("db.t").to_df(spark).count() == 0
