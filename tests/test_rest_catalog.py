"""REST catalog: loopback server + client (paimon-core rest/RESTCatalog.java
analogue; test shapes follow paimon-core src/test rest/RESTCatalogTest.java —
CRUD, pagination, auth, rename, alter, and the commit CAS)."""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_table_store_spark.rest import RESTCatalog, RESTCatalogServer, RESTError
from flink_table_store_spark.snapshot import Snapshot


@pytest.fixture()
def server(tmp_path):
    srv = RESTCatalogServer(str(tmp_path / "wh")).start()
    yield srv
    srv.stop()


@pytest.fixture()
def rest_catalog(server):
    return RESTCatalog(server.uri)


def _schema(*fields):
    return T.StructType([T.StructField(n, t) for n, t in fields])


KV = _schema(("k", T.LongType()), ("v", T.StringType()))


class TestMetadataSurface:
    def test_database_crud(self, rest_catalog):
        cat = rest_catalog
        cat.create_database("db1")
        cat.create_database("db2")
        assert cat.list_databases() == ["db1", "db2"]
        cat.api.alter_database("db1", updates={"owner": "alice"})
        assert cat.api.get_database("db1")["options"] == {"owner": "alice"}
        cat.api.alter_database("db1", removals=["owner"], updates={"tier": "gold"})
        assert cat.api.get_database("db1")["options"] == {"tier": "gold"}
        cat.drop_database("db2")
        assert cat.list_databases() == ["db1"]
        with pytest.raises(RESTError):
            cat.api.create_database("db1")  # 409
        cat.create_database("db1", ignore_if_exists=True)  # swallowed

    def test_drop_database_non_empty_requires_cascade(self, rest_catalog):
        cat = rest_catalog
        cat.create_table("db1.t", KV)
        with pytest.raises(RuntimeError, match="not empty"):
            cat.drop_database("db1")
        cat.drop_database("db1", cascade=True)
        assert cat.list_databases() == []

    def test_table_crud_and_uuid(self, rest_catalog):
        cat = rest_catalog
        cat.create_table("db1.orders", KV, primary_keys=["k"])
        info = cat.api.get_table("db1", "orders")
        assert info["name"] == "db1.orders"
        assert info["schemaId"] == 0
        assert info["schema"]["primaryKeys"] == ["k"]
        assert not info["isExternal"]
        assert os.path.isdir(info["path"])
        # uuid is stable across loads
        assert cat.api.get_table("db1", "orders")["id"] == info["id"]
        cat.drop_table("db1.orders")
        with pytest.raises(RESTError) as ei:
            cat.api.get_table("db1", "orders")
        assert ei.value.code == 404
        # recreate → new uuid (drop+recreate detection)
        cat.create_table("db1.orders", KV)
        assert cat.api.get_table("db1", "orders")["id"] != info["id"]

    def test_rename_table(self, rest_catalog):
        cat = rest_catalog
        cat.create_table("db1.a", KV)
        cat.rename_table("db1.a", "db1.b")
        assert cat.list_tables("db1") == ["b"]
        cat.create_table("db1.a", KV)
        with pytest.raises(RESTError) as ei:
            cat.api.rename_table("db1", "a", "db1", "b")  # target exists
        assert ei.value.code == 409

    def test_pagination_and_patterns(self, rest_catalog):
        cat = rest_catalog
        for i in range(10):
            cat.create_table(f"db1.t{i:02d}", KV)
        page1, tok1 = cat.api.list_tables_paged("db1", max_results=4)
        assert page1 == ["t00", "t01", "t02", "t03"] and tok1 == "t03"
        page2, tok2 = cat.api.list_tables_paged("db1", max_results=4, page_token=tok1)
        assert page2 == ["t04", "t05", "t06", "t07"] and tok2 == "t07"
        page3, tok3 = cat.api.list_tables_paged("db1", max_results=4, page_token=tok2)
        assert page3 == ["t08", "t09"] and tok3 is None
        # the paged-loop client drains everything
        assert len(cat.api.list_tables("db1")) == 10
        # SQL LIKE patterns
        assert cat.api.list_tables("db1", pattern="t0_") == [f"t0{i}" for i in range(10)]
        assert cat.api.list_tables("db1", pattern="%9") == ["t09"]

    def test_alter_table_schema_evolution(self, spark, rest_catalog):
        cat = rest_catalog
        cat.create_table("db1.t", KV)
        cat.alter_table("db1.t", [{"action": "add_column", "name": "w", "type": "double"}])
        info = cat.api.get_table("db1", "t")
        assert [f["name"] for f in info["schema"]["fields"]] == ["k", "v", "w"]
        assert info["schemaId"] == 1
        # empty changes rejected
        with pytest.raises(RESTError) as ei:
            cat.api.alter_table("db1", "t", [])
        assert ei.value.code == 400

    def test_views_over_rest(self, rest_catalog):
        cat = rest_catalog
        cat.create_view("db1.v", "SELECT 1 AS x", comment="one")
        assert cat.is_view("db1.v")
        assert cat.list_views("db1") == ["v"]
        assert cat.get_view("db1.v")["dialects"] == {"spark": "SELECT 1 AS x"}
        cat.create_view("db1.v", "SELECT 1", dialect="flink", ignore_if_exists=True)
        assert sorted(cat.get_view("db1.v")["dialects"]) == ["flink", "spark"]
        with pytest.raises(RuntimeError, match="exists"):
            cat.create_view("db1.v", "SELECT 2")
        cat.drop_view("db1.v")
        assert not cat.is_view("db1.v")

    def test_token_endpoint(self, rest_catalog):
        cat = rest_catalog
        cat.create_table("db1.t", KV)
        tok = cat.api.load_table_token("db1", "t")
        assert tok["token"]["access-path"].endswith("/t")
        assert tok["expiresAtMillis"] > int(time.time() * 1000)


class TestAuth:
    def test_bearer_token_required(self, tmp_path):
        with RESTCatalogServer(str(tmp_path / "wh"), token="s3cr3t") as srv:
            with pytest.raises(RESTError) as ei:
                RESTCatalog(srv.uri)
            assert ei.value.code == 401
            with pytest.raises(RESTError) as ei:
                RESTCatalog(srv.uri, token="wrong")
            assert ei.value.code == 401
            cat = RESTCatalog(srv.uri, token="s3cr3t")
            cat.create_database("db1")
            assert cat.list_databases() == ["db1"]

    def test_route_prefix(self, tmp_path):
        with RESTCatalogServer(str(tmp_path / "wh"), prefix="cat1") as srv:
            cat = RESTCatalog(srv.uri)
            assert cat.api.base == "/v1/cat1"
            cat.create_database("db1")
            assert cat.list_databases() == ["db1"]


class TestDataThroughRest:
    def test_write_read_roundtrip(self, spark, rest_catalog):
        cat = rest_catalog
        t = cat.create_table("db1.kv", KV, primary_keys=["k"])
        df = spark.createDataFrame([(1, "a"), (2, "b")], KV)
        t.write(df)
        t.write(spark.createDataFrame([(2, "b2"), (3, "c")], KV))
        got = {r["k"]: r["v"] for r in t.to_df(spark).collect()}
        assert got == {1: "a", 2: "b2", 3: "c"}
        # snapshots were committed THROUGH the server CAS endpoint
        assert t.snapshots.latest_id() == 2
        snap = cat.api.load_snapshot("db1", "kv")
        assert snap.id == 2

    def test_commit_uuid_mismatch_rejected(self, spark, rest_catalog):
        """A client holding a stale table handle must not commit onto a
        dropped+recreated table (tableUuid guard of CommitTableRequest)."""
        cat = rest_catalog
        t = cat.create_table("db1.kv", KV, primary_keys=["k"])
        cat.drop_table("db1.kv")
        cat.create_table("db1.kv", KV, primary_keys=["k"])
        with pytest.raises(RESTError) as ei:
            t.write(spark.createDataFrame([(1, "a")], KV))
        assert ei.value.code == 404

    def test_two_client_commit_race(self, spark, rest_catalog, server):
        """Two independent clients racing a commit: the server CAS lets
        exactly one snapshot-N in; the loser retries onto N+1."""
        cat_a = rest_catalog
        cat_b = RESTCatalog(server.uri)
        cat_a.create_table("db1.kv", KV, primary_keys=["k"])
        ta, tb = cat_a.get_table("db1.kv"), cat_b.get_table("db1.kv")
        ta.write(spark.createDataFrame([(1, "a")], KV))
        tb.write(spark.createDataFrame([(2, "b")], KV))
        # raw CAS: both try the same snapshot id; exactly one wins
        base = ta.snapshots.load(2)
        s3a = Snapshot.from_dict({**base.to_dict(), "id": 3})
        assert ta.snapshots.try_commit(s3a) is True
        assert tb.snapshots.try_commit(s3a) is False
        got = {r["k"]: r["v"] for r in cat_b.get_table("db1.kv").to_df(spark).collect()}
        assert got == {1: "a", 2: "b"}

    def test_sql_session_over_rest(self, spark, rest_catalog):
        """SqlSession runs unchanged over a REST-backed catalog."""
        from flink_table_store_spark.sql import SqlSession

        cat = rest_catalog
        sess = SqlSession(spark, cat)
        sess.sql("CREATE TABLE db1.kv (k BIGINT, v STRING) TBLPROPERTIES ('primary-key'='k')")
        sess.sql("INSERT INTO db1.kv VALUES (1, 'a'), (2, 'b')")
        sess.sql("INSERT INTO db1.kv VALUES (2, 'b2')")
        rows = sess.sql("SELECT k, v FROM db1.kv ORDER BY k").collect()
        assert [(r["k"], r["v"]) for r in rows] == [(1, "a"), (2, "b2")]
        assert [r.tableName for r in sess.sql("SHOW TABLES IN db1").collect()] == ["kv"]
        sess.sql("DROP TABLE db1.kv")
        with pytest.raises(RESTError) as ei:
            cat.api.get_table("db1", "kv")
        assert ei.value.code == 404


class TestTwoProcess:
    def test_subprocess_server(self, spark, tmp_path):
        """The real deployment shape: the catalog service in its own
        process; one client creates+writes, a second client reads."""
        wh = str(tmp_path / "wh")
        proc = subprocess.Popen(
            [sys.executable, "-m", "flink_table_store_spark.rest.server",
             "--warehouse", wh, "--token", "tok123"],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        try:
            line = proc.stdout.readline().strip()
            assert line.startswith("READY ")
            uri = line.split(" ", 1)[1]
            writer = RESTCatalog(uri, token="tok123")
            t = writer.create_table("db1.kv", KV, primary_keys=["k"])
            t.write(spark.createDataFrame([(1, "a"), (2, "b")], KV))
            reader = RESTCatalog(uri, token="tok123")
            assert reader.list_tables("db1") == ["kv"]
            got = {r["k"]: r["v"] for r in reader.get_table("db1.kv").to_df(spark).collect()}
            assert got == {1: "a", 2: "b"}
            assert reader.api.load_snapshot("db1", "kv").id == 1
        finally:
            proc.terminate()
            proc.wait(timeout=10)


class TestReviewFixes:
    def test_rename_into_missing_database_404(self, rest_catalog):
        cat = rest_catalog
        cat.create_table("db1.a", KV)
        with pytest.raises(RESTError) as ei:
            cat.api.rename_table("db1", "a", "nodb", "a")
        assert ei.value.code == 404
        assert "nodb" not in cat.list_databases(), "no phantom database"

    def test_malformed_json_body_is_400(self, server):
        import urllib.request

        req = urllib.request.Request(
            server.uri + "/v1/databases", data=b"not-json", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400

    def test_is_view_surfaces_auth_errors(self, tmp_path):
        with RESTCatalogServer(str(tmp_path / "wh"), token="t0k") as srv:
            good = RESTCatalog(srv.uri, token="t0k")
            good.create_view("db1.v", "SELECT 1 AS x")
            # wrong token: constructing the catalog itself already 401s,
            # so probe is_view through a raw client with a bad token
            bad = RESTCatalog(srv.uri, token="t0k")
            bad.api.token = "wrong"
            with pytest.raises(RESTError) as ei:
                bad.is_view("db1.v")
            assert ei.value.code == 401

    def test_create_table_conflicting_pk_specs_rejected(self, spark, rest_catalog):
        from flink_table_store_spark.sql import SqlSession

        s = SqlSession(spark, rest_catalog)
        with pytest.raises(ValueError, match="conflicts"):
            s.sql(
                "CREATE TABLE db1.t (a BIGINT, b STRING, PRIMARY KEY (a)) "
                "TBLPROPERTIES ('primary-key'='b')"
            )
        # agreeing specs are fine, and the option does not persist
        t = s.sql(
            "CREATE TABLE db1.t (a BIGINT, b STRING, PRIMARY KEY (a)) "
            "TBLPROPERTIES ('primary-key'='a')"
        )
        assert t.schema.primary_keys == ["a"]
        assert "primary-key" not in t.schema.options

    def test_table_details_paged(self, rest_catalog):
        cat = rest_catalog
        for i in range(5):
            cat.create_table(f"db1.t{i}", KV, primary_keys=["k"])
        details = cat.api.list_table_details("db1")
        assert [d["name"] for d in details] == [f"db1.t{i}" for i in range(5)]
        assert all(d["schema"]["primaryKeys"] == ["k"] for d in details)
        only = cat.api.list_table_details("db1", pattern="t3")
        assert [d["name"] for d in only] == ["db1.t3"]


class TestMaintenanceThroughRest:
    def test_compact_and_expire_commit_via_service(self, spark, rest_catalog):
        """CALL sys.compact on a REST-loaded table: the COMPACT snapshot
        must be committed THROUGH the service CAS endpoint (counted on
        the client), and snapshot expiry + reads keep working."""
        from flink_table_store_spark.sql import SqlSession

        cat = rest_catalog
        cat.create_table(
            "db1.m", KV, primary_keys=["k"],
            options={"bucket": "1", "snapshot.num-retained.min": "1"},
        )
        sess = SqlSession(spark, cat)
        for i in range(4):
            sess.sql(f"INSERT INTO db1.m VALUES ({i}, 'v{i}'), (9, 'w{i}')")
        calls = []
        orig = cat.api.commit_snapshot

        def counting(*a, **kw):
            calls.append(a)
            return orig(*a, **kw)

        cat.api.commit_snapshot = counting
        sess.sql("CALL sys.compact(table => 'db1.m')")
        assert len(calls) == 1, "compaction snapshot must commit via REST"
        t = cat.get_table("db1.m")
        assert t.snapshots.latest().commit_kind == "COMPACT"
        sess.sql("CALL sys.expire_snapshots(table => 'db1.m', retain_last => 1)")
        got = {r.k: r.v for r in sess.sql("SELECT k, v FROM db1.m").collect()}
        assert got == {0: "v0", 1: "v1", 2: "v2", 3: "v3", 9: "w3"}

    def test_streaming_source_over_rest_table(self, spark, rest_catalog):
        """SnapshotStream over a REST-loaded table: full snapshot then
        per-commit deltas, with every upstream write committed through
        the service CAS."""
        from flink_table_store_spark.streaming.source import SnapshotStream

        cat = rest_catalog
        t = cat.create_table("db1.s", KV, primary_keys=["k"], options={"bucket": "1"})
        t.write(spark.createDataFrame([(1, "a"), (2, "b")], KV))
        s = SnapshotStream(t, startup_mode="latest-full")
        first = s.poll(spark)
        assert len(first) == 1 and first[0][1].count() == 2
        t.write(spark.createDataFrame([(2, "b2"), (3, "c")], KV))
        nxt = s.poll(spark)
        assert {r.k: r.v for r in nxt[0][1].collect()} == {2: "b2", 3: "c"}
        assert cat.api.load_snapshot("db1", "s").id == 2


class TestVersionManagement:
    """RESTCatalog.java:327 listSnapshotsPaged, :378 rollbackTo,
    :565 registerTable, :595 listPartitions, + tag/branch routes —
    a second client manages table history purely through the service."""

    def test_two_client_history_and_rollback(self, spark, rest_catalog, server):
        cat_a = rest_catalog
        cat_b = RESTCatalog(server.uri)
        ta = cat_a.create_table(
            "db1.h", _schema(("k", T.LongType()), ("v", T.StringType()), ("pt", T.StringType())),
            partition_keys=["pt"], primary_keys=["k", "pt"], options={"bucket": "1"},
        )
        sch = ta.schema.spark_schema()
        ta.write(spark.createDataFrame([(1, "a", "p0"), (2, "b", "p1")], sch))
        ta.write(spark.createDataFrame([(3, "c", "p1")], sch))
        ta.create_tag("rel-1", snapshot_id=1)  # routed through the service
        # client B enumerates history over HTTP
        snaps = cat_b.api.list_snapshots("db1", "h")
        assert [s.id for s in snaps] == [1, 2]
        page, tok = cat_b.api.list_snapshots_paged("db1", "h", max_results=1)
        assert [s.id for s in page] == [1] and tok == "1"
        page2, tok2 = cat_b.api.list_snapshots_paged("db1", "h", max_results=1, page_token=tok)
        assert [s.id for s in page2] == [2] and tok2 is None
        parts = cat_b.api.list_partitions("db1", "h")
        assert {p["spec"]["pt"]: p["recordCount"] for p in parts} == {"p0": 1, "p1": 2}
        assert all(p["fileCount"] >= 1 and p["fileSizeInBytes"] > 0 for p in parts)
        assert [t["name"] for t in cat_b.api.list_tags("db1", "h")] == ["rel-1"]
        # client B rolls back to the tag purely over HTTP
        tb = cat_b.get_table("db1.h")
        cat_b.api.rollback_to("db1", "h", tag_name="rel-1")
        assert cat_a.get_table("db1.h").snapshots.latest_id() == 1
        got = {r["k"]: r["v"] for r in tb.to_df(spark).collect()}
        assert got == {1: "a", 2: "b"}

    def test_rollback_validation(self, spark, rest_catalog):
        t = rest_catalog.create_table("db1.r", KV, primary_keys=["k"])
        t.write(spark.createDataFrame([(1, "a")], KV))
        with pytest.raises(RESTError) as ei:
            rest_catalog.api.rollback_to("db1", "r", snapshot_id=99)
        assert ei.value.code == 404
        with pytest.raises(RESTError) as ei:
            rest_catalog.api.rollback_to("db1", "r", tag_name="nope")
        assert ei.value.code == 404
        with pytest.raises(RESTError) as ei:
            rest_catalog.api.rollback_to("db1", "r")
        assert ei.value.code == 400

    def test_tag_and_branch_routes(self, spark, rest_catalog):
        cat = rest_catalog
        t = cat.create_table("db1.b", KV, primary_keys=["k"], options={"bucket": "1"})
        t.write(spark.createDataFrame([(1, "a")], KV))
        t.write(spark.createDataFrame([(2, "b")], KV))
        t.create_tag("t1", snapshot_id=1)
        with pytest.raises(RESTError) as ei:
            cat.api.create_tag("db1", "b", "t1")
        assert ei.value.code == 409
        with pytest.raises(RESTError) as ei:
            cat.api.create_tag("db1", "b", "t2", snapshot_id=42)  # no such snapshot
        assert ei.value.code == 400
        # branches through the service
        br = t.create_branch("dev", snapshot_id=1)
        assert [b["name"] for b in cat.api.list_branches("db1", "b")] == ["dev"]
        assert cat.api.list_branches("db1", "b")[0]["fromSnapshot"] == 1
        br.write(spark.createDataFrame([(9, "z")], KV))
        # branch commits are branch-local; main is untouched
        assert cat.get_table("db1.b").snapshots.latest_id() == 2
        got = {r["k"]: r["v"] for r in cat.get_table("db1.b@dev").to_df(spark).collect()}
        assert got == {1: "a", 9: "z"}
        with pytest.raises(RESTError) as ei:
            cat.api.create_branch("db1", "b", "dev")
        assert ei.value.code == 409
        t.delete_branch("dev")
        assert cat.api.list_branches("db1", "b") == []
        t.delete_tag("t1")
        assert cat.api.list_tags("db1", "b") == []
        with pytest.raises(RESTError) as ei:
            cat.api.delete_tag("db1", "b", "t1")
        assert ei.value.code == 404

    def test_rollback_procedure_routes_through_service(self, spark, rest_catalog):
        """CALL sys.rollback on a REST catalog goes through the HTTP
        route (the RESTTable override), not direct filesystem deletes."""
        from flink_table_store_spark.sql import SqlSession

        cat = rest_catalog
        t = cat.create_table("db1.p", KV, primary_keys=["k"])
        t.write(spark.createDataFrame([(1, "a")], KV))
        t.write(spark.createDataFrame([(2, "b")], KV))
        calls = []
        orig = cat.api.rollback_to

        def counting(*a, **kw):
            calls.append((a, kw))
            return orig(*a, **kw)

        cat.api.rollback_to = counting
        SqlSession(spark, cat).sql("CALL sys.rollback(table => 'db1.p', snapshot_id => 1)")
        assert len(calls) == 1, "rollback must route through the REST API"
        assert cat.get_table("db1.p").snapshots.latest_id() == 1

    def test_register_table(self, spark, rest_catalog, tmp_path):
        """registerTable adopts an EXISTING external table directory —
        metadata-only (symlink), data stays in place."""
        from flink_table_store_spark.catalog import Catalog

        ext_wh = str(tmp_path / "external")
        ext = Catalog(ext_wh)
        te = ext.create_table("old.t", KV, primary_keys=["k"])
        te.write(spark.createDataFrame([(1, "a"), (2, "b")], KV))
        src = ext.table_path("old.t")

        t = rest_catalog.register_table("db1.adopted", src)
        got = {r["k"]: r["v"] for r in t.to_df(spark).collect()}
        assert got == {1: "a", 2: "b"}
        # idempotent re-register; conflicting register is 409
        rest_catalog.register_table("db1.adopted", src)
        te2 = ext.create_table("old.u", KV)
        with pytest.raises(RESTError) as ei:
            rest_catalog.api.register_table("db1", "adopted", ext.table_path("old.u"))
        assert ei.value.code == 409
        with pytest.raises(RESTError) as ei:
            rest_catalog.api.register_table("db1", "ghost", str(tmp_path / "nowhere"))
        assert ei.value.code == 404
        # commits on the adopted table still flow through the service CAS
        t.write(spark.createDataFrame([(3, "c")], KV))
        assert rest_catalog.api.load_snapshot("db1", "adopted").id == 2

    def test_auth_required_on_version_routes(self, tmp_path):
        with RESTCatalogServer(str(tmp_path / "wh"), token="t0k") as srv:
            good = RESTCatalog(srv.uri, token="t0k")
            good.create_table("db1.t", KV)
            bad = RESTCatalog(srv.uri, token="t0k")
            bad.api.token = "wrong"
            for probe in (
                lambda: bad.api.list_snapshots("db1", "t"),
                lambda: bad.api.rollback_to("db1", "t", snapshot_id=1),
                lambda: bad.api.list_partitions("db1", "t"),
                lambda: bad.api.list_tags("db1", "t"),
                lambda: bad.api.list_branches("db1", "t"),
                lambda: bad.api.register_table("db1", "x", "/tmp/x"),
            ):
                with pytest.raises(RESTError) as ei:
                    probe()
                assert ei.value.code == 401


class TestArbiterSerialization:
    def test_concurrent_same_name_create_one_wins(self, server):
        """Two threads racing create_table on the same name: the service
        lock guarantees exactly one 200 and one 409 (no double-success
        from the check-then-act window)."""
        import threading

        api_a = RESTCatalog(server.uri).api
        api_b = RESTCatalog(server.uri).api
        from flink_table_store_spark.schema import from_spark_schema

        ts = from_spark_schema(KV, None, None, None)
        api_a.create_database("db1")
        barrier = threading.Barrier(2)
        results: list[object] = [None, None]

        def racer(i, api):
            barrier.wait()
            try:
                api.create_table("db1", "same", ts)
                results[i] = 200
            except RESTError as e:
                results[i] = e.code

        th = [
            threading.Thread(target=racer, args=(0, api_a)),
            threading.Thread(target=racer, args=(1, api_b)),
        ]
        [t.start() for t in th]
        [t.join() for t in th]
        assert sorted(results) == [200, 409], results

        # same for databases
        results = [None, None]
        barrier = threading.Barrier(2)

        def db_racer(i, api):
            barrier.wait()
            try:
                api.create_database("racedb")
                results[i] = 200
            except RESTError as e:
                results[i] = e.code

        th = [
            threading.Thread(target=db_racer, args=(0, api_a)),
            threading.Thread(target=db_racer, args=(1, api_b)),
        ]
        [t.start() for t in th]
        [t.join() for t in th]
        assert sorted(results) == [200, 409], results

    def test_config_rejects_foreign_warehouse(self, server, tmp_path):
        """The served warehouse is authoritative: asking for a different
        one is a 400, not a silent split-brain echo."""
        with pytest.raises(RESTError) as ei:
            RESTCatalog(server.uri, warehouse=str(tmp_path / "other"))
        assert ei.value.code == 400
        # asking for the right one (or none) is fine
        cat = RESTCatalog(server.uri, warehouse=server.service.catalog.warehouse)
        assert cat.warehouse == server.service.catalog.warehouse
