"""Primary-key lookup service (paimon-service KvQueryServer/Client +
paimon-core service/ServiceManager): shared-storage discovery, shard
routing, per-bucket caching, snapshot refresh — over loopback HTTP,
with the server running WITHOUT a SparkSession."""

from __future__ import annotations

import time

import pytest

from flink_table_store_spark.service import (
    PRIMARY_KEY_LOOKUP,
    LookupQueryServer,
    RemoteLookupClient,
    ServiceManager,
    shard_of,
)


@pytest.fixture()
def pk_table(spark, warehouse):
    t = warehouse.create_table(
        "db.kv", "k bigint, v string", primary_keys=["k"],
        options={"bucket": "4"},
    )
    t.write(spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k bigint, v string"))
    t.write(spark.createDataFrame([(3, "v3b")], "k bigint, v string"))
    return t


def test_single_server_roundtrip(spark, pk_table):
    with LookupQueryServer(pk_table.path, refresh_interval_sec=999):
        c = RemoteLookupClient(pk_table.path)
        assert c.lookup({"k": 3})["v"] == "v3b"  # merged view
        assert c.lookup({"k": 7})["v"] == "v7"
        assert c.lookup({"k": 999}) is None
        got = c.lookup_batch([{"k": i} for i in (0, 13, 999, 39)])
        assert [r and r["v"] for r in got] == ["v0", "v13", None, "v39"]
    # deregistered on stop
    assert ServiceManager(pk_table.path).service(PRIMARY_KEY_LOOKUP) is None


def test_discovery_file_layout(spark, pk_table):
    import json
    import os

    with LookupQueryServer(pk_table.path) as srv:
        p = os.path.join(
            pk_table.path, "service", f"service-{PRIMARY_KEY_LOOKUP}"
        )
        assert os.path.exists(p)  # ServiceManager.java's exact path shape
        assert json.load(open(p)) == [srv.address]
    with pytest.raises(RuntimeError, match="no lookup service"):
        RemoteLookupClient(pk_table.path).lookup({"k": 1})


def test_two_shard_routing(spark, pk_table):
    s0 = LookupQueryServer(pk_table.path, server_id=0, num_servers=2).start()
    s1 = LookupQueryServer(pk_table.path, server_id=1, num_servers=2).start()
    try:
        c = RemoteLookupClient(pk_table.path)
        got = c.lookup_batch([{"k": i} for i in range(40)])
        assert [r["v"] if r else None for r in got][:4] == ["v0", "v1", "v2", "v3b"]
        # each shard served only its buckets (cache stats prove routing)
        assert s0.stats["misses"] > 0 and s1.stats["misses"] > 0
        # a direct request to the WRONG shard is refused, not answered
        import json as _json
        import urllib.request as _rq

        victim = {"k": 0}
        owner = shard_of(RemoteLookupClient(pk_table.path)._bucket(victim), 2)
        wrong = s1 if owner == 0 else s0
        req = _rq.Request(
            f"http://{wrong.address}/v1/lookup",
            data=_json.dumps({"keys": [victim]}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        import urllib.error as _err

        with pytest.raises(_err.HTTPError) as ei:
            _rq.urlopen(req, timeout=10)
        assert ei.value.code == 409
    finally:
        s0.stop()
        s1.stop()
    assert ServiceManager(pk_table.path).service(PRIMARY_KEY_LOOKUP) is None


def test_refresh_sees_new_commits(spark, pk_table):
    with LookupQueryServer(pk_table.path, refresh_interval_sec=0.0):
        c = RemoteLookupClient(pk_table.path)
        assert c.lookup({"k": 5})["v"] == "v5"
        pk_table.write(spark.createDataFrame([(5, "v5-new")], "k bigint, v string"))
        time.sleep(0.05)
        assert c.lookup({"k": 5})["v"] == "v5-new"


def test_bucket_cache_reuse(spark, pk_table):
    with LookupQueryServer(pk_table.path, refresh_interval_sec=999) as srv:
        c = RemoteLookupClient(pk_table.path)
        for _ in range(3):
            c.lookup({"k": 11})
        st = srv.stats
        assert st["hits"] >= 2  # repeated probes hit the bucket cache


def test_null_key_field_routes_consistently(spark, warehouse):
    """Client and server share ONE bucket hash (bucket_for_key) — a
    NULL-bearing composite key must get a defined answer (no match),
    never a 500 from client/server hash disagreement."""
    t = warehouse.create_table(
        "db.kv2", "k1 bigint, k2 string, v string",
        primary_keys=["k1", "k2"], options={"bucket": "4"},
    )
    t.write(spark.createDataFrame(
        [(i, f"s{i}", f"v{i}") for i in range(20)],
        "k1 bigint, k2 string, v string"))
    s0 = LookupQueryServer(t.path, server_id=0, num_servers=2).start()
    s1 = LookupQueryServer(t.path, server_id=1, num_servers=2).start()
    try:
        c = RemoteLookupClient(t.path)
        # normal probe still green on the composite key
        assert c.lookup({"k1": 7, "k2": "s7"})["v"] == "v7"
        # NULL key field: skipped by the shared hash on BOTH halves ->
        # routes to one agreed shard, finds nothing, returns None
        assert c.lookup({"k1": 7, "k2": None}) is None
        assert c.lookup({"k1": None, "k2": None}) is None
        # client and server literally compute the same bucket
        from flink_table_store_spark.operators.lookup import bucket_for_key

        for kv in ({"k1": 7, "k2": None}, {"k1": None, "k2": "s7"}):
            assert c._bucket(kv) == bucket_for_key(s0._lookup.table, kv)
    finally:
        s0.stop()
        s1.stop()


def test_bucket_for_key_matches_writer_hash(spark, warehouse):
    """The shared pure-python hash equals Spark's xxhash64 with null
    skipped — parity vs an actual Spark eval of the writer expression."""
    import pyspark.sql.functions as F

    from flink_table_store_spark.operators.lookup import bucket_for_key

    t = warehouse.create_table(
        "db.kv3", "k1 bigint, k2 string, v string",
        primary_keys=["k1", "k2"], options={"bucket": "8"},
    )
    probes = [(3, "x"), (3, None), (None, "x"), (None, None)]
    df = spark.createDataFrame(probes, "k1 bigint, k2 string")
    want = [
        r.b for r in df.select(
            F.pmod(F.xxhash64("k1", "k2"), F.lit(8)).alias("b")).collect()
    ]
    got = [bucket_for_key(t, {"k1": a, "k2": b}) for a, b in probes]
    assert got == want


def test_query_service_procedure(spark, pk_table, warehouse):
    """CALL sys.query_service(table, parallelism) — the reference's
    QueryServiceProcedure — starts the sharded service."""
    from flink_table_store_spark.procedures import call

    servers = call(spark, warehouse, "query_service", table="db.kv", parallelism=2)
    try:
        c = RemoteLookupClient(pk_table.path)
        got = c.lookup_batch([{"k": i} for i in (1, 2, 3)])
        assert [r["v"] for r in got] == ["v1", "v2", "v3b"]
    finally:
        for s in servers:
            s.stop()
