"""Partition-scoped compaction (CompactProcedure.java:117-126:
``partitions`` / ``where`` / ``partition_idle_time``): at scale you
compact one day's partition, not the table."""

from __future__ import annotations

import pytest

from flink_table_store_spark import predicate as P
from flink_table_store_spark import procedures


def _levels_by_partition(spark, t):
    import json

    from flink_table_store_spark.sources.system_tables import system_table

    rows = system_table(spark, t.refresh(), "files").collect()
    out: dict = {}
    for r in rows:
        pt = json.loads(r.partition).get("pt")
        out.setdefault(pt, []).append(r.level)
    return out


def _fill(spark, t):
    ddl = "k bigint, v bigint, pt string"
    for b in range(3):  # 3 commits -> 3 level-0 runs per partition
        t.refresh().write(spark.createDataFrame(
            [(b * 10 + i, i, p) for i in range(5) for p in ("a", "b")], ddl
        ))


def test_compact_partitions_spec(spark, warehouse):
    t = warehouse.create_table(
        "db.cps1", "k bigint, v bigint, pt string",
        primary_keys=["k", "pt"], partition_keys=["pt"],
        options={"bucket": "1"},
    )
    _fill(spark, t)
    before = t.refresh().to_df(spark).count()
    procedures.call(spark, warehouse, "compact", table="db.cps1", partitions="pt=a")
    lv = _levels_by_partition(spark, t)
    assert all(x > 0 for x in lv["a"]) and len(lv["a"]) == 1  # single max-level run
    assert any(x == 0 for x in lv["b"])  # untouched
    assert t.refresh().to_df(spark).count() == before


def test_compact_where(spark, warehouse):
    t = warehouse.create_table(
        "db.cps2", "k bigint, v bigint, pt string",
        primary_keys=["k", "pt"], partition_keys=["pt"],
        options={"bucket": "1"},
    )
    _fill(spark, t)
    procedures.call(spark, warehouse, "compact", table="db.cps2", where="pt = 'b'")
    lv = _levels_by_partition(spark, t)
    assert len(lv["b"]) == 1 and any(x == 0 for x in lv["a"])
    # non-partition columns refused
    with pytest.raises(ValueError, match="partition columns"):
        procedures.call(spark, warehouse, "compact", table="db.cps2", where="v = 1")


def test_compact_partition_idle_time(spark, warehouse):
    t = warehouse.create_table(
        "db.cps3", "k bigint, v bigint, pt string",
        primary_keys=["k", "pt"], partition_keys=["pt"],
        options={"bucket": "1"},
    )
    _fill(spark, t)
    # everything was written milliseconds ago: a 1 d idle bar skips all
    procedures.call(
        spark, warehouse, "compact", table="db.cps3", partition_idle_time="1 d"
    )
    lv = _levels_by_partition(spark, t)
    assert any(x == 0 for x in lv["a"]) and any(x == 0 for x in lv["b"])
    # a zero idle bar compacts everything
    procedures.call(
        spark, warehouse, "compact", table="db.cps3", partition_idle_time="0 ms"
    )
    lv = _levels_by_partition(spark, t)
    assert len(lv["a"]) == 1 and len(lv["b"]) == 1
    # reference refusal: sort compact has no idle-time notion
    with pytest.raises(ValueError, match="partition_idle_time"):
        procedures.call(
            spark, warehouse, "compact", table="db.cps3",
            order_strategy="zorder", order_by="k,v", partition_idle_time="1 h",
        )


def test_compact_api_partition_filter(spark, warehouse):
    t = warehouse.create_table(
        "db.cps4", "k bigint, v bigint, pt string",
        primary_keys=["k", "pt"], partition_keys=["pt"],
        options={"bucket": "1"},
    )
    _fill(spark, t)
    t.refresh().compact(spark, partition_filter=P.equal("pt", "a"))
    lv = _levels_by_partition(spark, t)
    assert len(lv["a"]) == 1 and any(x == 0 for x in lv["b"])


def test_compact_database_regex_filters(spark, warehouse):
    """CompactDatabaseProcedure: including/excluding regexes."""
    for name in ("db.cdb_a", "db.cdb_b", "db.cdb_skip"):
        t = warehouse.create_table(name, "k bigint", primary_keys=["k"])
        t.write(spark.createDataFrame([(1,), (2,)], "k bigint"))
    out = procedures.call(
        spark, warehouse, "compact_database",
        including_databases="db", including_tables="cdb_.*",
        excluding_tables="cdb_skip",
    )
    done = {k for k in out if k.startswith("db.cdb_")}
    assert done == {"db.cdb_a", "db.cdb_b"}
    out2 = procedures.call(
        spark, warehouse, "compact_database", including_databases="nomatch"
    )
    assert not {k for k in out2 if k.startswith("db.cdb_")}


def test_procedure_dynamic_options(spark, warehouse):
    """Every procedure accepts options => 'k=v,...' — per-call dynamic
    options overlaying the table's schema in memory (never persisted);
    the overlay survives internal refresh() calls."""
    t = warehouse.create_table(
        "db.dynopt", "k bigint, v bigint", primary_keys=["k"],
        options={"bucket": "1"},
    )
    for b in range(3):
        t.refresh().write(spark.createDataFrame([(b, b)], "k bigint, v bigint"))
    # snapshot retention driven by the CALL's dynamic options: keep 1
    procedures.call(
        spark, warehouse, "expire_snapshots", table="db.dynopt",
        options="snapshot.num-retained.max=1,snapshot.num-retained.min=1",
    )
    t = t.refresh()
    assert len(t.snapshots.snapshot_ids()) == 1
    # nothing persisted
    assert "snapshot.num-retained.max" not in t.schema.options


def test_compact_scope_arg_conflicts(spark, warehouse):
    """Review regressions: partitions+where together refused; a scoped
    sort compact refused instead of silently relayouting everything."""
    t = warehouse.create_table(
        "db.cps_conf", "k bigint, v bigint, pt string",
        primary_keys=["k", "pt"], partition_keys=["pt"],
        options={"bucket": "1"},
    )
    _fill(spark, t)
    with pytest.raises(ValueError, match="cannot be used together"):
        procedures.call(
            spark, warehouse, "compact", table="db.cps_conf",
            partitions="pt=a", where="pt = 'b'",
        )
    with pytest.raises(ValueError, match="sort compact"):
        procedures.call(
            spark, warehouse, "compact", table="db.cps_conf",
            order_strategy="zorder", order_by="k,v", partitions="pt=a",
        )
