"""The SQL surface of flink_table_store_spark in one runnable tour.

Everything here goes through ``SqlSession.sql`` — the reference's
Spark SQL surface re-expressed in Python:

  1. DDL + INSERT + plain SELECT with automatic engine-table rewriting
  2. co-located JOIN auto-elision (zero-shuffle bucketed join from
     ordinary SQL)
  3. ASOF JOIN as native grammar (DuckDB syntax, union-tag zero-join
     plan)
  4. temporal TVFs: sessionize and funnel
  5. rollup-aware routing: an aggregate over raw history answered from
     the continuous aggregate, raw table unscanned
  6. CALL procedures (rollup create/refresh incl. snapshot-incremental)

Usage: python examples/sql_surface.py [sf_dir] [warehouse_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_table_store_spark.catalog import Catalog
from flink_table_store_spark.queries import _events
from flink_table_store_spark.session import get_spark
from flink_table_store_spark.sql import SqlSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wh = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ftss_sql_demo"
    shutil.rmtree(wh, ignore_errors=True)
    spark = get_spark("sql-surface")
    cat = Catalog(wh)
    s = SqlSession(spark, cat, rollup_routing=True)
    ev = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    # 1. DDL + INSERT + SELECT
    s.sql(
        "CREATE TABLE db.events (event_id BIGINT, ts TIMESTAMP, "
        "user_id BIGINT, event_type STRING, value DOUBLE)"
    )
    ev.createOrReplaceTempView("__feed")
    s.sql("INSERT INTO db.events SELECT * FROM __feed")
    n = s.sql("SELECT count(*) AS n FROM db.events").collect()[0].n
    print(f"events loaded:        {n}")

    # 2. co-located join auto-elision: two tables bucketed on the same
    # key join WITHOUT an Exchange (the DSv2 KeyGroupedPartitioning
    # behavior, done by the SQL frontend)
    s.sql(
        "CREATE TABLE db.users (user_id BIGINT, tier STRING, "
        "PRIMARY KEY (user_id)) TBLPROPERTIES ('bucket' = '4')"
    )
    ev.select("user_id").distinct().withColumn(
        "tier", F.when(F.col("user_id") % 3 == 0, "gold").otherwise("basic")
    ).createOrReplaceTempView("__users")
    s.sql("INSERT INTO db.users SELECT * FROM __users")
    s.sql(
        "CREATE TABLE db.purchases (user_id BIGINT, event_id BIGINT, "
        "value DOUBLE, PRIMARY KEY (user_id, event_id)) "
        "TBLPROPERTIES ('bucket' = '4', 'bucket-key' = 'user_id')"
    )
    ev.where("event_type = 'purchase'").select(
        "user_id", "event_id", "value"
    ).createOrReplaceTempView("__purch")
    s.sql("INSERT INTO db.purchases SELECT * FROM __purch")
    top = s.sql(
        "SELECT u.tier AS tier, count(*) AS n, round(sum(p.value), 2) AS total "
        "FROM db.purchases p JOIN db.users u ON p.user_id = u.user_id "
        "GROUP BY u.tier ORDER BY tier"
    )
    for r in top.collect():
        print(f"purchases[{r.tier:5}]:    n={r.n} total={r.total}")

    # 3. ASOF JOIN grammar: each purchase picks up the user's latest
    # prior 'view' event (inner semantics drop never-viewed)
    asof = s.sql(
        "SELECT count(*) AS matched, "
        "round(avg(p.value), 2) AS avg_purchase "
        "FROM db.purchases p ASOF JOIN db.events e "
        "ON p.user_id = e.user_id AND p.event_id >= e.event_id"
    ).collect()[0]
    print(f"asof-matched:         {asof.matched} (avg {asof.avg_purchase})")

    # 4. temporal TVFs
    sess = s.sql(
        "SELECT count(DISTINCT user_id) AS users, max(session_id) AS deepest "
        "FROM paimon_sessionize('db.events', 'ts', 1800, 'user_id')"
    ).collect()[0]
    print(f"sessions:             {sess.users} users, deepest #{sess.deepest}")
    fun = s.sql(
        "SELECT count(*) AS started, count(step_2_ts) AS converted "
        "FROM paimon_funnel('db.events', 'view,purchase')"
    ).collect()[0]
    print(f"funnel view->buy:     {fun.converted}/{fun.started}")

    # 5 + 6. continuous aggregate: CALL-created, snapshot-incremental
    # refresh, then a routed query that never scans raw history
    s.sql(
        "CALL sys.create_rollup(rollup => 'db.events_1h', "
        "time_col => 'ts', interval => '1 hour', "
        "group_cols => 'event_type string', "
        "metrics => 'n=*:count,nv=value:count,sv=value:sum', "
        "source => 'db.events')"   # links raw -> rollup for routing
    )
    s.sql(
        "CALL sys.refresh_rollup(rollup => 'db.events_1h', "
        "from_table => 'db.events', incremental => true)"
    )
    q = ("SELECT event_type, count(*) AS n, avg(value) AS avg_value "
         "FROM db.events GROUP BY event_type ORDER BY event_type")
    assert s._route_rollup(q) is not None
    routed = s.sql(q)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "events_1h" not in q and "db.events" in q
    print("routed from rollup (raw unscanned):")
    for r in routed.collect():
        print(f"  {r.event_type}: n={r.n} avg={round(r.avg_value, 2)}")


if __name__ == "__main__":
    main()
