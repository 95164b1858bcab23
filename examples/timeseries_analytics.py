"""Event-stream analytics with flink_table_store_spark.

Runnable walkthrough of the temporal-analytics operators over the
sf0.001 events table:

    raw events ─▶ continuous hourly rollup (engine-native refresh)
               ─▶ gap sessionization (30-min silence)
               ─▶ as-of enrichment (each view picks up the latest
                  prior click) ─▶ per-session funnel summary

Deterministic end to end. Usage:

    python examples/timeseries_analytics.py [sf_dir] [warehouse_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_table_store_spark.catalog import Catalog
from flink_table_store_spark.operators.rollup import (
    create_rollup_table,
    rollup_avg,
    update_rollup,
)
from flink_table_store_spark.operators.temporal import as_of_join
from flink_table_store_spark.queries import _events
from flink_table_store_spark.session import get_spark
from flink_table_store_spark.streaming.stateful import sessionize


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wh = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ftss_ts_demo"
    shutil.rmtree(wh, ignore_errors=True)
    spark = get_spark("timeseries-analytics")
    cat = Catalog(wh)
    ev = _events(spark, sf_dir)

    # 1. continuous rollup: hourly per-type counts/sums maintained by
    # the aggregation merge engine — two "days" of feed fold in as two
    # identifier-checked refreshes, O(batch) each
    ru = create_rollup_table(
        cat, "db.events_1h", time_col="ts", interval="1 hour",
        group_cols=[("event_type", "string")],
        metrics={"n": ("*", "count"), "sum_value": ("value", "sum")},
    )
    update_rollup(ru, ev.where(F.col("event_id") % 2 == 0), "b0")
    update_rollup(ru, ev.where(F.col("event_id") % 2 == 1), "b1")
    hourly = ru.refresh().to_df(spark).withColumn(
        "avg_value", F.round(rollup_avg("sum_value", "n"), 2)
    )
    print(f"rollup cells:    {hourly.count()}")

    # 2. sessionize: 30 minutes of silence closes a session
    sess = sessionize(ev, "ts", 1800, ["user_id"], order_cols=["event_id"])
    n_sessions = sess.select("user_id", "session_id").distinct().count()
    print(f"sessions:        {n_sessions}")

    # 3. as-of: each view joins its latest prior click (one keyed
    # shuffle, zero joins)
    views = sess.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "session_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    enriched = as_of_join(
        views, clicks, "ts", by=["user_id"], right_cols=["click_value"],
        tolerance_seconds=3600,
    )
    with_click = enriched.where(F.col("click_value").isNotNull()).count()
    print(f"views w/ click:  {with_click} (within 1h) of {views.count()}")

    # 4. per-session summary ordered by activity
    top = (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy(F.desc("n_events"), "user_id", "session_id")
        .limit(3)
        .collect()
    )
    for r in top:
        print(f"  top session: user {r['user_id']} #{r['session_id']} "
              f"events={r['n_events']} value={r['sum_value']}")

    # 5. the SQL surface (round 11): the same operators as table-valued
    # functions, plus rollup-aware routing — an in-spec aggregate over
    # the RAW table answers from the rollup without scanning history
    from flink_table_store_spark.operators.rollup import rollup_distinct_at
    from flink_table_store_spark.sql import SqlSession

    raw = cat.create_table(
        "db.events_raw", ev.select("ts", "event_type", "user_id", "value").schema
    )
    raw.write(ev.select("ts", "event_type", "user_id", "value"))
    ru2 = create_rollup_table(
        cat, "db.events_1d", time_col="ts", interval="1 day",
        group_cols=[("event_type", "string")],
        metrics={
            "n": ("*", "count"),
            "sv": ("value", "sum"),
            "nv": ("value", "count"),
            "uniq": ("user_id", "hll"),   # distinct users, any grain
        },
        source="db.events_raw",           # links raw -> rollup for routing
    )
    update_rollup(ru2, ev.select("ts", "event_type", "user_id", "value"), "seed")

    s = SqlSession(spark, cat, rollup_routing=True)
    routed = s.sql(
        "SELECT event_type, count(*) AS n, avg(value) AS avg_value "
        "FROM db.events_raw GROUP BY event_type ORDER BY event_type"
    )
    print("routed aggregate (raw table never scanned):")
    for r in routed.collect():
        print(f"  {r['event_type']}: n={r['n']} avg={round(r['avg_value'], 2)}")
    uniq = (
        ru2.refresh().to_df(spark)
        .agg(rollup_distinct_at("uniq").cast("bigint").alias("u"))
        .collect()[0]["u"]
    )
    print(f"distinct users (HLL union over daily cells): {uniq}")

    tvf = s.sql(
        "SELECT user_id, count(*) AS n_sessions FROM ("
        "SELECT DISTINCT user_id, session_id FROM "
        "paimon_sessionize('db.events_raw', 'ts', 1800, 'user_id')) "
        "GROUP BY user_id ORDER BY n_sessions DESC, user_id LIMIT 3"
    )
    print("busiest users by session count (paimon_sessionize TVF):")
    for r in tvf.collect():
        print(f"  user {r['user_id']}: {r['n_sessions']} sessions")


if __name__ == "__main__":
    main()
