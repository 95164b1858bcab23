"""Adjudicate mor_read_10x: plan-time vs execute-time split.

Run AFTER `python bench.py` (reuses /tmp/ftss_bench_wh's
bench.lineitem_pk_10x, 6M rows, 2 LSM runs/bucket). Prints median-of-3
for (a) driver planning only (manifest read + plan_scan), (b) DataFrame
construction (planning + Spark plan assembly, no job), (c) the full
read job — attributing the r8 +14% either to planning (the patch-entry
pass added in r8) or to execution."""

from __future__ import annotations

import statistics
import time

from pyspark.sql import functions as F

from flink_table_store_spark import get_spark
from flink_table_store_spark import read as read_mod
from flink_table_store_spark.catalog import Catalog


def main() -> None:
    spark = get_spark("mor-split")
    t = Catalog("/tmp/ftss_bench_wh").get_table("bench.lineitem_pk_10x")

    def med(fn, n=3):
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        return statistics.median(runs)

    def plan_only():
        rb = t.read_builder()
        snap = t.snapshots.latest()
        entries = rb._plan_entries(spark, snap)
        read_mod.plan_scan(entries, t.schema, None, None, t.path)

    def df_only():
        t.to_df(spark)  # plan + Catalyst assembly, no action

    def full():
        t.to_df(spark).agg(
            F.count(F.lit(1)), F.sum("l_extendedprice"), F.max("l_orderkey")
        ).collect()

    p, d, f = med(plan_only), med(df_only), med(full)
    print(
        f"plan_only={p:.3f}s  df_assembly={d:.3f}s  full_read={f:.3f}s  "
        f"plan_share={p / f:.1%}"
    )


if __name__ == "__main__":
    main()
