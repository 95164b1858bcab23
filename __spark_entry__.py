"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 over the
engine-managed partitioned lineitem table). ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
plus the training-data pipeline operators; the driver cross-checks
them against DuckDB at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from flink_table_store_spark.queries import q1_pricing_summary

    return q1_pricing_summary(_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from flink_table_store_spark.queries import QUERIES

    return {
        name: (lambda spark, sf_dir, fn=fn: fn(_configure(spark), sf_dir))
        for name, (fn, _sql) in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries get rows-only checks."""
    from flink_table_store_spark.queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
