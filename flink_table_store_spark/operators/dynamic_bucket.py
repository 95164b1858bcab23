"""Dynamic bucket assignment (SURVEY §2.1 S18; BucketMode.HASH_DYNAMIC).

Reference: PK tables with ``bucket = -1`` assign each NEW key to a
bucket at write time, filling buckets up to
``dynamic-bucket.target-row-num`` keys, via a persistent key-hash →
bucket index (HashBucketAssigner; Spark side
PaimonSparkWriter.scala:188-238 ``writeWithBucketAssigner``).

Spark-native shape: the index is parquet under ``index/hash-index/``
(rows: partition-json, key_hash, bucket). Assignment is one outer join
of the incoming batch against the index — existing keys keep their
bucket (a key must stay in one bucket or merge-on-read would see it
twice), new keys are ranked deterministically and fill buckets
sequentially. All distributed; the index is O(live keys), tiny rows.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_table_store_spark.schema import TableSchema
from flink_table_store_spark.write import BUCKET_COL

INDEX_SUBDIR = os.path.join("index", "hash-index")
_IDX_SCHEMA = "partition string, key_hash bigint, bucket int"


def index_dir(table_path: str) -> str:
    return os.path.join(table_path, INDEX_SUBDIR)


def load_index(spark: SparkSession, table_path: str) -> DataFrame:
    d = index_dir(table_path)
    files = (
        [os.path.join(d, n) for n in sorted(os.listdir(d)) if n.endswith(".parquet")]
        if os.path.isdir(d)
        else []
    )
    if not files:
        return spark.createDataFrame([], _IDX_SCHEMA)
    return spark.read.parquet(*files)


def _key_hash(schema: TableSchema):
    return F.xxhash64(*[F.col(k) for k in schema.trimmed_primary_keys()])


def _partition_json(schema: TableSchema):
    if not schema.partition_keys:
        return F.lit("{}")
    pairs = []
    for k in sorted(schema.partition_keys):
        pairs.append(F.concat(F.lit(f'"{k}": "'), F.col(k).cast("string"), F.lit('"')))
    return F.concat(F.lit("{"), F.concat_ws(", ", *pairs), F.lit("}"))


def _new_bucket_expr(target: int, initial: int, max_b: int):
    """New-key bucket from the key's fill position (``__n + __rank``).

    Sequential fill by default; ``dynamic-bucket.initial-buckets``
    spreads the first ``initial * target`` keys round-robin over the
    initial buckets (early writes parallelize instead of queueing on
    bucket 0); ``dynamic-bucket.max-buckets`` caps growth — once the
    cap is reached new keys land at ``hash % max`` (HashBucketAssigner's
    bounded mode), so buckets grow past target instead of multiplying."""
    pos = F.col("__n") + F.col("__rank")
    seq = (pos / target).cast("int")
    newb = (
        F.when(pos < initial * target, F.pmod(pos, F.lit(initial)).cast("int"))
        .otherwise(seq)
        if initial > 0
        else seq
    )
    if max_b > 0:
        newb = F.when(
            newb >= max_b, F.pmod(F.col("__kh"), F.lit(max_b)).cast("int")
        ).otherwise(newb)
    return newb


def assign_buckets(
    spark: SparkSession, df: DataFrame, table_path: str, schema: TableSchema
) -> DataFrame:
    """Return ``df`` + ``_bucket`` and persist new-key assignments.

    One join against the index (broadcast while small, shuffle at
    scale) + one per-partition rank for the new keys. Deterministic:
    new keys are ordered by key_hash.
    """
    target = int(schema.options.get("dynamic-bucket.target-row-num", "2000000"))
    initial = int(schema.options.get("dynamic-bucket.initial-buckets", "0") or 0)
    max_b = int(schema.options.get("dynamic-bucket.max-buckets", "-1"))
    if max_b == 0 or max_b < -1:
        raise ValueError(
            "dynamic-bucket.max-buckets must be -1 (unlimited) or > 0, "
            f"got {max_b}"
        )
    idx = load_index(spark, table_path)
    keyed = df.withColumn("__kh", _key_hash(schema)).withColumn("__pt", _partition_json(schema))

    joined = keyed.join(
        idx.select(
            F.col("partition").alias("__pt"),
            F.col("key_hash").alias("__kh"),
            F.col("bucket").alias("__existing"),
        ),
        on=["__pt", "__kh"],
        how="left",
    )

    stats = (
        idx.groupBy("partition")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(F.col("partition").alias("__pt"), "__n")
    )
    new_keys = (
        joined.where(F.col("__existing").isNull())
        .select("__pt", "__kh")
        .distinct()
        .join(stats, on="__pt", how="left")
        .withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
        .withColumn(
            "__rank",
            F.row_number().over(Window.partitionBy("__pt").orderBy("__kh")) - 1,
        )
        .withColumn("__newb", _new_bucket_expr(target, initial, max_b))
        .select("__pt", "__kh", "__newb")
    )

    # persist the new assignments (one consolidated file per commit)
    staging = os.path.join(table_path, "staging", f"idx-{uuid.uuid4().hex}")
    new_keys.select(
        F.col("__pt").alias("partition"),
        F.col("__kh").alias("key_hash"),
        F.col("__newb").alias("bucket"),
    ).write.parquet(staging)
    tbl = pq.read_table(staging)
    shutil.rmtree(staging, ignore_errors=True)
    if tbl.num_rows:
        os.makedirs(index_dir(table_path), exist_ok=True)
        pq.write_table(
            tbl.cast(
                pa.schema(
                    [("partition", pa.string()), ("key_hash", pa.int64()), ("bucket", pa.int32())]
                )
            ),
            os.path.join(index_dir(table_path), f"idx-{uuid.uuid4().hex}.parquet"),
            compression="zstd",
        )

    assigned = (
        joined.join(new_keys, on=["__pt", "__kh"], how="left")
        .withColumn(BUCKET_COL, F.coalesce(F.col("__existing"), F.col("__newb")).cast("int"))
        .drop("__pt", "__kh", "__existing", "__newb")
    )
    return assigned
