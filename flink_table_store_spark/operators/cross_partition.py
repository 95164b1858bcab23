"""Cross-partition primary-key update (SURVEY §2.3 J5; BucketMode
CROSS_PARTITION).

Reference: when the primary key does NOT contain the partition keys,
an upsert may move a key to a different partition; GlobalIndexAssigner
(paimon-core crosspartition/GlobalIndexAssigner.java:79, bootstrap
:90-126) keeps a persistent key→partition index and emits a retraction
(``-D``) into the key's OLD partition before the new row lands.

Spark-native shape: the index is parquet under
``index/global-pk-index/`` holding (trimmed-pk columns, partition
columns, __seq) — typed columns, no serialization scheme. Each upsert
batch does ONE join against the latest index state to find moved keys,
unions synthesized ``-D`` rows (old partition, null values) with the
incoming ``+I`` rows, and appends the batch's key→partition rows to
the index. Retractions — not global merging — keep partition pruning
and rawConvertible reads sound: every (partition, bucket) group is
still self-contained.

Scale: index rows are key + partition columns only, O(live keys);
the per-batch join shuffles just the incoming batch against the index
(broadcast while small). Same cost model as the reference's RocksDB
bootstrap + lookup, expressed relationally.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_table_store_spark.schema import KIND_DELETE, KIND_INSERT, ROW_KIND, TableSchema
from flink_table_store_spark.snapshot import now_millis

INDEX_SUBDIR = os.path.join("index", "global-pk-index")


def _index_dir(table_path: str) -> str:
    return os.path.join(table_path, INDEX_SUBDIR)


def load_key_index(spark: SparkSession, table_path: str, schema: TableSchema) -> DataFrame | None:
    """Latest (key → partition) state: max __seq per key over all index
    files. Returns None when no index exists yet."""
    d = _index_dir(table_path)
    files = (
        [os.path.join(d, n) for n in sorted(os.listdir(d)) if n.endswith(".parquet")]
        if os.path.isdir(d)
        else []
    )
    if not files:
        return None
    pks = schema.trimmed_primary_keys()
    pts = list(schema.partition_keys)
    df = spark.read.parquet(*files)
    cols = ", ".join(f"`{c}`" for c in pts)
    return (
        df.groupBy(*[F.col(k) for k in pks])
        .agg(F.expr(f"max_by(struct({cols}), `__seq`)").alias("__p"))
        .select(*pks, *[F.col(f"__p.{c}").alias(c) for c in pts])
    )


def prepare_cross_partition_batch(
    spark: SparkSession, df: DataFrame, table_path: str, schema: TableSchema
) -> DataFrame:
    """Return the physical row stream for an upsert batch: incoming
    rows (+I, latest occurrence per key) plus ``-D`` retractions in the
    old partition for keys that moved. Also appends the batch's
    key→partition assignments to the global index."""
    pks = schema.trimmed_primary_keys()
    pts = list(schema.partition_keys)
    val_cols = [c for c in schema.field_names() if c not in pks and c not in pts]

    # latest occurrence per key wins within the batch (same contract as
    # sequence-ordered dedup merge)
    ordered = df.withColumn("__ord", F.monotonically_increasing_id())
    payload = ", ".join(f"`{c}`" for c in df.columns)
    latest = (
        ordered.groupBy(*[F.col(k) for k in pks])
        .agg(F.expr(f"max_by(struct({payload}), `__ord`)").alias("__r"))
        .select(*pks, *[F.col(f"__r.{c}").alias(c) for c in df.columns if c not in pks])
    )

    idx = load_key_index(spark, table_path, schema)
    rows = latest.withColumn(ROW_KIND, F.coalesce(F.col(ROW_KIND), F.lit(KIND_INSERT))
                             if ROW_KIND in df.columns else F.lit(KIND_INSERT))
    if idx is not None:
        old = idx.select(*pks, *[F.col(c).alias(f"__old_{c}") for c in pts])
        moved = latest.join(old, on=pks, how="inner").where(
            ~F.struct(*[F.col(c) for c in pts]).eqNullSafe(
                F.struct(*[F.col(f"__old_{c}").alias(c) for c in pts])
            )
        )
        deletes = moved.select(
            *pks,
            *[F.col(f"__old_{c}").alias(c) for c in pts],
            *[F.lit(None).cast(schema.field(c).type).alias(c) for c in val_cols],
            F.lit(KIND_DELETE).alias(ROW_KIND),
        )
        rows = rows.select(deletes.columns).unionByName(deletes)

    # record this batch's assignments (append-only; loader takes max __seq)
    staging = os.path.join(table_path, "staging", f"gidx-{uuid.uuid4().hex}")
    latest.select(*pks, *pts).withColumn(
        "__seq", F.lit(now_millis()).cast("long")
    ).write.parquet(staging)
    os.makedirs(_index_dir(table_path), exist_ok=True)
    import pyarrow.parquet as pq

    tbl = pq.read_table(staging)
    shutil.rmtree(staging, ignore_errors=True)
    if tbl.num_rows:
        pq.write_table(
            tbl, os.path.join(_index_dir(table_path), f"gidx-{uuid.uuid4().hex}.parquet"),
            compression="zstd",
        )
    return rows
