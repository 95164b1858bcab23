"""Changelog producers (SURVEY §2.9 T4/T5).

The reference materializes ``-U/+U`` streams three ways
(CoreOptions.java:3506-3521):

- ``input``: the writer's raw rows double as changelog —
  our write path already persists ``_VALUE_KIND`` per row, so
  ``input_changelog`` is the audit-log scan (AuditLogTable.java:88).
- ``full-compaction`` / ``lookup``: the compaction computes the diff of
  the merged state before/after — ``changelog_diff`` reproduces it as
  a declarative DataFrame job: full-outer join of the two merged views
  on the primary key, routing rows to +I / -D / -U / +U.

Spark has no native retraction streams, so the changelog is an ordinary
DataFrame with a leading ``rowkind`` column — exactly the shape of the
reference's ``$audit_log`` system table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_table_store_spark.schema import (
    KIND_DELETE,
    KIND_INSERT,
    KIND_UPDATE_AFTER,
    KIND_UPDATE_BEFORE,
)


def input_changelog(
    spark: SparkSession, table, start_snapshot: int | None = None, end_snapshot: int | None = None
) -> DataFrame:
    """changelog-producer=input: replay the writer's rows with their
    persisted row kinds (``rowkind`` column first)."""
    return table.audit_log(spark, start_snapshot, end_snapshot)


def changelog_diff(
    spark: SparkSession,
    table,
    before_snapshot: int,
    after_snapshot: int,
    row_deduplicate: bool | None = None,
    ignore_fields: list[str] | None = None,
) -> DataFrame:
    """Full-compaction-style changelog between two snapshots of a PK
    table: the diff of the merged views, keyed by primary key.

    Emits per key: +I (new), -D (gone), and a -U/+U pair for keys that
    received input in the window (FullChangelogMergeFunctionWrapper.java
    :66-80) — by default EVEN when the merged value is unchanged, the
    reference's ``changelog-producer.row-deduplicate=false`` default.
    With row-deduplicate on, unchanged values are suppressed; the
    comparison skips ``changelog-producer.row-deduplicate-ignore-fields``
    (the valueEqualiser's projected fields).

    One shuffle per side on the PK (the join key) — the same cost as
    the reference's compaction-time diff, but declarative; the
    dedup-off touched-keys probe is a third scan of just the window's
    NEW files (incremental delta), semi-joined on the same key.
    """
    if not table.is_primary_key_table():
        raise RuntimeError("changelog_diff requires a primary-key table")
    schema = table.schema
    opts = schema.options
    if row_deduplicate is None:
        row_deduplicate = (
            opts.get("changelog-producer.row-deduplicate") == "true"
        )
    if ignore_fields is None:
        raw = opts.get("changelog-producer.row-deduplicate-ignore-fields", "")
        ignore_fields = [f.strip() for f in raw.split(",") if f.strip()]
    pks = schema.trimmed_primary_keys()
    cols = schema.field_names()
    vals = [c for c in cols if c not in pks]

    if table.snapshots.exists(before_snapshot):
        before = table.to_df(spark, snapshot_id=before_snapshot)
    else:  # before the first snapshot (expired or 0): empty before-image
        after_tmp = table.to_df(spark, snapshot_id=after_snapshot)
        before = spark.createDataFrame([], after_tmp.schema)
    after = table.to_df(spark, snapshot_id=after_snapshot)
    b = before.select(*pks, F.struct(*[F.col(c) for c in cols]).alias("__b"))
    a = after.select(*pks, F.struct(*[F.col(c) for c in cols]).alias("__a"))
    j = b.join(a, on=pks, how="full_outer")

    inserted = j.where(F.col("__b").isNull()).select(
        F.lit(KIND_INSERT).alias("rowkind"), *[F.col(f"__a.{c}").alias(c) for c in cols]
    )
    deleted = j.where(F.col("__a").isNull()).select(
        F.lit(KIND_DELETE).alias("rowkind"), *[F.col(f"__b.{c}").alias(c) for c in cols]
    )
    changed = j.where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    if row_deduplicate:
        cmp_cols = [c for c in cols if c not in set(ignore_fields)]
        changed = changed.where(
            ~F.struct(*[F.col(f"__a.{c}") for c in cmp_cols]).eqNullSafe(
                F.struct(*[F.col(f"__b.{c}") for c in cmp_cols])
            )
        )
    else:
        # reference default: a key emits -U/+U iff it received input in
        # the window, unchanged value or not — input = rows in files
        # added by non-compaction commits in (before, after]
        touched = (
            table.incremental_read(
                spark, before_snapshot, after_snapshot, scan_mode="delta"
            )
            .select(*pks)
            .distinct()
        )
        changed = changed.join(touched, on=pks, how="left_semi")
    upd_before = changed.select(
        F.lit(KIND_UPDATE_BEFORE).alias("rowkind"), *[F.col(f"__b.{c}").alias(c) for c in cols]
    )
    upd_after = changed.select(
        F.lit(KIND_UPDATE_AFTER).alias("rowkind"), *[F.col(f"__a.{c}").alias(c) for c in cols]
    )
    return inserted.unionByName(deleted).unionByName(upd_before).unionByName(upd_after)


def persisted_changelog(spark: SparkSession, table, snapshot_id: int) -> DataFrame | None:
    """Changelog files persisted at ``snapshot_id`` — either recorded in
    the snapshot (full-compaction producer, table.compact) or written
    post-commit under the deterministic ``changelog-s<id>-*`` prefix
    (lookup producer, persist_lookup_changelog): consumers read plain
    parquet — no merge jobs, N consumers pay N file scans instead of N
    two-sided merges. None when no changelog exists for the snapshot."""
    import glob as _glob
    import os

    try:
        snap = table.snapshots.load(snapshot_id)
    except FileNotFoundError:
        # decoupled changelog lifecycle: the snapshot expired but its
        # changelog was preserved as a changelog/changelog-<id> entry
        try:
            snap = table.snapshots.load_changelog_entry(snapshot_id)
        except FileNotFoundError:
            snap = None
    if snap is not None and snap.changelog_files:
        paths = [os.path.join(table.path, "changelog", n) for n in snap.changelog_files]
        return spark.read.parquet(*paths)
    paths = sorted(
        _glob.glob(os.path.join(table.path, "changelog", f"changelog-s{snapshot_id}-*.parquet"))
    )
    if paths:
        return spark.read.parquet(*paths)
    return None


def persist_lookup_changelog(spark: SparkSession, table, snapshot_id: int) -> list[str]:
    """changelog-producer=lookup, write side (LookupChangelogMergeFunction
    Wrapper: changelog available right after each commit): compute the
    per-commit diff ONCE and persist it under the snapshot-id-keyed name
    ``changelog-s<id>-<uuid>.parquet``. Idempotent per snapshot (existing
    files win); orphan scanning treats the prefix as referenced while
    snapshot <id> exists on any branch or tag."""
    import glob as _glob
    import os
    import shutil as _shutil
    import uuid as _uuid

    import pyarrow.parquet as _pq

    cl_dir = os.path.join(table.path, "changelog")
    existing = _glob.glob(os.path.join(cl_dir, f"changelog-s{snapshot_id}-*.parquet"))
    if existing:
        return [os.path.basename(p) for p in sorted(existing)]
    diff = lookup_changelog(spark, table, snapshot_id)
    staging = os.path.join(table.path, "staging", f"cl-{_uuid.uuid4().hex}")
    diff.write.mode("overwrite").parquet(staging)
    os.makedirs(cl_dir, exist_ok=True)
    out: list[str] = []
    for fn in sorted(os.listdir(staging)):
        if not fn.endswith(".parquet"):
            continue
        src = os.path.join(staging, fn)
        if _pq.ParquetFile(src).metadata.num_rows == 0:
            continue
        name = f"changelog-s{snapshot_id}-{_uuid.uuid4().hex}.parquet"
        os.replace(src, os.path.join(cl_dir, name))
        out.append(name)
    _shutil.rmtree(staging, ignore_errors=True)
    return out


def lookup_changelog(spark: SparkSession, table, snapshot_id: int) -> DataFrame:
    """changelog-producer=lookup (LookupChangelogMergeFunctionWrapper
    .java:54): per-commit changelog, available right after each write
    instead of at the next full compaction. Same diff as
    ``changelog_diff`` across exactly one snapshot; the reference's
    RocksDB point-lookups of old values become one PK-keyed join here.
    The table's first snapshot emits every row as +I."""
    first = table.snapshots.earliest_id()
    if snapshot_id <= (first or 1):
        df = table.to_df(spark, snapshot_id=snapshot_id)
        return df.select(F.lit(KIND_INSERT).alias("rowkind"), *df.columns)
    return changelog_diff(spark, table, snapshot_id - 1, snapshot_id)


def binlog(
    spark: SparkSession, table, before_snapshot: int, after_snapshot: int
) -> DataFrame:
    """$binlog shape (BinlogTable.java:55): pack the -U/+U pair into one
    row with array-valued before/after images."""
    schema = table.schema
    cols = schema.field_names()
    cl = changelog_diff(spark, table, before_snapshot, after_snapshot)
    pks = schema.trimmed_primary_keys()
    key = [F.col(c) for c in pks]
    img = F.struct(*[F.col(c) for c in cols])
    agg = (
        cl.groupBy(*key)
        .agg(
            F.collect_list(F.when(F.col("rowkind").isin(KIND_UPDATE_BEFORE, KIND_DELETE), img)).alias("before_image"),
            F.collect_list(F.when(F.col("rowkind").isin(KIND_UPDATE_AFTER, KIND_INSERT), img)).alias("after_image"),
        )
        .withColumn(
            "op",
            F.when(F.size("before_image") == 0, F.lit("+I"))
            .when(F.size("after_image") == 0, F.lit("-D"))
            .otherwise(F.lit("U")),
        )
    )
    return agg.select("op", *pks, "before_image", "after_image")
