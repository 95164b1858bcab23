"""System/metadata tables (SURVEY §2.1 S10).

Mirrors paimon-core table/system/SystemTableLoader + per-table classes
(SnapshotsTable.java:78, FilesTable.java:89, PartitionsTable.java:80,
TagsTable.java:75, SchemasTable.java:82, ManifestsTable.java:67,
ConsumersTable.java:60, BucketsTable.java:64, OptionsTable,
AuditLogTable.java:88). Resolved by name suffix ``t$snapshots`` style.

These are driver-built DataFrames over the table's own metadata
(snapshot JSON + manifest parquet). Metadata is O(files), tiny next to
data, so building rows on the driver is the same cost the reference
pays; `$files` at millions-of-files scale can instead read the
manifest parquet distributed (ManifestManager.entries_df).
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:
    from flink_table_store_spark.table import Table

SYSTEM_TABLES = (
    "aggregation_fields",
    "snapshots",
    "schemas",
    "options",
    "manifests",
    "files",
    "partitions",
    "buckets",
    "tags",
    "branches",
    "changelogs",
    "consumers",
    "audit_log",
    "binlog",
    "indexes",
    "ro",
    "row_tracking",
    "statistics",
    "compact_buckets",
    "file_monitor",
)


def system_table(spark: SparkSession, table: "Table", name: str) -> DataFrame:
    fn = _LOADERS.get(name)
    if fn is None:
        raise ValueError(f"unknown system table '{name}' (have {', '.join(SYSTEM_TABLES)})")
    return fn(spark, table)


def _snapshots(spark: SparkSession, t: "Table") -> DataFrame:
    rows = [
        (
            s.id,
            s.schema_id,
            s.commit_kind,
            s.commit_identifier,
            s.commit_user,
            s.time_millis,
            s.total_record_count,
            s.delta_record_count,
            s.watermark,
        )
        for s in (t.snapshots.load(i) for i in t.snapshots.snapshot_ids())
    ]
    return spark.createDataFrame(
        rows,
        "snapshot_id bigint, schema_id bigint, commit_kind string, "
        "commit_identifier string, commit_user string, commit_time bigint, "
        "total_record_count bigint, delta_record_count bigint, watermark bigint",
    )


def _schemas(spark: SparkSession, t: "Table") -> DataFrame:
    rows = [
        (
            sid,
            json.dumps([f.to_dict() for f in s.fields]),
            json.dumps(s.partition_keys),
            json.dumps(s.primary_keys),
            json.dumps(s.options, sort_keys=True),
        )
        for sid, s in sorted(t.all_schemas().items())
    ]
    return spark.createDataFrame(
        rows,
        "schema_id bigint, fields string, partition_keys string, "
        "primary_keys string, options string",
    )


def _options(spark: SparkSession, t: "Table") -> DataFrame:
    rows = sorted(t.schema.options.items())
    return spark.createDataFrame(rows or [("", "")], "key string, value string")


def _live_entries(t: "Table"):
    snap = t.snapshots.latest()
    if snap is None:
        return []
    return t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)


def _manifests(spark: SparkSession, t: "Table") -> DataFrame:
    snap = t.snapshots.latest()
    rows = []
    if snap is not None:
        for kind, lst in (("base", snap.base_manifest_list), ("delta", snap.delta_manifest_list)):
            for m in t.manifests.read_manifest_list(lst):
                entries = t.manifests.read_manifest(m)
                rows.append((m, kind, len(entries), sum(e.row_count for e in entries)))
    return spark.createDataFrame(
        rows, "file_name string, manifest_kind string, num_entries bigint, row_count bigint"
    ) if rows else spark.createDataFrame(
        [], "file_name string, manifest_kind string, num_entries bigint, row_count bigint"
    )


def _files(spark: SparkSession, t: "Table") -> DataFrame:
    rows = [
        (
            json.dumps(e.partition, sort_keys=True),
            e.bucket,
            e.file_name,
            e.level,
            e.row_count,
            e.file_size,
            e.min_seq,
            e.max_seq,
            e.schema_id,
            json.dumps(e.stats, default=str, sort_keys=True),
            e.creation_time,
            ",".join(e.patch_cols) if e.patch_cols else None,
        )
        for e in _live_entries(t)
    ]
    schema = (
        "partition string, bucket int, file_path string, level int, "
        "record_count bigint, file_size_in_bytes bigint, min_sequence_number bigint, "
        "max_sequence_number bigint, schema_id bigint, stats string, creation_time bigint, "
        "patch_cols string"
    )
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


def _partitions(spark: SparkSession, t: "Table") -> DataFrame:
    agg: dict[str, list[int]] = {}
    for e in _live_entries(t):
        key = json.dumps(e.partition, sort_keys=True)
        cur = agg.setdefault(key, [0, 0, 0, 0])
        cur[0] += e.row_count
        cur[1] += e.file_size
        cur[2] += 1
        cur[3] = max(cur[3], e.creation_time)
    rows = [(k, *v) for k, v in sorted(agg.items())]
    schema = (
        "partition string, record_count bigint, file_size_in_bytes bigint, "
        "file_count bigint, last_update_time bigint"
    )
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


def _buckets(spark: SparkSession, t: "Table") -> DataFrame:
    agg: dict[tuple, list[int]] = {}
    for e in _live_entries(t):
        key = (json.dumps(e.partition, sort_keys=True), e.bucket)
        cur = agg.setdefault(key, [0, 0, 0])
        cur[0] += e.row_count
        cur[1] += e.file_size
        cur[2] += 1
    rows = [(k[0], k[1], *v) for k, v in sorted(agg.items())]
    schema = (
        "partition string, bucket int, record_count bigint, "
        "file_size_in_bytes bigint, file_count bigint"
    )
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


def _tags(spark: SparkSession, t: "Table") -> DataFrame:
    rows = [
        (name, s.id, s.schema_id, s.time_millis, s.total_record_count)
        for name, s in sorted(t.snapshots.tags().items())
    ]
    schema = (
        "tag_name string, snapshot_id bigint, schema_id bigint, "
        "commit_time bigint, record_count bigint"
    )
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


def _changelogs(spark: SparkSession, t: "Table") -> DataFrame:
    """Preserved changelog entries of EXPIRED snapshots (the decoupled
    lifecycle, ChangelogManager / `$changelog` in the reference): what a
    lagging streaming consumer can still replay past the snapshot
    horizon."""
    import glob as _glob
    import os as _os

    rows = []
    for sid in t.snapshots.changelog_entry_ids():
        s = t.snapshots.load_changelog_entry(sid)
        n_files = len(s.changelog_files) or len(
            _glob.glob(
                _os.path.join(t.path, "changelog", f"changelog-s{sid}-*.parquet")
            )
        )
        rows.append((s.id, s.schema_id, s.commit_kind, s.time_millis, n_files))
    schema = (
        "snapshot_id bigint, schema_id bigint, commit_kind string, "
        "commit_time bigint, changelog_file_count int"
    )
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


def _branches(spark: SparkSession, t: "Table") -> DataFrame:
    rows = [(name, meta["fromSnapshot"], meta["createTime"]) for name, meta in sorted(t.branches().items())]
    schema = "branch_name string, from_snapshot bigint, create_time bigint"
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


def _consumers(spark: SparkSession, t: "Table") -> DataFrame:
    rows = sorted(t.snapshots.consumers().items())
    schema = "consumer_id string, next_snapshot bigint"
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


def _audit_log(spark: SparkSession, t: "Table") -> DataFrame:
    return t.audit_log(spark)


def _ro(spark: SparkSession, t: "Table") -> DataFrame:
    return t.read_optimized(spark)


def _statistics(spark: SparkSession, t: "Table") -> DataFrame:
    s = t.statistics()
    schema = (
        "snapshot_id bigint, row_count bigint, col string, ndv bigint, "
        "nulls bigint, min string, max string, avg_len double"
    )
    if not s:
        return spark.createDataFrame([], schema)
    rows = [
        (s["snapshotId"], s["rowCount"], c, v["ndv"], v["nulls"], v["min"], v["max"], v["avgLen"])
        for c, v in sorted(s["columns"].items())
    ]
    return spark.createDataFrame(rows, schema)


def _binlog(spark: SparkSession, t: "Table") -> DataFrame:
    """Packed before/after images across the whole snapshot history
    (BinlogTable.java:55)."""
    from flink_table_store_spark.streaming.changelog import binlog

    latest = t.snapshots.latest_id() or 0
    earliest = t.snapshots.earliest_id() or 1
    return binlog(spark, t, max(earliest - 1, 0), latest)


def _indexes(spark: SparkSession, t: "Table") -> DataFrame:
    """Global (vector) indexes on the table — IndexesTable analogue
    (paimon-core table/system/; globalindex/)."""
    from flink_table_store_spark.globalindex import list_global_indexes

    rows = [
        (m["name"], m["type"], m["column"], m["key"], m["n_cells"], m["snapshot_id"])
        for m in list_global_indexes(t)
    ]
    return spark.createDataFrame(
        rows, "index_name string, index_type string, column string, key string, "
        "n_cells int, snapshot_id long"
    )


def _aggregation_fields(spark: SparkSession, t: "Table") -> DataFrame:
    """Per-field aggregate config of the aggregation merge engine
    (AggregationFieldsTable.java): fields.<f>.aggregate-function plus
    its fields.<f>.<fn>.* options."""
    opts = t.schema.options
    rows = []
    for f in t.schema.fields:
        fn = opts.get(f"fields.{f.name}.aggregate-function")
        prefix = f"fields.{f.name}."
        extra = {
            k[len(prefix):]: v
            for k, v in opts.items()
            if k.startswith(prefix) and not k.endswith("aggregate-function")
        }
        rows.append((f.name, f.type, fn, json.dumps(extra, sort_keys=True)))
    return spark.createDataFrame(
        rows, "field_name string, field_type string, function string, function_options string"
    )


def _row_tracking(spark: SparkSession, t: "Table") -> DataFrame:
    return t.row_tracking_df(spark)


def _compact_buckets(spark: SparkSession, t: "Table") -> DataFrame:
    """Buckets a dedicated compactor should visit (CompactBucketsTable
    .java): (partition, bucket) groups with more than one run or any
    level-0 file — the same trigger table.compact() uses."""
    agg: dict[tuple, list[int]] = {}
    for e in _live_entries(t):
        key = (json.dumps(e.partition, sort_keys=True), e.bucket)
        cur = agg.setdefault(key, [0, 0])
        cur[0] += 1
        cur[1] = max(cur[1], 1 if e.level == 0 else 0)
    rows = [
        (k[0], k[1], v[0]) for k, v in sorted(agg.items()) if v[0] > 1 or v[1]
    ]
    schema = "partition string, bucket int, file_count bigint"
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


def _file_monitor(spark: SparkSession, t: "Table") -> DataFrame:
    """Per-snapshot file changes (FileMonitorTable.java): ADD/DELETE
    delta entries of every snapshot — the raw feed a file-level monitor
    consumes."""
    rows = []
    for sid in t.snapshots.snapshot_ids():
        s = t.snapshots.load(sid)
        for e in t.manifests.read_entries(s.delta_manifest_list):
            rows.append(
                (
                    sid,
                    e.kind,
                    json.dumps(e.partition, sort_keys=True),
                    e.bucket,
                    e.file_name,
                    e.row_count,
                )
            )
    schema = (
        "snapshot_id bigint, kind string, partition string, bucket int, "
        "file_path string, record_count bigint"
    )
    return spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)


_LOADERS = {
    "snapshots": _snapshots,
    "aggregation_fields": _aggregation_fields,
    "row_tracking": _row_tracking,
    "indexes": _indexes,
    "binlog": _binlog,
    "schemas": _schemas,
    "options": _options,
    "manifests": _manifests,
    "files": _files,
    "partitions": _partitions,
    "buckets": _buckets,
    "tags": _tags,
    "branches": _branches,
    "changelogs": _changelogs,
    "consumers": _consumers,
    "audit_log": _audit_log,
    "ro": _ro,
    "statistics": _statistics,
    "compact_buckets": _compact_buckets,
    "file_monitor": _file_monitor,
}
