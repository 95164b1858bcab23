"""Operability audit — the daily health report a 100 TB operator runs.

``doctor(spark, table)`` folds the metadata the system-table family
already exposes ($snapshots/$manifests/$files/$indexes/$consumers;
reference: the $statistics / $indexes system tables plus the
RemoveOrphanFilesProcedure) into one dict of gauges plus a list of
actionable findings. Everything is O(files) driver-side metadata — no
data scan; the optional orphan check reuses the distributed
reconciliation of ``remove_orphan_files``.
"""

from __future__ import annotations

from typing import Any

from flink_table_store_spark import fileindex

# findings thresholds (CoreOptions-flavored defaults)
SMALL_FILE_BYTES = 32 * 1024 * 1024  # flag files under 25% of a 128 MB target
MANIFEST_FOLD_WARN = 8  # inherited manifest files before compact_manifest advice
RUNS_PER_BUCKET_WARN = 5  # LSM runs before compact advice (universal trigger)
DV_RATIO_WARN = 0.10  # deleted-row ratio before rewrite advice
CONSUMER_LAG_WARN = 20  # snapshots a consumer pins before expiry advice


def doctor(spark, table, check_orphans: bool = False) -> dict[str, Any]:
    """Health report for ``table``. Keys: ``snapshots``, ``manifests``,
    ``files``, ``deletion_vectors``, ``indexes``, ``consumers``,
    ``orphans`` (when requested), and ``findings`` — a list of
    human-readable, actionable strings (empty = healthy)."""
    findings: list[str] = []
    report: dict[str, Any] = {"table": table.path, "findings": findings}

    def _orphan_audit() -> None:
        if not check_orphans:
            return
        import time as _time

        # diagnosis (deletes nothing): report ALL unreferenced files,
        # bypassing the reaper's 1-day in-flight safety lag
        orphans = table.remove_orphan_files(
            dry_run=True, spark=spark,
            older_than_millis=int(_time.time() * 1000) + 60_000,
        )
        report["orphans"] = {"count": len(orphans)}
        if orphans:
            findings.append(
                f"{len(orphans)} orphan files on disk — remove_orphan_files() reclaims them"
            )

    ids = table.snapshots.snapshot_ids()
    snap = table.snapshots.latest()
    report["snapshots"] = {
        "count": len(ids),
        "earliest": ids[0] if ids else None,
        "latest": ids[-1] if ids else None,
    }
    if snap is None:
        # an explicitly requested orphan audit still runs (a failed
        # first commit leaves staged files with no snapshot at all)
        _orphan_audit()
        return report

    # metadata-scale: above the distributed-planning threshold the
    # gauges compute AS SPARK AGGREGATIONS over the live-entry frame
    # (the same liveness merge scans use) and the driver materializes
    # only scalars — collecting millions of entries just to sum them
    # would cost exactly the O(entries) loop this path exists to avoid
    thr = int(table.schema.options.get("scan.manifest.distributed-threshold", "100000"))
    big = (
        spark is not None
        and table.manifests.total_entry_rows(snap.base_manifest_list, snap.delta_manifest_list)
        > thr
    )
    opts = table.schema.options
    idx_cols = sorted(
        (set(fileindex.bloom_columns(opts)) | set(fileindex.bitmap_columns(opts)))
        - set(table.schema.partition_keys)
    )
    entries: list = []
    if big:
        from pyspark.sql import functions as F

        live = table.manifests.live_entries_frame(
            spark, snap.base_manifest_list, snap.delta_manifest_list,
            columns=["partition", "bucket", "level", "row_count",
                     "file_size", "stats"],
        )
        cov_cond = None
        for c in idx_cols:
            has = (
                F.get_json_object("stats", f"$['{c}']['bloom']").isNotNull()
                | F.get_json_object("stats", f"$['{c}']['values']").isNotNull()
                | F.get_json_object(
                    "stats", f"$['{fileindex.INDEX_KEY}']['cols']['{c}']"
                ).isNotNull()
            )
            cov_cond = has if cov_cond is None else (cov_cond & has)
        # two-level agg in ONE action: per-bucket partials first, then a
        # tiny second-level rollup — the expensive liveness merge
        # (window + row_number over every manifest row) runs exactly once
        per_bucket = live.groupBy("partition", "bucket").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("row_count").alias("rows"),
            F.sum("file_size").alias("bytes"),
            F.sum(F.when(F.col("file_size") > 0, 1).otherwise(0)).alias("sized"),
            F.sum(
                F.when((F.col("file_size") > 0) & (F.col("file_size") < SMALL_FILE_BYTES), 1).otherwise(0)
            ).alias("small"),
            F.sum(F.when(F.col("level") == 0, 1).otherwise(0)).alias("level0"),
            (
                F.sum(F.when(cov_cond, 1).otherwise(0)) if cov_cond is not None else F.lit(0)
            ).alias("covered"),
        )
        agg = per_bucket.agg(
            F.sum("n").alias("n"),
            F.sum("rows").alias("rows"),
            F.sum("bytes").alias("bytes"),
            F.sum("sized").alias("sized"),
            F.sum("small").alias("small"),
            F.sum("level0").alias("level0"),
            F.sum("covered").alias("covered"),
            F.count(F.lit(1)).alias("nb"),
            F.max("n").alias("worst"),
        ).collect()[0]
        n_entries = agg["n"] or 0
        total_rows = agg["rows"] or 0
        total_bytes = agg["bytes"] or 0
        n_sized, small = agg["sized"] or 0, agg["small"] or 0
        level0, covered = agg["level0"] or 0, agg["covered"] or 0
        n_buckets, worst_bucket_runs = agg["nb"] or 0, agg["worst"] or 0
    else:
        entries = table.manifests.read_live_entries(
            snap.base_manifest_list, snap.delta_manifest_list
        )
        n_entries = len(entries)
        total_rows = sum(e.row_count for e in entries)
        sizes = [e.file_size for e in entries if e.file_size]
        total_bytes, n_sized = sum(sizes), len(sizes)
        small = sum(1 for s in sizes if s < SMALL_FILE_BYTES)
        by_bucket: dict[tuple, int] = {}
        level0 = 0
        for e in entries:
            key = (tuple(sorted(e.partition.items())), e.bucket)
            by_bucket[key] = by_bucket.get(key, 0) + 1
            if e.level == 0:
                level0 += 1
        n_buckets = len(by_bucket)
        worst_bucket_runs = max(by_bucket.values(), default=0)
        covered = 0
        if idx_cols:
            for e in entries:
                sidecar_cols = set(
                    (e.stats.get(fileindex.INDEX_KEY) or {}).get("cols") or []
                )
                if all(
                    c in sidecar_cols
                    or (
                        isinstance(e.stats.get(c), dict)
                        and ("bloom" in e.stats[c] or "values" in e.stats[c])
                    )
                    for c in idx_cols
                ):
                    covered += 1

    # manifest amplification: inherited list length vs live entries
    manifest_files = table.manifests.read_manifest_list(
        snap.base_manifest_list
    ) + table.manifests.read_manifest_list(snap.delta_manifest_list)
    report["manifests"] = {
        "list_length": len(manifest_files),
        "live_entries": n_entries,
        "entries_per_manifest": round(n_entries / max(len(manifest_files), 1), 1),
    }
    if len(manifest_files) >= MANIFEST_FOLD_WARN:
        findings.append(
            f"manifest list carries {len(manifest_files)} inherited files — "
            "run compact_manifest() to fold them"
        )

    pk = table.is_primary_key_table()
    report["files"] = {
        "count": n_entries,
        "rows": total_rows,
        "bytes": total_bytes,
        "small_files": small,
        "level0_files": level0,
        "buckets": n_buckets,
        "max_runs_per_bucket": worst_bucket_runs,
    }
    # data evolution: live column patches add a per-column stitch join
    # to every read until a full compaction materializes them
    n_patches = sum(
        1 for e in table.manifests.read_live_entries(
            snap.base_manifest_list, snap.delta_manifest_list
        ) if e.patch_cols
    ) if table.data_evolution_enabled() else 0
    if n_patches:
        report["files"]["patch_files"] = n_patches
        findings.append(
            f"{n_patches} data-evolution patch files pending — compact() "
            "materializes them and restores stats pushdown on patched columns"
        )
    # runs-per-bucket is the LSM merge-cost gauge — it only means
    # anything on PK tables (append tables put every file at level 0
    # of one nominal bucket, with no merge on read)
    if pk and worst_bucket_runs >= RUNS_PER_BUCKET_WARN:
        findings.append(
            f"a bucket holds {worst_bucket_runs} runs — compact() to restore "
            "raw-read splits and merge cost"
        )
    if n_sized > 4 and small / n_sized > 0.5:
        findings.append(
            f"{small}/{n_sized} live files are under {SMALL_FILE_BYTES >> 20} MB — "
            "small-file compaction recommended"
        )

    # deletion vectors
    dv_rows = table._dv_row_count(snap)
    report["deletion_vectors"] = {
        "files": len(snap.dv_files),
        "deleted_rows": dv_rows,
        "ratio": round(dv_rows / total_rows, 4) if total_rows else 0.0,
        "bucket_scoped": sum(1 for n in snap.dv_files if n in snap.dv_buckets),
    }
    if total_rows and dv_rows / total_rows > DV_RATIO_WARN:
        findings.append(
            f"deletion vectors cover {dv_rows}/{total_rows} rows "
            f"({100 * dv_rows / total_rows:.1f}%) — compact() to rewrite them away"
        )

    # index coverage: configured columns vs files actually carrying one.
    # Partition keys are excluded — the index build and
    # rewrite_file_index both skip them (their values come from the
    # directory, not the column), so counting them would emit a finding
    # no procedure can ever clear. A file is covered only when EVERY
    # configured column has an inline index or a sidecar pointer
    # (stats[INDEX_KEY]["cols"] — where the write path records them);
    # ``covered`` was computed above, Spark-side on the scale path.
    report["indexes"] = {
        "configured_columns": idx_cols,
        "files_covered": covered,
        "files_total": n_entries,
    }
    if idx_cols and covered < n_entries:
        findings.append(
            f"{n_entries - covered}/{n_entries} files lack a file index "
            "for the configured columns — rewrite_file_index() backfills"
        )

    # consumer lag: the oldest cursor pins every later snapshot
    consumers = table.snapshots.consumers()
    lag = (ids[-1] - min(consumers.values()) + 1) if consumers else 0
    report["consumers"] = {"count": len(consumers), "max_lag_snapshots": lag}
    if lag > CONSUMER_LAG_WARN:
        findings.append(
            f"a consumer lags {lag} snapshots behind — expiry cannot reclaim "
            "past its cursor (clear stale consumer ids or advance the job)"
        )

    _orphan_audit()
    return report


def doctor_text(report: dict[str, Any]) -> str:
    """Render a doctor() report as a terminal-friendly summary."""
    lines = [f"== doctor: {report['table']} =="]
    for section in ("snapshots", "manifests", "files", "deletion_vectors", "indexes", "consumers", "orphans"):
        if section in report:
            body = ", ".join(f"{k}={v}" for k, v in report[section].items())
            lines.append(f"{section:>18}: {body}")
    if report["findings"]:
        lines.append("findings:")
        lines += [f"  - {f}" for f in report["findings"]]
    else:
        lines.append("findings: none — healthy")
    return "\n".join(lines)
