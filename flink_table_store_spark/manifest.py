"""Manifests: the ADD/DELETE file log with per-file stats.

Mirrors paimon-core ManifestEntry.java:55-90 (FileKind.ADD/DELETE) and
DataFileMeta.java:97-166 (rowCount, min/max stats, level, schemaId).
Layout: a manifest *list* is a JSON file naming manifest files; each
manifest file is parquet holding entry rows. Manifests are small
relative to data (1 row per data file), so the driver reads them with
pyarrow; at 100 TB scale (millions of files) the same parquet
manifests are readable as a Spark DataFrame — ``entries_df`` below —
so planning itself distributes.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from datetime import date, datetime
from decimal import Decimal
from typing import Any, Iterable

import pyarrow as pa
import pyarrow.parquet as pq

from flink_table_store_spark.fileio import new_file_name, read_json, write_json

KIND_ADD = "ADD"
KIND_DELETE = "DELETE"
# compaction rewrites merged PK files at this level (table.py compact();
# iceberg.py exports only level==MAX_LEVEL files for PK tables)
MAX_LEVEL = 5

# Spark-side twin of _ENTRY_SCHEMA for the distributed manifest readers:
# reading with an EXPLICIT schema makes old manifests (written before a
# column existed) surface nulls instead of silently dropping the column
# when Spark picks its schema from an arbitrary file of the set.
ENTRY_DDL = (
    "kind string, partition string, bucket int, level int, "
    "file_name string, row_count bigint, file_size bigint, "
    "min_seq bigint, max_seq bigint, schema_id bigint, stats string, "
    "creation_time bigint, first_row_id bigint, patch_cols string"
)

_ENTRY_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("partition", pa.string()),  # JSON object {pt_col: value-as-string}
        ("bucket", pa.int32()),
        ("level", pa.int32()),
        ("file_name", pa.string()),  # path relative to table root
        ("row_count", pa.int64()),
        ("file_size", pa.int64()),
        ("min_seq", pa.int64()),
        ("max_seq", pa.int64()),
        ("schema_id", pa.int64()),
        ("stats", pa.string()),  # JSON {col: {"min":v,"max":v,"nulls":n}}
        ("creation_time", pa.int64()),
        # row tracking (SpecialFields._ROW_ID / RowTrackingTable): first
        # stable row id in this file; rows are first_row_id + position
        ("first_row_id", pa.int64()),
        # data evolution (reference table/source/DataEvolutionSplit
        # Generator.java, operation/DataEvolutionSplitRead.java): a
        # PATCH file stores (_ROW_ID, <these columns>) and overlays the
        # base rows by id at read time; None = ordinary data file
        ("patch_cols", pa.string()),  # JSON list or null
    ]
)


@dataclass
class ManifestEntry:
    kind: str
    partition: dict[str, str]
    bucket: int
    level: int
    file_name: str
    row_count: int
    file_size: int
    min_seq: int = 0
    max_seq: int = 0
    schema_id: int = 0
    stats: dict[str, dict[str, Any]] = field(default_factory=dict)
    creation_time: int = 0
    first_row_id: int | None = None
    patch_cols: list[str] | None = None

    def key(self) -> tuple:
        return (json.dumps(self.partition, sort_keys=True), self.bucket, self.file_name)

    def to_row(self) -> dict[str, Any]:
        return {
            "kind": self.kind,
            "partition": json.dumps(self.partition, sort_keys=True),
            "bucket": self.bucket,
            "level": self.level,
            "file_name": self.file_name,
            "row_count": self.row_count,
            "file_size": self.file_size,
            "min_seq": self.min_seq,
            "max_seq": self.max_seq,
            "schema_id": self.schema_id,
            "stats": json.dumps(self.stats, default=str),
            "creation_time": self.creation_time,
            "first_row_id": self.first_row_id,
            "patch_cols": json.dumps(self.patch_cols) if self.patch_cols else None,
        }

    @staticmethod
    def from_row(r: dict[str, Any]) -> "ManifestEntry":
        return ManifestEntry(
            kind=r["kind"],
            partition=json.loads(r["partition"]),
            bucket=r["bucket"],
            level=r["level"],
            file_name=r["file_name"],
            row_count=r["row_count"],
            file_size=r["file_size"],
            min_seq=r["min_seq"],
            max_seq=r["max_seq"],
            schema_id=r["schema_id"],
            stats=json.loads(r["stats"]) if r["stats"] else {},
            creation_time=r["creation_time"],
            first_row_id=r.get("first_row_id"),
            patch_cols=json.loads(r["patch_cols"]) if r.get("patch_cols") else None,
        )


class ManifestManager:
    def __init__(self, table_path: str):
        self.table_path = table_path
        self.dir = os.path.join(table_path, "manifest")

    def write_manifest(self, entries: list[ManifestEntry]) -> str:
        """Write one manifest parquet file; returns its file name."""
        os.makedirs(self.dir, exist_ok=True)
        name = new_file_name("manifest", ".parquet")
        rows = [e.to_row() for e in entries]
        table = pa.Table.from_pylist(rows, schema=_ENTRY_SCHEMA)
        pq.write_table(table, os.path.join(self.dir, name), compression="zstd")
        return name

    def write_manifest_list(self, manifest_names: list[str]) -> str:
        os.makedirs(self.dir, exist_ok=True)
        name = new_file_name("manifest-list", ".json")
        write_json(os.path.join(self.dir, name), {"manifests": manifest_names})
        return name

    def read_manifest_list(self, list_name: str | None) -> list[str]:
        if not list_name:
            return []
        return read_json(os.path.join(self.dir, list_name))["manifests"]

    def read_manifest(self, name: str) -> list[ManifestEntry]:
        table = pq.read_table(os.path.join(self.dir, name))
        return [ManifestEntry.from_row(r) for r in table.to_pylist()]

    def read_entries(self, list_name: str | None) -> list[ManifestEntry]:
        out: list[ManifestEntry] = []
        for m in self.read_manifest_list(list_name):
            out.extend(self.read_manifest(m))
        return out

    def read_live_entries(self, base_list: str | None, delta_list: str | None) -> list[ManifestEntry]:
        """Merge base+delta logs: ADD entries minus DELETE-d files."""
        merged: dict[tuple, ManifestEntry] = {}
        for e in self.read_entries(base_list) + self.read_entries(delta_list):
            if e.kind == KIND_ADD:
                merged[e.key()] = e
            else:
                merged.pop(e.key(), None)
        return list(merged.values())

    def entries_df(self, spark, list_name: str | None):
        """Manifest entries as a Spark DataFrame — the scale path for
        planning over millions of files (SURVEY §2.1 S2/S3)."""
        names = self.read_manifest_list(list_name)
        if not names:
            return spark.createDataFrame([], schema=ENTRY_DDL)
        return spark.read.schema(ENTRY_DDL).parquet(
            *[os.path.join(self.dir, n) for n in names]
        )

    def total_entry_rows(self, base_list: str | None, delta_list: str | None) -> int:
        """Total manifest entry count from parquet FOOTERS only — the
        cheap cardinality probe that decides driver vs distributed
        planning (no entry materialization)."""
        n = 0
        for lst in (base_list, delta_list):
            for m in self.read_manifest_list(lst):
                try:
                    n += pq.ParquetFile(os.path.join(self.dir, m)).metadata.num_rows
                except OSError:
                    pass
        return n

    def live_entries_frame(
        self,
        spark,
        base_list: str | None,
        delta_list: str | None,
        columns: list[str] | None = None,
    ):
        """Live manifest entries as a Spark DataFrame (latest ADD row
        per live file) — the scale building block shared by distributed
        scan planning and doctor's metadata-scale gauges. Returns None
        when the snapshot references no manifests.

        Liveness is net-count parity per (partition,bucket,file_name):
        a file is live iff it has more ADD than DELETE records — the
        same fixpoint the driver's sequential dict merge reaches, since
        a commit can only delete a live file or (re-)add a dead one."""
        from pyspark.sql import functions as F

        names = self.read_manifest_list(base_list) + self.read_manifest_list(delta_list)
        if not names:
            return None
        df = spark.read.schema(ENTRY_DDL).parquet(
            *[os.path.join(self.dir, n) for n in names]
        )
        key = ["partition", "bucket", "file_name"]
        # ONE map-combined aggregate computes BOTH halves of liveness
        # (r11 optimization round, guide §2.4 — the previous shape was a
        # net-count aggregate + a row_number window + a semi-join: three
        # Exchanges and a per-key sort of the full entry stream):
        #   net  — ADD minus DELETE records per key (live iff > 0)
        #   __e  — the LATEST ADD row per key via max_by ordered by
        #          (manifest position in the commit-ordered list, row
        #          position inside the manifest); DELETE rows carry a
        #          NULL ordering key, which max_by skips. A commit can
        #          DELETE+ADD the same file_name with refreshed
        #          stats/index pointers (rewrite_file_index), and the
        #          driver's sequential dict merge keeps the last-seen
        #          entry — max-by-position reproduces that exactly.
        order_df = F.broadcast(
            spark.createDataFrame(
                [(n, i) for i, n in enumerate(names)], "__mf_name string, __mf_idx int"
            )
        )
        entry_cols = [f.split(" ")[0] for f in ENTRY_DDL.split(", ")]
        if columns is not None:
            # aggregate-only consumers (doctor's gauges) project the
            # struct down to what they read — fewer bytes through the
            # exchange; key columns always ride (they are the group key)
            entry_cols = [
                c for c in entry_cols if c in set(columns) | set(key)
            ]
        is_add = F.col("kind") == KIND_ADD
        live = (
            df.withColumn(
                "__mf_name", F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
            )
            .withColumn("__row_idx", F.col("_metadata.row_index"))
            .join(order_df, "__mf_name", "left")
            .groupBy(*key)
            .agg(
                F.sum(F.when(is_add, F.lit(1)).otherwise(F.lit(-1))).alias("__net"),
                F.max_by(
                    F.struct(*entry_cols),
                    F.when(is_add, F.struct(F.col("__mf_idx"), F.col("__row_idx"))),
                ).alias("__e"),
            )
            .where((F.col("__net") > 0) & F.col("__e").isNotNull())
            .select("__e.*")
        )
        return live

    def live_entries_distributed(
        self,
        spark,
        base_list: str | None,
        delta_list: str | None,
        predicate=None,
        per_file_stats_safe: bool = True,
        table_path: str | None = None,
    ) -> list[ManifestEntry]:
        """The scale path for planning over millions of files: the
        ADD-minus-DELETE merge AND predicate pruning run as a Spark job
        over the manifest parquets; the driver materializes ONLY the
        surviving entries (reference: SnapshotReaderImpl's parallel
        manifest scan / FileStoreScan.withManifestParallelism).

        Pruning applies the SAME Python ``Predicate.test_partition`` /
        ``read._stats_test`` the driver path uses — executed in
        executors over Arrow batches, so semantics are identical and
        the driver never loops over pre-prune entries."""
        live = self.live_entries_frame(spark, base_list, delta_list)
        if live is None:
            return []

        shippable = False
        if predicate is not None:
            import pickle

            try:
                pickle.dumps(predicate)
                shippable = True
            except Exception:
                shippable = False  # e.g. Raw(Column) — prune driver-side
        if shippable:
            # the predicate travels as OPAQUE pickle bytes, decoded only
            # after the package path is bootstrapped: a captured instance
            # would be unpickled during closure deserialization, before
            # any chance to fix sys.path on a worker that can't already
            # import this package
            import pickle

            pred_bytes = pickle.dumps(predicate)
            stats_safe = per_file_stats_safe
            tpath = table_path
            out_schema = live.schema
            pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

            def _prune(batches):
                import json as _json
                import pickle as _pickle
                import sys as _sys

                if pkg_root not in _sys.path:
                    _sys.path.insert(0, pkg_root)
                from flink_table_store_spark.manifest import ManifestEntry as _ME
                from flink_table_store_spark.read import _stats_test

                pred = _pickle.loads(pred_bytes)
                # r11 optimization round (guide §2): partition pruning is
                # evaluated once per DISTINCT partition value (memoized on
                # the canonical JSON string — partitions ≪ files by
                # definition), and the per-row ManifestEntry
                # materialization + stats test run only over the rows
                # that survive it. Semantics are byte-identical to the
                # per-row loop: same test_partition, same _stats_test.
                part_cache: dict[str, bool] = {}

                def _ok_part(p: str) -> bool:
                    got = part_cache.get(p)
                    if got is None:
                        got = pred.test_partition(_json.loads(p))
                        part_cache[p] = got
                    return got

                for pdf in batches:
                    if pdf.empty:
                        continue
                    pdf = pdf[pdf["partition"].map(_ok_part)]
                    if pdf.empty:
                        continue
                    if stats_safe:
                        mask = [
                            _stats_test(_ME.from_row(r), pred, tpath)
                            for r in pdf.to_dict("records")
                        ]
                        pdf = pdf[mask]
                    yield pdf

            live = live.mapInPandas(_prune, out_schema)
        return [ManifestEntry.from_row(r.asDict()) for r in live.collect()]


# column types with no orderable scalar stats — shared by every stats
# collector (footer walk, collect_stats_distributed, fused index job)
# so the three paths can never diverge on which columns get stats
UNSTATABLE_TYPES = ("struct", "array", "map", "binary", "variant")


def statable_columns(spark_schema, exclude: set[str] | None = None) -> list[tuple[str, str]]:
    """[(column path, typeName)] every stats collector agrees on: the
    statable top-level fields PLUS struct leaves at ANY depth as dotted
    paths (``s.a.x``) — the reference records and evaluates stats on
    nested rows too (SchemaEvolutionUtil nested paths; stats evaluation
    in KeyValueFileStoreScan). A filter on a dotted path then skips
    files via the ordinary predicate.test path, since leaf predicates
    address stats by name and ``F.col("s.a.x")`` resolves nested
    access. Depth is capped to keep manifest stats width bounded."""
    excl = exclude or set()
    out: list[tuple[str, str]] = []

    def walk(prefix: str, dt, depth: int):
        for sub in dt.fields:
            stn = sub.dataType.typeName()
            path = f"{prefix}.{sub.name}"
            if stn == "struct" and depth < 3:
                walk(path, sub.dataType, depth + 1)
            elif stn not in UNSTATABLE_TYPES:
                out.append((path, stn))

    for f in spark_schema.fields:
        if f.name in excl:
            continue
        tn = f.dataType.typeName()
        if tn == "struct":
            walk(f.name, f.dataType, 1)
        elif tn not in UNSTATABLE_TYPES:
            out.append((f.name, tn))
    return out


def _json_safe(v: Any) -> Any:
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bytes):
        return None
    return v


def collect_parquet_stats(path: str) -> tuple[int, int, dict[str, dict[str, Any]]]:
    """(row_count, file_size, per-column {min,max,nulls}) from the parquet
    footer — no data read. Driver-side is fine for moderate file counts;
    at scale the writer tasks return the same stats through the
    CommitMessage hop instead (see write.py)."""
    import pyarrow as _pa

    pf = pq.ParquetFile(path)
    md = pf.metadata
    # dotted footer paths are statable for struct leaves at any depth
    # up to the statable_columns cap ("s.a.x"); array/map internals
    # ("a.list.element", "m.key_value.key") stay skipped
    struct_leaves: set[str] = set()

    def _walk_struct(prefix: str, typ, depth: int):
        for ch in typ:
            if _pa.types.is_struct(ch.type) and depth < 3:
                _walk_struct(f"{prefix}.{ch.name}", ch.type, depth + 1)
            elif not (
                _pa.types.is_nested(ch.type)
                or _pa.types.is_binary(ch.type)
                or _pa.types.is_large_binary(ch.type)
            ):
                struct_leaves.add(f"{prefix}.{ch.name}")

    for f in pf.schema_arrow:
        if _pa.types.is_struct(f.type):
            _walk_struct(f.name, f.type, 1)
    stats: dict[str, dict[str, Any]] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name and name not in struct_leaves:
                continue
            try:
                s = col.statistics
                if s is None or not s.has_min_max:
                    continue
                mn, mx = _json_safe(s.min), _json_safe(s.max)
            except Exception:
                continue  # e.g. pyarrow can't cast DECIMAL stats — skip pruning for the column
            nulls = s.null_count if s.null_count is not None else 0
            if name not in stats:
                stats[name] = {"min": mn, "max": mx, "nulls": nulls}
            else:
                cur = stats[name]
                if mn is not None and (cur["min"] is None or mn < cur["min"]):
                    cur["min"] = mn
                if mx is not None and (cur["max"] is None or mx > cur["max"]):
                    cur["max"] = mx
                cur["nulls"] += nulls
    return md.num_rows, os.path.getsize(path), stats


def _increment_string(s: str) -> str | None:
    """Smallest-effort strict upper bound for a truncated prefix: bump
    the last bumpable char (skipping the surrogate range). None when
    every char is already the maximum code point."""
    chars = list(s)
    for i in range(len(chars) - 1, -1, -1):
        cp = ord(chars[i])
        if cp >= 0x10FFFF:
            continue
        nxt = cp + 1
        if 0xD800 <= nxt <= 0xDFFF:
            nxt = 0xE000
        return "".join(chars[:i]) + chr(nxt)
    return None


def apply_stats_mode(options: dict, stats: dict) -> dict:
    """``metadata.stats-mode`` (CoreOptions.java:1398-1427, default
    ``truncate(16)``) + per-field ``fields.<f>.stats-mode`` overrides:
    ``none`` drops the column's stats, ``counts`` keeps only the null
    count, ``truncate(N)`` bounds string min/max at N chars (min is a
    prefix = sound lower bound; max is incremented past the truncation
    = sound upper bound — pruning stays conservative) and flags the
    entry ``trunc`` so exact-answer consumers (aggregate pushdown)
    refuse it, ``full`` keeps everything. Non-string values are never
    truncated."""
    import re as _re

    default = options.get("metadata.stats-mode", "truncate(16)")
    field_modes = {
        k[len("fields."):-len(".stats-mode")]: v
        for k, v in options.items()
        if k.startswith("fields.") and k.endswith(".stats-mode")
    }
    out: dict[str, dict] = {}
    for c, st in stats.items():
        mode = field_modes.get(c.split(".")[0], default).strip()
        if mode == "none":
            continue
        if mode == "counts":
            out[c] = {"min": None, "max": None, "nulls": st.get("nulls", 0)}
            continue
        if mode == "full":
            out[c] = st
            continue
        m = _re.fullmatch(r"truncate\((\d+)\)", mode)
        if not m:
            raise ValueError(
                f"unknown stats-mode {mode!r} for column {c!r} "
                "(none / counts / full / truncate(N))"
            )
        n = int(m.group(1))
        mn, mx = st.get("min"), st.get("max")
        trunc = False
        if isinstance(mn, str) and len(mn) > n:
            mn, trunc = mn[:n], True
        if isinstance(mx, str) and len(mx) > n:
            mx, trunc = _increment_string(mx[:n]), True
        if not trunc:
            out[c] = st
            continue
        new = dict(st)
        new.update({"min": mn, "max": mx, "trunc": True})
        out[c] = new
    return out


def merge_entry_stats(entries: Iterable[ManifestEntry], col: str) -> tuple[Any, Any]:
    """min/max of a column across entries (for sys.max_pt-style shortcuts)."""
    mn = mx = None
    for e in entries:
        s = e.stats.get(col)
        if not s:
            continue
        if s["min"] is not None and (mn is None or s["min"] < mn):
            mn = s["min"]
        if s["max"] is not None and (mx is None or s["max"] > mx):
            mx = s["max"]
    return mn, mx
