"""Write path: executors write bucketed parquet, driver commits.

Mirrors the reference two-phase shape (SURVEY §3.2/§3.3):
``PaimonSparkWriter.write`` repartitions by (partition, bucket)
(PaimonSparkWriter.scala:108,165-185), per-task writers produce data
files whose metadata flows back to the driver (the CommitMessage hop,
table/sink/BatchTableWrite.java:33), and the driver commits
(FileStoreCommitImpl). Here the executor side is a plain Spark
parquet write into a staging dir — Catalyst/Tungsten do the shuffle
and encoding — and the driver turns staged files into manifest
entries. Sequence numbers mirror MergeTreeWriter.java:111 (monotonic
per table, assigned at write).

Scale note: the driver-side stats collection walks one parquet footer
per staged file (no data read). At 100 TB / millions of files per
commit this hop is the same O(files) the reference's CommitMessage
serialization pays; footer walks could further be distributed with a
small Spark job over file names if ever needed.
"""

from __future__ import annotations

import os
import shutil
import urllib.parse
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_table_store_spark import fileindex
from flink_table_store_spark.manifest import KIND_ADD, ManifestEntry, collect_parquet_stats
from flink_table_store_spark.schema import (
    KIND_INSERT,
    ROW_KIND,
    SEQUENCE_NUMBER,
    VALUE_KIND,
    TableSchema,
    parse_type,
)
from flink_table_store_spark.snapshot import now_millis

BUCKET_COL = "_bucket"
DATA_DIR = "data"
# BucketMode.POSTPONE_MODE (BucketMode.java:69-73): bucket = -2 defers
# bucketing to compaction; ingest is shuffle-free
POSTPONE_BUCKET = -2


def bucket_keys(schema: TableSchema) -> list[str]:
    """Columns hashed to pick the bucket: the ``bucket-key`` option if
    set (must be a subset of the primary key on PK tables — reference
    CoreOptions BUCKET_KEY), else the trimmed primary key. A bucket-key
    narrower than the PK is what makes two fact tables co-partitionable
    on a shared join key (join_bucketed)."""
    raw = schema.options.get("bucket-key", "")
    keys = [c.strip() for c in raw.split(",") if c.strip()]
    if keys:
        if schema.primary_keys and not set(keys) <= set(schema.primary_keys):
            raise ValueError(
                f"bucket-key {keys} must be a subset of primary key {schema.primary_keys}"
            )
        return keys
    return schema.trimmed_primary_keys()


def bucket_function_type(schema: TableSchema) -> str:
    """``bucket-function.type`` (CoreOptions.java:140-153): ``default``
    (hash) or ``mod`` — floorMod(key, n) over a SINGLE INT/BIGINT
    bucket key (ModBucketFunction.java), which keeps consecutive keys
    in adjacent buckets (range-query friendly layouts)."""
    t = schema.options.get("bucket-function.type", "default").lower()
    if t not in ("default", "mod"):
        raise ValueError(
            f"unknown bucket-function.type {t!r} (default / mod)"
        )
    if t == "mod":
        keys = bucket_keys(schema)
        if len(keys) != 1 or schema.field(keys[0]).type.lower() not in (
            "int", "integer", "bigint", "smallint", "tinyint",
        ):
            raise ValueError(
                "bucket-function.type=mod needs a single INT/BIGINT "
                f"bucket key (got {keys})"
            )
    return t


def bucket_expr(schema: TableSchema, num_buckets: int | None = None):
    """Stable bucket assignment: pmod(xxhash64(bucket-key), n).

    The reference hashes the bucket-key BinaryRow with murmur
    (DefaultBucketFunction.java:30-34); our engine defines its own
    stable hash — Spark's xxhash64 built-in — shared by the writer and
    the bucketed-join layout (SURVEY §4.3 item 6).
    ``bucket-function.type=mod`` uses floorMod of the single numeric
    key instead (NULL keys land in bucket 0 — a defined bucket beats a
    null directory)."""
    n = num_buckets if num_buckets is not None else schema.num_buckets()
    keys = bucket_keys(schema)
    if bucket_function_type(schema) == "mod":
        return F.coalesce(
            F.pmod(F.col(keys[0]).cast("long"), F.lit(n)), F.lit(0)
        ).cast("int")
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n)).cast("int")


def apply_column_defaults(df: DataFrame, schema: TableSchema) -> DataFrame:
    """Column DEFAULTs substitute for NULL at WRITE time (reference
    TableWriteImpl.wrapDefaultValue / casting/DefaultValueRow.java:
    isNullAt = row null AND default null). Applied on the user write
    APIs only — maintenance rewrites must never rewrite stored nulls
    that predate a default."""
    defaults = [(f.name, f.type, f.default_value) for f in schema.fields if f.default_value is not None]
    if not defaults:
        return df
    eng = schema.options.get("merge-engine", "deduplicate")
    if schema.primary_keys and eng in ("partial-update", "aggregation"):
        # NULL is semantic for these engines (skip-update / identity)
        raise ValueError(
            f"column defaults are not supported with merge-engine={eng} "
            "(NULL means 'no update' there)"
        )
    for name, typ, dv in defaults:
        if name in df.columns:
            df = df.withColumn(
                name, F.coalesce(F.col(name).cast(typ), F.expr(dv).cast(typ))
            )
    return df


def parse_default_literal(dv: str):
    """Plain-literal subset of default expressions for the Arrow-based
    writers (no Spark to evaluate SQL): ints, floats, booleans, single-
    quoted strings, NULL. Returns (ok, value)."""
    t = dv.strip()
    low = t.lower()
    if low == "null":
        return True, None
    if low in ("true", "false"):
        return True, low == "true"
    if len(t) >= 2 and t[0] == "'" and t[-1] == "'":
        return True, t[1:-1].replace("''", "'")
    try:
        return True, int(t)
    except ValueError:
        pass
    try:
        return True, float(t)
    except ValueError:
        return False, None


def _cast_to_schema(df: DataFrame, schema: TableSchema, extra: list[str] = ()) -> DataFrame:
    cols = [F.col(f.name).cast(f.type).alias(f.name) for f in schema.fields]
    cols += [F.col(c) for c in extra if c in df.columns]
    return df.select(*cols)


def stage_and_collect(
    df: DataFrame,
    table_path: str,
    schema: TableSchema,
    base_sequence: int = 0,
    row_kind_col: str | None = None,
    target_level: int = 0,
    keep_cols: list[str] | None = None,
    preserve_seq: bool = False,
    pre_partitioned: bool = False,
) -> list[ManifestEntry]:
    """Write ``df`` into the table's data layout; return manifest entries.

    PK tables get system columns ``_SEQUENCE_NUMBER`` / ``_VALUE_KIND``
    and a ``_bucket`` assignment, then one shuffle on
    (partition, bucket) so each (partition, bucket) is written by one
    task → one level-``target_level`` file per commit per bucket (the
    LSM run, SURVEY §2.1 S16).

    ``pre_partitioned=True``: the caller guarantees ``df`` already
    carries ``_bucket`` AND is hash-partitioned on (partition, bucket)
    — the write-side repartition is skipped (r12 one-shuffle
    compaction). Layout stays correct even if the guarantee is broken
    (partitionBy routes rows by value); only file counts would suffer.
    """
    pk = bool(schema.primary_keys)
    pt_cols = list(schema.partition_keys)
    spark_extra: list[str] = []

    if pk:
        if row_kind_col and row_kind_col in df.columns:
            kind = F.col(row_kind_col)
        elif ROW_KIND in df.columns:
            kind = F.col(ROW_KIND)
        else:
            kind = F.lit(KIND_INSERT)
        df = df.withColumn(VALUE_KIND, kind)
        engine = schema.options.get("merge-engine", "deduplicate")
        if any(
            schema.options.get(k) == "true"
            for k in ("ignore-delete", f"{engine}.ignore-delete")
        ):
            # CoreOptions.IGNORE_DELETE (+ per-engine fallback keys):
            # retract records (isRetract: -D and -U) from e.g. CDC
            # streams are dropped at write — the table keeps the last
            # non-delete value
            df = df.where(~F.col(VALUE_KIND).isin("-D", "-U"))
        elif schema.options.get("ignore-update-before") == "true":
            # CoreOptions.IGNORE_UPDATE_BEFORE: -U alone drops (redundant
            # for upsert streams whose +U carries the full row); -D still
            # deletes
            df = df.where(F.col(VALUE_KIND) != "-U")
        extra_sys = [VALUE_KIND, BUCKET_COL]
        if preserve_seq:
            extra_sys.append(SEQUENCE_NUMBER)
        df = _cast_to_schema(df, schema, extra=extra_sys)
        # partial compaction (preserve_seq) carries ORIGINAL sequence
        # numbers so merge-on-read ordering against untouched runs is
        # unchanged (the reference's rewriters keep KeyValue
        # sequenceNumber); otherwise input order within source
        # partitions is preserved by monotonically_increasing_id,
        # assigned BEFORE the bucket shuffle
        if not (preserve_seq and SEQUENCE_NUMBER in df.columns):
            df = df.withColumn(
                SEQUENCE_NUMBER, (F.lit(base_sequence) + F.monotonically_increasing_id()).cast("long")
            )
        postpone_write = False
        if BUCKET_COL not in df.columns:
            if schema.num_buckets() == POSTPONE_BUCKET:
                # postpone mode: every row lands in the postpone bucket —
                # NO key shuffle at ingest (postpone/'s whole point);
                # compaction redistributes into real buckets later (it
                # arrives here with BUCKET_COL pre-assigned and takes the
                # normal shuffle below)
                df = df.withColumn(BUCKET_COL, F.lit(POSTPONE_BUCKET))
                postpone_write = True
            else:
                # fixed-bucket hash; dynamic-bucket tables arrive pre-assigned
                # (operators/dynamic_bucket.assign_buckets)
                df = df.withColumn(BUCKET_COL, bucket_expr(schema))
        if not postpone_write and not pre_partitioned:
            df = df.repartition(*[F.col(c) for c in pt_cols + [BUCKET_COL]])
        partition_by = pt_cols + [BUCKET_COL]
        spark_extra = [VALUE_KIND, SEQUENCE_NUMBER, BUCKET_COL]
    else:
        # keep_cols: extra stored columns a maintenance rewrite carries
        # through (e.g. the materialized _ROW_ID of row-tracking
        # compaction); ordinary reads drop them by projection
        df = _cast_to_schema(df, schema, extra=list(keep_cols or []))
        partition_by = pt_cols
        if schema.options.get("bucket-key") and schema.num_buckets() > 0:
            # bucketed APPEND table (reference BucketMode.BUCKET_APPEND:
            # bucket-key without primary keys, AppendOnlyFileStore.java
            # bucketMode): rows distribute by the shared bucket hash so
            # two such tables co-partition for join_bucketed and bucket
            # predicates prune scans — same hash as PK tables
            df = df.withColumn(BUCKET_COL, bucket_expr(schema))
            df = df.repartition(*[F.col(c) for c in pt_cols + [BUCKET_COL]])
            partition_by = pt_cols + [BUCKET_COL]

    fmt = schema.file_format()
    staging = os.path.join(table_path, "staging", uuid.uuid4().hex)
    writer = df.write.mode("overwrite").format(fmt)
    # file indexes (P9): format-native bloom filters per configured
    # column (reference bloomfilter/BloomFilterFileIndexFactory.java:29;
    # here the index lives IN the parquet footer / orc stripe metadata
    # and the reader's row-group filter uses it natively)
    bloom_cols = schema.options.get("file-index.bloom-filter.columns")
    if bloom_cols:
        if fmt == "parquet":
            for c in bloom_cols.split(","):
                # dotted struct-leaf paths get the engine-side sidecar
                # index only; the parquet-native writer option addresses
                # top-level columns
                if "." not in c:
                    writer = writer.option(f"parquet.bloom.filter.enabled#{c.strip()}", "true")
        elif fmt == "orc":
            writer = writer.option("orc.bloom.filter.columns", bloom_cols)
    comp = schema.options.get("file.compression")
    if comp:
        # CoreOptions FILE_COMPRESSION (reference default zstd; here the
        # engine honors the option and otherwise keeps Spark's codec)
        writer = writer.option("compression", comp)
        zlevel = schema.options.get("file.compression.zstd-level")
        if zlevel and fmt == "parquet" and comp.lower() == "zstd":
            writer = writer.option("parquet.compression.codec.zstd.level", zlevel)
    blk = schema.options.get("file.block-size")
    if blk:
        writer = writer.option(
            "parquet.block.size" if fmt == "parquet" else "orc.stripe.size", blk
        )
    for k, v in schema.options.items():
        if k.startswith(f"{fmt}."):
            writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(staging)

    # file indexes (P9): ONE distributed job computes every configured
    # column's bloom bitset + bitmap value-set per staged file and writes
    # sidecar `.index` files executor-side; only sub-threshold indexes
    # embed in the manifest (fileindex.build_indexes docstring)
    indexes: dict = {}
    idx_cols = [
        c
        for c in fileindex.bloom_columns(schema.options)
        if c not in schema.partition_keys
    ]
    bm_cols = [
        c
        for c in fileindex.bitmap_columns(schema.options)
        if c not in schema.partition_keys
    ]
    stats_exclude = set(schema.partition_keys) | {BUCKET_COL}
    if idx_cols or bm_cols:
        indexes = fileindex.build_indexes(
            df.sparkSession,
            staging,
            idx_cols,
            bm_cols,
            fileindex.bloom_bits(schema.options),
            fmt,
            fileindex.in_manifest_threshold(schema.options),
            with_stats=True,
            stats_exclude=stats_exclude,
            # the staged layout is exactly what was just written —
            # passing the schema skips the read-side inference job
            schema=df.schema if fmt in ("parquet", "orc") else None,
        )

    # per-file stats: fused into the index job when one ran (the driver
    # then walks NO footers — one job per indexed commit, reference
    # CommitMessage/DataFileMeta shape); else parquet footers driver-side
    # below commit.distributed-stats-threshold staged files and one
    # distributed aggregation above it (or always, for footerless
    # formats) — the commit-side twin of the scan planner's distributed
    # manifest switch
    stats_by_path = {
        p: (m["rc"], m["stats"]) for p, m in indexes.items() if "rc" in m
    } or None
    if stats_by_path is None:
        # VARIANT columns (F6): Spark 4 writes the new parquet VARIANT
        # logical type, which pyarrow's footer reader rejects ("Thrift
        # LogicalType that is not recognized") — stats for such tables
        # must come from the distributed Spark job (Spark reads its own
        # files fine; variant itself is unstatable and excluded).
        # Checked on the PARSED type tree — a field merely NAMED
        # "variant_x" must not disable the cheap footer walk.
        has_variant = any(_type_has_variant(parse_type(f.type)) for f in schema.fields)
        distributed = fmt != "parquet" or has_variant
        if not distributed:
            thr = int(schema.options.get("commit.distributed-stats-threshold", "1000"))
            n_staged = sum(
                1
                for _d, _s, files in os.walk(staging)
                for fn in files
                if fn.endswith(f".{fmt}")
            )
            distributed = n_staged > thr
        if distributed:
            stats_by_path = collect_stats_distributed(
                df.sparkSession, staging, fmt, exclude=stats_exclude,
                # the staged layout is exactly what was just written —
                # passing the schema skips the read-side inference job
                # (r12; same as build_indexes). VARIANT columns stay on
                # inference: Spark must re-derive its own encoding.
                schema=None if has_variant else df.schema,
            )
    entries = _collect_staged(staging, table_path, schema, target_level, indexes, fmt, stats_by_path)
    shutil.rmtree(staging, ignore_errors=True)
    return entries


def _type_has_variant(dt) -> bool:
    """True when the PARSED type tree contains a VariantType at any
    nesting depth (pyarrow cannot read footers that store one)."""
    from pyspark.sql import types as T

    if dt.typeName() == "variant":
        return True
    if isinstance(dt, T.StructType):
        return any(_type_has_variant(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _type_has_variant(dt.elementType)
    if isinstance(dt, T.MapType):
        return _type_has_variant(dt.keyType) or _type_has_variant(dt.valueType)
    return False


def collect_stats_distributed(
    spark, staging: str, fmt: str, exclude: set[str] | None = None,
    schema=None,
) -> dict[str, tuple[int, dict]]:
    """{staged-file-abs-path: (row_count, per-column {min,max,nulls})}
    via one Spark aggregation grouped on ``_metadata.file_path`` —
    the executor-side twin of the parquet footer walk. ``exclude``
    skips partition-directory columns whose values spark.read re-infers
    by type (stats on them could mismatch the real column; the manifest
    entry's partition map is authoritative)."""
    import urllib.parse as _up

    from flink_table_store_spark.manifest import _json_safe, statable_columns

    reader = spark.read.format(fmt)
    if schema is not None:
        # the writer knows the exact staged schema — skip the
        # footer-sampling inference job (r12; at >1000 staged files the
        # sampling pass itself opens many footers)
        reader = reader.schema(schema)
    df = reader.load(staging)
    statable = [c for c, _t in statable_columns(df.schema, exclude)]
    aggs = [F.count(F.lit(1)).alias("__rc")]
    for c in statable:
        aggs += [
            F.min(F.col(c)).alias(f"__mn_{c}"),
            F.max(F.col(c)).alias(f"__mx_{c}"),
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nu_{c}"),
        ]
    rows = (
        df.groupBy(F.col("_metadata.file_path").alias("__f")).agg(*aggs).collect()
    )
    out: dict[str, tuple[int, dict]] = {}
    for r in rows:
        stats = {
            c: {
                "min": _json_safe(r[f"__mn_{c}"]),
                "max": _json_safe(r[f"__mx_{c}"]),
                "nulls": r[f"__nu_{c}"],
            }
            for c in statable
        }
        # _metadata.file_path is a URI: unquote percent-encoded chars so the
        # key matches os.path.abspath(src) even for paths with spaces etc.
        path = _up.unquote(_up.urlparse(r["__f"]).path) or r["__f"]
        out[path] = (r["__rc"], stats)
    return out


def _collect_staged(
    staging: str,
    table_path: str,
    schema: TableSchema,
    level: int,
    indexes: dict | None = None,
    fmt: str = "parquet",
    stats_by_path: dict[str, tuple[int, dict]] | None = None,
) -> list[ManifestEntry]:
    data_root = os.path.join(table_path, DATA_DIR)
    entries: list[ManifestEntry] = []
    now = now_millis()
    ext = f".{fmt}"
    for dirpath, _dirs, files in os.walk(staging):
        for fn in files:
            if not fn.endswith(ext):
                continue
            src = os.path.join(dirpath, fn)
            rel_dir = os.path.relpath(dirpath, staging)
            partition, bucket = _parse_partition(rel_dir)
            if stats_by_path is not None:
                key = os.path.abspath(src)
                hit = stats_by_path.get(key) or stats_by_path.get(os.path.realpath(src))
                if hit is None:
                    # A stats miss must not silently drop the file from the
                    # commit (path-mapping mismatch ≠ empty file). Fall back
                    # to the parquet footer, else a per-file row count; rows
                    # with no stats commit with min/max=None — no pruning,
                    # but no data loss.
                    if fmt == "parquet":
                        try:
                            rc, _sz, st = collect_parquet_stats(src)
                        except OSError:
                            # pyarrow cannot read VARIANT-typed footers
                            rc, st = _fallback_row_count(src, fmt), {}
                        hit = (rc, st)
                    else:
                        hit = (_fallback_row_count(src, fmt), {})
                row_count, stats = hit
            else:
                row_count, _size, stats = collect_parquet_stats(src)
            if row_count == 0:
                continue
            # metadata.stats-mode (+ fields.<f>.stats-mode): system
            # columns are exempt — the sequence high-water mark and row
            # kinds are structural, not user stats
            from flink_table_store_spark.manifest import apply_stats_mode

            _sys = {
                k: v
                for k, v in stats.items()
                if k in (SEQUENCE_NUMBER, VALUE_KIND)
            }
            stats = apply_stats_mode(
                schema.options,
                {k: v for k, v in stats.items() if k not in _sys},
            )
            stats.update(_sys)
            # CoreOptions DATA_FILE_PREFIX (default "data-")
            new_name = (
                f"{schema.options.get('data-file.prefix', 'data-')}"
                f"{uuid.uuid4().hex}{ext}"
            )
            rel_parts = [] if rel_dir == "." else rel_dir.split(os.sep)
            dest_dir = os.path.join(data_root, *rel_parts)
            os.makedirs(dest_dir, exist_ok=True)
            dest = os.path.join(dest_dir, new_name)
            os.replace(src, dest)
            info = (indexes or {}).get(os.path.abspath(src))
            if info:
                for col, idx in info.get("inline", {}).items():
                    stats.setdefault(col, {"min": None, "max": None, "nulls": 0}).update(idx)
                sidecar_src = src + fileindex.INDEX_SUFFIX
                if info.get("sidecar") and os.path.exists(sidecar_src):
                    os.replace(sidecar_src, dest + fileindex.INDEX_SUFFIX)
                    stats[fileindex.INDEX_KEY] = {
                        "file": os.path.relpath(dest, table_path) + fileindex.INDEX_SUFFIX,
                        "cols": info["sidecar"],
                    }
            size = os.path.getsize(dest)
            seq_stats = stats.get(SEQUENCE_NUMBER, {})
            entries.append(
                ManifestEntry(
                    kind=KIND_ADD,
                    partition=partition,
                    bucket=bucket,
                    level=level,
                    file_name=os.path.relpath(dest, table_path),
                    row_count=row_count,
                    file_size=size,
                    min_seq=seq_stats.get("min", 0) or 0,
                    max_seq=seq_stats.get("max", 0) or 0,
                    schema_id=schema.id,
                    stats=stats,
                    creation_time=now,
                )
            )
    return entries


def _fallback_row_count(src: str, fmt: str) -> int:
    """Per-file row count for a staged file that missed the distributed
    stats map (only reached on a path-mapping mismatch or a genuinely
    empty part file — never the hot path)."""
    if fmt == "parquet":
        # reached only when pyarrow rejected the footer (VARIANT
        # logical type); duckdb's reader tolerates unknown logical types
        import duckdb

        return duckdb.sql(
            f"select count(*) from parquet_scan('{src}')"
        ).fetchone()[0]
    if fmt == "orc":
        import pyarrow.orc as _orc

        return _orc.ORCFile(src).nrows
    if fmt == "avro":
        try:
            import fastavro

            with open(src, "rb") as f:
                return sum(1 for _ in fastavro.reader(f))
        except Exception:
            return 0
    # text-based formats (csv/json/text): staged writes emit no headers,
    # so non-empty lines == rows
    with open(src, "rb") as f:
        return sum(1 for line in f if line.strip())


def _parse_partition(rel_dir: str) -> tuple[dict[str, str], int]:
    partition: dict[str, str] = {}
    bucket = 0
    if rel_dir == ".":
        return partition, bucket
    for seg in rel_dir.split(os.sep):
        if "=" not in seg:
            continue
        k, v = seg.split("=", 1)
        v = urllib.parse.unquote(v)
        if k == BUCKET_COL:
            bucket = int(v)
        else:
            partition[k] = "" if v == "__HIVE_DEFAULT_PARTITION__" else v
    return partition, bucket


def max_sequence(entries: list[ManifestEntry]) -> int:
    return max((e.max_seq for e in entries), default=0)
