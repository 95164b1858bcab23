"""Migration & cloning: import foreign layouts, clone managed tables.

Mirrors the reference's migrate/clone procedure family
(paimon-spark procedure/MigrateTableProcedure.java,
MigrateDatabaseProcedure.java, CopyFilesProcedure.java; core logic
paimon-hive .../migrate/HiveMigrator.java — "migrate" moves existing
files into the table layout and commits their metadata, no rewrite).

Spark-first shape: parquet migration is **metadata-only** — each
existing file is linked/copied into the table's data layout and
committed from its own footer stats, O(files) driver work and zero
data IO, which is what makes importing a 100 TB hive-style directory
feasible. Non-parquet formats (csv/json/text/orc) take the
distributed rewrite path (``spark.read`` → normal bucketed write),
because their files carry no usable footer stats and the target
format is parquet anyway.
"""

from __future__ import annotations

import os
import shutil
import urllib.parse
import uuid

from pyspark.sql import SparkSession

from flink_table_store_spark.commit import FileStoreCommit
from flink_table_store_spark.manifest import (
    KIND_ADD,
    ManifestEntry,
    collect_parquet_stats,
)
from flink_table_store_spark.snapshot import COMMIT_APPEND, now_millis
from flink_table_store_spark.table import Table
from flink_table_store_spark.write import DATA_DIR


def _discover_parquet(location: str) -> list[tuple[str, dict[str, str]]]:
    """Walk a (possibly hive-partitioned) directory; return
    (abs_path, partition_values) per parquet file."""
    out: list[tuple[str, dict[str, str]]] = []
    for dirpath, _dirs, files in os.walk(location):
        rel = os.path.relpath(dirpath, location)
        partition: dict[str, str] = {}
        if rel != ".":
            for seg in rel.split(os.sep):
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    v = urllib.parse.unquote(v)
                    partition[k] = "" if v == "__HIVE_DEFAULT_PARTITION__" else v
        for fn in files:
            if fn.endswith(".parquet"):
                out.append((os.path.join(dirpath, fn), partition))
    return out


def _import_file(src: str, table: Table, partition: dict[str, str]) -> ManifestEntry:
    """Place one existing parquet file into the table layout and build
    its manifest entry from the footer (no data read)."""
    seg = [f"{k}={urllib.parse.quote(v, safe='')}" for k, v in partition.items()]
    dest_dir = os.path.join(table.path, DATA_DIR, *seg)
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, f"data-{uuid.uuid4().hex}.parquet")
    try:
        os.link(src, dest)  # same-filesystem import: zero copy
    except OSError:
        shutil.copy2(src, dest)
    row_count, size, stats = collect_parquet_stats(dest)
    return ManifestEntry(
        kind=KIND_ADD,
        partition=partition,
        bucket=0,
        level=0,
        file_name=os.path.relpath(dest, table.path),
        row_count=row_count,
        file_size=size,
        schema_id=table.schema.id,
        stats=stats,
        creation_time=now_millis(),
    )


def migrate_table(
    spark: SparkSession,
    catalog,
    source_location: str,
    target: str,
    format: str = "parquet",
    primary_keys: list[str] | None = None,
    options: dict[str, str] | None = None,
    read_options: dict[str, str] | None = None,
    delete_origin: bool = False,
) -> Table:
    """Import a raw ``format`` directory as a managed table.

    Parquet + no primary keys → metadata-only import (files linked in
    place, committed from footers). Anything else → distributed
    read→write rewrite through the normal bucketed write path.
    """
    reader = spark.read.format(format)
    for k, v in (read_options or {}).items():
        reader = reader.option(k, v)
    if format == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    src_df = reader.load(source_location)

    files = _discover_parquet(source_location) if format == "parquet" else []
    partition_keys = sorted(files[0][1].keys()) if files else []
    table = catalog.create_table(
        target,
        src_df.schema,
        partition_keys=partition_keys,
        primary_keys=primary_keys,
        options=options,
    )

    if format == "parquet" and not primary_keys and files:
        entries = [_import_file(src, table, pt) for src, pt in files]
        entries = [e for e in entries if e.row_count > 0]
        table.committer.commit(entries, table.schema.id, kind=COMMIT_APPEND)
    else:
        table.write(src_df)

    if delete_origin:
        shutil.rmtree(source_location, ignore_errors=True)
    return table.refresh()


def migrate_iceberg_table(
    spark: SparkSession,
    catalog,
    iceberg_location: str,
    target: str,
    options: dict[str, str] | None = None,
    delete_origin: bool = False,
) -> Table:
    """Import an Iceberg (hadoop-layout) table metadata-only.

    Mirrors iceberg/migrate/IcebergMigrator.java: read the current
    Iceberg snapshot's manifests, link each parquet data file into our
    layout, commit from footers — no data rewrite. Tables with delete
    files are refused, matching the reference (IcebergMigrator:347
    "don't support analyzing iceberg delete file"); identity partition
    transforms only."""
    from flink_table_store_spark import iceberg as I

    meta = I.read_metadata(iceberg_location)
    if I.current_position_deletes(iceberg_location):
        raise ValueError("cannot migrate an Iceberg table with delete files")
    schema_json = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    spec = meta["partition-specs"][meta["default-spec-id"]]
    if any(f["transform"] != "identity" for f in spec["fields"]):
        raise ValueError("only identity partition transforms are migratable")
    by_id = {f["id"]: f for f in schema_json["fields"]}
    partition_keys = [by_id[f["source-id"]]["name"] for f in spec["fields"]]

    from pyspark.sql import types as T

    from flink_table_store_spark.schema import parse_type

    spark_schema = T.StructType(
        [
            T.StructField(
                f["name"],
                parse_type(I.iceberg_type_to_spark(f["type"])),
                not f["required"],
            )
            for f in schema_json["fields"]
        ]
    )
    table = catalog.create_table(
        target, spark_schema, partition_keys=partition_keys, options=options
    )

    part_types = {
        by_id[f["source-id"]]["name"]: I.iceberg_type_to_spark(by_id[f["source-id"]]["type"])
        for f in spec["fields"]
    }
    entries = []
    for df_rec in I.current_data_files(iceberg_location):
        if df_rec["file_format"].upper() != "PARQUET":
            raise ValueError(f"non-parquet Iceberg data file: {df_rec['file_path']}")
        partition = {
            k: I.partition_value_to_string(df_rec["partition"].get(k), part_types[k])
            for k in partition_keys
        }
        partition = {k: v for k, v in partition.items() if v is not None}
        entries.append(_import_file(I._local(df_rec["file_path"]), table, partition))
    entries = [e for e in entries if e.row_count > 0]
    table.committer.commit(entries, table.schema.id, kind=COMMIT_APPEND)
    if delete_origin:
        shutil.rmtree(iceberg_location, ignore_errors=True)
    return table.refresh()


def migrate_database(
    spark: SparkSession,
    catalog,
    source_dir: str,
    target_db: str,
    format: str = "parquet",
    **kw,
) -> list[Table]:
    """One ``migrate_table`` per immediate subdirectory of ``source_dir``
    (MigrateDatabaseProcedure)."""
    out = []
    for name in sorted(os.listdir(source_dir)):
        sub = os.path.join(source_dir, name)
        if os.path.isdir(sub):
            out.append(
                migrate_table(spark, catalog, sub, f"{target_db}.{name}", format=format, **kw)
            )
    return out


def copy_files(
    spark: SparkSession,
    catalog,
    source: str,
    target: str,
    snapshot_id: int | None = None,
    tag: str | None = None,
    where: str | None = None,
) -> Table:
    """Clone a managed table: copy schema history, the chosen snapshot's
    live data files and deletion vectors, then commit fresh metadata in
    the target (CopyFilesProcedure / clone; CALL sys.copy).

    Only live files of ONE snapshot are copied — the clone starts with
    a single-snapshot history, the same contract as the reference's
    clone (latest/tagged state, not the full snapshot log). Copy cost
    is O(live bytes); metadata commit is O(files). ``where`` restricts
    the copy to matching PARTITIONS (CopyFilesProcedure's partition
    predicate — row-level predicates would copy partial files, so only
    partition columns are accepted).
    """
    src = catalog.get_table(source)
    rb = src.read_builder()
    if tag is not None:
        rb = rb.with_tag(tag)
    elif snapshot_id is not None:
        rb = rb.with_snapshot(snapshot_id)
    snap = rb._resolve_snapshot()
    if snap is None:
        raise RuntimeError(f"{source} has no snapshot to clone")

    db, name = catalog._split(target)
    catalog.create_database(db)
    dst_path = catalog.table_path(target)
    if os.path.exists(os.path.join(dst_path, "schema")):
        raise RuntimeError(f"table {target} exists")
    os.makedirs(dst_path, exist_ok=True)
    shutil.copytree(os.path.join(src.path, "schema"), os.path.join(dst_path, "schema"))

    entries = src.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    )
    if where:
        from flink_table_store_spark.sql import parse_condition
        from flink_table_store_spark.table import _is_partition_only

        pred = parse_condition(where)
        if not _is_partition_only(pred, src.schema):
            raise ValueError(
                f"sys.copy where={where!r} must reference only partition "
                f"columns {src.schema.partition_keys}"
            )
        entries = [e for e in entries if pred.test_partition(e.partition)]
    for e in entries:
        dest = os.path.join(dst_path, e.file_name)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        try:
            os.link(os.path.join(src.path, e.file_name), dest)
        except OSError:
            shutil.copy2(os.path.join(src.path, e.file_name), dest)
        e.kind = KIND_ADD  # live set becomes the clone's initial ADDs
    for n in snap.dv_files:
        dest = os.path.join(dst_path, "index", n)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copy2(os.path.join(src.path, "index", n), dest)

    committer = FileStoreCommit(dst_path)
    committer.commit(
        entries,
        schema_id=snap.schema_id,
        kind=COMMIT_APPEND,
        next_sequence=snap.next_sequence,
        dv_files=list(snap.dv_files),
    )
    return catalog.get_table(target)


def migrate_hudi_table(
    spark: SparkSession,
    catalog,
    hudi_location: str,
    target: str,
    options: dict[str, str] | None = None,
    delete_origin: bool = False,
) -> Table:
    """Import a Hudi COPY-ON-WRITE table metadata-only (the paimon-hudi
    migrator analog).

    Reads the ``.hoodie`` timeline for COMPLETED commit instants
    (``<instantTime>.commit`` / ``.replacecommit``), keeps the LATEST
    base file per file group — Hudi base files are named
    ``<fileId>_<writeToken>_<instantTime>.parquet`` and a file group's
    newest completed slice supersedes the older ones — links the
    surviving parquet files in place and commits from footers (no data
    read). The five ``_hoodie_*`` meta columns stay in the files but
    OUT of the table schema: Spark's parquet reader projects by name,
    so they are never scanned. MERGE-ON-READ tables (delta log files /
    deltacommit instants) are refused — their log merge needs Hudi's
    own reader, exactly the limitation the reference documents.
    """
    hd = os.path.join(hudi_location, ".hoodie")
    if not os.path.isdir(hd):
        raise ValueError(f"{hudi_location} has no .hoodie directory — not a Hudi table")
    timeline = os.listdir(hd)
    if any(fn.endswith(".deltacommit") for fn in timeline):
        raise ValueError("MERGE-ON-READ Hudi tables (deltacommits) are not migratable")
    completed = {
        fn.split(".", 1)[0]
        for fn in timeline
        if fn.endswith(".commit") or fn.endswith(".replacecommit")
    }
    if not completed:
        raise ValueError("no completed commit instants in the Hudi timeline")
    # replacecommits (clustering / INSERT OVERWRITE) kill whole file
    # groups: their old base files stay on disk until cleaning, so they
    # must be excluded or the migration would double-count rows.
    # Completed replacecommit metadata is JSON with
    # partitionToReplaceFileIds: {partitionPath: [fileId, ...]}
    replaced: dict[tuple[str, str], str] = {}  # (partition dir, fileId) -> instant
    for fn in timeline:
        if not fn.endswith(".replacecommit"):
            continue
        instant = fn.split(".", 1)[0]
        try:
            import json as _json

            with open(os.path.join(hd, fn), "rb") as fh:
                meta = _json.load(fh)
            for ppath, fids in (meta.get("partitionToReplaceFileIds") or {}).items():
                for fid in fids:
                    key = (ppath or ".", fid)
                    if replaced.get(key, "") < instant:
                        replaced[key] = instant
        except (ValueError, OSError) as exc:
            raise ValueError(
                f"cannot parse Hudi replacecommit metadata {fn} — refusing to "
                "migrate: its replaced file groups would duplicate rows"
            ) from exc

    # newest completed base file per (partition dir, file group)
    groups: dict[tuple[str, str], tuple[str, str, dict[str, str]]] = {}
    for dirpath, dirs, files in os.walk(hudi_location):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        rel = os.path.relpath(dirpath, hudi_location)
        partition: dict[str, str] = {}
        if rel != ".":
            segs = rel.split(os.sep)
            if not all("=" in seg for seg in segs):
                # default hudi layout (hive_style_partitioning=false)
                # writes bare value dirs — key names are unrecoverable
                # from paths, so refuse loudly instead of silently
                # migrating the table as unpartitioned
                if any(fn.endswith(".parquet") for fn in files):
                    raise ValueError(
                        f"non-hive-style partition path {rel!r} — only "
                        "hive_style_partitioning=true Hudi tables are "
                        "migratable (partition keys are not recoverable "
                        "from bare value paths)"
                    )
                continue
            for seg in segs:
                k, v = seg.split("=", 1)
                v = urllib.parse.unquote(v)
                partition[k] = "" if v == "__HIVE_DEFAULT_PARTITION__" else v
        for fn in files:
            if fn.endswith(".log") or ".log." in fn:
                raise ValueError("MERGE-ON-READ Hudi tables (log files) are not migratable")
            if not fn.endswith(".parquet"):
                continue
            parts = fn[: -len(".parquet")].split("_")
            if len(parts) != 3:
                continue  # not a Hudi base file
            file_id, _token, instant = parts
            if instant not in completed:
                continue  # inflight/rolled-back instant
            key = (rel, file_id)
            cur = groups.get(key)
            if cur is None or instant > cur[0]:
                groups[key] = (instant, os.path.join(dirpath, fn), partition)
    # drop file groups whose newest slice predates a replacecommit that
    # replaced them (the replacing instant's NEW file groups survive)
    groups = {
        k: v for k, v in groups.items()
        if not (k in replaced and v[0] <= replaced[k])
    }
    if not groups:
        raise ValueError("no completed Hudi base files found")

    # schema: merge EVERY surviving footer (distributed, metadata-only)
    # so columns added by later Hudi commits are kept — one arbitrary
    # file would silently drop them under schema evolution
    full = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", hudi_location)
        .parquet(*[src for _i, src, _p in groups.values()])
        .schema
    )
    import pyspark.sql.types as T

    data_fields = [f for f in full.fields if not f.name.startswith("_hoodie_")]
    keysets = {tuple(sorted(p.keys())) for _i, _s, p in groups.values()}
    if len(keysets) > 1:
        raise ValueError(f"inconsistent partition paths across base files: {sorted(keysets)}")
    partition_keys = sorted(next(iter(keysets)))
    table = catalog.create_table(
        target,
        T.StructType(data_fields),
        partition_keys=partition_keys,
        options=options,
    )
    entries = []
    for _instant, src, partition in groups.values():
        e = _import_file(src, table, partition)
        if e.row_count > 0:
            e.stats = {k: v for k, v in e.stats.items() if not k.startswith("_hoodie_")}
            entries.append(e)
    table.committer.commit(entries, table.schema.id, kind=COMMIT_APPEND)
    if delete_origin:
        shutil.rmtree(hudi_location, ignore_errors=True)
    return table.refresh()
