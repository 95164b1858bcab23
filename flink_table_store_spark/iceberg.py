"""Iceberg-compatibility metadata export (SURVEY §7 M7).

Mirrors the reference's Iceberg compat layer (paimon-core iceberg/:
IcebergCommitCallback.java:1269, IcebergOptions.java `metadata.iceberg.
storage`, metadata/IcebergMetadata.java, manifest/IcebergManifestFile
Meta.java): after a snapshot commits, the engine also writes metadata
in the (public) Apache Iceberg v2 table format under
``<table>/metadata/`` so any Iceberg reader can consume the table's
parquet data files without knowing our native format.

Semantics copied from the reference, re-derived for our engine:

- append tables: every live data file is visible to Iceberg
  (IcebergCommitCallback.shouldAddFileToIceberg:733 — `true` when no
  primary keys);
- primary-key tables: only fully-compacted files (max LSM level) are
  visible — a merge-on-read level-0 run would need our merge semantics
  Iceberg doesn't have (same file:738-742, `level == maxLevel`);
- deletion-vector tables: live DV positions are re-published as
  Iceberg v2 position-delete parquet files (reserved field ids
  2147483546/2147483545) under a content=1 delete manifest — the
  reference does the same (IcebergCommitCallback position deletes;
  our DV sidecars already hold the (file, pos) pairs).

Scale: export is O(new files) per commit for append-only commits —
previous Iceberg manifest files are reused untouched and one new
manifest holds this commit's additions (the reference's incremental
manifest maintenance). Commits that delete files rewrite one
consolidated manifest, O(live files), on the driver — the same
metadata hop the native commit already pays.

Avro container files are written by our pure-Python writer
(avro_io.py), which is cross-validated against the JVM Avro reader in
tests. File/field names and field-ids follow the public Iceberg spec.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
from datetime import date, datetime, timezone
from decimal import Decimal
from typing import Any

from flink_table_store_spark import avro_io
from flink_table_store_spark.fileio import write_json
from flink_table_store_spark.manifest import MAX_LEVEL, ManifestEntry
from flink_table_store_spark.schema import TableSchema, parse_type
from flink_table_store_spark.snapshot import Snapshot

ICEBERG_DIR = "metadata"
STATE_FILE = "ftss-iceberg-state.json"


# --------------------------------------------------------------------------
# type mapping: Spark DDL type -> Iceberg type JSON (+ field ids)
# --------------------------------------------------------------------------


def _iceberg_type(dt, next_id) -> Any:
    """Spark DataType -> Iceberg type JSON. ``next_id`` is a callable
    allocating unique ids for nested fields (Iceberg requires ids on
    list/map/struct members; our TableSchema ids cover top level)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        eid = next_id()
        return {
            "type": "list",
            "element-id": eid,
            "element": _iceberg_type(dt.elementType, next_id),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        kid, vid = next_id(), next_id()
        return {
            "type": "map",
            "key-id": kid,
            "key": _iceberg_type(dt.keyType, next_id),
            "value-id": vid,
            "value": _iceberg_type(dt.valueType, next_id),
            "value-required": not dt.valueContainsNull,
        }
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = next_id()
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": _iceberg_type(f.dataType, next_id),
                }
            )
        return {"type": "struct", "fields": fields}
    raise ValueError(f"type not exportable to Iceberg: {dt}")


def iceberg_schema(schema: TableSchema) -> tuple[dict, int]:
    """Iceberg schema JSON with stable field ids; identifier-field-ids
    carry the primary key (IcebergSchema maps Paimon PKs the same way)."""
    counter = [max((f.id for f in schema.fields), default=0) + 1000]

    def next_id() -> int:
        counter[0] += 1
        return counter[0]

    fields = [
        {
            "id": f.id,
            "name": f.name,
            "required": not f.nullable,
            "type": _iceberg_type(parse_type(f.type), next_id),
        }
        for f in schema.fields
    ]
    out = {"type": "struct", "schema-id": schema.id, "fields": fields}
    if schema.primary_keys:
        out["identifier-field-ids"] = [schema.field(k).id for k in schema.primary_keys]
    return out, counter[0]


def partition_spec(schema: TableSchema) -> dict:
    return {
        "spec-id": 0,
        "fields": [
            {
                "name": k,
                "transform": "identity",
                "source-id": schema.field(k).id,
                "field-id": 1000 + i,
            }
            for i, k in enumerate(schema.partition_keys)
        ],
    }


# --------------------------------------------------------------------------
# Iceberg single-value binary serialization (spec Appendix D) + parsing
# of our JSON-safe stats values back to typed values
# --------------------------------------------------------------------------


def _parse_stat(v: Any, type_str: str) -> Any:
    """Manifest stats store JSON-safe values (dates/timestamps as ISO
    strings — manifest._json_safe); parse back per the column type."""
    if v is None:
        return None
    t = type_str.lower()
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return int(v)
    if t in ("float", "double"):
        return float(v)
    if t == "date":
        return date.fromisoformat(v) if isinstance(v, str) else v
    if t.startswith("timestamp"):
        return datetime.fromisoformat(v) if isinstance(v, str) else v
    if t == "boolean":
        return bool(v)
    if t in ("string", "varchar", "char") or t.startswith(("varchar", "char")):
        return str(v)
    return None  # decimal (stored lossily as float), binary, nested: no bounds


def single_value_bytes(v: Any, type_str: str) -> bytes | None:
    """Iceberg binary single-value serialization for bounds."""
    v = _parse_stat(v, type_str)
    if v is None:
        return None
    t = type_str.lower()
    if t in ("tinyint", "smallint", "int", "integer"):
        return struct.pack("<i", int(v))
    if t in ("bigint", "long"):
        return struct.pack("<q", int(v))
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t == "date":
        return struct.pack("<i", (v - date(1970, 1, 1)).days)
    if t.startswith("timestamp"):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)  # session TZ is UTC
        return struct.pack("<q", int(v.timestamp() * 1_000_000))
    if t in ("string", "varchar", "char") or t.startswith(("varchar", "char")):
        return str(v).encode("utf-8")
    return None


def _partition_value(raw: str | None, type_str: str) -> Any:
    """Typed partition value from our string-keyed partition dict."""
    if raw is None:
        return None
    t = type_str.lower()
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return int(raw)
    if t in ("float", "double"):
        return float(raw)
    if t == "boolean":
        return raw in ("true", "True", "1")
    if t == "date":
        return (date.fromisoformat(raw) - date(1970, 1, 1)).days
    return str(raw)


def iceberg_type_to_spark(t: Any) -> str:
    """Inverse of ``_iceberg_type`` (for migrate-from-Iceberg): Iceberg
    type JSON -> Spark DDL string."""
    if isinstance(t, str):
        prim = {
            "boolean": "boolean",
            "int": "int",
            "long": "bigint",
            "float": "float",
            "double": "double",
            "date": "date",
            "string": "string",
            "uuid": "string",
            "binary": "binary",
            "timestamp": "timestamp_ntz",
            "timestamptz": "timestamp",
        }
        if t in prim:
            return prim[t]
        if t.startswith("decimal"):
            return t.replace(" ", "")
        if t.startswith("fixed"):
            return "binary"
        raise ValueError(f"unsupported Iceberg type {t!r}")
    kind = t["type"]
    if kind == "list":
        return f"array<{iceberg_type_to_spark(t['element'])}>"
    if kind == "map":
        return f"map<{iceberg_type_to_spark(t['key'])},{iceberg_type_to_spark(t['value'])}>"
    if kind == "struct":
        inner = ",".join(
            f"{f['name']}:{iceberg_type_to_spark(f['type'])}" for f in t["fields"]
        )
        return f"struct<{inner}>"
    raise ValueError(f"unsupported Iceberg type {t!r}")


def partition_value_to_string(v: Any, type_str: str) -> str | None:
    """Typed manifest partition value -> our string partition dict
    entry (the directory-name form the write path produces)."""
    if v is None:
        return None
    t = type_str.lower()
    if t == "date":  # avro carries days-since-epoch
        from datetime import timedelta

        return (date(1970, 1, 1) + timedelta(days=int(v))).isoformat()
    if t == "boolean":
        return "true" if v else "false"
    return str(v)


def _avro_prim(type_str: str) -> Any:
    t = type_str.lower()
    if t in ("tinyint", "smallint", "int", "integer"):
        return "int"
    if t in ("bigint", "long"):
        return "long"
    if t == "float":
        return "float"
    if t == "double":
        return "double"
    if t == "boolean":
        return "boolean"
    if t == "date":
        return {"type": "int", "logicalType": "date"}
    return "string"


# --------------------------------------------------------------------------
# Avro schemas for manifest / manifest-list files (Iceberg spec field ids)
# --------------------------------------------------------------------------


def _kv_map(name: str, kid: int, vid: int, vtype: str) -> dict:
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": vtype, "field-id": vid},
            ],
        },
    }


def manifest_entry_schema(schema: TableSchema) -> dict:
    part_fields = [
        {
            "name": k,
            "type": ["null", _avro_prim(schema.field(k).type)],
            "default": None,
            "field-id": 1000 + i,
        }
        for i, k in enumerate(schema.partition_keys)
    ]
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": {"type": "record", "name": "r102", "fields": part_fields},
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {
                "name": "value_counts",
                "type": ["null", _kv_map("k119_v120", 119, 120, "long")],
                "default": None,
                "field-id": 109,
            },
            {
                "name": "null_value_counts",
                "type": ["null", _kv_map("k121_v122", 121, 122, "long")],
                "default": None,
                "field-id": 110,
            },
            {
                "name": "lower_bounds",
                "type": ["null", _kv_map("k126_v127", 126, 127, "bytes")],
                "default": None,
                "field-id": 125,
            },
            {
                "name": "upper_bounds",
                "type": ["null", _kv_map("k129_v130", 129, 130, "bytes")],
                "default": None,
                "field-id": 128,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


FIELD_SUMMARY = {
    "type": "record",
    "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {"name": "contains_nan", "type": ["null", "boolean"], "default": None, "field-id": 518},
        {"name": "lower_bound", "type": ["null", "bytes"], "default": None, "field-id": 510},
        {"name": "upper_bound", "type": ["null", "bytes"], "default": None, "field-id": 511},
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": ["null", "long"], "default": None, "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            "name": "partitions",
            "type": ["null", {"type": "array", "items": FIELD_SUMMARY}],
            "default": None,
            "field-id": 507,
        },
    ],
}


# --------------------------------------------------------------------------
# export
# --------------------------------------------------------------------------


def _meta_dir(table_path: str) -> str:
    return os.path.join(table_path, ICEBERG_DIR)


def _hex_bytes(obj: Any) -> Any:
    """JSON-encode nested bytes (manifest-list partition bounds) losslessly."""
    if isinstance(obj, bytes):
        return {"__hex__": obj.hex()}
    if isinstance(obj, dict):
        return {k: _hex_bytes(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_hex_bytes(v) for v in obj]
    return obj


def _unhex_bytes(obj: Any) -> Any:
    if isinstance(obj, dict):
        if set(obj) == {"__hex__"}:
            return bytes.fromhex(obj["__hex__"])
        return {k: _unhex_bytes(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_unhex_bytes(v) for v in obj]
    return obj


def _load_state(table_path: str) -> dict:
    p = os.path.join(_meta_dir(table_path), STATE_FILE)
    if os.path.exists(p):
        with open(p) as f:
            return _unhex_bytes(json.load(f))
    return {"version": 0, "manifests": [], "snapshots": [], "files": {}, "uuid": str(uuid.uuid4())}


def _save_state(table_path: str, state: dict) -> None:
    write_json(os.path.join(_meta_dir(table_path), STATE_FILE), _hex_bytes(state))


def _visible(entries: list[ManifestEntry], pk: bool) -> list[ManifestEntry]:
    if not pk:
        return entries
    return [e for e in entries if e.level == MAX_LEVEL]


def _entry_record(
    e: ManifestEntry,
    schema: TableSchema,
    table_path: str,
    status: int,
    snapshot_id: int,
    seq: int,
) -> dict:
    field_ids = {f.name: f.id for f in schema.fields}
    vc, nvc, lo, hi = [], [], [], []
    for name, st in (e.stats or {}).items():
        fid = field_ids.get(name)
        if fid is None:
            continue
        vc.append({"key": fid, "value": e.row_count})
        nvc.append({"key": fid, "value": int(st.get("nulls") or 0)})
        tstr = schema.field(name).type
        lb = single_value_bytes(st.get("min"), tstr)
        ub = single_value_bytes(st.get("max"), tstr)
        if lb is not None:
            lo.append({"key": fid, "value": lb})
        if ub is not None:
            hi.append({"key": fid, "value": ub})
    fmt = e.file_name.rsplit(".", 1)[-1].upper()
    return {
        "status": status,
        "snapshot_id": snapshot_id,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": 0,
            "file_path": os.path.join(table_path, e.file_name),
            "file_format": fmt,
            "partition": {
                k: _partition_value(e.partition.get(k), schema.field(k).type)
                for k in schema.partition_keys
            },
            "record_count": e.row_count,
            "file_size_in_bytes": e.file_size,
            "value_counts": vc or None,
            "null_value_counts": nvc or None,
            "lower_bounds": lo or None,
            "upper_bounds": hi or None,
        },
    }


def _partition_summaries(
    entries: list[ManifestEntry], schema: TableSchema
) -> list[dict] | None:
    if not schema.partition_keys:
        return None
    out = []
    for k in schema.partition_keys:
        tstr = schema.field(k).type
        vals = [e.partition.get(k) for e in entries]
        # Compare typed values, not raw strings: lexicographic "10" < "9"
        # would publish inverted bounds and break Iceberg readers'
        # manifest-level partition pruning for numeric partition columns.
        typed = [
            (p, v)
            for v in vals
            if v is not None
            for p in [_parse_stat(v, tstr)]
            if p is not None
        ]
        typed.sort(key=lambda t: t[0])
        out.append(
            {
                "contains_null": any(v is None for v in vals),
                "contains_nan": None,
                "lower_bound": single_value_bytes(typed[0][1], tstr) if typed else None,
                "upper_bound": single_value_bytes(typed[-1][1], tstr) if typed else None,
            }
        )
    return out


def _write_manifest(
    table_path: str,
    schema: TableSchema,
    entries: list[tuple[ManifestEntry, int, int, int]],  # (entry, status, snap, seq)
    snapshot_id: int,
) -> dict:
    """Write one Iceberg manifest avro; return its manifest-list row +
    bookkeeping (file names it covers)."""
    name = f"ftss-m-{uuid.uuid4().hex}.avro"
    path = os.path.join(_meta_dir(table_path), name)
    avro_schema = manifest_entry_schema(schema)
    records = [
        _entry_record(e, schema, table_path, status, snap, seq)
        for (e, status, snap, seq) in entries
    ]
    length = avro_io.write_container(path, avro_schema, records)
    added = [e for (e, s, _n, _q) in entries if s == 1]
    existing = [e for (e, s, _n, _q) in entries if s == 0]
    seqs = [q for (_e, _s, _n, q) in entries]
    return {
        "row": {
            "manifest_path": path,
            "manifest_length": length,
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": snapshot_id,
            "min_sequence_number": min(seqs) if seqs else snapshot_id,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(added),
            "existing_files_count": len(existing),
            "deleted_files_count": 0,
            "added_rows_count": sum(e.row_count for e in added),
            "existing_rows_count": sum(e.row_count for e in existing),
            "deleted_rows_count": 0,
            "partitions": _partition_summaries([e for (e, _s, _n, _q) in entries], schema),
        },
        "files": [e.file_name for (e, _s, _n, _q) in entries],
    }


# Iceberg reserved field ids for position-delete files (spec: Reserved
# field ids 2147483546 = file_path, 2147483545 = pos)
_POSDEL_PATH_ID = 2147483546
_POSDEL_POS_ID = 2147483545


def _write_position_deletes(
    table_path: str,
    schema: TableSchema,
    snap: Snapshot,
    visible: dict[str, ManifestEntry],
    index_dir: str,
) -> dict | None:
    """Publish live DV positions as Iceberg position-delete parquet
    files (one per partition, file_path/pos sorted, reserved field ids)
    plus their content=1 delete manifest. Returns the manifest-list row
    or None when no live positions remain.

    Regenerated per export: the position set is exactly the table's DV
    sidecars filtered to live files — O(deleted rows), the same cost
    the sidecars themselves paid."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    by_base = {os.path.basename(fn): e for fn, e in visible.items()}
    # (file, pos) pairs against live files, deduped (DVs accumulate)
    seen: set[tuple[str, int]] = set()
    for n in snap.dv_files:
        t = pq.read_table(os.path.join(index_dir, n), columns=["file_name", "pos"])
        for fn, pos in zip(*(c.to_pylist() for c in t.columns)):
            if fn in by_base:
                seen.add((fn, pos))
    if not seen:
        return None

    groups: dict[tuple, list[tuple[str, int]]] = {}
    for fn, pos in sorted(seen):
        e = by_base[fn]
        groups.setdefault(tuple(sorted(e.partition.items())), []).append(
            (os.path.join(table_path, e.file_name), pos)
        )

    arrow_schema = pa.schema(
        [
            pa.field(
                "file_path",
                pa.string(),
                nullable=False,
                metadata={b"PARQUET:field_id": str(_POSDEL_PATH_ID).encode()},
            ),
            pa.field(
                "pos",
                pa.int64(),
                nullable=False,
                metadata={b"PARQUET:field_id": str(_POSDEL_POS_ID).encode()},
            ),
        ]
    )
    entry_rows: list[dict] = []
    avro_schema = manifest_entry_schema(schema)
    for part_items, pairs in groups.items():
        name = f"ftss-posdel-{uuid.uuid4().hex}.parquet"
        path = os.path.join(_meta_dir(table_path), name)
        tbl = pa.Table.from_pydict(
            {"file_path": [p for p, _ in pairs], "pos": [q for _, q in pairs]},
            schema=arrow_schema,
        )
        pq.write_table(tbl, path)
        part = dict(part_items)
        entry_rows.append(
            {
                "status": 1,
                "snapshot_id": snap.id,
                "sequence_number": snap.id,
                "file_sequence_number": snap.id,
                "data_file": {
                    "content": 1,  # POSITION_DELETES
                    "file_path": path,
                    "file_format": "PARQUET",
                    "partition": {
                        k: _partition_value(part.get(k), schema.field(k).type)
                        for k in schema.partition_keys
                    },
                    "record_count": len(pairs),
                    "file_size_in_bytes": os.path.getsize(path),
                    "value_counts": None,
                    "null_value_counts": None,
                    "lower_bounds": None,
                    "upper_bounds": None,
                },
            }
        )
    mname = f"ftss-delm-{uuid.uuid4().hex}.avro"
    mpath = os.path.join(_meta_dir(table_path), mname)
    length = avro_io.write_container(mpath, avro_schema, entry_rows)
    n_rows = sum(r["data_file"]["record_count"] for r in entry_rows)
    return {
        "manifest_path": mpath,
        "manifest_length": length,
        "partition_spec_id": 0,
        "content": 1,  # DELETES manifest
        "sequence_number": snap.id,
        "min_sequence_number": snap.id,
        "added_snapshot_id": snap.id,
        "added_files_count": len(entry_rows),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": n_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": None,
    }


def export_snapshot(table, snap: Snapshot) -> str | None:
    """Write/refresh Iceberg metadata for ``snap``; returns the
    vN.metadata.json path (None when the table cannot be exported)."""
    try:
        schema: TableSchema = table.schema_manager.load(snap.schema_id)
    except Exception:
        schema = table.schema
    pk = bool(schema.primary_keys)
    live = table.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    )
    visible = _visible(live, pk)
    table_path = os.path.abspath(table.path)
    os.makedirs(_meta_dir(table_path), exist_ok=True)
    state = _load_state(table_path)

    cur_files = {e.file_name: e for e in visible}
    prev_files: dict[str, dict] = state["files"]
    added = [cur_files[f] for f in cur_files.keys() - prev_files.keys()]
    removed = prev_files.keys() - cur_files.keys()

    if removed or not state["manifests"]:
        # consolidate: one manifest holding the whole live set. Files
        # exported before keep their original (snapshot, sequence).
        entry_rows = []
        for fn, e in sorted(cur_files.items()):
            prev = prev_files.get(fn)
            if prev:
                entry_rows.append((e, 0, prev["snap"], prev["seq"]))
            else:
                entry_rows.append((e, 1, snap.id, snap.id))
        manifests = [_write_manifest(table_path, schema, entry_rows, snap.id)] if entry_rows else []
        state["manifests"] = manifests
        operation = "overwrite" if removed else "append"
    elif added:
        entry_rows = [(e, 1, snap.id, snap.id) for e in sorted(added, key=lambda e: e.file_name)]
        state["manifests"] = state["manifests"] + [
            _write_manifest(table_path, schema, entry_rows, snap.id)
        ]
        operation = "append"
    else:
        operation = "append"  # metadata-only commit; manifests unchanged

    state["files"] = {
        fn: (prev_files.get(fn) or {"snap": snap.id, "seq": snap.id}) for fn in cur_files
    }

    # position deletes from live deletion vectors (content=1 manifest,
    # regenerated per export — the DV set is not append-only)
    delete_row = None
    if snap.dv_files:
        delete_row = _write_position_deletes(
            table_path, schema, snap, cur_files, os.path.join(table.path, "index")
        )
        if delete_row:
            operation = "delete" if operation == "append" else operation

    # manifest list
    list_name = f"snap-{snap.id}-{uuid.uuid4().hex}.avro"
    list_path = os.path.join(_meta_dir(table_path), list_name)
    avro_io.write_container(
        list_path,
        MANIFEST_FILE_SCHEMA,
        [m["row"] for m in state["manifests"]] + ([delete_row] if delete_row else []),
    )

    total_rows = sum(e.row_count for e in cur_files.values())
    ice_snap = {
        "sequence-number": snap.id,
        "snapshot-id": snap.id,
        "timestamp-ms": snap.time_millis,
        "summary": {
            "operation": operation,
            "total-records": str(total_rows),
            "total-data-files": str(len(cur_files)),
        },
        "manifest-list": list_path,
        "schema-id": schema.id,
    }
    state["snapshots"] = [s for s in state["snapshots"] if s["snapshot-id"] != snap.id] + [
        ice_snap
    ]

    ice_schema, last_col_id = iceberg_schema(schema)
    # Keep every exported schema (reference IcebergMetadata keeps the full
    # list): older snapshots reference their schema-id for time travel.
    schemas = [s for s in state.get("schemas", []) if s["schema-id"] != ice_schema["schema-id"]]
    schemas.append(ice_schema)
    schemas.sort(key=lambda s: s["schema-id"])
    state["schemas"] = schemas
    spec = partition_spec(schema)
    version = state["version"] + 1
    metadata = {
        "format-version": 2,
        "table-uuid": state["uuid"],
        "location": table_path,
        "last-sequence-number": snap.id,
        "last-updated-ms": snap.time_millis,
        "last-column-id": last_col_id,
        "schemas": schemas,
        "current-schema-id": schema.id,
        "partition-specs": [spec],
        "default-spec-id": 0,
        "last-partition-id": 1000 + len(schema.partition_keys) - 1
        if schema.partition_keys
        else 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "snapshots": state["snapshots"],
        "current-snapshot-id": snap.id,
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"], "timestamp-ms": s["timestamp-ms"]}
            for s in state["snapshots"]
        ],
        "refs": {"main": {"snapshot-id": snap.id, "type": "branch"}},
        "properties": {"write.format.default": schema.options.get("file.format", "parquet")},
    }
    meta_path = os.path.join(_meta_dir(table_path), f"v{version}.metadata.json")
    write_json(meta_path, metadata)
    with open(os.path.join(_meta_dir(table_path), "version-hint.text"), "w") as f:
        f.write(str(version))
    state["version"] = version
    _save_state(table_path, state)
    return meta_path


def on_commit(table, snap: Snapshot) -> None:
    """Commit callback (IcebergCommitCallback analogue): fires when
    ``metadata.iceberg.storage = table-location`` is set."""
    try:
        enabled = table.schema.options.get("metadata.iceberg.storage") == "table-location"
    except Exception:
        return
    if enabled and table.branch_name is None:
        export_snapshot(table, snap)


# --------------------------------------------------------------------------
# read-back helpers (tests, $iceberg inspection)
# --------------------------------------------------------------------------


def _local(path: str) -> str:
    """Strip a file: URI scheme (external writers record absolute URIs)."""
    if path.startswith("file://"):
        return path[len("file://") :]
    if path.startswith("file:"):
        return path[len("file:") :]
    return path


def read_metadata(table_path: str) -> dict:
    md = _meta_dir(os.path.abspath(table_path))
    hint = os.path.join(md, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            version = int(f.read().strip())
        name = f"v{version}.metadata.json"
    else:  # hadoop-layout fallback: highest vN.metadata.json
        versions = [
            int(n[1:].split(".", 1)[0])
            for n in os.listdir(md)
            if n.endswith(".metadata.json") and n[1:].split(".", 1)[0].isdigit()
        ]
        if not versions:
            raise FileNotFoundError(f"no Iceberg metadata under {md}")
        name = f"v{max(versions)}.metadata.json"
    with open(os.path.join(md, name)) as f:
        return json.load(f)


def current_data_files(table_path: str) -> list[dict]:
    """Decode manifest-list + manifests of the current snapshot; returns
    the data_file records (absolute paths) an Iceberg reader would scan."""
    meta = read_metadata(table_path)
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, manifest_rows = avro_io.read_container(_local(snap["manifest-list"]))
    out: list[dict] = []
    for m in manifest_rows:
        if m.get("content", 0) != 0:
            continue  # delete manifest
        _, entries = avro_io.read_container(_local(m["manifest_path"]))
        for e in entries:
            if e["status"] != 2:
                out.append(e["data_file"])
    return out


def current_position_deletes(table_path: str) -> list[dict]:
    """data_file records of the current snapshot's position-delete files
    (content=1 manifests)."""
    meta = read_metadata(table_path)
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, manifest_rows = avro_io.read_container(_local(snap["manifest-list"]))
    out: list[dict] = []
    for m in manifest_rows:
        if m.get("content", 0) != 1:
            continue
        _, entries = avro_io.read_container(_local(m["manifest_path"]))
        out.extend(e["data_file"] for e in entries if e["status"] != 2)
    return out
