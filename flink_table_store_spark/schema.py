"""Table schema: id-based fields, versioned JSON files, evolution.

Mirrors the reference schema system (paimon-core SchemaManager.java:104
``schema/schema-<id>`` files; paimon-api SchemaChange.java:84-163 for
the evolution ops; paimon-api DataField.java for stable field ids).
Types are stored as Spark SQL DDL strings — the §1.2 type mapping in
SURVEY.md is applied by the caller; Catalyst's cast matrix replaces the
reference's ~30 hand-written cast rules (paimon-common casting/).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

from flink_table_store_spark.fileio import read_json, write_json_atomic_new

# Reserved system fields (paimon-api SpecialFields.java:79-94).
SEQUENCE_NUMBER = "_SEQUENCE_NUMBER"
VALUE_KIND = "_VALUE_KIND"
# stable row id materialized by compaction rewrites of row-tracking
# tables (SpecialFields.java:79-94 _ROW_ID)
ROW_ID_COL = "_ROW_ID"
LEVEL = "_LEVEL"
ROW_KIND = "_row_kind"
SYSTEM_FIELDS = (SEQUENCE_NUMBER, VALUE_KIND, LEVEL)

# Row kinds (paimon-api RowKind.java:35-56).
KIND_INSERT = "+I"
KIND_UPDATE_BEFORE = "-U"
KIND_UPDATE_AFTER = "+U"
KIND_DELETE = "-D"


@dataclass
class DataField:
    id: int
    name: str
    type: str  # Spark DDL type string, e.g. "bigint", "decimal(15,2)"
    nullable: bool = True

    def to_dict(self) -> dict[str, Any]:
        return {"id": self.id, "name": self.name, "type": self.type, "nullable": self.nullable}

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "DataField":
        return DataField(d["id"], d["name"], d["type"], d.get("nullable", True))


@dataclass
class TableSchema:
    id: int
    fields: list[DataField]
    partition_keys: list[str] = field(default_factory=list)
    primary_keys: list[str] = field(default_factory=list)
    options: dict[str, str] = field(default_factory=dict)
    highest_field_id: int = 0
    comment: str = ""

    def field_names(self) -> list[str]:
        return [f.name for f in self.fields]

    def field(self, name: str) -> DataField:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, parse_type(f.type), f.nullable) for f in self.fields]
        )

    def trimmed_primary_keys(self) -> list[str]:
        """PK minus partition keys — the key actually hashed to buckets
        (reference: trimmed-PK BinaryRow, DefaultBucketFunction.java:30)."""
        return [k for k in self.primary_keys if k not in self.partition_keys] or list(self.primary_keys)

    def num_buckets(self) -> int:
        return int(self.options.get("bucket", "4" if self.primary_keys else "-1"))

    def file_format(self) -> str:
        """Data file format (`file.format`, default parquet —
        CoreOptions.java:258). parquet and orc use Spark's native
        vectorized readers; avro requires the spark-avro connector and
        raises if it is not on the classpath; lance (paimon-lance
        LanceFileFormat.java) requires the Spark-Lance connector
        ("lance" DataSource) + the lance python package and raises a
        clear error when either is absent (this build environment has
        neither — the S9 gap is the connector, not the engine plumbing:
        data files already carry their format in the name suffix and
        every read groups by (schema generation, format))."""
        fmt = self.options.get("file.format", "parquet").lower()
        if fmt == "lance":
            try:
                import lance  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "file.format=lance needs the 'lance' python package and "
                    "the Spark-Lance connector on the classpath; neither is "
                    "installed here — use parquet/orc/avro"
                ) from exc
            return fmt
        if fmt not in ("parquet", "orc", "avro"):
            raise ValueError(f"unsupported file.format: {fmt}")
        return fmt

    def to_dict(self) -> dict[str, Any]:
        return {
            "id": self.id,
            "fields": [f.to_dict() for f in self.fields],
            "partitionKeys": self.partition_keys,
            "primaryKeys": self.primary_keys,
            "options": self.options,
            "highestFieldId": self.highest_field_id,
            "comment": self.comment,
        }

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "TableSchema":
        return TableSchema(
            id=d["id"],
            fields=[DataField.from_dict(f) for f in d["fields"]],
            partition_keys=d.get("partitionKeys", []),
            primary_keys=d.get("primaryKeys", []),
            options=d.get("options", {}),
            highest_field_id=d.get("highestFieldId", 0),
            comment=d.get("comment", ""),
        )


def parse_type(ddl: str) -> T.DataType:
    return T._parse_datatype_string(ddl)


def from_spark_schema(
    schema: T.StructType,
    partition_keys: list[str] | None = None,
    primary_keys: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> TableSchema:
    fields = [
        DataField(i, f.name, f.dataType.simpleString(), f.nullable)
        for i, f in enumerate(schema.fields)
    ]
    return TableSchema(
        id=0,
        fields=fields,
        partition_keys=partition_keys or [],
        primary_keys=primary_keys or [],
        options=options or {},
        highest_field_id=len(fields) - 1,
    )


class SchemaManager:
    """Versioned schema files under ``<table>/schema/``."""

    def __init__(self, table_path: str):
        self.dir = os.path.join(table_path, "schema")

    def _path(self, schema_id: int) -> str:
        return os.path.join(self.dir, f"schema-{schema_id}")

    def latest_id(self) -> int | None:
        if not os.path.isdir(self.dir):
            return None
        ids = [
            int(n.split("-", 1)[1])
            for n in os.listdir(self.dir)
            if n.startswith("schema-") and n.split("-", 1)[1].isdigit()
        ]
        return max(ids) if ids else None

    def latest(self) -> TableSchema | None:
        i = self.latest_id()
        return None if i is None else self.load(i)

    def load(self, schema_id: int) -> TableSchema:
        return TableSchema.from_dict(read_json(self._path(schema_id)))

    def commit(self, schema: TableSchema) -> None:
        os.makedirs(self.dir, exist_ok=True)
        if not write_json_atomic_new(self._path(schema.id), schema.to_dict()):
            raise RuntimeError(f"schema-{schema.id} already exists (concurrent DDL)")

    # --- evolution ops (SchemaChange.java:84-163) ---

    def evolve(self, changes: list[dict[str, Any]]) -> TableSchema:
        """Apply a list of changes and commit a new schema version.

        Change dicts: {"action": "add_column", "name", "type"} |
        {"action": "rename_column", "name", "new_name"} |
        {"action": "drop_column", "name"} |
        {"action": "update_column_type", "name", "type"} |
        {"action": "set_option"/"remove_option", "key", ["value"]}
        """
        cur = self.latest()
        if cur is None:
            raise RuntimeError("no schema to evolve")
        fields = [DataField(f.id, f.name, f.type, f.nullable) for f in cur.fields]
        options = dict(cur.options)
        hid = cur.highest_field_id
        def _nested(name: str, op, typ: str | None = None) -> bool:
            """Apply a struct-LEAF change (SchemaChange.java:84-163
            nested column ops, name-matched): ``name`` is ``root.leaf``.
            Subfields carry no field ids here, so evolution is
            name-stable: add/drop/update_type work; rename does not."""
            if "." not in name:
                return False
            root, leaf = name.split(".", 1)
            if "." in leaf:
                raise ValueError("nested evolution supports one struct level")
            for f in fields:
                if f.name == root:
                    dt = parse_type(f.type)
                    if not isinstance(dt, T.StructType):
                        raise ValueError(f"{root} is not a struct")
                    f.type = op(dt, leaf, typ).simpleString()
                    return True
            raise KeyError(root)

        def _sub_add(dt, leaf, typ):
            if leaf in dt.names:
                raise ValueError(f"subfield {leaf} exists")
            return T.StructType(list(dt.fields) + [T.StructField(leaf, parse_type(typ))])

        def _sub_drop(dt, leaf, _typ):
            if leaf not in dt.names:
                raise KeyError(leaf)
            return T.StructType([x for x in dt.fields if x.name != leaf])

        def _sub_retype(dt, leaf, typ):
            if leaf not in dt.names:
                raise KeyError(leaf)
            return T.StructType(
                [
                    T.StructField(x.name, parse_type(typ)) if x.name == leaf else x
                    for x in dt.fields
                ]
            )

        for ch in changes:
            a = ch["action"]
            if a == "add_column":
                if _nested(ch["name"], _sub_add, ch["type"]):
                    continue
                hid += 1
                fields.append(DataField(hid, ch["name"], ch["type"], ch.get("nullable", True)))
            elif a == "rename_column":
                if "." in ch["name"]:
                    raise ValueError(
                        "nested rename needs nested field ids (subfields are "
                        "name-matched across generations) — unsupported"
                    )
                for f in fields:
                    if f.name == ch["name"]:
                        f.name = ch["new_name"]
                        break
                else:
                    raise KeyError(ch["name"])
            elif a == "drop_column":
                if "." in ch["name"]:
                    _nested(ch["name"], _sub_drop)
                    continue
                fields = [f for f in fields if f.name != ch["name"]]
            elif a == "update_column_type":
                if _nested(ch["name"], _sub_retype, ch["type"]):
                    continue
                for f in fields:
                    if f.name == ch["name"]:
                        f.type = ch["type"]
                        break
                else:
                    raise KeyError(ch["name"])
            elif a == "set_option":
                options[ch["key"]] = str(ch["value"])
            elif a == "remove_option":
                options.pop(ch["key"], None)
            else:
                raise ValueError(f"unknown schema change {a}")
        new = TableSchema(
            id=cur.id + 1,
            fields=fields,
            partition_keys=cur.partition_keys,
            primary_keys=cur.primary_keys,
            options=options,
            highest_field_id=hid,
            comment=cur.comment,
        )
        self.commit(new)
        return new
