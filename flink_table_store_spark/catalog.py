"""Filesystem catalog: ``warehouse/<db>.db/<table>`` directory layout.

Mirrors the reference FileSystemCatalog (paimon-core catalog/): a
database is a directory, a table is a directory with schema/, snapshot/,
manifest/, data. System tables resolve via the ``table$suffix`` naming
convention (SystemTableLoader, paimon-core table/system/).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import types as T

from flink_table_store_spark.schema import SchemaManager, TableSchema, from_spark_schema
from flink_table_store_spark.table import Table


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _db_path(self, database: str) -> str:
        return os.path.join(self.warehouse, f"{database}.db")

    def create_database(self, database: str, ignore_if_exists: bool = True) -> None:
        p = self._db_path(database)
        if os.path.exists(p) and not ignore_if_exists:
            raise RuntimeError(f"database {database} exists")
        os.makedirs(p, exist_ok=True)

    def list_databases(self) -> list[str]:
        return sorted(
            n[:-3] for n in os.listdir(self.warehouse) if n.endswith(".db")
        )

    def drop_database(
        self, database: str, ignore_if_not_exists: bool = True, cascade: bool = False
    ) -> None:
        """Drop a database; refuses a non-empty one unless ``cascade``
        (Catalog.dropDatabase semantics)."""
        p = self._db_path(database)
        if not os.path.isdir(p):
            if ignore_if_not_exists:
                return
            raise RuntimeError(f"database {database} does not exist")
        if os.listdir(p) and not cascade:
            raise RuntimeError(f"database {database} is not empty (use cascade)")
        shutil.rmtree(p)

    def list_tables(self, database: str) -> list[str]:
        p = self._db_path(database)
        if not os.path.isdir(p):
            return []
        return sorted(n for n in os.listdir(p) if os.path.isdir(os.path.join(p, n)))

    def table_path(self, identifier: str) -> str:
        db, name = self._split(identifier)
        return os.path.join(self._db_path(db), name)

    def _split(self, identifier: str) -> tuple[str, str]:
        if "." in identifier:
            db, name = identifier.split(".", 1)
        else:
            db, name = "default", identifier
        return db, name

    def create_table(
        self,
        identifier: str,
        schema: T.StructType | TableSchema,
        partition_keys: list[str] | None = None,
        primary_keys: list[str] | None = None,
        options: dict[str, str] | None = None,
        ignore_if_exists: bool = False,
    ) -> Table:
        db, name = self._split(identifier)
        self.create_database(db)
        path = os.path.join(self._db_path(db), name)
        sm = SchemaManager(path)
        if sm.latest() is not None:
            if ignore_if_exists:
                return Table(path, name)
            raise RuntimeError(f"table {identifier} exists")
        if isinstance(schema, str):  # DDL string "a bigint, b string"
            schema = T.StructType.fromDDL(schema)
        if isinstance(schema, T.StructType):
            ts = from_spark_schema(schema, partition_keys, primary_keys, options)
        else:
            ts = schema
        if ts.primary_keys and ts.options.get("cross-partition-update") != "true":
            # reference requires pk ⊇ partition keys for PK tables —
            # UNLESS cross-partition update mode is on (BucketMode
            # CROSS_PARTITION: the key may move between partitions)
            for k in ts.partition_keys:
                if k not in ts.primary_keys:
                    ts.primary_keys = ts.partition_keys + ts.primary_keys
                    break
        if ts.options.get("upsert-key"):
            # SchemaValidation.java: upsert-key is the NON-PK upsert mode
            if ts.primary_keys:
                raise ValueError(
                    "upsert-key cannot be used together with primary keys"
                )
            fields = set(ts.field_names())
            for k in (c.strip() for c in ts.options["upsert-key"].split(",")):
                if k not in fields:
                    raise ValueError(f"upsert-key column {k!r} not in schema")
        os.makedirs(path, exist_ok=True)
        sm.commit(ts)
        return Table(path, name)

    def get_table(self, identifier: str) -> Table:
        if "$" in identifier:
            base, _, suffix = identifier.partition("$")
            if suffix.startswith("branch_"):
                # the reference's `t$branch_<name>` spelling
                # (docs/content/maintenance/manage-branches.md,
                # chain-table.md:95-112) — same table as `t@<name>`
                return self.get_table(base).use_branch(
                    suffix[len("branch_"):]
                )
            raise ValueError(
                f"'{identifier}' names a system table — use catalog.read_system(spark, ...)"
            )
        base, _, branch = identifier.partition("@")  # "db.t@branchname"
        path = self.table_path(base)
        if not os.path.isdir(path):
            raise RuntimeError(f"table {identifier} not found at {path}")
        return Table(path, base, branch=branch or None)

    def read_system(self, spark, identifier: str):
        """Resolve ``db.t$snapshots``-style names to a metadata DataFrame
        (SystemTableLoader name-suffix convention). Catalog-global
        tables live in the ``sys`` database (SystemTableLoader.loadGlobal:
        ``sys.tables``, ``sys.catalog_options``, ``sys.all_table_options``,
        ``sys.all_partitions``)."""
        if identifier.startswith("sys."):
            return self._read_global_system(spark, identifier[len("sys."):])
        base, _, sys_name = identifier.partition("$")
        if sys_name.startswith("branch_"):
            return self.get_table(identifier).to_df(spark)
        return self.get_table(base).system_table(spark, sys_name)

    def _read_global_system(self, spark, name: str):
        import json as _json

        if name == "catalog_options":
            return spark.createDataFrame(
                [("warehouse", self.warehouse)], "key string, value string"
            )
        pairs = [
            (db, tbl)
            for db in self.list_databases()
            for tbl in self.list_tables(db)
        ]
        if name == "tables":
            rows = []
            for db, tbl in pairs:
                t = self.get_table(f"{db}.{tbl}")
                rows.append(
                    (
                        db,
                        tbl,
                        t.path,
                        ",".join(t.schema.partition_keys),
                        ",".join(t.schema.primary_keys),
                    )
                )
            return spark.createDataFrame(
                rows,
                "database string, table_name string, path string, "
                "partition_keys string, primary_keys string",
            )
        if name == "all_table_options":
            rows = [
                (db, tbl, k, v)
                for db, tbl in pairs
                for k, v in sorted(self.get_table(f"{db}.{tbl}").schema.options.items())
            ]
            return spark.createDataFrame(
                rows, "database string, table_name string, key string, value string"
            )
        if name == "all_partitions":
            rows = []
            for db, tbl in pairs:
                t = self.get_table(f"{db}.{tbl}")
                snap = t.snapshots.latest()
                if snap is None:
                    continue
                agg: dict[str, list[int]] = {}
                for e in t.manifests.read_live_entries(
                    snap.base_manifest_list, snap.delta_manifest_list
                ):
                    cur = agg.setdefault(_json.dumps(e.partition, sort_keys=True), [0, 0, 0])
                    cur[0] += e.row_count
                    cur[1] += e.file_size
                    cur[2] += 1
                rows.extend((db, tbl, k, *v) for k, v in sorted(agg.items()))
            return spark.createDataFrame(
                rows,
                "database string, table_name string, partition string, "
                "record_count bigint, file_size_in_bytes bigint, file_count bigint",
            )
        raise ValueError(
            f"unknown global system table sys.{name} "
            "(have tables, catalog_options, all_table_options, all_partitions)"
        )

    def drop_table(self, identifier: str, ignore_if_not_exists: bool = True) -> None:
        path = self.table_path(identifier)
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif not ignore_if_not_exists:
            raise RuntimeError(f"table {identifier} not found")

    def rename_table(self, src: str, dst: str) -> None:
        os.replace(self.table_path(src), self.table_path(dst))

    # --- format tables (S9 passthrough; FormatTable.java:76-80) ---

    def create_format_table(
        self,
        identifier: str,
        location: str,
        format: str,
        options: dict[str, str] | None = None,
    ):
        import json

        from flink_table_store_spark.sources.format_table import FormatTable

        db, name = self._split(identifier)
        self.create_database(db)
        path = os.path.join(self._db_path(db), name)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "format-table.json"), "w") as f:
            json.dump({"location": location, "format": format, "options": options or {}}, f)
        return FormatTable(identifier, location, format, options or {})

    def get_format_table(self, identifier: str):
        import json

        from flink_table_store_spark.sources.format_table import FormatTable

        p = os.path.join(self.table_path(identifier), "format-table.json")
        if not os.path.exists(p):
            raise RuntimeError(f"{identifier} is not a format table")
        with open(p) as f:
            d = json.load(f)
        return FormatTable(identifier, d["location"], d["format"], d.get("options", {}))

    # --- object tables (table/object/ObjectTable.java:34) ---

    def create_object_table(
        self,
        identifier: str,
        location: str,
        options: dict[str, str] | None = None,
    ):
        import json

        from flink_table_store_spark.sources.format_table import ObjectTable

        db, name = self._split(identifier)
        self.create_database(db)
        path = os.path.join(self._db_path(db), name)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "object-table.json"), "w") as f:
            json.dump({"location": location, "options": options or {}}, f)
        return ObjectTable(identifier, location, options or {})

    def get_object_table(self, identifier: str):
        import json

        from flink_table_store_spark.sources.format_table import ObjectTable

        p = os.path.join(self.table_path(identifier), "object-table.json")
        if not os.path.exists(p):
            raise RuntimeError(f"{identifier} is not an object table")
        with open(p) as f:
            d = json.load(f)
        return ObjectTable(identifier, d["location"], d.get("options", {}))

    # --- views (reference: catalog view support + view dialect procedures;
    # paimon-api view/, paimon-spark procedure/ alter_view_dialect) ---

    def create_view(
        self,
        identifier: str,
        sql: str,
        dialect: str = "spark",
        comment: str = "",
        ignore_if_exists: bool = False,
    ) -> dict:
        import json

        db, name = self._split(identifier)
        self.create_database(db)
        path = os.path.join(self._db_path(db), name)
        vp = os.path.join(path, "view.json")
        if os.path.exists(vp) and not ignore_if_exists:
            raise RuntimeError(f"view {identifier} exists")
        os.makedirs(path, exist_ok=True)
        # dialects: the reference stores one query text per engine dialect;
        # we keep a {dialect: sql} map with 'spark' as the executable one
        d = {"name": identifier, "comment": comment, "dialects": {dialect: sql}}
        if os.path.exists(vp):
            with open(vp) as f:
                old = json.load(f)
            old["dialects"][dialect] = sql
            d = old
        with open(vp, "w") as f:
            json.dump(d, f)
        return d

    def get_view(self, identifier: str) -> dict:
        import json

        vp = os.path.join(self.table_path(identifier), "view.json")
        if not os.path.exists(vp):
            raise RuntimeError(f"{identifier} is not a view")
        with open(vp) as f:
            return json.load(f)

    def is_view(self, identifier: str) -> bool:
        return os.path.exists(os.path.join(self.table_path(identifier), "view.json"))

    def drop_view(self, identifier: str, ignore_if_not_exists: bool = True) -> None:
        path = self.table_path(identifier)
        if os.path.exists(os.path.join(path, "view.json")):
            shutil.rmtree(path)
        elif not ignore_if_not_exists:
            raise RuntimeError(f"view {identifier} not found")

    def list_views(self, database: str) -> list[str]:
        p = self._db_path(database)
        if not os.path.isdir(p):
            return []
        return sorted(
            n
            for n in os.listdir(p)
            if os.path.exists(os.path.join(p, n, "view.json"))
        )

    # --- catalog functions (F7) ---

    @property
    def functions(self):
        from flink_table_store_spark.functions import FunctionManager

        return FunctionManager(self.warehouse)
