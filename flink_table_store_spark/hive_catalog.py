"""Hive-metastore catalog adapter (missing #1 from VERDICT r2).

Mirrors the reference's HiveCatalog (paimon-hive/paimon-hive-catalog/
.../HiveCatalog.java): table DATA and table METADATA (schema/, snapshot/,
manifest/) stay in the filesystem warehouse exactly as with the
filesystem catalog — the metastore holds a *registration*: one external
table entry per engine table whose ``TBLPROPERTIES`` carry the table
path and type, so existing Hive/Spark tooling can discover the tables
(``SHOW TABLES``, ``DESCRIBE``, Atlas-style scanners) and this engine
can resolve them back. The reference stores the same pointer shape
(HiveCatalog.java ``createHiveTable``: parameters
``table_type=PAIMON``/storage-descriptor location).

The adapter works against ANY Spark session catalog: with
``spark.sql.catalogImplementation=hive`` the entries land in the (Derby
or remote) Hive metastore and survive session restarts; with
``in-memory`` the same code paths register into the session catalog
(useful for tests and ephemeral jobs).

Direct ``spark.table('db.t')`` reads of the registration see raw files,
NOT merge-on-read semantics — use ``HiveCatalog.get_table(...).to_df``
(or ``sql.py``'s resolver) like with the filesystem catalog. The entry
exists for discovery and interop, same trade-off as the reference's
Hive-side placeholder before paimon-hive's InputFormat is installed.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from flink_table_store_spark.catalog import Catalog
from flink_table_store_spark.table import Table

TABLE_TYPE_PROP = "flink_table_store.table_type"
TABLE_TYPE = "FLINK_TABLE_STORE"
PATH_PROP = "flink_table_store.path"


def _q(ident: str) -> str:
    return ".".join(f"`{p}`" for p in ident.split("."))


class _MetastorePartitionHandler:
    """PartitionHandler for mark-done actions: ``done-partition``
    registers metastore partitions (AddDonePartitionAction.java's
    ``partitionHandler.createPartitions``) via idempotent
    ``ALTER TABLE ADD IF NOT EXISTS PARTITION``."""

    def __init__(self, spark: SparkSession, db: str, name: str, keys: list[str]):
        self.spark, self.db, self.name, self.keys = spark, db, name, keys

    def create_partitions(self, partitions: list[dict]) -> None:
        for d in partitions:
            spec = ", ".join(f"`{k}`='{str(d.get(k, ''))}'" for k in self.keys)
            self.spark.sql(
                f"ALTER TABLE `{self.db}`.`{self.name}` "
                f"ADD IF NOT EXISTS PARTITION ({spec})"
            )


class HiveCatalog(Catalog):
    """Filesystem-warehouse catalog that mirrors every DDL operation
    into the Spark session's (Hive) metastore."""

    def __init__(self, spark: SparkSession, warehouse: str):
        super().__init__(warehouse)
        self.spark = spark

    # --- registration helpers -------------------------------------------

    def _register(self, identifier: str, table: Table) -> None:
        db, name = self._split(identifier)
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
        schema = table.schema
        cols = ", ".join(f"`{f.name}` {f.type}" for f in schema.fields)
        props = {
            TABLE_TYPE_PROP: TABLE_TYPE,
            PATH_PROP: table.path,
            "partition_keys": ",".join(schema.partition_keys),
            "primary_keys": ",".join(schema.primary_keys),
        }
        props_sql = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
        # metastore.partitioned-table: register as a PARTITIONED hive
        # table so metastore scanners see per-partition entries; commits
        # then sync new partitions (AddPartitionCommitCallback.java)
        part_sql = ""
        if self._partition_sync_enabled(schema):
            keys = ", ".join(f"`{k}`" for k in schema.partition_keys)
            part_sql = f"PARTITIONED BY ({keys}) "
        ttp = schema.options.get("metastore.tag-to-partition")
        if ttp and not schema.partition_keys:
            # upsert-to-partitioned (migration/upsert-to-partitioned.md):
            # the mirror exposes a VIRTUAL partition column mapping tag
            # names, so Hive-style consumers SHOW PARTITIONS / prune
            cols = f"{cols}, `{ttp}` string"
            part_sql = f"PARTITIONED BY (`{ttp}`) "
        # external entry: dropping the registration must never delete data
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS `{db}`.`{name}` ({cols}) USING parquet "
            f"{part_sql}"
            f"LOCATION '{os.path.join(table.path, 'data')}' "
            f"TBLPROPERTIES ({props_sql})"
        )

    @staticmethod
    def _partition_sync_enabled(schema) -> bool:
        return (
            bool(schema.partition_keys)
            and schema.options.get("metastore.partitioned-table") == "true"
        )

    def _attach_partition_sync(self, identifier: str, table: Table) -> Table:
        """Post-commit hook mirroring AddPartitionCommitCallback.java:
        every commit registers its delta's newly-ADDed partitions in the
        metastore (idempotent ADD IF NOT EXISTS, memoized per handle)."""
        ttp = table.schema.options.get("metastore.tag-to-partition")
        if ttp and not table.schema.partition_keys:
            table.tag_partition_handler = _MetastorePartitionHandler(
                self.spark, *self._split(identifier), [ttp]
            )
        if not self._partition_sync_enabled(table.schema):
            return table
        db, name = self._split(identifier)
        seen: set[tuple] = set()
        keys = list(table.schema.partition_keys)
        spark = self.spark

        def _sync(snap) -> None:
            from flink_table_store_spark.manifest import KIND_ADD

            parts = {
                tuple(sorted(e.partition.items()))
                for e in table.manifests.read_entries(snap.delta_manifest_list)
                if e.kind == KIND_ADD and e.partition
            }
            for p in parts - seen:
                d = dict(p)
                spec = ", ".join(
                    f"`{k}`='{str(d.get(k, ''))}'" for k in keys
                )
                spark.sql(
                    f"ALTER TABLE `{db}`.`{name}` "
                    f"ADD IF NOT EXISTS PARTITION ({spec})"
                )
                seen.add(p)

        table.committer.callbacks.append(_sync)
        table.partition_handler = _MetastorePartitionHandler(
            spark, db, name, keys
        )
        return table

    def _registered_path(self, identifier: str) -> str | None:
        db, name = self._split(identifier)
        try:
            rows = self.spark.sql(
                f"SHOW TBLPROPERTIES {_q(f'{db}.{name}')}"
            ).collect()
        except Exception:
            return None
        props = {r.key: r.value for r in rows}
        if props.get(TABLE_TYPE_PROP) != TABLE_TYPE:
            return None
        return props.get(PATH_PROP)

    # --- Catalog protocol overrides -------------------------------------

    def create_database(self, database: str, ignore_if_exists: bool = True) -> None:
        super().create_database(database, ignore_if_exists)
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{database}`")

    def list_databases(self) -> list[str]:
        fs = set(super().list_databases())
        ms = {r.namespace for r in self.spark.sql("SHOW DATABASES").collect()}
        ms.discard("default")  # implicit metastore db; list only if real
        return sorted(fs | ms)

    def list_tables(self, database: str) -> list[str]:
        fs = set(super().list_tables(database))
        try:
            ms = {
                r.tableName
                for r in self.spark.sql(f"SHOW TABLES IN `{database}`").collect()
                if self._registered_path(f"{database}.{r.tableName}")
            }
        except Exception:
            ms = set()
        return sorted(fs | ms)

    def create_table(
        self,
        identifier: str,
        schema,
        partition_keys: list[str] | None = None,
        primary_keys: list[str] | None = None,
        options: dict[str, str] | None = None,
        ignore_if_exists: bool = False,
    ) -> Table:
        t = super().create_table(
            identifier, schema, partition_keys, primary_keys, options, ignore_if_exists
        )
        self._register(identifier, t)
        return self._attach_partition_sync(identifier, t)

    def get_table(self, identifier: str) -> Table:
        base, _, branch = identifier.partition("@")
        reg = self._registered_path(base) if "$" not in base else None
        if reg and not os.path.isdir(self.table_path(base)):
            # registered in the metastore under a foreign warehouse path
            return self._attach_partition_sync(
                base, Table(reg, base, branch=branch or None)
            )
        return self._attach_partition_sync(base, super().get_table(identifier))

    def drop_table(self, identifier: str, ignore_if_not_exists: bool = True) -> None:
        db, name = self._split(identifier)
        self.spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{name}`")
        super().drop_table(identifier, ignore_if_not_exists)

    def rename_table(self, src: str, dst: str) -> None:
        super().rename_table(src, dst)
        sdb, sname = self._split(src)
        self.spark.sql(f"DROP TABLE IF EXISTS `{sdb}`.`{sname}`")
        self._register(dst, super().get_table(dst))

    def sync_table(self, identifier: str) -> None:
        """Refresh the metastore registration to the CURRENT engine
        schema — call after ``evolve_schema`` so ``DESCRIBE`` and
        metastore scanners see the evolved columns (the reference's
        HiveCatalog keeps the HMS entry in sync on alterTable,
        HiveCatalog.java ``alterTableImpl``). Resolves the table FIRST
        (through the foreign-warehouse-aware lookup) so a failed
        resolution — typo'd name, foreign table with no local schema
        dir — raises BEFORE the existing registration is dropped."""
        table = self.get_table(identifier)
        db, name = self._split(identifier)
        self.spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{name}`")
        self._register(identifier, table)
