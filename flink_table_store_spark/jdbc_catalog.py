"""JDBC catalog: catalog metadata in a SQL database, data on the warehouse.

Mirrors the reference JdbcCatalog (paimon-core jdbc/JdbcCatalog.java):
the relational database holds the TABLE REGISTRY (`paimon_tables`),
DATABASE PROPERTIES (`paimon_database_properties`) and a DISTRIBUTED
LOCK table (`paimon_distributed_locks`), while table schemas, snapshots,
manifests and data files stay on the shared filesystem warehouse —
exactly the reference's split (JdbcCatalog.loadTableSchema goes through
SchemaManager on the FileIO, JdbcCatalog.java:278-289).

The backend is sqlite (Python stdlib) — the reference ships this exact
dialect (jdbc/SqlLiteDistributedLockDialect.java); MySQL/Postgres would
differ only in SQL spelling, which the reference isolates behind
AbstractDistributedLockDialect the same way this module isolates it
behind module-level SQL constants.

Lock protocol (JdbcCatalogLock.java:40-75 + JdbcUtils.acquire):
``acquire`` first deletes the row if it has outlived its expiry
(steal-on-timeout, so a crashed holder cannot deadlock the catalog),
then INSERTs the lock id — the primary-key constraint is the mutual
exclusion. Waiters back off exponentially from 50 ms up to
``check_max_sleep`` and give up after ``acquire_timeout``
(lock-check-max-sleep / lock-acquire-timeout options).
"""

from __future__ import annotations

import contextlib
import os
import shutil
import sqlite3
import time

from pyspark.sql import types as T

from flink_table_store_spark.catalog import Catalog
from flink_table_store_spark.schema import TableSchema
from flink_table_store_spark.table import Table

# exact reference table/column names (jdbc/JdbcUtils.java)
CATALOG_TABLE_NAME = "paimon_tables"
DATABASE_PROPERTIES_TABLE_NAME = "paimon_database_properties"
DISTRIBUTED_LOCKS_TABLE_NAME = "paimon_distributed_locks"
DATABASE_EXISTS_PROPERTY = "exists"  # JdbcCatalog.DATABASE_EXISTS_PROPERTY

_DDL = [
    f"""CREATE TABLE IF NOT EXISTS {CATALOG_TABLE_NAME} (
        catalog_key VARCHAR(255) NOT NULL,
        database_name VARCHAR(255) NOT NULL,
        table_name VARCHAR(255) NOT NULL,
        PRIMARY KEY (catalog_key, database_name, table_name)
    )""",
    f"""CREATE TABLE IF NOT EXISTS {DATABASE_PROPERTIES_TABLE_NAME} (
        catalog_key VARCHAR(255) NOT NULL,
        database_name VARCHAR(255) NOT NULL,
        property_key VARCHAR(255) NOT NULL,
        property_value VARCHAR(1000),
        PRIMARY KEY (catalog_key, database_name, property_key)
    )""",
    f"""CREATE TABLE IF NOT EXISTS {DISTRIBUTED_LOCKS_TABLE_NAME} (
        lock_id VARCHAR(1000) NOT NULL,
        acquired_at BIGINT NOT NULL,
        expire_time BIGINT NOT NULL,
        PRIMARY KEY (lock_id)
    )""",
]


def _now_ms() -> int:
    return int(time.time() * 1000)


class JdbcCatalogLock:
    """Row-as-lock over the shared database: INSERT wins, duplicate-key
    loses; expired rows are stolen (SqlLiteDistributedLockDialect)."""

    def __init__(
        self,
        db_path: str,
        catalog_key: str,
        check_max_sleep_ms: int = 8_000,
        acquire_timeout_ms: int = 60_000,
        lock_ttl_ms: int = 60_000,
    ):
        self._db_path = db_path
        self._catalog_key = catalog_key
        self._check_max_sleep = check_max_sleep_ms
        self._acquire_timeout = acquire_timeout_ms
        self._ttl = lock_ttl_ms

    def _conn(self) -> sqlite3.Connection:
        c = sqlite3.connect(self._db_path, timeout=30.0)
        c.execute("PRAGMA busy_timeout=30000")
        return c

    def try_acquire(self, lock_id: str) -> bool:
        with contextlib.closing(self._conn()) as c:
            with c:  # one transaction: steal-expired + insert
                c.execute(
                    f"DELETE FROM {DISTRIBUTED_LOCKS_TABLE_NAME} "
                    "WHERE lock_id = ? AND acquired_at + expire_time < ?",
                    (lock_id, _now_ms()),
                )
                try:
                    c.execute(
                        f"INSERT INTO {DISTRIBUTED_LOCKS_TABLE_NAME} "
                        "(lock_id, acquired_at, expire_time) VALUES (?, ?, ?)",
                        (lock_id, _now_ms(), self._ttl),
                    )
                    return True
                except sqlite3.IntegrityError:
                    return False

    def release(self, lock_id: str) -> None:
        with contextlib.closing(self._conn()) as c:
            with c:
                c.execute(
                    f"DELETE FROM {DISTRIBUTED_LOCKS_TABLE_NAME} WHERE lock_id = ?",
                    (lock_id,),
                )

    def run_with_lock(self, database: str, table: str, fn):
        """Exponential-backoff acquire then run ``fn`` under the lock
        (JdbcCatalogLock.runWithLock/lock)."""
        lock_id = f"{self._catalog_key}.{database}.{table}"
        start = _now_ms()
        sleep_ms = 50
        got = self.try_acquire(lock_id)
        while not got:
            if _now_ms() - start > self._acquire_timeout:
                raise RuntimeError(
                    f"Acquire lock failed with time: {_now_ms() - start}ms "
                    f"(lock {lock_id})"
                )
            time.sleep(min(sleep_ms, self._check_max_sleep) / 1000.0)
            sleep_ms *= 2
            got = self.try_acquire(lock_id)
        try:
            return fn()
        finally:
            self.release(lock_id)


class JdbcCatalog(Catalog):
    """Catalog whose database/table REGISTRY lives in a sqlite database
    shared by every client, with per-identifier distributed locking.

    ``uri`` accepts the reference's ``jdbc:sqlite:<path>`` spelling, a
    bare ``sqlite:<path>``, or a plain filesystem path to the .db file.
    """

    def __init__(
        self,
        uri: str,
        warehouse: str,
        catalog_key: str = "jdbc",
        options: dict[str, str] | None = None,
    ):
        super().__init__(warehouse)
        for prefix in ("jdbc:sqlite:", "sqlite:"):
            if uri.startswith(prefix):
                uri = uri[len(prefix):]
                break
        self.db_path = uri
        self.catalog_key = catalog_key
        self.options = dict(options or {})
        os.makedirs(os.path.dirname(os.path.abspath(uri)), exist_ok=True)
        with contextlib.closing(self._conn()) as c:
            with c:
                for ddl in _DDL:
                    c.execute(ddl)
        ttl = int(self.options.get("lock-ttl-ms", "60000"))
        self.lock = JdbcCatalogLock(
            self.db_path,
            catalog_key,
            check_max_sleep_ms=int(self.options.get("lock-check-max-sleep-ms", "8000")),
            acquire_timeout_ms=int(self.options.get("lock-acquire-timeout-ms", "60000")),
            lock_ttl_ms=ttl,
        )

    def _conn(self) -> sqlite3.Connection:
        c = sqlite3.connect(self.db_path, timeout=30.0)
        c.execute("PRAGMA busy_timeout=30000")
        return c

    def run_with_lock(self, identifier: str, fn):
        db, name = self._split(identifier)
        return self.lock.run_with_lock(db, name, fn)

    # --- databases (JdbcCatalog.createDatabaseImpl/listDatabases/...) ---

    def create_database(
        self,
        database: str,
        ignore_if_exists: bool = True,
        properties: dict[str, str] | None = None,
    ) -> None:
        props = {DATABASE_EXISTS_PROPERTY: "true", **(properties or {})}
        with contextlib.closing(self._conn()) as c:
            with c:
                exists = c.execute(
                    f"SELECT 1 FROM {DATABASE_PROPERTIES_TABLE_NAME} "
                    "WHERE catalog_key = ? AND database_name = ? "
                    f"AND property_key = '{DATABASE_EXISTS_PROPERTY}'",
                    (self.catalog_key, database),
                ).fetchone()
                if exists:
                    if ignore_if_exists:
                        return
                    raise RuntimeError(f"database {database} exists")
                c.executemany(
                    f"INSERT OR REPLACE INTO {DATABASE_PROPERTIES_TABLE_NAME} "
                    "(catalog_key, database_name, property_key, property_value) "
                    "VALUES (?, ?, ?, ?)",
                    [(self.catalog_key, database, k, v) for k, v in props.items()],
                )
        os.makedirs(self._db_path(database), exist_ok=True)

    def list_databases(self) -> list[str]:
        with contextlib.closing(self._conn()) as c:
            rows = c.execute(
                f"SELECT DISTINCT database_name FROM {CATALOG_TABLE_NAME} "
                "WHERE catalog_key = ? "
                "UNION "
                f"SELECT DISTINCT database_name FROM {DATABASE_PROPERTIES_TABLE_NAME} "
                "WHERE catalog_key = ?",
                (self.catalog_key, self.catalog_key),
            ).fetchall()
        return sorted(r[0] for r in rows)

    def get_database(self, database: str) -> dict[str, str]:
        """Database properties, sans the internal 'exists' marker
        (JdbcCatalog.getDatabaseImpl)."""
        with contextlib.closing(self._conn()) as c:
            rows = c.execute(
                f"SELECT property_key, property_value FROM "
                f"{DATABASE_PROPERTIES_TABLE_NAME} "
                "WHERE catalog_key = ? AND database_name = ?",
                (self.catalog_key, database),
            ).fetchall()
        if not rows and not self.list_tables(database):
            raise RuntimeError(f"database {database} does not exist")
        props = dict(rows)
        props.pop(DATABASE_EXISTS_PROPERTY, None)
        return props

    def alter_database(
        self,
        database: str,
        set_properties: dict[str, str] | None = None,
        remove_keys: list[str] | None = None,
    ) -> None:
        self.get_database(database)  # existence check
        with contextlib.closing(self._conn()) as c:
            with c:
                c.executemany(
                    f"INSERT OR REPLACE INTO {DATABASE_PROPERTIES_TABLE_NAME} "
                    "(catalog_key, database_name, property_key, property_value) "
                    "VALUES (?, ?, ?, ?)",
                    [
                        (self.catalog_key, database, k, v)
                        for k, v in (set_properties or {}).items()
                    ],
                )
                for k in remove_keys or []:
                    if k == DATABASE_EXISTS_PROPERTY:
                        continue
                    c.execute(
                        f"DELETE FROM {DATABASE_PROPERTIES_TABLE_NAME} "
                        "WHERE catalog_key = ? AND database_name = ? "
                        "AND property_key = ?",
                        (self.catalog_key, database, k),
                    )

    def drop_database(
        self, database: str, ignore_if_not_exists: bool = True, cascade: bool = False
    ) -> None:
        tables = self.list_tables(database)
        if tables and not cascade:
            raise RuntimeError(f"database {database} is not empty (use cascade)")
        with contextlib.closing(self._conn()) as c:
            with c:
                n = c.execute(
                    f"DELETE FROM {DATABASE_PROPERTIES_TABLE_NAME} "
                    "WHERE catalog_key = ? AND database_name = ?",
                    (self.catalog_key, database),
                ).rowcount
                n += c.execute(
                    f"DELETE FROM {CATALOG_TABLE_NAME} "
                    "WHERE catalog_key = ? AND database_name = ?",
                    (self.catalog_key, database),
                ).rowcount
        if n == 0 and not ignore_if_not_exists:
            raise RuntimeError(f"database {database} does not exist")
        p = self._db_path(database)
        if os.path.isdir(p):
            shutil.rmtree(p)

    # --- tables (registry row is the source of truth) ---

    def list_tables(self, database: str) -> list[str]:
        with contextlib.closing(self._conn()) as c:
            rows = c.execute(
                f"SELECT table_name FROM {CATALOG_TABLE_NAME} "
                "WHERE catalog_key = ? AND database_name = ?",
                (self.catalog_key, database),
            ).fetchall()
        return sorted(r[0] for r in rows)

    def _table_registered(self, db: str, name: str) -> bool:
        with contextlib.closing(self._conn()) as c:
            return (
                c.execute(
                    f"SELECT 1 FROM {CATALOG_TABLE_NAME} WHERE catalog_key = ? "
                    "AND database_name = ? AND table_name = ?",
                    (self.catalog_key, db, name),
                ).fetchone()
                is not None
            )

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
        # the INSERT's primary-key constraint arbitrates concurrent
        # creates — exactly one writer registers the row
        # (JdbcCatalog.createTableImpl:201-230)
        try:
            with contextlib.closing(self._conn()) as c:
                with c:
                    c.execute(
                        f"INSERT INTO {CATALOG_TABLE_NAME} "
                        "(catalog_key, database_name, table_name) VALUES (?, ?, ?)",
                        (self.catalog_key, db, name),
                    )
        except sqlite3.IntegrityError:
            if ignore_if_exists:
                return self.get_table(identifier)
            raise RuntimeError(f"table {identifier} exists") from None
        try:
            return super().create_table(
                identifier, schema, partition_keys, primary_keys, options,
                ignore_if_exists=True,
            )
        except Exception:
            # roll the registry row back so a failed FS create does not
            # leave a phantom table
            with contextlib.closing(self._conn()) as c:
                with c:
                    c.execute(
                        f"DELETE FROM {CATALOG_TABLE_NAME} WHERE catalog_key = ? "
                        "AND database_name = ? AND table_name = ?",
                        (self.catalog_key, db, name),
                    )
            raise

    def get_table(self, identifier: str) -> Table:
        base = identifier.partition("@")[0].partition("$")[0]
        db, name = self._split(base)
        if not self._table_registered(db, name):
            raise RuntimeError(f"table {identifier} not found in jdbc catalog")
        return super().get_table(identifier)

    def drop_table(self, identifier: str, ignore_if_not_exists: bool = True) -> None:
        db, name = self._split(identifier)
        with contextlib.closing(self._conn()) as c:
            with c:
                n = c.execute(
                    f"DELETE FROM {CATALOG_TABLE_NAME} WHERE catalog_key = ? "
                    "AND database_name = ? AND table_name = ?",
                    (self.catalog_key, db, name),
                ).rowcount
        if n == 0 and not ignore_if_not_exists:
            raise RuntimeError(f"table {identifier} not found")
        super().drop_table(identifier, ignore_if_not_exists=True)

    def rename_table(self, src: str, dst: str) -> None:
        """Registry UPDATE then directory rename, keeping database and
        filesystem consistent (JdbcCatalog.renameTableImpl:238-260)."""
        sdb, sname = self._split(src)
        ddb, dname = self._split(dst)
        with contextlib.closing(self._conn()) as c:
            with c:
                if c.execute(
                    f"SELECT 1 FROM {CATALOG_TABLE_NAME} WHERE catalog_key = ? "
                    "AND database_name = ? AND table_name = ?",
                    (self.catalog_key, ddb, dname),
                ).fetchone():
                    raise RuntimeError(f"table {dst} exists")
                n = c.execute(
                    f"UPDATE {CATALOG_TABLE_NAME} SET database_name = ?, "
                    "table_name = ? WHERE catalog_key = ? AND database_name = ? "
                    "AND table_name = ?",
                    (ddb, dname, self.catalog_key, sdb, sname),
                ).rowcount
                if n == 0:
                    raise RuntimeError(f"table {src} not found")
        os.makedirs(self._db_path(ddb), exist_ok=True)
        super().rename_table(src, dst)
