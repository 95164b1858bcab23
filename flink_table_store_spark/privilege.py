"""Privilege system: users, grants, and an access-checked catalog.

Mirrors the reference privilege package (paimon-core privilege/):

- ``FileBasedPrivilegeManager`` persists users (``user.sys``: user,
  sha256) and grants (``privilege.sys``: name, entity_type, identifier,
  privilege) inside the warehouse — the reference's exact directory
  names and row types (FileBasedPrivilegeManager.java:34-50). The
  reference dogfoods its own PK table format for these stores; here
  each store is a single parquet swapped with an atomic rename, because
  privilege checks must work without a SparkSession (the stores hold at
  most users × grants rows — metadata scale).
- ``PrivilegeChecker`` resolves hierarchically: a privilege on
  ``db.table`` falls back to ``db`` and then to ``""`` (the whole
  catalog) — PrivilegeCheckerImpl.check:118-128. ``root`` bypasses all
  checks (AllGrantedPrivilegeChecker).
- ``PrivilegedCatalog`` wraps any catalog (filesystem / Hive / JDBC /
  REST share the interface) and asserts before each metadata op
  (PrivilegedCatalog.java:59-127); tables it returns are wrapped so
  reads require SELECT, writes/maintenance INSERT, schema changes
  ALTER_TABLE (PrivilegedFileStoreTable.java).

Privilege targets (PrivilegeType.java): SELECT/INSERT/ALTER_TABLE/
DROP_TABLE grant on a table or higher; CREATE_TABLE/DROP_DATABASE/
ALTER_DATABASE on a database or higher; CREATE_DATABASE/ADMIN only on
the whole catalog.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

# privilege -> the LOWEST level it can be granted on (PrivilegeType.java)
_TABLE, _DATABASE, _CATALOG = "TABLE", "DATABASE", "CATALOG"
PRIVILEGE_TYPES: dict[str, str] = {
    "SELECT": _TABLE,
    "INSERT": _TABLE,
    "ALTER_TABLE": _TABLE,
    "DROP_TABLE": _TABLE,
    "CREATE_TABLE": _DATABASE,
    "DROP_DATABASE": _DATABASE,
    "ALTER_DATABASE": _DATABASE,
    "CREATE_DATABASE": _CATALOG,
    "ADMIN": _CATALOG,
}

USER_ROOT = "root"
USER_ANONYMOUS = "anonymous"
PASSWORD_ANONYMOUS = "anonymous"
IDENTIFIER_WHOLE_CATALOG = ""

USER_TABLE_DIR = "user.sys"
PRIVILEGE_TABLE_DIR = "privilege.sys"


def _can_grant_on(privilege: str, level: str) -> bool:
    """True if ``privilege`` may be granted at ``level`` — its own
    target level or any broader one (PrivilegeType.canGrantOn*)."""
    order = {_TABLE: 0, _DATABASE: 1, _CATALOG: 2}
    return order[level] >= order[PRIVILEGE_TYPES[privilege]]


def _sha256(password: str) -> bytes:
    return hashlib.sha256(password.encode("utf-8")).digest()


class NoPrivilegeException(RuntimeError):
    def __init__(self, user: str, object_type: str, identifier: str, privilege: str):
        super().__init__(
            f"User {user} doesn't have privilege {privilege} on "
            f"{object_type} {identifier or '<whole catalog>'}"
        )
        self.user = user
        self.privilege = privilege
        self.identifier = identifier


class PrivilegeChecker:
    """Per-user view of the grant table, hierarchical lookup."""

    def __init__(self, user: str, privileges: dict[str, set[str]]):
        self.user = user
        self._privileges = privileges

    def _check(self, identifier: str, privilege: str) -> bool:
        s = self._privileges.get(identifier)
        if s and privilege in s:
            return True
        if identifier == "":
            return False
        # db.table -> db -> "" (PrivilegeCheckerImpl.check)
        parent = identifier[: max(identifier.rfind("."), 0)]
        return self._check(parent, privilege)

    def _assert(self, identifier: str, object_type: str, privilege: str) -> None:
        if not self._check(identifier, privilege):
            raise NoPrivilegeException(self.user, object_type, identifier, privilege)

    def assert_can_select(self, identifier: str) -> None:
        self._assert(identifier, "table", "SELECT")

    def assert_can_insert(self, identifier: str) -> None:
        self._assert(identifier, "table", "INSERT")

    def assert_can_select_or_insert(self, identifier: str) -> None:
        if not (self._check(identifier, "SELECT") or self._check(identifier, "INSERT")):
            raise NoPrivilegeException(self.user, "table", identifier, "SELECT|INSERT")

    def assert_can_alter_table(self, identifier: str) -> None:
        self._assert(identifier, "table", "ALTER_TABLE")

    def assert_can_drop_table(self, identifier: str) -> None:
        self._assert(identifier, "table", "DROP_TABLE")

    def assert_can_create_table(self, database: str) -> None:
        self._assert(database, "database", "CREATE_TABLE")

    def assert_can_drop_database(self, database: str) -> None:
        self._assert(database, "database", "DROP_DATABASE")

    def assert_can_alter_database(self, database: str) -> None:
        self._assert(database, "database", "ALTER_DATABASE")

    def assert_can_create_database(self) -> None:
        self._assert(IDENTIFIER_WHOLE_CATALOG, "catalog", "CREATE_DATABASE")

    def assert_admin(self) -> None:
        self._assert(IDENTIFIER_WHOLE_CATALOG, "catalog", "ADMIN")

    # create/drop user, grant, revoke all require ADMIN
    assert_can_create_user = assert_admin
    assert_can_drop_user = assert_admin
    assert_can_revoke = assert_admin

    def assert_can_grant(self, identifier: str, privilege: str) -> None:
        self.assert_admin()


class _AllGrantedChecker(PrivilegeChecker):
    """root's checker (AllGrantedPrivilegeChecker)."""

    def __init__(self, user: str = USER_ROOT):
        super().__init__(user, {})

    def _check(self, identifier: str, privilege: str) -> bool:
        return True


class FileBasedPrivilegeManager:
    """Users + grants persisted in the warehouse; every mutation is an
    atomic whole-store swap (metadata scale: users × grants rows)."""

    def __init__(self, warehouse: str, user: str = USER_ANONYMOUS,
                 password: str = PASSWORD_ANONYMOUS):
        self.warehouse = warehouse
        self.user = user
        self._sha = _sha256(password)

    # --- storage (parquet, atomic replace) ---

    def _store_path(self, dirname: str) -> str:
        return os.path.join(self.warehouse, dirname, "store.parquet")

    def _read(self, dirname: str) -> list[dict]:
        import pyarrow.parquet as pq

        p = self._store_path(dirname)
        if not os.path.exists(p):
            return []
        return pq.read_table(p).to_pylist()

    def _write(self, dirname: str, rows: list[dict], schema) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = os.path.join(self.warehouse, dirname)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        os.close(fd)
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
        os.replace(tmp, self._store_path(dirname))

    def _user_schema(self):
        import pyarrow as pa

        return pa.schema([("user", pa.string()), ("sha256", pa.binary())])

    def _priv_schema(self):
        import pyarrow as pa

        return pa.schema(
            [
                ("name", pa.string()),
                ("entity_type", pa.string()),
                ("identifier", pa.string()),
                ("privilege", pa.string()),
            ]
        )

    # --- lifecycle ---

    def privilege_enabled(self) -> bool:
        return os.path.exists(self._store_path(USER_TABLE_DIR)) and os.path.exists(
            self._store_path(PRIVILEGE_TABLE_DIR)
        )

    def initialize_privilege(self, root_password: str) -> None:
        if self.privilege_enabled():
            raise RuntimeError(
                f"Privilege system is already enabled in warehouse {self.warehouse}"
            )
        self._write(
            USER_TABLE_DIR,
            [
                {"user": USER_ROOT, "sha256": _sha256(root_password)},
                {"user": USER_ANONYMOUS, "sha256": _sha256(PASSWORD_ANONYMOUS)},
            ],
            self._user_schema(),
        )
        self._write(PRIVILEGE_TABLE_DIR, [], self._priv_schema())

    # --- users ---

    def _users(self) -> dict[str, bytes]:
        return {r["user"]: r["sha256"] for r in self._read(USER_TABLE_DIR)}

    def user_exists(self, user: str) -> bool:
        return user in self._users()

    def create_user(self, user: str, password: str) -> None:
        self.get_privilege_checker().assert_can_create_user()
        users = self._users()
        if user in users:
            raise ValueError(f"User {user} already exists")
        users[user] = _sha256(password)
        self._write(
            USER_TABLE_DIR,
            [{"user": u, "sha256": s} for u, s in users.items()],
            self._user_schema(),
        )

    def drop_user(self, user: str) -> None:
        self.get_privilege_checker().assert_can_drop_user()
        if user in (USER_ROOT, USER_ANONYMOUS):
            raise ValueError(f"{user} cannot be dropped")
        users = self._users()
        users.pop(user, None)
        self._write(
            USER_TABLE_DIR,
            [{"user": u, "sha256": s} for u, s in users.items()],
            self._user_schema(),
        )
        # the dropped user's grants are pruned with them
        # (FileBasedPrivilegeManager.dropUserImpl deletes the privilege
        # rows too), so a re-created user with the same name starts clean
        rows = [r for r in self._read(PRIVILEGE_TABLE_DIR) if r["name"] != user]
        self._write(PRIVILEGE_TABLE_DIR, rows, self._priv_schema())

    # --- grants ---

    def grant(self, user: str, identifier: str, privilege: str) -> None:
        privilege = privilege.upper()
        if privilege not in PRIVILEGE_TYPES:
            raise ValueError(f"unknown privilege {privilege}")
        self.get_privilege_checker().assert_can_grant(identifier, privilege)
        if user == USER_ROOT:
            raise ValueError(f"Cannot change privilege for user {USER_ROOT}")
        if not self.user_exists(user):
            raise ValueError(f"User {user} does not exist")
        rows = self._read(PRIVILEGE_TABLE_DIR)
        entry = {
            "name": user,
            "entity_type": "USER",
            "identifier": identifier,
            "privilege": privilege,
        }
        if entry not in rows:
            rows.append(entry)
            self._write(PRIVILEGE_TABLE_DIR, rows, self._priv_schema())

    def revoke(self, user: str, identifier: str, privilege: str) -> int:
        privilege = privilege.upper()
        self.get_privilege_checker().assert_can_revoke()
        if user == USER_ROOT:
            raise ValueError(f"Cannot change privilege for user {USER_ROOT}")
        if not self.user_exists(user):
            raise ValueError(f"User {user} does not exist")
        rows = self._read(PRIVILEGE_TABLE_DIR)
        kept = [
            r
            for r in rows
            if not (
                r["name"] == user
                and r["identifier"] == identifier
                and r["privilege"] == privilege
            )
        ]
        count = len(rows) - len(kept)
        if count == 0:
            raise ValueError(
                f"User {user} does not have privilege {privilege} on "
                f"{identifier}. It's possible that the user has such "
                "privilege on a higher level. Please check the privilege table."
            )
        self._write(PRIVILEGE_TABLE_DIR, kept, self._priv_schema())
        return count

    def object_renamed(self, old: str, new: str) -> None:
        """Grants follow a renamed table/database
        (FileBasedPrivilegeManager.objectRenamed)."""
        rows = self._read(PRIVILEGE_TABLE_DIR)
        changed = False
        for r in rows:
            if r["identifier"] == old:
                r["identifier"] = new
                changed = True
        if changed:
            self._write(PRIVILEGE_TABLE_DIR, rows, self._priv_schema())

    def object_dropped(self, identifier: str) -> None:
        """Grants on a dropped object (and its children) are pruned."""
        rows = [
            r
            for r in self._read(PRIVILEGE_TABLE_DIR)
            if not (
                r["identifier"] == identifier
                or r["identifier"].startswith(identifier + ".")
            )
        ]
        self._write(PRIVILEGE_TABLE_DIR, rows, self._priv_schema())

    # --- checker ---

    def _assert_user_password(self) -> None:
        users = self._users()
        if self.user not in users or users[self.user] != self._sha:
            raise RuntimeError(f"Username and password do not match (user {self.user})")

    def get_privilege_checker(self) -> PrivilegeChecker:
        self._assert_user_password()
        if self.user == USER_ROOT:
            return _AllGrantedChecker()
        privs: dict[str, set[str]] = {}
        for r in self._read(PRIVILEGE_TABLE_DIR):
            if r["name"] == self.user and r["entity_type"] == "USER":
                privs.setdefault(r["identifier"], set()).add(r["privilege"])
        return PrivilegeChecker(self.user, privs)

    def show_grants(self, user: str) -> list[tuple[str, str]]:
        return sorted(
            (r["identifier"], r["privilege"])
            for r in self._read(PRIVILEGE_TABLE_DIR)
            if r["name"] == user
        )


# method name -> required privilege, for table-level wrapping
# (PrivilegedFileStoreTable.java: newRead->SELECT, write/commit/tags/
# branches/rollback/maintenance->INSERT, schema evolution->ALTER_TABLE)
_TABLE_READ = {
    "to_df", "to_arrow", "to_pandas", "read_builder", "count_rows", "min_max", "max_pt",
    "system_table", "read_optimized", "statistics", "row_tracking_df",
    "delta_entries", "incremental_read", "incremental_read_between_timestamps",
    "incremental_read_to_tag", "audit_log", "doctor", "done_partitions",
    "export_iceberg", "branches", "use_branch",
}
_TABLE_WRITE = {
    "write", "write_arrow", "upsert", "delete", "update", "merge_into", "compact",
    "rewrite_file_index", "rescale", "sort_compact", "analyze",
    "create_tag", "delete_tag", "create_tag_from_timestamp", "rename_tag",
    "replace_tag", "expire_tags", "rollback_to", "rollback_to_watermark",
    "compact_manifest", "purge_files", "remove_unexisting_files",
    "expire_snapshots", "expire_changelogs", "expire_partitions",
    "mark_partition_done", "remove_orphan_files",
    "create_branch", "delete_branch", "fast_forward",
}
_TABLE_ALTER = {"evolve_schema"}


class PrivilegedTable:
    """Table proxy: every data/maintenance entry point asserts first."""

    def __init__(self, table, identifier: str, manager: FileBasedPrivilegeManager):
        self._table = table
        self._identifier = identifier
        self._manager = manager

    def __getattr__(self, name: str):
        attr = getattr(self._table, name)
        checker = None
        if name in _TABLE_READ:
            checker = lambda: self._manager.get_privilege_checker().assert_can_select(  # noqa: E731
                self._identifier
            )
        elif name in _TABLE_WRITE:
            checker = lambda: self._manager.get_privilege_checker().assert_can_insert(  # noqa: E731
                self._identifier
            )
        elif name in _TABLE_ALTER:
            checker = lambda: self._manager.get_privilege_checker().assert_can_alter_table(  # noqa: E731
                self._identifier
            )
        if checker is None or not callable(attr):
            return attr

        def guarded(*args, **kwargs):
            checker()
            return attr(*args, **kwargs)

        return guarded


class PrivilegedCatalog:
    """Catalog proxy asserting privileges before metadata operations
    (PrivilegedCatalog.java). Wraps any catalog flavor."""

    def __init__(self, wrapped, user: str = USER_ANONYMOUS,
                 password: str = PASSWORD_ANONYMOUS):
        self.wrapped = wrapped
        self.privilege_manager = FileBasedPrivilegeManager(
            wrapped.warehouse, user, password
        )
        if not self.privilege_manager.privilege_enabled():
            raise RuntimeError(
                f"Privilege system is not enabled in warehouse {wrapped.warehouse} "
                "— run init_file_based_privilege first"
            )

    def _checker(self) -> PrivilegeChecker:
        return self.privilege_manager.get_privilege_checker()

    def __getattr__(self, name: str):
        return getattr(self.wrapped, name)

    # --- checked metadata ops ---

    def create_database(self, database: str, *args, **kwargs):
        self._checker().assert_can_create_database()
        return self.wrapped.create_database(database, *args, **kwargs)

    def drop_database(self, database: str, *args, **kwargs):
        self._checker().assert_can_drop_database(database)
        r = self.wrapped.drop_database(database, *args, **kwargs)
        self.privilege_manager.object_dropped(database)
        return r

    def alter_database(self, database: str, *args, **kwargs):
        self._checker().assert_can_alter_database(database)
        return self.wrapped.alter_database(database, *args, **kwargs)

    def create_table(self, identifier: str, *args, **kwargs):
        db = self.wrapped._split(identifier)[0]
        self._checker().assert_can_create_table(db)
        t = self.wrapped.create_table(identifier, *args, **kwargs)
        db, name = self.wrapped._split(identifier)
        return PrivilegedTable(t, f"{db}.{name}", self.privilege_manager)

    def drop_table(self, identifier: str, *args, **kwargs):
        db, name = self.wrapped._split(identifier)
        self._checker().assert_can_drop_table(f"{db}.{name}")
        r = self.wrapped.drop_table(identifier, *args, **kwargs)
        self.privilege_manager.object_dropped(f"{db}.{name}")
        return r

    def rename_table(self, src: str, dst: str):
        sdb, sname = self.wrapped._split(src)
        self._checker().assert_can_alter_table(f"{sdb}.{sname}")
        r = self.wrapped.rename_table(src, dst)
        ddb, dname = self.wrapped._split(dst)
        self.privilege_manager.object_renamed(f"{sdb}.{sname}", f"{ddb}.{dname}")
        return r

    def get_table(self, identifier: str):
        t = self.wrapped.get_table(identifier)
        base = identifier.partition("@")[0].partition("$")[0]
        db, name = self.wrapped._split(base)
        return PrivilegedTable(t, f"{db}.{name}", self.privilege_manager)

    def read_system(self, spark, identifier: str):
        if not identifier.startswith("sys."):
            base = identifier.partition("$")[0]
            db, name = self.wrapped._split(base)
            self._checker().assert_can_select(f"{db}.{name}")
        return self.wrapped.read_system(spark, identifier)

    # --- user/grant management (PrivilegedCatalog.java:129-175) ---

    def create_privileged_user(self, user: str, password: str) -> None:
        self.privilege_manager.create_user(user, password)

    def drop_privileged_user(self, user: str) -> None:
        self.privilege_manager.drop_user(user)

    def _grant_or_revoke(self, fn, user, privilege, database=None, table=None):
        privilege = privilege.upper()
        if table is not None:
            if not _can_grant_on(privilege, _TABLE):
                raise ValueError(f"Privilege {privilege} can't be granted on a table")
            ident = f"{database}.{table}"
        elif database is not None:
            if not _can_grant_on(privilege, _DATABASE):
                raise ValueError(f"Privilege {privilege} can't be granted on a database")
            ident = database
        else:
            ident = IDENTIFIER_WHOLE_CATALOG
        return fn(user, ident, privilege)

    def grant_privilege(self, user, privilege, database=None, table=None):
        return self._grant_or_revoke(
            self.privilege_manager.grant, user, privilege, database, table
        )

    def revoke_privilege(self, user, privilege, database=None, table=None):
        return self._grant_or_revoke(
            self.privilege_manager.revoke, user, privilege, database, table
        )


def init_file_based_privilege(catalog, root_password: str) -> None:
    """Enable the privilege system on a warehouse
    (InitFileBasedPrivilegeProcedure)."""
    FileBasedPrivilegeManager(catalog.warehouse).initialize_privilege(root_password)
