"""Loopback REST catalog server fronting a filesystem warehouse.

Route shapes and request/response field names mirror the reference
REST catalog protocol (pypaimon api/resource_paths.py:25-72,
api/rest_api.py:43-353, api/api_response.py:96-270; the Java side is
paimon-core rest/RESTCatalog.java + RESTCatalogFactory.java):

- ``GET  /v1/config?warehouse=W``                       → ConfigResponse
- ``GET  /v1/<p>/databases``            (paged)         → ListDatabasesResponse
- ``POST /v1/<p>/databases``                            → create database
- ``GET|POST|DELETE /v1/<p>/databases/{db}``            → get/alter/drop
- ``GET  /v1/<p>/databases/{db}/tables`` (paged)        → ListTablesResponse
- ``POST /v1/<p>/databases/{db}/tables``                → create table
- ``GET|POST|DELETE .../tables/{t}``                    → get/alter/drop
- ``POST /v1/<p>/tables/rename``                        → rename table
- ``GET  .../tables/{t}/token``                         → data-access token
- ``GET  .../tables/{t}/snapshot``                      → latest snapshot
- ``POST .../tables/{t}/commit``                        → snapshot commit
  (the server is the atomic CAS arbiter; body carries tableUuid +
  snapshot JSON + statistics, response is {"success": bool} — the
  CommitTableRequest/Response contract of rest_api.py:315-352)
- view endpoints under ``.../databases/{db}/views[/{v}]``

Version-management routes (the Java RESTCatalog surface the protocol
exposes beyond pypaimon's operation set — paimon-core
rest/RESTCatalog.java:327 ``listSnapshotsPaged``, :378 ``rollbackTo``,
:565 ``registerTable``, :595 ``listPartitions``, plus tag/branch
management further down the same file):

- ``GET  .../tables/{t}/snapshots``      (paged)        → snapshot history
- ``POST .../tables/{t}/rollback``                      → {"snapshotId": N} or {"tagName": ...}
- ``GET  .../tables/{t}/partitions``     (paged)        → partition specs + stats
- ``GET|POST .../tables/{t}/tags``                      → list / create tag
- ``DELETE   .../tables/{t}/tags/{tag}``                → delete tag
- ``GET|POST .../tables/{t}/branches``                  → list / create branch
- ``DELETE   .../tables/{t}/branches/{b}``              → delete branch
- ``POST /v1/<p>/tables/register``                      → register an existing
  table directory (symlinked into the warehouse when external)

Pagination: ``maxResults`` + opaque ``pageToken`` (the last name of
the previous page) + SQL-style ``databaseNamePattern`` /
``tableNamePattern`` (``%`` / ``_`` wildcards). Auth: optional bearer
token — when the server is constructed with one, every route requires
``Authorization: Bearer <token>`` and answers 401 otherwise. Errors
are ErrorResponse JSON: {"resourceType", "resourceName", "message",
"code"} with the reference's status mapping (404 no-such, 409
already-exists, 400 bad request).

The data plane stays on the shared filesystem exactly as in the
reference (clients read/write data and manifest files directly against
the warehouse path returned by the table endpoint, authorized by the
token endpoint); only metadata and the commit CAS go through HTTP.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from flink_table_store_spark.catalog import Catalog
from flink_table_store_spark.fileio import read_json, write_json
from flink_table_store_spark.schema import TableSchema
from flink_table_store_spark.snapshot import Snapshot, SnapshotManager

DEFAULT_PAGE_SIZE = 100


class _HttpError(Exception):
    def __init__(self, code: int, message: str, resource_type: str = "", resource_name: str = ""):
        super().__init__(message)
        self.code = code
        self.body = {
            "resourceType": resource_type,
            "resourceName": resource_name,
            "message": message,
            "code": code,
        }


def _sql_pattern(pattern: str) -> re.Pattern:
    """SQL LIKE pattern (% / _) → anchored regex — the same translation
    SHOW ... LIKE uses (sql.sql_like_pattern), so the SQL frontend and
    the REST listing endpoints cannot drift."""
    from flink_table_store_spark.sql import sql_like_pattern

    return sql_like_pattern(pattern)


def _page(names: list[str], q: dict, pattern_key: str) -> dict:
    """Apply name-pattern filter + pageToken/maxResults windowing."""
    names = sorted(names)
    pat = q.get(pattern_key)
    if pat:
        rx = _sql_pattern(pat)
        names = [n for n in names if rx.match(n)]
    token = q.get("pageToken")
    if token:
        names = [n for n in names if n > token]
    max_results = int(q.get("maxResults", 0) or 0)
    page_size = max_results if max_results > 0 else DEFAULT_PAGE_SIZE
    page, rest = names[:page_size], names[page_size:]
    return {"data": page, "nextPageToken": page[-1] if page and rest else None}


class _CatalogService:
    """The request-independent catalog logic (shared by all handler
    threads; filesystem state is the source of truth)."""

    def __init__(self, warehouse: str, token: str | None = None, prefix: str = ""):
        self.catalog = Catalog(warehouse)
        self.token = token
        self.prefix = prefix
        self._lock = threading.Lock()

    # --- helpers ---

    def _db_meta_path(self, db: str) -> str:
        return os.path.join(self.catalog._db_path(db), ".database.json")

    def _require_db(self, db: str) -> None:
        if not os.path.isdir(self.catalog._db_path(db)):
            raise _HttpError(404, f"database {db} does not exist", "DATABASE", db)

    def _table_path(self, db: str, tbl: str) -> str:
        path = self.catalog.table_path(f"{db}.{tbl}")
        if not os.path.isdir(os.path.join(path, "schema")):
            raise _HttpError(404, f"table {db}.{tbl} does not exist", "TABLE", f"{db}.{tbl}")
        return path

    def _table_uuid(self, path: str) -> str:
        """Stable per-table uuid (the reference carries it in the table
        response so commits can detect drop+recreate races)."""
        p = os.path.join(path, "table-uuid")
        if not os.path.exists(p):
            with self._lock:
                return self._table_uuid_locked(path)
        return read_json(p)["uuid"]

    def _table_uuid_locked(self, path: str) -> str:
        """The uuid read/create under an already-held ``self._lock``
        (threading.Lock is not reentrant)."""
        p = os.path.join(path, "table-uuid")
        if not os.path.exists(p):
            write_json(p, {"uuid": uuid.uuid4().hex})
        return read_json(p)["uuid"]

    # --- config ---

    def config(self, q: dict) -> dict:
        # The served warehouse is authoritative: echoing a client-supplied
        # path back would silently split-brain the client's inherited
        # filesystem surfaces against the server's real state.
        requested = q.get("warehouse", "")
        if requested and os.path.abspath(requested) != os.path.abspath(self.catalog.warehouse):
            raise _HttpError(
                400,
                f"this service serves warehouse {self.catalog.warehouse}, not {requested}",
                "WAREHOUSE",
                requested,
            )
        return {
            "defaults": {
                "warehouse": self.catalog.warehouse,
                "prefix": self.prefix,
            }
        }

    # --- databases ---

    def list_databases(self, q: dict) -> dict:
        page = _page(self.catalog.list_databases(), q, "databaseNamePattern")
        return {"databases": page["data"], "nextPageToken": page["nextPageToken"]}

    def create_database(self, body: dict) -> dict:
        name = (body.get("name") or "").strip()
        if not name:
            raise _HttpError(400, "database name cannot be empty")
        # check-then-act must be serialized: the service is the arbiter,
        # so two concurrent creates of the same name get exactly one 200
        with self._lock:
            if os.path.isdir(self.catalog._db_path(name)):
                raise _HttpError(409, f"database {name} already exists", "DATABASE", name)
            self.catalog.create_database(name)
            props = body.get("properties") or body.get("options") or {}
            if props:
                write_json(self._db_meta_path(name), {"options": props})
        return {}

    def get_database(self, db: str) -> dict:
        self._require_db(db)
        opts = {}
        if os.path.exists(self._db_meta_path(db)):
            opts = read_json(self._db_meta_path(db)).get("options", {})
        return {
            "id": db,
            "name": db,
            "location": self.catalog._db_path(db),
            "options": opts,
        }

    def alter_database(self, db: str, body: dict) -> dict:
        self._require_db(db)
        opts = {}
        if os.path.exists(self._db_meta_path(db)):
            opts = read_json(self._db_meta_path(db)).get("options", {})
        for k in body.get("removals") or []:
            opts.pop(k, None)
        opts.update(body.get("updates") or {})
        write_json(self._db_meta_path(db), {"options": opts})
        return {}

    def drop_database(self, db: str, q: dict | None = None) -> dict:
        """Non-cascade drops refuse non-empty databases SERVER-side, so
        the emptiness check and the drop are one arbiter operation (a
        client-side check-then-act would destroy a table created between
        its check and its DELETE)."""
        cascade = (q or {}).get("cascade", "false").lower() == "true"
        with self._lock:
            self._require_db(db)
            if not cascade and (self.catalog.list_tables(db) or self.catalog.list_views(db)):
                raise _HttpError(
                    409, f"database {db} is not empty (pass cascade=true)", "DATABASE", db
                )
            self.catalog.drop_database(db, ignore_if_not_exists=False, cascade=True)
        return {}

    # --- tables ---

    def list_tables(self, db: str, q: dict) -> dict:
        self._require_db(db)
        names = [
            t
            for t in self.catalog.list_tables(db)
            if os.path.isdir(os.path.join(self.catalog._db_path(db), t, "schema"))
        ]
        page = _page(names, q, "tableNamePattern")
        return {"tables": page["data"], "nextPageToken": page["nextPageToken"]}

    def table_details(self, db: str, q: dict) -> dict:
        """Paged FULL table metadata for a database (ResourcePaths
        TABLE_DETAILS — one call instead of list+N gets)."""
        page = self.list_tables(db, q)
        return {
            "tableDetails": [self.get_table(db, t) for t in page["tables"]],
            "nextPageToken": page["nextPageToken"],
        }

    def create_table(self, db: str, body: dict) -> dict:
        self._require_db(db)
        ident = body.get("identifier") or {}
        name = (ident.get("object") or ident.get("table") or "").strip()
        if not name:
            raise _HttpError(400, "table name cannot be empty")
        sd = body.get("schema")
        if not sd:
            raise _HttpError(400, "schema cannot be empty")
        full = f"{db}.{name}"
        path = self.catalog.table_path(full)
        with self._lock:
            if os.path.isdir(os.path.join(path, "schema")):
                raise _HttpError(409, f"table {full} already exists", "TABLE", full)
            sd = dict(sd)
            sd["id"] = 0
            self.catalog.create_table(full, TableSchema.from_dict(sd))
            self._table_uuid_locked(path)
        return {}

    def get_table(self, db: str, tbl: str) -> dict:
        path = self._table_path(db, tbl)
        from flink_table_store_spark.schema import SchemaManager

        sm = SchemaManager(path)
        sid = sm.latest_id()
        return {
            "id": self._table_uuid(path),
            "name": f"{db}.{tbl}",
            "path": path,
            "isExternal": False,
            "schemaId": sid,
            "schema": sm.latest().to_dict(),
        }

    def alter_table(self, db: str, tbl: str, body: dict) -> dict:
        path = self._table_path(db, tbl)
        changes = body.get("changes")
        if not changes:
            raise _HttpError(400, "changes cannot be empty")
        from flink_table_store_spark.schema import SchemaManager

        with self._lock:
            SchemaManager(path).evolve(changes)
        return {}

    def drop_table(self, db: str, tbl: str) -> dict:
        with self._lock:
            self._table_path(db, tbl)
            self.catalog.drop_table(f"{db}.{tbl}", ignore_if_not_exists=False)
        return {}

    def rename_table(self, body: dict) -> dict:
        src, dst = body.get("source") or {}, body.get("destination") or {}
        s = f"{src.get('database')}.{src.get('object') or src.get('table')}"
        d = f"{dst.get('database')}.{dst.get('object') or dst.get('table')}"
        with self._lock:
            self._table_path(*s.split(".", 1))
            self._require_db(d.split(".", 1)[0])  # no phantom destination dbs
            dpath = self.catalog.table_path(d)
            if os.path.isdir(dpath):
                raise _HttpError(409, f"table {d} already exists", "TABLE", d)
            self.catalog.rename_table(s, d)
        return {}

    def register_table(self, body: dict) -> dict:
        """RESTCatalog.java:565 ``registerTable``: adopt an EXISTING table
        directory under a catalog identifier without rewriting data. A
        path already at the identifier's canonical location registers
        as-is; an external path is symlinked into the warehouse (metadata
        and data stay where they are — O(1), no copy)."""
        ident = body.get("identifier") or {}
        db = (ident.get("database") or "").strip()
        name = (ident.get("object") or ident.get("table") or "").strip()
        src = (body.get("path") or "").strip()
        if not db or not name or not src:
            raise _HttpError(400, "identifier and path cannot be empty")
        if not os.path.isdir(os.path.join(src, "schema")):
            raise _HttpError(404, f"no table at {src}", "TABLE", src)
        full = f"{db}.{name}"
        with self._lock:
            self._require_db(db)
            canonical = self.catalog.table_path(full)
            if os.path.isdir(canonical) or os.path.islink(canonical):
                if os.path.realpath(canonical) == os.path.realpath(src):
                    return {"path": canonical}  # idempotent re-register
                raise _HttpError(409, f"table {full} already exists", "TABLE", full)
            os.symlink(os.path.abspath(src), canonical)
            self._table_uuid_locked(canonical)
        return {"path": canonical}

    def table_token(self, db: str, tbl: str) -> dict:
        """Data-access token (GetTableTokenResponse shape). The sandbox
        data plane is a local filesystem, so the token is advisory —
        the shape (short-lived credential map + expiry) matches the
        reference's object-store credential vending."""
        path = self._table_path(db, tbl)
        return {
            "token": {"access-path": path, "grant": uuid.uuid4().hex},
            "expiresAtMillis": int(time.time() * 1000) + 3_600_000,
        }

    def latest_snapshot(self, db: str, tbl: str) -> dict:
        path = self._table_path(db, tbl)
        snap = SnapshotManager(path).latest()
        if snap is None:
            raise _HttpError(404, f"table {db}.{tbl} has no snapshot", "SNAPSHOT", f"{db}.{tbl}")
        return {"snapshot": snap.to_dict()}

    def commit_snapshot(self, db: str, tbl: str, body: dict) -> dict:
        """The CAS arbiter: create snapshot-<id> exactly-once on behalf
        of the committing client (CommitTableRequest semantics —
        tableUuid guards against drop+recreate between the client's
        plan and its commit)."""
        path = self._table_path(db, tbl)
        want_uuid = body.get("tableUuid")
        if want_uuid and want_uuid != self._table_uuid(path):
            raise _HttpError(
                404, f"table {db}.{tbl} uuid mismatch (recreated?)", "TABLE", f"{db}.{tbl}"
            )
        sd = body.get("snapshot")
        if not sd:
            raise _HttpError(400, "snapshot cannot be empty")
        ok = SnapshotManager(path).try_commit(Snapshot.from_dict(sd))
        return {"success": bool(ok)}

    # --- version management (RESTCatalog.java:327 listSnapshotsPaged,
    #     :378 rollbackTo, :595 listPartitions, tag/branch routes) ---

    def _table(self, db: str, tbl: str):
        from flink_table_store_spark.table import Table

        return Table(self._table_path(db, tbl), name=f"{db}.{tbl}")

    def list_snapshots(self, db: str, tbl: str, q: dict) -> dict:
        """Paged snapshot history, oldest→newest; pageToken = last
        snapshot id of the previous page."""
        sm = SnapshotManager(self._table_path(db, tbl))
        ids = sm.snapshot_ids()
        token = q.get("pageToken")
        if token:
            ids = [i for i in ids if i > int(token)]
        max_results = int(q.get("maxResults", 0) or 0)
        page_size = max_results if max_results > 0 else DEFAULT_PAGE_SIZE
        page, rest = ids[:page_size], ids[page_size:]
        return {
            "snapshots": [sm.load(i).to_dict() for i in page],
            "nextPageToken": str(page[-1]) if page and rest else None,
        }

    def rollback_table(self, db: str, tbl: str, body: dict) -> dict:
        """Roll back to a snapshot id or a tag name. Serialized under the
        service lock — the arbiter must not interleave two rollbacks (or
        a rollback with a rename) over the same history."""
        with self._lock:
            t = self._table(db, tbl)
            sid = body.get("snapshotId")
            tag = body.get("tagName")
            if sid is None and tag:
                tags = t.snapshots.tags()
                if tag not in tags:
                    raise _HttpError(404, f"no tag {tag}", "TAG", tag)
                sid = tags[tag].id
            if sid is None:
                raise _HttpError(400, "rollback needs snapshotId or tagName")
            if not t.snapshots.exists(int(sid)):
                raise _HttpError(404, f"no snapshot {sid}", "SNAPSHOT", str(sid))
            t.rollback_to(int(sid))
        return {}

    def list_partitions(self, db: str, tbl: str, q: dict) -> dict:
        """Paged partition specs + stats from the live manifest entries
        (PartitionsTable projection: spec, recordCount, fileCount,
        fileSizeInBytes, lastUpdateTimeMillis)."""
        t = self._table(db, tbl)
        snap = t.snapshots.latest()
        stats: dict[str, dict] = {}
        if snap is not None:
            for e in t.manifests.read_live_entries(
                snap.base_manifest_list, snap.delta_manifest_list
            ):
                key = json.dumps(e.partition, sort_keys=True)
                s = stats.setdefault(
                    key,
                    {
                        "spec": e.partition,
                        "recordCount": 0,
                        "fileCount": 0,
                        "fileSizeInBytes": 0,
                        "lastUpdateTimeMillis": 0,
                    },
                )
                s["recordCount"] += e.row_count
                s["fileCount"] += 1
                s["fileSizeInBytes"] += e.file_size
                s["lastUpdateTimeMillis"] = max(s["lastUpdateTimeMillis"], e.creation_time)
        page = _page(list(stats), q, "partitionNamePattern")
        return {
            "partitions": [stats[k] for k in page["data"]],
            "nextPageToken": page["nextPageToken"],
        }

    def list_tags(self, db: str, tbl: str, q: dict) -> dict:
        sm = SnapshotManager(self._table_path(db, tbl))
        tags = sm.tags()
        page = _page(list(tags), q, "tagNamePattern")
        return {
            "tags": [{"name": n, "snapshotId": tags[n].id} for n in page["data"]],
            "nextPageToken": page["nextPageToken"],
        }

    def create_tag(self, db: str, tbl: str, body: dict) -> dict:
        name = (body.get("tagName") or body.get("name") or "").strip()
        if not name:
            raise _HttpError(400, "tag name cannot be empty")
        with self._lock:
            sm = SnapshotManager(self._table_path(db, tbl))
            if name in sm.tags():
                raise _HttpError(409, f"tag {name} already exists", "TAG", name)
            try:
                sm.create_tag(name, body.get("snapshotId"))
            except Exception as e:
                raise _HttpError(400, str(e), "TAG", name) from None
        return {}

    def delete_tag(self, db: str, tbl: str, tag: str) -> dict:
        with self._lock:
            sm = SnapshotManager(self._table_path(db, tbl))
            if tag not in sm.tags():
                raise _HttpError(404, f"no tag {tag}", "TAG", tag)
            sm.delete_tag(tag)
        return {}

    def list_branches(self, db: str, tbl: str, q: dict) -> dict:
        t = self._table(db, tbl)
        branches = t.branches()
        page = _page(list(branches), q, "branchNamePattern")
        return {
            "branches": [
                {"name": n, "fromSnapshot": branches[n].get("fromSnapshot")}
                for n in page["data"]
            ],
            "nextPageToken": page["nextPageToken"],
        }

    def create_branch(self, db: str, tbl: str, body: dict) -> dict:
        name = (body.get("branchName") or body.get("name") or "").strip()
        if not name:
            raise _HttpError(400, "branch name cannot be empty")
        with self._lock:
            t = self._table(db, tbl)
            if name in t.branches():
                raise _HttpError(409, f"branch {name} already exists", "BRANCH", name)
            try:
                t.create_branch(name, body.get("snapshotId"))
            except Exception as e:
                raise _HttpError(400, str(e), "BRANCH", name) from None
        return {}

    def delete_branch(self, db: str, tbl: str, branch: str) -> dict:
        with self._lock:
            t = self._table(db, tbl)
            if branch not in t.branches():
                raise _HttpError(404, f"no branch {branch}", "BRANCH", branch)
            t.delete_branch(branch)
        return {}

    # --- views ---

    def list_views(self, db: str, q: dict) -> dict:
        self._require_db(db)
        page = _page(self.catalog.list_views(db), q, "viewNamePattern")
        return {"views": page["data"], "nextPageToken": page["nextPageToken"]}

    def create_view(self, db: str, body: dict) -> dict:
        self._require_db(db)
        name = ((body.get("identifier") or {}).get("object") or "").strip()
        if not name:
            raise _HttpError(400, "view name cannot be empty")
        full = f"{db}.{name}"
        dialects = body.get("dialects") or {}
        if not dialects:
            raise _HttpError(400, "view dialects cannot be empty")
        with self._lock:
            if self.catalog.is_view(full):
                raise _HttpError(409, f"view {full} already exists", "VIEW", full)
            for dialect, sql in dialects.items():
                self.catalog.create_view(
                    full,
                    sql,
                    dialect=dialect,
                    comment=body.get("comment", ""),
                    ignore_if_exists=True,
                )
        return {}

    def get_view(self, db: str, view: str) -> dict:
        full = f"{db}.{view}"
        if not self.catalog.is_view(full):
            raise _HttpError(404, f"view {full} does not exist", "VIEW", full)
        return self.catalog.get_view(full)

    def drop_view(self, db: str, view: str) -> dict:
        full = f"{db}.{view}"
        with self._lock:
            if not self.catalog.is_view(full):
                raise _HttpError(404, f"view {full} does not exist", "VIEW", full)
            self.catalog.drop_view(full)
        return {}

    # --- routing ---

    def route(self, method: str, path: str, q: dict, body: dict) -> dict:
        parts = [unquote(p) for p in path.strip("/").split("/") if p]
        if not parts or parts[0] != "v1":
            raise _HttpError(404, f"unknown route {path}")
        parts = parts[1:]
        if parts == ["config"] and method == "GET":
            return self.config(q)
        if self.prefix:
            if not parts or parts[0] != self.prefix:
                raise _HttpError(404, f"unknown route {path} (expected prefix {self.prefix})")
            parts = parts[1:]

        if parts == ["databases"]:
            if method == "GET":
                return self.list_databases(q)
            if method == "POST":
                return self.create_database(body)
        if parts == ["tables", "rename"] and method == "POST":
            return self.rename_table(body)
        if parts == ["tables", "register"] and method == "POST":
            return self.register_table(body)
        if len(parts) == 2 and parts[0] == "databases":
            db = parts[1]
            if method == "GET":
                return self.get_database(db)
            if method == "POST":
                return self.alter_database(db, body)
            if method == "DELETE":
                return self.drop_database(db, q)
        if len(parts) == 3 and parts[0] == "databases":
            db, kind = parts[1], parts[2]
            if kind == "tables":
                if method == "GET":
                    return self.list_tables(db, q)
                if method == "POST":
                    return self.create_table(db, body)
            if kind == "table-details" and method == "GET":
                return self.table_details(db, q)
            if kind == "views":
                if method == "GET":
                    return self.list_views(db, q)
                if method == "POST":
                    return self.create_view(db, body)
        if len(parts) == 4 and parts[0] == "databases" and parts[2] == "tables":
            db, tbl = parts[1], parts[3]
            if method == "GET":
                return self.get_table(db, tbl)
            if method == "POST":
                return self.alter_table(db, tbl, body)
            if method == "DELETE":
                return self.drop_table(db, tbl)
        if len(parts) == 4 and parts[0] == "databases" and parts[2] == "views":
            db, view = parts[1], parts[3]
            if method == "GET":
                return self.get_view(db, view)
            if method == "DELETE":
                return self.drop_view(db, view)
        if len(parts) == 5 and parts[0] == "databases" and parts[2] == "tables":
            db, tbl, action = parts[1], parts[3], parts[4]
            if action == "token" and method == "GET":
                return self.table_token(db, tbl)
            if action == "snapshot" and method == "GET":
                return self.latest_snapshot(db, tbl)
            if action == "commit" and method == "POST":
                return self.commit_snapshot(db, tbl, body)
            if action == "snapshots" and method == "GET":
                return self.list_snapshots(db, tbl, q)
            if action == "rollback" and method == "POST":
                return self.rollback_table(db, tbl, body)
            if action == "partitions" and method == "GET":
                return self.list_partitions(db, tbl, q)
            if action == "tags":
                if method == "GET":
                    return self.list_tags(db, tbl, q)
                if method == "POST":
                    return self.create_tag(db, tbl, body)
            if action == "branches":
                if method == "GET":
                    return self.list_branches(db, tbl, q)
                if method == "POST":
                    return self.create_branch(db, tbl, body)
        if len(parts) == 6 and parts[0] == "databases" and parts[2] == "tables":
            db, tbl, action, name = parts[1], parts[3], parts[4], parts[5]
            if action == "tags" and method == "DELETE":
                return self.delete_tag(db, tbl, name)
            if action == "branches" and method == "DELETE":
                return self.delete_branch(db, tbl, name)
        raise _HttpError(404, f"unknown route {method} {path}")


def _make_handler(service: _CatalogService):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args):  # quiet
            pass

        def _respond(self, code: int, obj: dict) -> None:
            data = json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _handle(self, method: str) -> None:
            try:
                # drain the body FIRST — replying (e.g. 401) with unread
                # bytes on a keep-alive connection desynchronizes the
                # stream (the leftovers parse as the next request line)
                raw = b""
                length = int(self.headers.get("Content-Length", 0) or 0)
                if length:
                    raw = self.rfile.read(length)
                if service.token is not None:
                    auth = self.headers.get("Authorization", "")
                    if auth != f"Bearer {service.token}":
                        raise _HttpError(401, "not authorized")
                parsed = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(parsed.query).items()}
                body = {}
                if raw:
                    try:
                        body = json.loads(raw.decode("utf-8"))
                    except (ValueError, UnicodeDecodeError) as e:
                        raise _HttpError(400, f"malformed request body: {e}") from None
                self._respond(200, service.route(method, parsed.path, q, body))
            except _HttpError as e:
                self._respond(e.code, e.body)
            except Exception as e:  # noqa: BLE001 — server must answer
                self._respond(
                    500, {"resourceType": "", "resourceName": "", "message": str(e), "code": 500}
                )

        def do_GET(self):
            self._handle("GET")

        def do_POST(self):
            self._handle("POST")

        def do_DELETE(self):
            self._handle("DELETE")

    return Handler


class RESTCatalogServer:
    """Threaded loopback catalog service. ``port=0`` auto-assigns."""

    def __init__(
        self,
        warehouse: str,
        host: str = "127.0.0.1",
        port: int = 0,
        token: str | None = None,
        prefix: str = "",
    ):
        self.service = _CatalogService(warehouse, token=token, prefix=prefix)
        self.httpd = ThreadingHTTPServer((host, port), _make_handler(self.service))
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    @property
    def uri(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "RESTCatalogServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self) -> "RESTCatalogServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def main() -> None:
    """Subprocess entry: ``python -m flink_table_store_spark.rest.server
    --warehouse W [--port N] [--token T] [--prefix P]``. Prints one
    line ``READY <uri>`` once serving (the two-process test handshake)."""
    import argparse
    import sys

    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--token", default=None)
    ap.add_argument("--prefix", default="")
    args = ap.parse_args()
    server = RESTCatalogServer(
        args.warehouse, port=args.port, token=args.token, prefix=args.prefix
    )
    print(f"READY {server.uri}", flush=True)
    try:
        server.httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.httpd.server_close()
        sys.exit(0)


if __name__ == "__main__":
    main()
