"""REST catalog client: ``RESTApi`` (HTTP) + ``RESTCatalog`` (Catalog
duck-type).

Mirrors pypaimon api/rest_api.py:43-353 (operation set, paged-list
loop, bearer auth) and catalog/rest/rest_catalog.py (catalog facade on
the API). ``RESTCatalog`` subclasses the filesystem ``Catalog`` and
overrides every metadata operation with an HTTP call, so the inherited
surfaces (global system tables, catalog functions, format/object
tables) automatically route their metadata hops through the service.

Data plane: the table endpoint returns the warehouse path; scans and
file writes stay direct against shared storage (the reference model —
the REST service vends credentials, it does not proxy data). Snapshot
commits DO go through the service: tables loaded from a ``RESTCatalog``
carry a snapshot manager whose ``try_commit`` POSTs the snapshot to the
server's commit endpoint, making the service the single CAS arbiter
(rest_api.py:315-352 commit_snapshot semantics).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
from typing import Any

from pyspark.sql import types as T

from flink_table_store_spark.catalog import Catalog
from flink_table_store_spark.schema import TableSchema, from_spark_schema
from flink_table_store_spark.snapshot import Snapshot, SnapshotManager
from flink_table_store_spark.table import Table


class RESTError(RuntimeError):
    def __init__(self, code: int, message: str):
        super().__init__(f"HTTP {code}: {message}")
        self.code = code
        self.message = message


class RESTApi:
    """Thin HTTP client for the catalog REST protocol."""

    def __init__(self, uri: str, token: str | None = None, warehouse: str = ""):
        self.uri = uri.rstrip("/")
        self.token = token
        # /v1/config bootstraps defaults (warehouse path, route prefix)
        cfg = self._request(
            "GET", "/v1/config", query={"warehouse": warehouse} if warehouse else {}
        )
        self.defaults: dict[str, str] = cfg.get("defaults", {})
        self.warehouse = self.defaults.get("warehouse", warehouse)
        prefix = self.defaults.get("prefix", "")
        self.base = f"/v1/{prefix}" if prefix else "/v1"

    # --- transport ---

    def _request(
        self,
        method: str,
        path: str,
        query: dict[str, str] | None = None,
        body: dict | None = None,
    ) -> dict:
        url = self.uri + path
        if query:
            url += "?" + urllib.parse.urlencode(query)
        data = json.dumps(body).encode("utf-8") if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self.token is not None:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req) as resp:
                return json.loads(resp.read().decode("utf-8") or "{}")
        except urllib.error.HTTPError as e:
            try:
                msg = json.loads(e.read().decode("utf-8")).get("message", str(e))
            except Exception:
                msg = str(e)
            raise RESTError(e.code, msg) from None

    def _paged(self, path: str, data_key: str, pattern: dict[str, str]) -> list[str]:
        """Drain a paged listing (rest_api.py __list_data_from_page_api)."""
        out: list[str] = []
        token: str | None = None
        while True:
            q = dict(pattern)
            if token:
                q["pageToken"] = token
            resp = self._request("GET", path, query=q)
            out.extend(resp.get(data_key) or [])
            token = resp.get("nextPageToken")
            if not token:
                return out

    @staticmethod
    def _enc(name: str) -> str:
        return urllib.parse.quote(name, safe="")

    # --- databases ---

    def list_databases(self, pattern: str | None = None) -> list[str]:
        q = {"databaseNamePattern": pattern} if pattern else {}
        return self._paged(f"{self.base}/databases", "databases", q)

    def list_databases_paged(
        self, max_results: int | None = None, page_token: str | None = None
    ) -> tuple[list[str], str | None]:
        q: dict[str, str] = {}
        if max_results:
            q["maxResults"] = str(max_results)
        if page_token:
            q["pageToken"] = page_token
        resp = self._request("GET", f"{self.base}/databases", query=q)
        return resp.get("databases") or [], resp.get("nextPageToken")

    def create_database(self, name: str, properties: dict[str, str] | None = None) -> None:
        self._request(
            "POST", f"{self.base}/databases", body={"name": name, "properties": properties or {}}
        )

    def get_database(self, name: str) -> dict:
        return self._request("GET", f"{self.base}/databases/{self._enc(name)}")

    def alter_database(
        self, name: str, removals: list[str] | None = None, updates: dict[str, str] | None = None
    ) -> None:
        self._request(
            "POST",
            f"{self.base}/databases/{self._enc(name)}",
            body={"removals": removals or [], "updates": updates or {}},
        )

    def drop_database(self, name: str, cascade: bool = False) -> None:
        # cascade is decided SERVER-side in one arbiter operation; a
        # client-side emptiness probe would be a check-then-act race
        self._request(
            "DELETE",
            f"{self.base}/databases/{self._enc(name)}",
            query={"cascade": "true"} if cascade else None,
        )

    # --- tables ---

    def list_tables(self, database: str, pattern: str | None = None) -> list[str]:
        q = {"tableNamePattern": pattern} if pattern else {}
        return self._paged(f"{self.base}/databases/{self._enc(database)}/tables", "tables", q)

    def list_tables_paged(
        self, database: str, max_results: int | None = None, page_token: str | None = None
    ) -> tuple[list[str], str | None]:
        q: dict[str, str] = {}
        if max_results:
            q["maxResults"] = str(max_results)
        if page_token:
            q["pageToken"] = page_token
        resp = self._request(
            "GET", f"{self.base}/databases/{self._enc(database)}/tables", query=q
        )
        return resp.get("tables") or [], resp.get("nextPageToken")

    def create_table(self, database: str, table: str, schema: TableSchema) -> None:
        self._request(
            "POST",
            f"{self.base}/databases/{self._enc(database)}/tables",
            body={
                "identifier": {"database": database, "object": table},
                "schema": schema.to_dict(),
            },
        )

    def get_table(self, database: str, table: str) -> dict:
        return self._request(
            "GET", f"{self.base}/databases/{self._enc(database)}/tables/{self._enc(table)}"
        )

    def list_table_details(self, database: str, pattern: str | None = None) -> list[dict]:
        """Full table metadata for a database in one paged call
        (ResourcePaths TABLE_DETAILS)."""
        q = {"tableNamePattern": pattern} if pattern else {}
        return self._paged(
            f"{self.base}/databases/{self._enc(database)}/table-details",
            "tableDetails",
            q,
        )

    def alter_table(self, database: str, table: str, changes: list[dict[str, Any]]) -> None:
        self._request(
            "POST",
            f"{self.base}/databases/{self._enc(database)}/tables/{self._enc(table)}",
            body={"changes": changes},
        )

    def drop_table(self, database: str, table: str) -> None:
        self._request(
            "DELETE", f"{self.base}/databases/{self._enc(database)}/tables/{self._enc(table)}"
        )

    def rename_table(self, src_db: str, src_tbl: str, dst_db: str, dst_tbl: str) -> None:
        self._request(
            "POST",
            f"{self.base}/tables/rename",
            body={
                "source": {"database": src_db, "object": src_tbl},
                "destination": {"database": dst_db, "object": dst_tbl},
            },
        )

    def load_table_token(self, database: str, table: str) -> dict:
        return self._request(
            "GET",
            f"{self.base}/databases/{self._enc(database)}/tables/{self._enc(table)}/token",
        )

    def load_snapshot(self, database: str, table: str) -> Snapshot:
        resp = self._request(
            "GET",
            f"{self.base}/databases/{self._enc(database)}/tables/{self._enc(table)}/snapshot",
        )
        return Snapshot.from_dict(resp["snapshot"])

    def commit_snapshot(
        self,
        database: str,
        table: str,
        table_uuid: str | None,
        snapshot: dict,
        statistics: list | None = None,
    ) -> bool:
        resp = self._request(
            "POST",
            f"{self.base}/databases/{self._enc(database)}/tables/{self._enc(table)}/commit",
            body={
                "tableUuid": table_uuid,
                "snapshot": snapshot,
                "statistics": statistics or [],
            },
        )
        return bool(resp.get("success"))

    # --- version management (RESTCatalog.java:327/:378/:565/:595 +
    #     tag/branch routes) ---

    def _tbl_base(self, database: str, table: str) -> str:
        return f"{self.base}/databases/{self._enc(database)}/tables/{self._enc(table)}"

    def list_snapshots_paged(
        self,
        database: str,
        table: str,
        max_results: int | None = None,
        page_token: str | None = None,
    ) -> tuple[list[Snapshot], str | None]:
        q: dict[str, str] = {}
        if max_results:
            q["maxResults"] = str(max_results)
        if page_token:
            q["pageToken"] = page_token
        resp = self._request("GET", f"{self._tbl_base(database, table)}/snapshots", query=q)
        snaps = [Snapshot.from_dict(s) for s in resp.get("snapshots") or []]
        return snaps, resp.get("nextPageToken")

    def list_snapshots(self, database: str, table: str) -> list[Snapshot]:
        out: list[Snapshot] = []
        token: str | None = None
        while True:
            page, token = self.list_snapshots_paged(database, table, page_token=token)
            out.extend(page)
            if not token:
                return out

    def rollback_to(
        self,
        database: str,
        table: str,
        snapshot_id: int | None = None,
        tag_name: str | None = None,
    ) -> None:
        body: dict[str, Any] = {}
        if snapshot_id is not None:
            body["snapshotId"] = snapshot_id
        if tag_name is not None:
            body["tagName"] = tag_name
        self._request("POST", f"{self._tbl_base(database, table)}/rollback", body=body)

    def list_partitions(self, database: str, table: str) -> list[dict]:
        return self._paged(f"{self._tbl_base(database, table)}/partitions", "partitions", {})

    def register_table(self, database: str, table: str, path: str) -> str:
        resp = self._request(
            "POST",
            f"{self.base}/tables/register",
            body={"identifier": {"database": database, "object": table}, "path": path},
        )
        return resp["path"]

    def list_tags(self, database: str, table: str) -> list[dict]:
        return self._paged(f"{self._tbl_base(database, table)}/tags", "tags", {})

    def create_tag(
        self, database: str, table: str, tag: str, snapshot_id: int | None = None
    ) -> None:
        body: dict[str, Any] = {"tagName": tag}
        if snapshot_id is not None:
            body["snapshotId"] = snapshot_id
        self._request("POST", f"{self._tbl_base(database, table)}/tags", body=body)

    def delete_tag(self, database: str, table: str, tag: str) -> None:
        self._request(
            "DELETE", f"{self._tbl_base(database, table)}/tags/{self._enc(tag)}"
        )

    def list_branches(self, database: str, table: str) -> list[dict]:
        return self._paged(f"{self._tbl_base(database, table)}/branches", "branches", {})

    def create_branch(
        self, database: str, table: str, branch: str, snapshot_id: int | None = None
    ) -> None:
        body: dict[str, Any] = {"branchName": branch}
        if snapshot_id is not None:
            body["snapshotId"] = snapshot_id
        self._request("POST", f"{self._tbl_base(database, table)}/branches", body=body)

    def delete_branch(self, database: str, table: str, branch: str) -> None:
        self._request(
            "DELETE", f"{self._tbl_base(database, table)}/branches/{self._enc(branch)}"
        )

    # --- views ---

    def list_views(self, database: str) -> list[str]:
        return self._paged(f"{self.base}/databases/{self._enc(database)}/views", "views", {})

    def create_view(self, database: str, view: str, dialects: dict[str, str], comment: str = "") -> None:
        self._request(
            "POST",
            f"{self.base}/databases/{self._enc(database)}/views",
            body={
                "identifier": {"database": database, "object": view},
                "dialects": dialects,
                "comment": comment,
            },
        )

    def get_view(self, database: str, view: str) -> dict:
        return self._request(
            "GET", f"{self.base}/databases/{self._enc(database)}/views/{self._enc(view)}"
        )

    def drop_view(self, database: str, view: str) -> None:
        self._request(
            "DELETE", f"{self.base}/databases/{self._enc(database)}/views/{self._enc(view)}"
        )


class _RESTSnapshots(SnapshotManager):
    """Snapshot manager whose main-branch ``try_commit`` is the REST
    commit endpoint — the server performs the CAS. Reads stay on shared
    storage (the reference's FileIO model). Branch commits are
    branch-local filesystem state and fall back to the direct CAS."""

    def __init__(
        self,
        table_path: str,
        api: RESTApi,
        database: str,
        table: str,
        table_uuid: str | None,
        branch: str | None = None,
    ):
        super().__init__(table_path, branch=branch)
        self._api = api
        self._db = database
        self._tbl = table
        self._uuid = table_uuid

    def try_commit(self, snapshot: Snapshot) -> bool:
        if self.branch is not None:
            return super().try_commit(snapshot)
        return self._api.commit_snapshot(self._db, self._tbl, self._uuid, snapshot.to_dict())


class RESTTable(Table):
    """A ``Table`` whose version-management operations route through the
    catalog service, so a client needs ONLY the HTTP endpoint to
    enumerate history, tag, branch, and roll back — the deployment mode
    the REST catalog exists for (RESTCatalog.java:327-378 + tag/branch
    routes). Scans and writes stay direct against shared storage."""

    def _bind_rest(self, api: RESTApi, db: str, tbl: str) -> None:
        self._api, self._db, self._tbl = api, db, tbl

    def rollback_to(self, snapshot_id: int) -> None:
        self._api.rollback_to(self._db, self._tbl, snapshot_id=snapshot_id)

    def create_tag(self, name: str, snapshot_id: int | None = None) -> None:
        self._api.create_tag(self._db, self._tbl, name, snapshot_id)

    def delete_tag(self, name: str) -> None:
        self._api.delete_tag(self._db, self._tbl, name)

    def create_branch(self, name: str, snapshot_id: int | None = None) -> "Table":
        self._api.create_branch(self._db, self._tbl, name, snapshot_id)
        return self.use_branch(name)

    def delete_branch(self, name: str) -> None:
        self._api.delete_branch(self._db, self._tbl, name)

    def list_snapshots(self) -> list[Snapshot]:
        return self._api.list_snapshots(self._db, self._tbl)

    def list_partitions(self) -> list[dict]:
        return self._api.list_partitions(self._db, self._tbl)


class RESTCatalog(Catalog):
    """A ``Catalog`` whose metadata operations speak the REST protocol.

    Construct with ``RESTCatalog(uri, token=..., warehouse=...)``; the
    warehouse path is learned from the server's config endpoint, so the
    caller needs only the service URI (plus a bearer token when the
    server requires one)."""

    def __init__(self, uri: str, token: str | None = None, warehouse: str = ""):
        self.api = RESTApi(uri, token=token, warehouse=warehouse)
        super().__init__(self.api.warehouse)

    # --- databases ---

    def create_database(self, database: str, ignore_if_exists: bool = True) -> None:
        try:
            self.api.create_database(database)
        except RESTError as e:
            if e.code == 409 and ignore_if_exists:
                return
            raise RuntimeError(f"database {database} exists") if e.code == 409 else e

    def list_databases(self) -> list[str]:
        return sorted(self.api.list_databases())

    def drop_database(
        self, database: str, ignore_if_not_exists: bool = True, cascade: bool = False
    ) -> None:
        try:
            self.api.drop_database(database, cascade=cascade)
        except RESTError as e:
            if e.code == 404 and ignore_if_not_exists:
                return
            if e.code == 404:
                raise RuntimeError(f"database {database} does not exist") from None
            if e.code == 409:
                raise RuntimeError(e.message) from None
            raise

    # --- tables ---

    def list_tables(self, database: str) -> list[str]:
        try:
            return sorted(self.api.list_tables(database))
        except RESTError as e:
            if e.code == 404:
                return []
            raise

    def table_path(self, identifier: str) -> str:
        db, name = self._split(identifier)
        return self.api.get_table(db, name)["path"]

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
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if isinstance(schema, T.StructType):
            ts = from_spark_schema(schema, partition_keys, primary_keys, options)
        else:
            ts = schema
        try:
            self.api.create_table(db, name, ts)
        except RESTError as e:
            if not (e.code == 409 and ignore_if_exists):
                raise RuntimeError(f"table {identifier} exists") if e.code == 409 else e
        return self.get_table(identifier)

    def get_table(self, identifier: str) -> Table:
        if "$" in identifier:
            raise ValueError(
                f"'{identifier}' names a system table — use catalog.read_system(spark, ...)"
            )
        base, _, branch = identifier.partition("@")
        db, name = self._split(base)
        try:
            info = self.api.get_table(db, name)
        except RESTError as e:
            if e.code == 404:
                raise RuntimeError(f"table {identifier} not found") from None
            raise
        t = RESTTable(info["path"], base, branch=branch or None)
        t._bind_rest(self.api, db, name)
        snaps = _RESTSnapshots(
            info["path"], self.api, db, name, info.get("id"), branch=branch or None
        )
        t.snapshots = snaps
        t.committer.snapshots = snaps
        return t

    def register_table(self, identifier: str, path: str) -> Table:
        """Adopt an existing table directory under ``identifier``
        (RESTCatalog.java:565 registerTable)."""
        db, name = self._split(identifier)
        self.create_database(db)
        self.api.register_table(db, name, path)
        return self.get_table(identifier)

    def drop_table(self, identifier: str, ignore_if_not_exists: bool = True) -> None:
        db, name = self._split(identifier)
        try:
            self.api.drop_table(db, name)
        except RESTError as e:
            if e.code == 404 and ignore_if_not_exists:
                return
            raise RuntimeError(f"table {identifier} not found") if e.code == 404 else e

    def rename_table(self, src: str, dst: str) -> None:
        sdb, stbl = self._split(src)
        ddb, dtbl = self._split(dst)
        self.api.rename_table(sdb, stbl, ddb, dtbl)

    def alter_table(self, identifier: str, changes: list[dict[str, Any]]) -> None:
        """Schema evolution through the service (AlterTableRequest —
        the list-of-SchemaChange contract of rest_api.py:293-302)."""
        db, name = self._split(identifier)
        self.api.alter_table(db, name, changes)

    # --- views ---

    def create_view(
        self,
        identifier: str,
        sql: str,
        dialect: str = "spark",
        comment: str = "",
        ignore_if_exists: bool = False,
    ) -> dict:
        db, name = self._split(identifier)
        self.create_database(db)
        dialects = {dialect: sql}
        try:
            existing = self.api.get_view(db, name)
        except RESTError as e:
            if e.code != 404:
                raise
            existing = None
        if existing is not None:
            if not ignore_if_exists:
                raise RuntimeError(f"view {identifier} exists")
            merged = dict(existing.get("dialects", {}))
            merged[dialect] = sql
            self.api.drop_view(db, name)
            dialects = merged
        self.api.create_view(db, name, dialects, comment=comment)
        return self.api.get_view(db, name)

    def get_view(self, identifier: str) -> dict:
        db, name = self._split(identifier)
        return self.api.get_view(db, name)

    def is_view(self, identifier: str) -> bool:
        db, name = self._split(identifier)
        try:
            self.api.get_view(db, name)
            return True
        except RESTError as e:
            if e.code == 404:
                return False
            raise  # auth/server failures must surface, not read as "no view"

    def drop_view(self, identifier: str, ignore_if_not_exists: bool = True) -> None:
        db, name = self._split(identifier)
        try:
            self.api.drop_view(db, name)
        except RESTError as e:
            if e.code == 404 and ignore_if_not_exists:
                return
            raise RuntimeError(f"view {identifier} not found") if e.code == 404 else e

    def list_views(self, database: str) -> list[str]:
        try:
            return sorted(self.api.list_views(database))
        except RESTError as e:
            if e.code == 404:
                return []
            raise
