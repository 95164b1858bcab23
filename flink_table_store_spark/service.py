"""Primary-key lookup service: network point queries over a table.

Mirrors paimon-service + paimon-core service/ (KvQueryServer.java,
KvServerHandler.java, ServiceManager.java, client/KvQueryClient.java):
long-running servers hold per-bucket merged caches of a PK table and
answer point lookups over the network; clients DISCOVER the servers
through an address file on the table's shared storage
(``<table>/service/service-primary-key-lookup`` — ServiceManager.java's
exact layout) and ROUTE each key to the shard that owns its bucket,
exactly like the reference's `select(partition, bucket, numServers)`
contract (a request landing on the wrong shard is refused, never
silently answered).

Differences from the reference, by design: the wire is loopback
HTTP+JSON instead of a netty binary protocol (the protocol is an
implementation detail; the visible semantics — discovery file, shard
routing, per-bucket caching, snapshot refresh — are the parity
surface), and the server needs NO SparkSession: it reuses
``PartialLookupTable`` whose bucket reads are the pure-pyarrow merged
readers (DV-scoped, evolution-aware, merge-engine folds).
"""

from __future__ import annotations

import json
import os
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

SERVICE_PREFIX = "service-"
PRIMARY_KEY_LOOKUP = "primary-key-lookup"


class ServiceManager:
    """Address registry on the table's shared storage
    (paimon-core service/ServiceManager.java)."""

    def __init__(self, table_path: str):
        self.table_path = table_path

    def _path(self, service_id: str) -> str:
        return os.path.join(self.table_path, "service", f"{SERVICE_PREFIX}{service_id}")

    def service(self, service_id: str) -> list[str] | None:
        p = self._path(service_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def reset_service(self, service_id: str, addresses: list[str]) -> None:
        p = self._path(service_id)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(addresses, f)
        os.replace(tmp, p)

    def delete_service(self, service_id: str) -> None:
        try:
            os.unlink(self._path(service_id))
        except FileNotFoundError:
            pass


def shard_of(bucket: int, num_servers: int) -> int:
    """Stable bucket→shard routing shared by servers and clients
    (KvServerHandler.select analogue). Plain modulo: bucket ids are
    already hash-assigned, so consecutive ids spread evenly — a byte
    hash of the DECIMAL STRING (first attempt) sent buckets 0-3 to one
    shard."""
    return int(bucket) % max(num_servers, 1)


class LookupQueryServer:
    """One shard of the lookup service (KvQueryServer + the QueryService
    action). ``num_servers`` shards split the bucket space; each server
    refuses buckets it doesn't own. Context-manager friendly."""

    def __init__(
        self,
        table_path: str,
        server_id: int = 0,
        num_servers: int = 1,
        host: str = "127.0.0.1",
        port: int = 0,
        refresh_interval_sec: float = 1.0,
    ):
        from flink_table_store_spark.operators.lookup import PartialLookupTable
        from flink_table_store_spark.table import Table

        self.table_path = table_path
        self.server_id = server_id
        self.num_servers = num_servers
        # spark=None: planning takes the driver manifest path and bucket
        # reads are pure pyarrow — the server is a plain python process
        self._lookup = PartialLookupTable(
            None, Table(table_path), refresh_interval_sec=refresh_interval_sec
        )
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, obj) -> None:
                body = json.dumps(obj).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/v1/lookup":
                    return self._send(404, {"error": "unknown route"})
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    out = []
                    for kv in req.get("keys", []):
                        b = outer._lookup._bucket(kv)
                        if shard_of(b, outer.num_servers) != outer.server_id:
                            # UnknownPartitionBucketException analogue:
                            # never answer for a bucket another shard owns
                            return self._send(
                                409,
                                {
                                    "error": "wrong shard",
                                    "bucket": b,
                                    "owner": shard_of(b, outer.num_servers),
                                },
                            )
                        row = outer._lookup.lookup(kv)
                        out.append(_json_row(row))
                    return self._send(200, {"values": out})
                except Exception as e:  # noqa: BLE001 - surface to client
                    return self._send(500, {"error": f"{type(e).__name__}: {e}"})

        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self.address = f"{host}:{self._httpd.server_address[1]}"
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    # --- lifecycle (QueryService registers into the ServiceManager) ---

    def start(self) -> "LookupQueryServer":
        self._thread.start()
        sm = ServiceManager(self.table_path)
        addrs = sm.service(PRIMARY_KEY_LOOKUP) or []
        addrs += [None] * (self.num_servers - len(addrs))
        addrs[self.server_id] = self.address
        sm.reset_service(PRIMARY_KEY_LOOKUP, addrs)
        return self

    def stop(self) -> None:
        sm = ServiceManager(self.table_path)
        addrs = sm.service(PRIMARY_KEY_LOOKUP) or []
        if self.server_id < len(addrs) and addrs[self.server_id] == self.address:
            addrs[self.server_id] = None
            if any(addrs):
                sm.reset_service(PRIMARY_KEY_LOOKUP, addrs)
            else:
                sm.delete_service(PRIMARY_KEY_LOOKUP)
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    @property
    def stats(self) -> dict:
        return dict(self._lookup.stats)


def _json_row(row: dict | None):
    if row is None:
        return None
    out = {}
    for k, v in row.items():
        try:
            json.dumps(v)
            out[k] = v
        except TypeError:
            out[k] = str(v)
    return out


class RemoteLookupClient:
    """Client side (service/client/KvQueryClient.java +
    RemoteTableQuery.java): discovers shard addresses from the table's
    service file and routes every key to its bucket's owner."""

    def __init__(self, table_path: str):
        from flink_table_store_spark.table import Table

        self.table_path = table_path
        self._sm = ServiceManager(table_path)
        self._table = Table(table_path)
        if self._table.schema.num_buckets() <= 0:
            raise RuntimeError("remote lookup requires a fixed-bucket PK table")

    def _addresses(self) -> list[str]:
        addrs = self._sm.service(PRIMARY_KEY_LOOKUP)
        if not addrs or not any(addrs):
            raise RuntimeError(
                f"no lookup service registered for {self.table_path} — "
                "start a LookupQueryServer first"
            )
        return addrs

    def _bucket(self, kv: dict) -> int:
        # the SAME shared hash the server routes by (bucket_for_key) —
        # spark=None: this client is a plain python process, refuse
        # loudly rather than silently diverge from the server
        from flink_table_store_spark.operators.lookup import bucket_for_key

        return bucket_for_key(self._table, kv, None)

    def lookup(self, key_values: dict) -> dict | None:
        return self.lookup_batch([key_values])[0]

    def lookup_batch(self, batch: list[dict]) -> list[dict | None]:
        addrs = self._addresses()
        n = len(addrs)
        by_shard: dict[int, list[int]] = {}
        for i, kv in enumerate(batch):
            by_shard.setdefault(shard_of(self._bucket(kv), n), []).append(i)
        out: list = [None] * len(batch)
        for shard, idxs in by_shard.items():
            addr = addrs[shard]
            if not addr:
                raise RuntimeError(f"shard {shard} has no registered server")
            body = json.dumps({"keys": [batch[i] for i in idxs]}).encode()
            req = urllib.request.Request(
                f"http://{addr}/v1/lookup",
                data=body,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=30) as resp:
                    payload = json.loads(resp.read())
            except urllib.error.HTTPError as e:
                raise RuntimeError(
                    f"lookup shard {shard} refused: {e.read().decode()[:200]}"
                ) from None
            for i, v in zip(idxs, payload["values"]):
                out[i] = v
        return out
