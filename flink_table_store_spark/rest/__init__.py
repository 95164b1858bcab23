"""REST catalog: loopback HTTP server + client.

The reference ships a third catalog type next to filesystem and Hive:
a REST catalog service (paimon-core rest/RESTCatalog.java,
pypaimon api/rest_api.py). This package provides both halves for the
sandbox: ``RESTCatalogServer`` (an HTTP service fronting a filesystem
warehouse — the metadata and commit arbiter) and ``RESTCatalog`` (a
client with the same duck-typed surface as ``Catalog``, so
``SqlSession`` and the table API run unchanged over it).
"""

from flink_table_store_spark.rest.client import RESTApi, RESTCatalog, RESTError, RESTTable
from flink_table_store_spark.rest.server import RESTCatalogServer

__all__ = ["RESTApi", "RESTCatalog", "RESTCatalogServer", "RESTError", "RESTTable"]
