"""flink_table_store_spark — a PySpark-native lakehouse table engine.

A from-scratch re-expression of the capabilities of
xiaochen-zhou/flink-table-store (Apache Paimon) on idiomatic PySpark:
the table format + snapshot/manifest/commit layer + merge-on-read
planner live in pure Python on the driver; every data movement is a
Spark DataFrame job optimized by Catalyst/AQE/Tungsten.

Reference parity map lives in SURVEY.md; each module docstring cites
the reference file:line it mirrors.
"""

from flink_table_store_spark.catalog import Catalog
from flink_table_store_spark.hive_catalog import HiveCatalog
from flink_table_store_spark.jdbc_catalog import JdbcCatalog
from flink_table_store_spark.privilege import PrivilegedCatalog, init_file_based_privilege
from flink_table_store_spark.rest import RESTCatalog, RESTCatalogServer
from flink_table_store_spark.session import get_spark
from flink_table_store_spark.sql import SqlSession
from flink_table_store_spark.table import Table

__all__ = [
    "Catalog",
    "HiveCatalog",
    "JdbcCatalog",
    "PrivilegedCatalog",
    "RESTCatalog",
    "RESTCatalogServer",
    "init_file_based_privilege",
    "SqlSession",
    "Table",
    "get_spark",
]
__version__ = "0.1.0"
