"""Catalog-managed functions + engine built-ins (SURVEY §2.8 F3-F7).

- ``bucket(n, cols...)`` — the engine's stable bucket hash
  (PaimonFunctions.scala:44 ``PAIMON_BUCKET``), shared with the write
  path (write.py bucket_expr) so storage-partitioned joins can
  pre-shuffle identically.
- ``FunctionManager`` — catalog-persisted SQL-expression functions
  (paimon-api function/Function.java:29-45: file/lambda/sql dialects;
  we implement the SQL dialect). Definitions are JSON under
  ``<warehouse>/function/``; registration uses Spark 4 SQL UDFs
  (CREATE TEMPORARY FUNCTION ... RETURN expr) so they work in
  ``spark.sql`` text too, falling back to a Column factory.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def bucket(num_buckets: int, *cols) -> Column:
    """Stable bucket id of the given key columns — identical to the
    writer's assignment, enabling manual bucket-join co-partitioning
    (J3): ``df.repartition(n, bucket(n, df.k))`` on both sides."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.pmod(F.xxhash64(*cs), F.lit(num_buckets)).cast("int")


def max_pt(table) -> str | None:
    """sys.max_pt('t'): latest non-empty partition value (F3)."""
    return table.max_pt()


class FunctionManager:
    """CRUD + session registration for catalog SQL functions."""

    def __init__(self, warehouse: str):
        self.dir = os.path.join(warehouse, "function")

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, f"{name}.json")

    def create(self, name: str, params: list[str], expr: str, returns: str = "") -> None:
        """``params`` like ["x bigint", "y double"]; ``expr`` an SQL
        expression over the parameter names."""
        os.makedirs(self.dir, exist_ok=True)
        with open(self._path(name), "w") as f:
            json.dump({"type": "sql", "params": params, "expr": expr, "returns": returns}, f)

    def alter(
        self,
        name: str,
        params: list[str] | None = None,
        expr: str | None = None,
        returns: str | None = None,
    ) -> dict:
        """Update a function definition in place (FunctionChange.java:
        add/drop definition, update options)."""
        d = self.load(name)
        if params is not None:
            d["params"] = params
        if expr is not None:
            d["expr"] = expr
        if returns is not None:
            d["returns"] = returns
        with open(self._path(name), "w") as f:
            json.dump(d, f)
        return d

    def drop(self, name: str) -> None:
        p = self._path(name)
        if os.path.exists(p):
            os.unlink(p)

    def list(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(n[:-5] for n in os.listdir(self.dir) if n.endswith(".json"))

    def load(self, name: str) -> dict:
        with open(self._path(name)) as f:
            return json.load(f)

    def column(self, name: str, *args) -> Column:
        """Apply a catalog function to Columns (works on any Spark)."""
        d = self.load(name)
        names = [p.split()[0] for p in d["params"]]
        expr = d["expr"]
        sql_args = []
        for a in args:
            if isinstance(a, Column):
                sql_args.append(a._jc.toString() if hasattr(a, "_jc") else str(a))
            else:
                sql_args.append(str(a))
        import re

        for n, a in zip(names, sql_args):
            expr = re.sub(rf"\b{re.escape(n)}\b", f"({a})", expr)
        return F.expr(expr)

    def register_all(self, spark: SparkSession) -> list[str]:
        """Register every catalog function as a Spark SQL UDF (Spark 4
        ``CREATE TEMPORARY FUNCTION ... RETURN``), making them callable
        from SQL text."""
        done = []
        for name in self.list():
            d = self.load(name)
            params = ", ".join(d["params"])
            ret = f"RETURNS {d['returns']} " if d.get("returns") else ""
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) {ret}RETURN {d['expr']}"
            )
            done.append(name)
        return done


def register_builtins(spark: SparkSession, num_buckets_default: int = 4) -> None:
    """Session-level engine functions callable from SQL text."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION paimon_bucket(n INT, k BIGINT) "
        "RETURNS INT RETURN CAST(pmod(xxhash64(k), n) AS INT)"
    )
