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

import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    register_sketch_functions(spark)


def register_sketch_functions(spark: SparkSession) -> None:
    """Read/write helpers for serialized-sketch columns (the binary
    rbm32/rbm64/theta_sketch aggregation fields, functions/sketches.py)
    as SQL-callable UDFs — so sketch columns are queryable from SQL
    text, not just Python: ``SELECT k, theta_estimate(uniq) FROM t``.
    All Arrow-batched; the per-value work is one numpy decode."""
    from pyspark.sql.functions import pandas_udf

    pkg_root = _PKG_ROOT

    def _with_sketches(fn):
        def run(*cols):
            import sys as _sys

            if pkg_root not in _sys.path:
                _sys.path.insert(0, pkg_root)
            from flink_table_store_spark.functions import sketches as S

            return fn(S, *cols)

        return run

    @pandas_udf("double")
    def _theta_estimate(b: pd.Series) -> pd.Series:
        return _with_sketches(
            lambda S, s: s.map(lambda x: None if x is None else S.theta_estimate(bytes(x)))
        )(b)

    @pandas_udf("binary")
    def _theta_build(vals: pd.Series) -> pd.Series:
        return _with_sketches(
            lambda S, s: s.map(lambda xs: S.theta_sketch_of([] if xs is None else xs))
        )(vals)

    @pandas_udf("binary")
    def _rbm32_build(vals: pd.Series) -> pd.Series:
        return _with_sketches(
            lambda S, s: s.map(lambda xs: S.rbm32_serialize([] if xs is None else xs))
        )(vals)

    @pandas_udf("binary")
    def _rbm64_build(vals: pd.Series) -> pd.Series:
        return _with_sketches(
            lambda S, s: s.map(lambda xs: S.rbm64_serialize([] if xs is None else xs))
        )(vals)

    @pandas_udf("long")
    def _rbm32_cardinality(b: pd.Series) -> pd.Series:
        return _with_sketches(
            lambda S, s: s.map(lambda x: None if x is None else len(S.rbm32_deserialize(bytes(x))))
        )(b)

    @pandas_udf("long")
    def _rbm64_cardinality(b: pd.Series) -> pd.Series:
        return _with_sketches(
            lambda S, s: s.map(lambda x: None if x is None else len(S.rbm64_deserialize(bytes(x))))
        )(b)

    @pandas_udf("boolean")
    def _rbm32_contains(b: pd.Series, v: pd.Series) -> pd.Series:
        def go(S, bs, vs):
            return pd.Series(
                [
                    None if x is None or val is None else bool(int(val) in S.rbm32_deserialize(bytes(x)))
                    for x, val in zip(bs, vs)
                ]
            )

        return _with_sketches(go)(b, v)

    @pandas_udf("boolean")
    def _rbm64_contains(b: pd.Series, v: pd.Series) -> pd.Series:
        def go(S, bs, vs):
            return pd.Series(
                [
                    None if x is None or val is None else bool(int(val) in S.rbm64_deserialize(bytes(x)))
                    for x, val in zip(bs, vs)
                ]
            )

        return _with_sketches(go)(b, v)

    spark.udf.register("theta_estimate", _theta_estimate)
    spark.udf.register("theta_build", _theta_build)
    spark.udf.register("rbm32_build", _rbm32_build)
    spark.udf.register("rbm64_build", _rbm64_build)
    spark.udf.register("rbm32_cardinality", _rbm32_cardinality)
    spark.udf.register("rbm64_cardinality", _rbm64_cardinality)
    spark.udf.register("rbm32_contains", _rbm32_contains)
    spark.udf.register("rbm64_contains", _rbm64_contains)
