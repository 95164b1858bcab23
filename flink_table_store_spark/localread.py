"""Local (no-Spark) read path: table → Arrow / pandas / DuckDB.

Mirrors pypaimon's TableRead surface (paimon-python pypaimon/read/
table_read.py: to_arrow:78, to_arrow_batch_reader:56, to_pandas:175,
to_duckdb:179): small reads — notebooks, services, tests, CI — should
not need a SparkSession. The plan comes from the SAME ReadBuilder
planner the Spark path uses (snapshot resolution, manifest pruning,
stats skipping, time travel), and each per-bucket split runs the same
pyarrow bucket reader the native format surface runs executor-side
(DV-scoped, merge-on-read, schema-evolution aware) — one code path,
two runtimes.

Semantics: the ReadBuilder predicate is applied EXACTLY here (pruning
first, then `Predicate.to_arrow_expr` on the merged batches — SQL WHERE
null handling), projection and limit after. This is a DRIVER-LOCAL
reader: splits stream through a thread pool (pyarrow releases the GIL
on IO/decode), so it scales to what one machine should read — use
``to_df(spark)`` for anything bigger.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

    from flink_table_store_spark.table import ReadBuilder


def _arrow_type(ddl: str) -> "pa.DataType":
    """Engine DDL type string → pyarrow type, without a SparkSession
    (StructType.fromDDL parses via the JVM — unusable on a no-Spark
    path). Matches the arrow types Spark's to_arrow_schema produces so
    the local reader and the format surface agree byte-for-byte."""
    import pyarrow as pa

    s = ddl.strip().lower()
    if s.startswith("array<") and s.endswith(">"):
        return pa.list_(_arrow_type(s[6:-1]))
    if s.startswith("map<") and s.endswith(">"):
        depth, split = 0, -1
        inner = s[4:-1]
        for i, ch in enumerate(inner):
            depth += ch == "<"
            depth -= ch == ">"
            if ch == "," and depth == 0:
                split = i
                break
        return pa.map_(_arrow_type(inner[:split]), _arrow_type(inner[split + 1:]))
    if s.startswith("struct<") and s.endswith(">"):
        fields, depth, cur = [], 0, ""
        for ch in s[7:-1] + ",":
            depth += ch == "<"
            depth -= ch == ">"
            if ch == "," and depth == 0:
                name, _, typ = cur.partition(":")
                fields.append(pa.field(name.strip().strip("`"), _arrow_type(typ)))
                cur = ""
            else:
                cur += ch
        return pa.struct(fields)
    if s.startswith("decimal"):
        p, sc = (s[s.index("(") + 1 : s.rindex(")")].split(",") + ["0"])[:2] \
            if "(" in s else ("10", "0")
        return pa.decimal128(int(p), int(sc))
    if s.startswith(("varchar", "char")):
        return pa.string()
    base = {
        "bigint": pa.int64(), "long": pa.int64(), "int": pa.int32(),
        "integer": pa.int32(), "smallint": pa.int16(), "short": pa.int16(),
        "tinyint": pa.int8(), "byte": pa.int8(), "string": pa.string(),
        "boolean": pa.bool_(), "float": pa.float32(), "double": pa.float64(),
        "date": pa.date32(), "binary": pa.binary(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if s in base:
        return base[s]
    raise ValueError(f"local read: unsupported DDL type {ddl!r}")


def _table_arrow_schema(schema) -> "pa.Schema":
    import pyarrow as pa

    return pa.schema([pa.field(f.name, _arrow_type(f.type)) for f in schema.fields])


def _builder_options(rb: "ReadBuilder") -> dict:
    opts = {}
    if rb._snapshot_id is not None:
        opts["version_as_of"] = str(rb._snapshot_id)
    if rb._timestamp_ms is not None:
        opts["timestamp_as_of"] = str(rb._timestamp_ms)
    if rb._tag is not None:
        opts["tag"] = rb._tag
    return opts


def read_arrow(rb: "ReadBuilder", max_workers: int = 8) -> "pa.Table":
    """Materialize the scan as one pyarrow Table."""
    import pyarrow as pa

    from flink_table_store_spark.sources.datasource import (
        _plan_input_partitions,
        _read_partition,
    )

    t = rb._table
    arrow_schema = _table_arrow_schema(t.schema)
    parts = _plan_input_partitions(t, rb._predicate, _builder_options(rb))

    def _one(p) -> list:
        return list(_read_partition(p, arrow_schema))

    batches: list = []
    if parts:
        with ThreadPoolExecutor(max_workers=min(max_workers, len(parts))) as ex:
            for bs in ex.map(_one, parts):
                batches.extend(bs)
    tbl = (
        pa.Table.from_batches(batches, schema=arrow_schema)
        if batches
        else arrow_schema.empty_table()
    )
    if rb._predicate is not None:
        tbl = tbl.filter(rb._predicate.to_arrow_expr())
    if rb._projection is not None:
        tbl = tbl.select(rb._projection)
    if rb._limit is not None:
        tbl = tbl.slice(0, rb._limit)
    return tbl


def read_arrow_batch_reader(rb: "ReadBuilder") -> "pa.RecordBatchReader":
    """Streaming variant: one split in flight at a time, constant
    memory in the number of splits (pypaimon to_arrow_batch_reader)."""
    import pyarrow as pa

    from flink_table_store_spark.sources.datasource import (
        _plan_input_partitions,
        _read_partition,
    )

    t = rb._table
    arrow_schema = _table_arrow_schema(t.schema)
    parts = _plan_input_partitions(t, rb._predicate, _builder_options(rb))
    expr = rb._predicate.to_arrow_expr() if rb._predicate is not None else None
    proj = rb._projection
    out_schema = (
        arrow_schema
        if proj is None
        else pa.schema([arrow_schema.field(c) for c in proj])
    )
    limit = rb._limit

    def _gen():
        remaining = limit
        for p in parts:
            for b in _read_partition(p, arrow_schema):
                tb = pa.Table.from_batches([b], schema=arrow_schema)
                if expr is not None:
                    tb = tb.filter(expr)
                if proj is not None:
                    tb = tb.select(proj)
                if remaining is not None:
                    tb = tb.slice(0, remaining)
                    remaining -= tb.num_rows
                for ob in tb.to_batches():
                    if ob.num_rows:
                        yield ob
                if remaining is not None and remaining <= 0:
                    return

    return pa.RecordBatchReader.from_batches(out_schema, _gen())


def read_pandas(rb: "ReadBuilder"):
    return read_arrow(rb).to_pandas()


def read_duckdb(rb: "ReadBuilder", table_name: str, connection=None):
    """Register the scan as a DuckDB view and return the connection
    (pypaimon to_duckdb)."""
    import duckdb

    con = connection or duckdb.connect(database=":memory:")
    con.register(table_name, read_arrow(rb))
    return con
