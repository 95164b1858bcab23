"""Bloom-filter file indexes — plan-time whole-file skipping (P9).

Mirrors the reference's file-index framework (paimon-common fileindex/
bloomfilter/BloomFilterFileIndexFactory.java:29, applied through
FileIndexPredicate): per data file, per configured column, a compact
bloom bitset is persisted with the file's metadata and consulted by
the DRIVER during scan planning — equality/IN predicates drop files
that definitely don't contain the value, before any Spark job runs.
This complements (not replaces) the parquet-native bloom filters the
writer also emits for the same columns, which skip row groups at READ
time inside files that survive planning.

Option surface (CoreOptions-style):
  file-index.bloom-filter.columns = c1,c2   -> which columns to index
  file-index.bloom-filter.items  = 10000    -> expected distinct values
                                               per file (sizes the bitset
                                               at ~10 bits/item, k=7)

Scale shape: the index build is ONE distributed pass over the freshly
staged files (explode k positions -> collect_set per file); what comes
back to the driver is O(files x index-size) — the same CommitMessage
hop that carries file stats. Hash positions are Spark's own
``pmod(xxhash64(col, i), m)`` evaluated JVM-side on BOTH paths (the
write pass over data, and a one-row job per literal at plan time), so
driver and executors can never disagree on the hash.
"""

from __future__ import annotations

import base64
import urllib.parse
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_COLUMNS_OPTION = "file-index.bloom-filter.columns"
BLOOM_ITEMS_OPTION = "file-index.bloom-filter.items"
BITMAP_COLUMNS_OPTION = "file-index.bitmap.columns"
BITMAP_MAX_VALUES = 128  # beyond this the per-file set is dropped (overflow)
DEFAULT_ITEMS = 10_000
K = 7  # hash count — ~1% FPR at 10 bits/item


def bloom_columns(options: dict[str, str]) -> list[str]:
    raw = options.get(BLOOM_COLUMNS_OPTION, "")
    return [c.strip() for c in raw.split(",") if c.strip()]


def bitmap_columns(options: dict[str, str]) -> list[str]:
    raw = options.get(BITMAP_COLUMNS_OPTION, "")
    return [c.strip() for c in raw.split(",") if c.strip()]


def bloom_bits(options: dict[str, str]) -> int:
    items = int(options.get(BLOOM_ITEMS_OPTION, DEFAULT_ITEMS))
    m = items * 10
    return max(1024, (m + 7) // 8 * 8)  # byte-aligned


def _position_cols(col, m: int) -> list:
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m)) for i in range(K)]


def build_blooms(
    spark: SparkSession, staging: str, cols: list[str], m: int, fmt: str = "parquet"
) -> dict[str, dict[str, dict[str, Any]]]:
    """{staged-file-abs-path: {col: {"m", "k", "bits"}}} for every staged
    data file — one distributed pass per indexed column."""
    if not cols:
        return {}
    df = spark.read.format(fmt).load(staging)
    out: dict[str, dict[str, dict[str, Any]]] = {}
    for c in cols:
        if c not in df.columns:
            continue
        rows = (
            df.where(F.col(c).isNotNull())
            .select(
                F.col("_metadata.file_path").alias("__f"),
                F.explode(F.array(*_position_cols(F.col(c), m))).alias("__p"),
            )
            .groupBy("__f")
            .agg(F.collect_set("__p").alias("__ps"))
            .collect()
        )
        for r in rows:
            bits = bytearray(m // 8)
            for p in r["__ps"]:
                bits[p >> 3] |= 1 << (p & 7)
            path = urllib.parse.urlparse(r["__f"]).path or r["__f"]
            out.setdefault(path, {})[c] = {
                "bloom": {
                    "m": m,
                    "k": K,
                    "bits": base64.b64encode(bytes(bits)).decode("ascii"),
                }
            }
    return out


def build_value_sets(
    spark: SparkSession, staging: str, cols: list[str], fmt: str = "parquet"
) -> dict[str, dict[str, list]]:
    """{staged-file-abs-path: {col: sorted distinct values}} — the exact
    file-level projection of the reference's bitmap index
    (fileindex/bitmap/BitmapFileIndexFactory.java:29): for a
    low-cardinality column the per-file distinct set decides =/IN/<>/
    NOT IN pruning exactly, no false positives. Files whose set exceeds
    BITMAP_MAX_VALUES record nothing (never pruned). One distributed
    pass per indexed column over the staged files."""
    if not cols:
        return {}
    df = spark.read.format(fmt).load(staging)
    out: dict[str, dict[str, list]] = {}
    for c in cols:
        if c not in df.columns:
            continue
        rows = (
            df.where(F.col(c).isNotNull())
            .groupBy(F.col("_metadata.file_path").alias("__f"))
            .agg(F.slice(F.collect_set(c), 1, BITMAP_MAX_VALUES + 1).alias("__vs"))
            .collect()
        )
        for r in rows:
            vals = r["__vs"]
            if len(vals) > BITMAP_MAX_VALUES:
                continue  # overflow: no index for this (file, col)
            path = urllib.parse.urlparse(r["__f"]).path or r["__f"]
            out.setdefault(path, {})[c] = sorted(vals, key=lambda v: (str(type(v)), v))
    return out


def literal_positions(
    spark: SparkSession, value: Any, ddl_type: str, m: int
) -> list[int]:
    """The K bloom positions of one literal. Hashing must agree bit-for-
    bit with the executor-side ``xxhash64(col, i)`` (output differs by
    physical type, so the literal is treated as the stored column's
    type). Common types hash in pure Python (xxh64.py, property-tested
    against Spark); anything else pays one tiny local Spark job."""
    from flink_table_store_spark.xxh64 import spark_xxhash64

    positions = []
    for i in range(K):
        h = spark_xxhash64([(value, ddl_type), (i, "int")])
        if h is None:
            return _literal_positions_via_spark(spark, value, ddl_type, m)
        positions.append(h % m)
    return positions


def _literal_positions_via_spark(
    spark: SparkSession, value: Any, ddl_type: str, m: int
) -> list[int]:
    schema = T.StructType([T.StructField("v", T._parse_datatype_string(ddl_type))])
    row = spark.createDataFrame([(value,)], schema)
    got = row.select(F.array(*_position_cols(F.col("v"), m)).alias("p")).head()
    return list(got.p)


def might_contain(bloom: dict[str, Any], positions: list[int]) -> bool:
    bits = base64.b64decode(bloom["bits"])
    return all(bits[p >> 3] & (1 << (p & 7)) for p in positions)


def attach_bloom_positions(spark: SparkSession, predicate, schema) -> None:
    """Walk a predicate tree and precompute bloom positions for =/IN
    leaves over indexed columns. Leaf.test consults them during manifest
    pruning. Positions depend on the bitset size m, so the per-literal
    annotation records the m it was computed for; files written under a
    different m are skipped (never wrongly pruned)."""
    from flink_table_store_spark import predicate as P

    cols = set(bloom_columns(schema.options))
    if not cols:
        return
    m = bloom_bits(schema.options)

    def walk(p) -> None:
        if isinstance(p, P.Leaf):
            if p.field in cols and p.op in ("=", "in"):
                try:
                    ddl = schema.field(p.field).type
                except KeyError:
                    return
                p.bloom_m = m
                p.bloom_positions = [
                    literal_positions(spark, v, ddl, m) for v in p.literals
                ]
        elif isinstance(p, (P.And, P.Or)):
            for child in p.children:
                walk(child)

    walk(predicate)
