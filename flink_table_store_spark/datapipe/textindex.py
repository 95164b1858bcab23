"""Full-text inverted index + BM25 search over managed tables.

The training-data-pipeline counterpart of the reference's Lucene-backed
global indexes (paimon-lucene/.../index/LuceneVectorGlobalIndexer.java is
vector-only; the inverted-index half is the classic Lucene core the
reference leans on for text). Spark-first shape:

- **build**: one distributed job tokenizes the indexed column
  (lowercase, split on non-alphanumeric — replicable in ANSI SQL so the
  correctness oracle can follow), computes per-(doc, term) term
  frequencies, and writes three artifacts under the table's index dir:
  posting lists parquet partitioned by ``tbucket = xxhash64(term) mod
  n_buckets`` (so a query's terms prune to a few directories), a per-doc
  length table, and a per-term document-frequency summary.
- **search**: query terms hash to their buckets driver-side (the same
  pure-Python xxh64 the bloom index uses), the posting scan is
  partition-pruned + predicate-pushed to those buckets/terms, and BM25
  scoring is pure built-in column math — no Python in the hot path.

At 100 TB: postings are a slim (key, term, tf) projection, the scan per
query touches |terms| buckets, and scoring joins only candidate rows.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_table_store_spark.xxh64 import spark_xxhash64

TOKEN_SEP = "[^a-z0-9]+"
_INDEX_DIR = "index"


def _meta_path(table_path: str, name: str) -> str:
    return os.path.join(table_path, _INDEX_DIR, f"text-{name}.json")


def _dir(table_path: str, name: str, part: str) -> str:
    return os.path.join(table_path, _INDEX_DIR, f"text-{name}", part)


def _tokens(col):
    return F.filter(F.split(F.lower(col), TOKEN_SEP), lambda t: t != F.lit(""))


def create_text_index(
    spark: SparkSession,
    table,
    index_name: str,
    column: str,
    key_col: str,
    n_buckets: int = 64,
) -> dict:
    """Build (replace) the inverted index for the table's latest
    snapshot: postings (bucketed by term hash), doc lengths, term
    document frequencies, plus corpus stats in the meta JSON."""
    snap = table.snapshots.latest()
    if snap is None:
        raise RuntimeError("table has no snapshot to index")
    df = table.to_df(spark).select(
        F.col(key_col).alias("key"), F.col(column).alias("__text")
    )
    toks = df.select("key", F.explode(_tokens(F.col("__text"))).alias("term"))
    postings = (
        toks.groupBy("key", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "tbucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
    )
    doclen = toks.groupBy("key").agg(F.count(F.lit(1)).alias("dl"))
    termdf = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn(
            "tbucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
    )

    root = os.path.join(table.path, _INDEX_DIR, f"text-{index_name}")
    shutil.rmtree(root, ignore_errors=True)
    postings.write.partitionBy("tbucket").parquet(_dir(table.path, index_name, "postings"))
    doclen.write.parquet(_dir(table.path, index_name, "doclen"))
    termdf.write.partitionBy("tbucket").parquet(_dir(table.path, index_name, "termdf"))

    stats = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).head()
    meta = {
        "name": index_name,
        "type": "text",
        "column": column,
        "key": key_col,
        "n_buckets": n_buckets,
        "snapshot_id": snap.id,
        "n_docs": stats["n"],
        "avgdl": float(stats["avgdl"] or 0.0),
    }
    os.makedirs(os.path.dirname(_meta_path(table.path, index_name)), exist_ok=True)
    with open(_meta_path(table.path, index_name), "w") as f:
        json.dump(meta, f)
    return meta


def tokenize_query(query: str) -> list[str]:
    import re

    return sorted({t for t in re.split("[^a-z0-9]+", query.lower()) if t})


def text_search(
    spark: SparkSession,
    table,
    index_name: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over the inverted index. Deterministic tie-break on
    key; the score formula is plain column math replicated 1:1 by the
    DuckDB correctness oracle (queries.TEXT_SEARCH_SQL)."""
    with open(_meta_path(table.path, index_name)) as f:
        meta = json.load(f)
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("query has no tokens")
    buckets = sorted(
        {spark_xxhash64([(t, "string")]) % meta["n_buckets"] for t in terms}
    )
    postings = (
        spark.read.parquet(_dir(table.path, index_name, "postings"))
        .where(F.col("tbucket").isin(buckets) & F.col("term").isin(terms))
    )
    termdf = (
        spark.read.parquet(_dir(table.path, index_name, "termdf"))
        .where(F.col("tbucket").isin(buckets) & F.col("term").isin(terms))
        .select("term", "df")
    )
    doclen = spark.read.parquet(_dir(table.path, index_name, "doclen"))

    n, avgdl = float(meta["n_docs"]), meta["avgdl"]
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + F.lit(k1) * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        postings.join(F.broadcast(termdf), "term")
        .join(doclen, "key")
        .withColumn("__s", idf * tf_part)
        .groupBy("key")
        .agg(F.round(F.sum("__s"), 4).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("key").asc())
        .limit(k)
        .select(F.col("key").alias(meta["key"]), "score")
    )
