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


# ---------------------------------------------------------------------------
# incremental text index: the inverted index as engine-native table state
# ---------------------------------------------------------------------------
#
# The fifth persistent-index family (exact-fp, MinHash, SimHash, DSIR
# model, now the FULL-TEXT index): postings live in an engine
# PRIMARY-KEY table so index maintenance is an O(batch) append — no
# rebuild, no read-modify-write — and a search is one bucket-pruned
# scan of exactly the query terms' buckets.
#
# Two design moves that matter at 100 TB:
#
# 1. **Impact-style denormalized postings** ``(term, key, tf, dl)``:
#    the document length rides IN the posting row (it is fixed at index
#    time), so BM25 scoring needs NO join against a corpus-sized
#    doc-length table — query cost is O(sum of the query terms' posting
#    lists), full stop. Classic impact-ordered-index trade: ~8 bytes/row
#    of redundancy buys the elimination of the one corpus-sized join.
# 2. **O(1) corpus stats** as a 1-row sum-aggregation table
#    ``(id, n, total_dl)``: each batch folds its own (doc count, token
#    count) delta server-side via the aggregation merge engine —
#    n_docs/avgdl never require scanning anything.
#
# Document frequency per query term is exact from the pruned postings
# themselves (one grouped count over the already-pruned scan), so the
# search plan is: prune buckets by term → scan candidate postings →
# tiny df agg → pure column math. Exactly-once across crashes rides the
# same commit-identifier check as every other index family: each of the
# two tables independently skips a replayed identifier, so a crash
# between the postings commit and the stats commit self-heals on rerun.

TEXT_POSTINGS_DDL = "term string, key bigint, tf bigint, dl bigint"
TEXT_STATS_DDL = "id int, n bigint, total_dl bigint"


def create_text_search_index(
    catalog, name: str, *, buckets: int = 8
) -> dict:
    """Create the incremental full-text index: a postings PK table
    ``(term, key)`` bucketed by ``term`` (searches bucket-prune to the
    query terms) and a 1-row stats table under the sum-aggregation
    merge engine. Returns ``{"postings": Table, "stats": Table}``."""
    # ignore_if_exists: creation spans TWO tables — a crash between the
    # two commits must not wedge the index (re-create would refuse on
    # the half that landed while get refuses on the half that didn't)
    postings = catalog.create_table(
        name,
        TEXT_POSTINGS_DDL,
        primary_keys=["term", "key"],
        options={"bucket": str(buckets), "bucket-key": "term"},
        ignore_if_exists=True,
    )
    stats = catalog.create_table(
        f"{name}_stats",
        TEXT_STATS_DDL,
        primary_keys=["id"],
        options={
            "bucket": "1",
            "merge-engine": "aggregation",
            "fields.n.aggregate-function": "sum",
            "fields.total_dl.aggregate-function": "sum",
        },
        ignore_if_exists=True,
    )
    return {"postings": postings, "stats": stats}


def get_text_search_index(catalog, name: str) -> dict:
    """Resolve an existing incremental text index by name."""
    return {
        "postings": catalog.get_table(name),
        "stats": catalog.get_table(f"{name}_stats"),
    }


def update_text_search_index(
    index: dict,
    docs: DataFrame,
    *,
    text_col: str = "text",
    key_col: str = "doc_id",
    commit_identifier: str | None = None,
) -> None:
    """Fold one batch of NEW documents into the index: one tokenize +
    two batch-sized aggregates, then an O(batch-postings) append plus a
    1-row stats delta. Pass a ``commit_identifier`` from your ingestion
    loop for exactly-once folding — each table skips a replayed
    identifier independently, so a crash between the two commits
    re-runs into a no-op + the missing half.

    Documents must be new to the index (append-only corpus, the same
    contract as the dedup indexes); docs whose text yields no tokens
    contribute nothing, matching the batch build."""
    toks = docs.select(
        F.col(key_col).cast("bigint").alias("key"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("key", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("key").agg(F.count(F.lit(1)).alias("dl"))
    try:
        dl = dl.localCheckpoint(eager=True)
    except Exception:
        pass  # optimization only: feeds both the postings join and the stats delta
    rows = tf.join(dl, "key").select("term", "key", "tf", "dl")
    ci = commit_identifier or ""
    index["postings"].refresh().write(
        rows, commit_identifier=f"{ci}:p" if ci else ""
    )
    # the 1-row stats delta lands through the no-Spark writer (r11
    # optimization round, guide §1.2): the values collapse to two
    # scalars off the checkpointed dl, and a full Spark write job for
    # one row was pure scheduler overhead. Same table, same aggregation
    # merge engine, same identifier-checked exactly-once commit.
    d = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("total_dl"),
    ).collect()[0]
    import pyarrow as pa

    index["stats"].refresh().write_arrow(
        pa.table(
            {"id": [0], "n": [int(d["n"])], "total_dl": [int(d["total_dl"])]}
        ),
        commit_identifier=f"{ci}:s" if ci else "",
    )


def search_text_index(
    spark: SparkSession,
    index: dict,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    key_name: str = "doc_id",
) -> DataFrame:
    """BM25 top-k straight off the incremental index: ONE bucket-pruned
    scan of the query terms' postings (term IN (...) over the full
    bucket key prunes at plan time), a grouped count over those same
    pruned rows for exact per-term document frequency, corpus stats
    from the 1-row table, then pure column math — identical formula
    (and identical results, by the shared tokenizer) to the batch
    ``text_search``, so the same DuckDB oracle covers both paths."""
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("query has no tokens")
    # the 1-row stats table reads through the no-Spark path (r11
    # optimization round): same merge semantics (local reader parity is
    # pytest- and oracle-pinned), no Spark job for two scalars
    stt = index["stats"].refresh().to_arrow()
    st = stt.to_pylist()[0] if stt.num_rows else None
    if st is None or not st["n"]:
        raise RuntimeError("text index is empty — fold a batch first")
    n, avgdl = float(st["n"]), float(st["total_dl"]) / float(st["n"])
    from flink_table_store_spark import predicate as P

    # plan-time predicate: IN over the full bucket key prunes the scan
    # to the query terms' buckets before any file is opened
    postings = (
        index["postings"].refresh().read_builder()
        .with_filter(P.isin("term", terms))
        .to_df(spark)
    )
    try:
        postings = postings.localCheckpoint(eager=True)
    except Exception:
        pass  # optimization only: feeds both the df agg and the scoring pass
    termdf = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + F.lit(k1) * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        postings.join(F.broadcast(termdf), "term")
        .withColumn("__s", idf * tf_part)
        .groupBy("key")
        .agg(F.round(F.sum("__s"), 4).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("key").asc())
        .limit(k)
        .select(F.col("key").alias(key_name), "score")
    )


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
