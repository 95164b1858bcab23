"""Incremental full-text index: the fifth persistent-index family
(exact-fp, MinHash, SimHash, DSIR model, now the inverted index).
Postings are impact-style denormalized (term, key, tf, dl) rows in an
engine PK table bucketed by term; corpus stats fold into a 1-row
sum-aggregation table; searches bucket-prune to the query terms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.textindex import (
    create_text_index,
    create_text_search_index,
    get_text_search_index,
    search_text_index,
    text_search,
    update_text_search_index,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _docs(spark):
    return spark.read.parquet(DOCS).select("doc_id", "text")


@pytest.mark.slow
def test_incremental_matches_batch_build(spark, warehouse):
    """Two incremental folds must score BIT-IDENTICALLY to the one-shot
    batch index over the same corpus — the family's core contract."""
    docs = _docs(spark)
    t = warehouse.create_table(
        "db.fts_ref", docs.schema, ignore_if_exists=True
    )
    t.write(docs)
    create_text_index(spark, t.refresh(), "fts", "text", "doc_id")
    ref = text_search(spark, t, "fts", "vector join query", k=10).collect()

    idx = create_text_search_index(warehouse, "db.fts_inc")
    update_text_search_index(
        idx, docs.where(F.col("doc_id") % 2 == 0), commit_identifier="b0"
    )
    update_text_search_index(
        idx, docs.where(F.col("doc_id") % 2 == 1), commit_identifier="b1"
    )
    got = search_text_index(spark, idx, "vector join query", k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]


@pytest.mark.slow
def test_replay_is_noop_and_crash_self_heals(spark, warehouse):
    docs = _docs(spark).where(F.col("doc_id") < 50)
    idx = create_text_search_index(warehouse, "db.fts_replay")
    update_text_search_index(idx, docs, commit_identifier="b0")
    before = search_text_index(spark, idx, "vector query", k=5).collect()
    # full replay: both tables skip the identifier — nothing changes
    update_text_search_index(idx, docs, commit_identifier="b0")
    after = search_text_index(spark, idx, "vector query", k=5).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]
    st = idx["stats"].refresh().to_df(spark).head()
    assert st["n"] == docs.count()

    # crash remnant: postings landed for batch b1 but the stats delta
    # did not — re-running the SAME identifier skips the postings
    # commit and lands only the missing stats row
    more = _docs(spark).where(
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 80)
    )
    toks = more.select(
        F.col("doc_id").cast("bigint").alias("key"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("term"),
    )
    tf = toks.groupBy("key", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("key").agg(F.count(F.lit(1)).alias("dl"))
    idx["postings"].refresh().write(
        tf.join(dl, "key").select("term", "key", "tf", "dl"),
        commit_identifier="b1:p",
    )
    update_text_search_index(idx, more, commit_identifier="b1")
    st = idx["stats"].refresh().to_df(spark).head()
    assert st["n"] == 80
    # and the healed index equals a clean two-batch build
    clean = create_text_search_index(warehouse, "db.fts_clean")
    update_text_search_index(
        clean, _docs(spark).where(F.col("doc_id") < 80),
        commit_identifier="all",
    )
    a = search_text_index(spark, idx, "vector join", k=10).collect()
    b = search_text_index(spark, clean, "vector join", k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_search_bucket_prunes_to_query_terms(spark, warehouse):
    """The search scan must touch strictly fewer buckets than a full
    postings scan: IN over the full bucket key prunes at plan time."""
    from flink_table_store_spark import predicate as P

    docs = _docs(spark)
    idx = create_text_search_index(warehouse, "db.fts_prune", buckets=8)
    update_text_search_index(idx, docs, commit_identifier="b0")
    t = idx["postings"].refresh()
    total = len(t.read_builder().plan().entries)
    pruned = len(
        t.read_builder()
        .with_filter(P.isin("term", ["vector", "join", "query"]))
        .plan()
        .entries
    )
    assert 0 < pruned <= 3  # <= one bucket's files per distinct term
    assert pruned < total


def test_get_resolves_and_errors_are_loud(spark, warehouse):
    docs = _docs(spark).where(F.col("doc_id") < 10)
    create_text_search_index(warehouse, "db.fts_get")
    idx = get_text_search_index(warehouse, "db.fts_get")
    with pytest.raises(RuntimeError, match="empty"):
        search_text_index(spark, idx, "anything", k=3)
    update_text_search_index(idx, docs, commit_identifier="b0")
    with pytest.raises(ValueError, match="no tokens"):
        search_text_index(spark, idx, "!!!", k=3)
    assert search_text_index(spark, idx, "vector", k=3).count() <= 3


def test_tokenless_docs_contribute_nothing(spark, warehouse):
    idx = create_text_search_index(warehouse, "db.fts_empty")
    batch = spark.createDataFrame(
        [(1, "alpha beta"), (2, "!!!"), (3, None), (4, "beta gamma")],
        "doc_id bigint, text string",
    )
    update_text_search_index(idx, batch, commit_identifier="b0")
    st = idx["stats"].refresh().to_df(spark).head()
    assert st["n"] == 2  # docs 2 and 3 yield no tokens
    assert st["total_dl"] == 4
    got = search_text_index(spark, idx, "beta", k=5).collect()
    assert sorted(r["doc_id"] for r in got) == [1, 4]


@pytest.mark.slow
def test_text_index_and_extend_procedures(spark, warehouse):
    """The new index-maintenance surfaces are CALL-able: text index
    create/update/search procedures and extend_global_index."""
    from flink_table_store_spark.procedures import call

    docs = _docs(spark).where(F.col("doc_id") < 100)
    t = warehouse.create_table("db.pdocs", docs.schema)
    t.write(docs)

    call(spark, warehouse, "create_text_search_index", index="db.pfts")
    call(
        spark, warehouse, "update_text_search_index",
        index="db.pfts", from_table="db.pdocs", commit_identifier="b0",
    )
    hits = call(
        spark, warehouse, "search_text_index",
        index="db.pfts", query="vector join", k=5,
    )
    assert 0 < hits.count() <= 5

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    te = warehouse.create_table("db.pemb", emb.schema)
    te.write(emb.where(F.col("vec_id") < 300))
    call(
        spark, warehouse, "create_global_index",
        table="db.pemb", index_name="ivf", column="embedding",
        key_col="vec_id", n_cells=4,
    )
    te.refresh().write(emb.where(F.col("vec_id") >= 300))
    meta = call(
        spark, warehouse, "extend_global_index",
        table="db.pemb", index_name="ivf",
    )
    assert meta["snapshot_id"] == 2
