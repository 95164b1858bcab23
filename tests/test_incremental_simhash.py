"""Incremental SimHash dedup: the third persistent-index family
(exact fp, MinHash-Jaccard, SimHash-hamming). Verification is pure bit
math against signatures stored IN the index — zero corpus reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.incdedup import (
    create_simhash_index,
    dedup_simhash_against_index,
)


def _doc(i, words):
    return (i, " ".join(words))


@pytest.mark.slow
def test_simhash_index_cross_and_intra_batch(spark, warehouse):
    idx = create_simhash_index(warehouse, "db.sh_idx")
    base_words = [f"w{j}" for j in range(40)]
    batch0 = spark.createDataFrame(
        [
            _doc(1, base_words),
            _doc(2, [f"other{j}" for j in range(40)]),
        ],
        "doc_id bigint, text string",
    )
    kept0 = dedup_simhash_against_index(spark, idx, batch0)
    assert sorted(r["doc_id"] for r in kept0.collect()) == [1, 2]
    assert idx.refresh().to_df(spark).select("doc_id").distinct().count() == 2

    # batch 1: an exact copy of doc 1 (hamming 0), a near-dup of doc 1
    # (2 of 40 words changed -> a few signature bits flip), an exact
    # fresh doc + its intra-batch copy, and a genuinely fresh doc
    near = list(base_words)
    near[5], near[17] = "changed5", "changed17"
    fresh = [f"fresh{j}" for j in range(40)]
    batch1 = spark.createDataFrame(
        [
            _doc(10, base_words),     # exact dup of committed doc 1
            _doc(11, near),           # near-dup of doc 1
            _doc(12, fresh),          # new
            _doc(13, fresh),          # intra-batch dup of 12
        ],
        "doc_id bigint, text string",
    )
    kept1 = dedup_simhash_against_index(spark, idx, batch1)
    ids = sorted(r["doc_id"] for r in kept1.collect())
    assert 10 not in ids and 13 not in ids  # exact dups die
    assert 12 in ids
    # doc 11's fate depends on signature hamming; with 38/40 shared
    # words it must be <= 3 bits away w.h.p. — assert it was dropped,
    # which pins the near-dup path end-to-end for this fixed data
    assert ids == [12]
    # index never holds losers
    assert (
        idx.refresh().to_df(spark).select("doc_id").distinct().count() == 3
    )


@pytest.mark.slow
def test_simhash_index_existing_wins_and_idempotent(spark, warehouse):
    idx = create_simhash_index(warehouse, "db.sh_idx2")
    words = [f"t{j}" for j in range(30)]
    first = spark.createDataFrame(
        [_doc(100, words)], "doc_id bigint, text string"
    )
    dedup_simhash_against_index(spark, idx, first)
    # a LOWER-id exact dup arrives later: existing still wins
    later = spark.createDataFrame(
        [_doc(5, words)], "doc_id bigint, text string"
    )
    kept = dedup_simhash_against_index(spark, idx, later)
    assert kept.count() == 0
    # replaying the first batch is a no-op (PK idempotency)
    dedup_simhash_against_index(spark, idx, first)
    assert (
        idx.refresh().to_df(spark).select("doc_id").distinct().count() == 1
    )


@pytest.mark.slow
def test_simhash_index_parity_with_batch_dedup(spark, warehouse):
    """One-shot index build over a corpus == the batch simhash_dedup
    survivors (same bands/hamming), the semantic the index mirrors."""
    from flink_table_store_spark.datapipe.dedup import simhash_dedup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    idx = create_simhash_index(warehouse, "db.sh_idx3")
    kept_inc = dedup_simhash_against_index(spark, idx, docs)
    kept_batch = simhash_dedup(docs)
    a = sorted(r["doc_id"] for r in kept_inc.collect())
    b = sorted(r["doc_id"] for r in kept_batch.select("doc_id").collect())
    assert a == b
