"""Incremental dedup against a persistent MinHash-LSH index
(datapipe.incdedup): the index is an engine PK table, probes are one
equi-join on (band, band_hash), existing docs always win, survivors'
signatures append idempotently."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.incdedup import (
    create_minhash_index,
    dedup_against_index,
    index_minhash_batch,
)

DDL = "doc_id bigint, text string"


def _corpus(spark):
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(20)
    ]
    return spark.createDataFrame(rows, DDL)


def _reversed_text(df):
    return df.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text"),
    )


@pytest.mark.slow
def test_probe_and_update(spark, warehouse):
    corpus = _corpus(spark)
    idx = create_minhash_index(warehouse, "db.mh_idx")
    index_minhash_batch(idx, corpus)
    n0 = idx.refresh().to_df(spark).count()
    assert n0 == 20 * 16  # one row per (doc, band)

    # batch: 5 exact corpus dups, 5 fresh (reversed word order ->
    # disjoint shingles), 1 intra-batch dup of a fresh doc
    dups = corpus.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    fresh = _reversed_text(corpus.where(F.col("doc_id") % 4 == 1))
    intra = fresh.where(F.col("doc_id") == 2_000_001).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    batch = dups.unionByName(fresh).unionByName(intra)
    kept = dedup_against_index(spark, idx, corpus, batch)
    kept_ids = sorted(r.doc_id for r in kept.collect())
    assert kept_ids == [2_000_001, 2_000_005, 2_000_009, 2_000_013, 2_000_017]
    # only survivors' signatures landed
    n1 = idx.refresh().to_df(spark).count()
    assert n1 == n0 + 5 * 16

    # retried batch: the probe excludes a doc's own index entry, so the
    # SAME batch reproduces the SAME kept rows; the PK keeps the index
    # unchanged — end-to-end idempotency
    kept2 = dedup_against_index(spark, idx, corpus.unionByName(fresh), batch)
    assert sorted(r.doc_id for r in kept2.collect()) == kept_ids
    assert idx.refresh().to_df(spark).count() == n1

    # a LATER batch re-shipping a previously-kept doc under a NEW id is
    # a dup of the now-indexed corpus
    rebatch = fresh.where(F.col("doc_id") == 2_000_001).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
    )
    kept3 = dedup_against_index(
        spark, idx, corpus.unionByName(fresh), rebatch
    )
    assert kept3.count() == 0
    assert idx.refresh().to_df(spark).count() == n1


@pytest.mark.slow
def test_matches_batch_dedup(spark, warehouse):
    """Incremental (index A, probe B) keeps exactly the B-side
    survivors the one-shot batch dedup of A union B keeps, when ids
    order old-before-new (both rules then say 'smallest id wins')."""
    from flink_table_store_spark.datapipe.dedup import minhash_dedup

    corpus = _corpus(spark)
    dups = corpus.where(F.col("doc_id") % 5 == 2).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    fresh = _reversed_text(corpus.where(F.col("doc_id") % 5 == 3))
    batch = dups.unionByName(fresh)

    idx = create_minhash_index(warehouse, "db.mh_idx2")
    index_minhash_batch(idx, corpus)
    inc_kept = sorted(
        r.doc_id
        for r in dedup_against_index(
            spark, idx, corpus, batch, update_index=False
        ).collect()
    )
    batch_kept = sorted(
        r.doc_id
        for r in minhash_dedup(corpus.unionByName(batch)).collect()
        if r.doc_id >= 1_000_000
    )
    assert inc_kept == batch_kept


@pytest.mark.slow
def test_index_maintenance_is_idempotent(spark, warehouse):
    corpus = _corpus(spark)
    idx = create_minhash_index(warehouse, "db.mh_idx3")
    index_minhash_batch(idx, corpus)
    index_minhash_batch(idx, corpus)  # retried batch: PK collapses
    assert idx.refresh().to_df(spark).count() == 20 * 16


@pytest.mark.slow
def test_exact_index_first_row_engine(spark, warehouse):
    """Incremental EXACT dedup: the fingerprint index is a first-row
    PK table, so 'existing wins' and retry idempotency are the merge
    engine itself."""
    from flink_table_store_spark.datapipe.incdedup import (
        create_exact_index,
        dedup_exact_against_index,
    )

    corpus = _corpus(spark)
    idx = create_exact_index(warehouse, "db.fp_idx")
    kept0 = dedup_exact_against_index(spark, idx, corpus)
    assert kept0.count() == 20
    # batch: 3 exact dups of the corpus (+1M), 2 fresh (reversed),
    # and an intra-batch duplicate pair (min id wins)
    dups = corpus.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    fresh = _reversed_text(corpus.where(F.col("doc_id").isin(3, 5)))
    pair = fresh.where(F.col("doc_id") == 2_000_003).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    batch = dups.unionByName(fresh).unionByName(pair)
    kept = dedup_exact_against_index(spark, idx, batch)
    assert sorted(r.doc_id for r in kept.collect()) == [2_000_003, 2_000_005]
    # retried batch reproduces the output; first-row keeps the index stable
    kept2 = dedup_exact_against_index(spark, idx, batch)
    assert kept2.count() == 0  # now indexed: everything is a dup
    owners = {r.doc_id for r in idx.refresh().to_df(spark).collect()}
    assert 2_000_003 in owners and 3_000_003 not in owners
