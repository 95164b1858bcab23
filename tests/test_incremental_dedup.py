"""Incremental dedup against a persistent MinHash-LSH index
(datapipe.incdedup): the index is an engine PK table, probes are one
equi-join on (band, band_hash), existing docs always win, survivors'
signatures append idempotently."""

from __future__ import annotations

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


def test_index_maintenance_is_idempotent(spark, warehouse):
    corpus = _corpus(spark)
    idx = create_minhash_index(warehouse, "db.mh_idx3")
    index_minhash_batch(idx, corpus)
    index_minhash_batch(idx, corpus)  # retried batch: PK collapses
    assert idx.refresh().to_df(spark).count() == 20 * 16
