"""Incremental corpus dedup against a PERSISTENT MinHash-LSH index.

Batch near-dup removal (``datapipe.dedup.minhash_dedup``) re-hashes the
whole corpus every run — at 100 TB that is the dominant cost, and it is
pure waste when yesterday's corpus is already deduped and only today's
crawl is new. The production pattern (Lee et al. 2022 deployments;
CCNet/Dolma pipelines) keeps the banded signatures in a persistent
index and processes ONLY the new batch:

1. the index is an engine PRIMARY-KEY table keyed
   ``(band, band_hash, doc_id)`` and bucketed by ``band_hash`` — the
   PK makes index maintenance IDEMPOTENT (re-running a failed batch
   re-inserts the same rows into the same buckets, the merge engine
   collapses them), and the bucket layout co-locates probe joins;
2. a new batch computes its banded signatures (the same
   ``banded_signatures`` the batch path uses), probes the index with
   one equi-join on ``(band, band_hash)``, and self-joins for
   intra-batch candidates;
3. candidates are verified with exact shingle Jaccard (same verifier
   as the batch path; LSH false positives die here, so index collisions
   can only cost time, never correctness);
4. existing documents ALWAYS win: a new doc matching the corpus is
   dropped; within the batch the smallest id wins (the batch path's
   rule);
5. survivors' signatures append to the index — losers never pollute it.

Scale: the per-batch cost is O(|batch|) hashing + one shuffle of the
batch's bands against the (bucketed) index + O(|candidates|)
verification. Nothing ever re-reads or re-hashes the existing corpus
except the O(|candidate|) text lookups for verification. The index
holds ``bands`` longs per document — ~128 bytes/doc at the defaults,
three orders of magnitude smaller than a text corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.dedup import (
    banded_signatures,
    ngram_jaccard_pairs,
)

INDEX_DDL = "band int, band_hash bigint, doc_id bigint"
INDEX_OPTIONS = {
    "bucket": "4",
    "bucket-key": "band_hash",
    # deduplicate merge engine: re-inserting the same (band, hash, id)
    # rows (a retried batch) is a no-op after merge
}


def create_minhash_index(catalog, name: str, *, buckets: int = 4):
    """Create the index table: PK (band, band_hash, doc_id), bucketed
    by band_hash so probe joins and point maintenance stay co-located."""
    opts = dict(INDEX_OPTIONS)
    opts["bucket"] = str(buckets)
    return catalog.create_table(
        name,
        INDEX_DDL,
        primary_keys=["band", "band_hash", "doc_id"],
        options=opts,
    )


def index_minhash_batch(
    index,
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
):
    """Append a (deduped) batch's banded signatures to the index.
    Idempotent: the PK collapses re-inserted rows."""
    rows = banded_signatures(
        docs, text_col, id_col, num_hashes, bands, shingle_k
    ).select(
        F.col("__band").cast("int").alias("band"),
        F.col("__bh").alias("band_hash"),
        F.col("__id").cast("bigint").alias("doc_id"),
    )
    return index.refresh().write(rows)


def dedup_against_index(
    spark: SparkSession,
    index,
    corpus_text: DataFrame,
    new_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    update_index: bool = True,
    return_signatures: bool = False,
) -> DataFrame:
    """Dedup ``new_docs`` against the indexed corpus AND within itself;
    returns the kept rows of ``new_docs`` (schema unchanged). The LSH
    parameters MUST match the ones the index was built with.

    ``corpus_text`` supplies (id_col, text_col) for candidate
    verification only — it is touched exclusively through an id join on
    the candidate set, never scanned for hashing.

    ``return_signatures=True`` returns ``(kept, banded)`` — the
    checkpointed banded signatures of the WHOLE batch — so a caller
    that defers the index write (e.g. the streaming curation loop,
    which must commit the corpus first) can reuse them instead of
    paying a second MinHash pass over the batch text.
    """
    banded = banded_signatures(
        new_docs, text_col, id_col, num_hashes, bands, shingle_k
    )
    try:
        banded = banded.localCheckpoint(eager=True)
    except Exception:
        pass  # optimization only: feeds the probe, the self-join and the update
    idx = index.refresh().to_df(spark)
    # 1) corpus candidates: existing doc always wins -> (old, new)
    probe = banded.join(
        idx,
        (banded["__band"] == idx["band"]) & (banded["__bh"] == idx["band_hash"]),
    ).where(banded["__id"] != idx["doc_id"])
    corpus_cand = probe.select(
        idx["doc_id"].alias("id_a"), banded["__id"].alias("id_b")
    ).distinct()
    try:
        # the corpus-candidate set feeds the verification texts (via
        # hit_ids — once, now that the verifier pins its restricted
        # shingle table) and the candidate union; unpinned, each
        # consumer re-runs the index probe INCLUDING the index table's
        # merge-on-read fold. Pinned, the index is merged once per
        # batch (r11 optimization round; consumer count revised r12).
        corpus_cand = corpus_cand.localCheckpoint(eager=True)
    except Exception:
        pass
    # 2) intra-batch candidates: smallest id wins (the batch path rule)
    a, b = banded.alias("a"), banded.alias("b")
    batch_cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bh") == F.col("b.__bh"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    # verification text: the batch plus ONLY the corpus docs that were
    # hit by a candidate (an id semi-join, not a corpus scan)
    hit_ids = corpus_cand.select(F.col("id_a").alias(id_col)).distinct()
    texts = new_docs.select(id_col, text_col).unionByName(
        corpus_text.select(id_col, text_col).join(hit_ids, id_col, "left_semi")
    )
    cands = corpus_cand.unionByName(batch_cand).distinct()
    verified = ngram_jaccard_pairs(
        texts, cands, text_col, id_col, shingle_k, jaccard_threshold
    )
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    kept = new_docs.join(losers, on=id_col, how="left_anti")
    if update_index:
        # the checkpointed banded signatures feed the update too — an
        # anti-join against the losers, never a second hashing pass
        # over the batch's text
        kept_rows = banded.join(
            losers.select(F.col(id_col).alias("__id")), "__id", "left_anti"
        ).select(
            F.col("__band").cast("int").alias("band"),
            F.col("__bh").alias("band_hash"),
            F.col("__id").cast("bigint").alias("doc_id"),
        )
        index.refresh().write(kept_rows)
    if return_signatures:
        return kept, banded
    return kept


EXACT_INDEX_DDL = "fp bigint, doc_id bigint"


def create_exact_index(catalog, name: str, *, buckets: int = 4):
    """Exact-dedup index: PK (fp) under the FIRST-ROW merge engine —
    the first document ever indexed with a fingerprint owns it, so
    "existing wins" is the table's own merge semantics and re-indexing
    a retried batch is a no-op."""
    return catalog.create_table(
        name,
        EXACT_INDEX_DDL,
        primary_keys=["fp"],
        options={"bucket": str(buckets), "merge-engine": "first-row"},
    )


def dedup_exact_against_index(
    spark: SparkSession,
    index,
    new_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    update_index: bool = True,
) -> DataFrame:
    """Exact dedup of ``new_docs`` against the fingerprint index AND
    within the batch (min id wins); returns the kept rows. One
    fingerprint projection + one anti-join probe + one window — the
    O(batch) steady state of exact corpus dedup."""

    from flink_table_store_spark.datapipe.text import fingerprint

    fps = new_docs.withColumn("__fp", fingerprint(text_col))
    try:
        fps = fps.localCheckpoint(eager=True)
    except Exception:
        pass  # feeds the probe, the intra-batch agg and the update
    idx = index.refresh().to_df(spark).select(F.col("fp").alias("__fp"))
    survivors = fps.join(idx, "__fp", "left_anti")
    # min_by per fingerprint instead of a row_number window (r11
    # optimization round, guide §2.3 — map-side combine; same winner,
    # min id is unique per fingerprint)
    kept = (
        survivors.groupBy("__fp")
        .agg(
            F.min_by(
                F.struct(*[F.col(c) for c in new_docs.columns]),
                F.col(id_col),
            ).alias("__w")
        )
        .select(
            "__fp", *[F.col(f"__w.{c}").alias(c) for c in new_docs.columns]
        )
    )
    if update_index:
        index.refresh().write(
            kept.select(
                F.col("__fp").alias("fp"),
                F.col(id_col).cast("bigint").alias("doc_id"),
            )
        )
    return kept.drop("__fp")


SIMHASH_INDEX_DDL = "band int, band_value bigint, doc_id bigint, sig bigint"


def create_simhash_index(catalog, name: str, *, buckets: int = 4):
    """Incremental SimHash index: PK (band, band_value, doc_id)
    bucketed by band_value, the banded-hamming analogue of the MinHash
    index. The full 64-bit signature rides in every row, so candidate
    VERIFICATION is pure bit math against the index — unlike the
    MinHash path, no corpus text is ever read back."""
    return catalog.create_table(
        name,
        SIMHASH_INDEX_DDL,
        primary_keys=["band", "band_value", "doc_id"],
        options={"bucket": str(buckets), "bucket-key": "band_value"},
    )


def _simhash_banded(sig: DataFrame, bands: int = 4, n_bits: int = 64):
    width = n_bits // bands
    mask = (1 << width) - 1
    return sig.select(
        "__id",
        "__sh",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("__band"),
    ).withColumn(
        "__bv", F.expr(f"shiftrightunsigned(__sh, __band * {width}) & {mask}")
    )


def dedup_simhash_against_index(
    spark: SparkSession,
    index,
    new_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
    update_index: bool = True,
    return_signatures: bool = False,
) -> DataFrame:
    """SimHash near-dup removal of ``new_docs`` against the persistent
    index AND within the batch. ``return_signatures=True`` returns
    ``(kept, banded)`` for callers that defer the index write (the
    streaming curation loop) — no second SimHash pass. Existing docs always win; within the
    batch the smallest id wins. Candidate generation is EXACT by
    pigeonhole (hamming ≤ bands-1 guarantees a shared band), and
    verification is ``bit_count(a ^ b) ≤ max_hamming`` straight against
    the signatures stored in the index — O(batch) hashing, zero corpus
    reads. Idempotent index maintenance via the PK, as the MinHash
    path."""
    from flink_table_store_spark.datapipe.dedup import (
        simhash_candidate_pairs,
        simhash_signatures,
    )

    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs at least {max_hamming + 1} "
            f"bands (got bands={bands}): the corpus probe joins on a "
            "shared band, which pigeonhole only guarantees for hamming "
            "<= bands-1; a larger radius silently loses recall"
        )
    sig = simhash_signatures(new_docs, text_col, id_col)
    try:
        sig = sig.localCheckpoint(eager=True)
    except Exception:
        pass
    banded = _simhash_banded(sig, bands)
    idx = index.refresh().to_df(spark)
    probe = banded.join(
        idx,
        (banded["__band"] == idx["band"])
        & (banded["__bv"] == idx["band_value"]),
    ).where(banded["__id"] != idx["doc_id"])
    corpus_losers = (
        probe.where(
            F.bit_count(banded["__sh"].bitwiseXOR(idx["sig"]))
            <= F.lit(int(max_hamming))
        )
        .select(banded["__id"].alias(id_col))
        .distinct()
    )
    batch_pairs = simhash_candidate_pairs(
        sig, bands=bands, max_hamming=max_hamming
    )
    batch_losers = batch_pairs.select(
        F.col("id_b").alias(id_col)
    ).distinct()
    losers = corpus_losers.unionByName(batch_losers).distinct()
    kept = new_docs.join(losers, id_col, "left_anti")
    if update_index:
        rows = (
            banded.join(
                losers.select(F.col(id_col).alias("__id")), "__id", "left_anti"
            )
            .select(
                F.col("__band").cast("int").alias("band"),
                F.col("__bv").alias("band_value"),
                F.col("__id").cast("bigint").alias("doc_id"),
                F.col("__sh").alias("sig"),
            )
        )
        index.refresh().write(rows)
    if return_signatures:
        return kept, banded
    return kept
