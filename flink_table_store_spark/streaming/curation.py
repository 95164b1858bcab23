"""Streaming corpus curation: the steady-state shape of corpus building.

A training corpus is not built once — it ingests a crawl feed forever.
This wires the pillar's batch operators into a Structured Streaming
``foreachBatch`` loop so each micro-batch is curated INLINE on the way
into the engine-managed corpus table:

    new docs ─▶ exact dedup vs the PERSISTENT fingerprint index
             ─▶ quality gate (word-count bounds, optionally the
                NB quality model's score threshold)
             ─▶ token accounting (n_tokens column)
             ─▶ exactly-once append to the corpus table

Exactly-once across failures is the composition's load-bearing wall,
and ORDER is what holds it up: corpus commit first (identifier-checked,
so replays are no-ops), then the MinHash signatures (when near-dup is
on), then the exact-fingerprint index LAST. The exact index is the one
that makes a replayed batch's survivor set empty, so it must land only
after every other sink is durable: a crash anywhere earlier replays
the batch against an exact index that does not yet contain it — same
survivors recomputed, already-committed sinks skipped by their
identifiers, the rest retried (first-row/PK merge engines make any
overlap a no-op). Writing the exact index any earlier would strand a
crash-window batch in the corpus with no LSH signatures, silently
blinding future near-dup detection against those documents.

Scale: per batch O(|batch|) fingerprinting + one anti-join against the
bucketed index + a narrow filter — nothing re-reads the corpus; the
quality model's weight table broadcasts.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curation_batch_writer(
    corpus_table,
    index_table,
    sink_id: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
    max_tokens: int | None = None,
    quality_model: dict | None = None,
    quality_threshold: float = 0.5,
    c4_opts: dict | None = None,
    dsir_model: dict | Callable[[], dict] | None = None,
    dsir_threshold: float = 0.0,
    novelty_index=None,
    novelty_threshold: float = 0.0,
    minhash_index=None,
    jaccard_threshold: float = 0.8,
    simhash_index=None,
    max_hamming: int = 3,
    text_index: dict | None = None,
    vector_index: str | None = None,
    stats_index=None,
    stats_domain_col: str = "lang",
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function curating each micro-batch into
    ``corpus_table`` (schema: the batch's columns + ``n_tokens``),
    deduplicating against — and maintaining — ``index_table`` (created
    via incdedup.create_exact_index). With ``minhash_index`` (created
    via incdedup.create_minhash_index) NEAR-duplicates are also dropped
    against the persistent LSH index — existing docs win, candidates
    verify with exact shingle Jaccard, and only the candidate corpus
    texts are ever read back (an id semi-join, never a corpus scan).
    The near-dup index write rides the same corpus-first ordering and
    is both identifier-checked AND PK-idempotent. ``simhash_index``
    (incdedup.create_simhash_index) adds the hamming-banded family the
    same way — its verification is bit math against signatures stored
    in the index, so it reads no corpus text at all; both near-dup
    families compose (minhash catches shingle overlap, simhash catches
    bag-of-words proximity).

    ``c4_opts`` (a kwargs dict for ``text.c4_clean``, ``{}`` for the
    defaults) runs C4 line cleaning BEFORE every other stage — it
    rewrites the text, so fingerprints, signatures and token counts
    must all see the cleaned form or replays and batch-mates would
    disagree on identity. ``dsir_model`` (from ``dsir.fit_dsir``) adds
    a DSIR gate keeping docs with importance log-ratio >=
    ``dsir_threshold`` — the streaming form of the paper's selection
    (a global top-k has no meaning mid-stream; a fixed threshold is
    what an online selector uses). Unscorable (no-gram) docs are
    dropped, matching ``dsir_resample``. Both are per-doc pure
    functions, so they commute with exact dedup and sit with the
    other gates ahead of the near-dup families. ``dsir_model`` may
    also be a ZERO-ARG CALLABLE returning the model — invoked once
    per micro-batch, so a loop that folds counts into a persistent
    ``dsir.create_dsir_index`` table can gate every batch with the
    freshest state (``lambda: model_from_index(spark, idx)``).

    ``text_index`` (from ``textindex.create_text_search_index``) adds
    the FIFTH exactly-once sink: each batch's survivors fold their
    postings into the persistent full-text index, so the corpus stays
    BM25-searchable with O(batch) incremental cost. It indexes only
    survivors (losers never pollute it), sees the C4-cleaned text like
    every other derived artifact, and lands after the corpus commit,
    before the exact-fp wall — a crash window replays into
    identifier-skips plus PK-idempotent postings, never double counts
    (the 1-row stats fold is identifier-guarded per table).

    ``vector_index`` (the name of a global index built on
    ``corpus_table`` via ``globalindex.create_global_index``) adds the
    SIXTH sink: after the corpus commit, ``extend_global_index`` folds
    the batch's vectors into the frozen quantizer's cells (the FAISS
    add() analogue), keeping ANN search cell-pruned instead of
    accumulating a brute-force staleness tail. Snapshot-keyed and
    seg-overwrite idempotent, so replays and crash windows self-heal;
    requires the batch schema to carry the indexed vector column.

    ``novelty_index`` (a ``dsir.create_dsir_index`` table) adds a
    keep-novel DIVERSITY gate: docs whose hashed-ngram novelty against
    the index state falls below ``novelty_threshold`` are dropped —
    more-of-the-same batches thin out automatically as the index
    absorbs the corpus. Novelty is judged against INDEX STATE only
    (batch-mates do not see each other — the gate stays a per-doc pure
    function, so ordering guarantees are untouched); fold survivors
    into the index (``update_dsir_index`` in your loop, or the same
    table doubling as the DSIR selection state) to advance the
    reference. Collisions only UNDERCOUNT novelty, so the gate errs
    toward keeping.

    ``stats_index`` (from ``sampling.create_corpus_stats_index``) adds
    the SEVENTH sink: survivors' per-``stats_domain_col`` (count,
    token-sum) deltas fold into the persistent totals table, so the
    mixture rules (``temperature_weights_from_totals`` /
    ``unimax_allocation_from_totals``) re-balance the corpus from
    O(domains) rows of state instead of ever re-scanning it."""
    from flink_table_store_spark.datapipe.incdedup import (
        dedup_against_index,
        dedup_exact_against_index,
        dedup_simhash_against_index,
    )
    from flink_table_store_spark.datapipe.quality_model import quality_filter
    from flink_table_store_spark.datapipe.text import fingerprint, token_count

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession

        # guide §1.5: label each phase's jobs so the UI (and any
        # profiler reading job descriptions) can attribute the batch's
        # wall-clock to gates / probes / commits. Thread-local, reset
        # at the end.
        def _label(phase: str) -> None:
            try:
                spark.sparkContext.setJobDescription(
                    f"curation[{sink_id}:{batch_id}] {phase}"
                )
            except Exception:
                pass

        _label("gates+exact-dedup probe")
        # gates FIRST, dedup second: filters commute with exact dedup
        # (identical text, identical gate outcome) but NOT with
        # near-dup dedup — deduping first would let a low-quality doc
        # suppress its batch-mate and then be filtered itself, losing
        # both and making the outcome depend on batch boundaries
        if c4_opts is not None:
            from flink_table_store_spark.datapipe.text import c4_clean

            df = c4_clean(df, text_col=text_col, **c4_opts).drop(
                "lines_kept", "lines_dropped"
            )
        toks = token_count(text_col)
        kept = df.where(toks >= min_tokens)
        if max_tokens is not None:
            kept = kept.where(toks <= max_tokens)
        if quality_model is not None:
            kept = quality_filter(
                kept, quality_model, quality_threshold, text_col, id_col
            )
        if novelty_index is not None:
            from flink_table_store_spark.datapipe.dsir import score_novelty

            nov_ok = (
                score_novelty(kept, novelty_index, text_col, id_col)
                # no-gram docs score NULL: an invisible doc is not
                # evidence of sameness — KEEP it (the gate errs toward
                # keeping; min_tokens is the gate for empty docs)
                .where(
                    F.col("novelty").isNull()
                    | (F.col("novelty") >= F.lit(float(novelty_threshold)))
                )
                .select(F.col(id_col))
            )
            kept = kept.join(nov_ok, id_col, "left_semi")
        if dsir_model is not None:
            from flink_table_store_spark.datapipe.dsir import score_dsir

            model = dsir_model() if callable(dsir_model) else dsir_model
            ok_ids = (
                score_dsir(kept, model, text_col, id_col)
                .where(F.col("dsir_logratio") >= F.lit(float(dsir_threshold)))
                .select(F.col(id_col))
            )
            kept = kept.join(ok_ids, id_col, "left_semi")
        kept = dedup_exact_against_index(
            spark, index_table, kept,
            text_col=text_col, id_col=id_col, update_index=False,
        )
        sigs = None
        if minhash_index is not None:
            _label("minhash near-dup probe+verify")
            corpus_text = corpus_table.refresh().to_df(spark).select(
                id_col, text_col
            )
            kept, banded = dedup_against_index(
                spark, minhash_index, corpus_text, kept,
                text_col=text_col, id_col=id_col,
                jaccard_threshold=jaccard_threshold, update_index=False,
                return_signatures=True,
            )
        sh_banded = None
        if simhash_index is not None:
            _label("simhash near-dup probe")
            kept, sh_banded = dedup_simhash_against_index(
                spark, simhash_index, kept,
                text_col=text_col, id_col=id_col,
                max_hamming=max_hamming, update_index=False,
                return_signatures=True,
            )
        _label("survivor pin")
        kept = kept.withColumn("n_tokens", token_count(text_col))
        # one deterministic pass per batch: the dedup probe, the corpus
        # write and the index writes must all see the SAME survivor set
        # even if the lineage re-executes mid-batch
        try:
            kept = kept.localCheckpoint(eager=True)
        except Exception:
            pass
        if minhash_index is not None:
            # reuse the probe's checkpointed signatures (no second
            # MinHash pass): survivors' rows only
            sigs = banded.join(
                kept.select(F.col(id_col).alias("__id")), "__id", "left_semi"
            ).select(
                F.col("__band").cast("int").alias("band"),
                F.col("__bh").alias("band_hash"),
                F.col("__id").cast("bigint").alias("doc_id"),
            )
        # Commit order is the exactly-once wall: corpus FIRST
        # (identifier-checked -> replays are no-ops), then the MINHASH
        # signatures, then the exact-fp index LAST. The exact index is
        # what makes a replayed batch's survivor set empty — so every
        # earlier commit must already be durable by the time it lands;
        # writing it before the mh index would strand a crash-window
        # batch in the corpus with no LSH signatures, silently blinding
        # all future near-dup detection against those docs.
        _label("corpus commit")
        corpus_table.refresh().write(
            kept, commit_identifier=f"{sink_id}:{batch_id}"
        )
        if vector_index is not None:
            from flink_table_store_spark.globalindex import (
                extend_global_index,
            )

            # snapshot-keyed: a replayed batch (identifier-skipped
            # corpus commit -> no new snapshot) makes this a no-op
            extend_global_index(spark, corpus_table.refresh(), vector_index)
        if sigs is not None:
            _label("minhash index commit")
            minhash_index.refresh().write(
                sigs, commit_identifier=f"{sink_id}:mh:{batch_id}"
            )
        if simhash_index is not None:
            # reuse the probe's banded signatures — survivors only
            sh_rows = sh_banded.join(
                kept.select(F.col(id_col).alias("__id")), "__id", "left_semi"
            ).select(
                F.col("__band").cast("int").alias("band"),
                F.col("__bv").alias("band_value"),
                F.col("__id").cast("bigint").alias("doc_id"),
                F.col("__sh").alias("sig"),
            )
            simhash_index.refresh().write(
                sh_rows, commit_identifier=f"{sink_id}:sh:{batch_id}"
            )
        if stats_index is not None:
            from flink_table_store_spark.datapipe.sampling import (
                update_corpus_stats_index,
            )

            update_corpus_stats_index(
                stats_index, kept,
                domain_col=stats_domain_col, token_col="n_tokens",
                commit_identifier=f"{sink_id}:st:{batch_id}",
            )
        if text_index is not None:
            from flink_table_store_spark.datapipe.textindex import (
                update_text_search_index,
            )

            update_text_search_index(
                text_index, kept,
                text_col=text_col, key_col=id_col,
                commit_identifier=f"{sink_id}:fts:{batch_id}",
            )
        _label("exact-fp index commit")
        index_table.refresh().write(
            kept.select(
                fingerprint(text_col).alias("fp"),
                F.col(id_col).cast("bigint").alias("doc_id"),
            ),
            commit_identifier=f"{sink_id}:idx:{batch_id}",
        )
        try:
            spark.sparkContext.setJobDescription(None)
        except Exception:
            pass

    return write_batch


def curate_stream(
    stream_df: DataFrame,
    corpus_table,
    index_table,
    sink_id: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    **kwargs,
):
    """Wire a streaming document feed through the curation loop.
    Structured Streaming owns offsets/retries; the identifier-checked
    commits make both sinks exactly-once."""
    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            curation_batch_writer(corpus_table, index_table, sink_id, **kwargs)
        )
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
