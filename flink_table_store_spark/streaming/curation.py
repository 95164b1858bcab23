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
and ORDER is what holds it up: the corpus commit (identifier-checked,
so replays are no-ops) happens BEFORE the index update. A crash between
the two replays the batch against an index that does not yet contain
it — same survivors, corpus write skipped by its identifier, index
write retried; the index's first-row merge engine makes that retry a
no-op. The reverse order would lose every survivor of a batch that
crashed after indexing (replay would see its own fingerprints and drop
everything).

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
    minhash_index=None,
    jaccard_threshold: float = 0.8,
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
    is both identifier-checked AND PK-idempotent."""
    from flink_table_store_spark.datapipe.incdedup import (
        dedup_against_index,
        dedup_exact_against_index,
    )
    from flink_table_store_spark.datapipe.quality_model import quality_filter
    from flink_table_store_spark.datapipe.text import fingerprint, token_count

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        kept = dedup_exact_against_index(
            spark, index_table, df,
            text_col=text_col, id_col=id_col, update_index=False,
        )
        if minhash_index is not None:
            corpus_text = corpus_table.refresh().to_df(spark).select(
                id_col, text_col
            )
            kept = dedup_against_index(
                spark, minhash_index, corpus_text, kept,
                text_col=text_col, id_col=id_col,
                jaccard_threshold=jaccard_threshold, update_index=False,
            )
        toks = token_count(text_col)
        kept = kept.where(toks >= min_tokens)
        if max_tokens is not None:
            kept = kept.where(toks <= max_tokens)
        if quality_model is not None:
            kept = quality_filter(
                kept, quality_model, quality_threshold, text_col, id_col
            )
        kept = kept.withColumn("n_tokens", token_count(text_col))
        # one deterministic pass per batch: the dedup probe, the corpus
        # write and the index write must all see the SAME survivor set
        # even if the lineage re-executes mid-batch
        try:
            kept = kept.localCheckpoint(eager=True)
        except Exception:
            pass
        # corpus FIRST (identifier-checked -> replay-safe), index second
        corpus_table.refresh().write(
            kept, commit_identifier=f"{sink_id}:{batch_id}"
        )
        index_table.refresh().write(
            kept.select(
                fingerprint(text_col).alias("fp"),
                F.col(id_col).cast("bigint").alias("doc_id"),
            ),
            commit_identifier=f"{sink_id}:idx:{batch_id}",
        )
        if minhash_index is not None:
            from flink_table_store_spark.datapipe.dedup import (
                banded_signatures,
            )

            sigs = banded_signatures(kept, text_col, id_col).select(
                F.col("__band").cast("int").alias("band"),
                F.col("__bh").alias("band_hash"),
                F.col("__id").cast("bigint").alias("doc_id"),
            )
            minhash_index.refresh().write(
                sigs, commit_identifier=f"{sink_id}:mh:{batch_id}"
            )

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
