"""Streaming sink: exactly-once foreachBatch commits (SURVEY §2.9 T10).

The reference achieves exactly-once with a two-phase committer operator
driven by Flink checkpoints (paimon-flink sink/CommitterOperator.java).
Spark-native equivalent: ``writeStream.foreachBatch`` where each batch
commit carries a ``commit_identifier = f"{sink_id}:{batch_id}"``; the
committer (commit.py) skips identifiers it has already committed, so
batch replays after failure are idempotent — the same trick as Delta's
txn versioning, and the same identifier field Paimon snapshots carry
(Snapshot.java ``commitIdentifier``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def foreach_batch_writer(
    table,
    sink_id: str,
    row_kind_col: str | None = None,
    watermark_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function committing each micro-batch once.

    ``watermark_col``: max of this event-time column is persisted into
    the snapshot's ``watermark`` field (T7 watermark persistence) —
    enabling ``VERSION AS OF watermark`` reads downstream.
    """

    # streaming partition mark-done (PartitionMarkDoneListener.java):
    # active when partition.idle-time-to-done is set on a partitioned
    # table; each commit notifies its partitions, then idle ones are
    # marked done via the configured actions
    trigger = None
    if table.schema.partition_keys and table.schema.options.get(
        "partition.idle-time-to-done"
    ):
        from flink_table_store_spark.markdone import PartitionMarkDoneTrigger

        trigger = PartitionMarkDoneTrigger(table, sink_id)
    watermark_mode = (
        table.schema.options.get("partition.mark-done-action.mode") == "watermark"
    )

    def write_batch(df: DataFrame, batch_id: int) -> None:
        wm = None
        if watermark_col is not None:
            from pyspark.sql import functions as F

            row = df.agg(F.max(F.col(watermark_col).cast("long") * 1000).alias("wm")).collect()[0]
            wm = row.wm
        snap = table.write(
            df,
            row_kind_col=row_kind_col,
            commit_identifier=f"{sink_id}:{batch_id}",
            watermark=wm,
        )
        if trigger is not None and snap is not None:
            from flink_table_store_spark import markdone

            for part in markdone.partitions_of_snapshot(table, snap):
                trigger.notify(part)
            done = trigger.done_partitions(
                watermark=wm if watermark_mode else None
            )
            if done:
                markdone.mark_done(table, done)
            trigger.snapshot_state()

    return write_batch


def write_stream(
    stream_df: DataFrame,
    table,
    sink_id: str,
    checkpoint_dir: str,
    row_kind_col: str | None = None,
    watermark_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Wire a streaming DataFrame into the table: Structured Streaming
    handles offsets/retries; the identifier-checked commit makes the
    write side effect exactly-once."""
    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(foreach_batch_writer(table, sink_id, row_kind_col, watermark_col))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
