"""Streaming source: snapshot-cursor incremental scans (SURVEY §2.9).

Mirrors the reference continuous planning loop — first plan by startup
mode, then per-snapshot delta follow-up (DataTableStreamScan.java:
126-174 ``tryFirstPlan``/``nextPlan``; startup modes CoreOptions.java:
3394-3461; Spark micro-batch equivalent PaimonMicroBatchStream.scala:
33-78 where the offset is the snapshot id). Consumer-ids
(ConsumerManager.java:44-70) persist the cursor so a restarted reader
resumes and snapshot expiry can respect active consumers.

The Spark-native execution shape: each batch is a *DataFrame over the
delta files of one snapshot* — planning is driver-side metadata work,
reading is the ordinary distributed parquet scan. Works identically
under ``foreachBatch`` / ``Trigger.AvailableNow`` loops.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from flink_table_store_spark import read as read_mod
from flink_table_store_spark.snapshot import COMMIT_COMPACT

STARTUP_MODES = (
    "latest-full",  # first batch = full table, then deltas (default)
    "latest",       # only snapshots committed after the stream starts
    "compacted-full",  # full read from the latest COMPACT snapshot, then deltas
    "from-snapshot",   # deltas starting at a given snapshot id
    "from-snapshot-full",  # full read AT the snapshot, then deltas
    "from-timestamp",  # deltas starting after a commit timestamp
)


class SnapshotStream:
    """Incremental reader over a table's snapshot log.

    ``poll(spark)`` returns the unconsumed batches — list of
    ``(snapshot_id, DataFrame)`` — and advances the cursor. With a
    ``consumer_id`` the cursor is durable (resume after restart).
    """

    def __init__(
        self,
        table,
        startup_mode: str = "latest-full",
        from_snapshot: int | None = None,
        from_timestamp: int | None = None,
        consumer_id: str | None = None,
    ):
        if startup_mode not in STARTUP_MODES:
            raise ValueError(f"unknown startup mode {startup_mode}")
        self.table = table
        self.mode = startup_mode
        self.from_snapshot = from_snapshot
        self.from_timestamp = from_timestamp
        self.consumer_id = consumer_id
        self._next: int | None = None  # next snapshot id to read
        self._first_full: int | None = None  # snapshot to full-scan first

    # --- startup resolution (StartingScanner variants) ---

    def _resolve_start(self) -> None:
        sm = self.table.snapshots
        if self.consumer_id is not None:
            resumed = sm.read_consumer(self.consumer_id)
            if resumed is not None:
                self._next = resumed
                return
        latest = sm.latest_id() or 0
        if self.mode == "latest-full":
            self._first_full = latest if latest else None
            self._next = latest + 1
        elif self.mode == "latest":
            self._next = latest + 1
        elif self.mode == "compacted-full":
            cid = None
            for sid in sm.snapshot_ids():
                if sm.load(sid).commit_kind == COMMIT_COMPACT:
                    cid = sid
            self._first_full = cid if cid is not None else (latest or None)
            self._next = (cid if cid is not None else latest) + 1
        elif self.mode == "from-snapshot":
            self._next = int(self.from_snapshot)
        elif self.mode == "from-snapshot-full":
            self._first_full = int(self.from_snapshot)
            self._next = int(self.from_snapshot) + 1
        elif self.mode == "from-timestamp":
            snap = sm.for_timestamp(int(self.from_timestamp))
            self._next = (snap.id if snap else 0) + 1

    def _delta_df(self, spark: SparkSession, snapshot_id: int) -> DataFrame | None:
        """One snapshot's delta as a DataFrame (DeltaFollowUpScanner:
        skip COMPACT snapshots — they move rows, add none)."""
        t = self.table
        s = t.snapshots.load(snapshot_id)
        if s.commit_kind == COMMIT_COMPACT:
            return None
        entries = t.delta_entries(snapshot_id)
        if not entries:
            return None
        if t.is_primary_key_table():
            plan = read_mod.ScanPlan(merge_entries=entries)
        else:
            plan = read_mod.ScanPlan(raw_entries=entries)
        return read_mod.build_dataframe(spark, t.path, plan, t.schema, t.all_schemas())

    def poll(self, spark: SparkSession) -> list[tuple[int, DataFrame]]:
        """All pending batches; advances (and persists) the cursor."""
        if self._next is None:
            self._resolve_start()
        out: list[tuple[int, DataFrame]] = []
        if self._first_full is not None:
            df = self.table.to_df(spark, snapshot_id=self._first_full)
            out.append((self._first_full, df))
            self._first_full = None
        latest = self.table.snapshots.latest_id() or 0
        while self._next <= latest:
            df = self._delta_df(spark, self._next)
            if df is not None:
                out.append((self._next, df))
            self._next += 1
        if self.consumer_id is not None:
            self.table.snapshots.write_consumer(self.consumer_id, self._next)
        return out

    def batches(self, spark: SparkSession) -> Iterator[tuple[int, DataFrame]]:
        """Generator form of ``poll`` (Trigger.AvailableNow semantics)."""
        yield from self.poll(spark)

    def available_now(self, spark: SparkSession) -> DataFrame | None:
        """Union of every pending batch as one DataFrame, or None."""
        from functools import reduce

        dfs = [df for _sid, df in self.poll(spark)]
        return reduce(lambda a, b: a.unionByName(b), dfs) if dfs else None
