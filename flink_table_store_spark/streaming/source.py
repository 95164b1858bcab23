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
from flink_table_store_spark.snapshot import COMMIT_COMPACT, COMMIT_OVERWRITE

STARTUP_MODES = (
    "default",      # alias of latest-full (CoreOptions StartupMode.DEFAULT)
    "latest-full",  # first batch = full table, then deltas (default)
    "latest",       # only snapshots committed after the stream starts
    "compacted-full",  # full read from the latest COMPACT snapshot, then deltas
    "from-snapshot",   # deltas starting at a given snapshot id
    "from-snapshot-full",  # full read AT the snapshot, then deltas
    "from-timestamp",  # deltas starting after a commit timestamp
    # first batch = snapshot at the creation ts if within the snapshot
    # range, else fall back to file-creation-time filtering
    # (CoreOptions.java StartupMode.FROM_CREATION_TIMESTAMP)
    "from-creation-timestamp",
    # first batch = latest snapshot with data files filtered by their
    # creation time, then deltas (StartupMode.FROM_FILE_CREATION_TIME)
    "from-file-creation-time",
    # bounded read of (from_snapshot, until_snapshot], then the stream
    # is exhausted (StartupMode.INCREMENTAL)
    "incremental",
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
        until_snapshot: int | None = None,
        scan: str = "delta",
        max_files_per_batch: int | None = None,
        max_rows_per_batch: int | None = None,
        bounded_watermark: int | None = None,
    ):
        if startup_mode not in STARTUP_MODES:
            raise ValueError(f"unknown startup mode {startup_mode}")
        if scan not in ("delta", "changelog"):
            raise ValueError(f"unknown scan mode {scan}")
        from flink_table_store_spark.chain import is_chain_table

        if is_chain_table(table.schema) and table.branch_name is None:
            # the main branch of a chain table has no commits to tail —
            # a stream on it would silently idle forever (the reference
            # is batch-only for chain tables: chain-table.md:91)
            raise ValueError(
                "streaming read of a chain table's main view is not "
                "supported — stream a branch: "
                "table.use_branch('snapshot'/'delta')"
            )
        self.table = table
        self.mode = startup_mode
        self.from_snapshot = from_snapshot
        self.from_timestamp = from_timestamp
        self.consumer_id = consumer_id
        self.until = until_snapshot  # INCREMENTAL upper bound (inclusive)
        self.scan = scan  # T3 ScanMode: DELTA rows vs CHANGELOG rows
        # S13 ReadLimit.maxFiles/maxRows (PaimonMicroBatchStream.scala:60-78):
        # one snapshot's delta may be split into several sub-batches
        self.max_files = max_files_per_batch
        self.max_rows = max_rows_per_batch
        # scan.bounded.watermark (CoreOptions; flink source
        # BoundedChecker.watermark): the stream ENDS when a snapshot
        # with a LARGER watermark is encountered — that snapshot is
        # not emitted
        opt_bw = table.schema.options.get("scan.bounded.watermark")
        self.bounded_watermark = (
            bounded_watermark
            if bounded_watermark is not None
            else (int(opt_bw) if opt_bw else None)
        )
        self._ended = False
        self._next: int | None = None  # next snapshot id to read
        self._first_full: int | None = None  # snapshot to full-scan first
        self._file_ts: int | None = None  # file creation-time floor for the first batch

    # --- startup resolution (StartingScanner variants) ---

    def _resolve_start(self) -> None:
        sm = self.table.snapshots
        if self.consumer_id is not None and (
            self.table.schema.options.get("consumer.ignore-progress") != "true"
        ):
            # consumer.ignore-progress (CoreOptions): start this run
            # from the scan mode, not the stored cursor — progress is
            # still written, so the NEXT run resumes normally
            resumed = sm.read_consumer(self.consumer_id)
            if resumed is not None:
                self._next = resumed
                return
        latest = sm.latest_id() or 0
        if self.mode == "incremental":
            self._next = int(self.from_snapshot) + 1
        elif self.mode in ("default", "latest-full"):
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
        elif self.mode in ("from-creation-timestamp", "from-file-creation-time"):
            ts = int(self.from_timestamp)
            earliest = sm.earliest_id()
            if self.mode == "from-creation-timestamp" and latest and earliest:
                lo, hi = sm.load(earliest).time_millis, sm.load(latest).time_millis
                if lo <= ts <= hi:
                    # from-snapshot at the first snapshot committed at/after ts
                    start = next(
                        sid for sid in sm.snapshot_ids() if sm.load(sid).time_millis >= ts
                    )
                    self._next = start
                    return
            # file-creation-time path: full snapshot filtered by file creation
            self._file_ts = ts
            self._first_full = latest if latest else None
            self._next = latest + 1

    def _delta_dfs(self, spark: SparkSession, snapshot_id: int) -> list[DataFrame]:
        """One snapshot's delta as DataFrames (DeltaFollowUpScanner:
        skip COMPACT snapshots — they move rows, add none). Under a
        read limit the delta splits into several sub-batches at
        (partition, bucket) granularity — the same split unit as the
        reference's PaimonSourceOffset(snapshotId, splitIdx)."""
        t = self.table
        s = t.snapshots.load(snapshot_id)
        # streaming-read-overwrite (CoreOptions; DeltaFollowUpScanner:
        # only APPEND commits follow by default): OVERWRITE snapshots
        # are skipped unless the option opts in
        read_overwrite = (
            t.schema.options.get("streaming-read-overwrite") == "true"
        )
        if self.scan == "changelog":
            # COMPACT snapshots move rows without changing state — except
            # under the full-compaction producer, whose changelog files
            # live ON the compact snapshot
            producer = t.schema.options.get("changelog-producer", "none")
            if read_overwrite and producer in ("full-compaction", "lookup"):
                # the reference refuses this combination (the producers'
                # diff already reflects overwrites; double-reporting)
                raise ValueError(
                    "streaming-read-overwrite cannot be used with the "
                    f"{producer} changelog producer"
                )
            if s.commit_kind == COMMIT_OVERWRITE and not read_overwrite:
                return []
            if s.commit_kind == COMMIT_COMPACT and producer != "full-compaction":
                return []
            df = self._changelog_df(spark, snapshot_id)
            return [df] if df is not None else []
        if s.commit_kind == COMMIT_COMPACT:
            return []
        if s.commit_kind == COMMIT_OVERWRITE and not read_overwrite:
            return []
        entries = t.delta_entries(snapshot_id)
        if not entries:
            return []
        pk = t.is_primary_key_table()

        def mk(chunk):
            plan = (
                read_mod.ScanPlan(merge_entries=chunk)
                if pk
                else read_mod.ScanPlan(raw_entries=chunk)
            )
            return read_mod.build_dataframe(spark, t.path, plan, t.schema, t.all_schemas())

        if self.max_files is None and self.max_rows is None:
            return [mk(entries)]
        # group per (partition, bucket) — never split a merge group
        groups: dict = {}
        for e in entries:
            groups.setdefault((tuple(sorted(e.partition.items())), e.bucket), []).append(e)
        out, cur, nf, nr = [], [], 0, 0
        for g in groups.values():
            gf, gr = len(g), sum(e.row_count for e in g)
            if cur and (
                (self.max_files and nf + gf > self.max_files)
                or (self.max_rows and nr + gr > self.max_rows)
            ):
                out.append(mk(cur))
                cur, nf, nr = [], 0, 0
            cur.extend(g)
            nf += gf
            nr += gr
        if cur:
            out.append(mk(cur))
        return out

    def _changelog_df(self, spark: SparkSession, snapshot_id: int) -> DataFrame | None:
        """ChangelogFollowUpScanner (T2) by producer (T4): ``input``
        replays persisted row kinds; otherwise a per-commit lookup-style
        diff synthesizes -U/+U pairs."""
        t = self.table
        producer = t.schema.options.get("changelog-producer", "none")
        if producer == "input":
            return t.audit_log(spark, snapshot_id - 1, snapshot_id)
        from flink_table_store_spark.streaming.changelog import (
            lookup_changelog,
            persisted_changelog,
        )

        if producer == "full-compaction":
            # consume the files the compaction persisted; non-compaction
            # snapshots emit nothing under this producer (the diff
            # arrives at the next full compaction)
            return persisted_changelog(spark, t, snapshot_id)
        # lookup producer: prefer the write-side persisted files; fall
        # back to recomputing (e.g. snapshots written with the producer
        # off, or a non-lookup producer value)
        persisted = persisted_changelog(spark, t, snapshot_id)
        if persisted is not None and producer == "lookup":
            return persisted
        return lookup_changelog(spark, t, snapshot_id)

    def _file_filtered_full(self, spark: SparkSession, snapshot_id: int) -> DataFrame | None:
        """FROM_FILE_CREATION_TIME first batch: the snapshot's live files
        with creation time >= the floor (CoreOptions.java:3439-3442 —
        'consumes a snapshot and filters the data files by creation
        time'). File-level filtering is the documented semantics even on
        PK tables (recent files only, no historic merge)."""
        t = self.table
        snap = t.snapshots.load(snapshot_id)
        entries = [
            e
            for e in t.manifests.read_live_entries(
                snap.base_manifest_list, snap.delta_manifest_list
            )
            if e.creation_time >= self._file_ts
        ]
        if not entries:
            return None
        plan = (
            read_mod.ScanPlan(merge_entries=entries)
            if t.is_primary_key_table()
            else read_mod.ScanPlan(raw_entries=entries)
        )
        return read_mod.build_dataframe(spark, t.path, plan, t.schema, t.all_schemas())

    def poll(self, spark: SparkSession) -> list[tuple[int, DataFrame]]:
        """All pending batches; advances (and persists) the cursor."""
        if self._next is None:
            self._resolve_start()
        out: list[tuple[int, DataFrame]] = []
        if self._first_full is not None:
            if self._file_ts is not None:
                df = self._file_filtered_full(spark, self._first_full)
            else:
                df = self.table.to_df(spark, snapshot_id=self._first_full)
            if df is not None:
                out.append((self._first_full, df))
            self._first_full = None
        latest = self.table.snapshots.latest_id() or 0
        if self.until is not None:
            latest = min(latest, self.until)
        while self._next <= latest and not self._ended:
            if self.bounded_watermark is not None and self.table.snapshots.exists(self._next):
                wm = self.table.snapshots.load(self._next).watermark
                if wm is not None and wm > self.bounded_watermark:
                    self._ended = True  # BoundedChecker.shouldEndInput
                    break
            for df in self._delta_dfs(spark, self._next):
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


class AlignedStreams:
    """Aligned snapshot consumption across tables (T15; reference
    paimon-flink source/align/AlignedContinuousFileStoreSource): the
    reference pins checkpoint boundaries to snapshot boundaries so all
    subtasks observe consistent state. In Spark's micro-batch model a
    batch already IS a whole snapshot; cross-TABLE alignment is the
    remaining piece — each aligned tick emits, per table, only the
    snapshots committed at or before the common watermark
    ``min(latest commit time across tables)``. A table that lags holds
    every other table back, so a join of the emitted batches never
    mixes states from different wall-clock frontiers."""

    def __init__(self, streams: dict[str, SnapshotStream]):
        if not streams:
            raise ValueError("AlignedStreams needs at least one stream")
        self.streams = streams

    def boundary(self) -> int | None:
        """Common watermark: min over tables of their latest snapshot's
        commit time; None until every table has at least one snapshot."""
        times = []
        for st in self.streams.values():
            latest = st.table.snapshots.latest()
            if latest is None:
                return None
            times.append(latest.time_millis)
        return min(times)

    def poll_aligned(
        self, spark: SparkSession
    ) -> tuple[int | None, dict[str, list[tuple[int, DataFrame]]]]:
        """(watermark, {name: [(snapshot_id, DataFrame), ...]}) — every
        emitted snapshot committed at or before the watermark."""
        bound = self.boundary()
        out: dict[str, list[tuple[int, DataFrame]]] = {n: [] for n in self.streams}
        if bound is None:
            return None, out
        for name, st in self.streams.items():
            sm = st.table.snapshots
            cutoff = None
            for sid in sm.snapshot_ids():
                if sm.load(sid).time_millis <= bound:
                    cutoff = sid
            if cutoff is None:
                continue
            prev_until = st.until
            st.until = cutoff if prev_until is None else min(prev_until, cutoff)
            try:
                out[name] = st.poll(spark)
            finally:
                st.until = prev_until
        return bound, out
