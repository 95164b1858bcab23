"""Persisted changelog from full compaction (changelog-producer=
full-compaction): compact() writes the diff once as changelog files
referenced by the snapshot (reference FullChangelogMergeTreeCompact-
Rewriter.java); consumers read plain parquet instead of recomputing a
two-sided merge per read."""

from __future__ import annotations

import pytest
from flink_table_store_spark import predicate as P
from flink_table_store_spark.streaming.changelog import (
    changelog_diff,
    persisted_changelog,
)
from flink_table_store_spark.streaming.source import SnapshotStream


def _mk(spark, warehouse, name="db.clp"):
    t = warehouse.create_table(
        name,
        "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "2", "changelog-producer": "full-compaction"},
    )
    t.write(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"))
    t.write(spark.createDataFrame([(2, "B"), (4, "d")], "k bigint, v string"))
    return t.refresh()


def test_compaction_persists_changelog_files(spark, warehouse):
    t = _mk(spark, warehouse)
    t.compact(spark, full=True)
    t = t.refresh()
    snap = t.snapshots.latest()
    assert snap.commit_kind == "COMPACT" and snap.changelog_files

    cl = persisted_changelog(spark, t, snap.id)
    got = {(r.rowkind, r.k, r.v) for r in cl.collect()}
    # first compaction: full +I image of the merged state
    assert got == {("+I", 1, "a"), ("+I", 2, "B"), ("+I", 3, "c"), ("+I", 4, "d")}

    # the persisted read is a plain file scan: no merge aggregation,
    # no join, no exchange — THE point of persisting
    plan = cl._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in plan and "SortMergeJoin" not in plan
    assert "Exchange" not in plan


@pytest.mark.slow
def test_second_compaction_diffs_since_baseline(spark, warehouse):
    t = _mk(spark, warehouse, "db.clp2")
    t.compact(spark, full=True)
    t = t.refresh()
    t.write(spark.createDataFrame([(1, "A2"), (5, "e")], "k bigint, v string"))
    t.delete(spark, P.equal("k", 3))
    t = t.refresh()
    t.compact(spark, full=True)
    t = t.refresh()
    snap = t.snapshots.latest()
    assert snap.changelog_files
    got = {(r.rowkind, r.k, r.v) for r in persisted_changelog(spark, t, snap.id).collect()}
    assert got == {
        ("-U", 1, "a"),
        ("+U", 1, "A2"),
        ("+I", 5, "e"),
        ("-D", 3, "c"),
    }
    # matches the recomputed diff between the two compaction snapshots
    base = next(
        sid
        for sid in reversed(t.snapshots.snapshot_ids())
        if sid < snap.id and t.snapshots.load(sid).commit_kind == "COMPACT"
    )
    recomputed = {
        (r.rowkind, r.k, r.v) for r in changelog_diff(spark, t, base, snap.id).collect()
    }
    assert got == recomputed


def test_streaming_source_consumes_persisted_changelog(spark, warehouse):
    t = _mk(spark, warehouse, "db.clp3")
    t.compact(spark, full=True)
    t = t.refresh()
    stream = SnapshotStream(t, startup_mode="from-snapshot", from_snapshot=1, scan="changelog")
    batches = stream.poll(spark)
    compact_sid = t.snapshots.latest().id
    by_sid = {}
    for sid, df in batches:
        by_sid.setdefault(sid, set()).update(
            (r.rowkind, r.k, r.v) for r in df.select("rowkind", "k", "v").collect()
        )
    assert by_sid.get(compact_sid) == {
        ("+I", 1, "a"),
        ("+I", 2, "B"),
        ("+I", 3, "c"),
        ("+I", 4, "d"),
    }


def test_lookup_producer_persists_per_commit_changelog(spark, warehouse):
    """changelog-producer=lookup: every write persists its diff once;
    consumers (and the streaming source) read plain files, survive
    orphan scans, and get reclaimed with their snapshot at expiry."""
    import glob
    import os

    t = warehouse.create_table(
        "db.clu",
        "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "1", "changelog-producer": "lookup"},
    )
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"))
    t = t.refresh()
    t.write(spark.createDataFrame([(1, "A"), (3, "c")], "k bigint, v string"))
    t = t.refresh()

    # write-side files exist per snapshot
    assert glob.glob(os.path.join(t.path, "changelog", "changelog-s1-*.parquet"))
    assert glob.glob(os.path.join(t.path, "changelog", "changelog-s2-*.parquet"))

    cl2 = persisted_changelog(spark, t, 2)
    got = {(r.rowkind, r.k, r.v) for r in cl2.collect()}
    assert got == {("-U", 1, "a"), ("+U", 1, "A"), ("+I", 3, "c")}
    plan = cl2._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "max_by" not in plan  # plain file scan

    # streaming consumer reads the persisted files
    stream = SnapshotStream(t, startup_mode="from-snapshot", from_snapshot=2, scan="changelog")
    [(sid, df)] = stream.poll(spark)
    assert sid == 2
    assert {(r.rowkind, r.k, r.v) for r in df.collect()} == got

    # orphan scan keeps them while their snapshot lives
    assert not [o for o in t.remove_orphan_files(dry_run=True, older_than_millis=10**15) if o.startswith("changelog")]

    # expire reclaims snapshot 1's changelog, keeps snapshot 2's
    t.write(spark.createDataFrame([(4, "d")], "k bigint, v string"))
    t = t.refresh()
    t.expire_snapshots(retain_last=2)
    assert not glob.glob(os.path.join(t.path, "changelog", "changelog-s1-*.parquet"))
    assert glob.glob(os.path.join(t.path, "changelog", "changelog-s2-*.parquet"))


def test_aligned_streams_hold_back_to_common_watermark(spark, warehouse):
    """T15 aligned consumption: a lagging table holds the others back;
    once it advances, the withheld snapshots flow."""
    import time

    from flink_table_store_spark.streaming.source import AlignedStreams, SnapshotStream

    ta = warehouse.create_table("db.al_a", "k bigint, v string", primary_keys=["k"], options={"bucket": "1"})
    tb = warehouse.create_table("db.al_b", "k bigint, v string", primary_keys=["k"], options={"bucket": "1"})
    ta.write(spark.createDataFrame([(1, "a1")], "k bigint, v string"))
    tb.write(spark.createDataFrame([(1, "b1")], "k bigint, v string"))
    ta, tb = ta.refresh(), tb.refresh()
    streams = AlignedStreams(
        {
            "a": SnapshotStream(ta, startup_mode="from-snapshot", from_snapshot=1),
            "b": SnapshotStream(tb, startup_mode="from-snapshot", from_snapshot=1),
        }
    )
    # watermark = min(latest commit times) = A's (B wrote later, so B is
    # "ahead" of the frontier and withheld)
    bound, got = streams.poll_aligned(spark)
    assert bound is not None
    assert [sid for sid, _ in got["a"]] == [1] and got["b"] == []

    # A advances past B: the watermark moves to B's commit — B's
    # withheld snapshot flows, A's NEW one is now the one ahead
    time.sleep(0.02)
    ta.write(spark.createDataFrame([(2, "a2")], "k bigint, v string"))
    bound2, got2 = streams.poll_aligned(spark)
    assert bound2 > bound
    assert got2["a"] == [] and [sid for sid, _ in got2["b"]] == [1]

    # B advances past A's latest: A's snapshot 2 flows
    time.sleep(0.02)
    tb.write(spark.createDataFrame([(2, "b2")], "k bigint, v string"))
    _bound3, got3 = streams.poll_aligned(spark)
    assert [sid for sid, _ in got3["a"]] == [2]
    assert got3["b"] == []  # b2 is ahead of the new frontier

    # no frontier ever emits a snapshot newer than its tick's watermark:
    # a join over the emitted batches mixes no future state
    assert bound2 is not None


def test_changelog_files_survive_orphan_scan(spark, warehouse):
    t = _mk(spark, warehouse, "db.clp4")
    t.compact(spark, full=True)
    t = t.refresh()
    orphans = t.remove_orphan_files(dry_run=True, older_than_millis=10**15)
    assert not [o for o in orphans if o.startswith("changelog")]
    t.remove_orphan_files(older_than_millis=10**15)
    assert persisted_changelog(spark, t, t.snapshots.latest().id).count() == 4


def test_incremental_between_scan_mode(spark, warehouse):
    """incremental-between-scan-mode (CoreOptions.java:1360): auto
    picks changelog when the table produces changelog files; delta and
    changelog are forceable per call or via the table option."""
    t = _mk(spark, warehouse, "db.clp_ibsm")
    t.compact(spark, full=True)  # snapshot 3: persisted +I changelog
    t = t.refresh()
    cid = t.snapshots.latest().id
    # auto on a changelog-producing table reads the changelog rows
    cl = t.incremental_read(spark, cid - 1, cid)
    assert cl.columns[0] == "rowkind"
    assert {(r.rowkind, r.k, r.v) for r in cl.collect()} == {
        ("+I", 1, "a"), ("+I", 2, "B"), ("+I", 3, "c"), ("+I", 4, "d")
    }
    # forced delta keeps the merged-delta shape (no rowkind column)
    d = t.incremental_read(spark, 1, 2, scan_mode="delta")
    assert d.columns == ["k", "v"]
    assert sorted((r.k, r.v) for r in d.collect()) == [(2, "B"), (4, "d")]
    # a range with no changelog yields an empty, correctly-shaped frame
    empty = t.incremental_read(spark, 0, 1, scan_mode="changelog")
    assert empty.count() == 0 and empty.columns[0] == "rowkind"
    # unknown mode refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="scan-mode"):
        t.incremental_read(spark, 0, 1, scan_mode="bogus")


def test_incremental_changelog_input_producer(spark, warehouse):
    t = warehouse.create_table(
        "db.clp_in", "k bigint, v string", primary_keys=["k"],
        options={"bucket": "1", "changelog-producer": "input"},
    )
    t.write(spark.createDataFrame([(1, "a")], "k bigint, v string"))
    t.write(spark.createDataFrame([(1, "a2"), (2, "b")], "k bigint, v string"))
    cl = t.incremental_read(spark, 1, 2)  # auto -> changelog (input)
    assert {(r.rowkind, r.k, r.v) for r in cl.collect()} == {
        ("+I", 1, "a2"), ("+I", 2, "b")
    }


@pytest.mark.slow
def test_changelog_time_and_min_retention(spark, warehouse):
    """changelog.time-retained expires preserved changelog by age;
    changelog.num-retained.min floors the count (decoupled lifecycle,
    ExpireChangelogImpl)."""
    import json
    import os

    t = warehouse.create_table(
        "db.clret", "k bigint, v string", primary_keys=["k"],
        options={
            "changelog-producer": "lookup",
            "changelog.num-retained.max": "10",
            "changelog.time-retained": "1 h",
        },
    )
    for i in range(4):
        t.write(spark.createDataFrame([(i, f"v{i}")], "k bigint, v string"))
    t.expire_snapshots(retain_last=1)  # preserves changelog entries
    entries = t.snapshots.changelog_entry_ids()
    assert entries == [1, 2, 3]
    # nothing old enough yet
    assert t.expire_changelogs(10) == []
    # age entry 1 past the retention
    p = os.path.join(t.path, "changelog", "changelog-1")
    doc = json.load(open(p))
    doc["timeMillis"] -= 2 * 3_600_000
    json.dump(doc, open(p, "w"))
    assert t.expire_changelogs(10) == [1]
    # num-retained.min floors: even with retain_last=0, min=2 keeps the
    # newest 2 of (entries + live history)
    t2 = warehouse.create_table(
        "db.clret2", "k bigint, v string", primary_keys=["k"],
        options={
            "changelog-producer": "lookup",
            "changelog.num-retained.max": "10",
            "changelog.num-retained.min": "4",
        },
    )
    for i in range(4):
        t2.write(spark.createDataFrame([(i, f"v{i}")], "k bigint, v string"))
    t2.expire_snapshots(retain_last=1)
    assert t2.expire_changelogs(1) == []  # min floor pins everything
