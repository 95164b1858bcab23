"""ACID commit under contention: CAS retry + conflict detection."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from flink_table_store_spark.commit import CommitConflictError
from flink_table_store_spark.manifest import KIND_DELETE, ManifestEntry


def test_concurrent_appends_all_land(spark, warehouse):
    t = warehouse.create_table("db.conc", "id bigint, w int")
    dfs = [
        spark.createDataFrame([(i, w) for i in range(100)], "id bigint, w int")
        for w in range(4)
    ]

    def commit_one(df):
        return t.write(df)

    with ThreadPoolExecutor(max_workers=4) as ex:
        snaps = list(ex.map(commit_one, dfs))

    ids = sorted(s.id for s in snaps)
    assert ids == [1, 2, 3, 4]  # every writer won a distinct CAS round
    assert t.to_df(spark).count() == 400
    assert t.snapshots.latest().total_record_count == 400


def test_delete_of_vanished_files_conflicts(spark, warehouse):
    t = warehouse.create_table("db.confl", "id bigint")
    t.write(spark.createDataFrame([(1,), (2,)], "id bigint"))
    snap = t.snapshots.latest()
    live = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)

    doomed = []
    for e in live:
        d = ManifestEntry(**{**e.__dict__})
        d.kind = KIND_DELETE
        doomed.append(d)
    # a competing writer (compaction) removes those files first
    t.committer.commit(doomed, t.schema.id)
    # our stale plan now tries to delete the same files again
    with pytest.raises(CommitConflictError):
        t.committer.commit(
            [ManifestEntry(**{**d.__dict__}) for d in doomed], t.schema.id
        )
