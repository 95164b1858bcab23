"""Universal compaction picking (UniversalCompaction.java:42-125)."""
from __future__ import annotations

from flink_table_store_spark import predicate as P

DDL = "k bigint, v bigint"


def _t(warehouse, name, **extra):
    opts = {"bucket": "1"}
    opts.update(extra)
    return warehouse.create_table(name, DDL, primary_keys=["k"], options=opts)


def _runs(t):
    snap = t.snapshots.latest()
    es = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    return sorted(es, key=lambda e: e.max_seq)


def test_pick_universal_triggers():
    from types import SimpleNamespace as NS

    from flink_table_store_spark.table import Table

    mk = lambda *sizes: [NS(file_size=s, max_seq=i, file_name=str(i)) for i, s in enumerate(sizes)]
    pick = Table._pick_universal
    # below trigger: nothing
    assert pick(mk(100, 10), 200, 1, 5) is None
    # size amplification: newer runs dwarf the oldest -> full merge
    runs = mk(10, 100, 100, 100, 100)
    assert pick(runs, 200, 1, 5) == runs
    # size ratio: similar-sized newest runs merge, big old run survives
    runs = mk(10_000, 10, 10, 11, 12)
    got = pick(runs, 2000, 25, 5)
    assert got is not None and runs[0] not in got and len(got) == 4
    # run count fallback: merge enough newest to drop below trigger
    runs = mk(1000, 200, 50, 4, 1)
    got = pick(runs, 200, 1, 5)
    assert got is not None and got[-1] is runs[-1]


def test_universal_partial_merge_correct_and_partial(spark, warehouse):
    """Partial merge: only the small newest runs rewrite; the big oldest
    run is untouched; reads stay exactly right, including deletes of
    keys living in the unmerged run."""
    t = _t(warehouse, "db.uni1")
    t.write(spark.createDataFrame([(k, k) for k in range(5000)], DDL))  # big old run
    t = t.refresh()
    oldest = {e.file_name for e in _runs(t)}
    # 4 small runs incl. an upsert and a delete of keys in the OLD run
    for i in range(3):
        t.write(spark.createDataFrame([(i, 1000 + i)], DDL))
    t.delete(spark, P.equal("k", 50))  # -D row for a key in the old run
    t = t.refresh()
    assert len(_runs(t)) == 5
    t.compact(spark, full=False)
    t = t.refresh()
    runs = _runs(t)
    names = {e.file_name for e in runs}
    assert oldest <= names, "the big oldest run must NOT be rewritten"
    assert len(runs) == 2, f"4 small runs should merge into 1 (got {len(runs)})"
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    expected = {k: k for k in range(5000) if k != 50}
    expected.update({0: 1000, 1: 1001, 2: 1002})
    assert got == expected
    # the -D row survived the partial merge (it still cancels k=50)
    assert 50 not in got


def test_universal_size_amplification_goes_full(spark, warehouse):
    t = _t(warehouse, "db.uni2")
    t.write(spark.createDataFrame([(1, 1)], DDL))
    for i in range(5):
        t.write(spark.createDataFrame([(k, 10 * i + k) for k in range(50)], DDL))
    t = t.refresh()
    t.compact(spark, full=False)
    t = t.refresh()
    assert len(_runs(t)) == 1, "amplified bucket must fully merge"
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    assert got[1] == 41 and got[49] == 89 and len(got) == 50


def test_universal_preserves_sequence_vs_unmerged_runs(spark, warehouse):
    """After a partial merge, a LATER full read still orders merged rows
    correctly against the untouched older run (sequence preserved)."""
    t = _t(warehouse, "db.uni3")
    t.write(spark.createDataFrame([(k, k) for k in range(40)], DDL))
    for i in range(4):
        t.write(spark.createDataFrame([(5, 500 + i)], DDL))
    t = t.refresh()
    t.compact(spark, full=False)
    t = t.refresh()
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    assert got[5] == 503  # newest upsert wins, not the base run's 5
    # and a fresh write after compaction still supersedes everything
    t.write(spark.createDataFrame([(5, 999)], DDL))
    t = t.refresh()
    assert {r.k: r.v for r in t.to_df(spark).collect()}[5] == 999
