"""Adversarial fuzzing of the transactional core (VERDICT r3 task 1).

Randomized operation interleavings — upsert / DV-delete / rewrite-delete
/ compact / manifest-compact / file-index-rewrite / snapshot-expiry —
replayed against a serial in-memory oracle, asserting after EVERY
committed operation:

  * the table's merged read equals the oracle exactly,
  * snapshot ids are strictly monotone,
  * every live manifest entry's data file exists on disk,
  * the recorded dv_row_count matches the sidecars.

Model: the reference's FileStoreCommitTest + randomized writer tests
(paimon-core/src/test/.../FileStoreCommitTest.java,
append/AppendOnlyWriterTest.java). The r2-ADVICE expiry-after-rewrite
data-loss bug was exactly this class of defect; these seeds hunt it
systematically. A separate test drives CONCURRENT writers over disjoint
key ranges mixed with compaction/expiry from other threads.

Three families:
  1. PK tables (seeds 1000+): upsert / DV- and rewrite-deletes /
     universal + full compaction / expiry / index rewrites, each
     sequence capped with a bucketed-join parity check and a doctor run.
  2. Append tables (seeds 7000+): schema evolution + sort_compact +
     expiry with TIME-TRAVEL audits (every retained snapshot re-reads
     its frozen oracle) and ROW-ID stability audits — this family
     caught the flaky footer-sampling schema-inference data bug.
  3. Branches (seeds 5000+): forks, branch upserts, fast_forward
     promotions, drops, tags and expiry vs per-branch/per-tag oracles.
"""

from __future__ import annotations

import os
import random
import threading

import pytest

# r12 fast-tier split: this module is SLOW-tier (long fuzz loops /
# integration matrices); run `-m ""` for the full suite.
pytestmark = pytest.mark.slow

from flink_table_store_spark import predicate as P

DDL = "k bigint, v bigint"


def _mk(spark, warehouse, name: str, dv: bool, seed: int):
    opts = {
        "bucket": "2",
        "snapshot.num-retained.min": "1",
        "file-index.bloom-filter.columns": "v",
    }
    if dv:
        opts["deletion-vectors.enabled"] = "true"
    return warehouse.create_table(name, DDL, primary_keys=["k"], options=opts)


def _check_invariants(spark, t, oracle: dict[int, int], last_snap_id: int) -> int:
    snap = t.snapshots.latest()
    assert snap is not None
    assert snap.id >= last_snap_id, "snapshot ids must be monotone"
    ids = t.snapshots.snapshot_ids()
    assert ids == sorted(ids), "snapshot id listing must be sorted"
    # no dangling live file references
    entries = t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    )
    for e in entries:
        assert os.path.exists(os.path.join(t.path, e.file_name)), (
            f"live entry references missing file {e.file_name} (snap {snap.id})"
        )
    # dv bookkeeping consistent
    if snap.dv_files:
        live = {os.path.basename(e.file_name) for e in entries}
        derived = t._dv_count_files(snap.dv_files, live)
        if snap.dv_row_count is not None:
            assert snap.dv_row_count == derived, "dv_row_count drifted"
        for n in snap.dv_files:
            assert os.path.exists(os.path.join(t.path, "index", n))
    # the merged read IS the oracle
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    assert got == oracle, (
        f"state diverged at snap {snap.id}: "
        f"extra={sorted(set(got) - set(oracle))[:5]} "
        f"missing={sorted(set(oracle) - set(got))[:5]} "
        f"wrong={[k for k in got if k in oracle and got[k] != oracle[k]][:5]}"
    )
    return snap.id


def _run_sequence(spark, warehouse, seed: int, n_ops: int, dv: bool) -> int:
    """One seeded interleaving; returns number of committed ops."""
    rng = random.Random(seed)
    t = _mk(spark, warehouse, f"db.fuzz_{seed}_{int(dv)}", dv, seed)
    oracle: dict[int, int] = {}
    last_id = 0
    committed = 0

    def upsert():
        nonlocal oracle
        keys = rng.sample(range(40), rng.randint(1, 12))
        rows = [(k, rng.randint(0, 10**6)) for k in keys]
        t.write(spark.createDataFrame(rows, DDL))
        oracle.update(dict(rows))

    def delete_pred():
        nonlocal oracle
        lo = rng.randint(0, 35)
        hi = lo + rng.randint(1, 8)
        use_dv = dv and rng.random() < 0.7
        pred = P.and_(P.greater_or_equal("k", lo), P.less_than("k", hi))
        t.delete(spark, pred, use_dv=use_dv)
        oracle = {k: v for k, v in oracle.items() if not (lo <= k < hi)}

    def compact():
        t.compact(spark, full=rng.random() < 0.7)

    def expire():
        t.expire_snapshots(retain_last=rng.randint(1, 4))

    def rewrite_index():
        t.rewrite_file_index(spark)

    def compact_manifest():
        t.compact_manifest()

    ops = [
        (upsert, 10),
        (delete_pred, 5),
        (compact, 3),
        (expire, 3),
        (rewrite_index, 2),
        (compact_manifest, 1),
    ]
    pool = [f for f, w in ops for _ in range(w)]
    # always start with data on the table
    upsert()
    t = t.refresh()
    last_id = _check_invariants(spark, t, oracle, last_id)
    committed += 1
    for _ in range(n_ops - 1):
        op = rng.choice(pool)
        op()
        t = t.refresh()
        last_id = _check_invariants(spark, t, oracle, last_id)
        committed += 1
    # end-of-sequence: the bucketed join over the fuzzed table (DVs,
    # partial universal merges, rewrites and all) must equal a regular
    # join of the proven merged read; doctor() must run clean
    from flink_table_store_spark.operators.bucketed_join import join_bucketed

    dim = warehouse.create_table(
        f"db.fuzzdim_{seed}_{int(dv)}", "k bigint, s string",
        primary_keys=["k"], options={"bucket": "2"},
    )
    dim.write(
        spark.createDataFrame([(k, f"d{k}") for k in range(40)], "k bigint, s string")
    )
    got = sorted(
        map(tuple, join_bucketed(spark, t, dim.refresh(), on=[("k", "k")]).collect())
    )
    expected = sorted(
        map(
            tuple,
            t.to_df(spark).join(dim.to_df(spark), on="k").select("k", "v", "s").collect(),
        )
    )
    assert got == expected, f"bucketed join diverged after fuzz (seed {seed})"
    rep = t.doctor(spark)
    assert rep["files"]["rows"] >= 0
    return committed


# 24 seeds x 10 ops x {dv on/off alternating} = 240 checked interleaved
# operations, every one followed by a full oracle + filesystem audit
@pytest.mark.parametrize("seed", range(24))
def test_fuzz_random_interleavings(spark, warehouse, seed):
    n = _run_sequence(spark, warehouse, seed=1000 + seed, n_ops=10, dv=seed % 2 == 0)
    assert n == 10


def test_fuzz_concurrent_writers_with_maintenance(spark, warehouse):
    """4 writer threads over DISJOINT key ranges racing upserts while a
    maintenance thread compacts and expires: the CAS retry loop must
    land every writer's final value; maintenance must never lose rows."""
    from flink_table_store_spark.commit import CommitConflictError

    t0 = warehouse.create_table(
        "db.fuzz_conc",
        DDL,
        primary_keys=["k"],
        options={"bucket": "2", "snapshot.num-retained.min": "1"},
    )
    finals: dict[int, dict[int, int]] = {}
    errors: list = []

    def writer(wid: int):
        rng = random.Random(9000 + wid)
        t = t0.refresh()
        base = wid * 100
        try:
            for i in range(4):
                rows = [(base + j, rng.randint(0, 10**6)) for j in range(10)]
                t.write(spark.createDataFrame(rows, DDL))
                finals[wid] = dict(rows)
                t = t.refresh()
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append((wid, e))

    def maintenance():
        t = t0.refresh()
        rng = random.Random(777)
        try:
            for _ in range(5):
                try:
                    if rng.random() < 0.5:
                        t.compact(spark, full=True)
                    else:
                        t.expire_snapshots(retain_last=2)
                except CommitConflictError:
                    pass  # lost a race with a writer — acceptable, retryable
                t = t.refresh()
        except Exception as e:  # pragma: no cover
            errors.append(("maint", e))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    threads.append(threading.Thread(target=maintenance))
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    t = t0.refresh()
    expected: dict[int, int] = {}
    for wid in range(4):
        expected.update(finals[wid])
    got = {r.k: r.v for r in t.to_df(spark).collect()}
    assert got == expected
    ids = t.snapshots.snapshot_ids()
    assert ids == sorted(ids)
    snap = t.snapshots.latest()
    for e in t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    ):
        assert os.path.exists(os.path.join(t.path, e.file_name))


def _run_append_sequence(spark, warehouse, seed: int, n_ops: int) -> int:
    """Append-table fuzz family: append / rewrite-delete / sort_compact /
    compact / schema-evolution add_column / expire, with a TIME-TRAVEL
    audit — after every op, a randomly chosen retained snapshot must
    read back exactly the (k, v) multiset recorded when it committed
    (hunts expiry/compaction corruption of history)."""
    rng = random.Random(seed)
    t = warehouse.create_table(
        f"db.fuzza_{seed}",
        "k bigint, v bigint",
        options={"snapshot.num-retained.min": "1", "row-tracking.enabled": "true"},
    )
    live: list[tuple] = []  # multiset of (k, v)
    history: dict[int, list[tuple]] = {}  # snapshot id -> frozen multiset
    added_cols = 0
    committed = 0
    uid = [0]  # v is globally unique so each row is identity-trackable
    row_ids: dict[int, int] = {}  # v -> _ROW_ID observed

    def schema_ddl():
        base = "k bigint, v bigint"
        extras = ", ".join(f"c{i} bigint" for i in range(added_cols))
        return f"{base}, {extras}" if extras else base

    def append():
        nonlocal live
        rows = []
        for i in range(rng.randint(1, 10)):
            uid[0] += 1
            rows.append(tuple([rng.randint(0, 50), uid[0]] + [i] * added_cols))
        t.write(spark.createDataFrame(rows, schema_ddl()).coalesce(1))
        live = live + [r[:2] for r in rows]

    def delete_pred():
        nonlocal live
        lo = rng.randint(0, 45)
        hi = lo + rng.randint(1, 10)
        t.delete(spark, P.and_(P.greater_or_equal("k", lo), P.less_than("k", hi)))
        live = [r for r in live if not (lo <= r[0] < hi)]

    def sortc():
        t.sort_compact(spark, ["k"], strategy="order", num_files=2)

    def compact():
        t.compact(spark, full=True)

    def evolve():
        nonlocal added_cols
        t.evolve_schema(
            [{"action": "add_column", "name": f"c{added_cols}", "type": "bigint"}]
        )
        added_cols += 1

    def expire():
        nonlocal history
        t.expire_snapshots(retain_last=rng.randint(2, 5))
        retained = set(t.snapshots.snapshot_ids())
        history = {i: rows for i, rows in history.items() if i in retained}

    ops = [(append, 8), (delete_pred, 4), (sortc, 2), (compact, 2), (evolve, 2), (expire, 3)]
    pool = [f for f, w in ops for _ in range(w)]
    append()
    for i in range(n_ops):
        if i:
            rng.choice(pool)()
        t = t.refresh()
        snap = t.snapshots.latest()
        history[snap.id] = list(live)
        # latest state audit on the original columns
        got = sorted((r.k, r.v) for r in t.to_df(spark).select("k", "v").collect())
        assert got == sorted(live), f"latest diverged at snap {snap.id} (seed {seed})"
        # time-travel audit of one random retained snapshot
        audit_id = rng.choice(sorted(history))
        tt = sorted(
            (r.k, r.v)
            for r in t.to_df(spark, snapshot_id=audit_id).select("k", "v").collect()
        )
        assert tt == sorted(history[audit_id]), (
            f"time travel to snap {audit_id} diverged (seed {seed})"
        )
        # row-id stability audit: every surviving row keeps the id it
        # was first observed with, through any interleaving of delete /
        # compact / sort_compact / evolution / expiry
        ids_now = {
            r.v: r._ROW_ID for r in t.row_tracking_df(spark).select("v", "_ROW_ID").collect()
        }
        assert all(i is not None for i in ids_now.values()), f"null row id (seed {seed})"
        assert len(set(ids_now.values())) == len(ids_now), f"duplicate row ids (seed {seed})"
        for v, i in ids_now.items():
            if v in row_ids:
                assert i == row_ids[v], (
                    f"row id of v={v} changed {row_ids[v]}→{i} at snap {snap.id} (seed {seed})"
                )
        row_ids.clear()
        row_ids.update(ids_now)
        committed += 1
    return committed


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_append_evolution_time_travel(spark, warehouse, seed):
    assert _run_append_sequence(spark, warehouse, seed=7000 + seed, n_ops=8) == 8


def _run_branch_sequence(spark, warehouse, seed: int, n_ops: int) -> int:
    """Branch/tag fuzz family: main upserts interleaved with branch
    forks, branch upserts, fast_forward promotions, branch drops, tag
    creation and expiry. After every op: main == its oracle, the live
    branch == its oracle, and one randomly chosen surviving tag still
    reads back exactly the state frozen when it was tagged (the r2
    fast_forward crash-hole class, hunted under interleaving)."""
    rng = random.Random(seed)
    t = warehouse.create_table(
        f"db.fuzzb_{seed}",
        DDL,
        primary_keys=["k"],
        options={"bucket": "2", "snapshot.num-retained.min": "1"},
    )
    oracle: dict[int, int] = {}
    branch_oracle: dict[int, int] | None = None
    branch_t = None
    tags: dict[str, dict[int, int]] = {}
    ntags = [0]
    committed = 0

    def upsert_main():
        rows = [(k, rng.randint(0, 10**6)) for k in rng.sample(range(30), rng.randint(1, 8))]
        t.write(spark.createDataFrame(rows, DDL))
        oracle.update(dict(rows))

    def branch_op():
        nonlocal branch_t, branch_oracle, oracle
        if branch_t is None:
            branch_t = t.create_branch("dev")
            branch_oracle = dict(oracle)
            return
        roll = rng.random()
        if roll < 0.5:  # branch upsert
            rows = [(k, rng.randint(0, 10**6)) for k in rng.sample(range(30), rng.randint(1, 6))]
            branch_t.write(spark.createDataFrame(rows, DDL))
            branch_oracle.update(dict(rows))
            branch_t = branch_t.refresh()
        elif roll < 0.8:  # promote branch to main
            t.fast_forward("dev")
            oracle = dict(branch_oracle)
            t.delete_branch("dev")
            branch_t, branch_oracle = None, None
        else:  # abandon branch
            t.delete_branch("dev")
            branch_t, branch_oracle = None, None

    def tag_op():
        name = f"tag{ntags[0]}"
        ntags[0] += 1
        t.refresh().create_tag(name)
        tags[name] = dict(oracle)

    def expire():
        t.refresh().expire_snapshots(retain_last=rng.randint(1, 3))

    ops = [(upsert_main, 8), (branch_op, 5), (tag_op, 3), (expire, 3)]
    pool = [f for f, w in ops for _ in range(w)]
    upsert_main()
    for i in range(n_ops):
        if i:
            rng.choice(pool)()
        t = t.refresh()
        got = {r.k: r.v for r in t.to_df(spark).collect()}
        assert got == oracle, f"main diverged (seed {seed}, op {i})"
        if branch_t is not None:
            bgot = {r.k: r.v for r in branch_t.refresh().to_df(spark).collect()}
            assert bgot == branch_oracle, f"branch diverged (seed {seed}, op {i})"
        if tags:
            name = rng.choice(sorted(tags))
            tgot = {r.k: r.v for r in t.to_df(spark, tag=name).collect()}
            assert tgot == tags[name], f"tag {name} diverged (seed {seed}, op {i})"
        committed += 1
    return committed


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_branch_tag_fast_forward(spark, warehouse, seed):
    assert _run_branch_sequence(spark, warehouse, seed=5000 + seed, n_ops=8) == 8
