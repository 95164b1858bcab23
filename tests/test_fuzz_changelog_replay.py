"""Changelog replay invariant fuzz: for a full-compaction changelog
producer, applying every persisted changelog event in snapshot order
(+I/+U set, -D remove, -U is the before-image) must reconstruct the
table's merged state at the latest compaction — the exact contract a
downstream CDC consumer relies on (FullChangelogMergeFunctionWrapper;
the r9 row-deduplicate/null-safety changes are inside this loop).
Randomized writes (inserts, updates, deletes, value->NULL transitions)
with changelog-producer.row-deduplicate both on and off."""

from __future__ import annotations

import random

import pytest

# r12 fast-tier split: this module is SLOW-tier (long fuzz loops /
# integration matrices); run `-m ""` for the full suite.
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("row_dedup", ["true", "false"])
def test_fuzz_changelog_replay(spark, warehouse, seed, row_dedup):
    rng = random.Random(4500 + seed)
    ddl = "k bigint, v string, n bigint"
    wddl = ddl + ", rk string"
    t = warehouse.create_table(
        f"db.fzcl_{row_dedup}_{seed}",
        ddl,
        primary_keys=["k"],
        options={
            "bucket": "2",
            "changelog-producer": "full-compaction",
            "changelog-producer.row-deduplicate": row_dedup,
        },
    )

    def write_batch():
        rows = []
        for k in rng.sample(range(15), rng.randint(1, 6)):
            if rng.random() < 0.2:
                rows.append((k, None, None, "-D"))
            else:
                v = f"v{rng.randint(0, 9)}" if rng.random() < 0.8 else None
                n = rng.randint(0, 99) if rng.random() < 0.8 else None
                rows.append((k, v, n, "+I"))
        if rows:
            t.refresh().write(
                spark.createDataFrame(rows, wddl), row_kind_col="rk"
            )

    state: dict = {}
    replayed_to = 0  # snapshot id the replay has consumed up to

    def replay_and_check():
        nonlocal replayed_to
        snap = t.refresh().snapshots.latest()
        events = t.refresh().incremental_read(
            spark, replayed_to, snap.id, scan_mode="changelog"
        )
        cols = [c for c in events.columns if c != "rowkind"]
        # within one compaction's changelog a key carries one
        # transition (+I | -U,+U | -D): apply -U first, then adds,
        # then -D — matching event order without needing a file order
        rows = [tuple(r) for r in events.select("rowkind", *cols).collect()]
        for kind, *vals in rows:
            if kind in ("+I", "+U"):
                state[vals[0]] = tuple(vals)
            elif kind == "-D":
                state.pop(vals[0], None)
        merged = {
            r[0]: tuple(r)
            for r in t.refresh().to_df(spark).select(*cols).collect()
        }
        assert state == merged, f"replay diverged at snapshot {snap.id}"
        replayed_to = snap.id

    write_batch()
    for _ in range(6):
        n = rng.randint(1, 3)
        for _ in range(n):
            write_batch()
        t.refresh().compact(spark, full=True)
        replay_and_check()
