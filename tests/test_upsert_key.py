"""upsert-key: SQL Upsert for NON-PK tables (reference docs/content/
spark/sql-upsert.md; RewriteUpsertTable.scala) — null-safe key match,
sequence.field winners, merge-not-append semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DDL = "k1 int, k2 int, ts1 int, ts2 int, v string"


@pytest.fixture()
def ut(spark, warehouse):
    return warehouse.create_table(
        "db.ups", DDL,
        options={"upsert-key": "k1,k2", "sequence.field": "ts1,ts2"},
    )


def test_doc_example_verbatim(spark, ut):
    """sql-upsert.md:52-96 — both batches, exact expected results."""
    ut.write(spark.createDataFrame([
        (None, None, 2, 1, "v1"),
        (None, None, 2, 2, "v4"),
        (1, None, 1, 1, "v1"),
        (1, 2, 1, 1, "v1"),
        (1, 2, 2, 1, "v2"),
    ], DDL))
    got1 = sorted(
        ((r.k1, r.k2, r.ts1, r.ts2, r.v) for r in ut.to_df(spark).collect()),
        key=lambda x: (x[0] is not None, x[0], x[1] is not None, x[1]),
    )
    assert got1 == [
        (None, None, 2, 2, "v4"),
        (1, None, 1, 1, "v1"),
        (1, 2, 2, 1, "v2"),
    ]
    ut.write(spark.createDataFrame([
        (None, None, 2, 1, "v5"),
        (None, 1, 1, 1, "v1"),
        (1, None, 2, 1, "v2"),
        (1, 1, 1, 1, "v1"),
        (1, 2, 2, 0, "v3"),
    ], DDL))
    got2 = sorted(
        ((r.k1, r.k2, r.ts1, r.ts2, r.v) for r in ut.to_df(spark).collect()),
        key=lambda x: (x[0] is not None, x[0], x[1] is not None, x[1]),
    )
    assert got2 == [
        (None, None, 2, 2, "v4"),   # (2,1) v5 loses to (2,2)
        (None, 1, 1, 1, "v1"),      # new key inserts
        (1, None, 2, 1, "v2"),      # (2,1) beats (1,1)
        (1, 1, 1, 1, "v1"),         # new key inserts
        (1, 2, 2, 1, "v2"),         # (2,0) v3 loses to (2,1)
    ]


def test_no_sequence_field_replaces(spark, warehouse):
    t = warehouse.create_table(
        "db.ups_ns", "k int, v string", options={"upsert-key": "k"},
    )
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    t.write(spark.createDataFrame([(1, "a2"), (3, "c")], "k int, v string"))
    got = sorted((r.k, r.v) for r in t.to_df(spark).collect())
    assert got == [(1, "a2"), (2, "b"), (3, "c")]
    # ambiguous: two batch rows share a key that matches existing rows
    with pytest.raises(ValueError, match="sequence.field"):
        t.write(spark.createDataFrame(
            [(1, "x"), (1, "y")], "k int, v string"))
    # but duplicate keys that match NOTHING simply append (the
    # reference performs no dedup without sequence.field)
    t.write(spark.createDataFrame([(9, "x"), (9, "y")], "k int, v string"))
    assert t.to_df(spark).where(F.col("k") == 9).count() == 2


def test_matched_source_updates_every_duplicate_target(spark, warehouse):
    t = warehouse.create_table(
        "db.ups_dup", "k int, v string", options={"upsert-key": "k"},
    )
    t.write(spark.createDataFrame([(9, "x"), (9, "y")], "k int, v string"))
    # one source matching two duplicate targets updates BOTH (MERGE
    # UpdateAction semantics), never appends
    t.write(spark.createDataFrame([(9, "z")], "k int, v string"))
    assert [(r.k, r.v) for r in t.to_df(spark).collect()] == [(9, "z"), (9, "z")]


def test_multi_field_sequence_is_lexicographic(spark, ut):
    """(ts1,ts2) compares as a record (UserDefinedSeqComparator is a
    multi-field comparator), NOT per-field: incoming (2,3) beats
    existing (1,5) even though 3 < 5."""
    ut.write(spark.createDataFrame([(7, 7, 1, 5, "old")], DDL))
    ut.refresh().write(spark.createDataFrame([(7, 7, 2, 3, "new")], DDL))
    [r] = ut.refresh().to_df(spark).collect()
    assert (r.ts1, r.ts2, r.v) == (2, 3, "new")
    # and the reverse: incoming (1,9) loses to existing (2,3)
    ut.refresh().write(spark.createDataFrame([(7, 7, 1, 9, "x")], DDL))
    [r] = ut.refresh().to_df(spark).collect()
    assert (r.ts1, r.ts2, r.v) == (2, 3, "new")


def test_null_sequence_is_always_oldest(spark, ut):
    """A NULL version is the comparator's null branch — OLDEST in both
    sort orders: an existing NULL-versioned row loses to any incoming
    version, a NULL-vs-NULL tie falls to the batch row (later input),
    and an incoming NULL never displaces a non-null version."""
    ut.write(spark.createDataFrame([(1, 1, None, None, "nul")], DDL))
    # NULL vs NULL tie -> later input wins
    ut.refresh().write(spark.createDataFrame([(1, 1, None, None, "nul2")], DDL))
    [r] = ut.refresh().to_df(spark).collect()
    assert r.v == "nul2"
    # non-null incoming replaces the NULL-versioned row
    ut.refresh().write(spark.createDataFrame([(1, 1, 1, 1, "real")], DDL))
    [r] = ut.refresh().to_df(spark).collect()
    assert (r.ts1, r.v) == (1, "real")
    # incoming NULL loses to the existing non-null version
    ut.refresh().write(spark.createDataFrame([(1, 1, None, 9, "back")], DDL))
    [r] = ut.refresh().to_df(spark).collect()
    assert (r.ts1, r.v) == (1, "real")


def test_descending_null_version_never_wins_window(spark, warehouse):
    """Under sort-order=descending the intra-batch winner window sorts
    ascending; Spark's asc default is NULLS FIRST, which would crown a
    NULL-versioned row. Nulls must sort last in both orders."""
    t = warehouse.create_table(
        "db.ups_dnull", "k int, ver int, v string",
        options={
            "upsert-key": "k",
            "sequence.field": "ver",
            "sequence.field.sort-order": "descending",
        },
    )
    t.write(spark.createDataFrame(
        [(1, None, "nul"), (1, 7, "seven"), (1, 3, "three")],
        "k int, ver int, v string",
    ))
    [r] = t.to_df(spark).collect()
    assert (r.ver, r.v) == (3, "three")  # smallest non-null wins
    # existing NULL-versioned row loses to any incoming version
    t2 = warehouse.create_table(
        "db.ups_dnull2", "k int, ver int, v string",
        options={
            "upsert-key": "k",
            "sequence.field": "ver",
            "sequence.field.sort-order": "descending",
        },
    )
    t2.write(spark.createDataFrame([(1, None, "nul")], "k int, ver int, v string"))
    t2.refresh().write(
        spark.createDataFrame([(1, 9, "nine")], "k int, ver int, v string"))
    [r] = t2.refresh().to_df(spark).collect()
    assert (r.ver, r.v) == (9, "nine")


def test_intra_batch_dedup_with_sequence(spark, ut):
    ut.write(spark.createDataFrame([
        (5, 5, 1, 1, "old"), (5, 5, 3, 1, "new"), (5, 5, 2, 1, "mid"),
    ], DDL))
    rows = ut.to_df(spark).collect()
    assert len(rows) == 1 and rows[0].v == "new"


def test_validation(spark, warehouse):
    with pytest.raises(ValueError, match="primary keys"):
        warehouse.create_table(
            "db.ups_bad", "k int, v string", primary_keys=["k"],
            options={"upsert-key": "k"},
        )
    with pytest.raises(ValueError, match="not in schema"):
        warehouse.create_table(
            "db.ups_bad2", "k int, v string",
            options={"upsert-key": "nope"},
        )


def test_sql_insert_routes_through_upsert(spark, warehouse):
    from flink_table_store_spark.sql import SqlSession

    s = SqlSession(spark, warehouse)
    s.sql(
        "CREATE TABLE db.ups_sql (k INT, ts INT, v STRING) TBLPROPERTIES "
        "('upsert-key' = 'k', 'sequence.field' = 'ts')"
    )
    s.sql("INSERT INTO db.ups_sql VALUES (1, 1, 'a'), (2, 1, 'b')")
    s.sql("INSERT INTO db.ups_sql VALUES (1, 2, 'a2'), (1, 0, 'stale')")
    got = sorted(map(tuple, s.sql("SELECT k, v FROM db.ups_sql").collect()))
    assert got == [(1, "a2"), (2, "b")]


def test_file_pruning_keeps_untouched_files(spark, warehouse):
    """Files whose key range excludes the batch are not rewritten."""
    t = warehouse.create_table(
        "db.ups_pr", "k int, v string", options={"upsert-key": "k"},
    )
    t.write(spark.createDataFrame([(i, "lo") for i in range(100)], "k int, v string"))
    snap1 = t.snapshots.latest()
    files_before = {
        e.file_name
        for e in t.manifests.read_live_entries(
            snap1.base_manifest_list, snap1.delta_manifest_list
        )
    }
    # keys far outside the existing range: pure append, no rewrite
    t.write(spark.createDataFrame([(10_000, "hi")], "k int, v string"))
    snap2 = t.snapshots.latest()
    files_after = {
        e.file_name
        for e in t.manifests.read_live_entries(
            snap2.base_manifest_list, snap2.delta_manifest_list
        )
    }
    assert files_before <= files_after  # old files untouched
    assert t.to_df(spark).count() == 101


def test_local_write_refused(spark, warehouse):
    import pandas as pd

    t = warehouse.create_table(
        "db.ups_lw", "k int, v string", options={"upsert-key": "k"},
    )
    with pytest.raises(NotImplementedError, match="upsert-key"):
        t.write_arrow(pd.DataFrame([{"k": 1, "v": "a"}]))


@pytest.mark.parametrize("seed", [5, 23])
@pytest.mark.slow
def test_fuzz_vs_python_replay(spark, warehouse, seed):
    """Seeded batches (with null keys and duplicate in-batch keys)
    against a serial python model of the reference's MERGE rewrite."""
    import random

    random.seed(seed)
    t = warehouse.create_table(
        f"db.ups_fz{seed}", "k int, ts int, v string",
        options={"upsert-key": "k", "sequence.field": "ts"},
    )
    state: dict[object, tuple] = {}
    seq = 0
    for _ in range(5):
        batch = []
        for _ in range(random.randrange(2, 8)):
            k = random.choice([None, *range(8)])
            seq += 1
            batch.append((k, seq if random.random() < 0.8 else seq - 3,
                          f"v{seq}"))
        t.write(spark.createDataFrame(batch, "k int, ts int, v string"))
        # python model: dedupe batch per key by max ts (insertion order
        # breaks ties in favor of the later row via (ts, idx)); then
        # replace existing when existing.ts <= new.ts
        best: dict[object, tuple] = {}
        for i, (k, ts, v) in enumerate(batch):
            if k not in best or (ts, i) >= (best[k][0], best[k][2]):
                best[k] = (ts, v, i)
        for k, (ts, v, _i) in best.items():
            if k not in state or state[k][0] <= ts:
                state[k] = (ts, v)
    got = {r.k: (r.ts, r.v) for r in t.to_df(spark).collect()}
    assert got == state, seed


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("order", ["ascending", "descending"])
@pytest.mark.slow
def test_fuzz_multifield_sequence_replay(spark, warehouse, seed, order):
    """Seeded fuzz of the r9-session-3 upsert fixes: MULTI-FIELD
    sequences compare lexicographically (not per-field AND), NULL
    versions are always OLDEST in both sort orders (the reference
    comparator's null branch precedes the direction flip), and ties
    fall to the later input."""
    import random

    rng = random.Random(7000 + seed)
    t = warehouse.create_table(
        f"db.ups_mfz_{order}_{seed}", "k int, s1 int, s2 int, v string",
        options={
            "upsert-key": "k",
            "sequence.field": "s1,s2",
            "sequence.field.sort-order": order,
        },
    )
    desc = order == "descending"

    def newer_or_equal(a, b):
        """a (incoming) wins over b (existing)? Lexicographic with
        NULL = oldest in BOTH orders; ties -> incoming."""
        def img(x):
            # per-field order image: None is ALWAYS lowest; descending
            # negates the non-null values only
            return tuple(
                (0,) if f is None else (1, -f if desc else f) for f in x
            )
        return img(a) >= img(b)

    state: dict[int, tuple] = {}
    n = 0
    for _ in range(6):
        batch = []
        for k in rng.sample(range(6), rng.randint(1, 4)):
            s1 = rng.choice([None, *range(4)])
            s2 = rng.choice([None, *range(4)])
            n += 1
            batch.append((k, s1, s2, f"v{n}"))
        t.refresh().write(
            spark.createDataFrame(batch, "k int, s1 int, s2 int, v string")
        )
        best: dict[int, tuple] = {}
        for row in batch:  # input order; later wins ties
            k, s1, s2, v = row
            if k not in best or newer_or_equal((s1, s2), best[k][:2]):
                best[k] = (s1, s2, v)
        for k, cand in best.items():
            if k not in state or newer_or_equal(cand[:2], state[k][:2]):
                state[k] = cand
    got = {r.k: (r.s1, r.s2, r.v) for r in t.refresh().to_df(spark).collect()}
    assert got == state, (order, seed)
