"""metadata.stats-mode (CoreOptions.java:1398-1427): none / counts /
truncate(N) / full, with fields.<f>.stats-mode overrides. Truncated
bounds must stay sound for pruning and refuse exact-answer pushdown."""

from __future__ import annotations

import pytest

from flink_table_store_spark import predicate as P
from flink_table_store_spark.manifest import apply_stats_mode, _increment_string


def _entry_stats(t, col):
    snap = t.snapshots.latest()
    return [
        e.stats.get(col)
        for e in t.manifests.read_live_entries(
            snap.base_manifest_list, snap.delta_manifest_list
        )
    ]


def test_truncate_default_bounds_long_strings(spark, warehouse):
    t = warehouse.create_table("db.sm1", "k bigint, v string")
    long_lo = "a" * 40
    long_hi = "z" * 40
    t.write(
        spark.createDataFrame(
            [(1, long_lo), (2, long_hi)], "k bigint, v string"
        ).coalesce(1)
    )
    [st] = [s for s in _entry_stats(t, "v") if s is not None]
    assert st["min"] == "a" * 16  # prefix: sound lower bound
    assert st["max"] == "z" * 15 + "{"  # bumped past the truncation
    assert st["trunc"] is True
    assert len(st["max"]) <= 16
    # pruning stays sound: the real values still match their file
    rows = t.to_df(spark, predicate=P.equal("v", long_hi)).collect()
    assert len(rows) == 1
    # ...and a probe past every real value returns nothing: the
    # inflated max keeps the file un-pruned, the residual filter drops
    # its rows (conservative, correct)
    assert t.to_df(spark, predicate=P.greater_than("v", "z" * 41)).count() == 0


def test_stats_mode_none_and_counts(spark, warehouse):
    t = warehouse.create_table(
        "db.sm2", "k bigint, v string",
        options={"metadata.stats-mode": "none"},
    )
    t.write(spark.createDataFrame([(1, "abc")], "k bigint, v string"))
    assert _entry_stats(t, "v") == [None]
    assert _entry_stats(t, "k") == [None]
    # reads still work without stats (no pruning, no data loss)
    assert t.to_df(spark, predicate=P.equal("k", 1)).count() == 1

    t2 = warehouse.create_table(
        "db.sm3", "k bigint, v string",
        options={"metadata.stats-mode": "counts"},
    )
    t2.write(spark.createDataFrame([(1, "abc")], "k bigint, v string"))
    [st] = _entry_stats(t2, "v")
    assert st == {"min": None, "max": None, "nulls": 0}


def test_per_field_override(spark, warehouse):
    t = warehouse.create_table(
        "db.sm4", "k bigint, v string",
        options={"fields.v.stats-mode": "none"},
    )
    t.write(spark.createDataFrame([(7, "abc")], "k bigint, v string"))
    assert _entry_stats(t, "v") == [None]
    [kst] = _entry_stats(t, "k")
    assert kst["min"] == 7  # default mode still applies to k


def test_agg_pushdown_refuses_truncated(spark, warehouse):
    t = warehouse.create_table("db.sm5", "k bigint, v string")
    t.write(spark.createDataFrame([(1, "x" * 40)], "k bigint, v string"))
    assert t.min_max("v") is None  # truncated: not an exact answer
    assert t.min_max("k") == (1, 1)  # numeric untouched
    t2 = warehouse.create_table(
        "db.sm6", "k bigint, v string",
        options={"metadata.stats-mode": "counts"},
    )
    t2.write(spark.createDataFrame([(1, "abc")], "k bigint, v string"))
    assert t2.min_max("k") is None  # counts mode: no bounds at all


def test_local_writer_applies_mode(spark, warehouse):
    import pyarrow as pa

    t = warehouse.create_table(
        "db.sm7", "k bigint, v string",
        options={"metadata.stats-mode": "counts"},
    )
    t.write_arrow(pa.table({"k": [1], "v": ["abc"]}))
    [st] = _entry_stats(t, "v")
    assert st["min"] is None and st["max"] is None
    # the sequence high-water mark is structural, never dropped
    snap = t.snapshots.latest()
    [e] = t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    )
    assert e.max_seq >= 0


def test_increment_string_edges():
    assert _increment_string("abc") == "abd"
    assert _increment_string("ab" + chr(0x10FFFF)) == "ac"
    assert _increment_string(chr(0x10FFFF)) is None
    # surrogate range skipped
    assert _increment_string(chr(0xD7FF)) == chr(0xE000)


def test_unknown_mode_refused():
    with pytest.raises(ValueError, match="stats-mode"):
        apply_stats_mode({"metadata.stats-mode": "telepathy"}, {"v": {"min": 1}})


def test_merge_ordering_survives_stats_none(spark, warehouse):
    """PK merge uses the structural sequence, not user stats — stats-mode
    none must not break upserts."""
    t = warehouse.create_table(
        "db.sm8", "k bigint, v string", primary_keys=["k"],
        options={"metadata.stats-mode": "none"},
    )
    t.write(spark.createDataFrame([(1, "old")], "k bigint, v string"))
    t.write(spark.createDataFrame([(1, "new")], "k bigint, v string"))
    [r] = t.to_df(spark).collect()
    assert r.v == "new"
    t.compact(spark, full=True)
    [r] = t.refresh().to_df(spark).collect()
    assert r.v == "new"
