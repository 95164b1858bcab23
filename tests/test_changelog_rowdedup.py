"""changelog-producer.row-deduplicate semantics
(FullChangelogMergeFunctionWrapper.java:66-80: with no valueEqualiser —
dedup off, the default — every key that received input emits -U/+U even
when the merged value is unchanged; with dedup on, unchanged values are
suppressed, comparing only the non-ignored fields)."""

from __future__ import annotations

import pytest

from flink_table_store_spark.streaming import changelog_diff


def _pk_table(warehouse, name, options=None):
    return warehouse.create_table(
        f"db.{name}",
        "k bigint, v bigint, note string",
        primary_keys=["k"],
        options=options or {},
    )


def _rows(df):
    return sorted(
        (r.rowkind, r.k, r.v, r.note) for r in df.collect()
    )


def test_default_emits_pairs_for_unchanged_touched_keys(spark, warehouse):
    t = _pk_table(warehouse, "rd1")
    t.write(spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "k bigint, v bigint, note string"))
    # snapshot 2: k=1 rewritten with IDENTICAL values, k=3 new
    t.write(spark.createDataFrame([(1, 10, "a"), (3, 30, "c")], "k bigint, v bigint, note string"))
    diff = changelog_diff(spark, t, 1, 2)
    assert _rows(diff) == [
        ("+I", 3, 30, "c"),
        ("+U", 1, 10, "a"),
        ("-U", 1, 10, "a"),
    ]
    # untouched k=2 emits nothing (it received no input)


def test_row_deduplicate_suppresses_unchanged(spark, warehouse):
    t = _pk_table(
        warehouse, "rd2",
        options={"changelog-producer.row-deduplicate": "true"},
    )
    t.write(spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "k bigint, v bigint, note string"))
    t.write(spark.createDataFrame([(1, 10, "a"), (2, 21, "b")], "k bigint, v bigint, note string"))
    diff = changelog_diff(spark, t, 1, 2)
    assert _rows(diff) == [
        ("+U", 2, 21, "b"),
        ("-U", 2, 20, "b"),
    ]


def test_ignore_fields_skip_comparison(spark, warehouse):
    t = _pk_table(
        warehouse, "rd3",
        options={
            "changelog-producer.row-deduplicate": "true",
            "changelog-producer.row-deduplicate-ignore-fields": "note",
        },
    )
    t.write(spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "k bigint, v bigint, note string"))
    # k=1 changes ONLY the ignored field -> suppressed; k=2 changes v
    t.write(spark.createDataFrame([(1, 10, "z"), (2, 21, "b")], "k bigint, v bigint, note string"))
    diff = changelog_diff(spark, t, 1, 2)
    assert _rows(diff) == [
        ("+U", 2, 21, "b"),
        ("-U", 2, 20, "b"),
    ]


def test_null_transition_detected_with_dedup(spark, warehouse):
    """v -> NULL must emit a pair (null-safe struct comparison)."""
    t = _pk_table(
        warehouse, "rd4",
        options={"changelog-producer.row-deduplicate": "true"},
    )
    t.write(spark.createDataFrame([(1, 10, "a")], "k bigint, v bigint, note string"))
    t.write(spark.createDataFrame([(1, None, "a")], "k bigint, v bigint, note string"))
    diff = changelog_diff(spark, t, 1, 2)
    assert _rows(diff) == [
        ("+U", 1, None, "a"),
        ("-U", 1, 10, "a"),
    ]


def test_explicit_arg_overrides_option(spark, warehouse):
    t = _pk_table(warehouse, "rd5")
    t.write(spark.createDataFrame([(1, 10, "a")], "k bigint, v bigint, note string"))
    t.write(spark.createDataFrame([(1, 10, "a")], "k bigint, v bigint, note string"))
    assert changelog_diff(spark, t, 1, 2).count() == 2  # default: touched
    assert changelog_diff(spark, t, 1, 2, row_deduplicate=True).count() == 0


def test_compaction_persisted_changelog_respects_option(spark, warehouse):
    """Full-compaction producer: the persisted changelog files follow
    the table's row-deduplicate option."""
    from flink_table_store_spark.streaming.changelog import persisted_changelog

    t = _pk_table(
        warehouse, "rd6",
        options={
            "changelog-producer": "full-compaction",
            "changelog-producer.row-deduplicate": "true",
        },
    )
    t.write(spark.createDataFrame([(1, 10, "a")], "k bigint, v bigint, note string"))
    snap = t.compact(spark, full=True)
    t.write(spark.createDataFrame([(1, 10, "a")], "k bigint, v bigint, note string"))
    snap = t.refresh().compact(spark, full=True)
    cl = persisted_changelog(spark, t, snap.id)
    assert cl is None or cl.count() == 0  # unchanged value, deduped away
