"""Row tracking: stable _ROW_ID on append tables (RowTrackingTable)."""

from __future__ import annotations

import pytest


def _batch(spark, lo, hi, pt="a"):
    return spark.createDataFrame(
        [(i, pt, f"v{i}") for i in range(lo, hi)], "id bigint, pt string, v string"
    )


@pytest.fixture()
def t(spark, warehouse):
    return warehouse.create_table(
        "db.rt",
        "id bigint, pt string, v string",
        partition_keys=["pt"],
        options={"row-tracking.enabled": "true"},
    )


def test_row_ids_unique_and_stable(spark, t):
    t.write(_batch(spark, 0, 10, "a"))
    t = t.refresh()
    first = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    assert len(set(first.values())) == 10
    assert t.snapshots.latest().next_row_id == 10

    t.write(_batch(spark, 10, 15, "b"))
    t = t.refresh()
    rows = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    assert len(rows) == 15 and len(set(rows.values())) == 15
    # earlier rows keep their ids; new rows extend the id space
    assert all(rows[i] == first[i] for i in range(10))
    assert t.snapshots.latest().next_row_id == 15

    # system-table surface
    sys_rows = t.system_table(spark, "row_tracking").collect()
    assert {r._ROW_ID for r in sys_rows} == set(rows.values())


def test_row_tracking_requires_append_table(spark, warehouse):
    pk = warehouse.create_table(
        "db.rt_pk",
        "k bigint, v string",
        primary_keys=["k"],
        options={"bucket": "1", "row-tracking.enabled": "true"},
    )
    assert not pk.row_tracking_enabled()
    with pytest.raises(RuntimeError):
        pk.row_tracking_df(spark)


def test_row_ids_allocated_at_commit_not_write(spark, t):
    # two writes from the same base snapshot — commit-time allocation
    # (inside the CAS loop) must still produce disjoint ranges
    t.write(_batch(spark, 0, 5, "a"))
    t.write(_batch(spark, 5, 9, "a"))
    t = t.refresh()
    ids = [r._ROW_ID for r in t.row_tracking_df(spark).collect()]
    assert sorted(ids) == list(range(9))


def test_row_ids_survive_compaction(spark, t):
    """VERDICT r3 task 8 (SpecialFields row-id stability): compaction
    materializes ids as a stored _ROW_ID column, so $row_tracking is
    identical before and after maintenance, and later writes keep
    allocating above the high-water mark."""
    t.write(_batch(spark, 0, 10, "a"))
    t = t.refresh()
    t.write(_batch(spark, 10, 20, "a"))
    t = t.refresh()
    before = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    assert len(before) == 20

    t.compact(spark, full=True)
    t = t.refresh()
    after = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    assert after == before, "compaction must not reassign row ids"

    # double maintenance: a second rewrite reads the STORED ids back
    t.compact(spark, full=True)
    t = t.refresh()
    assert {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()} == before

    # new writes continue above the high-water mark — no id collisions
    t.write(_batch(spark, 20, 25, "a"))
    t = t.refresh()
    final = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    assert {k: v for k, v in final.items() if k < 20} == before
    assert len(set(final.values())) == 25
    assert min(v for k, v in final.items() if k >= 20) >= 20


def test_row_ids_survive_sort_compact(spark, t):
    t.write(_batch(spark, 0, 30, "a"))
    t = t.refresh()
    before = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    t.sort_compact(spark, ["id"], strategy="order", num_files=2)
    t = t.refresh()
    after = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    assert after == before
    # ordinary reads don't leak the stored column
    assert "_ROW_ID" not in t.to_df(spark).columns


def test_row_ids_survive_cow_delete_and_update(spark, t):
    """Review finding: copy-on-write delete/update rewrites must carry
    surviving rows' _ROW_ID like compaction does."""
    from flink_table_store_spark import predicate as P

    t.write(_batch(spark, 0, 20, "a"))
    t = t.refresh()
    before = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    t.delete(spark, P.less_than("id", 5))
    t = t.refresh()
    after = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    assert after == {k: v for k, v in before.items() if k >= 5}
    assert all(v is not None for v in after.values())

    t.update(spark, P.equal("id", 7), {"v": "UPDATED"})
    t = t.refresh()
    rows = {r.id: (r._ROW_ID, r.v) for r in t.row_tracking_df(spark).collect()}
    assert rows[7] == (before[7], "UPDATED")  # same id, new value


def test_row_ids_survive_rewrite_then_schema_evolution(spark, t):
    """Fuzz-found (seed 7002): after evolution, old-generation files mix
    rewrite files (stored _ROW_ID) with fresh ones (no column); schema
    INFERENCE sampled one footer and flakily dropped the stored column.
    Reads now use the writer generation's explicit stored schema."""
    from flink_table_store_spark import predicate as P

    t.write(_batch(spark, 0, 9, "a"))
    t = t.refresh()
    t.delete(spark, P.and_(P.greater_or_equal("id", 3), P.less_than("id", 9)))
    t = t.refresh()
    t.sort_compact(spark, ["id"], strategy="order", num_files=2)
    t = t.refresh()
    before = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    t.write(_batch(spark, 20, 22, "a"))  # fresh file WITHOUT the stored column
    t = t.refresh()
    t.evolve_schema([{"action": "add_column", "name": "c0", "type": "bigint"}])
    t = t.refresh()
    ids = {r.id: r._ROW_ID for r in t.row_tracking_df(spark).collect()}
    assert all(v is not None for v in ids.values()), ids
    assert {k: v for k, v in ids.items() if k < 20} == before
