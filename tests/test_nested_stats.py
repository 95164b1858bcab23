"""Nested-field stats + pruning (VERDICT r3 task 4): one level of
struct leaves gets min/max/nulls in every stats collector (parquet
footer walk, distributed stats job, fused index job), the predicate AST
addresses dotted paths, and scan planning skips files on them.
Reference: SchemaEvolutionUtil nested paths + stats evaluation in
KeyValueFileStoreScan."""

from __future__ import annotations

import os

from flink_table_store_spark import predicate as P

DDL = "k bigint, s struct<x: bigint, y: string>, arr array<int>"


def _write_three_files(spark, t):
    # three commits -> three files with disjoint s.x ranges
    for base in (0, 100, 200):
        rows = [(base + i, (base + i, f"v{base + i}"), [1, 2]) for i in range(10)]
        t.write(spark.createDataFrame(rows, DDL).coalesce(1))
    return t.refresh()


def test_footer_stats_include_struct_leaves(spark, warehouse):
    t = warehouse.create_table("db.nested1", DDL)
    t = _write_three_files(spark, t)
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    assert len(entries) == 3
    for e in entries:
        assert "s.x" in e.stats, sorted(e.stats)
        assert "s.y" in e.stats
        assert e.stats["s.x"]["min"] is not None
        # array internals must NOT get bogus stats entries
        assert not any(c.startswith("arr.") for c in e.stats)
    lo = min(e.stats["s.x"]["min"] for e in entries)
    hi = max(e.stats["s.x"]["max"] for e in entries)
    assert (lo, hi) == (0, 209)


def test_nested_predicate_prunes_files_and_filters_rows(spark, warehouse):
    t = warehouse.create_table("db.nested2", DDL)
    t = _write_three_files(spark, t)
    from flink_table_store_spark import read as read_mod

    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    pred = P.greater_or_equal("s.x", 200)
    plan = read_mod.plan_scan(entries, t.schema, pred, None, t.path)
    assert len(plan.raw_entries) == 1, "stats must skip 2 of 3 files"
    got = sorted(r.k for r in t.to_df(spark, predicate=pred).collect())
    assert got == list(range(200, 210))
    # equality on the string leaf too
    got2 = [r.k for r in t.to_df(spark, predicate=P.equal("s.y", "v105")).collect()]
    assert got2 == [105]


def test_distributed_stats_include_struct_leaves(spark, warehouse):
    t = warehouse.create_table(
        "db.nested3", DDL, options={"commit.distributed-stats-threshold": "0"}
    )
    t = _write_three_files(spark, t)
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    for e in entries:
        assert e.stats.get("s.x", {}).get("min") is not None
    pred = P.less_than("s.x", 10)
    from flink_table_store_spark import read as read_mod

    plan = read_mod.plan_scan(entries, t.schema, pred, None, t.path)
    assert len(plan.raw_entries) == 1


def test_fused_index_job_stats_include_struct_leaves(spark, warehouse):
    t = warehouse.create_table(
        "db.nested4", DDL, options={"file-index.bloom-filter.columns": "k"}
    )
    t = _write_three_files(spark, t)
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    for e in entries:
        assert e.stats.get("s.x", {}).get("min") is not None, sorted(e.stats)
        assert e.stats.get("k", {}).get("bloom") or e.stats.get("k"), "index still present"


def test_nested_leaf_bloom_and_bitmap_index(spark, warehouse):
    """File indexes on struct leaves: bloom on s.x prunes files whose
    bitset excludes the literal; bitmap value-set on s.y answers
    equality exactly — one nesting level, like the stats."""
    from flink_table_store_spark import fileindex
    from flink_table_store_spark import read as read_mod

    ddl = "k bigint, s struct<x: bigint, y: string>"
    t = warehouse.create_table(
        "db.nested_idx",
        ddl,
        options={
            "file-index.bloom-filter.columns": "s.x",
            "file-index.bitmap.columns": "s.y",
        },
    )
    for base, tag in ((0, "aa"), (1000, "bb"), (2000, "cc")):
        t.write(
            spark.createDataFrame(
                [(base + i, (base + i, tag)) for i in range(40)], ddl
            ).coalesce(1)
        )
    t = t.refresh()
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    assert len(entries) == 3
    from flink_table_store_spark.fileindex import INDEX_KEY

    for e in entries:
        sidecar_cols = (e.stats.get(INDEX_KEY) or {}).get("cols") or {}
        assert "bloom" in (e.stats.get("s.x") or {}) or "s.x" in sidecar_cols, sorted(e.stats)
        assert "values" in (e.stats.get("s.y") or {}) or "s.y" in sidecar_cols

    # bloom: equality on s.x with stats overlap broken only by bitset.
    # All files span disjoint ranges here, so FORCE the min/max to tie
    # by probing a value inside one file's range: plan must pick 1 file.
    pred = P.equal("s.x", 1017)
    fileindex.attach_bloom_positions(spark, pred, t.schema)
    plan = read_mod.plan_scan(entries, t.schema, pred, None, t.path)
    assert len(plan.raw_entries) == 1
    assert [r.k for r in t.to_df(spark, predicate=pred).collect()] == [1017]

    # bitmap value set on the string leaf: NOT IN and equality
    plan2 = read_mod.plan_scan(entries, t.schema, P.equal("s.y", "bb"), None, t.path)
    assert len(plan2.raw_entries) == 1
    got = sorted(r.k for r in t.to_df(spark, predicate=P.equal("s.y", "bb")).collect())
    assert got == list(range(1000, 1040))


def test_nested_schema_evolution_add_drop_retype(spark, warehouse):
    """Nested column ops (SchemaChange.java:84-163): add / drop /
    update_type on struct leaves; old-generation rows adapt by subfield
    id (added -> null, dropped -> gone, retyped -> cast), and a NULL
    struct stays null. Nested RENAME is supported too — subfield ids
    (DataField subs) keep the leaf's identity across generations."""
    ddl0 = "k bigint, s struct<x: int, y: string>"
    t = warehouse.create_table("db.nested_evo", ddl0)
    t.write(spark.createDataFrame([(1, (7, "old")), (2, None)], ddl0))
    t = t.refresh()
    t.evolve_schema(
        [
            {"action": "add_column", "name": "s.z", "type": "double"},
            {"action": "update_column_type", "name": "s.x", "type": "bigint"},
            {"action": "drop_column", "name": "s.y"},
        ]
    )
    t = t.refresh()
    assert t.schema.field("s").type == "struct<x:bigint,z:double>"
    ddl1 = "k bigint, s struct<x: bigint, z: double>"
    t.write(spark.createDataFrame([(3, (9, 2.5))], ddl1))
    t = t.refresh()
    rows = {r.k: (None if r.s is None else (r.s.x, r.s.z)) for r in t.to_df(spark).collect()}
    assert rows == {1: (7, None), 2: None, 3: (9, 2.5)}
    # stats of the NEW generation cover the retyped/added leaves
    snap = t.snapshots.latest()
    es = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    newest = [e for e in es if e.schema_id == t.schema.id]
    assert newest and all("s.x" in e.stats and "s.z" in e.stats for e in newest)
    # nested rename: every OLD generation (ddl0's int x, ddl1's bigint
    # x) must still read its data under the new leaf name
    t.evolve_schema([{"action": "rename_column", "name": "s.x", "new_name": "w"}])
    t = t.refresh()
    assert t.schema.field("s").type == "struct<w:bigint,z:double>"
    rows = {r.k: (None if r.s is None else (r.s.w, r.s.z)) for r in t.to_df(spark).collect()}
    assert rows == {1: (7, None), 2: None, 3: (9, 2.5)}


def test_nested_rename_and_multilevel_evolution(spark, warehouse):
    """Round-5 nested field ids: rename at depth 2, add/drop at depth 2,
    and reads of three generations mixing all of it (reference
    DataField.java recursive ids; SchemaChange nested ops)."""
    ddl0 = "k bigint, s struct<a: struct<x: int, y: string>, b: bigint>"
    t = warehouse.create_table("db.nested_deep", ddl0)
    t.write(spark.createDataFrame([(1, ((10, "g0"), 100)), (2, (None, 200))], ddl0))
    t = t.refresh()
    t.evolve_schema(
        [
            {"action": "rename_column", "name": "s.a.x", "new_name": "xx"},
            {"action": "add_column", "name": "s.a.z", "type": "double"},
            {"action": "update_column_type", "name": "s.a.y", "type": "string"},
        ]
    )
    t = t.refresh()
    assert t.schema.field("s").type == "struct<a:struct<xx:int,y:string,z:double>,b:bigint>"
    ddl1 = "k bigint, s struct<a: struct<xx: int, y: string, z: double>, b: bigint>"
    t.write(spark.createDataFrame([(3, ((30, "g1", 3.5), 300))], ddl1))
    t = t.refresh()
    got = {
        r.k: (None if r.s.a is None else (r.s.a.xx, r.s.a.y, r.s.a.z), r.s.b)
        for r in t.to_df(spark).collect()
    }
    assert got == {
        1: ((10, "g0", None), 100),  # old x reads as xx BY ID
        2: (None, 200),  # null inner struct stays null
        3: ((30, "g1", 3.5), 300),
    }
    # second rename of the SAME leaf: identity survives two renames
    t.evolve_schema([{"action": "rename_column", "name": "s.a.xx", "new_name": "xxx"}])
    # and a deep drop
    t.evolve_schema([{"action": "drop_column", "name": "s.a.y"}])
    t = t.refresh()
    assert t.schema.field("s").type == "struct<a:struct<xxx:int,z:double>,b:bigint>"
    got = {
        r.k: None if r.s.a is None else (r.s.a.xxx, r.s.a.z)
        for r in t.to_df(spark).collect()
    }
    assert got == {1: (10, None), 2: None, 3: (30, 3.5)}
    # renamed top-level column keeps nested ids working underneath
    t.evolve_schema([{"action": "rename_column", "name": "s", "new_name": "s2"}])
    t = t.refresh()
    got = {
        r.k: None if r.s2.a is None else r.s2.a.xxx for r in t.to_df(spark).collect()
    }
    assert got == {1: 10, 2: None, 3: 30}


def test_deep_nested_stats_prune_files(spark, warehouse):
    """Depth-2 struct leaves get footer stats and prune files through
    the ordinary predicate path (round-5 deeper statable paths)."""
    from flink_table_store_spark import read as read_mod

    ddl = "k bigint, s struct<a: struct<x: bigint, y: string>, b: bigint>"
    t = warehouse.create_table("db.nested_deep_stats", ddl)
    for base in (0, 100, 200):
        t.write(
            spark.createDataFrame(
                [(base + i, ((base + i, f"v{base + i}"), base)) for i in range(10)], ddl
            ).coalesce(1)
        )
    t = t.refresh()
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    assert len(entries) == 3
    for e in entries:
        assert "s.a.x" in e.stats and "s.a.y" in e.stats and "s.b" in e.stats, sorted(e.stats)
    pred = P.greater_or_equal("s.a.x", 200)
    plan = read_mod.plan_scan(entries, t.schema, pred, None, t.path)
    assert len(plan.raw_entries) == 1, "depth-2 stats must skip 2 of 3 files"
    got = sorted(r.k for r in t.to_df(spark, predicate=pred).collect())
    assert got == list(range(200, 210))


def test_nested_rename_rejected_on_pre_id_generations(spark, warehouse):
    """A table whose OLD generations lack subfield ids must reject
    nested rename even after a later add/drop materialized ids — those
    old files can only name-match and would silently null the column
    (round-5 review finding)."""
    import pytest

    ddl = "k bigint, s struct<x: int, y: string>"
    t = warehouse.create_table("db.nested_preid", ddl)
    t.write(spark.createDataFrame([(1, (7, "a"))], ddl))
    # simulate a pre-nested-id generation: strip subs from schema-0
    import json
    import os

    p = os.path.join(t.path, "schema", "schema-0")
    d = json.load(open(p))
    for f in d["fields"]:
        f.pop("subFields", None)
    json.dump(d, open(p, "w"))
    t = t.refresh()
    # materialize ids via an add — rename must STILL be rejected
    t.evolve_schema([{"action": "add_column", "name": "s.z", "type": "double"}])
    t = t.refresh()
    with pytest.raises(ValueError, match="nested rename"):
        t.evolve_schema([{"action": "rename_column", "name": "s.x", "new_name": "w"}])
    # non-rename nested evolution still works and reads old files
    t.evolve_schema([{"action": "update_column_type", "name": "s.x", "type": "bigint"}])
    t = t.refresh()
    [r] = t.to_df(spark).collect()
    assert (r.s.x, r.s.y) == (7, "a")
