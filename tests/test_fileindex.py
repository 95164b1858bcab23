"""Embedded bloom file indexes (P9): plan-time whole-file skipping."""

from __future__ import annotations

import pytest
from flink_table_store_spark import fileindex
from flink_table_store_spark import predicate as P
from flink_table_store_spark import read as read_mod


def _mk(spark, warehouse, name="db.bloom"):
    t = warehouse.create_table(
        name,
        "id bigint, v string",
        options={
            "file-index.bloom-filter.columns": "v",
            "file-index.bloom-filter.items": "1000",
        },
    )
    # three commits with disjoint value sets but overlapping min/max
    # ranges, so min/max stats alone cannot skip any file
    t.write(spark.createDataFrame([(1, "aa"), (2, "zz")], "id bigint, v string"))
    t.write(spark.createDataFrame([(3, "ab"), (4, "zy")], "id bigint, v string"))
    t.write(spark.createDataFrame([(5, "ac"), (6, "zx")], "id bigint, v string"))
    return t.refresh()


def _entries(t):
    snap = t.snapshots.latest()
    return t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)


def test_bloom_written_and_prunes(spark, warehouse):
    import json
    import os

    t = _mk(spark, warehouse)
    entries = _entries(t)
    # bloom bitsets (≥1 KB) exceed file-index.in-manifest-threshold: the
    # manifest holds only a sidecar pointer, never the bitset itself
    for e in entries:
        ptr = e.stats.get(fileindex.INDEX_KEY)
        assert ptr and "v" in ptr["cols"]
        assert os.path.exists(os.path.join(t.path, ptr["file"]))
        assert "bits" not in json.dumps(e.stats)
    total = len(entries)

    pred = P.equal("v", "zy")
    fileindex.attach_bloom_positions(spark, pred, t.schema)
    plan = read_mod.plan_scan(entries, t.schema, pred, table_path=t.path)
    assert plan.file_count() < total  # bloom skipped sibling files
    assert [(r.id, r.v) for r in t.to_df(spark, predicate=pred).collect()] == [(4, "zy")]

    absent = P.equal("v", "not-there")
    fileindex.attach_bloom_positions(spark, absent, t.schema)
    assert (
        read_mod.plan_scan(entries, t.schema, absent, table_path=t.path).file_count()
        == 0
    )

    isin = P.isin("v", ["aa", "ac"])
    fileindex.attach_bloom_positions(spark, isin, t.schema)
    got = {
        (r.id, r.v)
        for r in t.to_df(spark, predicate=isin).collect()
    }
    assert got == {(1, "aa"), (5, "ac")}


def test_bloom_never_wrongly_prunes_without_positions(spark, warehouse):
    # un-attached predicates (no plan-time positions) fall back to
    # min/max-only pruning — correctness never depends on the index
    t = _mk(spark, warehouse, "db.bloom2")
    entries = _entries(t)
    plan = read_mod.plan_scan(entries, t.schema, P.equal("v", "zy"))
    assert plan.file_count() >= 1
    assert t.to_df(spark, predicate=P.equal("v", "zy")).count() == 1


def test_bloom_size_mismatch_is_ignored(spark, warehouse):
    t = _mk(spark, warehouse, "db.bloom3")
    entries = _entries(t)
    pred = P.equal("v", "zy")
    fileindex.attach_bloom_positions(spark, pred, t.schema)
    pred.bloom_m = 12345  # as if files were written under a different m
    plan = read_mod.plan_scan(entries, t.schema, pred, table_path=t.path)
    # mismatched m -> bloom skipped, min/max keeps all overlapping files
    assert plan.file_count() >= 1
    assert t.to_df(spark, predicate=pred).count() == 1


def test_bloom_survives_compaction(spark, warehouse):
    import os

    t = _mk(spark, warehouse, "db.bloom4")
    t.compact(spark, full=True)
    t = t.refresh()
    entries = _entries(t)
    pred = P.equal("v", "zz")
    fileindex.attach_bloom_positions(spark, pred, t.schema)
    assert t.to_df(spark, predicate=pred).count() == 1
    # live sidecar index files are referenced, never orphans
    t.expire_snapshots(retain_last=1)
    t.remove_orphan_files(older_than_millis=10**15)
    for e in _entries(t):
        ptr = e.stats.get(fileindex.INDEX_KEY)
        assert ptr and os.path.exists(os.path.join(t.path, ptr["file"]))
    assert t.to_df(spark, predicate=pred).count() == 1


@pytest.mark.slow
def test_python_xxh64_matches_spark(spark):
    """Property check: the pure-Python xxh64 (used for plan-time literal
    hashing) agrees with Spark's xxhash64 for every supported type."""
    import datetime
    import random

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from flink_table_store_spark.xxh64 import spark_xxhash64

    rng = random.Random(7)
    cases = []
    for _ in range(25):
        cases.append((rng.randint(-(2**63), 2**63 - 1), "bigint"))
        cases.append((rng.randint(-(2**31), 2**31 - 1), "int"))
        cases.append((rng.randint(-(2**15), 2**15 - 1), "smallint"))
    for s in ["", "a", "abc", "hello world", "x" * 7, "y" * 8, "z" * 31,
              "w" * 32, "v" * 100, "ünïcodé ✓", "tab\tnl\n"]:
        cases.append((s, "string"))
    cases += [(True, "boolean"), (False, "boolean")]
    for _ in range(10):
        cases.append((rng.uniform(-1e9, 1e9), "double"))
        cases.append(
            (datetime.date(1970, 1, 1) + datetime.timedelta(days=rng.randint(-20000, 20000)), "date")
        )
    cases += [(0.0, "double"), (-0.0, "double")]

    for value, ddl in cases:
        schema = T.StructType([T.StructField("v", T._parse_datatype_string(ddl))])
        expected = (
            spark.createDataFrame([(value,)], schema)
            .select(F.xxhash64("v").alias("h"), F.xxhash64("v", F.lit(3)).alias("h2"))
            .head()
        )
        assert spark_xxhash64([(value, ddl)]) == expected.h, (value, ddl)
        assert spark_xxhash64([(value, ddl), (3, "int")]) == expected.h2, (value, ddl)


def test_bitmap_value_set_index(spark, warehouse):
    t = warehouse.create_table(
        "db.bitmap",
        "id bigint, status string",
        options={"file-index.bitmap.columns": "status"},
    )
    t.write(spark.createDataFrame([(1, "OPEN"), (2, "OPEN")], "id bigint, status string"))
    t.write(spark.createDataFrame([(3, "CLOSED"), (4, "CLOSED")], "id bigint, status string"))
    t.write(spark.createDataFrame([(5, "HOLD"), (6, "OPEN")], "id bigint, status string"))
    t = t.refresh()
    entries = _entries(t)
    assert all("values" in (e.stats.get("status") or {}) for e in entries)
    total = len(entries)

    # exact pruning, no plan-time hashing needed
    plan = read_mod.plan_scan(entries, t.schema, P.equal("status", "HOLD"))
    assert plan.file_count() < total
    assert {r.id for r in t.to_df(spark, predicate=P.equal("status", "HOLD")).collect()} == {5}

    # <> prunes files whose whole value set is the literal
    plan2 = read_mod.plan_scan(entries, t.schema, P.not_equal("status", "OPEN"))
    assert plan2.file_count() < total
    got = {r.id for r in t.to_df(spark, predicate=P.not_equal("status", "OPEN")).collect()}
    assert got == {3, 4, 5}

    # NOT IN covering a file's entire set prunes it
    plan3 = read_mod.plan_scan(entries, t.schema, P.not_in("status", ["OPEN", "HOLD"]))
    assert plan3.file_count() < total
    got3 = {r.id for r in t.to_df(spark, predicate=P.not_in("status", ["OPEN", "HOLD"])).collect()}
    assert got3 == {3, 4}

    assert read_mod.plan_scan(entries, t.schema, P.equal("status", "GONE")).file_count() == 0


def test_rewrite_file_index_keeps_data_files(spark, warehouse):
    """rewrite_file_index rebuilds indexes WITHOUT rewriting data: same
    data file names before/after, fresh index stats, queries still
    prune and return identical results."""
    import os

    t = warehouse.create_table(
        "db.rfi",
        "id bigint, v string",
        options={"file-index.bloom-filter.columns": "v"},
    )
    t.write(spark.createDataFrame([(1, "aa"), (2, "zz")], "id bigint, v string").coalesce(1))
    t.write(spark.createDataFrame([(3, "ab"), (4, "zy")], "id bigint, v string").coalesce(1))
    t = t.refresh()
    files_before = sorted(e.file_name for e in _entries(t))

    t.rewrite_file_index(spark)
    t = t.refresh()
    entries = _entries(t)
    assert sorted(e.file_name for e in entries) == files_before  # no data rewrite
    for e in entries:
        ptr = e.stats.get(fileindex.INDEX_KEY)
        assert ptr and os.path.exists(os.path.join(t.path, ptr["file"]))

    pred = P.equal("v", "zy")
    fileindex.attach_bloom_positions(spark, pred, t.schema)
    plan = read_mod.plan_scan(entries, t.schema, pred, table_path=t.path)
    assert plan.file_count() == 1
    assert [(r.id, r.v) for r in t.to_df(spark, predicate=pred).collect()] == [(4, "zy")]


def test_range_bitmap_value_set_prunes_between(spark, warehouse):
    """Range-bitmap/BSI projection (P9): low-NDV int column written as
    interleaved commits — every file spans nearly the full min/max
    range, so only the per-file value set can prune a BETWEEN."""
    t = warehouse.create_table(
        "db.rangebm",
        "id bigint, code int",
        options={"file-index.range-bitmap.columns": "code"},
    )
    t.write(spark.createDataFrame([(i, c) for i, c in enumerate([1, 3, 5, 7])], "id bigint, code int").coalesce(1))
    t.write(spark.createDataFrame([(10 + i, c) for i, c in enumerate([2, 4, 6])], "id bigint, code int").coalesce(1))
    t.write(spark.createDataFrame([(20, 1), (21, 7)], "id bigint, code int").coalesce(1))
    t = t.refresh()
    entries = _entries(t)
    total = len(entries)
    assert total == 3

    # min/max can NOT prune: every file overlaps [2,2]; value sets can
    plan = read_mod.plan_scan(entries, t.schema, P.between("code", 2, 2), table_path=t.path)
    assert plan.file_count() == 1
    got = {r.id for r in t.to_df(spark, predicate=P.between("code", 2, 2)).collect()}
    assert got == {10}

    # open ranges prune the same way
    plan_lt = read_mod.plan_scan(entries, t.schema, P.less_than("code", 2), table_path=t.path)
    assert plan_lt.file_count() == 2  # only files containing code=1
    got_lt = {r.id for r in t.to_df(spark, predicate=P.less_than("code", 2)).collect()}
    assert got_lt == {0, 20}

    # nothing in range → zero files planned
    assert (
        read_mod.plan_scan(entries, t.schema, P.between("code", 8, 9), table_path=t.path).file_count()
        == 0
    )


def test_rowgroup_value_sets_prune_inside_files(spark, warehouse):
    """P9 row-granular pruning: a file whose file-level value set spans
    all segments still prunes at ROW-GROUP granularity — the scan reads
    only the selected row groups and results are identical."""
    import os

    import pyarrow.parquet as pq

    from flink_table_store_spark import fileindex
    from flink_table_store_spark import predicate as P

    n = 40_000
    df = (
        spark.range(n)
        .selectExpr(
            "id AS k",
            "CAST(id % 20 AS INT) AS seg",
            "CAST(id AS DOUBLE) AS v",
        )
        .orderBy("seg", "k")
        .coalesce(1)
    )
    t = warehouse.create_table(
        "db.rgprune",
        "k bigint, seg int, v double",
        options={
            "file-index.range-bitmap.columns": "seg",
            "parquet.block.size": "65536",
        },
    )
    t.write(df)
    t = t.refresh()
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(snap.base_manifest_list, snap.delta_manifest_list)
    assert len(entries) == 1
    e = entries[0]
    pf = pq.ParquetFile(os.path.join(t.path, e.file_name))
    assert pf.metadata.num_row_groups > 2, "need several row groups to prune"

    pred = P.equal("seg", 7)
    sel = fileindex.rowgroup_selection(t.path, e, pred)
    assert sel is not None and 0 < len(sel) < pf.metadata.num_row_groups, (
        f"expected a strict row-group subset, got {sel}"
    )
    # selected groups really contain segment 7; unselected ones don't
    for i in range(pf.metadata.num_row_groups):
        has7 = 7 in set(pf.read_row_group(i, columns=["seg"]).column("seg").to_pylist())
        assert (i in sel) == has7

    got = sorted(
        (r.k, r.seg, r.v) for r in t.to_df(spark, predicate=pred).collect()
    )
    assert got == [(k, 7, float(k)) for k in range(n) if k % 20 == 7]

    # a fully-prunable predicate drops the file with an empty selection
    assert fileindex.rowgroup_selection(t.path, e, P.equal("seg", 99)) == []
    assert t.to_df(spark, predicate=P.equal("seg", 99)).count() == 0


def test_empty_write_to_indexed_table(spark, warehouse):
    """An empty batch into a bloom/bitmap-indexed table stages no data
    files; the index build must no-op instead of failing schema
    inference on the empty staging dir."""
    t = warehouse.create_table(
        "db.empty_idx",
        "k bigint, v string",
        options={"file-index.bloom-filter.columns": "k"},
    )
    df = spark.createDataFrame([(1, "a")], "k bigint, v string")
    t.write(df.limit(0))  # must not raise
    t.write(df)
    t.write(df.limit(0))
    assert t.refresh().to_df(spark).count() == 1


def test_fused_commit_stats_match_footer_stats(spark, warehouse):
    """With file indexes configured, per-file stats ride the index job
    (no driver footer walk); the recorded min/max/nulls must encode
    IDENTICALLY to the footer path (dates→iso, Decimal→float) so
    pruning semantics never depend on which path ran."""
    import datetime
    from decimal import Decimal

    ddl = "k bigint, d date, amt decimal(10,2), s string"
    rows = [
        (1, datetime.date(2024, 1, 2), Decimal("10.50"), "aa"),
        (2, datetime.date(2024, 3, 4), Decimal("99.99"), None),
    ]
    t_idx = warehouse.create_table(
        "db.fused_idx", ddl, options={"file-index.bloom-filter.columns": "k"}
    )
    t_idx.write(spark.createDataFrame(rows, ddl).repartition(1))
    t_plain = warehouse.create_table("db.fused_plain", ddl)
    t_plain.write(spark.createDataFrame(rows, ddl).repartition(1))

    def entry(t):
        snap = t.snapshots.latest()
        entries = t.manifests.read_live_entries(
            snap.base_manifest_list, snap.delta_manifest_list
        )
        assert len(entries) == 1, entries
        return entries[0]

    ei, ep = entry(t_idx.refresh()), entry(t_plain.refresh())
    assert ei.row_count == ep.row_count == 2
    for c in ("k", "d", "s"):
        si, sp = ei.stats[c], ep.stats[c]
        assert type(si["min"]) == type(sp["min"]), (c, si, sp)
        assert (si["min"], si["max"], si["nulls"]) == (sp["min"], sp["max"], sp["nulls"]), c
    # decimal: the footer path SKIPS stats (pyarrow can't cast DECIMAL
    # column statistics) — the fused aggregation computes them exactly,
    # in the _json_safe float encoding
    assert "amt" not in ep.stats
    assert ei.stats["amt"] == {"min": 10.5, "max": 99.99, "nulls": 0}


def test_fused_stats_skip_partition_columns(spark, warehouse):
    """Partition-directory values are RE-INFERRED by type when the index
    job reloads staging (a timestamp-like STRING partition comes back as
    TIMESTAMP); recording stats for them would mismatch the real column
    and prune live files. Repro from review: returned 0 rows."""
    from flink_table_store_spark import predicate as P

    ddl = "k bigint, ts string, v double"
    t = warehouse.create_table(
        "db.pt_idx",
        ddl,
        partition_keys=["ts"],
        options={"file-index.bloom-filter.columns": "k"},
    )
    t.write(
        spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-02-02 00:00:00", 2.0)], ddl
        )
    )
    t = t.refresh()
    got = t.to_df(spark, predicate=P.equal("ts", "2024-01-01 00:00:00")).collect()
    assert len(got) == 1 and got[0].k == 1
    snap = t.snapshots.latest()
    for e in t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    ):
        assert "ts" not in e.stats  # partition map is authoritative


def test_fused_stats_keep_bigint_precision(spark, warehouse):
    """Integral min/max above 2^53 must survive the Arrow/pandas hop
    exactly (a nullable int64 agg column coerces to float64 in pandas);
    mixed all-null files in the same batch triggered the coercion."""
    from flink_table_store_spark import predicate as P

    big = (1 << 62) + 12345
    ddl = "k bigint, tag string"
    t = warehouse.create_table(
        "db.bigint_idx", ddl, options={"file-index.bloom-filter.columns": "tag"}
    )
    # two files in one commit: one all-null k, one with the huge value
    df = spark.createDataFrame([(None, "a"), (big, "b")], ddl).repartition(2, "tag")
    t.write(df)
    t = t.refresh()
    snap = t.snapshots.latest()
    entries = t.manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    )
    mins = {e.stats["k"]["min"] for e in entries if e.stats.get("k")}
    assert big in mins  # exact int, not 4.611686018427...e+18
    assert all(
        isinstance(e.stats["k"]["min"], int)
        for e in entries
        if e.stats.get("k", {}).get("min") is not None
    )
    assert t.to_df(spark, predicate=P.equal("k", big)).count() == 1


def test_build_indexes_empty_staging_vs_corrupt_file(spark, tmp_path):
    """Empty staging (no data files) is a clean no-op; a CORRUPT staged
    file must RAISE, not silently commit without indexes/stats."""
    import pytest

    from flink_table_store_spark import fileindex

    empty = tmp_path / "stage_empty"
    empty.mkdir()
    (empty / "_SUCCESS").write_text("")
    assert fileindex.build_indexes(spark, str(empty), ["c"], [], 64) == {}

    bad = tmp_path / "stage_bad"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        fileindex.build_indexes(spark, str(bad), ["c"], [], 64)


def test_driver_pack_matches_distributed_pack(spark, tmp_path):
    """The r11 small-commit fast path (agg rows collected and packed on
    the driver) must produce byte-identical inline/sidecar indexes and
    stats to the distributed mapInPandas pack — same staged files, both
    paths, compared key by key."""
    import json
    import os

    from pyspark.sql import functions as F

    from flink_table_store_spark import fileindex

    staging = str(tmp_path / "stage")
    (
        spark.range(5000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("v"),
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 30).cast("int")).alias("d"),
        )
        .repartition(3)
        .write.mode("overwrite")
        .parquet(staging)
    )

    def _run(threshold):
        # fresh sidecars per run
        for root, _d, fs in os.walk(staging):
            for fn in fs:
                if fn.endswith(fileindex.INDEX_SUFFIX):
                    os.remove(os.path.join(root, fn))
        out = fileindex.build_indexes(
            spark, staging, ["k"], ["v"], 64 * 1024, "parquet", 500,
            with_stats=True, stats_exclude=set(),
            driver_pack_threshold=threshold,
        )
        sidecars = {}
        for root, _d, fs in os.walk(staging):
            for fn in fs:
                if fn.endswith(fileindex.INDEX_SUFFIX):
                    with open(os.path.join(root, fn)) as fh:
                        sidecars[fn] = json.load(fh)
        return out, sidecars

    driver_out, driver_side = _run(threshold=64)     # 3 files <= 64 -> driver pack
    dist_out, dist_side = _run(threshold=0)          # force the mapInPandas path
    assert driver_out == dist_out
    assert driver_side == dist_side
    assert driver_side, "expected sidecar indexes to be written"


def test_driver_pack_byte_bound_forces_distributed(spark, tmp_path, monkeypatch):
    """r12: the driver-pack gate is BYTE-bounded, not just file-counted
    — a high-cardinality bloom column whose estimated collect_set
    positions exceed DRIVER_PACK_MAX_BYTES must take the distributed
    pack even under the 64-file threshold, with identical output."""
    import json
    import os

    from pyspark.sql import functions as F

    from flink_table_store_spark import fileindex

    staging = str(tmp_path / "stage")
    (
        spark.range(3000)
        .select(F.col("id").alias("k"), (F.col("id") % 11).alias("v"))
        .repartition(2)
        .write.mode("overwrite")
        .parquet(staging)
    )

    calls = {"toPandas": 0}
    import pyspark.sql.classic.dataframe as _cdf

    orig = _cdf.DataFrame.toPandas

    def spy(self):
        calls["toPandas"] += 1
        return orig(self)

    monkeypatch.setattr(_cdf.DataFrame, "toPandas", spy)

    def _run():
        for root, _d, fs in os.walk(staging):
            for fn in fs:
                if fn.endswith(fileindex.INDEX_SUFFIX):
                    os.remove(os.path.join(root, fn))
        out = fileindex.build_indexes(
            spark, staging, ["k"], [], 64 * 1024, "parquet", 500,
            with_stats=True, stats_exclude=set(),
            driver_pack_threshold=64,
        )
        side = {}
        for root, _d, fs in os.walk(staging):
            for fn in fs:
                if fn.endswith(fileindex.INDEX_SUFFIX):
                    with open(os.path.join(root, fn)) as fh:
                        side[fn] = json.load(fh)
        return out, side

    # 2 files, ~1500 rows each x K x 8 bytes estimated: above a 1 KB
    # budget -> distributed despite the file count being under 64
    monkeypatch.setattr(fileindex, "DRIVER_PACK_MAX_BYTES", 1024)
    dist_out, dist_side = _run()
    assert calls["toPandas"] == 0, "byte bound should force the distributed pack"

    monkeypatch.setattr(fileindex, "DRIVER_PACK_MAX_BYTES", 64 * 1024 * 1024)
    drv_out, drv_side = _run()
    assert calls["toPandas"] == 1, "under budget the driver pack should engage"
    assert dist_out == drv_out
    assert dist_side == drv_side

    # estimator arithmetic: rows bound beats the m bound for parquet
    files = [
        os.path.join(r, fn)
        for r, _d, fs in os.walk(staging)
        for fn in fs
        if fn.endswith(".parquet")
    ]
    assert fileindex._driver_pack_bytes_ok(files, 1, 0, 64 * 1024)
    assert not fileindex._driver_pack_bytes_ok(files, 10_000, 0, 64 * 1024)
