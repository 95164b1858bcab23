"""Data evolution (reference append/dataevolution/ + operation/
DataEvolutionSplitRead.java): UPDATE on row-tracking append tables
writes COLUMN PATCH files; reads stitch them onto base rows by _ROW_ID."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_table_store_spark import predicate as P

SCHEMA = "k bigint, label string, score double, pt string"
OPTS = {"row-tracking.enabled": "true", "data-evolution.enabled": "true"}


def _mk(spark, warehouse, name="db.de", n=20):
    t = warehouse.create_table(
        name, SCHEMA, partition_keys=["pt"], options=dict(OPTS)
    )
    t.write(spark.createDataFrame(
        [(i, f"l{i}", float(i), "a" if i % 2 else "b") for i in range(n)],
        SCHEMA,
    ))
    return t


def _rows(df):
    return sorted((r.k, r.label, r.score, r.pt) for r in df.collect())


class TestUpdateColumns:
    def test_patch_write_and_stitched_read(self, spark, warehouse):
        t = _mk(spark, warehouse)
        t.update_columns(
            spark, P.less_than("k", 5), {"label": F.lit("LOW")}
        )
        got = {r.k: r.label for r in t.to_df(spark).collect()}
        assert all(got[i] == "LOW" for i in range(5))
        assert all(got[i] == f"l{i}" for i in range(5, 20))
        # only patch files were added — base files untouched
        snap = t.snapshots.latest()
        es = t.manifests.read_live_entries(
            snap.base_manifest_list, snap.delta_manifest_list
        )
        patches = [e for e in es if e.patch_cols]
        assert patches and all(e.patch_cols == ["label"] for e in patches)
        assert sum(1 for e in es if not e.patch_cols) == len(
            [e for e in es if not e.patch_cols]
        )
        # row count unchanged; counts don't see patch rows
        assert t.to_df(spark).count() == 20
        assert t.count_rows() == 20

    def test_later_patch_wins_and_expressions_see_current(self, spark, warehouse):
        t = _mk(spark, warehouse)
        t.update_columns(spark, P.equal("k", 3), {"score": F.lit(100.0)})
        # second update computes FROM the patched value (score+1 = 101)
        t.update_columns(spark, P.equal("k", 3), {"score": "score + 1"})
        got = {r.k: r.score for r in t.to_df(spark).collect()}
        assert got[3] == 101.0
        assert got[4] == 4.0

    def test_predicate_on_patched_column_uses_new_values(self, spark, warehouse):
        t = _mk(spark, warehouse)
        t.update_columns(spark, P.equal("k", 7), {"score": F.lit(-1.0)})
        # scan filter on the PATCHED value: stats pruning must not drop
        # the file whose pre-patch stats exclude -1
        got = t.to_df(spark, predicate=P.less_than("score", 0.0)).collect()
        assert [(r.k, r.score) for r in got] == [(7, -1.0)]
        # and the old value no longer matches
        assert t.to_df(spark, predicate=P.equal("score", 7.0)).count() == 0

    def test_patch_can_set_null(self, spark, warehouse):
        t = _mk(spark, warehouse)
        t.update_columns(spark, P.equal("k", 2),
                         {"label": F.lit(None).cast("string")})
        got = {r.k: r.label for r in t.to_df(spark).collect()}
        assert got[2] is None and got[1] == "l1"

    def test_multi_column_and_unpatched_rows(self, spark, warehouse):
        t = _mk(spark, warehouse)
        t.update_columns(
            spark, P.equal("pt", "a"),
            {"label": F.concat(F.lit("A-"), F.col("label")),
             "score": "score * 10"},
        )
        for r in t.to_df(spark).collect():
            if r.pt == "a":
                assert r.label.startswith("A-") and r.score == r.k * 10.0
            else:
                assert r.label == f"l{r.k}" and r.score == float(r.k)

    def test_row_tracking_table_shows_patched(self, spark, warehouse):
        t = _mk(spark, warehouse)
        t.update_columns(spark, P.equal("k", 1), {"label": F.lit("X")})
        rt = {r._ROW_ID: r.label for r in t.row_tracking_df(spark).collect()}
        assert "X" in rt.values() and len(rt) == 20

    def test_guards(self, spark, warehouse):
        plain = warehouse.create_table("db.plain", SCHEMA, partition_keys=["pt"])
        with pytest.raises(ValueError, match="data-evolution"):
            plain.update_columns(spark, None, {"label": F.lit("x")})
        t = _mk(spark, warehouse, "db.g")
        with pytest.raises(ValueError, match="partition"):
            t.update_columns(spark, None, {"pt": F.lit("z")})
        with pytest.raises(ValueError, match="unknown column"):
            t.update_columns(spark, None, {"nope": F.lit(1)})
        # delete over a patched column refuses loudly
        t.update_columns(spark, P.equal("k", 1), {"score": F.lit(9.0)})
        with pytest.raises(ValueError, match="compact"):
            t.delete(spark, P.greater_than("score", 5.0))
        # partition deletes still fine
        t.delete(spark, P.equal("pt", "b"))
        assert t.to_df(spark).where(F.col("pt") == "b").count() == 0

    def test_aggregate_pushdown_refuses_patched_column(self, spark, warehouse):
        t = _mk(spark, warehouse, "db.agg")
        assert t.min_max("score") == (0.0, 19.0)
        t.update_columns(spark, P.equal("k", 19), {"score": F.lit(-5.0)})
        assert t.min_max("score") is None      # stale stats: not answerable
        assert t.min_max("k") == (0, 19)       # unpatched column still is
        assert t.count_rows() == 20

    @pytest.mark.slow
    def test_format_surface_refuses_patched_table(self, spark, warehouse):
        from flink_table_store_spark.sources.datasource import register_data_source

        register_data_source(spark)
        t = _mk(spark, warehouse, "db.fmt")
        t.update_columns(spark, P.equal("k", 0), {"label": F.lit("x")})
        with pytest.raises(Exception, match="patch"):
            spark.read.format("ftss").load(t.path).collect()


class TestCompactionMaterializes:
    def test_full_compact_consumes_patches(self, spark, warehouse):
        t = _mk(spark, warehouse, "db.cm")
        t.update_columns(spark, P.less_than("k", 10), {"label": F.lit("P")})
        before = _rows(t.to_df(spark))
        t.compact(spark, full=True)
        t2 = warehouse.get_table("db.cm")
        snap = t2.snapshots.latest()
        es = t2.manifests.read_live_entries(
            snap.base_manifest_list, snap.delta_manifest_list
        )
        assert not any(e.patch_cols for e in es)  # patches retired
        assert _rows(t2.to_df(spark)) == before   # values identical
        # row ids survived the materialization
        rt = {r.k: r._ROW_ID for r in t2.row_tracking_df(spark).collect()}
        assert len(set(rt.values())) == 20
        # stats are answerable again post-compaction
        assert t2.min_max("score") == (0.0, 19.0)
        # incremental read of the patch commit shows no phantom rows
        assert t2.incremental_read(spark, 1, 2).count() == 0

    def test_update_after_compact_starts_fresh(self, spark, warehouse):
        t = _mk(spark, warehouse, "db.cm2")
        t.update_columns(spark, P.equal("k", 4), {"score": F.lit(44.0)})
        t.compact(spark, full=True)
        t2 = warehouse.get_table("db.cm2")
        t2.update_columns(spark, P.equal("k", 4), {"score": "score + 1"})
        got = {r.k: r.score for r in t2.to_df(spark).collect()}
        assert got[4] == 45.0


def test_sql_update_routes_to_patches(spark, warehouse):
    """UPDATE through the SQL surface on a data-evolution table writes
    patches, not rewritten rows."""
    from flink_table_store_spark import SqlSession

    t = _mk(spark, warehouse, "db.sqlde")
    s = SqlSession(spark, warehouse)
    s.sql("UPDATE db.sqlde SET score = score + 100 WHERE k < 3")
    got = {r.k: r.score for r in s.sql(
        "SELECT k, score FROM db.sqlde").collect()}
    assert got[0] == 100.0 and got[2] == 102.0 and got[3] == 3.0
    snap = t.snapshots.latest()
    es = warehouse.get_table("db.sqlde").manifests.read_live_entries(
        snap.base_manifest_list, snap.delta_manifest_list
    )
    assert any(e.patch_cols == ["score"] for e in es)


def test_rewrites_guarded_while_patches_live(spark, warehouse):
    """Copy-on-write rewrites and sort compaction refuse while patches
    are live (they would read patch files as rows or strand values);
    DV deletes never mark positions inside patch files."""
    t = _mk(spark, warehouse, "db.gd")
    t.update_columns(spark, P.equal("k", 5), {"score": F.lit(55.0)})
    with pytest.raises(ValueError, match="compact"):
        t._rewrite_files(spark, P.equal("k", 1), lambda df: df)
    with pytest.raises(ValueError, match="compact"):
        t.sort_compact(spark, ["k"])
    # DV delete on an unpatched column works and keeps patched values
    t2 = warehouse.create_table(
        "db.gd2", SCHEMA, partition_keys=["pt"],
        options={**OPTS, "deletion-vectors.enabled": "true"},
    )
    t2.write(spark.createDataFrame(
        [(i, f"l{i}", float(i), "a") for i in range(10)], SCHEMA))
    t2.update_columns(spark, P.equal("k", 3), {"score": F.lit(33.0)})
    t2.delete(spark, P.equal("k", 7))
    got = {r.k: r.score for r in t2.to_df(spark).collect()}
    assert 7 not in got and got[3] == 33.0 and len(got) == 9


@pytest.mark.slow
def test_local_read_stitches_patches(spark, warehouse):
    """to_arrow on a data-evolution table overlays patches without a
    SparkSession involved in the read."""
    t = _mk(spark, warehouse, "db.loc")
    t.update_columns(spark, P.less_than("k", 3), {"label": F.lit("L")})
    t.update_columns(spark, P.equal("k", 0), {"label": F.lit("L0")})
    tbl = warehouse.get_table("db.loc").to_arrow()
    got = {r["k"]: r["label"] for r in tbl.to_pylist()}
    assert got[0] == "L0" and got[1] == "L" and got[2] == "L" and got[3] == "l3"
    assert len(got) == 20
    # parity with the Spark path
    sp = {r.k: r.label for r in t.to_df(spark).collect()}
    assert got == sp
    # predicate on the patched value, evaluated post-stitch
    flt = warehouse.get_table("db.loc").read_builder().with_filter(
        P.equal("label", "L")).to_arrow()
    assert sorted(r["k"] for r in flt.to_pylist()) == [1, 2]


@pytest.mark.parametrize("seed", [1, 7, 23])
@pytest.mark.slow
def test_fuzz_interleavings_vs_oracle(spark, warehouse, seed):
    """Seeded random interleavings of append / update_columns / compact
    replayed against a plain pandas oracle — the merge semantics (latest
    patch per column wins, compaction is value-invariant) must hold
    under any order."""
    import random

    rng = random.Random(seed)
    t = warehouse.create_table(
        f"db.fz{seed}", SCHEMA, partition_keys=["pt"], options=dict(OPTS)
    )
    oracle: dict[int, list] = {}  # k -> [label, score, pt]
    next_k = 0

    def op_append():
        nonlocal next_k
        n = rng.randint(1, 6)
        rows = []
        for _ in range(n):
            k = next_k
            next_k += 1
            r = [k, f"l{k}", float(k), rng.choice(["a", "b"])]
            rows.append(tuple(r))
            oracle[k] = r[1:]
        t.write(spark.createDataFrame(rows, SCHEMA))

    def op_update():
        if not oracle:
            return
        lo = rng.randrange(0, next_k)
        hi = rng.randrange(lo, next_k) + 1
        col = rng.choice(["label", "score"])
        if col == "label":
            val = f"u{rng.randint(0, 99)}"
            expr = F.lit(val)
        else:
            val = float(rng.randint(0, 999))
            expr = F.lit(val)
        t.update_columns(
            spark,
            P.greater_or_equal("k", lo) & P.less_than("k", hi),
            {col: expr},
        )
        for k in range(lo, hi):
            if k in oracle:
                oracle[k][0 if col == "label" else 1] = val

    def op_compact():
        t.compact(spark, full=True)

    ops = [op_append, op_update, op_update, op_compact]
    op_append()  # non-empty start
    for _ in range(8):
        rng.choice(ops)()
    got = sorted((r.k, r.label, r.score, r.pt) for r in t.to_df(spark).collect())
    want = sorted((k, v[0], v[1], v[2]) for k, v in oracle.items())
    assert got == want
    # the local path agrees (skip when DVs exist — none are created here)
    loc = sorted(
        (r["k"], r["label"], r["score"], r["pt"])
        for r in warehouse.get_table(f"db.fz{seed}").to_arrow().to_pylist()
    )
    assert loc == want


def test_doctor_and_files_table_report_patches(spark, warehouse):
    t = _mk(spark, warehouse, "db.doc")
    t.update_columns(spark, P.less_than("k", 5), {"label": F.lit("x")})
    files = t.system_table(spark, "files")
    patch_rows = files.where(F.col("patch_cols").isNotNull()).collect()
    assert patch_rows and all(r.patch_cols == "label" for r in patch_rows)
    from flink_table_store_spark.doctor import doctor

    rep = doctor(spark, warehouse.get_table("db.doc"))
    assert rep["files"]["patch_files"] >= 1
    assert any("patch" in f for f in rep["findings"])
    t.compact(spark, full=True)
    rep2 = doctor(spark, warehouse.get_table("db.doc"))
    assert "patch_files" not in rep2["files"]


@pytest.mark.slow
def test_distributed_planner_does_not_stats_prune_patched_cols(spark, warehouse):
    """Above the distributed-manifest threshold, stats pruning must not
    drop base files whose PRE-patch values fail the predicate."""
    t = warehouse.create_table(
        "db.dist", SCHEMA, partition_keys=["pt"],
        options={**OPTS, "scan.manifest.distributed-threshold": "1"},
    )
    t.write(spark.createDataFrame(
        [(i, f"l{i}", float(i), "a") for i in range(10)], SCHEMA))
    t.update_columns(spark, P.equal("k", 2), {"score": F.lit(-9.0)})
    got = t.to_df(spark, predicate=P.less_than("score", 0.0)).collect()
    assert [(r.k, r.score) for r in got] == [(2, -9.0)]
