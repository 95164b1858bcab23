"""Chain table (reference ChainGroupReadTable.java, chain-table.md):
snapshot + delta branches, full/incremental/hybrid reads, chain merge
parity vs whole-history merge, and chain compaction."""

from __future__ import annotations

import pytest

# r12 fast-tier split: this module is SLOW-tier (long fuzz loops /
# integration matrices); run `-m ""` for the full suite.
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from flink_table_store_spark import predicate as P
from flink_table_store_spark.chain import chain_compact, chain_read

SCHEMA = "dt string, t1 string, t2 string, t3 string"


def _mk_chain(spark, warehouse, name="db.chain", options=None):
    opts = {
        "chain-table.enabled": "true",
        "bucket": "2",
        "bucket-key": "t1",
        "sequence.field": "t2",
    }
    opts.update(options or {})
    t = warehouse.create_table(
        name, SCHEMA, partition_keys=["dt"],
        primary_keys=["dt", "t1"], options=opts,
    )
    t.create_branch("snapshot")
    t.create_branch("delta")
    return t


def _w(spark, bt, rows):
    bt.write(spark.createDataFrame(rows, SCHEMA))


class TestDocExample:
    """The exact scenario from chain-table.md:95-148."""

    def test_full_incremental_hybrid(self, spark, warehouse):
        t = _mk_chain(spark, warehouse)
        snap = t.use_branch("snapshot")
        delta = t.use_branch("delta")
        _w(spark, snap, [("20250810", "1", "1", "1")])
        _w(spark, delta, [("20250811", "2", "1", "1")])
        # Full query at 20250811: snapshot 0810 chained with delta 0811
        full = t.to_df(spark, predicate=P.equal("dt", "20250811"))
        got = sorted((r.t1, r.t2, r.t3) for r in full.collect())
        assert got == [("1", "1", "1"), ("2", "1", "1")]
        # and every surfaced row carries the queried partition
        assert {r.dt for r in full.collect()} == {"20250811"}
        # Incremental query: the delta branch directly
        inc = delta.to_df(spark, predicate=P.equal("dt", "20250811"))
        assert [(r.t1, r.t2, r.t3) for r in inc.collect()] == [("2", "1", "1")]
        # Hybrid: union of both
        assert full.unionByName(inc).count() == 3
        # Complete partition (0810) comes straight from the snapshot
        comp = t.to_df(spark, predicate=P.equal("dt", "20250810"))
        assert [(r.dt, r.t1) for r in comp.collect()] == [("20250810", "1")]


class TestChainMerge:
    def test_parity_vs_whole_history_merge(self, spark, warehouse):
        """Chain read of partition P == dedup-merge of the snapshot dump
        plus every delta up to P, latest version per key winning."""
        t = _mk_chain(spark, warehouse, name="db.chain2")
        snap = t.use_branch("snapshot")
        delta = t.use_branch("delta")
        # day0 full dump: keys a..e at version v0
        _w(spark, snap, [("d0", k, "0", f"{k}v0") for k in "abcde"])
        # three delta days, overlapping keys, rising sequence t2
        _w(spark, delta, [("d1", "a", "1", "av1"), ("d1", "f", "1", "fv1")])
        _w(spark, delta, [("d2", "a", "2", "av2"), ("d2", "b", "2", "bv2")])
        _w(spark, delta, [("d3", "c", "3", "cv3"), ("d3", "f", "3", "fv3")])

        history = {
            "d1": [("a", "av1"), ("b", "bv0"), ("c", "cv0"), ("d", "dv0"),
                   ("e", "ev0"), ("f", "fv1")],
            "d2": [("a", "av2"), ("b", "bv2"), ("c", "cv0"), ("d", "dv0"),
                   ("e", "ev0"), ("f", "fv1")],
            "d3": [("a", "av2"), ("b", "bv2"), ("c", "cv3"), ("d", "dv0"),
                   ("e", "ev0"), ("f", "fv3")],
        }
        for day, want in history.items():
            got = sorted(
                (r.t1, r.t3)
                for r in t.to_df(spark, predicate=P.equal("dt", day)).collect()
            )
            assert got == want, day
        # unfiltered read: complete d0 + one full-as-of view per delta day
        all_rows = t.to_df(spark).groupBy("dt").count().collect()
        assert {r.dt: r["count"] for r in all_rows} == {
            "d0": 5, "d1": 6, "d2": 6, "d3": 6,
        }

    def test_no_snapshot_partition_merges_all_deltas(self, spark, warehouse):
        t = _mk_chain(spark, warehouse, name="db.chain3")
        delta = t.use_branch("delta")
        _w(spark, delta, [("d1", "x", "1", "xv1")])
        _w(spark, delta, [("d2", "x", "2", "xv2"), ("d2", "y", "2", "yv2")])
        got = sorted(
            (r.t1, r.t3)
            for r in t.to_df(spark, predicate=P.equal("dt", "d2")).collect()
        )
        assert got == [("x", "xv2"), ("y", "yv2")]
        # d1 view: only deltas <= d1
        got1 = [
            (r.t1, r.t3)
            for r in t.to_df(spark, predicate=P.equal("dt", "d1")).collect()
        ]
        assert got1 == [("x", "xv1")]

    def test_later_snapshot_bounds_the_chain(self, spark, warehouse):
        """A delta day AFTER a newer snapshot dump chains from THAT dump,
        not from day zero (findFirstLatestPartitions picks the latest
        strictly-smaller snapshot partition)."""
        t = _mk_chain(spark, warehouse, name="db.chain4")
        snap = t.use_branch("snapshot")
        delta = t.use_branch("delta")
        _w(spark, snap, [("d0", "a", "0", "old-a")])
        _w(spark, delta, [("d1", "b", "1", "bv1")])
        # fresh full dump at d2 does NOT carry b (say b was purged)
        _w(spark, snap, [("d2", "a", "2", "new-a")])
        _w(spark, delta, [("d3", "c", "3", "cv3")])
        got = sorted(
            (r.t1, r.t3)
            for r in t.to_df(spark, predicate=P.equal("dt", "d3")).collect()
        )
        # chains from d2 dump: a(new) + c; b is gone
        assert got == [("a", "new-a"), ("c", "cv3")]

    def test_setbased_plan_constant_in_view_count(self, spark, warehouse):
        """The chain plan must not grow one subplan per view: each
        branch is scanned once and fanned out through the broadcast
        mapping — 8 delta partitions, still a handful of scans, one
        merge shuffle, one broadcast."""
        t = _mk_chain(spark, warehouse, name="db.chain_ps")
        snap = t.use_branch("snapshot")
        delta = t.use_branch("delta")
        _w(spark, snap, [("d0", k, "0", f"{k}v0") for k in "ab"])
        _w(spark, delta, [
            (f"d{i}", "a", str(i), f"av{i}") for i in range(1, 9)
        ])
        df = t.to_df(spark)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") + plan.count("FileScan") <= 6, plan[:2000]
        assert plan.count("Exchange hashpartitioning") <= 2
        assert "BroadcastExchange" in plan or "broadcast" in plan.lower()
        # correctness across all 8 views: view d_i carries a at av_i + b
        got = {(r.dt, r.t1): r.t3 for r in df.collect()}
        for i in range(1, 9):
            assert got[(f"d{i}", "a")] == f"av{i}"
            assert got[(f"d{i}", "b")] == "bv0"

    def test_pk_predicate_pushdown_and_projection(self, spark, warehouse):
        t = _mk_chain(spark, warehouse, name="db.chain5")
        snap = t.use_branch("snapshot")
        delta = t.use_branch("delta")
        _w(spark, snap, [("d0", k, "0", f"{k}v0") for k in "ab"])
        _w(spark, delta, [("d1", "a", "1", "av1")])
        df = t.to_df(
            spark, predicate=P.equal("dt", "d1") & P.equal("t1", "a"),
            projection=["t1", "t3"],
        )
        assert df.columns == ["t1", "t3"]
        assert [(r.t1, r.t3) for r in df.collect()] == [("a", "av1")]


class TestChainCompact:
    def test_compact_builds_full_dumps(self, spark, warehouse):
        t = _mk_chain(spark, warehouse, name="db.chain6")
        snap = t.use_branch("snapshot")
        delta = t.use_branch("delta")
        _w(spark, snap, [("d0", k, "0", f"{k}v0") for k in "abc"])
        _w(spark, delta, [("d1", "a", "1", "av1")])
        _w(spark, delta, [("d2", "b", "2", "bv2"), ("d2", "d", "2", "dv2")])
        before = sorted(map(tuple, t.to_df(spark).collect()))
        done = chain_compact(spark, t)
        assert [d["dt"] for d in done] == ["d1", "d2"]
        # reads are unchanged by compaction...
        after = sorted(map(tuple, t.to_df(spark).collect()))
        assert after == before
        # ...but d1/d2 are now complete: full dumps live on the snapshot
        # branch and the chain planner serves them directly
        sp = {r.dt for r in snap.to_df(spark).select("dt").distinct().collect()}
        assert sp == {"d0", "d1", "d2"}
        from flink_table_store_spark.chain import _chain_plan
        _, _, views, merged = _chain_plan(spark, t, None)
        assert views == [] and merged is None

    def test_compact_expires_deltas(self, spark, warehouse):
        """expire_deltas drops every delta partition at or before the
        newest compacted view (unreachable by any current or FUTURE
        view); reads unchanged, future deltas chain off the new dump."""
        t = _mk_chain(spark, warehouse, name="db.chain8")
        delta = t.use_branch("delta")
        _w(spark, delta, [("d1", "x", "1", "xv1")])
        _w(spark, delta, [("d2", "y", "2", "yv2")])
        before = sorted(map(tuple, t.to_df(spark).collect()))
        chain_compact(spark, t, expire_deltas=True)
        assert sorted(map(tuple, t.to_df(spark).collect())) == before
        assert delta.to_df(spark).count() == 0  # all deltas dropped
        # a future delta chains from the compacted d2 dump
        _w(spark, delta, [("d3", "z", "3", "zv3")])
        got = sorted(
            (r.t1, r.t3)
            for r in t.to_df(spark, predicate=P.equal("dt", "d3")).collect()
        )
        assert got == [("x", "xv1"), ("y", "yv2"), ("z", "zv3")]

    def test_compact_is_incremental(self, spark, warehouse):
        t = _mk_chain(spark, warehouse, name="db.chain7")
        delta = t.use_branch("delta")
        _w(spark, delta, [("d1", "x", "1", "xv1")])
        _w(spark, delta, [("d2", "y", "2", "yv2")])
        done = chain_compact(spark, t, max_partitions=1)
        assert [d["dt"] for d in done] == ["d1"]
        got = sorted(
            (r.dt, r.t1, r.t3) for r in t.to_df(spark).collect()
        )
        assert got == [("d1", "x", "xv1"), ("d2", "x", "xv1"), ("d2", "y", "yv2")]


class TestChainDeletesAndShapes:
    def test_delta_delete_removes_dump_row_from_later_views(self, spark, warehouse):
        """A -D retract in a delta (rowkind.field) must delete the
        dump's key from every view at or after that delta."""
        t = warehouse.create_table(
            "db.chain_del", "dt string, t1 string, t2 string, rk string",
            partition_keys=["dt"], primary_keys=["dt", "t1"],
            options={
                "chain-table.enabled": "true", "bucket": "2",
                "bucket-key": "t1", "sequence.field": "t2",
                "rowkind.field": "rk",
            },
        )
        t.create_branch("snapshot")
        t.create_branch("delta")
        ddl = "dt string, t1 string, t2 string, rk string"
        t.use_branch("snapshot").write(spark.createDataFrame(
            [("d0", "a", "0", "+I"), ("d0", "b", "0", "+I")], ddl))
        t.use_branch("delta").write(spark.createDataFrame(
            [("d1", "a", "1", "-D")], ddl))
        t.use_branch("delta").write(spark.createDataFrame(
            [("d2", "c", "2", "+I")], ddl))
        v1 = {r.t1 for r in t.to_df(spark, predicate=P.equal("dt", "d1")).collect()}
        v2 = {r.t1 for r in t.to_df(spark, predicate=P.equal("dt", "d2")).collect()}
        assert v1 == {"b"}          # a deleted at d1
        assert v2 == {"b", "c"}     # still deleted at d2

    def test_multi_column_partitions(self, spark, warehouse):
        """Partition tuples compare lexicographically — (day, hour)
        chains across both levels (getDeltaPartitions' hourly case)."""
        ddl = "d string, h string, k string, s string, v string"
        t = warehouse.create_table(
            "db.chain_mc", ddl, partition_keys=["d", "h"],
            primary_keys=["d", "h", "k"],
            options={"chain-table.enabled": "true", "bucket": "1",
                     "bucket-key": "k", "sequence.field": "s"},
        )
        t.create_branch("snapshot")
        t.create_branch("delta")
        t.use_branch("snapshot").write(spark.createDataFrame(
            [("d0", "23", "a", "0", "av0")], ddl))
        t.use_branch("delta").write(spark.createDataFrame(
            [("d1", "00", "a", "1", "av1"), ("d1", "05", "b", "2", "bv1")],
            ddl))
        got = sorted(
            (r.k, r.v)
            for r in t.to_df(
                spark, predicate=P.equal("d", "d1") & P.equal("h", "05")
            ).collect()
        )
        # view (d1,05) = dump (d0,23) + deltas (d1,00) and (d1,05)
        assert got == [("a", "av1"), ("b", "bv1")]

    @pytest.mark.parametrize("seed", [3, 17])
    def test_fuzz_vs_python_oracle(self, spark, warehouse, seed):
        """Seeded upsert/delete mix over dumps+deltas; every view must
        equal a serial python replay of the history as-of that view."""
        import random

        random.seed(seed)
        ddl = "dt string, t1 string, t2 string, rk string"
        t = warehouse.create_table(
            f"db.chain_fz{seed}", ddl, partition_keys=["dt"],
            primary_keys=["dt", "t1"],
            options={"chain-table.enabled": "true", "bucket": "2",
                     "bucket-key": "t1", "sequence.field": "t2",
                     "rowkind.field": "rk"},
        )
        t.create_branch("snapshot")
        t.create_branch("delta")
        state: dict[str, str] = {}
        hist: dict[str, dict[str, str]] = {}
        seq = 0
        for d in range(6):
            dt = f"d{d}"
            rows = []
            for _ in range(random.randrange(3, 9)):
                k = str(random.randrange(12))
                seq += 1
                if k in state and random.random() < 0.3:
                    rows.append((dt, k, f"{seq:04d}", "-D"))
                    state.pop(k, None)
                else:
                    rows.append((dt, k, f"{seq:04d}", "+I"))
                    state[k] = f"{seq:04d}"
            if d in (0, 3):  # periodic full dump
                dump = [(dt, k, s, "+I") for k, s in sorted(state.items())]
                t.use_branch("snapshot").write(
                    spark.createDataFrame(dump, ddl))
                hist[dt] = dict(state)
            else:
                t.use_branch("delta").write(
                    spark.createDataFrame(rows, ddl))
                hist[dt] = dict(state)
        for dt, want in hist.items():
            got = {
                r.t1: r.t2
                for r in t.to_df(spark, predicate=P.equal("dt", dt)).collect()
            }
            assert got == want, (seed, dt)


class TestChainCompactMidHistory:
    @pytest.mark.parametrize("seed", [11])
    def test_compact_then_continue_ingesting(self, spark, warehouse, seed):
        """chain_compact in the middle of the history (with delta
        retention), then more deltas: every view before AND after the
        compaction horizon still equals the serial replay."""
        import random

        random.seed(seed)
        ddl = "dt string, t1 string, t2 string, rk string"
        t = warehouse.create_table(
            f"db.chain_cc{seed}", ddl, partition_keys=["dt"],
            primary_keys=["dt", "t1"],
            options={"chain-table.enabled": "true", "bucket": "2",
                     "bucket-key": "t1", "sequence.field": "t2",
                     "rowkind.field": "rk"},
        )
        t.create_branch("snapshot")
        t.create_branch("delta")
        state: dict[str, str] = {}
        hist: dict[str, dict[str, str]] = {}
        seq = 0
        for d in range(7):
            dt = f"d{d}"
            rows = []
            for _ in range(random.randrange(2, 6)):
                k = str(random.randrange(9))
                seq += 1
                if k in state and random.random() < 0.25:
                    rows.append((dt, k, f"{seq:04d}", "-D"))
                    state.pop(k, None)
                else:
                    rows.append((dt, k, f"{seq:04d}", "+I"))
                    state[k] = f"{seq:04d}"
            if d == 0:
                t.use_branch("snapshot").write(
                    spark.createDataFrame(
                        [(dt, k, s_, "+I") for k, s_ in state.items()], ddl))
            else:
                t.use_branch("delta").write(spark.createDataFrame(rows, ddl))
            hist[dt] = dict(state)
            if d == 3:  # weekly-style compaction mid-history + retention
                chain_compact(spark, t, expire_deltas=True)
        for dt, want in hist.items():
            got = {
                r.t1: r.t2
                for r in t.to_df(spark, predicate=P.equal("dt", dt)).collect()
            }
            assert got == want, (seed, dt)


class TestSqlSurface:
    def test_doc_setup_pure_sql(self, spark, warehouse):
        """chain-table.md:52-92 setup entirely in SQL: CREATE TABLE with
        the chain tblproperties, CALL sys.create_branch twice, then the
        write/read workflow — no Python table API calls at all."""
        from flink_table_store_spark.sql import SqlSession

        s = SqlSession(spark, warehouse)
        s.sql(
            "CREATE TABLE db.chain_ddl (t1 string, t2 string, t3 string, "
            "dt string) PARTITIONED BY (dt) TBLPROPERTIES ("
            "'chain-table.enabled' = 'true', "
            "'primary-key' = 'dt,t1', 'sequence.field' = 't2', "
            "'bucket-key' = 't1', 'bucket' = '2')"
        )
        s.sql("CALL sys.create_branch('db.chain_ddl', 'snapshot')")
        s.sql("CALL sys.create_branch('db.chain_ddl', 'delta')")
        s.sql(
            "INSERT OVERWRITE db.chain_ddl$branch_snapshot "
            "PARTITION (dt = '20250810') VALUES ('1', '1', '1')"
        )
        s.sql(
            "INSERT OVERWRITE db.chain_ddl$branch_delta "
            "PARTITION (dt = '20250811') VALUES ('2', '1', '1')"
        )
        got = sorted(
            map(tuple, s.sql(
                "SELECT t1, t2, t3 FROM db.chain_ddl WHERE dt = '20250811'"
            ).collect())
        )
        assert got == [("1", "1", "1"), ("2", "1", "1")]
        # chain compaction via CALL
        s.sql("CALL sys.chain_compact(table => 'db.chain_ddl')")
        got2 = sorted(
            map(tuple, s.sql(
                "SELECT t1, t2, t3 FROM db.chain_ddl WHERE dt = '20250811'"
            ).collect())
        )
        assert got2 == got

    def test_doc_sql_workflow(self, spark, warehouse):
        """The chain-table.md:95-148 SQL workflow verbatim shapes:
        INSERT OVERWRITE into t$branch_snapshot / t$branch_delta, full
        query on t, incremental query on t$branch_delta, hybrid union."""
        from flink_table_store_spark.sql import SqlSession

        t = _mk_chain(spark, warehouse, name="db.chain_sql")
        s = SqlSession(spark, warehouse)
        s.sql(
            "INSERT OVERWRITE db.chain_sql$branch_snapshot "
            "PARTITION (dt = '20250810') VALUES ('1', '1', '1')"
        )
        s.sql(
            "INSERT OVERWRITE db.chain_sql$branch_delta "
            "PARTITION (dt = '20250811') VALUES ('2', '1', '1')"
        )
        full = s.sql(
            "SELECT t1, t2, t3 FROM db.chain_sql WHERE dt = '20250811'"
        )
        assert sorted(map(tuple, full.collect())) == [
            ("1", "1", "1"), ("2", "1", "1")
        ]
        inc = s.sql(
            "SELECT t1, t2, t3 FROM db.chain_sql$branch_delta "
            "WHERE dt = '20250811'"
        )
        assert [tuple(r) for r in inc.collect()] == [("2", "1", "1")]
        hybrid = s.sql(
            "SELECT t1, t2, t3 FROM db.chain_sql WHERE dt = '20250811' "
            "UNION ALL SELECT t1, t2, t3 FROM db.chain_sql$branch_delta "
            "WHERE dt = '20250811'"
        )
        assert hybrid.count() == 3
        # $branch_ and @ spellings resolve to the same table
        a = warehouse.get_table("db.chain_sql$branch_delta")
        b = warehouse.get_table("db.chain_sql@delta")
        assert a.branch_name == b.branch_name == "delta"


class TestValidation:
    def test_missing_branch_refused(self, spark, warehouse):
        t = warehouse.create_table(
            "db.chain_nb", SCHEMA, partition_keys=["dt"],
            primary_keys=["dt", "t1"],
            options={"chain-table.enabled": "true", "bucket": "1"},
        )
        with pytest.raises(RuntimeError, match="branch 'snapshot' does not exist"):
            t.to_df(spark)

    def test_requires_pk_and_partitions(self, spark, warehouse):
        t = warehouse.create_table(
            "db.chain_np", "a bigint, b string",
            options={"chain-table.enabled": "true"},
        )
        with pytest.raises(ValueError, match="primary-key"):
            t.to_df(spark)

    def test_empty_chain_table_reads_empty(self, spark, warehouse):
        t = _mk_chain(spark, warehouse, name="db.chain_empty")
        assert t.to_df(spark).count() == 0
        assert t.to_df(spark).columns == ["dt", "t1", "t2", "t3"]

    def test_main_view_writes_delegate_to_snapshot_branch(self, spark, warehouse):
        """DelegatedFileStoreTable semantics: a write addressed at the
        chain table's MAIN view lands on the snapshot branch (a main-
        branch commit would be invisible to chain reads — data loss)."""
        t = _mk_chain(spark, warehouse, name="db.chain_wd")
        t.write(spark.createDataFrame([("d0", "a", "0", "av0")], SCHEMA))
        snap = t.use_branch("snapshot")
        assert [(r.dt, r.t1) for r in snap.to_df(spark).collect()] == [("d0", "a")]
        assert t.snapshots.latest() is None  # main branch untouched
        # and the chain view serves it as a complete partition
        assert t.to_df(spark).count() == 1
        # row ops delegate too
        t.delete(spark, P.equal("t1", "a") & P.equal("dt", "d0"))
        assert t.to_df(spark).count() == 0
        assert snap.to_df(spark).count() == 0
        # the local no-Spark write delegates the same way
        import pandas as pd

        t.write_arrow(pd.DataFrame(
            [{"dt": "d0", "t1": "z", "t2": "1", "t3": "zv"}]))
        assert t.snapshots.latest() is None
        assert [(r.dt, r.t1) for r in snap.to_df(spark).collect()] == [("d0", "z")]

    def test_silent_empty_paths_refuse_loudly(self, spark, warehouse):
        """The main branch of a chain table holds no data: local reads,
        time travel, and streaming on the MAIN view must refuse rather
        than silently return nothing; branch reads stay available."""
        t = _mk_chain(spark, warehouse, name="db.chain_rf")
        delta = t.use_branch("delta")
        _w(spark, delta, [("d1", "x", "1", "xv1")])
        with pytest.raises(NotImplementedError, match="chain table"):
            t.read_builder().to_arrow()
        with pytest.raises(ValueError, match="time travel on a chain"):
            t.to_df(spark, snapshot_id=1)
        from flink_table_store_spark.streaming.source import SnapshotStream

        with pytest.raises(ValueError, match="streaming read of a chain"):
            SnapshotStream(t)
        # the branches themselves stay local-readable and streamable
        assert delta.read_builder().to_arrow().num_rows == 1
        SnapshotStream(delta)

    def test_max_pt_answers_from_branches(self, spark, warehouse):
        t = _mk_chain(spark, warehouse, name="db.chain_mp")
        assert t.max_pt() is None
        _w(spark, t.use_branch("snapshot"), [("d0", "a", "0", "v")])
        _w(spark, t.use_branch("delta"), [("d2", "b", "1", "v")])
        assert t.max_pt() == "d2"

    def test_branch_creation_on_empty_table(self, spark, warehouse):
        # create_branch before any snapshot exists (the documented
        # chain setup order: CREATE TABLE, then create both branches)
        t = warehouse.create_table(
            "db.chain_eb", SCHEMA, partition_keys=["dt"],
            primary_keys=["dt", "t1"], options={"bucket": "1"},
        )
        b = t.create_branch("snapshot")
        assert b.snapshots.latest() is None
        _w(spark, b, [("d0", "1", "1", "1")])
        assert b.to_df(spark).count() == 1
        # main stays empty — branches commit independently
        assert t.to_df(spark).count() == 0
