"""Bucketed APPEND tables (bucket-key without primary keys — reference
BucketMode fixed-bucket append) and scan-time bucket pruning for =/IN
predicates over the full bucket-key (LocalTableQuery-style routing
generalized to scans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark import predicate as P


def _mk(spark, warehouse, name, col="k bigint, v string", n=100, step=1):
    t = warehouse.create_table(
        name, col, options={"bucket": "4", "bucket-key": "k"}
    )
    t.write(
        spark.createDataFrame(
            [(i, f"{name[-1]}{i}") for i in range(0, n, step)], col
        )
    )
    return t


class TestBucketedAppend:
    def test_layout_and_roundtrip(self, spark, warehouse):
        t = _mk(spark, warehouse, "db.a")
        snap = t.snapshots.latest()
        es = t.manifests.read_live_entries(
            snap.base_manifest_list, snap.delta_manifest_list
        )
        assert sorted({e.bucket for e in es}) == [0, 1, 2, 3]
        assert t.to_df(spark).count() == 100
        # duplicates are kept (append semantics, bucketed or not)
        t.write(spark.createDataFrame([(1, "dup")], "k bigint, v string"))
        assert t.to_df(spark).where(F.col("k") == 1).count() == 2

    def test_zero_shuffle_bucketed_join(self, spark, warehouse):
        from flink_table_store_spark.operators.bucketed_join import join_bucketed

        a = _mk(spark, warehouse, "db.ja")
        b = _mk(
            spark, warehouse, "db.jb", col="k bigint, w string", step=2
        )
        j = join_bucketed(spark, a, b, on=[("k", "k")])
        assert j.count() == 50
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        rows = sorted((r.k, r.v, r.w) for r in j.collect())
        assert rows[0] == (0, "a0", "b0") and rows[1] == (2, "a2", "b2")

    def test_bucket_pruning_scans_fewer_files(self, spark, warehouse):
        t = _mk(spark, warehouse, "db.p")
        rb = t.read_builder().with_filter(P.equal("k", 7))
        plan = rb.plan()
        # exactly one bucket's file survives planning
        assert len(plan.raw_entries) == 1
        got = rb.to_df(spark).collect()
        assert [(r.k, r.v) for r in got] == [(7, "p7")]
        # IN over the key prunes to the union of hashed buckets
        rb = t.read_builder().with_filter(P.isin("k", [7, 8, 9]))
        assert len(rb.plan().raw_entries) <= 3
        assert sorted(r.k for r in rb.to_df(spark).collect()) == [7, 8, 9]
        # local path sees the same pruning + rows
        assert sorted(
            r["k"] for r in rb.to_arrow().to_pylist()
        ) == [7, 8, 9]

    def test_pruning_is_sound_not_just_fast(self, spark, warehouse):
        """Predicates that must NOT prune by bucket: ranges, ORs at the
        top level, partial-key equality on multi-key tables, and null
        literals."""
        t = _mk(spark, warehouse, "db.s")
        assert t.read_builder().with_filter(
            P.greater_than("k", 90)
        ).to_df(spark).count() == 9
        orp = P.or_(P.equal("k", 1), P.greater_than("k", 97))
        assert sorted(
            r.k for r in t.read_builder().with_filter(orp).to_df(spark).collect()
        ) == [1, 98, 99]
        # multi-column bucket-key with only one key constrained
        t2 = warehouse.create_table(
            "db.mk", "a bigint, b string, v string",
            options={"bucket": "4", "bucket-key": "a,b"},
        )
        t2.write(spark.createDataFrame(
            [(i, f"s{i % 3}", f"v{i}") for i in range(30)],
            "a bigint, b string, v string"))
        rb = t2.read_builder().with_filter(P.equal("a", 5))
        assert [(r.a, r.v) for r in rb.to_df(spark).collect()] == [(5, "v5")]
        # full-key equality prunes on the multi-key table too
        rb = t2.read_builder().with_filter(
            P.equal("a", 5) & P.equal("b", "s2")
        )
        assert len(rb.plan().raw_entries) == 1
        assert [r.v for r in rb.to_df(spark).collect()] == ["v5"]

    def test_pk_table_point_scan_prunes_bucket(self, spark, warehouse):
        """The same pruning serves fixed-bucket PK scans."""
        t = warehouse.create_table(
            "db.pk", "k bigint, v string", primary_keys=["k"],
            options={"bucket": "8"},
        )
        t.write(spark.createDataFrame(
            [(i, f"v{i}") for i in range(80)], "k bigint, v string"))
        rb = t.read_builder().with_filter(P.equal("k", 13))
        plan = rb.plan()
        touched = len(plan.raw_entries) + len(plan.merge_entries)
        assert touched == 1  # one bucket out of 8
        assert [(r.k, r.v) for r in rb.to_df(spark).collect()] == [(13, "v13")]

    def test_rescale_generations_not_mispruned(self, spark, warehouse):
        """Entries written under an older bucket layout must not be
        pruned with the new layout's hash."""
        t = warehouse.create_table(
            "db.rs", "k bigint, v string", primary_keys=["k"],
            options={"bucket": "2"},
        )
        t.write(spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "k bigint, v string"))
        t.rescale(spark, 8)
        t2 = warehouse.get_table("db.rs")
        assert t2.schema.num_buckets() == 8
        for k in (3, 7, 19):
            got = t2.read_builder().with_filter(P.equal("k", k)).to_df(spark).collect()
            assert [(r.k, r.v) for r in got] == [(k, f"v{k}")]

    def test_dynamic_bucket_never_prunes(self, spark, warehouse):
        """Dynamic-bucket tables assign buckets by index, not hash —
        the candidate computation must refuse."""
        from flink_table_store_spark.read import _bucket_candidates

        t = warehouse.create_table(
            "db.dyn", "k bigint, v string", primary_keys=["k"],
            options={"bucket": "-1"},
        )
        assert _bucket_candidates(P.equal("k", 1), t.schema) is None


class TestFormatSurface:
    @pytest.mark.slow
    def test_format_writer_buckets_append_tables(self, spark, warehouse):
        """df.write.format('ftss') on a bucketed append table must hash
        rows into the same buckets Table.write uses — a bucket-unaware
        write would silently break join co-location."""
        from flink_table_store_spark.operators.bucketed_join import join_bucketed
        from flink_table_store_spark.sources.datasource import register_data_source

        register_data_source(spark)
        a = _mk(spark, warehouse, "db.fa")  # engine-written side
        b = warehouse.create_table(
            "db.fb", "k bigint, w string", options={"bucket": "4", "bucket-key": "k"}
        )
        spark.createDataFrame(
            [(i, f"b{i}") for i in range(0, 100, 2)], "k bigint, w string"
        ).write.format("ftss").mode("append").save(b.path)
        snap = b.snapshots.latest()
        es = b.manifests.read_live_entries(
            snap.base_manifest_list, snap.delta_manifest_list
        )
        assert sorted({e.bucket for e in es}) == [0, 1, 2, 3]
        j = join_bucketed(spark, a, warehouse.get_table("db.fb"), on=[("k", "k")])
        rows = sorted((r.k, r.v, r.w) for r in j.collect())
        assert len(rows) == 50 and rows[0] == (0, "a0", "b0")
        # cross-runtime parity: the local writer buckets identically
        import pyarrow as pa

        warehouse.get_table("db.fb").write_arrow(
            pa.table({"k": [1, 3], "w": ["b1", "b3"]})
        )
        j2 = join_bucketed(
            spark, a, warehouse.get_table("db.fb"), on=[("k", "k")]
        )
        assert j2.count() == 52
