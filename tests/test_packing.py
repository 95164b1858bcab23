"""Sequence packing (datapipe/packing.py): concatenate-then-cut spans
and no-split first-fit, with conservation/capacity invariants."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.packing import (
    pack_first_fit,
    pack_sequences,
    packing_stats,
)


def _docs(spark, lengths, shard=None):
    rows = [
        (i, int(n)) + ((shard[i],) if shard else ())
        for i, n in enumerate(lengths)
    ]
    schema = "doc_id bigint, n_tokens bigint" + (", shard string" if shard else "")
    return spark.createDataFrame(rows, schema)


class TestPackSequences:
    def test_conservation_and_capacity(self, spark):
        random.seed(8)
        lengths = [random.randint(1, 300) for _ in range(400)]
        df = _docs(spark, lengths)
        out = pack_sequences(df, seq_len=128).cache()
        # every token lands exactly once
        assert out.agg(F.sum("span_tokens")).first()[0] == sum(lengths)
        # every pack except the last is exactly full; none overfull
        fills = {
            r.pack_id: r.fill
            for r in out.groupBy("pack_id").agg(F.sum("span_tokens").alias("fill")).collect()
        }
        last = max(fills)
        assert all(v == 128 for p, v in fills.items() if p != last)
        assert fills[last] <= 128
        # pack ids are contiguous from 0
        assert sorted(fills) == list(range(last + 1))
        # spans of one document partition it: offsets chain
        spans = sorted(
            ((r.doc_id, r.doc_offset, r.span_tokens) for r in out.collect())
        )
        by_doc = {}
        for d, off, n in spans:
            by_doc.setdefault(d, []).append((off, n))
        for d, ss in by_doc.items():
            pos = 0
            for off, n in sorted(ss):
                assert off == pos
                pos += n
            assert pos == lengths[d]
        out.unpersist()

    def test_long_document_straddles(self, spark):
        df = _docs(spark, [1000, 5, 5])
        out = pack_sequences(df, seq_len=128)
        big = out.where(F.col("doc_id") == 0)
        assert big.count() >= 8  # 1000 tokens cover >= ceil(1000/128) packs
        # inside each pack the span starts where the cut fell
        r = big.orderBy("pack_id").collect()
        for a, b in zip(r, r[1:]):
            assert b.doc_offset == a.doc_offset + a.span_tokens

    def test_deterministic_and_seed_sensitive(self, spark):
        df = _docs(spark, [10, 20, 30, 40, 50])
        a = sorted(map(tuple, pack_sequences(df, 64, seed=1).collect()))
        b = sorted(map(tuple, pack_sequences(df, 64, seed=1).collect()))
        c = sorted(map(tuple, pack_sequences(df, 64, seed=2).collect()))
        assert a == b
        assert a != c  # different shuffle order

    def test_sharded_windows_are_independent(self, spark):
        lengths = [17, 91, 40, 64, 3, 128, 77, 10]
        shard = ["a", "b"] * 4
        df = _docs(spark, lengths, shard=shard)
        out = pack_sequences(df, 64, shard_col="shard")
        # token conservation holds per shard
        per = {
            r.shard: r.tok
            for r in out.groupBy("shard").agg(F.sum("span_tokens").alias("tok")).collect()
        }
        assert per["a"] == sum(lengths[0::2]) and per["b"] == sum(lengths[1::2])

    @pytest.mark.slow
    def test_default_matches_global_window_bit_identical(self, spark):
        """The sharded default must equal the partition-less global
        window exactly (several seeds x length mixes x n_shards)."""
        from pyspark.sql import Window

        from flink_table_store_spark.datapipe.packing import _order_key

        for seed in (1, 7, 42):
            random.seed(seed * 100)
            lengths = [random.randint(1, 400) for _ in range(300)]
            df = _docs(spark, lengths)
            # reference: the old single-partition global window
            okey = _order_key("doc_id", seed)
            n = F.col("n_tokens").cast("bigint")
            w = Window.partitionBy().orderBy(okey, "doc_id")
            cum_end = F.sum(n).over(w)
            ref_base = df.where(n > 0).select(
                "doc_id", (cum_end - n).alias("s"), cum_end.alias("e")
            )
            ref = sorted(map(tuple, ref_base.collect()))
            for n_shards in (1, 16, 4096):
                out = pack_sequences(df, 128, seed=seed, n_shards=n_shards)
                got = sorted(
                    (r.doc_id, r.pack_id * 128 + r.pack_offset - r.doc_offset)
                    for r in out.where(F.col("doc_offset") == 0).collect()
                )
                assert got == [(d, s) for d, s, _ in ref], (seed, n_shards)

    def test_default_plan_has_no_global_window(self, spark):
        """Plan shape: the cumsum window must be partitioned (never the
        single-partition 'No Partition Defined' shape) and the offsets
        side must be broadcast."""
        df = _docs(spark, [10, 20, 30, 40])
        out = pack_sequences(df, 64)
        plan = out._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "windowspecdefinition(" in line:
                assert "__ps_shard" in line, line
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan

    def test_zero_length_docs_dropped_and_validation(self, spark):
        df = _docs(spark, [0, 5, 0, 7])
        out = pack_sequences(df, 16)
        assert sorted(r.doc_id for r in out.collect()) == [1, 3]
        with pytest.raises(ValueError, match="seq_len"):
            pack_sequences(df, 0)


class TestPackFirstFit:
    def test_no_split_capacity_and_conservation(self, spark):
        random.seed(11)
        lengths = [random.randint(1, 512) for _ in range(500)]
        df = _docs(spark, lengths)
        out = pack_first_fit(df, seq_len=512).cache()
        assert out.count() == 500  # every doc exactly once
        fills = [
            r.fill
            for r in out.groupBy("pack_id").agg(F.sum("n_tokens").alias("fill")).collect()
        ]
        assert all(f <= 512 for f in fills)  # NEVER overfull
        assert sum(fills) == sum(lengths)
        # pack_tokens column agrees with the recomputed fill
        bad = out.join(
            out.groupBy("pack_id").agg(F.sum("n_tokens").alias("f")), "pack_id"
        ).where(F.col("pack_tokens") != F.col("f"))
        assert bad.count() == 0
        # efficiency: greedy desc packing stays dense (not a tight bound,
        # a regression tripwire)
        waste = sum(512 - f for f in fills)
        assert waste / (len(fills) * 512) < 0.25
        out.unpersist()

    def test_adversarial_boundary_crossers(self, spark):
        # crafted so pass-1 groups overfill and pass 2 must repair:
        # L=10 with 6,5,5 -> cumsum 6,11,16 puts 5,5 in one group
        out = pack_first_fit(_docs(spark, [6, 5, 5]), 10)
        fills = [
            r.fill
            for r in out.groupBy("pack_id").agg(F.sum("n_tokens").alias("fill")).collect()
        ]
        assert all(f <= 10 for f in fills)
        assert sum(fills) == 16

    def test_oversized_doc_refused(self, spark):
        with pytest.raises(ValueError, match="longer than seq_len"):
            pack_first_fit(_docs(spark, [10, 700]), 512)

    def test_stats(self, spark):
        df = _docs(spark, [64] * 8)
        s = packing_stats(pack_sequences(df, 128), 128).first()
        assert s.n_packs == 4 and s.total_tokens == 512 and s.avg_fill == 1.0


@pytest.mark.parametrize("seq_len", [32, 100, 257])
@pytest.mark.slow
def test_property_random_corpora(spark, seq_len):
    """Invariant sweep across shapes: conservation + capacity for both
    strategies at several seq_lens."""
    random.seed(seq_len)
    lengths = [random.randint(1, seq_len) for _ in range(200)]
    df = _docs(spark, lengths)
    seq = pack_sequences(df, seq_len)
    assert seq.agg(F.sum("span_tokens")).first()[0] == sum(lengths)
    over = (
        seq.groupBy("pack_id").agg(F.sum("span_tokens").alias("f"))
        .where(F.col("f") > seq_len).count()
    )
    assert over == 0
    ff = pack_first_fit(df, seq_len)
    assert ff.count() == 200
    over2 = (
        ff.groupBy("pack_id").agg(F.sum("n_tokens").alias("f"))
        .where(F.col("f") > seq_len).count()
    )
    assert over2 == 0
