"""Sketch wire formats: RoaringBitmap portable layout + DataSketches
compact theta sketches (functions/sketches.py), standalone and through
the aggregation merge engine's binary-field aggregators
(FieldRoaringBitmap32/64Agg, FieldThetaSketchAgg)."""

import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_table_store_spark.functions import sketches as S


# ---------------------------------------------------------------- murmur3
def test_murmur3_published_vectors():
    # widely-published x64_128 vectors (Appleby reference implementation)
    assert S.murmur3_x64_128(b"", 0) == (0, 0)
    assert S.murmur3_x64_128(b"hello", 0) == (
        0xCBD8A7B341BD9B02,
        0x5B1E906A48AE1D19,
    )
    assert S.murmur3_x64_128(b"hello, world", 0) == (
        0x342FAC623A5EBC8E,
        0x4CDCBC079642414D,
    )


# ------------------------------------------------------------- roaring 32
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=300))
@settings(max_examples=60, deadline=None)
def test_rbm32_roundtrip(vals):
    assert list(S.rbm32_deserialize(S.rbm32_serialize(vals))) == sorted(set(vals))


def test_rbm32_container_boundaries():
    # exactly 4096 values -> array container; 4097 -> bitmap container
    arr = S.rbm32_serialize(range(4096))
    bmp = S.rbm32_serialize(range(4097))
    cookie, n = struct.unpack_from("<II", arr, 0)
    assert cookie == 12346 and n == 1
    (off,) = struct.unpack_from("<I", arr, 12)
    assert len(arr) - off == 4096 * 2  # u16 array payload
    (off_b,) = struct.unpack_from("<I", bmp, 12)
    assert len(bmp) - off_b == 8192  # 1024 x u64 bitset payload
    assert list(S.rbm32_deserialize(bmp)) == list(range(4097))


def test_rbm32_reads_run_containers():
    # hand-crafted cookie-12347 stream with one run container [10, 20]
    hdr = struct.pack("<I", 12347)  # size-1 = 0 in the high 16 bits
    crafted = (
        hdr + b"\x01" + struct.pack("<HH", 0, 10) + struct.pack("<HHH", 1, 10, 10)
    )
    assert list(S.rbm32_deserialize(crafted)) == list(range(10, 21))


def test_rbm32_union_multi_container():
    a = S.rbm32_serialize([1, 2, 70000])
    b = S.rbm32_serialize([2, 3, 2**31])
    assert list(S.rbm32_deserialize(S.rbm32_union([a, b]))) == [
        1,
        2,
        3,
        70000,
        2**31,
    ]


# ------------------------------------------------------------- roaring 64
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
@settings(max_examples=40, deadline=None)
def test_rbm64_roundtrip(vals):
    assert list(S.rbm64_deserialize(S.rbm64_serialize(vals))) == sorted(set(vals))


def test_rbm64_bucket_layout():
    b = S.rbm64_serialize([1, 2**32 + 7])
    (n_buckets,) = struct.unpack_from("<Q", b, 0)
    assert n_buckets == 2
    (high0,) = struct.unpack_from("<I", b, 8)
    assert high0 == 0


# ------------------------------------------------------------------ theta
def test_theta_exact_and_estimating():
    sk = S.theta_sketch_of(range(100))
    assert S.theta_estimate(sk) == 100.0
    hs, theta = S.theta_deserialize(sk)
    assert len(hs) == 100 and theta == 1 << 63
    assert list(hs) == sorted(hs)  # ordered compact
    big = S.theta_sketch_of(range(200_000), k=4096)
    hs, theta = S.theta_deserialize(big)
    assert len(hs) == 4096 and theta < 1 << 63
    assert abs(S.theta_estimate(big) - 200_000) / 200_000 < 0.05


def test_theta_preamble_layout():
    # empty: single preamble long, flags EMPTY|COMPACT|ORDERED|READ_ONLY
    e = S.theta_sketch_of([])
    assert len(e) == 8
    pre, ser_ver, family = e[0], e[1], e[2]
    assert (pre, ser_ver, family) == (1, 3, 3)
    assert e[5] == 2 | 4 | 8 | 16
    # exact: 2 preamble longs then count hashes
    sk = S.theta_sketch_of([1, 2, 3])
    assert sk[0] == 2 and len(sk) == 16 + 3 * 8
    (count,) = struct.unpack_from("<i", sk, 8)
    assert count == 3
    # estimating: 3 preamble longs, thetaLong at bytes 16..23
    big = S.theta_sketch_of(range(100_000), k=256)
    assert big[0] == 3 and len(big) == 24 + 256 * 8
    (theta,) = struct.unpack_from("<Q", big, 16)
    assert 0 < theta < 1 << 63


def test_theta_union_and_seed_check():
    u = S.theta_union(
        [S.theta_sketch_of(range(50)), S.theta_sketch_of(range(25, 75)), None]
    )
    assert S.theta_estimate(u) == 75.0
    with pytest.raises(ValueError):
        S.theta_deserialize(S.theta_sketch_of([1], seed=123))  # wrong seed


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=200))
@settings(max_examples=40, deadline=None)
def test_theta_exact_mode_counts_distinct(vals):
    assert S.theta_estimate(S.theta_sketch_of(vals)) == len(set(vals))


# ------------------------------------------- merge-engine binary fields
@pytest.mark.usefixtures("spark")
def test_rbm_binary_fields_union_through_merge_engine(spark, warehouse):
    t = warehouse.create_table(
        "db.rbm_bin",
        "k bigint, b32 binary, b64 binary",
        primary_keys=["k"],
        options={
            "bucket": "1",
            "merge-engine": "aggregation",
            "fields.b32.aggregate-function": "rbm32",
            "fields.b64.aggregate-function": "rbm64",
        },
    )
    ddl = "k bigint, b32 binary, b64 binary"
    t.write(
        spark.createDataFrame(
            [(1, S.rbm32_serialize([1, 5]), S.rbm64_serialize([2**40, 7]))], ddl
        )
    )
    t.write(
        spark.createDataFrame(
            [(1, S.rbm32_serialize([5, 9, 70000]), S.rbm64_serialize([7, 8]))], ddl
        )
    )
    [row] = t.to_df(spark).collect()
    assert list(S.rbm32_deserialize(bytes(row.b32))) == [1, 5, 9, 70000]
    assert list(S.rbm64_deserialize(bytes(row.b64))) == [7, 8, 2**40]


@pytest.mark.usefixtures("spark")
def test_theta_binary_field_reaggregates_after_compaction(spark, warehouse):
    """Partial results (compacted file) must re-union correctly with
    fresh rows — the property the old HLL-of-raw-bytes path could not
    provide on binary fields."""
    t = warehouse.create_table(
        "db.theta_bin",
        "k bigint, sk binary",
        primary_keys=["k"],
        options={
            "bucket": "1",
            "merge-engine": "aggregation",
            "fields.sk.aggregate-function": "theta_sketch",
        },
    )
    ddl = "k bigint, sk binary"
    t.write(spark.createDataFrame([(1, S.theta_sketch_of(range(0, 600)))], ddl))
    t.compact(spark, full=True)  # merged partial sketch now on disk
    t.write(spark.createDataFrame([(1, S.theta_sketch_of(range(300, 900)))], ddl))
    [row] = t.to_df(spark).collect()
    assert S.theta_estimate(bytes(row.sk)) == 900.0  # exact below k=4096


@pytest.mark.usefixtures("spark")
def test_sketch_sql_functions(spark, warehouse):
    """Sketch columns are queryable from SQL text: build in an INSERT-
    shaped select, union through the merge engine, read back with
    theta_estimate / rbm32_cardinality / rbm32_contains."""
    from flink_table_store_spark.functions.catalog_functions import (
        register_sketch_functions,
    )

    register_sketch_functions(spark)
    got = spark.sql(
        "SELECT theta_estimate(theta_build(array(1,2,3,2))) AS est, "
        "rbm32_cardinality(rbm32_build(array(7,7,9))) AS card, "
        "rbm32_contains(rbm32_build(array(7,9)), 9) AS has9, "
        "rbm32_contains(rbm32_build(array(7,9)), 8) AS has8, "
        "rbm64_cardinality(rbm64_build(array(1, 4294967296))) AS c64, "
        "rbm64_contains(rbm64_build(array(4294967296)), 4294967296) AS has64"
    ).collect()[0]
    assert got.est == 3.0 and got.card == 2
    assert got.has9 is True and got.has8 is False
    assert got.c64 == 2 and got.has64 is True


@pytest.mark.slow
def test_hll_wire_format_parse_union_estimate(spark):
    """DataSketches HLL wire format: parse Spark-written LIST/SET/dense
    buffers, union them (coupon-exact below promotion, dense HLL_8
    above, lgK downsampling), and have SPARK read the result back —
    estimate parity with hll_union_agg on every shape."""
    from pyspark.sql import functions as F

    from flink_table_store_spark.functions import sketches as S

    def mk(lo, hi, lgk=None):
        e = f"hll_sketch_agg(id{'' if lgk is None else ', ' + str(lgk)})"
        return bytes(spark.range(lo, hi).agg(F.expr(e)).collect()[0][0])

    def spark_est(b):
        return (
            spark.createDataFrame([(b,)], "h binary")
            .select(F.expr("hll_sketch_estimate(h)"))
            .collect()[0][0]
        )

    def spark_union(bs):
        return bytes(
            spark.createDataFrame([(b,) for b in bs], "h binary")
            .agg(F.expr("hll_union_agg(h, true)"))
            .collect()[0][0]
        )

    cases = [
        [mk(0, 3), mk(2, 6)],                # LIST + LIST -> coupon SET
        [mk(0, 50), mk(30, 120)],            # SET + SET
        [mk(0, 5), mk(0, 5000)],             # LIST + dense
        [mk(0, 5000), mk(3000, 9000)],       # dense + dense
        [mk(0, 5000), mk(2000, 8000, 14)],   # mixed lgK -> downsample
    ]
    for bs in cases:
        mine = S.hll_union(bs)
        ref = spark_union(bs)
        assert spark_est(mine) == spark_est(ref), (spark_est(mine), spark_est(ref))
        # Java must accept our buffer as a further union INPUT
        assert spark_est(spark_union([mine, ref])) == spark_est(ref)
    # parse modes
    lgk, mode, payload = S.hll_parse(mk(0, 3))
    assert mode == "coupons" and len(payload) == 3 and lgk == 12
    lgk, mode, regs = S.hll_parse(mk(0, 50000))
    assert mode == "hll8" and len(regs) == 4096
    # empty union
    empty = S.hll_union([])
    assert S.hll_parse(empty)[1] == "coupons" and len(S.hll_parse(empty)[2]) == 0
    # local estimator sanity (test-only reader)
    assert S.hll_estimate(S.hll_union([mk(0, 100)])) == 100.0
