"""Space-filling-curve clustering for data skipping (SURVEY §2.6 O5).

Mirrors paimon-spark sort/TableSorter.java:30-82 (ORDER / ZORDER /
HILBERT strategies), z-bytes ZIndexer.java:64, SparkZOrderUDF /
SparkHilbertUDF — re-expressed Spark-first:

- Column normalization and bit interleaving are **built-in column
  expressions** (shift/mask folds inside whole-stage codegen), not a
  per-row UDF like the reference's SparkZOrderUDF.
- The rewrite job is ``repartitionByRange(sort_key)`` +
  ``sortWithinPartitions`` — Spark's range exchange samples the key
  distribution, so output files get tight, near-disjoint key ranges;
  manifest min/max stats then prune point/range queries.

Scale: one full shuffle of the rewritten partition — the same cost any
clustering rewrite pays; afterwards selective scans skip most files.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo, hi, bits: int) -> Column:
    """Map a column into [0, 2^bits) preserving order. Numeric columns
    scale linearly by the [min, max] from manifest stats; anything
    non-numeric (or unknown range) falls back to a hash — loses strict
    order but still clusters equal values."""
    max_v = (1 << bits) - 1
    if lo is None or hi is None:
        return F.pmod(F.xxhash64(col), F.lit(max_v + 1))
    lo_l, hi_l = F.lit(float(lo)), F.lit(float(hi))
    span = F.when(hi_l > lo_l, hi_l - lo_l).otherwise(F.lit(1.0))
    scaled = (col.cast("double") - lo_l) / span * F.lit(float(max_v))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(max_v)))
    return F.coalesce(clamped.cast("long"), F.lit(0))


def zvalue(cols: list[Column], ranges: list[tuple], bits: int = 16) -> Column:
    """Interleave ``bits`` bits of each normalized column into one long
    (ZIndexer.java:64 semantics). 64-bit budget: bits * len(cols) ≤ 63."""
    k = len(cols)
    if bits * k > 63:
        bits = 63 // k
    norm = [_normalize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, ranges)]
    out = F.lit(0).cast("long")
    for i in range(bits):
        for ci, nc in enumerate(norm):
            bit = F.shiftright(nc, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * k + ci))
    return out


def hilbert_index(df: DataFrame, col_x: str, col_y: str, ranges: list[tuple], bits: int = 16) -> Column:
    """2-D Hilbert curve index as a vectorized pandas UDF (numpy loop
    over ``bits`` rotations — Arrow-batched, no per-row Python)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _hilbert(x: pd.Series, y: pd.Series) -> pd.Series:
        import numpy as np

        rx = np.zeros(len(x), dtype=np.int64)
        ry = np.zeros(len(x), dtype=np.int64)
        d = np.zeros(len(x), dtype=np.int64)
        xi = x.to_numpy(dtype=np.int64, na_value=0).copy()
        yi = y.to_numpy(dtype=np.int64, na_value=0).copy()
        s = np.int64(1 << (bits - 1))
        while s > 0:
            rx = ((xi & s) > 0).astype(np.int64)
            ry = ((yi & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate quadrant
            swap = ry == 0
            flip = swap & (rx == 1)
            xi[flip] = s - 1 - xi[flip]
            yi[flip] = s - 1 - yi[flip]
            xt = xi[swap].copy()
            xi[swap] = yi[swap]
            yi[swap] = xt
            s //= 2
        return pd.Series(d)

    nx = _normalize(F.col(col_x), *ranges[0], bits)
    ny = _normalize(F.col(col_y), *ranges[1], bits)
    return _hilbert(nx, ny)


def sort_key(df: DataFrame, cols: list[str], ranges: list[tuple], strategy: str, bits: int = 16) -> Column:
    if strategy == "zorder":
        return zvalue([F.col(c) for c in cols], ranges, bits)
    if strategy == "hilbert":
        if len(cols) != 2:
            raise ValueError("hilbert strategy needs exactly 2 columns")
        return hilbert_index(df, cols[0], cols[1], ranges, bits)
    if strategy == "order":
        return F.struct(*[F.col(c) for c in cols])
    raise ValueError(f"unknown sort strategy {strategy} (order/zorder/hilbert)")
