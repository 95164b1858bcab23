"""Training-shard export: the deterministic global shuffle that ends a
curation pipeline.

Trainers consume a corpus as N shard files in a reproducible
pseudo-random document order (so any prefix of shards is an unbiased
sample, restarts are exact, and data order is auditable). The portable
way to get that order without a true global sort bottleneck:

- order key  u = md5(key ∥ '-' ∥ seed) as a 60-bit int (uniform);
- shard      s = floor(p · N / 2^28) where p is the first 7 hex digits
  of the same md5 (a 28-bit prefix). The prefix is monotone in the
  order key, so each shard is a CONTIGUOUS slice of the global
  shuffled order and reading shards 0..N-1 in order replays the full
  shuffle; p·N stays far inside bigint, so the assignment is exact
  integer math on any engine (no decimal-division rounding to chase).
- within a shard, rows sort by (u, key) — a per-shard sort, never a
  single-partition stage (the same decomposition packing's global
  cumsum uses).

Shard identity is a PURE FUNCTION of (key, seed, N) — not of cluster
parallelism — so the same corpus exports identically from 4 cores or
1000 executors. ``epoch`` variation is free: a different seed is a
different-but-equally-valid order with zero data movement beforehand.

The manifest records per-shard row counts and a portable checksum
(sum of u mod 2^63, accumulated in decimal so ANSI bigint overflow
can't bite), so a training run can verify it read exactly the export —
the audit a 100 TB pipeline needs when shards travel between systems.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.sampling import sample_key

_MOD63 = 1 << 63
MANIFEST = "_manifest.json"  # _-prefixed: invisible to parquet readers


def shard_columns(key_col: str, n_shards: int, seed: int = 42) -> list:
    """(__u, __shard) expressions: the 60-bit portable order key and
    its contiguous-range shard (28-bit-prefix quantized)."""
    if not 1 <= n_shards <= (1 << 28):
        raise ValueError(
            f"n_shards must be in [1, 2^28], got {n_shards}"
        )
    key = sample_key(key_col, seed)
    u = F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint")
    p = F.conv(F.substring(key, 1, 7), 16, 10).cast("bigint")
    # exact integer math: p*N <= 2^56 fits a long, and the shift (not
    # floor(double division), which rounds above 2^53 and can be off
    # by one at shard boundaries for large N) keeps the assignment
    # bit-identical to the oracle's HUGEINT //
    shard = F.shiftright(p * F.lit(int(n_shards)), 28)
    return [u.alias("__u"), shard.alias("__shard")]


def stage_for_export(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 42,
    curriculum_col: str | None = None,
    curriculum_desc: bool = False,
) -> DataFrame:
    """The exact frame the writer persists: shard columns added, ONE
    hash repartition on the shard id, partition-LOCAL sort — no global
    sort anywhere (plan-shape-tested; exported so the test audits the
    real plan, not a re-implementation).

    ``curriculum_col`` switches the WITHIN-shard order from the shuffle
    key to a score (easy→hard with ascending scores; ``curriculum_desc``
    flips it), the standard curriculum layout for shard-parallel data
    loaders: shard membership stays the unbiased md5 slice — every
    worker still sees a fair sample — while each worker reads its shard
    in curriculum order. Ties fall back to (__u, key), so the order
    stays fully deterministic; shard checksums are order-independent,
    so manifests verify identically."""
    staged = df.select(*df.columns, *shard_columns(key_col, n_shards, seed))
    if curriculum_col is not None:
        cc = F.col(curriculum_col)
        order = [cc.desc() if curriculum_desc else cc.asc(), "__u", key_col]
    else:
        order = ["__u", key_col]
    return staged.repartition(n_shards, "__shard").sortWithinPartitions(
        "__shard", *order
    )


def _shard_stats(staged: DataFrame, key_col: str | None = None) -> DataFrame:
    agg = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("__u").cast("decimal(38,0)")).alias("checksum"),
    ]
    if key_col is not None:
        agg.append(
            F.sum(F.col(key_col).isNull().cast("bigint")).alias("null_keys")
        )
    return staged.groupBy("__shard").agg(*agg)


def export_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 42,
    curriculum_col: str | None = None,
    curriculum_desc: bool = False,
) -> dict:
    """Write ``df`` as ``n_shards`` parquet shard directories under
    ``path`` (``__shard=K/``), rows inside each shard in the global
    deterministic shuffle order — or in score order when
    ``curriculum_col`` is set (see ``stage_for_export``; membership
    and checksums are unaffected, only the within-shard row order
    changes, and the manifest records it) — plus a ``_manifest.json``
    with per-shard row counts and checksums. Returns the manifest dict.

    One shuffle total (hash repartition on the shard id) + a per-shard
    sort. Shard K is the K-th contiguous slice of the md5-shuffled
    corpus. The manifest is computed FROM THE WRITTEN FILES (a
    column-pruned scan of __u/__shard only), never from the source
    plan — so it audits the bytes on disk even if the source mutated
    mid-export, and the source's md5 work runs exactly once. Every
    shard id 0..N-1 gets a manifest entry (empty shards record 0/0),
    and NULL ``key_col`` values are refused loudly: a corpus with NULL
    document keys is corrupt input, not a sharding decision. A prior
    export's ``__u``/``__shard`` columns are dropped on entry, so
    re-exporting a read-back export (new epoch / re-shard) just works."""
    df = df.drop("__u", "__shard")
    staged = stage_for_export(
        df, n_shards, key_col, seed, curriculum_col, curriculum_desc
    )
    (
        staged.write.partitionBy("__shard")
        .mode("overwrite")
        .parquet(path)
    )
    try:
        written = df.sparkSession.read.parquet(path)
        stats = _shard_stats(written, key_col).collect()
    except Exception:
        # an empty corpus writes no part files at all; that's a valid
        # (all-shards-empty) export, not a failure
        if staged.take(1):
            raise
        stats = []
    nulls = sum(int(r["null_keys"] or 0) for r in stats)
    if nulls:
        raise ValueError(
            f"export refused: {nulls} row(s) have NULL {key_col!r} — a "
            "deterministic shuffle needs a real key on every row"
        )
    shards = {
        str(s): {"n_rows": 0, "checksum": 0} for s in range(int(n_shards))
    }
    for r in stats:
        shards[str(int(r["__shard"]))] = {
            "n_rows": int(r["n_rows"]),
            "checksum": int(r["checksum"]) % _MOD63,
        }
    manifest = {
        "n_shards": int(n_shards),
        "seed": int(seed),
        "key_col": key_col,
        "shards": shards,
    }
    if curriculum_col is not None:
        manifest["curriculum"] = {
            "col": curriculum_col,
            "descending": bool(curriculum_desc),
        }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_training_shards(
    spark: SparkSession,
    path: str,
    shards: list[int] | None = None,
    verify: bool = True,
) -> DataFrame:
    """Read an export back (optionally a subset of shards — any prefix
    of the shard list is an unbiased corpus sample). With ``verify``
    the per-shard counts and checksums are re-aggregated and compared
    against the manifest — a mismatched or partially-written export
    refuses loudly instead of training on it."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    if all(v["n_rows"] == 0 for v in manifest["shards"].values()):
        raise ValueError(
            f"export at {path} is empty (all shards hold 0 rows)"
        )
    df = spark.read.parquet(path)
    if shards is not None:
        missing = [s for s in shards if str(int(s)) not in manifest["shards"]]
        if missing:
            raise ValueError(f"shards not in manifest: {missing}")
        df = df.where(F.col("__shard").isin([int(s) for s in shards]))
    if verify:
        keep = None if shards is None else {int(s) for s in shards}
        want = {
            int(k): (v["n_rows"], v["checksum"])
            for k, v in manifest["shards"].items()
            if keep is None or int(k) in keep
        }
        got = {
            int(r["__shard"]): (int(r["n_rows"]), int(r["checksum"]) % _MOD63)
            for r in _shard_stats(df).collect()
        }
        # shards with no rows have no files: absent from data == (0, 0)
        for s in want:
            got.setdefault(s, (0, 0))
        if want != got:
            bad = sorted(
                s for s in set(want) | set(got) if want.get(s) != got.get(s)
            )
            raise ValueError(
                f"export at {path} fails verification for shards {bad}: "
                "manifest vs data disagree"
            )
    return df
