"""Sequence packing: assemble documents into fixed-length training rows.

The step between a curated corpus and a training run: every example fed
to the model is exactly ``seq_len`` tokens, so documents must be packed
into windows. Two standard strategies, both deterministic and
engine-portable:

- ``pack_sequences`` — GPT-style "concatenate then cut": documents are
  laid end-to-end in a deterministic order (a portable hash of the key,
  i.e. a reproducible shuffle) and the stream is cut every ``seq_len``
  tokens. Zero padding waste; documents may straddle a cut (the usual
  causal-LM pretraining layout). Output: one row per (doc, pack) span.
- ``pack_first_fit`` — no-split packing: each document lands in
  exactly one pack (padded packs), for SFT-style data where crossing
  boundaries is wrong. Exact first-fit-decreasing per deterministic
  shard (bin packing is inherently sequential, so density needs a real
  FFD — Arrow-batched ``applyInPandas``, one shard per task).

Scale design: ``pack_sequences`` computes a GLOBAL cumulative token
sum without a global sort. The deterministic order key is a uniform
md5 hex string, so its hex PREFIX partitions the global order into
contiguous, balanced ranges with no sampling step: the cumsum runs as
a per-prefix-shard window (embarrassingly parallel sort-shuffle) plus
a broadcast of per-shard prefix offsets (one tiny map-combined
aggregate, <= n_shards rows on the driver). Output is bit-identical
to a single global window — the default is scale-safe; nothing ever
moves the corpus to one partition. ``pack_first_fit`` shuffles once on
the shard hash and packs each shard independently; waste from shard
tails is bounded by one partial pack per shard, and n_shards is a
reproducibility parameter, not a cluster property.
"""

from __future__ import annotations

import zlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.sampling import sample_key


def _order_key(key_col: str, seed: int) -> Column:
    # portable deterministic shuffle order (md5 — same on any engine)
    return sample_key(key_col, seed)


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    seed: int = 42,
    shard_col: str | None = None,
    n_shards: int = 4096,
) -> DataFrame:
    """Concatenate-then-cut packing. Documents are ordered by a
    deterministic hash of ``key_col`` (a reproducible shuffle), laid
    end-to-end, and the token stream is cut every ``seq_len``. Returns
    one row per (document, pack) SPAN:

    - ``pack_id``     — 0-based index of the training row
    - ``pack_offset`` — where this span starts inside the pack
    - ``doc_offset``  — where this span starts inside the document
    - ``span_tokens`` — span length (= doc tokens unless it straddles)

    A document longer than ``seq_len`` spans several packs; the spans
    partition it exactly. sum(span_tokens) == sum(n_tokens): no token
    is dropped or duplicated.

    With the default ``shard_col=None`` the stream is GLOBAL but the
    cumsum never runs as a global single-partition window: the order
    key's uniform hex prefix splits the global order into ``n_shards``
    contiguous ranges (rounded up to a power of 16), each shard cumsums
    independently, and the exclusive prefix offset of every shard —
    computed by one tiny map-combined aggregate and carried back via a
    broadcast join — lifts local positions to global ones. The result
    is bit-identical to a single global window (rows with equal order
    keys share a prefix, hence a shard, so RANGE-frame tie semantics
    are preserved). ``shard_col`` instead packs INDEPENDENT streams per
    shard value (different semantics: pack_ids restart per shard).
    ``n_shards`` only affects parallelism, never output.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n = F.col(token_col).cast("bigint")
    okey = _order_key(key_col, seed)
    if shard_col:
        w = Window.partitionBy(shard_col).orderBy(okey, key_col)
        # end-exclusive cumulative token position of each document
        cum_end = F.sum(n).over(w)
        base = df.where(n > 0).select(
            *df.columns,
            (cum_end - n).alias("__start"),
            cum_end.alias("__end"),
        )
    else:
        base = _global_cumsum(df, n, okey, key_col, n_shards)
    # a document covers packs floor(start/L) .. floor((end-1)/L); emit
    # one span per covered pack via a narrow posexplode (width = number
    # of packs the doc touches — 1 for all docs shorter than seq_len)
    L = F.lit(int(seq_len)).cast("bigint")
    first_pack = (F.col("__start") / L).cast("bigint")
    last_pack = ((F.col("__end") - 1) / L).cast("bigint")
    spans = base.select(
        *df.columns,
        "__start",
        "__end",
        F.posexplode(
            F.sequence(first_pack, last_pack)
        ).alias("__i", "pack_id"),
    )
    pack_start = F.col("pack_id") * L
    span_start = F.greatest(F.col("__start"), pack_start)
    span_end = F.least(F.col("__end"), pack_start + L)
    return spans.select(
        *df.columns,
        F.col("pack_id"),
        (span_start - pack_start).alias("pack_offset"),
        (span_start - F.col("__start")).alias("doc_offset"),
        (span_end - span_start).alias("span_tokens"),
    )


def _global_cumsum(
    df: DataFrame, n: Column, okey: Column, key_col: str, n_shards: int
) -> DataFrame:
    """Global end-exclusive token cumsum in (okey, key_col) order,
    computed scale-safely: hex-prefix range shards -> per-shard window
    cumsum -> broadcast exclusive prefix offsets. Because the md5 order
    key is a fixed-width lowercase hex string, lexicographic order
    equals numeric order and any prefix is monotone in it — so prefix
    shards are exact contiguous ranges of the global order and the
    recombined cumsum is bit-identical to one global window, with no
    single-partition stage anywhere.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    k = 1
    while (16**k) < min(n_shards, 16**8):
        k += 1
    live = df.where(n > 0).withColumn("__ps_shard", F.substring(okey, 1, k))
    # tiny driver hop: <= 16^k rows of (shard, token total); the shard
    # assignment is a pure function of the data, so recomputing it in
    # the main job below is deterministic — no caching needed
    totals = live.groupBy("__ps_shard").agg(F.sum(n).alias("__t")).collect()
    rows, running = [], 0
    for r in sorted(totals, key=lambda r: r["__ps_shard"]):
        rows.append((r["__ps_shard"], running))
        running += int(r["__t"])
    offsets = df.sparkSession.createDataFrame(
        rows, "__ps_shard string, __ps_off bigint"
    )
    w = Window.partitionBy("__ps_shard").orderBy(okey, key_col)
    cum_end = F.sum(n).over(w) + F.col("__ps_off")
    return (
        live.join(F.broadcast(offsets), "__ps_shard")
        .select(
            *df.columns,
            (cum_end - n).alias("__start"),
            cum_end.alias("__end"),
        )
    )


def pack_first_fit(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    shard_col: str | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """No-split packing: each document goes to exactly ONE pack, packs
    hold ≤ ``seq_len`` tokens, remainder is padding. Documents longer
    than ``seq_len`` are refused loudly (truncate or chunk first —
    silent truncation corrupts training data).

    Bin packing is inherently sequential — no composition of window
    functions reaches first-fit density — so this runs EXACT first-fit-
    decreasing per shard in an Arrow-batched ``applyInPandas``: docs
    shard deterministically by a portable hash of ``key_col`` (or by
    ``shard_col``), each shard packs independently with FFD (≈2-3%
    waste on natural length mixes, 11/9·OPT+1 worst case), and waste
    from shard tails is ≤ one partial pack per shard. ``n_shards`` is
    a FIXED parameter, not cluster parallelism, so the same corpus and
    seed produce the same packs on any cluster — reproducibility is
    what makes a training run auditable. Size it so a shard's docs fit
    an executor's memory (shard ≈ corpus/n_shards).

    Returns the input plus ``pack_id`` (unique across shards, sparse)
    and ``pack_tokens`` (total tokens of the pack).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n = F.col(token_col).cast("bigint")
    too_long = df.where(n > seq_len)
    if too_long.take(1):
        raise ValueError(
            f"pack_first_fit: document(s) longer than seq_len={seq_len} "
            f"(e.g. {too_long.select(key_col, token_col).first()}); "
            "chunk or truncate first"
        )
    import pandas as pd

    from pyspark.sql import types as T

    if shard_col:
        shard_expr = F.col(shard_col).cast("string")
    else:
        shard_expr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("string")
    staged = df.withColumn("__shard", shard_expr)
    out_schema = T.StructType(
        list(staged.schema.fields)
        + [
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_tokens", T.LongType()),
        ]
    )
    key_name, tok_name, L = key_col, token_col, int(seq_len)
    stride = 1 << 40

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact first-fit-decreasing; deterministic via (len desc, key).
        # The "first bin with capacity >= x" query runs on a max segment
        # tree over bin capacities — O(n log n) per shard, where the
        # naive linear probe is O(n * bins) and falls over on
        # million-doc shards
        pdf = pdf.sort_values(
            [tok_name, key_name], ascending=[False, True]
        ).reset_index(drop=True)
        sh = pdf["__shard"].iloc[0]
        # stable across processes (Python's hash() is salted per run)
        shard_id = (
            int(sh)
            if sh.isdigit()
            else zlib.crc32(sh.encode("utf-8")) & 0x7FFFF
        )
        n_docs = len(pdf)
        size = 1
        while size < max(n_docs, 1):
            size *= 2
        tree = [0] * (2 * size)  # max remaining capacity per subtree
        n_bins = 0

        def _set(i: int, cap: int) -> None:
            j = size + i
            tree[j] = cap
            j //= 2
            while j:
                tree[j] = max(tree[2 * j], tree[2 * j + 1])
                j //= 2

        def _first_fit(x: int) -> int:
            if tree[1] < x:
                return -1
            j = 1
            while j < size:
                j = 2 * j if tree[2 * j] >= x else 2 * j + 1
            return j - size

        assign = []
        caps: list[int] = []
        for tok in pdf[tok_name].astype("int64"):
            tok = int(tok)
            placed = _first_fit(tok)
            if placed < 0 or placed >= n_bins:
                placed = n_bins
                n_bins += 1
                caps.append(L)
            caps[placed] -= tok
            _set(placed, caps[placed])
            assign.append(placed)
        pdf["pack_id"] = [shard_id * stride + a for a in assign]
        fill = {}
        for a, tok in zip(assign, pdf[tok_name].astype("int64")):
            fill[a] = fill.get(a, 0) + int(tok)
        pdf["pack_tokens"] = [fill[a] for a in assign]
        return pdf

    return (
        staged.groupBy("__shard")
        .applyInPandas(_ffd, schema=out_schema)
        .drop("__shard")
    )


def packing_stats(
    packed: DataFrame, seq_len: int, span_col: str = "span_tokens"
) -> DataFrame:
    """Efficiency summary of a packing: packs, tokens, fill rate."""
    per_pack = packed.groupBy("pack_id").agg(
        F.sum(span_col).alias("fill"), F.count(F.lit(1)).alias("n_spans")
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("fill").alias("total_tokens"),
        F.round(F.avg(F.col("fill") / F.lit(float(seq_len))), 4).alias("avg_fill"),
        F.round(F.avg("n_spans"), 2).alias("avg_docs_per_pack"),
    )
