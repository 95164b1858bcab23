"""DSIR: Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169) — pick raw-corpus documents whose hashed bag-of-ngram
distribution looks like a small TARGET corpus.

The published recipe, re-expressed Spark-first:

1. Featurize every document as hashed unigram+bigram occurrence counts
   (the same md5 bucket convention as the quality classifier —
   ``quality_model.hashed_feature_rows`` is reused verbatim, so the
   feature space is shared and engine-portable).
2. Fit two smoothed multinomials over the ``n_buckets`` feature
   buckets: p̂_target from the target corpus, p̂_raw from (a sample of)
   the raw corpus. Two map-side-combined groupBys; the fitted model is
   ≤ ``n_buckets`` rows — always broadcastable.
3. Importance weight of a document = its log likelihood ratio
   log p̂_target(x) − log p̂_raw(x) = Σ over gram occurrences of
   log(p̂_t[bucket]/p̂_r[bucket]).
4. Resample without replacement from the softmax of the weights via
   the Gumbel-top-k trick: key = w/T + Gumbel(u), u a deterministic
   md5 hash of the document key — same sampler as the paper, fully
   reproducible on any engine.

Scale design: fitting is two bucket-count aggregates (map-combined,
output ≤ n_buckets rows); scoring is one broadcast join + one grouped
sum keyed by document — no windows, no driver state. Selection uses
``exact_top_k``: range-repartition on the sort key, per-partition
counts to the driver (ONE row per partition, never data), whole
partitions above the k-boundary taken as-is, and only the single
boundary partition ranked — no global sort, no partition-less window,
no TakeOrdered driver merge of P·k rows. Every stage is linear and
shuffle-bounded at 100 TB.

Reference anchor: the reference engine has no data-selection operator;
this extends the repo's training-data pillar (SURVEY §2 "LLM pipeline"
block) alongside quality_model.py (classifier-based selection) and
sampling.py (mixture construction). Method is public: Xie et al. 2023.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.quality_model import (
    hashed_feature_rows,
)
from flink_table_store_spark.datapipe.sampling import sample_key


def _bucket_counts(
    corpus: DataFrame, text_col: str, n_buckets: int, seed: int, out: str
) -> DataFrame:
    """Per-bucket gram-occurrence counts for one corpus — the ONE
    counting implementation shared by fit_dsir and update_dsir_index
    (the incremental oracle's bit-identical contract depends on both
    paths counting the same way). Ids are irrelevant (only bucket
    totals survive), so monotonically_increasing_id is fine."""
    rows = hashed_feature_rows(
        corpus.select(F.col(text_col)).withColumn(
            "__row", F.monotonically_increasing_id()
        ),
        text_col,
        "__row",
        n_buckets,
        seed,
    )
    return rows.groupBy("bucket").agg(F.count(F.lit(1)).alias(out))


def _finish_model(
    counts: DataFrame,
    tt: float,
    tr: float,
    n_buckets: int,
    seed: int,
    alpha: float,
    spark,
) -> dict:
    """Smoothed log-ratio weights + model dict from a
    (bucket, __tcv, __rcv) count table — the ONE formula shared by
    fit_dsir and model_from_index, so incremental folds stay
    bit-identical to the batch fit by construction. Materializes the
    weights (<= n_buckets rows): every downstream score — including
    one per streaming micro-batch — would otherwise re-run the count
    lineage."""
    a, b = float(alpha), float(n_buckets)
    lr = counts.select(
        "bucket",
        (
            F.log((F.col("__tcv") + a) / F.lit(tt + a * b))
            - F.log((F.col("__rcv") + a) / F.lit(tr + a * b))
        ).alias("lr"),
    )
    try:
        lr = lr.localCheckpoint(eager=True)
    except Exception:
        lr = spark.createDataFrame(lr.collect(), schema=lr.schema)
    return {
        "weights": lr,
        "default_lr": math.log(a / (tt + a * b)) - math.log(a / (tr + a * b)),
        "n_buckets": int(n_buckets),
        "seed": int(seed),
    }


def fit_dsir(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 8192,
    seed: int = 13,
    alpha: float = 1.0,
) -> dict:
    """Fit the two hashed-ngram multinomials and return the model:
    ``weights`` — a (bucket, lr) DataFrame with lr = log p̂_t − log p̂_r
    for every bucket seen in EITHER corpus — plus ``default_lr`` for
    buckets seen in neither (both probabilities fall back to their
    smoothing floor, so the constant is exact, not an approximation).

    ``target`` is typically small (a held-out slice of the domain you
    want more of); ``raw`` is the corpus being selected from — fitting
    on a sample of raw is standard and sound (the multinomial is a
    64k-bucket histogram; a few million grams saturate it).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")

    # ONE fused counting pass over target ∪ raw (r11 optimization
    # round, guide §1.2/§2.4): tag each corpus's rows and split the
    # per-bucket occurrence count with two conditional sums. The
    # previous shape ran _bucket_counts twice (two full gram-explode +
    # md5 passes, two shuffles) and full-outer-joined the two ≤n_buckets
    # count tables; the fused aggregate produces the identical
    # (bucket, __tcv, __rcv) integers — a bucket seen in either corpus
    # appears, the other side's sum is exactly 0 — in one pass and one
    # shuffle. _bucket_counts stays as-is for the incremental-index
    # fold, whose bit-identical contract it anchors.
    tagged = (
        target.select(F.col(text_col)).withColumn("__tag", F.lit(1))
        .unionByName(raw.select(F.col(text_col)).withColumn("__tag", F.lit(0)))
        .withColumn("__row", F.monotonically_increasing_id())
    )
    rows = hashed_feature_rows(
        tagged, text_col, "__row", n_buckets, seed, carry=["__tag"]
    )
    counts = rows.groupBy("bucket").agg(
        F.sum("__tag").alias("__tcv"),
        F.sum(F.lit(1) - F.col("__tag")).alias("__rcv"),
    )
    try:
        # materialize the count table (<= n_buckets rows) BEFORE
        # anything reads it: the totals collect and the model
        # checkpoint below would otherwise each re-run the full gram
        # explode over both corpora
        counts = counts.localCheckpoint(eager=True)
    except Exception:
        import warnings

        warnings.warn(
            "fit_dsir: localCheckpoint unavailable; the gram explode "
            "will re-run for the totals and the model "
            "materialization (~2x fit cost)",
            RuntimeWarning,
            stacklevel=2,
        )
    tot = counts.agg(
        F.sum("__tcv").alias("t"), F.sum("__rcv").alias("r")
    ).collect()[0]
    tt, tr = float(tot["t"] or 0), float(tot["r"] or 0)
    if tt == 0 or tr == 0:
        raise ValueError(
            f"both corpora need at least one gram (target={int(tt)}, "
            f"raw={int(tr)} gram occurrences)"
        )
    return _finish_model(
        counts, tt, tr, n_buckets, seed, alpha, target.sparkSession
    )


def score_dsir(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document importance weight: Σ over gram OCCURRENCES of the
    bucket log-ratio (occurrence-weighted, as the paper's multinomial
    likelihood requires). Returns (id_col, n_grams,
    dsir_logratio rounded to 4 — the repo's cross-engine FP
    convention). Documents whose text yields no grams (NULL/empty)
    score NULL with n_grams = 0: an invisible document is not evidence
    either way, matching quality_model's contract."""
    rows = hashed_feature_rows(
        docs, text_col, id_col, model["n_buckets"], model["seed"]
    )
    joined = rows.join(F.broadcast(model["weights"]), "bucket", "left")
    per_doc = joined.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(
            F.coalesce(F.col("lr"), F.lit(float(model["default_lr"])))
        ).alias("__w"),
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.round(F.col("__w"), 4).alias("dsir_logratio"),
        )
    )


def exact_top_k(
    df: DataFrame,
    order_col: str | Column,
    k: int,
    tie_col: str | Column | None = None,
    descending: bool = True,
    n_partitions: int | None = None,
) -> DataFrame:
    """EXACT global top-k without a global sort, a partition-less
    window, or a P·k driver merge (``orderBy().limit(k)`` collects the
    per-partition top-k lists onto the driver — dead at k in the
    hundreds of millions).

    Plan: range-repartition on (order_col, tie_col) → pin the layout
    (localCheckpoint, so both passes see identical partitions) → count
    rows per partition (ONE row per partition to the driver, never
    data) → prefix-sum on the driver picks the partitions wholly
    inside the top-k (taken with a pure filter, no sort) and THE ONE
    boundary partition, which alone is ranked with a
    partitionBy(spark_partition_id()) window — group size stays ~|df|/P
    as long as (order_col, tie_col) is splittable (see tie note below).

    Deterministic given deterministic (order_col, tie_col): selection
    is by exact rank, not by the (sampled) range boundaries. Pass a
    UNIQUE tie_col for reproducible output — it does double duty:
    beyond fixing which of the k-th-equal rows win, it lets the range
    partitioner split heavy tie classes of order_col across partitions
    (with ties only on the order column, one tie class is one range —
    a single task would rank it all). Without tie_col a synthetic
    per-run tiebreak is injected so the boundary-partition bound still
    holds, but the k-th row among equals is then arbitrary-but-valid
    rather than reproducible.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    synthetic_tie = tie_col is None
    if synthetic_tie:
        df = df.withColumn("__tie", F.monotonically_increasing_id())
        tc = F.col("__tie")
    else:
        tc = F.col(tie_col) if isinstance(tie_col, str) else tie_col
    sort_cols = [oc.desc() if descending else oc.asc(), tc.asc()]
    P = n_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    try:
        # pin the INPUT before the range shuffle (r11 optimization
        # round, guide §1.2): repartitionByRange first runs a
        # range-boundary SAMPLING pass over its child, so an expensive
        # upstream lineage (e.g. DSIR scoring's gram explode) would
        # execute twice — once for the sample, once for the shuffle.
        # Pinned, both passes read materialized rows.
        df = df.localCheckpoint(eager=True)
    except Exception:
        pass  # the parted checkpoint below is the load-bearing one
    parted = df.repartitionByRange(P, *sort_cols)
    try:
        # this second pin is CORRECTNESS-load-bearing, not an
        # optimization (r12 adjudication of ADVICE r11): the two-pass
        # scheme below runs two ACTIONS over `parted`, and
        # repartitionByRange re-samples its range boundaries per action
        # (the sampler's seed derives from the execution's RDD id), so
        # an unpinned `parted` could place rows differently between the
        # count pass and the selection pass. Dropping the INPUT pin
        # instead was micro-measured a loss (dsir_select_10x 9.3s vs
        # 7.2s in adjacent runs) — both pins stay.
        parted = parted.localCheckpoint(eager=True)
    except Exception:
        # correctness of the two-pass plan holds only if the recomputed
        # layout is identical; refuse the risk. The fallback is the
        # driver-merging TakeOrdered plan — loud, because at large k
        # that is exactly the plan this primitive exists to avoid.
        import warnings

        warnings.warn(
            "exact_top_k: localCheckpoint unavailable; falling back to "
            "orderBy().limit(k) (driver merges up to P*k rows)",
            RuntimeWarning,
            stacklevel=2,
        )
        out = df.orderBy(*sort_cols).limit(k)
        return out.drop("__tie") if synthetic_tie else out
    with_pid = parted.withColumn("__pid", F.spark_partition_id())
    counts = sorted(
        (r["__pid"], r["c"])
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    whole, boundary, need, prefix = [], None, k, 0
    for pid, c in counts:
        if need <= 0:
            break
        if c <= need:
            whole.append(pid)
            need -= c
        else:
            boundary, prefix = pid, need
            need = 0
    out = with_pid.where(F.col("__pid").isin(whole)) if whole else None
    if boundary is not None and prefix > 0:
        w = Window.partitionBy("__pid").orderBy(*sort_cols)
        edge = (
            with_pid.where(F.col("__pid") == boundary)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= prefix)
            .drop("__rn")
        )
        out = edge if out is None else out.unionByName(edge)
    if out is None:
        out = df.limit(0)
        return out.drop("__tie") if synthetic_tie else out
    out = out.drop("__pid")
    return out.drop("__tie") if synthetic_tie else out


def dsir_resample(
    docs: DataFrame,
    model: dict,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    seed: int = 7,
) -> DataFrame:
    """Select ``k`` documents without replacement from
    softmax(weight / temperature) via Gumbel-top-k: per-doc key =
    w/T + Gumbel(u) with u = (md5₆₀(id ∥ seed)+1)/(2⁶⁰+2) — the exact
    sampler for the paper's resampling step, deterministic and
    engine-portable. Unscorable documents (no grams → NULL weight) are
    excluded before sampling, as in ``quality_filter``: a document the
    model cannot see is not evidence of domain fit. Returns the
    selected documents with their ``dsir_logratio``."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    scored = score_dsir(docs, model, text_col, id_col).where(
        F.col("dsir_logratio").isNotNull()
    )
    u = (
        F.conv(F.substring(sample_key(id_col, seed), 1, 15), 16, 10).cast(
            "bigint"
        )
        + F.lit(1)
    ).cast("double") / F.lit(float((1 << 60) + 2))
    gumbel = -F.log(-F.log(u))
    # selection runs over NARROW proxy rows (id, n_grams, weight, key) —
    # the document payload never enters the range shuffle; the k winners
    # join back against the corpus by id afterwards (one equi-join whose
    # build side is exactly k rows). r11 optimization round, guide §8:
    # decide with small rows, move heavy rows once. Same selected set:
    # selection is by exact rank on (key, id), computed from the same
    # scores.
    keyed = scored.withColumn(
        "__gk",
        F.col("dsir_logratio") / F.lit(float(temperature))
        + gumbel,
    )
    top = exact_top_k(keyed, "__gk", k, tie_col=id_col).drop("__gk")
    other = [c for c in docs.columns if c != id_col]
    return docs.join(top, id_col).select(
        id_col, *other, "n_grams", "dsir_logratio"
    )


# ---------------------------------------------------------------------------
# incremental DSIR: the fitted model as engine-native table state
# ---------------------------------------------------------------------------

DSIR_INDEX_DDL = "bucket int, tc bigint, rc bigint"


def create_dsir_index(
    catalog, name: str, *, n_buckets: int = 8192, seed: int = 13,
    buckets: int = 4,
):
    """Persistent DSIR model state as an engine PK table: one row per
    feature bucket, counts maintained SERVER-SIDE by the aggregation
    merge engine (``fields.*.aggregate-function = sum``) — appending a
    batch\'s counts IS the model update; no read-modify-write, no
    driver state, replay-safe via commit identifiers like the three
    dedup indexes. The feature-space parameters ride in the table
    options so every writer provably hashes the same way."""
    return catalog.create_table(
        name,
        DSIR_INDEX_DDL,
        primary_keys=["bucket"],
        options={
            "merge-engine": "aggregation",
            "fields.tc.aggregate-function": "sum",
            "fields.rc.aggregate-function": "sum",
            "bucket": str(buckets),
            "dsir.n-buckets": str(int(n_buckets)),
            "dsir.seed": str(int(seed)),
        },
    )


def _index_params(index) -> tuple[int, int]:
    opts = index.schema.options
    try:
        return int(opts["dsir.n-buckets"]), int(opts["dsir.seed"])
    except KeyError as e:
        raise ValueError(
            "not a DSIR index table: missing option " + str(e)
        ) from None


def update_dsir_index(
    index,
    docs: DataFrame,
    corpus: str = "raw",
    *,
    text_col: str = "text",
    commit_identifier: str | None = None,
) -> None:
    """Fold one batch\'s gram-bucket counts into the index.
    ``corpus``: \'target\', \'raw\', or \'both\' (a labeled in-domain batch
    that is also part of the selected-from pool). One map-combined
    groupBy per batch; the write is <= n_buckets rows. Pass a
    ``commit_identifier`` from your ingestion loop for exactly-once
    folding — a replayed identifier is a no-op, never a double count."""
    if corpus not in ("target", "raw", "both"):
        raise ValueError(
            f"corpus must be \'target\', \'raw\' or \'both\', got {corpus!r}"
        )
    n_buckets, seed = _index_params(index)
    counts = _bucket_counts(docs, text_col, n_buckets, seed, "__n")
    t = F.col("__n") if corpus in ("target", "both") else F.lit(0)
    r = F.col("__n") if corpus in ("raw", "both") else F.lit(0)
    rows = counts.select(
        F.col("bucket").cast("int").alias("bucket"),
        t.cast("bigint").alias("tc"),
        r.cast("bigint").alias("rc"),
    )
    index.refresh().write(rows, commit_identifier=commit_identifier)


def model_from_index(spark, index, alpha: float = 1.0) -> dict:
    """Materialize the scoring model from the index state — the same
    dict ``fit_dsir`` returns, so ``score_dsir``/``dsir_resample`` (and
    the streaming curation gate) work unchanged. Incremental folds of
    batch counts sum to exactly the batch fit\'s counts, so the model
    is bit-identical to refitting on everything ingested so far."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    n_buckets, seed = _index_params(index)
    state = index.refresh().to_df(spark)
    tot = state.agg(
        F.sum("tc").alias("t"), F.sum("rc").alias("r")
    ).collect()[0]
    tt, tr = float(tot["t"] or 0), float(tot["r"] or 0)
    if tt == 0 or tr == 0:
        raise ValueError(
            f"index needs counts for both corpora (target={int(tt)}, "
            f"raw={int(tr)} gram occurrences)"
        )
    counts = state.select(
        "bucket", F.col("tc").alias("__tcv"), F.col("rc").alias("__rcv")
    )
    return _finish_model(counts, tt, tr, n_buckets, seed, alpha, spark)


def score_novelty(
    docs: DataFrame,
    reference,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    seed: int = 13,
) -> DataFrame:
    """Hashed n-gram NOVELTY against a reference corpus: per document,
    the fraction of its gram occurrences whose hashed feature bucket
    was never seen in the reference — the cheap diversity/novelty
    signal (high = unlike anything already collected; near 0 = more of
    the same). Collisions can only UNDERCOUNT novelty (a novel gram
    landing in a seen bucket reads as seen), so the score is a
    conservative lower bound — the right direction for a keep-novel
    selection gate.

    ``reference`` is either a DataFrame corpus (counted on the fly
    with the shared md5 feature space) or a DSIR index TABLE from
    ``create_dsir_index`` — the persistent raw-corpus counts double as
    the novelty reference, so the signal updates in O(batch) on the
    ingest path with no extra state. Returns (id_col, n_grams,
    novelty rounded to 4); docs with no grams score NULL."""
    if isinstance(reference, dict):
        raise TypeError(
            "score_novelty takes a reference CORPUS (DataFrame) or a "
            "DSIR INDEX TABLE (create_dsir_index) — not the fitted "
            "model dict; novelty needs the seen-bucket set, which the "
            "log-ratio model does not carry"
        )
    if isinstance(reference, DataFrame):
        seen = (
            _bucket_counts(reference, text_col, n_buckets, seed, "__n")
            .where(F.col("__n") > 0)
            .select("bucket")
        )
    else:
        n_buckets, seed = _index_params(reference)
        seen = (
            reference.refresh()
            .to_df(docs.sparkSession)
            .where((F.col("tc") + F.col("rc")) > 0)
            .select("bucket")
        )
    rows = hashed_feature_rows(docs, text_col, id_col, n_buckets, seed)
    flagged = rows.join(
        F.broadcast(seen.withColumn("__seen", F.lit(1))), "bucket", "left"
    )
    per_doc = flagged.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.avg(
            F.when(F.col("__seen").isNull(), 1.0).otherwise(0.0)
        ).alias("__nov"),
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.round(F.col("__nov"), 4).alias("novelty"),
        )
    )


def corpus_divergence(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    n_buckets: int = 8192,
    seed: int = 13,
    alpha: float = 1.0,
) -> DataFrame:
    """Distribution drift between two corpora over the shared hashed
    n-gram feature space: KL(a‖b), KL(b‖a), and the symmetric,
    bounded Jensen–Shannon divergence (base-2 JS ∈ [0, 1]) between the
    two alpha-smoothed bucket multinomials — "did the new crawl shift?"
    as one number. The same smoothing as ``fit_dsir`` keeps every log
    finite: p_i = (c_i + α) / (T + α·B) over all B buckets, including
    never-seen ones.

    Scale design: each corpus collapses to ≤ ``n_buckets`` count rows
    via the shared map-combined ``_bucket_counts``; the divergence is a
    full-outer join of those two bounded tables, a one-row total, and a
    closed-form remainder for the (B − observed) buckets both corpora
    missed — those all share the same floor probabilities, so they are
    ONE arithmetic term, never materialized. Nothing downstream of the
    two counting passes touches corpus-sized data.

    Returns one row: (n_grams_a, n_grams_b, n_active, kl_ab, kl_ba,
    js) with divergences in bits, rounded to 6."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    # ONE fused counting pass over a ∪ b (r11 optimization round — the
    # same tagged-union fuse as fit_dsir): identical per-bucket integers
    # to two _bucket_counts + full-outer join, in half the gram passes
    # and one shuffle
    tagged = (
        a.select(F.col(text_col)).withColumn("__tag", F.lit(1))
        .unionByName(b.select(F.col(text_col)).withColumn("__tag", F.lit(0)))
        .withColumn("__row", F.monotonically_increasing_id())
    )
    rows = hashed_feature_rows(
        tagged, text_col, "__row", n_buckets, seed, carry=["__tag"]
    )
    j = rows.groupBy("bucket").agg(
        F.sum("__tag").alias("__ca"),
        F.sum(F.lit(1) - F.col("__tag")).alias("__cb"),
    ).select("__ca", "__cb")
    return _divergence_of_joined(j, n_buckets, alpha)


def divergence_from_index(
    spark,
    index,
    batch: DataFrame,
    text_col: str = "text",
    side: str = "raw",
    alpha: float = 1.0,
) -> DataFrame:
    """``corpus_divergence`` with side *a* read from a persistent DSIR
    index (``create_dsir_index``) instead of re-counting the corpus —
    the O(batch) drift monitor: the accumulated state IS the reference
    distribution, so each incoming batch costs one counting pass over
    ITSELF plus a join of two ≤ n_buckets tables, never a re-scan of
    everything ingested so far. Folded counts sum to exactly the
    direct counts, so the result is identical to the two-corpora path
    (the oracle for both is the same SQL). ``side``: which index
    accumulator is the reference ('raw' or 'target')."""
    if side not in ("raw", "target"):
        raise ValueError(f"side must be 'raw' or 'target', got {side!r}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    n_buckets, seed = _index_params(index)
    col = {"raw": "rc", "target": "tc"}[side]
    ca = (
        index.refresh()
        .to_df(spark)
        .where(F.col(col) > 0)
        .select("bucket", F.col(col).alias("__ca"))
    )
    cb = _bucket_counts(batch, text_col, n_buckets, seed, "__cb")
    return _divergence_of_counts(ca, cb, n_buckets, alpha)


def _divergence_of_counts(
    ca: DataFrame, cb: DataFrame, n_buckets: int, alpha: float
) -> DataFrame:
    """The shared divergence algebra over two (bucket, count) tables —
    ONE implementation so the from-index and two-corpora paths are
    bit-identical by construction."""
    j = ca.join(cb, "bucket", "full_outer").select(
        F.coalesce(F.col("__ca"), F.lit(0)).alias("__ca"),
        F.coalesce(F.col("__cb"), F.lit(0)).alias("__cb"),
    )
    return _divergence_of_joined(j, n_buckets, alpha)


def _divergence_of_joined(
    j: DataFrame, n_buckets: int, alpha: float
) -> DataFrame:
    """Divergence algebra over an already-joined (__ca, __cb) count
    table. The table is pinned first (≤ 2·n_buckets rows): both the
    totals row and the per-bucket term sums read it, and without the
    pin its upstream counting lineage would execute once per consumer
    (r11 optimization round)."""
    try:
        j = j.localCheckpoint(eager=True)
    except Exception:
        pass  # correctness unaffected; the lineage just re-runs per consumer
    al, bk = float(alpha), float(n_buckets)
    # one-row totals over the <= 2*n_buckets observed rows
    tot = j.agg(
        F.sum("__ca").alias("__ta"),
        F.sum("__cb").alias("__tb"),
        F.count(F.lit(1)).alias("__n_obs"),
    )
    pa = (F.col("__ca") + F.lit(al)) / (F.col("__ta") + F.lit(al * bk))
    pb = (F.col("__cb") + F.lit(al)) / (F.col("__tb") + F.lit(al * bk))
    m = (pa + pb) / F.lit(2.0)
    terms = j.crossJoin(F.broadcast(tot)).agg(
        F.sum(pa * F.log2(pa / pb)).alias("__kab"),
        F.sum(pb * F.log2(pb / pa)).alias("__kba"),
        F.sum(pa * F.log2(pa / m) + pb * F.log2(pb / m)).alias("__j2"),
    )
    # closed-form remainder: every unobserved bucket has the same floor
    # probabilities pa0/pb0 — (B - n_obs) identical addends
    pa0 = F.lit(al) / (F.col("__ta") + F.lit(al * bk))
    pb0 = F.lit(al) / (F.col("__tb") + F.lit(al * bk))
    m0 = (pa0 + pb0) / F.lit(2.0)
    n_miss = (F.lit(n_buckets) - F.col("__n_obs")).cast("double")
    return (
        terms.crossJoin(F.broadcast(tot))
        .select(
            F.col("__ta").cast("bigint").alias("n_grams_a"),
            F.col("__tb").cast("bigint").alias("n_grams_b"),
            F.col("__n_obs").cast("bigint").alias("n_active"),
            F.round(
                F.col("__kab") + n_miss * pa0 * F.log2(pa0 / pb0), 6
            ).alias("kl_ab"),
            F.round(
                F.col("__kba") + n_miss * pb0 * F.log2(pb0 / pa0), 6
            ).alias("kl_ba"),
            F.round(
                (
                    F.col("__j2")
                    + n_miss
                    * (pa0 * F.log2(pa0 / m0) + pb0 * F.log2(pb0 / m0))
                )
                / F.lit(2.0),
                6,
            ).alias("js"),
        )
    )
