"""Model-based quality scoring: a hashed-n-gram linear classifier.

The quality step modern corpora actually ship (DCLM's fastText filter,
fineweb-edu's classifier) is model-based, not heuristic: a cheap linear
model over hashed word n-grams scores every document and a threshold
keeps the top slice. This module is that operator with BOTH halves —
training and inference — expressed as portable DataFrame ops, so the
same (corpus, seed) produces the same scores on Spark or any ANSI
engine (the DuckDB oracle replays training AND scoring bit-for-bit):

- features: lowercase word unigrams + bigrams, hashed into
  ``n_buckets`` ids with the portable md5 key (same scheme as
  datapipe.sampling.sample_key — hex prefix → 60-bit int → mod).
- training: Naive-Bayes log-odds per feature bucket (the NBSVM /
  fastText-init weighting):
      w(b) = log((pos_b + α) / (pos_total + α·B))
           − log((neg_b + α) / (neg_total + α·B))
  One explode + one map-combined groupBy — near-linear, no driver
  state beyond two scalars.
- inference: score(doc) = σ(bias + mean_b∈doc w(b)). The weight table
  is ≤ n_buckets rows → broadcast join; scoring is explode → broadcast
  join → re-agg on the doc key. The mean (not sum) keeps scores
  length-calibrated, matching fastText's normalized bag-of-features.

Scale design: training shuffles once on the bucket id (≤ B distinct
keys, map-combined); scoring's only shuffle is the per-doc partial
re-aggregation. The model is one small DataFrame — train on a labeled
sample, broadcast to score 100 TB. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _grams(col: Column) -> Column:
    """Word unigrams + bigrams (space-joined) of lowercased text."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")
    bis = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bis = F.slice(bis, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    # drop '' grams: split('') yields [''], which would hand empty-but-
    # non-NULL text one phantom feature and let '' train as a gram —
    # the documented no-gram→NULL-score contract needs it gone
    return F.filter(F.concat(toks, bis), lambda g: g != F.lit(""))


def hashed_feature_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 65536,
    seed: int = 42,
    carry: list[str] | None = None,
) -> DataFrame:
    """(``__id``, ``bucket``, *carry) — one row per n-gram OCCURRENCE,
    bucket = md5-60-bit(gram ∥ '-' ∥ seed) mod ``n_buckets``.
    Occurrence rows (not distinct sets) so repeated grams weigh in, as
    in fastText's bag of features. ``carry`` columns ride along the
    explode (narrow — no join needed to keep a label with its rows)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    gram = F.explode(_grams(F.col(text_col))).alias("__g")
    rows = df.select(
        F.col(id_col).alias("__id"), *[F.col(c) for c in (carry or [])], gram
    )
    key = F.md5(F.concat_ws("-", F.col("__g"), F.lit(str(seed))))
    bucket = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("bigint"),
        F.lit(int(n_buckets)),
    )
    return rows.select("__id", *(carry or []), bucket.alias("bucket"))


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    n_buckets: int = 65536,
    seed: int = 42,
    alpha: float = 1.0,
) -> dict:
    """Train NB log-odds weights from ``labeled`` (``label_col`` ∈
    {0,1}; 1 = high quality). Returns ``{"weights": DataFrame(bucket,
    weight), "bias": float, "n_buckets": int, "seed": int}``. The bias
    is the class prior log-odds log(P/N)."""
    lab = F.col(label_col).cast("bigint")
    rows = hashed_feature_rows(
        labeled.select(F.col(id_col), F.col(text_col), lab.alias("__lab")),
        text_col, id_col, n_buckets, seed, carry=["__lab"],
    )
    per_bucket = rows.groupBy("bucket").agg(
        F.sum("__lab").alias("pos"),
        F.sum(F.lit(1) - F.col("__lab")).alias("neg"),
    )
    tot = labeled.agg(
        F.sum(lab).alias("p_docs"),
        F.sum(F.lit(1) - lab).alias("n_docs"),
        F.min(lab).alias("lo"),
        F.max(lab).alias("hi"),
        F.count(F.lit(1)).alias("n_all"),
        F.count(lab).alias("n_lab"),
        # raw-vs-cast drift: a fractional label (0.9) truncates to 0
        # under the bigint cast and would otherwise pass the 0/1 check
        # while silently training on corrupted classes
        F.max(
            F.abs(F.col(label_col).cast("double") - lab.cast("double"))
        ).alias("frac"),
    ).collect()[0]
    if (
        tot["lo"] is None
        or tot["lo"] < 0
        or tot["hi"] > 1
        or tot["n_lab"] != tot["n_all"]
        or (tot["frac"] or 0.0) != 0.0
    ):
        raise ValueError(
            "labels must be integral 0/1 and NULL-free, got range "
            f"[{tot['lo']}, {tot['hi']}] with "
            f"{tot['n_all'] - tot['n_lab']} NULL(s) and max fractional "
            f"part {tot['frac']}"
        )
    p_docs, n_docs = int(tot["p_docs"]), int(tot["n_docs"])
    if p_docs == 0 or n_docs == 0:
        raise ValueError(
            f"training needs both classes, got pos={p_docs} neg={n_docs}"
        )
    # feature-occurrence totals per class (two scalars; one tiny agg)
    ft = per_bucket.agg(
        F.sum("pos").alias("pt"), F.sum("neg").alias("nt")
    ).collect()[0]
    pt, nt = float(ft["pt"] or 0), float(ft["nt"] or 0)
    a, b = float(alpha), float(n_buckets)
    weights = per_bucket.select(
        "bucket",
        (
            F.log((F.col("pos") + a) / F.lit(pt + a * b))
            - F.log((F.col("neg") + a) / F.lit(nt + a * b))
        ).alias("weight"),
    )
    import math

    return {
        "weights": weights,
        "bias": math.log(p_docs / n_docs),
        "n_buckets": int(n_buckets),
        "seed": int(seed),
    }


def score_quality_model(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document: σ(bias + mean over its feature buckets of
    w(bucket)), unseen buckets contributing weight 0. Returns
    (id_col, n_features, quality_score∈(0,1) rounded to 4 — the same
    cross-engine FP convention as lm.score_perplexity). Docs whose
    text yields no grams (empty/NULL) score NULL."""
    rows = hashed_feature_rows(
        docs, text_col, id_col, model["n_buckets"], model["seed"]
    )
    joined = rows.join(F.broadcast(model["weights"]), "bucket", "left")
    per_doc = joined.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_features"),
        F.avg(F.coalesce(F.col("weight"), F.lit(0.0))).alias("__m"),
    )
    score = F.lit(1.0) / (
        F.lit(1.0) + F.exp(-(F.lit(float(model["bias"])) + F.col("__m")))
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("n_features"), F.lit(0)).alias("n_features"),
            F.round(score, 4).alias("quality_score"),
        )
    )


def quality_filter(
    docs: DataFrame,
    model: dict,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents scoring ≥ ``threshold`` (the DCLM-style top-slice
    keep). Unscorable (no-gram) docs are dropped — a doc the model
    cannot see is not evidence of quality."""
    scored = score_quality_model(docs, model, text_col, id_col)
    keep = scored.where(
        F.col("quality_score").isNotNull()
        & (F.col("quality_score") >= F.lit(float(threshold)))
    ).select(F.col(id_col).alias("__keep_id"))
    return docs.join(
        keep, F.col(id_col) == F.col("__keep_id"), "inner"
    ).drop("__keep_id")


def pr_curve(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "quality_score",
    n_bins: int = 100,
) -> DataFrame:
    """Threshold sweep for a scored binary classifier — the evaluation
    that picks ``quality_filter``'s threshold: for every NONEMPTY score
    bin edge t, the confusion counts and precision/recall of the rule
    ``score >= t``. Returns (threshold, tp, fp, fn, precision, recall)
    ordered by threshold descending.

    Scale design: one map-combined groupBy collapses the corpus to at
    most ``n_bins + 1`` rows (scores bucket to floor(score·n_bins),
    clamped so score = 1.0 lands in the top bin); the cumulative sums
    then run as a window over THAT bounded table — a single-partition
    window over <= n_bins+1 rows, never over the corpus. NULL scores
    (unscorable docs) and NULL labels are excluded: neither can be
    thresholded or counted."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    from pyspark.sql import Window

    s, lab = F.col(score_col), F.col(label_col).cast("double")
    rows = scored.where(s.isNotNull() & lab.isNotNull())
    b = F.least(
        F.floor(s * F.lit(float(n_bins))).cast("int"), F.lit(n_bins)
    )
    per_bin = rows.groupBy(b.alias("__b")).agg(
        F.sum(lab).cast("bigint").alias("__pos"),
        F.count(F.lit(1)).alias("__n"),
    )
    # windows over the <= n_bins+1 aggregated rows only
    cum = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    allw = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tp = F.sum("__pos").over(cum)
    pred = F.sum("__n").over(cum)
    total_pos = F.sum("__pos").over(allw)
    return per_bin.select(
        F.round(F.col("__b") / F.lit(float(n_bins)), 6).alias("threshold"),
        tp.alias("tp"),
        (pred - tp).alias("fp"),
        (total_pos - tp).alias("fn"),
        F.round(tp / pred, 6).alias("precision"),
        F.when(total_pos > 0, F.round(tp / total_pos, 6)).alias("recall"),
    ).orderBy(F.col("threshold").desc())
