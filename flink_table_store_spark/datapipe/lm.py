"""Corpus n-gram language-model scoring (CCNet-style perplexity filter).

Web-corpus curation ranks documents by how "language-like" they are
under a cheap LM (CCNet buckets by KenLM perplexity; DCLM and friends
keep the idea). Without external model files, the portable equivalent
is a bigram model TRAINED ON THE CORPUS ITSELF (or a reference slice of
it) with add-α smoothing:

    P(w2 | w1) = (c(w1 w2) + α) / (c(w1) + α·V)

and per-document perplexity 2^(-mean log2 P) over its bigrams. Outlier
docs (boilerplate soup, wrong language, OCR noise) sit far from the
corpus distribution and score high.

Scale design: pure built-ins end to end. Counting is one explode +
two map-combined groupBys (bigram and unigram); scoring joins each
document's bigrams against the count tables — shuffles keyed on the
bigram/unigram strings, both near-linear. The model "object" is two
DataFrames, so it scales past any driver memory; for a fixed reference
model at 100 TB, train on a sample and the count tables broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(col: Column) -> Column:
    return F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")


def _bigram_rows(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(doc id, w1, w2) — one row per bigram occurrence; docs with
    fewer than 2 tokens contribute nothing."""
    toks = _tokens(F.col(text_col))
    pairs = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = F.slice(pairs, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    return df.select(
        F.col(id_col).alias("__id"), F.explode(pairs).alias("__p")
    ).select("__id", F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))


def train_bigram_lm(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict:
    """Count tables of an add-α-ready bigram LM: returns
    ``{"bigrams": (w1, w2, c2), "unigrams": (w1, c1), "vocab": V}``."""
    rows = _bigram_rows(corpus, text_col, id_col)
    bigrams = rows.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    unigrams = rows.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        rows.select(F.col("w1").alias("w")).unionByName(
            rows.select(F.col("w2").alias("w"))
        ).distinct().count()
    )
    return {"bigrams": bigrams, "unigrams": unigrams, "vocab": vocab}


def score_perplexity(
    docs: DataFrame,
    model: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document bigram perplexity under ``model`` (default: the
    scored corpus itself — the self-scoring curation setup). Returns
    (id_col, n_bigrams, perplexity); docs with <2 tokens get NULL
    perplexity (no evidence either way — let the caller decide).

    Every probability is computed in one join pipeline: doc bigrams ⋈
    bigram counts (left — unseen bigrams get c2=0) ⋈ unigram counts
    (left — unseen contexts get c1=0, degrading to the uniform prior
    α/(αV) as smoothing dictates)."""
    model = model or train_bigram_lm(docs, text_col, id_col)
    v = float(model["vocab"])
    rows = _bigram_rows(docs, text_col, id_col)
    joined = (
        rows.join(model["bigrams"], ["w1", "w2"], "left")
        .join(model["unigrams"], ["w1"], "left")
        .select(
            "__id",
            (
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha * v))
            ).alias("__p"),
        )
    )
    per_doc = joined.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg(-F.log2("__p")).alias("__nll"),
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round(F.pow(F.lit(2.0), F.col("__nll")), 4).alias("perplexity"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    model: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    by_col: str = "lang",
    n_buckets: int = 3,
    labels: tuple = ("head", "middle", "tail"),
    thresholds: dict | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020 §4): rank each
    document's LM perplexity WITHIN its language and split into
    ``n_buckets`` equal-frequency groups — head (most language-like),
    middle, tail. Returns (id_col, by_col, n_bigrams, perplexity,
    ppl_bucket); docs with NULL perplexity (<2 tokens) get NULL bucket.

    Two modes, mirroring how CCNet ships:

    - exact (default, ``thresholds=None``): per-language ``ntile`` —
      deterministic equal-frequency split, replicable in ANSI SQL for
      the oracle. The window is KEYED by language, so each group is one
      range; fine while no single language dominates the corpus.
    - thresholds (``{lang: [t1, .., t_{n-1}]}``, ascending): assignment
      is a pure broadcast comparison — ZERO windows, zero shuffle
      beyond scoring — the production path at 100 TB, with thresholds
      fit once on a bounded sample via this same function's exact mode.
      A language missing from the dict gets NULL bucket (unknown
      distribution is not evidence); perplexity <= t_i falls in bucket
      i (ties go to the better bucket, matching ntile's low-rank-first
      fill)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if len(labels) != n_buckets:
        raise ValueError(
            f"labels must have n_buckets={n_buckets} entries, got {labels}"
        )
    scored = score_perplexity(docs, model, text_col, id_col, alpha)
    out = docs.select(id_col, by_col).join(scored, id_col)
    if thresholds is not None:
        bad = {k: v for k, v in thresholds.items() if len(v) != n_buckets - 1}
        if bad:
            raise ValueError(
                f"each thresholds entry needs {n_buckets - 1} cut points, "
                f"got {bad}"
            )
        thr = F.create_map(
            *[
                c
                for lang, cuts in sorted(thresholds.items())
                for c in (
                    F.lit(lang),
                    F.array(*[F.lit(float(t)) for t in cuts]),
                )
            ]
        )
        cuts = thr[F.col(by_col)]
        # bucket index = number of cut points strictly below perplexity
        idx = F.aggregate(
            cuts,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.col("perplexity") > t, F.lit(1)).otherwise(F.lit(0)),
        )
        bucket = F.when(
            F.col("perplexity").isNotNull() & cuts.isNotNull(),
            F.element_at(F.array(*[F.lit(x) for x in labels]), idx + 1),
        )
        return out.withColumn("ppl_bucket", bucket)
    from pyspark.sql import Window

    w = Window.partitionBy(by_col).orderBy(
        F.col("perplexity").asc(), F.col(id_col).asc()
    )
    scored_only = out.where(F.col("perplexity").isNotNull())
    tiled = scored_only.withColumn(
        "ppl_bucket",
        F.element_at(
            F.array(*[F.lit(x) for x in labels]),
            F.ntile(n_buckets).over(w),
        ),
    )
    nulls = out.where(F.col("perplexity").isNull()).withColumn(
        "ppl_bucket", F.lit(None).cast("string")
    )
    return tiled.unionByName(nulls)


def fit_perplexity_thresholds(
    docs: DataFrame,
    model: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    by_col: str = "lang",
    n_buckets: int = 3,
    alpha: float = 0.5,
) -> dict:
    """Per-language bucket cut points from a (sample of a) corpus: the
    MAX perplexity inside each of the first n-1 ntile buckets — feed
    the result to ``perplexity_buckets(thresholds=...)`` so full-corpus
    assignment runs as a pure broadcast comparison. Fit on a bounded
    sample (CCNet fit on held-out Wikipedia); the ntile here then costs
    O(sample), never O(corpus)."""
    tiled = perplexity_buckets(
        docs, model, text_col, id_col, by_col, n_buckets,
        labels=tuple(str(i) for i in range(n_buckets)), alpha=alpha,
    ).where(F.col("ppl_bucket").isNotNull())
    rows = (
        tiled.groupBy(by_col, "ppl_bucket")
        .agg(F.max("perplexity").alias("m"))
        .collect()
    )
    out: dict = {}
    for r in rows:
        out.setdefault(r[by_col], {})[int(r["ppl_bucket"])] = float(r["m"])
    # NULL domains and languages with fewer scored docs than buckets
    # are EXCLUDED (they cannot carry a full cut-point set); thresholds
    # mode assigns them NULL bucket, its documented missing-language
    # contract — returning a short list would crash the consumer, and
    # a None key would break its sorted() broadcast map
    return {
        lang: [cuts[i] for i in range(n_buckets - 1)]
        for lang, cuts in out.items()
        if lang is not None
        and all(i in cuts for i in range(n_buckets - 1))
    }
