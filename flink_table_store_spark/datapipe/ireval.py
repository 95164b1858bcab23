"""Ranked-retrieval evaluation: recall@k, precision@k, MRR, nDCG@k.

The eval half of the similarity/ANN pillar (datapipe/similarity.py,
globalindex.py): given a ranked result table (what ``*_topk`` /
``vector_search`` emit) and a gold relevance table, score each query
with the standard IR metrics (Manning et al., *Introduction to
Information Retrieval*, ch. 8 — all public). Complements
``quality_model.pr_curve`` (threshold sweep for classifiers) with the
ranked-list metrics retriever training loops actually monitor when
picking index parameters (nprobe, bits, rerank) or mining depth.

Scale design: relevance marking is ONE equi-join of the result table
against the gold pairs on (query, id) — gold is label data, small by
construction, so it broadcasts; the per-query metrics are one
map-combined groupBy on the query key; the corpus-level summary
collapses the per-query frame to a single row. Nothing is ever
per-(query x corpus); the expensive part already happened in the
retrieval run being evaluated. IDCG is a closed-form fold over
``sequence(1, min(k, n_gold))`` — JVM-side, no join against an ideal
ranking.

Reference anchor: the reference engine ships the vector-search surface
(paimon-core table/VectorSearchTable.java, paimon-faiss) but no eval
operator; this extends the repo's training-data pillar the same way
pr_curve / quality_model do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retrieval_metrics(
    results: DataFrame,
    gold: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query IR metrics for a ranked result table cut at ``k``.

    ``results``: (query_id_col, id_col, rank_col) — ranks dense from 1
    per query, as every top-k operator in this repo emits. ``gold``:
    (query_id_col, id_col) relevance pairs (duplicates are deduped).
    Every query present in GOLD gets a row — a query the retriever
    returned nothing for scores 0 across the board, which is exactly
    the signal an index regression produces (dropping such queries
    would silently inflate every mean).

    Returns (query_id, n_gold, n_rel, recall, precision, rr, ndcg):
      recall    = |relevant in top-k| / |gold|
      precision = |relevant in top-k| / k      (standard P@k: misses
                  below k count against it even if fewer rows returned)
      rr        = 1 / rank of the first relevant hit, else 0 (MRR term)
      ndcg      = DCG@k / IDCG@k with binary gains 1/log2(rank+1)
    All rounded to 6 for cross-engine comparison."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    g = gold.select(
        F.col(query_id_col).alias("__qid"), F.col(id_col).alias("__gid")
    ).distinct()
    r = results.select(
        F.col(query_id_col).alias("__qid"),
        F.col(id_col).alias("__rid"),
        F.col(rank_col).alias("__rank"),
    ).where(F.col(rank_col) <= k)
    # relevance mark: gold is label data — broadcast equi-join
    rel = r.join(
        F.broadcast(g),
        (r["__qid"] == g["__qid"]) & (r["__rid"] == g["__gid"]),
        "left_semi",
    )
    per_q = rel.groupBy("__qid").agg(
        F.count(F.lit(1)).alias("__n_rel"),
        F.min("__rank").alias("__first"),
        F.sum(
            F.lit(1.0) / F.log2(F.col("__rank").cast("double") + F.lit(1.0))
        ).alias("__dcg"),
    )
    n_gold = g.groupBy("__qid").agg(F.count(F.lit(1)).alias("__n_gold"))
    # IDCG@k: best possible DCG places all min(k, n_gold) golds first —
    # a closed-form fold, no ideal-ranking join
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(k), F.col("__n_gold"))),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
    )
    joined = n_gold.join(per_q, "__qid", "left")
    n_rel = F.coalesce(F.col("__n_rel"), F.lit(0))
    dcg = F.coalesce(F.col("__dcg"), F.lit(0.0))
    return joined.select(
        F.col("__qid").alias(query_id_col),
        F.col("__n_gold").alias("n_gold"),
        n_rel.cast("bigint").alias("n_rel"),
        F.round(n_rel / F.col("__n_gold"), 6).alias("recall"),
        F.round(n_rel / F.lit(float(k)), 6).alias("precision"),
        F.round(
            F.when(
                F.col("__first").isNotNull(), F.lit(1.0) / F.col("__first")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rr"),
        F.round(dcg / idcg, 6).alias("ndcg"),
    )


def retrieval_summary(per_query: DataFrame) -> DataFrame:
    """Corpus-level means of ``retrieval_metrics`` output — ONE row:
    (n_queries, recall, precision, mrr, ndcg). Means are over every
    gold query (zero-result queries already score 0 upstream)."""
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
    )


def dedup_pair_metrics(
    predicted: DataFrame,
    gold: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Pair-level precision/recall/F1 of a candidate-pair predictor
    against gold duplicate pairs — the eval that tunes a dedup stage's
    blocking parameters (MinHash bands, SimHash radius, embedding
    block_bits): how many true pairs does the cheaper blocking lose,
    and how much junk does it admit. Pairs are normalized to
    (min, max) and deduped on both sides, so orientation and repeats
    can't skew the counts.

    Scale design: two distinct-pair normalizations (keyed groupBys),
    ONE pair-keyed equi-join for the intersection, three 1-row counts
    — never materializes anything beyond the pair sets themselves.

    Returns one row: (n_pred, n_gold, tp, precision, recall, f1)
    rounded to 6."""

    def _norm(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(id_a), F.col(id_b)).alias("__a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("__b"),
        ).distinct()

    p, g = _norm(predicted), _norm(gold)
    tp = p.join(g, ["__a", "__b"], "left_semi").count()
    n_pred, n_gold = p.count(), g.count()
    prec = tp / n_pred if n_pred else 0.0
    rec = tp / n_gold if n_gold else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
    return predicted.sparkSession.createDataFrame(
        [
            (
                n_pred,
                n_gold,
                tp,
                round(prec, 6),
                round(rec, 6),
                round(f1, 6),
            )
        ],
        "n_pred bigint, n_gold bigint, tp bigint, "
        "precision double, recall double, f1 double",
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lambda_: float = 0.7,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    score_col: str = "cosine",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998,
    public): greedily pick ``k`` of each query's candidates maximizing
    ``λ·relevance − (1−λ)·max cosine to the already-picked set`` — the
    standard diversity pass over a retrieval stage's output (dedup'd
    result lists, diverse hard negatives, RAG context selection).

    ``candidates``: one row per (query, candidate) with the relevance
    score and the CANDIDATE vector — exactly what the ``*_topk``
    operators produce once joined back to vectors (the query vector is
    not needed: relevance is already scored, diversity only compares
    candidates to each other).
    Ties break to the smaller candidate id; NULL scores are dropped
    (an unscorable candidate cannot be ranked).

    Scale design: the greedy loop is inherently sequential PER QUERY
    but queries are independent, so this is one ``applyInPandas`` over
    the query key — each group is a top-k' candidate list (tens to
    hundreds of rows), vectorized numpy inside the Arrow batch, never
    corpus-sized. The expensive part (retrieval) already happened
    upstream; this pass moves k'·k dot products per query.

    Returns (query_id, id, relevance, mmr rounded 6, rank)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
    qt = candidates.schema[query_id_col].dataType.simpleString()
    it = candidates.schema[id_col].dataType.simpleString()
    lam = float(lambda_)
    sel = candidates.where(F.col(score_col).isNotNull()).select(
        F.col(query_id_col).alias("__qid"),
        F.col(id_col).alias("__cid"),
        F.col(score_col).cast("double").alias("__rel"),
        F.col(vec_col).alias("__cv"),
    )

    def _mmr(pdf):
        import numpy as np
        import pandas as pd

        # deterministic candidate order: relevance desc, id asc
        pdf = pdf.sort_values(
            ["__rel", "__cid"], ascending=[False, True]
        ).reset_index(drop=True)
        vecs = np.asarray(list(pdf["__cv"]), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        rel = pdf["__rel"].to_numpy()
        n = len(pdf)
        picked: list[int] = []
        # max cosine of each candidate to the picked set, updated
        # incrementally — O(k·n·d), vectorized
        max_sim = np.full(n, -np.inf)
        out_mmr = []
        for _ in range(min(k, n)):
            mmr = lam * rel - (1.0 - lam) * np.where(
                np.isinf(max_sim), 0.0, max_sim
            )
            if picked:
                mmr[picked] = -np.inf
            best = int(mmr.argmax())  # first max = best (rel desc, id asc)
            picked.append(best)
            out_mmr.append(mmr[best])
            denom = norms * norms[best]
            with np.errstate(divide="ignore", invalid="ignore"):
                sim = np.where(denom > 0, vecs @ vecs[best] / denom, 0.0)
            max_sim = np.maximum(max_sim, sim)
        return pd.DataFrame(
            {
                "__qid": pdf["__qid"].iloc[picked].to_numpy(),
                "__cid": pdf["__cid"].iloc[picked].to_numpy(),
                "__rel": rel[picked],
                "mmr": np.round(out_mmr, 6),
                "rank": np.arange(1, len(picked) + 1, dtype=np.int32),
            }
        )

    out = sel.groupBy("__qid").applyInPandas(
        _mmr,
        f"__qid {qt}, __cid {it}, __rel double, mmr double, rank int",
    )
    return out.select(
        F.col("__qid").alias(query_id_col),
        F.col("__cid").alias(id_col),
        F.col("__rel").alias(score_col),
        "mmr",
        "rank",
    )
