"""Ranked-retrieval eval (datapipe/ireval.py), corpus drift
(dsir.corpus_divergence), and tf-idf keywords (text.tfidf_keywords) —
the round-11 pillar additions, hand-checked on tiny inputs."""

from __future__ import annotations

import math

import pytest

# r12 fast-tier split: this module is SLOW-tier (long fuzz loops /
# integration matrices); run `-m ""` for the full suite.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.ireval import (
    retrieval_metrics,
    retrieval_summary,
)


def _fixture(spark):
    # q1: golds {a, b, z}; retrieved a@1, x@2, b@3 -> n_rel 2, first 1
    # q2: gold {m}; retrieved y@1, n@2 -> n_rel 0
    # q3: gold {p}; NO results at all -> all-zero row
    results = spark.createDataFrame(
        [(1, "a", 1), (1, "x", 2), (1, "b", 3), (2, "y", 1), (2, "n", 2)],
        "query_id bigint, vec_id string, rank int",
    )
    gold = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "z"), (2, "m"), (3, "p"), (3, "p")],
        "query_id bigint, vec_id string",
    )
    return results, gold


def test_retrieval_metrics_hand_checked(spark):
    results, gold = _fixture(spark)
    rows = {
        r["query_id"]: r
        for r in retrieval_metrics(results, gold, k=5).collect()
    }
    assert set(rows) == {1, 2, 3}

    r1 = rows[1]
    assert (r1["n_gold"], r1["n_rel"]) == (3, 2)
    assert r1["recall"] == round(2 / 3, 6)
    assert r1["precision"] == round(2 / 5, 6)
    assert r1["rr"] == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    assert r1["ndcg"] == round(dcg / idcg, 6)

    r2 = rows[2]
    assert (r2["n_rel"], r2["recall"], r2["rr"], r2["ndcg"]) == (0, 0.0, 0.0, 0.0)

    # gold dedup: query 3's duplicated pair counts once; zero results
    r3 = rows[3]
    assert (r3["n_gold"], r3["n_rel"], r3["recall"], r3["precision"],
            r3["rr"], r3["ndcg"]) == (1, 0, 0.0, 0.0, 0.0, 0.0)


def test_retrieval_metrics_k_cut_and_validation(spark):
    results, gold = _fixture(spark)
    # k=2 drops q1's b@3: n_rel 1, precision 1/2, idcg over min(2,3)=2
    r1 = {
        r["query_id"]: r for r in retrieval_metrics(results, gold, k=2).collect()
    }[1]
    assert (r1["n_rel"], r1["precision"]) == (1, 0.5)
    idcg2 = sum(1 / math.log2(i + 1) for i in (1, 2))
    assert r1["ndcg"] == round((1 / math.log2(2)) / idcg2, 6)

    with pytest.raises(ValueError, match="k must be positive"):
        retrieval_metrics(results, gold, k=0)


def test_retrieval_summary_means(spark):
    results, gold = _fixture(spark)
    per_q = retrieval_metrics(results, gold, k=5)
    s = retrieval_summary(per_q).collect()[0]
    rows = {r["query_id"]: r for r in per_q.collect()}
    assert s["n_queries"] == 3
    assert s["mrr"] == round(sum(rows[q]["rr"] for q in rows) / 3, 6)
    assert s["recall"] == round(sum(rows[q]["recall"] for q in rows) / 3, 6)


def test_corpus_divergence_properties(spark):
    from flink_table_store_spark.datapipe.dsir import corpus_divergence

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma " * (i % 3 + 1)) for i in range(20)]
        + [(100 + i, "delta epsilon zeta " * 2) for i in range(10)],
        "doc_id bigint, text string",
    )
    a = docs.where(F.col("doc_id") < 100)
    b = docs.where(F.col("doc_id") >= 100)
    row = corpus_divergence(a, b, n_buckets=512).collect()[0]
    # disjoint vocabularies -> clearly positive divergence
    assert row["kl_ab"] > 0 and row["kl_ba"] > 0
    # base-2 JS is bounded in [0, 1]
    assert 0 < row["js"] <= 1
    # identical corpora -> exactly 0 everywhere
    same = corpus_divergence(a, a, n_buckets=512).collect()[0]
    assert (same["kl_ab"], same["kl_ba"], same["js"]) == (0.0, 0.0, 0.0)
    # JS is symmetric (same addends, possibly reordered -> round 6)
    rev = corpus_divergence(b, a, n_buckets=512).collect()[0]
    assert abs(rev["js"] - row["js"]) <= 1e-6
    assert rev["kl_ab"] == row["kl_ba"]

    with pytest.raises(ValueError, match="alpha"):
        corpus_divergence(a, b, alpha=0.0)


def test_tfidf_keywords_hand_checked(spark):
    from flink_table_store_spark.datapipe.text import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple banana cherry durian"),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_keywords(docs, top_n=2).collect()
    rows = {(r["doc_id"], r["rank"]): r for r in out}
    # doc 1: apple tf=2 df=2, banana tf=1 df=3
    n = 3
    idf = lambda df: math.log((1.0 + n) / (1.0 + df)) + 1.0
    assert rows[(1, 1)]["term"] == "apple"
    assert rows[(1, 1)]["tfidf"] == round(2 * idf(2), 6)
    assert rows[(1, 2)]["term"] == "banana"
    # doc 2: cherry (df=2) outranks banana (df=3) at equal tf
    assert rows[(2, 1)]["term"] == "cherry"
    # doc 3: all tf=1 -> durian (df=1) wins, then apple/cherry (df=2)
    # tie broken lexicographically
    assert rows[(3, 1)]["term"] == "durian"
    assert rows[(3, 2)]["term"] == "apple"

    # min_df drops durian entirely
    out2 = tfidf_keywords(docs, top_n=2, min_df=2).collect()
    assert "durian" not in {r["term"] for r in out2}

    with pytest.raises(ValueError, match="top_n"):
        tfidf_keywords(docs, top_n=0)


def test_keyness_terms_hand_checked(spark):
    import math

    from flink_table_store_spark.datapipe.text import keyness_terms

    a = spark.createDataFrame(
        [(1, "x x x y"), (2, "x z")], "doc_id bigint, text string"
    )
    b = spark.createDataFrame(
        [(3, "y y y z"), (4, "z w")], "doc_id bigint, text string"
    )
    out = keyness_terms(a, b, top_n=10).collect()
    rows = {r["term"]: r for r in out}
    # counts: a = {x:4, y:1, z:1}, b = {y:3, z:2, w:1}; V=4, Ta=6, Tb=6
    lo = lambda ca, cb: round(
        math.log((ca + 1) / (6 + 4)) - math.log((cb + 1) / (6 + 4)), 6
    )
    assert rows["x"]["log_odds"] == lo(4, 0)
    assert rows["w"]["log_odds"] == lo(0, 1)
    assert (rows["x"]["count_a"], rows["x"]["count_b"]) == (4, 0)
    # x has the largest |log_odds| -> first
    assert out[0]["term"] == "x"
    # swap symmetry: sign flips, magnitude identical
    swapped = {
        r["term"]: r for r in keyness_terms(b, a, top_n=10).collect()
    }
    for t in rows:
        assert swapped[t]["log_odds"] == -rows[t]["log_odds"]

    # min_count drops terms rare on BOTH sides
    filtered = {
        r["term"] for r in keyness_terms(a, b, top_n=10, min_count=3).collect()
    }
    assert filtered == {"x", "y"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="top_n"):
        keyness_terms(a, b, top_n=0)
    with _pytest.raises(ValueError, match="alpha"):
        keyness_terms(a, b, alpha=-1.0)


def test_retrieval_metrics_randomized_parity(spark):
    """120-query randomized parity against a sequential pure-Python
    reference implementation (the same style of evidence as the as-of
    join's merge_asof parity test)."""
    import random

    rng = random.Random(11)
    k = 4
    res_rows, gold_rows = [], []
    expect = {}
    for q in range(120):
        n_res = rng.randint(0, 8)
        ids = rng.sample(range(30), n_res)
        for rank, i in enumerate(ids, start=1):
            res_rows.append((q, i, rank))
        n_gold = rng.randint(1, 5)
        golds = set(rng.sample(range(30), n_gold))
        for gid in golds:
            gold_rows.append((q, gid))
        # sequential reference
        topk = ids[:k]
        rel = [r for r, i in enumerate(topk, start=1) if i in golds]
        dcg = sum(1 / math.log2(r + 1) for r in rel)
        idcg = sum(1 / math.log2(i + 1) for i in range(1, min(k, n_gold) + 1))
        expect[q] = (
            n_gold,
            len(rel),
            round(len(rel) / n_gold, 6),
            round(len(rel) / k, 6),
            round(1 / rel[0], 6) if rel else 0.0,
            round(dcg / idcg, 6),
        )
    results = spark.createDataFrame(
        res_rows, "query_id int, vec_id int, rank int"
    )
    gold = spark.createDataFrame(gold_rows, "query_id int, vec_id int")
    got = {
        r["query_id"]: (
            r["n_gold"], r["n_rel"], r["recall"], r["precision"],
            r["rr"], r["ndcg"],
        )
        for r in retrieval_metrics(results, gold, k=k).collect()
    }
    assert got == expect


def test_divergence_from_index_matches_batch_path(spark, warehouse):
    """Index-backed drift == two-corpora drift, with the reference
    folded in as two identifier-checked batches (replay = no-op)."""
    from flink_table_store_spark.datapipe.dsir import (
        corpus_divergence,
        create_dsir_index,
        divergence_from_index,
        update_dsir_index,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} common word line {i % 3}") for i in range(40)],
        "doc_id bigint, text string",
    )
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    idx = create_dsir_index(warehouse, "db.drift_idx", n_buckets=256, seed=13)
    update_dsir_index(
        idx, a.where(F.col("doc_id") % 4 == 0), "raw", commit_identifier="r0"
    )
    update_dsir_index(
        idx, a.where(F.col("doc_id") % 4 == 2), "raw", commit_identifier="r1"
    )
    # replayed identifier must not double-count
    update_dsir_index(
        idx, a.where(F.col("doc_id") % 4 == 0), "raw", commit_identifier="r0"
    )
    got = divergence_from_index(spark, idx, b).collect()[0]
    want = corpus_divergence(a, b, n_buckets=256).collect()[0]
    assert got.asDict() == want.asDict()

    import pytest as _pytest

    with _pytest.raises(ValueError, match="side"):
        divergence_from_index(spark, idx, b, side="nope")


def test_lsh_multiprobe_monotone_recall(spark):
    """Multi-probe candidates are supersets as nprobe grows (the base
    bucket plus more flips), so recall vs the exact top-k is weakly
    monotone; nprobe=1 must equal the classic single-bucket path."""
    import pytest as _pytest

    from flink_table_store_spark.datapipe.similarity import (
        brute_force_topk,
        lsh_topk,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    q = emb.where(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb, q, k=3).collect()
    }
    last = -1.0
    for nprobe in (1, 3, 6, 9):
        got = {
            (r["query_id"], r["vec_id"])
            for r in lsh_topk(emb, q, k=3, bits=8, nprobe=nprobe).collect()
        }
        rec = len(got & exact) / len(exact)
        assert rec >= last, f"recall fell at nprobe={nprobe}"
        last = rec

    with _pytest.raises(ValueError, match="nprobe"):
        lsh_topk(emb, q, k=3, bits=8, nprobe=10)


def test_dedup_pair_metrics_hand_checked(spark):
    from flink_table_store_spark.datapipe.ireval import dedup_pair_metrics

    # pred normalizes (3,1)->(1,3); dup (1,2) counts once
    pred = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1), (4, 5)], "id_a bigint, id_b bigint"
    )
    gold = spark.createDataFrame(
        [(1, 2), (1, 3), (6, 7)], "id_a bigint, id_b bigint"
    )
    r = dedup_pair_metrics(pred, gold).collect()[0]
    # pred = {(1,2),(1,3),(4,5)}, gold = {(1,2),(1,3),(6,7)}, tp = 2
    assert (r["n_pred"], r["n_gold"], r["tp"]) == (3, 3, 2)
    assert r["precision"] == round(2 / 3, 6)
    assert r["recall"] == round(2 / 3, 6)
    assert r["f1"] == round(2 / 3, 6)

    empty = pred.where(F.lit(False))
    z = dedup_pair_metrics(empty, gold).collect()[0]
    assert (z["tp"], z["precision"], z["recall"], z["f1"]) == (0, 0.0, 0.0, 0.0)


def _mmr_reference(rows, k, lam):
    """Sequential pure-Python MMR over one query's candidates."""
    import numpy as np

    rows = sorted(rows, key=lambda r: (-r[1], r[0]))  # rel desc, id asc
    vecs = [np.asarray(r[2], dtype=np.float64) for r in rows]

    def cos(u, v):
        d = np.linalg.norm(u) * np.linalg.norm(v)
        return float(u @ v / d) if d > 0 else 0.0

    picked, out = [], []
    while len(picked) < min(k, len(rows)):
        best, best_mmr = None, None
        for i in range(len(rows)):
            if i in picked:
                continue
            pen = max((cos(vecs[i], vecs[j]) for j in picked), default=0.0)
            m = lam * rows[i][1] - (1 - lam) * pen
            if best is None or m > best_mmr:
                best, best_mmr = i, m
        picked.append(best)
        out.append((rows[best][0], round(best_mmr, 6), len(picked)))
    return out


def test_mmr_rerank_parity_and_properties(spark):
    import random

    from flink_table_store_spark.datapipe.ireval import mmr_rerank

    rng = random.Random(7)
    rows, expect = [], {}
    for q in range(25):
        cands = []
        for i in range(rng.randint(1, 12)):
            vec = [rng.uniform(-1, 1) for _ in range(6)]
            rel = round(rng.uniform(0, 1), 3)
            qv = [1.0] * 6
            rows.append((q, i, rel, vec, qv))
            cands.append((i, rel, vec))
        expect[q] = _mmr_reference(cands, k=4, lam=0.7)
    df = spark.createDataFrame(
        rows,
        "query_id int, vec_id int, cosine double, "
        "embedding array<double>, query_vec array<double>",
    )
    got = {}
    for r in mmr_rerank(df, k=4, lambda_=0.7).collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["mmr"], r["rank"])
        )
    for q in got:
        got[q].sort(key=lambda t: t[2])
    assert got == expect

    # lambda = 1 -> pure relevance order
    pure = mmr_rerank(df.where(F.col("query_id") == 0), k=4, lambda_=1.0)
    ranks = [r["vec_id"] for r in pure.orderBy("rank").collect()]
    rel_order = [
        t[0]
        for t in sorted(
            [(i, rel) for (qq, i, rel, _v, _qv) in rows if qq == 0],
            key=lambda t: (-t[1], t[0]),
        )[:4]
    ]
    assert ranks == rel_order

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lambda_"):
        mmr_rerank(df, k=4, lambda_=1.5)
    with _pytest.raises(ValueError, match="k must be positive"):
        mmr_rerank(df, k=0)
