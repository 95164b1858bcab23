"""DSIR importance resampling (datapipe/dsir.py): closed-form weight
verification against a hand-replicated hashed-ngram model, Gumbel
top-k selection behavior, and the exact_top_k primitive."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.dsir import (
    dsir_resample,
    exact_top_k,
    fit_dsir,
    score_dsir,
)


def _bucket(gram: str, seed: int, n_buckets: int) -> int:
    return int(hashlib.md5(f"{gram}-{seed}".encode()).hexdigest()[:15], 16) % n_buckets


def _grams(text: str) -> list[str]:
    toks = text.lower().strip().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def test_dsir_weights_closed_form(spark):
    """Spark weights match a from-scratch python replica of the fitted
    smoothed multinomial log-ratio on a tiny corpus."""
    target_rows = [(0, "spark engine"), (1, "spark shuffle engine")]
    raw_rows = [
        (10, "spark engine"),
        (11, "cats and dogs"),
        (12, "dogs dogs dogs"),
        (13, "engine of cats"),
    ]
    B, seed, alpha = 4096, 13, 1.0
    target = spark.createDataFrame(target_rows, "doc_id bigint, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id bigint, text string")
    m = fit_dsir(target, raw, n_buckets=B, seed=seed, alpha=alpha)
    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_logratio"])
        for r in score_dsir(raw, m).collect()
    }

    tcnt, rcnt = {}, {}
    for _, t in target_rows:
        for g in _grams(t):
            b = _bucket(g, seed, B)
            tcnt[b] = tcnt.get(b, 0) + 1
    for _, t in raw_rows:
        for g in _grams(t):
            b = _bucket(g, seed, B)
            rcnt[b] = rcnt.get(b, 0) + 1
    tt, tr = sum(tcnt.values()), sum(rcnt.values())

    def lr(b):
        return math.log((tcnt.get(b, 0) + alpha) / (tt + alpha * B)) - math.log(
            (rcnt.get(b, 0) + alpha) / (tr + alpha * B)
        )

    for doc_id, t in raw_rows:
        grams = _grams(t)
        want = round(sum(lr(_bucket(g, seed, B)) for g in grams), 4)
        assert got[doc_id] == (len(grams), pytest.approx(want, abs=1e-4))
    # target-like docs outweigh off-domain ones
    assert got[10][1] > got[11][1] and got[10][1] > got[12][1]


def test_dsir_null_and_empty_text(spark):
    target = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    raw = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, ""), (4, "   ")],
        "doc_id bigint, text string",
    )
    m = fit_dsir(target, raw)
    out = {r["doc_id"]: r for r in score_dsir(raw, m).collect()}
    for i in (2, 3, 4):
        assert out[i]["n_grams"] == 0 and out[i]["dsir_logratio"] is None
    assert out[1]["dsir_logratio"] is not None
    # unscorable docs are excluded from resampling, not selected as NULLs
    sel = dsir_resample(raw, m, 10)
    assert sorted(r["doc_id"] for r in sel.collect()) == [1]


def test_dsir_fit_validation(spark):
    empty = spark.createDataFrame([(0, None)], "doc_id bigint, text string")
    ok = spark.createDataFrame([(0, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="at least one gram"):
        fit_dsir(empty, ok)
    with pytest.raises(ValueError, match="alpha"):
        fit_dsir(ok, ok, alpha=0)
    m = fit_dsir(ok, ok)
    with pytest.raises(ValueError, match="temperature"):
        dsir_resample(ok, m, 1, temperature=0)


@pytest.mark.slow
def test_dsir_resample_deterministic_and_biased(spark):
    """Same seed -> identical selection; selection is biased toward the
    target domain; low temperature sharpens toward pure top-k."""
    rows = [(i, "alpha beta gamma " * 5) for i in range(50)] + [
        (i, "zig zag zug " * 5) for i in range(50, 100)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    target = spark.createDataFrame(
        [(0, "alpha beta gamma alpha beta")], "doc_id bigint, text string"
    )
    m = fit_dsir(target, docs, n_buckets=4096)
    s1 = sorted(r["doc_id"] for r in dsir_resample(docs, m, 20, seed=5).collect())
    s2 = sorted(r["doc_id"] for r in dsir_resample(docs, m, 20, seed=5).collect())
    assert s1 == s2 and len(s1) == 20
    # the two domains separate sharply, so even with Gumbel noise the
    # selection should be (almost) all alpha-domain docs
    assert sum(1 for i in s1 if i < 50) >= 18
    # near-zero temperature = deterministic top-k by weight: all 20
    # from the alpha half (ties within the half broken by noise)
    cold = sorted(
        r["doc_id"]
        for r in dsir_resample(docs, m, 20, temperature=1e-6, seed=5).collect()
    )
    assert all(i < 50 for i in cold)
    # different seed should move at least something at T=1 on the
    # boundary... (both halves internally identical, so compare the
    # actual Gumbel ordering via a different seed on a mixed corpus)
    s3 = sorted(r["doc_id"] for r in dsir_resample(docs, m, 20, seed=6).collect())
    assert s3 != s1


@pytest.mark.slow
def test_exact_top_k_parity_and_edges(spark):
    import random

    rows = [(i, random.Random(i).random()) for i in range(3000)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    for k in (1, 17, 100, 2999, 3000):
        got = sorted(r["id"] for r in exact_top_k(df, "v", k, tie_col="id").collect())
        want = sorted(
            r["id"] for r in df.orderBy(F.desc("v"), "id").limit(k).collect()
        )
        assert got == want, k
    # ascending
    got = sorted(
        r["id"]
        for r in exact_top_k(df, "v", 25, tie_col="id", descending=False).collect()
    )
    want = sorted(r["id"] for r in df.orderBy("v", "id").limit(25).collect())
    assert got == want
    # heavy ties: deterministic boundary via tie_col
    df2 = spark.createDataFrame([(i, i % 2) for i in range(100)], "id bigint, v int")
    got = sorted(r["id"] for r in exact_top_k(df2, "v", 10, tie_col="id").collect())
    assert got == [i for i in range(100) if i % 2 == 1][:10]
    with pytest.raises(ValueError, match="k must be positive"):
        exact_top_k(df, "v", 0)
    assert exact_top_k(df.limit(0), "v", 5).count() == 0


def test_exact_top_k_no_global_window(spark):
    """Plan shape: the selection never moves everything to one task —
    no partition-less window, and the boundary rank runs over a
    spark_partition_id group."""
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 997).cast("double").alias("v")
    )
    out = exact_top_k(df, "v", 500, tie_col="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan or "__pid" in plan
    assert out.count() == 500


@pytest.mark.slow
def test_exact_top_k_hypothesis_fuzz(spark):
    """Property: for arbitrary value multisets (heavy ties included),
    ks and partition counts, exact_top_k returns exactly the k smallest
    /largest (value, tie) pairs — the same multiset a full sort picks."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows_st = st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=300
    )

    @settings(max_examples=25, deadline=None)
    @given(
        rows_st,
        st.integers(min_value=1, max_value=350),
        st.integers(min_value=1, max_value=9),
        st.booleans(),
    )
    def run(vals, k, nparts, desc):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id bigint, v long"
        )
        got = sorted(
            (r["v"], r["id"])
            for r in exact_top_k(
                df, "v", k, tie_col="id", descending=desc,
                n_partitions=nparts,
            ).collect()
        )
        ordered = sorted(
            ((v, i) for i, v in enumerate(vals)),
            key=lambda t: ((-t[0]) if desc else t[0], t[1]),
        )
        want = sorted(ordered[: min(k, len(vals))])
        assert got == want, (k, nparts, desc)

    run()


@pytest.mark.slow
def test_incremental_dsir_index(spark, warehouse):
    """Model state as an engine aggregation-merge table: folding
    batches sums to the batch fit's exact counts (scores bit-identical
    to fit_dsir on the union), commit identifiers make replays no-ops,
    and parameter/corpus validation refuses loudly."""
    from flink_table_store_spark.datapipe.dsir import (
        create_dsir_index,
        model_from_index,
        update_dsir_index,
    )

    docs = spark.createDataFrame(
        [(i, ("alpha beta " if i % 2 else "zig zag ") * 3 + str(i))
         for i in range(40)],
        "doc_id bigint, text string",
    )
    target = docs.where(F.col("doc_id") % 5 == 1)  # deterministic slice
    idx = create_dsir_index(warehouse, "db.dsir_idx", n_buckets=2048, seed=5)
    update_dsir_index(idx, docs.where(F.col("doc_id") < 20), "raw",
                      commit_identifier="r:0")
    update_dsir_index(idx, docs.where(F.col("doc_id") >= 20), "raw",
                      commit_identifier="r:1")
    update_dsir_index(idx, target, "target", commit_identifier="t:0")
    m_inc = model_from_index(spark, idx)
    m_fit = fit_dsir(target, docs, n_buckets=2048, seed=5)
    got = sorted(map(tuple, score_dsir(docs, m_inc).collect()))
    want = sorted(map(tuple, score_dsir(docs, m_fit).collect()))
    assert got == want
    # replayed identifier: counts unchanged
    update_dsir_index(idx, docs.where(F.col("doc_id") < 20), "raw",
                      commit_identifier="r:0")
    again = sorted(map(tuple, score_dsir(
        docs, model_from_index(spark, idx)).collect()))
    assert again == got
    # 'both' counts into target AND raw
    idx2 = create_dsir_index(warehouse, "db.dsir_idx2", n_buckets=2048, seed=5)
    update_dsir_index(idx2, docs, "both")
    st = {r["bucket"]: (r["tc"], r["rc"])
          for r in idx2.refresh().to_df(spark).collect()}
    assert st and all(t == r for t, r in st.values())
    # validation
    with pytest.raises(ValueError, match="corpus must be"):
        update_dsir_index(idx, docs, "eval")
    empty_idx = create_dsir_index(warehouse, "db.dsir_idx3")
    with pytest.raises(ValueError, match="both corpora"):
        model_from_index(spark, empty_idx)
    plain = warehouse.create_table("db.not_dsir", "bucket int, tc bigint, rc bigint")
    with pytest.raises(ValueError, match="not a DSIR index"):
        update_dsir_index(plain, docs)


def test_score_novelty_dataframe_and_index_reference(spark, warehouse):
    """Novelty: unseen-vocabulary docs score ~1, reference-replica docs
    score 0, the DSIR-index reference path equals the DataFrame path,
    and no-gram docs score NULL."""
    from flink_table_store_spark.datapipe.dsir import (
        create_dsir_index,
        score_novelty,
        update_dsir_index,
    )

    ref = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(5)],
        "doc_id bigint, text string",
    )
    probe = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta epsilon"),   # pure replica
            (101, "zq1 zq2 zq3 zq4 zq5 zq6"),          # pure novelty
            (102, None),                               # no grams
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["novelty"]
           for r in score_novelty(probe, ref).collect()}
    assert got[100] == 0.0
    assert got[101] is not None and got[101] > 0.9  # collisions only lower it
    assert got[102] is None

    idx = create_dsir_index(warehouse, "db.nov_idx", n_buckets=8192, seed=13)
    update_dsir_index(idx, ref, "raw", commit_identifier="b0")
    via_idx = {r["doc_id"]: r["novelty"]
               for r in score_novelty(probe, idx).collect()}
    assert via_idx == got
