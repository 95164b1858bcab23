"""Model-based quality scoring + leakage-safe dataset splitting.

Reference scope: the model-based quality-filter step of corpus
curation (the fastText/DCLM classifier shape) and deterministic
train/val/test assignment — both pillar operators, both pure
built-ins, both replayable by the DuckDB oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    rows = []
    for i in range(60):
        if i % 2 == 0:
            text = f"the quick brown fox jumps over lazy dog {i}"
        else:
            text = f"zzz qqq xxx www spam spam spam buy now {i}"
        rows.append((i, text, i % 2 == 0))
    return spark.createDataFrame(rows, "doc_id bigint, text string, good boolean")


def test_quality_model_separates_classes(spark):
    from flink_table_store_spark.datapipe.quality_model import (
        quality_filter,
        score_quality_model,
        train_quality_model,
    )

    docs = _docs(spark)
    labeled = docs.select(
        "doc_id", "text", F.col("good").cast("int").alias("label")
    )
    model = train_quality_model(labeled, n_buckets=4096, seed=11)
    scored = score_quality_model(docs, model).collect()
    by_id = {r["doc_id"]: r["quality_score"] for r in scored}
    good = [by_id[i] for i in range(0, 60, 2)]
    bad = [by_id[i] for i in range(1, 60, 2)]
    assert min(good) > max(bad)
    # filter keeps exactly the docs scoring >= threshold
    thr = (min(good) + max(bad)) / 2
    kept = quality_filter(docs, model, threshold=thr)
    assert sorted(r["doc_id"] for r in kept.collect()) == list(range(0, 60, 2))


@pytest.mark.slow
def test_quality_model_deterministic_and_null_safe(spark):
    from flink_table_store_spark.datapipe.quality_model import (
        score_quality_model,
        train_quality_model,
    )

    docs = _docs(spark)
    labeled = docs.select(
        "doc_id", "text", F.col("good").cast("int").alias("label")
    )
    m1 = train_quality_model(labeled, n_buckets=512, seed=5)
    m2 = train_quality_model(labeled, n_buckets=512, seed=5)
    s1 = score_quality_model(docs, m1).orderBy("doc_id").collect()
    s2 = score_quality_model(docs, m2).orderBy("doc_id").collect()
    assert s1 == s2
    # empty / NULL text scores NULL with 0 features, and never joins
    weird = spark.createDataFrame(
        [(100, None), (101, "")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in score_quality_model(weird, m1).collect()}
    assert out[100]["quality_score"] is None
    # "" and whitespace-only text yield NO grams (split('') gives ['']
    # but '' grams are filtered) — the documented no-gram→NULL contract
    weird2 = spark.createDataFrame(
        [(101, ""), (102, "   ")], "doc_id bigint, text string"
    )
    out2 = {r["doc_id"]: r for r in score_quality_model(weird2, m1).collect()}
    for i in (101, 102):
        assert out2[i]["n_features"] == 0
        assert out2[i]["quality_score"] is None


def test_quality_model_needs_both_classes(spark):
    from flink_table_store_spark.datapipe.quality_model import (
        train_quality_model,
    )

    one_class = spark.createDataFrame(
        [(1, "a b", 1), (2, "c d", 1)], "doc_id bigint, text string, label int"
    )
    with pytest.raises(ValueError, match="both classes"):
        train_quality_model(one_class)


def test_quality_model_nb_weights_closed_form(spark):
    """Weights match the hand-computed NB log-odds on a 2-doc corpus."""
    from flink_table_store_spark.datapipe.quality_model import (
        train_quality_model,
    )

    labeled = spark.createDataFrame(
        [(1, "a a", 1), (2, "b", 0)], "doc_id bigint, text string, label int"
    )
    B = 64
    model = train_quality_model(labeled, n_buckets=B, seed=1, alpha=1.0)
    w = {r["bucket"]: r["weight"] for r in model["weights"].collect()}
    # doc1 grams: a, a, "a a"  (3 pos occurrences); doc2 grams: b (1 neg)
    # pos_total=3, neg_total=1
    # bucket(a): pos=2 neg=0 -> log(3/(3+B)) - log(1/(1+B))
    # assuming no hash collisions among {a, b, "a a"} at B=64, seed=1
    assert len(w) == 3
    pts, nts = 3.0, 1.0
    expected_a = math.log((2 + 1) / (pts + B)) - math.log((0 + 1) / (nts + B))
    assert any(abs(v - expected_a) < 1e-9 for v in w.values())
    assert abs(model["bias"] - math.log(1 / 1)) < 1e-12


def test_split_dataset_fractions_and_determinism(spark):
    from flink_table_store_spark.datapipe.sampling import split_dataset

    df = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
    out = split_dataset(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id", seed=7
    )
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    # same seed -> identical labels; different seed -> different labels
    again = split_dataset(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id", seed=7
    )
    assert out.orderBy("doc_id").collect() == again.orderBy("doc_id").collect()
    other = split_dataset(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, key_col="doc_id", seed=8
    )
    diff = (
        out.alias("a")
        .join(other.alias("b"), "doc_id")
        .where(F.col("a.split") != F.col("b.split"))
        .count()
    )
    assert diff > 0


def test_split_dataset_group_leakage_guard(spark):
    from flink_table_store_spark.datapipe.sampling import split_dataset

    df = spark.createDataFrame(
        [(i, f"domain{i % 7}" if i % 11 else None) for i in range(2000)],
        "doc_id bigint, domain string",
    )
    out = split_dataset(
        df, {"train": 0.5, "test": 0.5}, group_col="domain", seed=3
    )
    # every group (incl. the NULL group) maps to exactly one split
    per_group = (
        out.groupBy("domain")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_group)


def test_split_dataset_validation(spark):
    from flink_table_store_spark.datapipe.sampling import split_dataset

    df = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1"):
        split_dataset(df, {"a": 0.5, "b": 0.2})
    with pytest.raises(ValueError, match="non-empty"):
        split_dataset(df, {})
    with pytest.raises(ValueError, match="negative"):
        split_dataset(df, {"a": 1.5, "b": -0.5})
    bad = df.withColumn("split", F.lit("x"))
    with pytest.raises(ValueError, match="already exists"):
        split_dataset(bad, {"a": 1.0})


def test_split_dataset_matches_duckdb_oracle(spark):
    """The md5 assignment replays exactly in DuckDB — the portability
    contract the registry row relies on."""
    import duckdb

    from flink_table_store_spark.datapipe.sampling import split_dataset

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["split"]
        for r in split_dataset(
            df, {"train": 0.9, "heldout": 0.1}, key_col="doc_id", seed=42
        ).collect()
    }
    want = dict(
        duckdb.sql(
            """
            SELECT i, CASE WHEN
              ('0x' || substr(md5(i::VARCHAR || '-42'), 1, 15))::BIGINT
                < {b}
              THEN 'train' ELSE 'heldout' END
            FROM range(500) t(i)
            """.format(b=int(0.9 * float(1 << 60)))
        ).fetchall()
    )
    assert got == want


def test_quality_model_rejects_bad_labels(spark):
    from flink_table_store_spark.datapipe.quality_model import (
        train_quality_model,
    )

    with pytest.raises(ValueError, match="NULL-free"):
        train_quality_model(
            spark.createDataFrame(
                [(1, "a b", 1), (2, "c d", None)],
                "doc_id bigint, text string, label int",
            )
        )
    with pytest.raises(ValueError, match="integral 0/1"):
        train_quality_model(
            spark.createDataFrame(
                [(1, "a b", 2), (2, "c d", 0)],
                "doc_id bigint, text string, label int",
            )
        )


def test_temperature_weights(spark):
    from flink_table_store_spark.datapipe.sampling import temperature_weights

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small", 10) for i in range(100)]
        + [(200, None, 10)],
        "doc_id bigint, domain string, n_tokens int",
    )
    # tau=1: natural proportions (NULL domain excluded)
    w1 = temperature_weights(df, "domain", 1.0)
    assert abs(w1["big"] - 0.9) < 1e-12 and abs(w1["small"] - 0.1) < 1e-12
    # tau->0.5 boosts the small domain, order preserved
    w5 = temperature_weights(df, "domain", 0.5)
    assert w5["small"] > 0.1 and w5["big"] < 0.9
    assert w5["big"] > w5["small"]
    assert abs(sum(w5.values()) - 1.0) < 1e-12
    # token-mass variant weighs by the column, not row count
    df2 = spark.createDataFrame(
        [(1, "a", 900), (2, "b", 100)], "doc_id bigint, domain string, n_tokens int"
    )
    wt = temperature_weights(df2, "domain", 1.0, token_col="n_tokens")
    assert abs(wt["a"] - 0.9) < 1e-12
    import pytest as _pt

    with _pt.raises(ValueError, match="temperature"):
        temperature_weights(df, "domain", 0.0)
    with _pt.raises(ValueError, match="temperature"):
        temperature_weights(df, "domain", 1.5)


def test_temperature_mix_composition(spark):
    """tau<1 narrows the per-domain token-share gap after resampling."""
    from flink_table_store_spark.datapipe.sampling import (
        resample_to_mix,
        temperature_weights,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small", 100) for i in range(1000)],
        "doc_id bigint, domain string, n_tokens int",
    )
    w = temperature_weights(df, "domain", 0.5, token_col="n_tokens")
    mixed = resample_to_mix(df, "domain", w, token_col="n_tokens", seed=3)
    shares = {
        r["domain"]: r["tok"]
        for r in mixed.groupBy("domain")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    }
    tot = sum(shares.values())
    small_share = shares["small"] / tot
    assert 0.1 < small_share < 0.5  # boosted above natural 10%, not flat


def test_normalize_text_unicode(spark):
    from flink_table_store_spark.datapipe.text import normalize_text

    rows = [
        (1, "ﬁnance ＦＵＬＬＷＩＤＴＨ ①"),   # ligature, fullwidth, circled
        (2, "café Café"),
        (3, None),
        (4, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(df, form="NFKC").collect()
    }
    assert out[1] == "finance FULLWIDTH 1"
    assert out[3] is None and out[4] == "plain ascii"
    stripped = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(
            df, strip_accents=True, lowercase=True
        ).collect()
    }
    assert stripped[2] == "cafe cafe"
    # DuckDB parity on NFC — the cross-engine contract
    import duckdb
    import unicodedata

    s = "école ﬁn"  # decomposed accent + ligature
    nfc_duck = duckdb.sql("SELECT nfc_normalize(?)", params=[s]).fetchone()[0]
    assert unicodedata.normalize("NFC", s) == nfc_duck
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown unicode form"):
        normalize_text(df, form="XXX")


def test_quality_model_rejects_fractional_labels(spark):
    from flink_table_store_spark.datapipe.quality_model import (
        train_quality_model,
    )

    frac = spark.createDataFrame(
        [(1, "a b", 1.0), (2, "c d", 0.9)],
        "doc_id bigint, text string, label double",
    )
    with pytest.raises(ValueError, match="integral 0/1"):
        train_quality_model(frac)


def test_normalize_text_collision_guard(spark):
    from flink_table_store_spark.datapipe.text import normalize_text

    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="already exists"):
        normalize_text(df, out_col="text")


def test_unimax_allocation_waterfill(spark):
    """Hand-computed water-filling: budget 60 over capacities 10/20/100
    (max_epochs=1) -> 10/20/30; tiny budget -> pure uniform; budget
    beyond total capacity -> everything capped at capacity."""
    from flink_table_store_spark.datapipe.sampling import unimax_allocation

    rows = (
        [("a", 1)] * 10 + [("b", 1)] * 20 + [("c", 1)] * 100 + [(None, 1)] * 5
    )
    df = spark.createDataFrame(rows, "domain string, w int")
    a = unimax_allocation(df, "domain", budget=60.0, max_epochs=1.0)
    assert {d: v["alloc"] for d, v in a.items()} == {
        "a": 10.0,
        "b": 20.0,
        "c": 30.0,
    }
    assert a["a"]["epochs"] == 1.0 and abs(a["c"]["epochs"] - 0.3) < 1e-12
    assert abs(sum(v["weight"] for v in a.values()) - 1.0) < 1e-12
    # small budget: uniform, nothing capped
    u = unimax_allocation(df, "domain", budget=24.0, max_epochs=1.0)
    assert all(abs(v["alloc"] - 8.0) < 1e-12 for v in u.values())
    # budget above total capacity: capped everywhere, epochs == max
    c = unimax_allocation(df, "domain", budget=1e6, max_epochs=2.0)
    assert all(abs(v["epochs"] - 2.0) < 1e-12 for v in c.values())
    # token-mass mode + validation
    t = unimax_allocation(
        df.withColumn("w", F.lit(7)), "domain", budget=60.0, token_col="w"
    )
    assert abs(t["a"]["mass"] - 70.0) < 1e-12
    import pytest as _p

    for kw in ({"budget": 0}, {"budget": 10, "max_epochs": 0}):
        with _p.raises(ValueError):
            unimax_allocation(df, "domain", **kw)


@pytest.mark.slow
def test_unimax_matches_iterative_waterfill(spark):
    """The closed form equals the paper's iterative water-filling on
    randomized domain masses (20 trials)."""
    import random

    from flink_table_store_spark.datapipe.sampling import unimax_allocation

    rng = random.Random(42)
    for trial in range(20):
        masses = {f"d{i}": rng.randint(1, 500) for i in range(rng.randint(2, 9))}
        budget = float(rng.randint(1, 2 * sum(masses.values())))
        me = rng.choice([0.5, 1.0, 2.0])
        rows = [(d, m) for d, m in masses.items()]
        df = spark.createDataFrame(rows, "domain string, m int")
        got = unimax_allocation(
            df, "domain", budget=budget, max_epochs=me, token_col="m"
        )
        # reference: iterate uniform-share-then-freeze until stable
        open_d = dict.fromkeys(masses, None)
        alloc, rem = {}, budget
        while open_d:
            share = rem / len(open_d)
            frozen = {
                d for d in open_d if me * masses[d] <= share + 1e-12
            }
            if not frozen:
                for d in open_d:
                    alloc[d] = share
                break
            for d in frozen:
                alloc[d] = me * masses[d]
                rem -= alloc[d]
                del open_d[d]
        for d in masses:
            assert abs(got[d]["alloc"] - alloc[d]) < 1e-6, (
                trial,
                d,
                got[d]["alloc"],
                alloc[d],
            )
