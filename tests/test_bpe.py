"""BPE tokenizer: distributed histogram training + Arrow-batched encode.

Reference scope: pillar operator — real subword token accounting for
training-data budgets (Sennrich et al. 2016 merges; GPT-2 rank encode)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.bpe import (
    EOW,
    _encode_word,
    bpe_decode,
    bpe_encode,
    train_bpe,
    word_histogram,
)


def test_train_bpe_hand_example(spark):
    # corpus: "low" x5, "lower" x2 — classic Sennrich example shape.
    df = spark.createDataFrame(
        [("low low low low low",), ("lower lower",)], "text string"
    )
    model = train_bpe(df, n_merges=4)
    # pair counts round 1: (l,o)=7 (o,w)=7 (w,</w>)=5 (w,e)=2 (e,r)=2
    # (r,</w>)=2 -> tie 7/7 broken lexicographically: (l,o) first
    assert model["merges"][0] == ("l", "o")
    assert model["merges"][1] == ("lo", "w")
    assert model["merges"][2] == ("low", EOW)
    assert "low</w>" in model["vocab"]


def test_encode_decode_roundtrip(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the the the lazy dog"),
            (3, None),
            (4, "  Spaced   OUT   text  "),
        ],
        "doc_id bigint, text string",
    )
    model = train_bpe(docs, n_merges=30)
    out = bpe_encode(docs, model).withColumn(
        "decoded", bpe_decode("bpe_tokens")
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["decoded"] == "the quick brown fox"
    assert rows[2]["decoded"] == "the the the lazy dog"
    assert rows[3]["bpe_tokens"] == [] and rows[3]["bpe_len"] == 0
    # decode normalizes whitespace + case (the documented contract)
    assert rows[4]["decoded"] == "spaced out text"
    assert all(
        r["bpe_len"] == len(r["bpe_tokens"]) for r in rows.values()
    )


def test_greedy_encode_equals_training_replay(spark):
    """The rank-greedy encoder must equal replaying the merge list in
    training order — the equivalence the GPT-2 encoder relies on."""
    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(1, 10)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(" ".join(words[i::10]),) for i in range(10)], "text string"
    )
    model = train_bpe(df, n_merges=50)
    ranks = {p: i for i, p in enumerate(model["merges"])}

    def replay(word):
        syms = list(word) + [EOW]
        for a, b in model["merges"]:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return syms

    for w in set(words) | {"dcba", "aaaaaaaa", "x", "xyzzy"}:
        assert _encode_word(w, ranks) == replay(w), w


def test_train_deterministic_and_saturates(spark):
    df = spark.createDataFrame([("ab ab ba",)], "text string")
    m1 = train_bpe(df, n_merges=100)
    m2 = train_bpe(df, n_merges=100)
    assert m1["merges"] == m2["merges"]
    # distinct words are tiny: the loop stops when no pair remains
    assert len(m1["merges"]) < 100
    # fully merged: every word is now a single token
    assert {"ab</w>", "ba</w>"} <= set(m1["vocab"])


def test_min_count_and_unseen_words(spark):
    df = spark.createDataFrame(
        [("aaa aaa aaa aaa rare",)], "text string"
    )
    model = train_bpe(df, n_merges=10, min_count=2)
    # 'rare' fell below min_count: none of its merges were learned...
    assert not any("r" in a + b for a, b in model["merges"])
    # ...but it still ENCODES (into chars + EOW) — no row is refused
    out = bpe_encode(
        spark.createDataFrame([(1, "rare aaa")], "doc_id bigint, text string"),
        model,
    ).collect()[0]
    assert "aaa</w>" in out["bpe_tokens"]
    assert out["bpe_tokens"][:1] == ["r"] or out["bpe_tokens"][0] == "rare</w>"


def test_word_histogram(spark):
    df = spark.createDataFrame(
        [("a b a",), ("", ), (None,), ("b",)], "text string"
    )
    got = {r["word"]: r["cnt"] for r in word_histogram(df).collect()}
    assert got == {"a": 2, "b": 2}


def test_encode_over_documents_table(spark):
    """Smoke at real shape: train on sf0.001 documents, encode, check
    token accounting invariants (no empties, len == tokens)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_bpe(docs, n_merges=200)
    out = bpe_encode(docs.select("doc_id", "text"), model)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bpe_len").alias("toks"),
        F.min("bpe_len").alias("mn"),
    ).collect()[0]
    assert agg["n"] == docs.count()
    assert agg["toks"] > 0 and agg["mn"] >= 1
    # compression sanity: merges shorten sequences vs char-level
    chars = docs.agg(
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("c")
    ).collect()[0]["c"]
    n_words = out.agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("w")
    ).collect()[0]["w"]
    char_level = chars + n_words  # one EOW per word
    assert agg["toks"] < char_level


def test_trainer_matches_naive_reference_hypothesis():
    """Property: the incremental pair bookkeeping + lazy heap equals a
    recount-everything reference trainer on arbitrary histograms (the
    accounting class where subtle BPE bugs live). Pure python — no
    Spark in the loop."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_table_store_spark.datapipe.bpe import (
        train_bpe_from_histogram,
    )

    def naive(hist, n_merges):
        words = {tuple(w) + (EOW,): c for w, c in hist}
        # collapse duplicate words by summing counts, as a groupBy would
        agg: dict = {}
        for w, c in hist:
            k = tuple(w) + (EOW,)
            agg[k] = agg.get(k, 0) + c
        words = agg
        merges = []
        for _ in range(n_merges):
            pc: dict = {}
            for syms, c in words.items():
                for p in zip(syms, syms[1:]):
                    pc[p] = pc.get(p, 0) + c
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append(best)
            out = {}
            for syms, c in words.items():
                ns, j = [], 0
                while j < len(syms):
                    if (
                        j + 1 < len(syms)
                        and syms[j] == best[0]
                        and syms[j + 1] == best[1]
                    ):
                        ns.append(best[0] + best[1])
                        j += 2
                    else:
                        ns.append(syms[j])
                        j += 1
                out[tuple(ns)] = out.get(tuple(ns), 0) + c
            words = out
        return merges

    word_st = st.text(alphabet="abc", min_size=1, max_size=8)
    hist_st = st.lists(
        st.tuples(word_st, st.integers(min_value=1, max_value=9)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )

    @settings(max_examples=120, deadline=None)
    @given(hist_st, st.integers(min_value=0, max_value=20))
    def check(hist, n_merges):
        got = train_bpe_from_histogram(hist, n_merges)["merges"]
        assert got == naive(hist, n_merges)

    check()


def test_encode_word_hypothesis_buildable_merge_lists():
    """Property: the rank-greedy encoder equals training-order replay
    for every BUILDABLE merge list — each merge's operands exist when
    it is learned (chars/EOW or outputs of earlier merges), the
    invariant real training guarantees. (For UNbuildable lists the two
    strategies genuinely diverge — e.g. rank-1 (abb,b) only becomes
    applicable after rank-2 (ab,b) creates 'abb', which greedy then
    revisits but sequential replay never does — so the encoder's
    contract is trained lists, which this strategy models.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word_st = st.text(alphabet="ab", min_size=1, max_size=10)

    @st.composite
    def buildable_merges(draw):
        symbols = ["a", "b", EOW]
        merges = []
        n = draw(st.integers(min_value=0, max_value=10))
        for _ in range(n):
            x = draw(st.sampled_from(symbols))
            y = draw(st.sampled_from(symbols))
            if (x, y) in merges:
                continue
            merges.append((x, y))
            joined = x + y
            if joined not in symbols:
                symbols.append(joined)
        return merges

    def replay(word, merges):
        syms = list(word) + [EOW]
        for a, b in merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return syms

    @settings(max_examples=200, deadline=None)
    @given(word_st, buildable_merges())
    def check(word, merges):
        ranks = {p: i for i, p in enumerate(merges)}
        assert _encode_word(word, ranks) == replay(word, merges)

    check()
