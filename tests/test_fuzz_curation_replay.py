"""Fuzz: the streaming curation loop under crash/replay interleavings.

Structured Streaming's contract is "retry the batch until it commits,
then move on". The curation writer commits TWO tables per batch
(corpus, then fingerprint index), so every crash point between them is
a reachable state. This fuzz drives random batches with random crash
injections and replays, then checks the final corpus against a serial
Python replay of the curation semantics: min-id-per-text within a
batch, existing-text wins across batches, word-count gate."""

from __future__ import annotations

import pytest

# r12 fast-tier split: this module is SLOW-tier (long fuzz loops /
# integration matrices); run `-m ""` for the full suite.
pytestmark = pytest.mark.slow
import random

from flink_table_store_spark.datapipe.incdedup import create_exact_index
from flink_table_store_spark.streaming.curation import curation_batch_writer

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _serial_oracle(batches, min_tokens):
    seen_texts = set()
    corpus = {}
    for batch in batches:
        # min id per normalized text within the batch
        best = {}
        for doc_id, text in batch:
            nt = " ".join(text.strip().lower().split())
            if nt not in best or doc_id < best[nt]:
                best[nt] = doc_id
        for nt, doc_id in sorted(best.items(), key=lambda kv: kv[1]):
            if nt in seen_texts:
                continue
            n = len(nt.split()) if nt else 0
            if n < min_tokens:
                continue
            seen_texts.add(nt)
            corpus[doc_id] = n
    return corpus


def _drive_to_commit(fn, df, batch_id, rng, tables, reals, crash_choices):
    """Drive one micro-batch to a successful commit through random
    crash injections: each attempt arms at most one sink with a raising
    writer, replays the WHOLE batch (the streaming contract), and only
    an un-armed attempt can succeed."""

    class _Boom(Exception):
        pass

    def _arm(which):
        def boom(*a, **k):
            raise _Boom()

        tables[which].write = boom

    def _disarm():
        for k, t in tables.items():
            t.write = reals[k]

    for _attempt in range(12):
        crash = rng.choice(crash_choices)
        if crash:
            _arm(crash)
        try:
            fn(df, batch_id)
            _disarm()
            # an armed sink always fires in these configurations — a
            # "success" while armed means the injection never reached
            # its sink and the window was NOT exercised
            assert crash is None, f"armed {crash} crash did not fire"
            return
        except _Boom:
            _disarm()
    raise AssertionError("batch never committed")


def test_fuzz_curation_crash_replay(spark, warehouse):
    rng = random.Random(20260816)
    corpus_t = warehouse.create_table(
        "db.fz_corpus", "doc_id bigint, text string, n_tokens int"
    )
    index_t = create_exact_index(warehouse, "db.fz_fp")
    fn = curation_batch_writer(corpus_t, index_t, "fz", min_tokens=2)
    real_write = index_t.write
    next_id = [0]
    batches = []
    for batch_id in range(6):
        batch = []
        for _ in range(rng.randint(2, 6)):
            nw = rng.randint(1, 4)
            text = " ".join(rng.choice(WORDS) for _ in range(nw))
            batch.append((next_id[0], text))
            next_id[0] += 1
        # sprinkle exact dups of earlier docs (cross- and intra-batch)
        if batches and rng.random() < 0.8:
            src = rng.choice(rng.choice(batches))
            batch.append((next_id[0], src[1]))
            next_id[0] += 1
        batches.append(batch)

        df = spark.createDataFrame(batch, "doc_id bigint, text string")
        _drive_to_commit(
            fn, df, batch_id, rng,
            {"exact": index_t}, {"exact": real_write},
            [None, "exact", None],
        )

    want = _serial_oracle(batches, min_tokens=2)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in corpus_t.refresh().to_df(spark).collect()
    }
    assert got == want
    # index holds exactly one fingerprint per surviving text
    assert index_t.refresh().to_df(spark).count() == len(want)


def test_fuzz_three_sink_crash_replay(spark, warehouse):
    """Same serial oracle, but with the MinHash index ENABLED and
    crashes injected at ANY of the three sinks (corpus, mh, exact).
    Texts are exact dups or fully-distinct word sets, so the near-dup
    layer must be a no-op — what's exercised is the three-commit
    ordering under every crash window."""
    import random as _r

    from flink_table_store_spark.datapipe.incdedup import (
        create_minhash_index,
    )

    rng = _r.Random(77)
    corpus_t = warehouse.create_table(
        "db.fz3_corpus", "doc_id bigint, text string, n_tokens int"
    )
    index_t = create_exact_index(warehouse, "db.fz3_fp")
    mh_t = create_minhash_index(warehouse, "db.fz3_mh")
    fn = curation_batch_writer(
        corpus_t, index_t, "fz3", min_tokens=2, minhash_index=mh_t,
        jaccard_threshold=0.9,
    )

    reals = {
        "corpus": corpus_t.write,
        "mh": mh_t.write,
        "exact": index_t.write,
    }
    tables = {"corpus": corpus_t, "mh": mh_t, "exact": index_t}

    # fully-distinct texts: disjoint word sets per doc id
    def fresh_text(i):
        return " ".join(f"w{i}x{j}" for j in range(6))

    next_id = [0]
    batches = []
    for batch_id in range(5):
        batch = []
        for _ in range(rng.randint(2, 4)):
            batch.append((next_id[0], fresh_text(next_id[0])))
            next_id[0] += 1
        if batches and rng.random() < 0.7:
            src = rng.choice(rng.choice(batches))
            batch.append((next_id[0], src[1]))  # exact dup
            next_id[0] += 1
        batches.append(batch)
        df = spark.createDataFrame(batch, "doc_id bigint, text string")
        _drive_to_commit(
            fn, df, batch_id, rng, tables, reals,
            [None, "corpus", "mh", "exact", None],
        )

    want = _serial_oracle(batches, min_tokens=2)
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in corpus_t.refresh().to_df(spark).collect()
    }
    assert got == want
    assert index_t.refresh().to_df(spark).count() == len(want)
    # every corpus doc has LSH signatures (the crash-window invariant)
    assert (
        mh_t.refresh().to_df(spark).select("doc_id").distinct().count()
        == len(want)
    )


def test_fuzz_gated_curation_crash_replay(spark, warehouse):
    """Crash/replay fuzz with the r10 gates ENABLED (C4 line cleaning +
    DSIR threshold): batch boundaries and crash points must never
    change what the gates keep. Serial oracle: python-replayed C4
    rules -> token gate -> a DSIR accept set precomputed OUTSIDE the
    crash machinery (the gate is a pure function of cleaned text) ->
    min-id-per-cleaned-text within a batch -> existing-text wins."""
    import re

    from flink_table_store_spark.datapipe.dsir import fit_dsir, score_dsir

    rng = random.Random(20260817)
    JUNK = ["click here", "javascript required to view page.", "x.", ""]

    def mk_text(i):
        good = " ".join(rng.choice(WORDS) for _ in range(rng.randint(4, 7)))
        lines = [good + "."]
        for _ in range(rng.randint(0, 2)):
            lines.insert(rng.randint(0, len(lines)), rng.choice(JUNK))
        return "\n".join(lines)

    def c4_py(text, min_words=5, min_lines=1):
        if text is None:
            return None
        lines = text.split("\n")
        kept = [
            ln for ln in lines
            if ln.strip()
            and re.search(r'[.!?"]$', ln.strip())
            and len(ln.strip().split()) >= min_words
            and "javascript" not in ln.strip().lower()
        ]
        if len(kept) < min_lines:
            return None
        low = text.lower()
        if "lorem ipsum" in low or "{" in low:
            return None
        return "\n".join(kept)

    corpus_t = warehouse.create_table(
        "db.fzg_corpus", "doc_id bigint, text string, n_tokens int"
    )
    index_t = create_exact_index(warehouse, "db.fzg_fp")
    target = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon.")], "doc_id bigint, text string"
    )
    all_texts = [mk_text(i) for i in range(40)]
    pool = spark.createDataFrame(
        [(i, t) for i, t in enumerate(all_texts)], "doc_id bigint, text string"
    )
    model = fit_dsir(target, pool, n_buckets=2048, seed=9)
    # precompute the accept set per CLEANED text (gate is pure)
    cleaned = sorted({c for c in (c4_py(t) for t in all_texts) if c})
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cleaned)], "doc_id bigint, text string"
    )
    thr = -1.0
    acc = {
        cleaned[r["doc_id"]]
        for r in score_dsir(cdf, model).collect()
        if r["dsir_logratio"] is not None and r["dsir_logratio"] >= thr
    }

    fn = curation_batch_writer(
        corpus_t, index_t, "fzg", min_tokens=2,
        c4_opts={"min_words_per_line": 5, "min_lines": 1},
        dsir_model=model, dsir_threshold=thr,
    )
    real_write = index_t.write
    batches, next_id, ti = [], [1000], [0]
    for batch_id in range(5):
        batch = []
        for _ in range(rng.randint(2, 5)):
            batch.append((next_id[0], all_texts[ti[0] % len(all_texts)]))
            next_id[0] += 1
            ti[0] += 1
        if batches and rng.random() < 0.7:
            batch.append((next_id[0], rng.choice(rng.choice(batches))[1]))
            next_id[0] += 1
        batches.append(batch)
        df = spark.createDataFrame(batch, "doc_id bigint, text string")
        _drive_to_commit(
            fn, df, batch_id, rng,
            {"exact": index_t}, {"exact": real_write},
            [None, "exact", None],
        )

    # serial oracle over the gated semantics
    seen, want = set(), {}
    for batch in batches:
        best = {}
        for doc_id, text in batch:
            c = c4_py(text)
            if c is None or c not in acc:
                continue
            n = len(" ".join(c.split()).split())
            if n < 2:
                continue
            nt = " ".join(c.strip().lower().split())
            if nt not in best or doc_id < best[nt][0]:
                best[nt] = (doc_id, n)
        for nt, (doc_id, n) in sorted(best.items(), key=lambda kv: kv[1][0]):
            if nt in seen:
                continue
            seen.add(nt)
            want[doc_id] = n
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in corpus_t.refresh().to_df(spark).collect()
    }
    assert got == want
    assert index_t.refresh().to_df(spark).count() == len(want)
