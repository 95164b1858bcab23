"""Streaming corpus curation: inline dedup + quality gate + exactly-once.

The steady-state ingestion loop — micro-batches curate on the way into
the corpus table, dedup state lives in the persistent fingerprint
index, and every failure point between the two commits is replay-safe."""

from __future__ import annotations

import pytest
import os

from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.incdedup import create_exact_index
from flink_table_store_spark.streaming.curation import (
    curation_batch_writer,
    curate_stream,
)

CORPUS_DDL = "doc_id bigint, text string, n_tokens int"


def _mk_tables(warehouse):
    corpus = warehouse.create_table("db.corpus", CORPUS_DDL)
    index = create_exact_index(warehouse, "db.corpus_fp")
    return corpus, index


def _write_feed(spark, path, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


@pytest.mark.slow
def test_stream_curates_across_batches(spark, warehouse, tmp_path):
    corpus, index = _mk_tables(warehouse)
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    _write_feed(
        spark,
        feed,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # intra-batch dup of 1
            (3, "tiny"),  # fails min_tokens
            (4, "epsilon zeta eta theta iota"),
        ],
    )
    src = spark.readStream.schema("doc_id bigint, text string").parquet(feed)
    q = curate_stream(
        src, corpus, index, "ing", ckpt, min_tokens=2, max_tokens=100
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in corpus.refresh().to_df(spark).collect()}
    assert sorted(got) == [1, 4]
    assert got[1]["n_tokens"] == 4 and got[4]["n_tokens"] == 5

    # round 2: a new file with a CROSS-BATCH dup (same text as doc 1),
    # plus genuinely new docs
    _write_feed(
        spark,
        feed,
        [
            (10, "alpha beta gamma delta"),  # dup of committed doc 1
            (11, "kappa lambda mu nu xi"),
        ],
    )
    q = curate_stream(
        src, corpus, index, "ing", ckpt, min_tokens=2, max_tokens=100
    )
    q.awaitTermination(120)
    ids = sorted(
        r["doc_id"] for r in corpus.refresh().to_df(spark).collect()
    )
    assert ids == [1, 4, 11]
    # the index holds exactly the survivors' fingerprints
    assert index.refresh().to_df(spark).count() == 3


def test_batch_replay_is_exactly_once(spark, warehouse):
    """Replaying a micro-batch (Structured Streaming's failure mode)
    must not duplicate corpus rows, drop survivors, or bloat the
    index — whichever side committed first."""
    corpus, index = _mk_tables(warehouse)
    fn = curation_batch_writer(corpus, index, "s", min_tokens=1)
    batch = spark.createDataFrame(
        [(1, "one two three"), (2, "four five six")],
        "doc_id bigint, text string",
    )
    fn(batch, 0)
    n_corpus = corpus.refresh().to_df(spark).count()
    n_index = index.refresh().to_df(spark).count()
    assert (n_corpus, n_index) == (2, 2)
    # full replay: both commits carry already-seen identifiers
    fn(batch, 0)
    assert corpus.refresh().to_df(spark).count() == 2
    assert index.refresh().to_df(spark).count() == 2
    # next batch still flows (dup of doc 1 dropped, new doc kept)
    fn(
        spark.createDataFrame(
            [(3, "one two three"), (4, "seven eight")],
            "doc_id bigint, text string",
        ),
        1,
    )
    ids = sorted(r["doc_id"] for r in corpus.refresh().to_df(spark).collect())
    assert ids == [1, 2, 4]


def test_crash_between_corpus_and_index_commit(spark, warehouse):
    """The documented failure window: corpus committed, index write
    crashed. The replay must re-drive the index without duplicating
    corpus rows — the ordering argument in the module docstring."""
    corpus, index = _mk_tables(warehouse)
    fn = curation_batch_writer(corpus, index, "s", min_tokens=1)
    batch = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "dd ee ff")], "doc_id bigint, text string"
    )
    # simulate the crash: run only the corpus half by pointing the
    # index at a broken writer for the first attempt
    real_write = index.write

    class _Boom(Exception):
        pass

    def boom(*a, **k):
        raise _Boom()

    index.write = boom
    try:
        try:
            fn(batch, 0)
            raise AssertionError("expected the injected crash")
        except _Boom:
            pass
    finally:
        index.write = real_write
    assert corpus.refresh().to_df(spark).count() == 2
    assert index.refresh().to_df(spark).count() == 0
    # replay after recovery: corpus identifier-skipped, index repaired
    fn(batch, 0)
    assert corpus.refresh().to_df(spark).count() == 2
    assert index.refresh().to_df(spark).count() == 2


def test_quality_model_gate_in_stream(spark, warehouse):
    from flink_table_store_spark.datapipe.quality_model import (
        train_quality_model,
    )

    labeled = spark.createDataFrame(
        [(i, "good clean prose here", 1) for i in range(10)]
        + [(100 + i, "zz qq spam spam spam", 0) for i in range(10)],
        "doc_id bigint, text string, label int",
    )
    model = train_quality_model(labeled, n_buckets=512, seed=2)
    corpus, index = _mk_tables(warehouse)
    fn = curation_batch_writer(
        corpus, index, "s", quality_model=model, quality_threshold=0.5
    )
    fn(
        spark.createDataFrame(
            [(1, "good clean prose here"), (2, "zz qq spam spam spam")],
            "doc_id bigint, text string",
        ),
        0,
    )
    ids = [r["doc_id"] for r in corpus.refresh().to_df(spark).collect()]
    assert ids == [1]


@pytest.mark.slow
def test_near_dup_curation_across_batches(spark, warehouse):
    """minhash_index option: cross-batch NEAR-duplicates (high shingle
    overlap, different bytes) are dropped; the LSH index rides the same
    exactly-once ordering."""
    from flink_table_store_spark.datapipe.incdedup import (
        create_minhash_index,
    )

    corpus, index = _mk_tables(warehouse)
    mh = create_minhash_index(warehouse, "db.corpus_mh")
    fn = curation_batch_writer(
        corpus, index, "nd", min_tokens=2, minhash_index=mh,
        jaccard_threshold=0.5,
    )
    base = "the quick brown fox jumps over the lazy dog again and again"
    fn(
        spark.createDataFrame(
            [(1, base), (2, "completely different words entirely here")],
            "doc_id bigint, text string",
        ),
        0,
    )
    assert corpus.refresh().to_df(spark).count() == 2
    # batch 1: a near-dup of doc 1 (one word changed -> not exact-equal,
    # high Jaccard), one genuinely new doc
    near = base.replace("lazy", "sleepy")
    fn(
        spark.createDataFrame(
            [(10, near), (11, "fresh content nothing shared with others")],
            "doc_id bigint, text string",
        ),
        1,
    )
    ids = sorted(r["doc_id"] for r in corpus.refresh().to_df(spark).collect())
    assert ids == [1, 2, 11]
    # replay of batch 1 changes nothing (all three sinks identifier-checked)
    fn(
        spark.createDataFrame(
            [(10, near), (11, "fresh content nothing shared with others")],
            "doc_id bigint, text string",
        ),
        1,
    )
    assert sorted(
        r["doc_id"] for r in corpus.refresh().to_df(spark).collect()
    ) == [1, 2, 11]
    # the LSH index holds signatures only for survivors
    assert (
        mh.refresh().to_df(spark).select("doc_id").distinct().count() == 3
    )


@pytest.mark.slow
def test_crash_between_minhash_and_exact_index(spark, warehouse):
    """The review-pass window: corpus + LSH signatures committed, exact
    index write crashed. Replay must repair the exact index while every
    survivor keeps its LSH signatures — the exact index writing LAST is
    what prevents permanently-unindexed corpus docs."""
    from flink_table_store_spark.datapipe.incdedup import (
        create_minhash_index,
    )

    corpus, index = _mk_tables(warehouse)
    mh = create_minhash_index(warehouse, "db.c_mh2")
    fn = curation_batch_writer(
        corpus, index, "w", min_tokens=1, minhash_index=mh,
        jaccard_threshold=0.3,
    )
    base = " ".join(f"token{i} word{i} item{i}" for i in range(14))
    batch = spark.createDataFrame(
        [(1, base)], "doc_id bigint, text string"
    )

    class _Boom(Exception):
        pass

    real_write = index.write
    index.write = lambda *a, **k: (_ for _ in ()).throw(_Boom())
    try:
        try:
            fn(batch, 0)
            raise AssertionError("expected the injected crash")
        except _Boom:
            pass
    finally:
        index.write = real_write
    # corpus and mh committed, exact index empty — the crash window
    assert corpus.refresh().to_df(spark).count() == 1
    assert mh.refresh().to_df(spark).count() > 0
    assert index.refresh().to_df(spark).count() == 0
    # replay repairs the exact index without disturbing the others
    fn(batch, 0)
    assert corpus.refresh().to_df(spark).count() == 1
    assert index.refresh().to_df(spark).count() == 1
    n_sigs = mh.refresh().to_df(spark).count()
    # and a later near-dup of the crashed batch IS still caught —
    # the failure mode the commit order exists to prevent
    fn(
        spark.createDataFrame(
            [(9, base.replace("token7", "changed7"))],
            "doc_id bigint, text string",
        ),
        1,
    )
    assert sorted(
        r["doc_id"] for r in corpus.refresh().to_df(spark).collect()
    ) == [1]
    assert mh.refresh().to_df(spark).count() == n_sigs


@pytest.mark.slow
def test_quality_loser_does_not_suppress_batch_mate(spark, warehouse):
    """Gates run before near-dup dedup: a doc that will be filtered
    out must not near-dup-suppress its batch-mate (batch boundaries
    must not change what the corpus keeps)."""
    from flink_table_store_spark.datapipe.incdedup import (
        create_minhash_index,
    )
    from flink_table_store_spark.datapipe.quality_model import (
        train_quality_model,
    )

    labeled = spark.createDataFrame(
        [(i, "fine upstanding text with words", 1) for i in range(10)]
        + [(100 + i, "zz qq xx junk junk junk", 0) for i in range(10)],
        "doc_id bigint, text string, label int",
    )
    model = train_quality_model(labeled, n_buckets=512, seed=4)
    corpus, index = _mk_tables(warehouse)
    mh = create_minhash_index(warehouse, "db.c_mh3")
    fn = curation_batch_writer(
        corpus, index, "g", minhash_index=mh, jaccard_threshold=0.5,
        quality_model=model, quality_threshold=0.5,
    )
    # doc 1: junk (fails gate), doc 2: near-dup of doc 1's TEXT but
    # "fine" — contrived so both share shingles; doc 1 has smaller id.
    # With dedup-first, doc 1 would win the near-dup race then die at
    # the gate, losing doc 2 too. Gates-first keeps doc 2.
    junk = "zz qq xx junk junk junk zz qq xx junk junk junk"
    finey = "fine upstanding text with words fine upstanding text with words"
    fn(
        spark.createDataFrame(
            [(1, junk), (2, finey)], "doc_id bigint, text string"
        ),
        0,
    )
    ids = [r["doc_id"] for r in corpus.refresh().to_df(spark).collect()]
    assert ids == [2]


@pytest.mark.slow
def test_simhash_gate_in_stream(spark, warehouse):
    """simhash_index option: a WORD-SHUFFLED copy (same bag of words,
    different order — near-identical SimHash, but shingle-based MinHash
    would miss it) is dropped across batches; the fourth sink rides the
    same identifier-checked ordering."""
    from flink_table_store_spark.datapipe.incdedup import (
        create_simhash_index,
    )

    corpus, index = _mk_tables(warehouse)
    sh = create_simhash_index(warehouse, "db.c_sh")
    fn = curation_batch_writer(
        corpus, index, "sh", min_tokens=2, simhash_index=sh
    )
    words = [f"u{j}" for j in range(30)]
    fn(
        spark.createDataFrame(
            [(1, " ".join(words))], "doc_id bigint, text string"
        ),
        0,
    )
    # batch 1: word-shuffled copy (identical bag -> hamming 0) + fresh
    shuffled = " ".join(reversed(words))
    fn(
        spark.createDataFrame(
            [(10, shuffled), (11, " ".join(f"v{j}" for j in range(30)))],
            "doc_id bigint, text string",
        ),
        1,
    )
    ids = sorted(r["doc_id"] for r in corpus.refresh().to_df(spark).collect())
    assert ids == [1, 11]
    # replay is a no-op across all sinks
    fn(
        spark.createDataFrame(
            [(10, shuffled), (11, " ".join(f"v{j}" for j in range(30)))],
            "doc_id bigint, text string",
        ),
        1,
    )
    assert sorted(
        r["doc_id"] for r in corpus.refresh().to_df(spark).collect()
    ) == [1, 11]
    assert (
        sh.refresh().to_df(spark).select("doc_id").distinct().count() == 2
    )


@pytest.mark.slow
def test_c4_and_dsir_gates_in_stream(spark, warehouse):
    """C4 line cleaning rewrites text BEFORE fingerprinting (two docs
    that differ only in junk lines dedup to one), and the DSIR gate
    drops off-domain docs by importance log-ratio."""
    from flink_table_store_spark.datapipe.dsir import fit_dsir

    corpus, index = _mk_tables(warehouse)
    target = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta.")],
        "doc_id bigint, text string",
    )
    raw = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta."),
            (1, "qq ww ee rr tt yy."),
        ],
        "doc_id bigint, text string",
    )
    model = fit_dsir(target, raw, n_buckets=4096)
    fn = curation_batch_writer(
        corpus,
        index,
        "s",
        min_tokens=1,
        c4_opts={"min_words_per_line": 5, "min_lines": 1},
        dsir_model=model,
        dsir_threshold=0.0,
    )
    good = "alpha beta gamma delta epsilon zeta."
    fn(
        spark.createDataFrame(
            [
                # same clean content, different junk lines -> same
                # post-C4 fingerprint -> only min-id survives
                (1, good + "\nshort junk"),
                (2, good + "\nClick here now"),
                # off-domain: passes C4, fails the DSIR gate
                (3, "qq ww ee rr tt yy zz aa bb cc dd."),
                # no line survives C4 -> dropped before any gate
                (4, "no punctuation here at all"),
            ],
            "doc_id bigint, text string",
        ),
        0,
    )
    got = {r["doc_id"]: r for r in corpus.refresh().to_df(spark).collect()}
    assert sorted(got) == [1]
    assert got[1]["text"] == good  # junk line stripped before the write
    # replay of the same batch is a no-op (identifier + index idempotent)
    fn(
        spark.createDataFrame(
            [(1, good + "\nshort junk")], "doc_id bigint, text string"
        ),
        0,
    )
    assert corpus.refresh().to_df(spark).count() == 1


@pytest.mark.slow
def test_dsir_gate_accepts_callable_model(spark, warehouse):
    """A zero-arg callable dsir_model is invoked once per micro-batch —
    the freshest incremental-index state gates every batch."""
    from flink_table_store_spark.datapipe.dsir import (
        create_dsir_index,
        model_from_index,
        update_dsir_index,
    )

    corpus, index = _mk_tables(warehouse)
    idx = create_dsir_index(warehouse, "db.dsir_state", n_buckets=2048, seed=3)
    tgt = spark.createDataFrame(
        [(0, "alpha beta gamma delta.")], "doc_id bigint, text string"
    )
    raw = spark.createDataFrame(
        [(0, "alpha beta gamma delta."), (1, "qq ww ee rr.")],
        "doc_id bigint, text string",
    )
    update_dsir_index(idx, tgt, "target", commit_identifier="t0")
    update_dsir_index(idx, raw, "raw", commit_identifier="r0")
    calls = []

    def fresh_model():
        calls.append(1)
        return model_from_index(spark, idx)

    fn = curation_batch_writer(
        corpus, index_table=index, sink_id="s", min_tokens=1,
        dsir_model=fresh_model, dsir_threshold=0.0,
    )
    fn(
        spark.createDataFrame(
            [(10, "alpha beta gamma delta."), (11, "qq ww ee rr.")],
            "doc_id bigint, text string",
        ),
        0,
    )
    assert len(calls) == 1
    ids = sorted(
        r["doc_id"] for r in corpus.refresh().to_df(spark).collect()
    )
    assert ids == [10]  # on-domain passes, off-domain gated out
    fn(
        spark.createDataFrame(
            [(12, "alpha beta gamma epsilon.")], "doc_id bigint, text string"
        ),
        1,
    )
    assert len(calls) == 2  # re-invoked per batch


@pytest.mark.slow
def test_text_index_fifth_sink(spark, warehouse, tmp_path):
    """The incremental full-text index as the fifth exactly-once sink:
    survivors' postings fold per micro-batch, losers never pollute the
    index, and a REPLAYED batch (fresh checkpoint, same sink_id) leaves
    both index tables untouched — including the sum-aggregated stats
    row, the one artifact PK idempotency alone would not protect."""
    from flink_table_store_spark.datapipe.textindex import (
        create_text_search_index,
        search_text_index,
    )

    corpus, index = _mk_tables(warehouse)
    fts = create_text_search_index(warehouse, "db.corpus_fts")
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    _write_feed(
        spark,
        feed,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # intra-batch dup: never indexed
            (3, "epsilon alpha zeta eta"),
        ],
    )
    src = spark.readStream.schema("doc_id bigint, text string").parquet(feed)
    q = curate_stream(
        src, corpus, index, "ing", ckpt, min_tokens=2, text_index=fts
    )
    q.awaitTermination(120)
    st = fts["stats"].refresh().to_df(spark).head()
    assert st["n"] == 2 and st["total_dl"] == 8
    hits = search_text_index(spark, fts, "alpha", k=5).collect()
    assert sorted(r["doc_id"] for r in hits) == [1, 3]
    # loser doc 2 never reached the postings
    assert (
        fts["postings"].refresh().to_df(spark)
        .where(F.col("key") == 2).count() == 0
    )

    # replay the same feed under the same sink_id from a FRESH
    # checkpoint: survivors recompute empty (exact index has them), and
    # even if they didn't, the fts identifiers skip — stats unchanged
    q = curate_stream(
        src, corpus, index, "ing", str(tmp_path / "ckpt2"),
        min_tokens=2, text_index=fts,
    )
    q.awaitTermination(120)
    st2 = fts["stats"].refresh().to_df(spark).head()
    assert (st2["n"], st2["total_dl"]) == (2, 8)


@pytest.mark.slow
def test_vector_index_sixth_sink(spark, warehouse, tmp_path):
    """Streaming vector-index maintenance: batches carrying embeddings
    extend the corpus's global IVF index in O(batch) after each corpus
    commit; all-probe search over the grown corpus equals brute force,
    and a replayed batch leaves postings untouched (no new snapshot ->
    extension no-op)."""
    from flink_table_store_spark.datapipe.incdedup import create_exact_index
    from flink_table_store_spark.datapipe.similarity import brute_force_topk
    from flink_table_store_spark.globalindex import (
        _postings_dir,
        create_global_index,
        vector_search,
    )
    from flink_table_store_spark.streaming.curation import (
        curation_batch_writer,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.concat(F.lit("doc text number "), F.col("vec_id")).alias("text"),
        "embedding",
    )
    schema = "doc_id bigint, text string, embedding array<float>, n_tokens int"
    corpus = warehouse.create_table("db.vcorpus", schema)
    index = create_exact_index(warehouse, "db.vcorpus_fp")

    # seed batch 0 through the writer, then build the index once
    wb = curation_batch_writer(corpus, index, "ing", min_tokens=1)
    wb(emb.where(F.col("doc_id") < 200), 0)
    create_global_index(
        spark, corpus.refresh(), "ivf", "embedding", "doc_id", n_cells=8
    )

    # batches 1..2 flow with the vector sink on
    wb = curation_batch_writer(
        corpus, index, "ing", min_tokens=1, vector_index="ivf"
    )
    wb(emb.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)), 1)
    wb(emb.where(F.col("doc_id") >= 350), 2)

    t = corpus.refresh()
    postings = spark.read.parquet(_postings_dir(t.path, "ivf"))
    assert postings.count() == emb.count()  # no brute-force tail left
    n_before = postings.count()

    # replayed batch: corpus commit identifier-skips -> extension no-op
    wb(emb.where(F.col("doc_id") >= 350), 2)
    assert spark.read.parquet(_postings_dir(t.path, "ivf")).count() == n_before

    q = emb.limit(4).select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = vector_search(spark, t, "ivf", q, k=3, nprobe=8)
    corpus_emb = t.to_df(spark).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    exact = brute_force_topk(
        corpus_emb, q, k=3, id_col="vec_id"
    )
    g = {(r["query_id"], r["rank"]): r["doc_id"] for r in got.collect()}
    e = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    assert g == e


@pytest.mark.slow
def test_stats_index_seventh_sink(spark, warehouse, tmp_path):
    """Persistent corpus totals: survivors' per-lang (count, token-sum)
    deltas fold per batch; the mixture computed from index state equals
    the one computed by scanning the corpus; replays leave the
    sum-aggregated state untouched."""
    from flink_table_store_spark.datapipe.incdedup import create_exact_index
    from flink_table_store_spark.datapipe.sampling import (
        create_corpus_stats_index,
        temperature_weights,
        temperature_weights_from_totals,
        totals_from_stats_index,
    )
    from flink_table_store_spark.streaming.curation import (
        curation_batch_writer,
    )

    schema = "doc_id bigint, text string, lang string, n_tokens int"
    corpus = warehouse.create_table("db.scorpus", schema)
    index = create_exact_index(warehouse, "db.scorpus_fp")
    stats = create_corpus_stats_index(warehouse, "db.scorpus_stats")
    wb = curation_batch_writer(
        corpus, index, "ing", min_tokens=1, stats_index=stats
    )
    b0 = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "gamma delta eps", "de"),
         (3, "alpha beta", "en"), (4, "zeta", None)],
        "doc_id bigint, text string, lang string",
    )
    b1 = spark.createDataFrame(
        [(10, "uno dos tres cuatro", "es"), (11, "eta theta", "en")],
        "doc_id bigint, text string, lang string",
    )
    wb(b0, 0)
    wb(b1, 1)
    wb(b1, 1)  # replay: identifier-skipped, sums unchanged

    totals = totals_from_stats_index(spark, stats, token_weighted=True)
    # doc 3 is an exact dup of 1 -> never counted; NULL lang excluded
    assert totals == {"en": 4.0, "de": 3.0, "es": 4.0}
    n_totals = totals_from_stats_index(spark, stats)
    assert n_totals == {"en": 2.0, "de": 1.0, "es": 1.0}
    # NULL-lang survivors still counted under the sentinel row
    from flink_table_store_spark.datapipe.sampling import NULL_DOMAIN

    st = {r["domain"]: r["n"] for r in stats.refresh().to_df(spark).collect()}
    assert st[NULL_DOMAIN] == 1

    # mixture from state == mixture from scanning the corpus
    from_idx = temperature_weights_from_totals(totals, 0.7)
    from_scan = temperature_weights(
        corpus.refresh().to_df(spark), "lang", 0.7, token_col="n_tokens"
    )
    # identical totals; the normalizing sum's ORDER differs between the
    # two dicts, so allow the 1-ulp float wiggle
    import pytest as _pytest

    assert set(from_idx) == set(from_scan)
    for d in from_idx:
        assert from_idx[d] == _pytest.approx(from_scan[d], abs=1e-12)


@pytest.mark.slow
def test_novelty_gate_in_stream(spark, warehouse):
    """Keep-novel diversity gate: once the reference index has absorbed
    a vocabulary, more-of-the-same docs are dropped while genuinely new
    vocabulary flows through; batch-mates never judge each other."""
    from flink_table_store_spark.datapipe.dsir import (
        create_dsir_index,
        update_dsir_index,
    )

    corpus, index = _mk_tables(warehouse)
    nov = create_dsir_index(warehouse, "db.nov_idx", n_buckets=8192, seed=13)
    fn = curation_batch_writer(
        corpus, index, "nv", min_tokens=1,
        novelty_index=nov, novelty_threshold=0.5,
    )
    # batch 0: empty index -> everything is novel -> all kept (the two
    # same-vocabulary batch-mates do NOT suppress each other)
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon")],
        "doc_id bigint, text string",
    )
    fn(b0, 0)
    assert corpus.refresh().to_df(spark).count() == 2
    # advance the reference with the survivors
    update_dsir_index(nov, corpus.refresh().to_df(spark), "raw",
                      commit_identifier="nv:0")
    # batch 1: one more-of-the-same doc (novelty ~0), one new-vocab doc
    b1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta"), (11, "zq1 zq2 zq3 zq4 zq5")],
        "doc_id bigint, text string",
    )
    fn(b1, 1)
    ids = sorted(r["doc_id"] for r in corpus.refresh().to_df(spark).collect())
    assert ids == [1, 2, 11]
