"""Training-data pipeline operator tests: dedup, similarity, text, multimodal."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe import dedup as DD
from flink_table_store_spark.datapipe import multimodal as MM
from flink_table_store_spark.datapipe import similarity as SIM
from flink_table_store_spark.datapipe import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The  quick  brown fox jumps over the lazy dog "),  # ws/case dup of 1
        (4, "the quick brown fox leaps over the lazy dog"),  # near dup
        (5, "completely different content about spark engines"),
        (6, "der schnelle braune fuchs springt und ist nicht da"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup(docs):
    kept = sorted(r.doc_id for r in DD.exact_dedup(docs).collect())
    assert kept == [1, 4, 5, 6]  # 2 and 3 collapse into 1


@pytest.mark.slow
def test_minhash_near_dup(docs):
    # shingle_k=2 makes doc 4 ("leaps" for "jumps") jaccard 0.6 vs doc 1;
    # bands=32 (r=2) makes an LSH band collision near-certain at that sim
    kept = sorted(
        r.doc_id
        for r in DD.minhash_dedup(
            docs, jaccard_threshold=0.5, shingle_k=2, bands=32
        ).collect()
    )
    assert 1 in kept and 5 in kept and 6 in kept
    assert 2 not in kept and 3 not in kept
    assert 4 not in kept  # near-dup of 1 at 0.5 threshold


def test_minhash_signature_column_matches_agg_path(spark, docs):
    expr = docs.select("doc_id", DD.minhash_signature(F.col("text"), 16, 3).alias("s"))
    agg = DD.minhash_signatures(docs, num_hashes=16)
    a = {r.doc_id: r.s for r in expr.collect()}
    b = {r["__id"]: r["__sig"] for r in agg.collect()}
    assert a == b


@pytest.mark.slow
def test_simhash_dedup(docs):
    kept = sorted(r.doc_id for r in DD.simhash_dedup(docs).collect())
    assert 1 in kept and 2 not in kept  # identical text → identical simhash


def test_blob_externalize_fetch_clean(spark, tmp_path):
    """Content-addressed blob store: externalize → slim descriptors,
    fetch → identical bytes, duplicate payloads dedupe to one object,
    clean_blobs removes exactly the unreferenced objects."""
    import os

    from flink_table_store_spark.datapipe import blobstore as BS

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(1, b"hello"), (2, b"world!"), (3, b"hello"), (4, None)],
        "id bigint, payload binary",
    )
    ext = BS.externalize_blobs(df, root, "payload")
    rows = {r.id: r.blob for r in ext.collect()}
    assert rows[4] is None
    assert rows[1].uri == rows[3].uri  # content-addressed dedup
    assert rows[2].length == 6
    # only 2 distinct objects on disk
    n_objs = sum(len(fs) for _p, _d, fs in os.walk(os.path.join(root, "blob")))
    assert n_objs == 2

    fetched = {r.id: r.payload for r in BS.fetch_blobs(ext, root).collect()}
    assert bytes(fetched[1]) == b"hello" and bytes(fetched[2]) == b"world!"
    assert fetched[4] is None

    # drop row 2's reference; its object becomes an orphan
    kept = ext.where("id <> 2")
    orphans = BS.clean_blobs(spark, root, kept)
    assert len(orphans) == 1 and orphans[0] == rows[2].uri
    assert {bytes(r.payload) for r in BS.fetch_blobs(kept, root).collect() if r.payload is not None} == {b"hello"}


def test_simhash_banded_hamming_tolerance(spark):
    """Signature-level check of the banded hamming LSH: any pair within
    hamming ≤ 3 MUST be found (pigeonhole over 4 bands makes candidate
    generation exact), distant pairs must not."""
    base = 0x0123456789ABCDEF
    rows = [
        (1, base),
        (2, base ^ 0b111),  # hamming 3 — must be caught
        (3, base ^ ((1 << 5) | (1 << 20) | (1 << 40))),  # 3 bits across bands
        (4, base ^ ((1 << 1) | (1 << 17) | (1 << 33) | (1 << 49))),  # hamming 4
        (5, ~base),  # hamming 64 — far
    ]
    sig = spark.createDataFrame(
        [(i, (s if s < 2**63 else s - 2**64)) for i, s in rows],
        "__id bigint, __sh bigint",
    )
    pairs = {
        (r.id_a, r.id_b) for r in DD.simhash_candidate_pairs(sig, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert all(p not in pairs for p in [(1, 4), (1, 5), (2, 4)])
    # radius beyond the pigeonhole guarantee is refused, not silently lossy
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bands"):
        DD.simhash_candidate_pairs(sig, bands=4, max_hamming=4)


def test_ngram_jaccard_pairs(spark, docs):
    pairs = spark.createDataFrame([(1, 4)], "id_a bigint, id_b bigint")
    out = DD.ngram_jaccard_pairs(docs, pairs, k=1, threshold=0.5).collect()
    assert len(out) == 1 and out[0].jaccard > 0.7


def test_brute_force_topk(spark):
    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)],
        "vec_id bigint, embedding array<double>",
    )
    q = emb.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = SIM.brute_force_topk(emb, q, k=2).collect()
    assert got[0].vec_id == 0 and abs(got[0].cosine - 1.0) < 1e-9
    assert got[0].rank == 1 and len(got) == 2


def test_lsh_topk_recalls_identical_vector(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0, float(i % 3)]) for i in range(50)],
        "vec_id bigint, embedding array<double>",
    )
    q = emb.where("vec_id = 7").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = SIM.lsh_topk(emb, q, k=5, bits=4).collect()
    assert got[0].vec_id == 7 and got[0].rank == 1


def test_text_stats(spark):
    df = spark.createDataFrame([(1, "Hello, world! It's 42.")], "doc_id bigint, text string")
    [r] = df.select(
        TX.token_count("text").alias("ws"),
        TX.bpe_token_count("text").alias("bpe"),
        TX.lang_id("text").alias("lang"),
    ).collect()
    assert r.ws == 4
    # hello , world ! it's 42 .  → contraction stays one token
    assert r.bpe == 7
    assert r.lang == "und"  # too short for stopword hits


def test_lang_id(docs):
    got = {r.doc_id: r.lang for r in docs.select("doc_id", TX.lang_id("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[6] == "de"


def test_quality_score_range(docs):
    scores = [r.q for r in docs.select(TX.quality_score("text").alias("q")).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_multimodal_metadata(spark):
    payload = b"\x89PNG\r\n\x1a\nrest-of-fake-png"
    df = spark.createDataFrame([(1, payload)], "doc_id bigint, payload binary")
    [r] = MM.extract_image_metadata(df).collect()
    assert r.n_bytes == len(payload)
    assert r.sha256 == hashlib.sha256(payload).hexdigest()
    assert r.format == "png"


def test_multimodal_decode_is_stubbed(spark):
    df = spark.createDataFrame([(1, b"xx")], "doc_id bigint, payload binary")
    out = MM.extract_image_metadata(df).collect()
    assert out[0].format == "unknown"


@pytest.mark.slow
def test_ivf_topk_recall(spark):
    import random

    random.seed(7)
    emb = spark.createDataFrame(
        [(i, [random.gauss(0, 1) for _ in range(8)]) for i in range(200)],
        "vec_id bigint, embedding array<double>",
    )
    q = emb.where("vec_id IN (3, 77)").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = SIM.brute_force_topk(emb, q, k=1).collect()
    approx = SIM.ivf_topk(emb, q, k=1, n_cells=8, nprobe=2).collect()
    # the identical vector must be its own top-1 in both
    assert {(r.query_id, r.vec_id) for r in exact} == {(3, 3), (77, 77)}
    assert {(r.query_id, r.vec_id) for r in approx} == {(3, 3), (77, 77)}


@pytest.mark.slow
def test_ivf_static_centroids_deterministic(spark):
    emb = spark.createDataFrame(
        [(i, [float(i % 4), float((i // 4) % 4)]) for i in range(64)],
        "vec_id bigint, embedding array<double>",
    )
    cents = [[0.0, 0.0], [3.0, 0.0], [0.0, 3.0], [3.0, 3.0]]
    q = emb.where("vec_id = 5").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = SIM.ivf_topk(emb, q, k=3, centroids=cents, nprobe=4).collect()
    assert got[0].rank == 1 and abs(got[0].cosine - 1.0) < 1e-9


@pytest.mark.slow
def test_text_index_bm25_search(spark, warehouse):
    """Inverted index + BM25: build, bucket-pruned search, rebuild on
    new data, deterministic ranking."""
    import os

    import pytest

    from flink_table_store_spark.datapipe.textindex import (
        create_text_index,
        text_search,
        tokenize_query,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark table scan join"),
            (2, "join join join filter"),
            (3, "window aggregate sort"),
            (4, "join scan"),
        ],
        "doc_id bigint, body string",
    )
    t = warehouse.create_table("db.fts", docs.schema)
    t.write(docs)
    t = t.refresh()
    meta = create_text_index(spark, t, "idx", "body", "doc_id", n_buckets=8)
    assert meta["n_docs"] == 4 and meta["avgdl"] > 0

    got = text_search(spark, t, "idx", "join", k=3).collect()
    # doc 2 has the highest tf for 'join' → best BM25 score
    assert got[0].doc_id == 2
    assert {r.doc_id for r in got} <= {1, 2, 4}
    # scores are monotonically non-increasing
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)

    # the posting scan only touches the query terms' buckets
    assert tokenize_query("Join, SCAN!") == ["join", "scan"]
    with pytest.raises(ValueError):
        text_search(spark, t, "idx", "!!!")

    # a term absent from the corpus matches nothing
    assert text_search(spark, t, "idx", "zzzmissing", k=3).count() == 0

    # rebuild after new data picks up the new doc
    t.write(spark.createDataFrame([(5, "sort sort sort")], "doc_id bigint, body string"))
    t = t.refresh()
    create_text_index(spark, t, "idx", "body", "doc_id", n_buckets=8)
    got2 = text_search(spark, t, "idx", "sort", k=2).collect()
    assert got2[0].doc_id == 5


def test_gopher_metrics_edges(spark):
    from flink_table_store_spark.datapipe.text import gopher_metrics

    docs = spark.createDataFrame(
        [
            (1, "one"),  # single word: no 2-grams, no crash
            (2, "the the the the the the"),  # fully repeated
            (3, "a quick brown fox jumps over the lazy dog today"),
            (4, "# # # # #"),  # all symbols
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in gopher_metrics(docs).collect()}
    assert rows[1].n_words == 1 and rows[1].dup_2gram_frac == 0.0
    assert not rows[1].gopher_keep  # too short
    assert rows[2].dup_2gram_frac == 0.8  # 5 2-grams, 1 distinct
    assert rows[2].frac_distinct_words == round(1 / 6, 4)
    assert not rows[2].gopher_keep  # repetition rule
    assert rows[3].gopher_keep
    assert rows[4].frac_alpha_words == 0.0 and not rows[4].gopher_keep


@pytest.mark.slow
def test_contamination_counts(spark):
    from flink_table_store_spark.datapipe.text import (
        contamination_counts,
        word_ngrams,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "xx alpha beta gamma delta epsilon zeta eta yy"),
            (3, "nothing in common here at all whatsoever today"),
        ],
        "doc_id bigint, text string",
    )
    probes = (
        docs.where(F.col("doc_id") == 1)
        .select(F.explode(word_ngrams("text", 7)).alias("probe"))
        .distinct()
    )
    got = {
        r.probe: r.n_docs
        for r in contamination_counts(docs.where(F.col("doc_id") != 1), probes).collect()
    }
    # doc 1 yields two 7-grams; the first also appears inside doc 2
    assert got == {
        "alpha beta gamma delta epsilon zeta eta": 1,
        "beta gamma delta epsilon zeta eta theta": 0,
    }


@pytest.mark.slow
def test_connected_components(spark):
    """Min-label components over the pair graph: chains, stars,
    singleton edges, duplicate/reversed pairs."""
    from flink_table_store_spark.datapipe.dedup import connected_components

    pairs = spark.createDataFrame(
        [(5, 9), (9, 2), (2, 7), (11, 12), (20, 21), (21, 20), (30, 31)],
        "id_a bigint, id_b bigint",
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {
        5: 2, 9: 2, 2: 2, 7: 2,          # 4-chain collapses to its min
        11: 11, 12: 11,
        20: 20, 21: 20,                   # reversed duplicate pair
        30: 30, 31: 30,
    }
    # long chain: still converges (diameter rounds)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a bigint, id_b bigint"
    )
    got = {r.node: r.component for r in connected_components(chain).collect()}
    assert set(got.values()) == {0} and len(got) == 13
    # non-convergence guard
    import pytest as _pt

    with _pt.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iter=2)


@pytest.mark.slow
def test_minhash_dedup_cc_transitive_vs_one_hop(spark):
    """A 4-chain (similar only adjacently) with ids permuted 1,3,0,2
    along the chain: one-hop dedup keeps TWO docs (1 sees only the
    larger 3; 0 sees only larger neighbors), transitive CC keeps one."""
    from flink_table_store_spark.datapipe.dedup import minhash_dedup, minhash_dedup_cc

    words = [f"w{i}" for i in range(52)]
    mk = lambda lo: " ".join(words[lo : lo + 40])
    # chain positions 0..3 get ids 1,3,0,2 — adjacent J = 36/44 >= 0.8,
    # skip pairs <= 32/48 < 0.8
    docs = spark.createDataFrame(
        [(1, mk(0)), (3, mk(4)), (0, mk(8)), (2, mk(12)), (50, "totally different " * 30)],
        "doc_id bigint, text string",
    )
    one_hop = sorted(r.doc_id for r in minhash_dedup(docs, shingle_k=1).collect())
    cc = sorted(r.doc_id for r in minhash_dedup_cc(docs, shingle_k=1).collect())
    assert one_hop == [0, 1, 50], "star clustering keeps two chain survivors"
    assert cc == [0, 50], "transitive clustering keeps one per component"


@pytest.mark.slow
def test_embedding_dedup_cc(spark):
    """Cosine chain v0~v1~v2 (adjacent above threshold, ends below):
    transitive clustering keeps one representative + the outlier."""
    import math

    from flink_table_store_spark.datapipe.dedup import embedding_dedup_cc

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    # adjacent cos(0.25) ≈ 0.969 ≥ 0.95; ends cos(0.5) ≈ 0.878 < 0.95
    emb = spark.createDataFrame(
        [
            (1, unit(0.0)),
            (0, unit(0.25)),
            (2, unit(0.5)),
            (9, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    kept = sorted(r.vec_id for r in embedding_dedup_cc(emb, threshold=0.95).collect())
    assert kept == [0, 9]


# --- round 7: repeated-substring spans, chunking, PII, sampling ----------


def _span_docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),
            (2, "x y a b c d e f g h q r"),
            (3, "p q a b c d e f g h z w"),
            (4, "unique tokens only here nothing shared at all"),
            (5, "short"),
        ],
        "doc_id bigint, text string",
    )


def test_repeated_gram_stats_hash_text_parity(spark):
    from flink_table_store_spark.datapipe.substring import repeated_gram_stats

    docs = _span_docs(spark)
    a = sorted(
        map(tuple, repeated_gram_stats(docs, width=8, key="text").collect())
    )
    b = sorted(
        map(tuple, repeated_gram_stats(docs, width=8, key="hash").collect())
    )
    assert a == b
    by_id = {r[0]: r[1] for r in a}
    # docs 1-3 share the 8-gram "a b c d e f g h"; 4 has none; 5 too short
    assert by_id == {1: 1, 2: 1, 3: 1, 4: 0}


def test_strip_repeated_spans_keep_first_property(spark):
    """After keep-first stripping, re-running detection finds ZERO
    repeated grams — exactly one copy of every repeated passage
    survives (Lee et al.'s remove-all-but-one)."""
    from flink_table_store_spark.datapipe.substring import (
        repeated_gram_stats,
        strip_repeated_spans,
    )

    docs = _span_docs(spark)
    stripped = strip_repeated_spans(docs, width=8, key="hash")
    out = {r.doc_id: r.text for r in stripped.collect()}
    # globally-first occurrence (min (doc_id, pos)) is doc 1's copy
    assert out[1] == "a b c d e f g h i j k l"
    assert out[2] == "x y q r"
    assert out[5] == "short"
    again = repeated_gram_stats(
        spark.createDataFrame(list(out.items()), "doc_id bigint, text string"),
        width=8,
        key="hash",
    )
    assert again.agg(F.sum("n_repeated")).first()[0] == 0


def test_repeated_spans_merge_overlapping(spark):
    """Consecutive repeated windows merge into ONE maximal span."""
    from flink_table_store_spark.datapipe.substring import repeated_spans

    base = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"  # 10 tokens -> 3 8-grams
    docs = spark.createDataFrame(
        [(1, base + " tailA only one"), (2, "lead B " + base)],
        "doc_id bigint, text string",
    )
    spans = {
        r.doc_id: [(s.s, s.e) for s in r.spans]
        for r in repeated_spans(docs, width=8, key="hash").collect()
    }
    # doc 2's copy starts at token 2; windows 2,3,4 merge to [2, 12)
    assert spans == {2: [(2, 12)]}


def test_chunk_documents_coverage(spark):
    from flink_table_store_spark.datapipe.text import chunk_documents

    n_tok = 150
    text = " ".join(f"w{i}" for i in range(n_tok))
    docs = spark.createDataFrame(
        [(1, text), (2, "a b c"), (3, "")], "doc_id bigint, text string"
    )
    rows = chunk_documents(docs, max_tokens=64, overlap=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: stride 56 -> ceil((150-64)/56)+1 = 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_idx for r in c1] == [0, 1, 2]
    assert [r.n_tokens for r in c1] == [64, 64, 150 - 2 * 56]
    # overlap: chunk i starts at 56*i; chunk text matches the source
    for i, r in enumerate(c1):
        assert r.text.split(" ") == [f"w{j}" for j in range(56 * i, min(56 * i + 64, n_tok))]
    # short + empty docs: one chunk each
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 3
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_tokens == 0


def test_redact_pii(spark):
    from flink_table_store_spark.datapipe.text import pii_counts, redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io now"),
            (2, "server 192.168.0.1 port 80 build 1234567"),
            (3, "call 555-123-4567 or +4915112345678 ok"),
            (4, "clean text with numbers 3.14 and v1.2.3.4.5"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: (r.red, r.n_emails, r.n_ips, r.n_phones)
        for r in docs.select(
            "doc_id", redact_pii("text").alias("red"), *pii_counts("text")
        ).collect()
    }
    assert out[1] == ("mail <EMAIL> now", 1, 0, 0)
    assert out[2] == ("server <IP> port 80 build 1234567", 0, 1, 0)
    assert out[3] == ("call <PHONE> or <PHONE> ok", 0, 0, 2)
    # 3.14 is not an IP; 1.2.3.4.5 contains an IP-shaped prefix that the
    # word boundary rejects (trailing .5 keeps \b from matching cleanly)
    assert out[4][1] == 0 and out[4][3] == 0


@pytest.mark.slow
def test_stratified_sample_exact_and_portable(spark):
    from flink_table_store_spark.datapipe.sampling import (
        hash_fraction_sample,
        stratified_sample,
    )

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    fast = stratified_sample(df, "lang", 7, key_col="doc_id", seed=3)
    slow = stratified_sample(
        df, "lang", 7, key_col="doc_id", seed=3, prefilter=False
    )
    a = sorted((r.lang, r.doc_id) for r in fast.collect())
    b = sorted((r.lang, r.doc_id) for r in slow.collect())
    assert a == b
    from collections import Counter

    assert Counter(x[0] for x in a) == {"en": 7, "de": 7, "fr": 7}
    # n > stratum size: whole stratum returned, no dupes
    tiny = spark.createDataFrame(rows[:5], "doc_id bigint, lang string")
    got = stratified_sample(tiny, "lang", 99, key_col="doc_id").collect()
    assert len(got) == 5
    # deterministic fraction sampling: same seed -> same rows
    f1 = sorted(r.doc_id for r in hash_fraction_sample(df, 0.25, seed=5).collect())
    f2 = sorted(r.doc_id for r in hash_fraction_sample(df, 0.25, seed=5).collect())
    assert f1 == f2 and 0 < len(f1) < 300


def test_stratified_sample_prefilter_fallback(spark):
    """A too-tight oversample must fall back to the exact full sort,
    not return short strata."""
    from flink_table_store_spark.datapipe.sampling import stratified_sample

    rows = [(i, "xx") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = stratified_sample(
        df, "lang", 50, key_col="doc_id", seed=1, safety=0.01
    )
    exact = stratified_sample(
        df, "lang", 50, key_col="doc_id", seed=1, prefilter=False
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in exact.collect()
    )


def test_resample_to_mix(spark):
    """Target token shares are hit in expectation; output deterministic;
    oversized repeat factors refuse loudly."""
    from flink_table_store_spark.datapipe.sampling import resample_to_mix

    rows = [
        (i, "web" if i < 600 else ("code" if i < 900 else "acad"), 100)
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, domain string, n_tokens bigint")
    out = resample_to_mix(
        df, "domain", {"web": 0.4, "code": 0.4, "acad": 0.2}, "n_tokens"
    )
    got = {r[0]: r[1] for r in out.groupBy("domain").agg(F.sum("n_tokens")).collect()}
    tot = sum(got.values())
    assert abs(got["web"] / tot - 0.4) < 0.02
    assert abs(got["code"] / tot - 0.4) < 0.02
    assert abs(got["acad"] / tot - 0.2) < 0.02
    # deterministic across runs; copy ids are 0..k-1 per doc
    again = resample_to_mix(
        df, "domain", {"web": 0.4, "code": 0.4, "acad": 0.2}, "n_tokens"
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # a domain absent from weights is dropped
    assert (
        resample_to_mix(df, "domain", {"web": 1.0}, "n_tokens")
        .where(F.col("domain") != "web")
        .count()
        == 0
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_repeat"):
        resample_to_mix(
            df, "domain", {"acad": 1.0}, "n_tokens", max_repeat=5
        )


def test_resample_to_mix_null_domain_dropped(spark):
    """Rows with a NULL domain match no when-branch; the chain base must
    be 0.0 so they are dropped, not handed the first domain's factor
    (round-7 advisory)."""
    from flink_table_store_spark.datapipe.sampling import resample_to_mix

    rows = [(i, "web" if i < 20 else None, 100) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id bigint, domain string, n_tokens bigint")
    out = resample_to_mix(df, "domain", {"web": 1.0}, "n_tokens")
    assert out.where(F.col("domain").isNull()).count() == 0
    assert out.where(F.col("domain") == "web").count() > 0


def test_stratified_sample_zero_candidate_stratum(spark):
    """A stratum whose prefilter yields ZERO candidates (duplicate key
    values hashing above the bound) must take the full-sort fallback,
    not silently vanish (round-7 advisory)."""
    from flink_table_store_spark.datapipe.sampling import stratified_sample

    # stratum 'b': 400 rows sharing ONE key value -> one distinct hash;
    # with safety=0.01 the bound is ~5e-5 of hash space, so w.h.p. that
    # single hash misses the candidate filter entirely
    rows = [(i, "a") for i in range(400)] + [(777, "b")] * 400
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = stratified_sample(
        df, "lang", 5, key_col="doc_id", seed=11, safety=0.01
    )
    from collections import Counter

    cnt = Counter(r.lang for r in out.collect())
    assert cnt["a"] == 5 and cnt["b"] == 5, cnt


@pytest.mark.slow
def test_connected_components_star(spark):
    """Large/small-star CC (Kiveris et al.): same components as label
    propagation, but round count scales with log n, not diameter."""
    import random

    from flink_table_store_spark.datapipe.dedup import (
        connected_components,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(5, 9), (9, 2), (2, 7), (11, 12), (20, 21), (21, 20), (30, 31)],
        "id_a bigint, id_b bigint",
    )
    got = {r.node: r.component for r in connected_components_star(pairs).collect()}
    assert got == {
        5: 2, 9: 2, 2: 2, 7: 2,
        11: 11, 12: 11,
        20: 20, 21: 20,
        30: 30, 31: 30,
    }
    # adversarial long chain (the case the star algorithm exists for):
    # diameter 60 with ids permuted so min labels must travel the whole
    # chain; label propagation at max_iter=8 fails, star converges
    random.seed(3)
    ids = list(range(61))
    random.shuffle(ids)
    chain = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(60)], "id_a bigint, id_b bigint"
    )
    import pytest as _pt

    with _pt.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iter=8)
    got = {
        r.node: r.component
        for r in connected_components_star(chain, max_iter=8).collect()
    }
    assert set(got.values()) == {0} and len(got) == 61

    # random graph equivalence sweep
    random.seed(17)
    edges = [
        (random.randrange(200), random.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    a = {r.node: r.component for r in connected_components(df).collect()}
    b = {r.node: r.component for r in connected_components_star(df).collect()}
    assert a == b


@pytest.mark.slow
def test_dedup_cc_star_algorithm_parity(spark):
    """minhash_dedup_cc(algorithm='star') keeps the same survivors as
    the default label-propagation path."""
    from flink_table_store_spark.datapipe.dedup import minhash_dedup_cc

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight")
    rows = []
    for i in range(12):
        words = base.split()
        words[i % len(words)] = f"tok{i % 3}"
        rows.append((i, " ".join(words)))
    rows += [(100 + i, f"utterly unique document number {i} with its own "
              f"content shape {i * 7}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    lab = sorted(r.doc_id for r in minhash_dedup_cc(df, jaccard_threshold=0.7).collect())
    star = sorted(
        r.doc_id
        for r in minhash_dedup_cc(df, jaccard_threshold=0.7, algorithm="star").collect()
    )
    assert lab == star


@pytest.mark.slow
def test_semantic_dedup(spark):
    """SemDeDup: k-means cells bound the pairwise work; within-cell
    near-dups collapse transitively to one survivor per cluster."""
    import math
    import random

    from flink_table_store_spark.datapipe.dedup import (
        embedding_dedup_cc,
        semantic_dedup,
    )

    random.seed(5)
    dim = 8

    def jitter(base, eps):
        v = [x + random.uniform(-eps, eps) for x in base]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # 4 well-separated anchor directions, each with a 5-member near-dup
    # cluster plus 3 singletons nearby-but-distinct
    anchors = []
    for i in range(4):
        base = [0.0] * dim
        base[i * 2] = 1.0
        base[i * 2 + 1] = 0.35
        anchors.append(base)
    rows = []
    vid = 0
    expect_survivors = set()
    for a in anchors:
        expect_survivors.add(vid)
        for _ in range(5):
            rows.append((vid, jitter(a, 0.002)))  # cos ~ 0.99998
            vid += 1
        for _ in range(3):
            rows.append((vid, jitter(a, 0.25)))   # distinct, same cell
            expect_survivors.add(vid)
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = semantic_dedup(emb, n_cells=4, threshold=0.999, seed=7)
    got = sorted(r.vec_id for r in out.collect())
    # every 5-member dup cluster keeps exactly its min id; singletons stay
    assert got == sorted(expect_survivors), got
    # parity with the exact (unblocked) transitive dedup on this corpus:
    # clusters are well-separated so cell blocking loses no pairs
    exact = sorted(r.vec_id for r in embedding_dedup_cc(
        emb, threshold=0.999).collect())
    assert got == exact
    # star solver reaches the same survivors
    star = sorted(r.vec_id for r in semantic_dedup(
        emb, n_cells=4, threshold=0.999, seed=7, algorithm="star").collect())
    assert star == got


@pytest.mark.slow
def test_bigram_lm_perplexity(spark):
    """Self-scored corpus perplexity: fluent/repetitive docs score low,
    out-of-distribution gibberish high; short docs get NULL."""
    from flink_table_store_spark.datapipe.lm import (
        score_perplexity,
        train_bigram_lm,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, fluent) for i in range(8)]
    rows.append((100, "zqx vbn wrt kjh plm qaz xsw cde vfr bgt"))
    rows.append((101, "mat"))  # single token: no bigrams
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: (r.n_bigrams, r.perplexity)
           for r in score_perplexity(df).collect()}
    assert out[101] == (0, None)
    assert out[0][1] is not None and out[100][1] is not None
    # all fluent docs share one score; gibberish is far worse
    assert len({out[i][1] for i in range(8)}) == 1
    assert out[100][1] > 2 * out[0][1]
    # explicit reference model: score new docs against a trained slice
    model = train_bigram_lm(df.where(F.col("doc_id") < 8))
    probe = spark.createDataFrame(
        [(1, "the cat sat on the rug"), (2, "rug the on sat cat the")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.perplexity for r in score_perplexity(probe, model).collect()}
    assert got[1] < got[2]  # word order matters to a bigram model
    # deterministic
    again = {r.doc_id: (r.n_bigrams, r.perplexity)
             for r in score_perplexity(df).collect()}
    assert again == out


def test_paragraph_dedup_first_occurrence(spark):
    from flink_table_store_spark.datapipe.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "intro text\n\nshared boilerplate\n\nunique one"),
            (2, "shared boilerplate\n\nunique two"),
            (3, "shared boilerplate"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: (r.text, r.paras_kept) for r in paragraph_dedup(docs).collect()}
    # doc 1 owns the first occurrence; later copies vanish
    assert out[1] == ("intro text\n\nshared boilerplate\n\nunique one", 3)
    assert out[2] == ("unique two", 1)
    assert 3 not in out  # entirely duplicate document drops out


def test_paragraph_dedup_within_doc_and_order(spark):
    from flink_table_store_spark.datapipe.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "a\n\nb\n\na\n\nc")], "doc_id bigint, text string"
    )
    [r] = paragraph_dedup(docs).collect()
    # the repeated paragraph inside one doc keeps only its first slot,
    # order preserved
    assert r.text == "a\n\nb\n\nc"


def test_paragraph_dedup_word_windows(spark):
    from flink_table_store_spark.datapipe.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4"),
            (2, "w1 w2 w3 w4 x1 x2 x3 x4"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.text for r in
           paragraph_dedup(docs, sep=None, words_per_para=4).collect()}
    assert out[1] == "w1 w2 w3 w4"
    assert out[2] == "x1 x2 x3 x4"  # its first window was doc 1's


@pytest.mark.slow
def test_mine_hard_negatives(spark):
    """Golds are excluded, ranks stay dense, and every query still
    yields k negatives even when its golds occupy the top ranks."""
    from flink_table_store_spark.datapipe.similarity import (
        brute_force_topk,
        mine_hard_negatives,
    )

    emb = spark.createDataFrame(
        [(i, [float(i == j or j == 3) for j in range(4)]) for i in range(8)],
        "vec_id bigint, embedding array<double>",
    )
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    # gold = the query itself (always cosine 1.0 = rank 1) + one more
    gold = spark.createDataFrame(
        [(0, 0), (0, 3), (1, 1)], "query_id bigint, vec_id bigint"
    )
    out = mine_hard_negatives(emb, queries, gold, k=3)
    rows = {(r.query_id, r.rank): r.vec_id for r in out.collect()}
    got_q0 = [rows[(0, r)] for r in (1, 2, 3)]
    assert 0 not in got_q0 and 3 not in got_q0 and len(got_q0) == 3
    got_q1 = [rows[(1, r)] for r in (1, 2, 3)]
    assert 1 not in got_q1
    # parity with brute-force minus golds, re-ranked
    brute = brute_force_topk(emb, queries, k=8).collect()
    want_q0 = [
        r.vec_id
        for r in sorted(
            (r for r in brute if r.query_id == 0 and r.vec_id not in (0, 3)),
            key=lambda r: r.rank,
        )
    ][:3]
    assert got_q0 == want_q0
    import pytest as _p

    with _p.raises(ValueError, match="k must be positive"):
        mine_hard_negatives(emb, queries, gold, k=0)
    # empty gold degrades to plain top-k
    none = gold.limit(0)
    plain = mine_hard_negatives(emb, queries, none, k=3).collect()
    top3 = [r for r in brute if r.rank <= 3]
    assert {(r.query_id, r.vec_id, r.rank) for r in plain} == {
        (r.query_id, r.vec_id, r.rank) for r in top3
    }


def test_sentence_span_dedup(spark):
    """C4 three-sentence-span global dedup: first occurrence wins,
    covered sentences vanish from later docs, short docs untouched,
    broken spans untouched, fully-covered and NULL docs drop out."""
    BOILER = "spark is fast. data is big. tables are stored."
    rows = [
        (1, "unique alpha one. " + BOILER + " unique alpha two."),
        (2, "totally different start. " + BOILER),
        (3, BOILER),
        (4, "short doc. two sentences only."),
        (5, None),
        (6, "spark is fast. data is big. broken here. tables are stored."),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: (r.text, r.sentences_kept)
        for r in DD.sentence_span_dedup(df).collect()
    }
    assert out[1] == (
        "unique alpha one. spark is fast. data is big. tables are stored."
        " unique alpha two.",
        5,
    )
    assert out[2] == ("totally different start.", 1)
    assert 3 not in out and 5 not in out
    assert out[4] == ("short doc. two sentences only.", 2)
    assert out[6][1] == 4  # no 3-run repeats: untouched
    # overlapping duplicated windows: 4 identical sentences in a row
    # cover positions 0..3 in the loser via two overlapping windows
    four = "a one. b two. c three. d four."
    df2 = spark.createDataFrame(
        [(1, four), (2, four + " own tail here.")],
        "doc_id bigint, text string",
    )
    out2 = {r.doc_id: r for r in DD.sentence_span_dedup(df2).collect()}
    assert out2[1]["sentences_kept"] == 4
    assert out2[2]["text"] == "own tail here."
    import pytest as _p

    with _p.raises(ValueError, match="span"):
        DD.sentence_span_dedup(df, span=1)


def test_ngram_containment_pairs(spark):
    """Asymmetric containment: a short doc embedded in a long one
    scores ~1 in one direction (and low Jaccard); unrelated pairs are
    filtered; sub-k docs never divide by zero."""
    long = "one two three four five six seven eight nine ten"
    rows = [
        (1, long),
        (2, "three four five six"),          # embedded quote
        (3, "alpha beta gamma delta"),        # unrelated
        (4, "zz"),                            # shorter than k
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a bigint, id_b bigint"
    )
    out = {(r.id_a, r.id_b): r for r in DD.ngram_containment_pairs(
        df, pairs, k=3, threshold=0.9).collect()}
    assert (1, 2) in out and out[(1, 2)].containment_b_in_a == 1.0
    assert out[(1, 2)].containment_a_in_b < 0.5
    assert (1, 3) not in out
    assert (1, 4) not in out  # 'zz' one-shingle set, no overlap
    # jaccard alone would have missed the quote at 0.9
    j = DD.ngram_jaccard_pairs(df, pairs, k=3, threshold=0.9).collect()
    assert not any(r.id_a == 1 and r.id_b == 2 for r in j)


def test_semantic_contamination(spark):
    """Embedding-space decontamination: exact argmax probe per corpus
    row, deterministic smallest-pid tie-break, zero-norm vectors never
    match, and the plan stays exchange-free (one broadcast row, no
    groupBy of the corpus)."""
    from flink_table_store_spark.datapipe.similarity import (
        semantic_contamination,
    )

    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),       # == probe 1 and probe 2 (tie) -> pid 1
            (11, [0.0, 1.0]),       # == probe 3
            (12, [0.7, 0.7]),       # cos ~0.707 to several, below 0.9
            (13, [0.0, 0.0]),       # zero norm: cosine undefined, never kept
        ],
        "vec_id bigint, embedding array<double>",
    )
    probes = spark.createDataFrame(
        [
            (2, [2.0, 0.0]),   # same direction as probe 1 — exercises tie
            (1, [1.0, 0.0]),
            (3, [0.0, 5.0]),
        ],
        "probe_id bigint, probe_vec array<double>",
    )
    got = semantic_contamination(corpus, probes, threshold=0.9)
    rows = {r["vec_id"]: (r["probe_id"], r["cosine"]) for r in got.collect()}
    assert rows == {10: (1, 1.0), 11: (3, 1.0)}
    # no exchange of the CORPUS: broadcast NLJ + narrow fold only (the
    # probe side legitimately collapses via one SinglePartition agg)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


@pytest.mark.slow
def test_perplexity_buckets_exact_and_thresholds(spark):
    """CCNet bucketing: exact (keyed ntile) mode splits per language
    into equal-frequency thirds; thresholds mode (fit on the same
    corpus) reproduces the assignment everywhere except exact
    cut-point ties, which ntile may split arbitrarily; <2-token docs
    get NULL bucket; unknown languages get NULL bucket in thresholds
    mode."""
    from flink_table_store_spark.datapipe.lm import (
        fit_perplexity_thresholds,
        perplexity_buckets,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang")
    exact = perplexity_buckets(docs)
    rows = exact.collect()
    assert {r["ppl_bucket"] for r in rows if r["perplexity"] is not None} == {
        "head", "middle", "tail"
    }
    # equal-frequency within each lang: bucket sizes differ by <= 1
    from collections import Counter

    per_lang = {}
    for r in rows:
        if r["perplexity"] is not None:
            per_lang.setdefault(r["lang"], Counter())[r["ppl_bucket"]] += 1
    for lang, c in per_lang.items():
        assert max(c.values()) - min(c.values()) <= 1, (lang, c)
    # head holds the LOWEST perplexities per lang
    for lang in per_lang:
        lp = [r for r in rows if r["lang"] == lang and r["perplexity"] is not None]
        h = max(r["perplexity"] for r in lp if r["ppl_bucket"] == "head")
        t = min(r["perplexity"] for r in lp if r["ppl_bucket"] == "tail")
        assert h <= t

    thr = fit_perplexity_thresholds(docs)
    assert set(thr) == set(per_lang) and all(len(v) == 2 for v in thr.values())
    assigned = perplexity_buckets(docs, thresholds=thr)
    cuts = {c for v in thr.values() for c in v}
    e = {r["doc_id"]: r["ppl_bucket"] for r in rows
         if r["perplexity"] is not None and r["perplexity"] not in cuts}
    a = {r["doc_id"]: r["ppl_bucket"] for r in assigned.collect()
         if r["perplexity"] is not None and r["perplexity"] not in cuts}
    assert e == a

    # NULL-perplexity and unknown-lang behavior
    tiny = spark.createDataFrame(
        [(1, "word", "en"), (2, "alpha beta gamma", "xx")],
        "doc_id bigint, text string, lang string",
    )
    got = {r["doc_id"]: r["ppl_bucket"]
           for r in perplexity_buckets(tiny, thresholds=thr).collect()}
    assert got[1] is None     # <2 tokens -> NULL perplexity -> NULL bucket
    assert got[2] is None     # lang missing from thresholds -> NULL bucket


@pytest.mark.slow
def test_pca_fit_project_whiten(spark):
    """Distributed PCA: builtin and arrow covariance paths agree,
    components are orthonormal with descending eigenvalues, projected
    data has diagonal covariance == eigenvalues (identity when
    whitened), and full-rank projection reconstructs the input."""
    import numpy as np

    from flink_table_store_spark.datapipe.embeddings import (
        embedding_covariance,
        fit_pca,
        project_embeddings,
    )

    rng = np.random.default_rng(11)
    # anisotropic data: correlated 6-dim gaussian
    a = rng.normal(size=(6, 6))
    x = rng.normal(size=(400, 6)) @ a + rng.normal(size=6) * 3
    emb = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id bigint, embedding array<double>",
    )
    n_b, m_b, c_b = embedding_covariance(emb, method="builtin")
    n_a, m_a, c_a = embedding_covariance(emb, method="arrow")
    assert n_b == n_a == 400
    assert np.allclose(m_b, m_a) and np.allclose(c_b, c_a)
    assert np.allclose(c_b, np.cov(x, rowvar=False))

    model = fit_pca(emb, k=6)
    comps = np.asarray(model["components"])
    evs = np.asarray(model["explained_variance"])
    assert np.allclose(comps @ comps.T, np.eye(6), atol=1e-9)
    assert all(evs[i] >= evs[i + 1] for i in range(5))
    # sign convention: each component's largest-|coord| positive
    assert all(comps[i][np.abs(comps[i]).argmax()] > 0 for i in range(6))

    proj = project_embeddings(emb, model)
    p = np.asarray(
        [r["pca"] for r in proj.orderBy("vec_id").collect()]
    )
    assert np.allclose(np.cov(p, rowvar=False), np.diag(evs), atol=1e-8)
    # reconstruction: x_centered == p @ comps
    assert np.allclose(p @ comps, x - np.asarray(model["mean"]), atol=1e-8)

    white = project_embeddings(emb, model, whiten=True)
    w = np.asarray([r["pca"] for r in white.orderBy("vec_id").collect()])
    assert np.allclose(np.cov(w, rowvar=False), np.eye(6), atol=1e-4)

    # arrow projection path (the wide-d escape hatch) matches builtin
    pa = np.asarray(
        [r["pca"] for r in project_embeddings(emb, model, method="arrow")
         .orderBy("vec_id").collect()]
    )
    assert np.allclose(pa, p, atol=1e-9)
    wa = np.asarray(
        [r["pca"] for r in project_embeddings(
            emb, model, whiten=True, method="arrow").orderBy("vec_id").collect()]
    )
    assert np.allclose(wa, w, atol=1e-9)

    # truncation keeps the top-k coordinates exactly
    m2 = fit_pca(emb, k=2)
    p2 = np.asarray(
        [r["pca"] for r in project_embeddings(emb, m2).orderBy("vec_id").collect()]
    )
    assert np.allclose(p2, p[:, :2], atol=1e-8)
    # projection plan is a narrow map: no exchange at all
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pr_curve(spark):
    """Hand-checked confusion sweep: 6 scored docs, bins of 0.1."""
    from flink_table_store_spark.datapipe.quality_model import pr_curve

    scored = spark.createDataFrame(
        [
            (1, 0.95, 1), (2, 0.95, 0), (3, 0.70, 1),
            (4, 0.40, 0), (5, 0.10, 1), (6, None, 1), (7, 0.2, None),
        ],
        "doc_id bigint, quality_score double, label int",
    )
    got = {r["threshold"]: r for r in pr_curve(scored, n_bins=10).collect()}
    assert set(got) == {0.9, 0.7, 0.4, 0.1}  # nonempty bins only
    top = got[0.9]
    assert (top["tp"], top["fp"], top["fn"]) == (1, 1, 2)
    assert top["precision"] == 0.5 and abs(top["recall"] - 0.333333) < 1e-6
    mid = got[0.4]
    assert (mid["tp"], mid["fp"], mid["fn"]) == (2, 2, 1)
    bot = got[0.1]
    assert (bot["tp"], bot["fp"], bot["fn"]) == (3, 2, 0)
    assert bot["recall"] == 1.0
    # score exactly 1.0 clamps into the top bin, not bin n_bins+1
    one = spark.createDataFrame(
        [(1, 1.0, 1)], "doc_id bigint, quality_score double, label int"
    )
    [r] = pr_curve(one, n_bins=10).collect()
    assert r["threshold"] == 1.0 and r["tp"] == 1


@pytest.mark.slow
def test_binary_hamming_topk(spark):
    """BQ two-stage: the self-vector (hamming 0, cosine 1) is always
    rank 1; a high rerank recovers exact brute-force top-k; signatures
    use all 64 bits (bit 63 via the signed-minimum trick)."""
    from flink_table_store_spark.datapipe.similarity import (
        binary_hamming_topk,
        binary_signature,
        brute_force_topk,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).withColumn("embedding", F.col("embedding").cast("array<double>"))
    q = emb.limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = binary_hamming_topk(emb, q, k=5, rerank=4).collect()
    top = {r["query_id"]: r for r in got if r["rank"] == 1}
    assert all(top[qid]["vec_id"] == qid for qid in top)
    assert all(r["hamming"] == 0 for r in top.values())

    # rerank = corpus size -> candidate pass keeps everything -> exact
    n = emb.count()
    exact = brute_force_topk(emb, q, k=5)
    full = binary_hamming_topk(emb, q, k=5, rerank=n)
    e = {(r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()}
    f = {(r["query_id"], r["rank"]): r["vec_id"] for r in full.collect()}
    assert e == f

    # bit 63: a vector positive in dim 63 and one negative differ there
    two = spark.createDataFrame(
        [(1, [0.0] * 63 + [1.0]), (2, [0.0] * 63 + [-1.0])],
        "vec_id bigint, embedding array<double>",
    )
    sigs = {
        r["vec_id"]: r["s"]
        for r in two.select(
            "vec_id", binary_signature(F.col("embedding")).alias("s")
        ).collect()
    }
    # dim 0..62 of 0.0 are >= 0 -> low 63 bits set in both; bit 63 differs
    assert sigs[1] < 0 and sigs[2] > 0
    assert bin((sigs[1] ^ sigs[2]) & (2**64 - 1)).count("1") == 1


@pytest.mark.slow
def test_perplexity_thresholds_fitter_edge_cases(spark):
    """The fit -> assign round trip survives NULL-lang docs and
    languages with too few scored docs for a full cut-point set: both
    are EXCLUDED from the fitted dict (thresholds mode then assigns
    them NULL bucket), never a crash."""
    from flink_table_store_spark.datapipe.lm import (
        fit_perplexity_thresholds,
        perplexity_buckets,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma delta", "en") for i in range(12)]
        + [(100, "uno dos tres cuatro", "es")]      # single-doc language
        + [(200, "null lang words here", None)],    # NULL lang
        "doc_id bigint, text string, lang string",
    )
    thr = fit_perplexity_thresholds(docs)
    assert set(thr) == {"en"} and len(thr["en"]) == 2
    got = {r["doc_id"]: r["ppl_bucket"]
           for r in perplexity_buckets(docs, thresholds=thr).collect()}
    assert got[100] is None and got[200] is None
    assert all(got[i] is not None for i in range(12))


def test_corpus_diff(spark):
    """Hand-checked diff: duplicates count as docs not fingerprints;
    whitespace/case variants share a fingerprint across corpora."""
    from flink_table_store_spark.datapipe.dedup import corpus_diff

    a = spark.createDataFrame(
        [(1, "alpha beta"), (2, "ALPHA   beta"), (3, "gamma only in a")],
        "doc_id bigint, text string",
    )
    b = spark.createDataFrame(
        [(10, "alpha beta"), (11, "delta only in b"), (12, "delta only in b")],
        "doc_id bigint, text string",
    )
    got = {r["status"]: r for r in corpus_diff(a, b).collect()}
    assert got["common"]["n_fingerprints"] == 1
    assert (got["common"]["n_docs_a"], got["common"]["n_docs_b"]) == (2, 1)
    assert got["only_a"]["n_fingerprints"] == 1 and got["only_a"]["n_docs_b"] == 0
    assert got["only_b"]["n_fingerprints"] == 1 and got["only_b"]["n_docs_b"] == 2


@pytest.mark.slow
def test_sample_weighted_exact(spark):
    """A-ES weighted sampling: deterministic per seed, weight-
    proportional in aggregate (heavy rows selected far more often
    across seeds), NULL/zero/negative weights excluded."""
    from flink_table_store_spark.datapipe.sampling import (
        sample_weighted_exact,
    )

    rows = [(i, 100.0 if i < 20 else 1.0) for i in range(220)]
    rows += [(900, None), (901, 0.0), (902, -5.0)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")

    a = sorted(r["doc_id"] for r in sample_weighted_exact(df, "w", 30).collect())
    b = sorted(r["doc_id"] for r in sample_weighted_exact(df, "w", 30).collect())
    assert a == b and len(a) == 30            # deterministic
    assert not {900, 901, 902} & set(a)        # unweighables excluded

    heavy_hits = 0
    for seed in range(8):
        s = {r["doc_id"] for r in
             sample_weighted_exact(df, "w", 30, seed=seed).collect()}
        heavy_hits += sum(1 for i in s if i < 20)
    # 20 heavy rows at weight 100 vs 200 light at weight 1: heavy mass
    # is ~91%, so >= half of each 30-draw should be heavy w.h.p.
    assert heavy_hits >= 8 * 15, heavy_hits

    # k > population: everything weighable comes back
    assert sample_weighted_exact(df, "w", 1000).count() == 220


def test_decontaminate_exact(spark):
    """Removal half of decontamination: contaminated docs drop, clean
    and NULL-text docs survive, NULL probes are ignored, and the plan
    is a broadcast anti join (no corpus exchange)."""
    from flink_table_store_spark.datapipe.text import decontaminate_exact

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "a clean document"),
         (3, "contains the quick brown fox too"), (4, None)],
        "doc_id bigint, text string",
    )
    probes = spark.createDataFrame(
        [("quick brown fox",), (None,)], "probe string"
    )
    out = decontaminate_exact(docs, probes)
    assert sorted(r.doc_id for r in out.collect()) == [2, 4]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan
    # empty probe set: everything survives
    assert decontaminate_exact(
        docs, probes.where("probe IS NULL")
    ).count() == 4
