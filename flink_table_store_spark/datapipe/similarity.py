"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline: broadcast the
query set, compute dot products with ``zip_with``/``aggregate``
(JVM-side), rank with a window. The LSH-bucketed variant (sign-bit
buckets, same trick as dedup.embedding_near_dup_pairs) is the scale
path: each query probes one bucket instead of the full corpus —
mirrors the reference's vector-search table + global index surface
(paimon-core table/VectorSearchTable.java, globalindex/; faiss/lucene
backends) with the index expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector has undefined cosine -> NULL, which
    # sorts last under desc ordering instead of failing the job under ANSI
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine for each query. Queries are broadcast
    (small side); the corpus streams through once — O(|corpus|·|queries|)
    flops but zero corpus shuffle until the final per-query top-k, which
    AQE executes as a partial top-k per partition (window + filter)."""
    q = F.broadcast(queries.select(F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__qv")))
    c = corpus.select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv"))
    scored = q.crossJoin(c).withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__cid").alias(id_col),
            F.round("cosine", 6).alias("cosine"),
            F.col("__rank").alias("rank"),
        )
    )


def signbit_bucket(vec: Column, bits: int) -> Column:
    """LSH bucket id from the sign pattern of the first ``bits`` dims —
    the same packing as ``binary_signature`` (one implementation: the
    general form also handles bit 63, where a shifted long literal
    would overflow)."""
    return binary_signature(vec, bits)


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    max_iter: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """IVF coarse quantizer: k-means centroids via Spark ML (one
    distributed job; deterministic with a fixed seed). At 100 TB you
    train on a sample — k-means quality needs only a sketch of the
    distribution — then assign the full corpus with the static
    centroids below."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    km = KMeans(k=n_cells, maxIter=max_iter, seed=seed)
    model = km.fit(feat)
    return [c.tolist() for c in model.clusterCenters()]


def nearest_cells(vec: Column, centroids: list[list[float]], nprobe: int = 1) -> Column:
    """Ids of the ``nprobe`` nearest centroids — a static unrolled
    arg-sort over literal centroid arrays, fully JVM-side."""
    dists = F.array(
        *[
            F.struct(
                _dot(
                    F.zip_with(vec, F.array(*[F.lit(x) for x in c]), lambda a, b: a - b),
                    F.zip_with(vec, F.array(*[F.lit(x) for x in c]), lambda a, b: a - b),
                ).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(F.transform(F.array_sort(dists), lambda s: s["i"]), 1, nprobe)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 2,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF approximate top-k (the FAISS-style scale path; reference
    surface paimon-faiss faiss/index/*): corpus vectors live in their
    nearest-centroid cell; each query probes its ``nprobe`` nearest
    cells. The join co-locates on the cell id, scoring
    ~|corpus|·nprobe/n_cells candidates per query."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_cells, vec_col)
    c = corpus.select(
        F.col(id_col).alias("__cid"),
        F.col(vec_col).alias("__cv"),
        nearest_cells(F.col(vec_col), centroids, 1)[0].alias("__cell"),
    )
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_vec_col).alias("__qv"),
        F.explode(nearest_cells(F.col(query_vec_col), centroids, nprobe)).alias("__cell"),
    )
    scored = q.join(c, "__cell").withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid").asc())
    return (
        # a corpus vector lives in exactly one cell, so (query, corpus)
        # pairs are unique even with nprobe > 1 — no dedup needed
        scored.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__cid").alias(id_col),
            F.round("cosine", 6).alias("cosine"),
            F.col("__rank").alias("rank"),
        )
    )


def _multiprobe_buckets(vec: Column, bits: int, nprobe: int) -> Column:
    """The ``nprobe`` most-promising sign-bit buckets for a query
    vector: its own bucket plus the buckets reached by flipping the
    ``nprobe − 1`` LOWEST-CONFIDENCE bits (smallest |v[i]| — the dims
    most likely to land on the other side of the hyperplane), ties to
    the smaller dim. Single-bit flips — the standard multi-probe LSH
    simplification (Lv et al. 2007, public) for nprobe ≤ bits + 1.
    Pure JVM array algebra: sort |v[i]| structs, slice, fold XOR-free
    (the flip is add/subtract of the bit's non-overlapping term, exact
    in two's complement — same portability trick as binary_signature)."""
    if not 1 <= nprobe <= bits + 1:
        raise ValueError(
            f"nprobe must be in [1, bits + 1] = [1, {bits + 1}], got {nprobe}"
        )
    base = binary_signature(vec, bits)
    if nprobe == 1:
        return F.array(base)
    # dim i's bit is set iff vec[i] >= 0 (the signature definition), so
    # the flipped bucket is base ∓ the dim's bit term directly — no bit
    # inspection of base needed. Terms never overlap other bits, so the
    # add/subtract stays in long range (flipping one bit of a valid
    # signature is always a valid signature; no ANSI overflow).
    def _term_lit(i: int):
        return F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long")

    conf = F.array(
        *[
            F.struct(
                F.abs(vec[i]).alias("m"),
                F.lit(i).alias("i"),
                F.when(vec[i] >= 0, base - _term_lit(i))
                .otherwise(base + _term_lit(i))
                .alias("f"),
            )
            for i in range(bits)
        ]
    )
    flipped = F.slice(
        F.transform(F.array_sort(conf), lambda s: s["f"]), 1, nprobe - 1
    )
    return F.concat(F.array(base), flipped)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's sign-bit
    bucket(s) are scored. 2^bits buckets → ~nprobe·|corpus|/2^bits
    candidates per query; the join co-locates on the bucket id (hash
    shuffle), never materializing the cross product. ``nprobe > 1``
    adds multi-probe (Lv et al. 2007): the query also probes the
    buckets across its lowest-confidence hyperplanes — the standard
    recall lever that beats adding tables (no extra corpus state, no
    second index). Probe buckets are distinct (distinct single-bit
    flips) and each corpus vector lives in exactly one bucket, so
    (query, corpus) candidate pairs stay unique — no dedup pass."""
    c = corpus.select(
        F.col(id_col).alias("__cid"),
        F.col(vec_col).alias("__cv"),
        signbit_bucket(F.col(vec_col), bits).alias("__bkt"),
    )
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_vec_col).alias("__qv"),
        F.explode(
            _multiprobe_buckets(F.col(query_vec_col), bits, nprobe)
        ).alias("__bkt"),
    )
    scored = q.join(c, "__bkt").withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__cid").alias(id_col),
            F.round("cosine", 6).alias("cosine"),
            F.col("__rank").alias("rank"),
        )
    )


def mine_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    gold: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    topk_fn=None,
) -> DataFrame:
    """Hard-negative mining for retriever training (DPR, Karpukhin et
    al. 2020; ANCE, Xiong et al. 2021 — both public): for each query,
    the ``k`` highest-cosine corpus items that are NOT gold positives —
    the negatives that most confuse the model. ``gold`` is a
    (query_id_col, id_col) pair table.

    Exactness under exclusion: retrieving top-k then dropping golds
    would UNDER-fill queries whose golds rank high, so the search asks
    for ``k + max golds per query`` candidates (one tiny agg — gold is
    label data, driver-sized per query), anti-joins the golds, and
    re-ranks to k. ``topk_fn`` defaults to the exact ``brute_force_topk``;
    pass a partial of ``ivf_topk``/``lsh_topk`` to trade recall for
    scale — the exclusion algebra is identical.

    Returns (query_id_col, id_col, cosine, rank<=k)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    fn = topk_fn or brute_force_topk
    # gmax over only the queries being mined, distinct pairs: gold is
    # often the FULL label set — an outlier query elsewhere (or dup
    # pairs, which the anti-join dedups anyway) must not inflate the
    # over-fetch for every mined query
    gmax_row = (
        gold.join(
            F.broadcast(queries.select(query_id_col).distinct()),
            query_id_col,
            "left_semi",
        )
        .groupBy(query_id_col)
        .agg(F.countDistinct(id_col).alias("g"))
        .agg(F.max("g"))
        .collect()[0][0]
    )
    gmax = int(gmax_row or 0)
    cand = fn(
        corpus,
        queries,
        k=k + gmax,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    )
    neg = cand.join(
        F.broadcast(gold.select(query_id_col, id_col).distinct()),
        [query_id_col, id_col],
        "left_anti",
    )
    # re-rank by the ORIGINAL rank (it encodes the unrounded cosine
    # order), not by the rounded cosine the top-k function emits —
    # re-sorting rounded values could swap near-ties
    w = Window.partitionBy(query_id_col).orderBy(F.col("rank").asc())
    return (
        neg.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("rank")
        .withColumnRenamed("__r", "rank")
    )


def semantic_contamination(
    corpus: DataFrame,
    probes: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "probe_vec",
) -> DataFrame:
    """Embedding-space benchmark decontamination: for every corpus
    document, the best-matching eval probe by exact cosine; rows whose
    best cosine >= ``threshold`` are the CONTAMINATED set (drop them
    with an anti-join before training). The semantic complement of the
    n-gram path (``text.contamination_counts``): paraphrased or
    reformatted eval leakage that shares no 7-gram still sits next to
    its source in embedding space.

    Scale design — ZERO corpus shuffle: the probe set (one eval suite,
    small by construction) collapses to a single-row array that
    broadcasts; each corpus row folds the array with ``F.aggregate``
    (argmax over cosine, JVM-side), so the plan is one broadcast
    nested-loop join against one row plus a narrow map — no groupBy,
    no exchange of ``corpus``. Ties break to the smallest probe id;
    zero-norm vectors never match (cosine undefined, not 0).

    Returns (id_col, probe_id_col, cosine rounded to 6)."""
    parr = probes.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(probe_id_col).alias("pid"),
                    F.col(probe_vec_col).alias("pv"),
                )
            )
        ).alias("__probes")
    )
    pid_type = probes.schema[probe_id_col].dataType.simpleString()
    dn = _norm(F.col(vec_col))

    def _cos(p):
        num = _dot(F.col(vec_col), p["pv"])
        den = dn * _norm(p["pv"])
        return F.when(den > 0, num / den).otherwise(F.lit(-2.0))

    # score each probe ONCE (higher-order lambdas get no common-
    # subexpression elimination — referencing _cos twice in the fold
    # would double the O(d) hot-loop flops), then argmax-fold the
    # scored structs. Probe ids keep their native type: a cast would
    # silently NULL non-numeric eval-suite ids.
    scored_arr = F.transform(
        F.col("__probes"),
        lambda p: F.struct(_cos(p).alias("c"), p["pid"].alias("pid")),
    )
    init = F.struct(
        F.lit(-2.0).alias("c"), F.lit(None).cast(pid_type).alias("pid")
    )
    best = F.aggregate(
        scored_arr,
        init,
        # strict > : probes arrive sorted by pid, so the FIRST of a
        # cosine tie (smallest pid) wins deterministically
        lambda acc, p: F.when(p["c"] > acc["c"], p).otherwise(acc),
    )
    return (
        corpus.crossJoin(F.broadcast(parr))
        .withColumn("__best", best)
        .where(F.col("__best.c") >= F.lit(float(threshold)))
        .select(
            id_col,
            F.col("__best.pid").alias(probe_id_col),
            F.round(F.col("__best.c"), 6).alias("cosine"),
        )
    )


def binary_signature(vec: Column, bits: int = 64) -> Column:
    """Pack the sign bits of the first ``bits`` (<= 64) components into
    one BIGINT — binary quantization (the asymmetric-sketch family:
    Charikar 2002 SimHash for vectors; the BQ index Lucene/Vespa ship).
    8 bytes per vector regardless of dimension: a float corpus shrinks
    ~32x for the candidate pass. Bit 63 is set via the signed-minimum
    literal so the packing stays portable to engines whose BIGINT
    shift at 63 overflows (two's complement addition of non-overlapping
    bits is exact)."""
    if not 0 < bits <= 64:
        raise ValueError(f"bits must be in (0, 64], got {bits}")
    terms = [
        F.when(vec[i] >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(min(bits, 63))
    ]
    if bits == 64:
        terms.append(
            F.when(vec[63] >= 0, F.lit(-(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def binary_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    rerank: int = 4,
    bits: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Binary-quantized top-k: rank the corpus by Hamming distance
    between 64-bit sign signatures (one bit_count(xor) per pair — pure
    JVM bit math over 8-byte ints), keep ``rerank * k`` candidates per
    query, then EXACT-cosine re-rank those to k. The standard BQ
    two-stage: the cheap pass touches only signatures (~3% of raw
    vector IO), the expensive cosine touches rerank*k rows per query.
    Deterministic: hamming ties break on id; rerank ties on id.
    Approximate like every sign-bit method — recall grows with
    ``rerank`` — but fully deterministic, so the correctness oracle
    replays the whole pipeline exactly."""
    if k <= 0 or rerank < 1:
        raise ValueError(f"need k > 0 and rerank >= 1, got k={k} rerank={rerank}")
    csig = corpus.select(
        F.col(id_col).alias("__cid"),
        binary_signature(F.col(vec_col), bits).alias("__cs"),
    )
    qsig = queries.select(
        F.col(query_id_col).alias("__qid"),
        binary_signature(F.col(query_vec_col), bits).alias("__qs"),
    )
    pairs = csig.crossJoin(F.broadcast(qsig)).select(
        "__qid",
        "__cid",
        F.bit_count(F.col("__cs").bitwiseXOR(F.col("__qs"))).alias("hamming"),
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("hamming").asc(), F.col("__cid").asc()
    )
    cand = (
        pairs.withColumn("__hr", F.row_number().over(w))
        .where(F.col("__hr") <= rerank * k)
        .drop("__hr")
    )
    cvec = corpus.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cv")
    )
    qvec = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_vec_col).alias("__qv"),
    )
    scored = cand.join(cvec, "__cid").join(F.broadcast(qvec), "__qid")
    scored = scored.withColumn("cosine", cosine(F.col("__qv"), F.col("__cv")))
    w2 = Window.partitionBy("__qid").orderBy(
        F.col("cosine").desc(), F.col("__cid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__cid").alias(id_col),
            F.round("cosine", 6).alias("cosine"),
            "hamming",
            "rank",
        )
    )
