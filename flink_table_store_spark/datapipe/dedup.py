"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design: every operator is expressed with built-in DataFrame ops
(no Python UDFs) so Catalyst/Tungsten execute it JVM-side:

- exact: one hash-shuffle on the content fingerprint.
- MinHash+LSH: signatures are narrow per-row array expressions
  (``transform``/``array_min`` over shingle hashes); candidate
  generation is a self-join on (band, band_hash) — the classic
  shingle→minhash→band→bucket-join pipeline. Only documents sharing a
  band hash meet in the shuffle, so the join is near-linear for real
  corpora instead of O(n²).
- SimHash: 64-bit signature folded with ``aggregate``/``zip_with``;
  near-dup candidates = equal signature (or banded hamming buckets).
- n-gram Jaccard: exact verification on candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.text import fingerprint

# deterministic MinHash parameters (odd multipliers, fixed seed mix).
# Universal hashing in the 2^31-1 Mersenne domain: inputs reduced mod p
# first so a*h+b stays far below 2^63 (Spark runs ANSI overflow checks).
_MERSENNE = (1 << 31) - 1

# materialize banded signatures before the LSH self-join (see
# minhash_lsh_pairs docstring); module flag so benchmarks can A/B it
MATERIALIZE_SIGNATURES = True

# ngram_jaccard_pairs candidate restriction (r12 optimization round):
# the candidate-id set restricts the shingle projection ONLY while it
# is broadcastable (bounded via 2*|pairs|, counted on the pinned pair
# set — the semi-join is then a build-side filter, no corpus shuffle)
# or, above that, while candidates stay a small fraction of the corpus
# (one distinct count + one column-pruned corpus count decide). The
# unconditional semi-join of r11 was driver-measured 0.63x on the 10x
# bench twin: its plan overhead outweighed the saved shingle work.
DEDUP_BROADCAST_IDS_MAX = 2_000_000  # ids; ~30 MB of longs broadcast
DEDUP_RESTRICT_MAX_RATIO = 0.5


def _shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles as an array<string> (distinct).

    Built from k-1 shifted-array ``zip_with`` passes (each O(n)) instead
    of a per-index ``slice`` transform (O(n·k) with interpreted HOF
    allocation — measured ~4× slower): gram i = words[i] ⊕ words[i+1] ⊕
    … ⊕ words[i+k-1]. Trailing short grams (null-padded shifts under
    ``concat_ws``) are sliced off; n<k degrades to the whole text as one
    shingle, matching the old behavior."""
    words = F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")
    n = F.size(words)
    grams = words
    for j in range(1, k):
        shifted = F.slice(words, j + 1, F.greatest(n - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
    grams = F.slice(grams, 1, F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(grams)


def _universal_hash(h: Column, j: int) -> Column:
    """hash_j(h) = ((h mod p) * (2j+1) + b_j) mod p in the Mersenne domain.
    Products stay < 2^38 so ANSI overflow checks never fire."""
    a = 2 * j + 1  # odd multiplier
    b = (0x9E3779B97F4A7C15 ^ (j * 0xBF58476D1CE4E5B9)) % _MERSENNE
    return F.pmod(F.pmod(h, F.lit(_MERSENNE)) * F.lit(a) + F.lit(b), F.lit(_MERSENNE))


def minhash_signature(col: Column, num_hashes: int = 64, k: int = 3) -> Column:
    """array<bigint> MinHash signature — min over shingles of
    universal-hash_j(xxhash64(shingle)). Per-row expression form; for
    whole-table signatures prefer ``minhash_signatures`` (explode + 64
    min-aggregates), which keeps the Catalyst tree small."""
    sh = _shingles(col, k)
    base = F.transform(sh, lambda s: F.xxhash64(s))

    def _mk(j: int):
        # single-arg lambda on purpose: a 2-arg lambda would make
        # F.transform bind the second arg to the element INDEX column
        return lambda h: _universal_hash(h, j)

    return F.array(*[F.array_min(F.transform(base, _mk(j))) for j in range(num_hashes)])


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 3,
) -> DataFrame:
    """(__id, __sig array<bigint>) per document.

    Shape chosen for scale AND plan-compile cost: explode shingles to
    (id, hash) rows, then ONE groupBy with 64 simple min-aggregates.
    Map-side partial aggregation combines before the shuffle, and the
    expression tree stays tiny (the per-row nested-transform form makes
    whole-stage codegen quadratically slow as num_hashes grows)."""
    rows = df.select(
        F.col(id_col).alias("__id"),
        F.explode(_shingles(F.col(text_col), k)).alias("__s"),
    ).select("__id", F.xxhash64("__s").alias("__h"))
    aggs = [F.min(_universal_hash(F.col("__h"), j)).alias(f"__m{j}") for j in range(num_hashes)]
    return (
        rows.groupBy("__id")
        .agg(*aggs)
        .select("__id", F.array(*[f"__m{j}" for j in range(num_hashes)]).alias("__sig"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact normalized content.
    One shuffle on the 64-bit fingerprint; survives 100 TB because the
    key is a fixed-width long, with map-side combine in the group-by.

    ``min_by(struct(row), id)`` per fingerprint rather than a
    row_number window (r11 optimization round, guide §2.3): the partial
    aggregate combines map-side — the exchange carries ~one row per
    fingerprint per map partition — where the window shipped every
    duplicate and sorted each partition. Same representative: min id
    is unique per fingerprint."""
    winner = F.min_by(
        F.struct(*[F.col(c) for c in df.columns]), F.col(id_col)
    ).alias("__w")
    return (
        df.withColumn("__fp", fingerprint(text_col))
        .groupBy("__fp")
        .agg(winner)
        .select(*[F.col(f"__w.{c}").alias(c) for c in df.columns])
    )


def banded_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(__id, __band, __bh) — one row per (document, LSH band): the
    band's r-row signature slice hashed to one bigint. This is BOTH the
    self-join key of batch LSH (``minhash_lsh_pairs``) and the stored
    layout of the persistent index (``datapipe.incdedup``)."""
    r = num_hashes // bands
    with_sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("__band")
    return with_sig.select("__id", "__sig", band_idx).select(
        "__id",
        "__band",
        F.xxhash64(F.slice("__sig", F.col("__band") * r + 1, r).cast("string")).alias("__bh"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    rows/band r = num_hashes/bands; collision threshold ≈ (1/bands)^(1/r).
    The band self-join shuffles on (band_idx, band_hash) — only colliding
    docs co-locate.

    The banded-signature table is materialized (localCheckpoint) before
    the self-join: Spark does not reuse the exchange across the two join
    branches here, so without it the whole shingle→explode→minhash
    aggregation would execute TWICE — a genuine 2× at any scale, not a
    small-data artifact. What is stored is narrow ((id, band, hash) ×
    bands rows per doc) and spread across executors."""
    banded = banded_signatures(df, text_col, id_col, num_hashes, bands, shingle_k)
    if MATERIALIZE_SIGNATURES:
        try:
            banded = banded.localCheckpoint(eager=True)
        except Exception:
            pass  # checkpoint is an optimization; the join is correct without it
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.__band") == F.col("b.__band")) & (F.col("a.__bh") == F.col("b.__bh")) & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,  # columns id_a, id_b
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-k-gram Jaccard verification of candidate pairs.
    Shingle sets are joined in (broadcast when small); at scale the two
    joins shuffle on the doc id — still linear in |pairs|.

    Shingle restriction is GATED (r12 optimization round, guide §2.3/
    §3.3 + §1.3 "measure, keep what wins"): when the candidate-id set
    is broadcastable, shingles are computed ONLY for candidate docs
    (a broadcast semi-join filter — no corpus shuffle) and the small
    restricted shingle table is pinned once for both join branches, so
    the corpus projection lineage executes exactly once. Above the
    broadcast cap the restriction stays on only while candidates are a
    minority of the corpus (plain semi-join, still O(candidates)
    pinned); a dup-heavy pair set falls back to the unrestricted
    both-branch shape — r11's unconditional semi-join was
    driver-measured 0.63x on exactly that shape. An inner join cannot
    match rows outside the candidate id set, so the result is unchanged
    under every branch of the gate."""
    pinned_pairs = False
    try:
        # the pair set feeds both id joins + the gate's count/semi-join;
        # without pinning, its upstream (typically the banded LSH
        # self-join) would execute once per subtree
        candidate_pairs = candidate_pairs.localCheckpoint(eager=True)
        pinned_pairs = True
    except Exception:
        pass
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col))
    # no .distinct(): the semi-join build side tolerates duplicate ids,
    # and skipping the distinct saves its exchange+aggregate
    cand_ids = candidate_pairs.select(F.col("id_a").alias("__id")).unionByName(
        candidate_pairs.select(F.col("id_b").alias("__id"))
    )
    restrict = None
    if pinned_pairs:
        n_pairs = candidate_pairs.count()  # cheap: pinned narrow rows
        if 2 * n_pairs <= DEDUP_BROADCAST_IDS_MAX:
            restrict = F.broadcast(cand_ids)
        else:
            n_cand = cand_ids.distinct().count()
            if n_cand < DEDUP_RESTRICT_MAX_RATIO * max(df.count(), 1):
                restrict = cand_ids.distinct()
    if restrict is not None:
        sh = base.join(restrict, "__id", "left_semi").select(
            "__id", _shingles(F.col(text_col), k).alias("__sh")
        )
        try:
            # O(candidates) rows: pin so the corpus projection + the
            # semi-join run once, not once per join branch
            sh = sh.localCheckpoint(eager=True)
        except Exception:
            pass
    else:
        # unrestricted fallback (dup-heavy candidates, or no pinning
        # available to count cheaply): shingles for every doc, computed
        # once per branch — NOT pinned, a corpus-sized materialization
        # would be the scale bottleneck
        sh = base.select("__id", _shingles(F.col(text_col), k).alias("__sh"))
    out = (
        candidate_pairs.join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "__sa"), "id_a")
        .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "__sb"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sa", "__sb"))
            / F.size(F.array_union("__sa", "__sb")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Full near-dup removal: LSH candidates → Jaccard verify →
    keep min-id representative of each dup cluster (union-find collapsed
    to 'kept iff no verified duplicate with a smaller id' — one-hop
    star clustering, linear and deterministic)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, num_hashes, bands, shingle_k)
    verified = ngram_jaccard_pairs(df, pairs, text_col, id_col, shingle_k, jaccard_threshold)
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def connected_components(
    pairs: DataFrame,
    col_a: str = "id_a",
    col_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; the component id
    is the MIN node id transitively reachable over the (undirected)
    pair graph.

    Iterative min-label propagation: each round is ONE shuffle join +
    map-side-combining min agg, labels localCheckpointed so lineage
    stays flat; converges in O(component diameter) rounds — near-dup
    graphs are short-diameter clusters around shared content. (For
    adversarial long chains the alternating large-star/small-star
    algorithm of Kiveris et al., "Connected Components in MapReduce
    and Beyond", cuts rounds to O(log n); dedup shapes don't need it.)
    Raises after ``max_iter`` non-converged rounds rather than
    returning partial components."""
    def _pin(df: DataFrame, prev):
        """Cut lineage between rounds: localCheckpoint when available,
        else cache+materialize (the analyzed plan then resolves to the
        InMemoryRelation — linear growth, not the exponential doubling
        an unpinned labels-used-twice round would cause). Returns
        (pinned df, handle to unpersist after the next round)."""
        try:
            out, handle = df.localCheckpoint(eager=True), None
        except Exception:
            out = df.persist()
            out.count()
            handle = out
        if prev is not None:
            prev.unpersist()
        return out, handle

    e = pairs.select(F.col(col_a).alias("u"), F.col(col_b).alias("v"))
    edges = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    edges, _edge_handle = _pin(edges, None)
    labels = edges.select(
        F.col("u").alias("node"), F.col("u").alias("component")
    ).distinct()
    prev_handle = None
    for _ in range(max_iter):
        nmin = (
            edges.alias("e")
            .join(labels.alias("l"), F.col("e.v") == F.col("l.node"))
            .groupBy(F.col("e.u").alias("n2"))
            .agg(F.min("l.component").alias("nmin"))
        )
        new = (
            labels.alias("l2")
            .join(nmin.alias("m"), F.col("l2.node") == F.col("m.n2"), "left")
            .select(
                F.col("l2.node").alias("node"),
                F.least(
                    F.col("l2.component"),
                    F.coalesce(F.col("m.nmin"), F.col("l2.component")),
                ).alias("component"),
                (F.col("m.nmin") < F.col("l2.component")).alias("__chg"),
            )
        )
        new, prev_handle = _pin(new, prev_handle)
        changed = new.where(F.col("__chg")).limit(1).count()
        labels = new.drop("__chg")
        if changed == 0:
            # the edges pin is only needed while iterating — release it
            # so repeated calls in a long session don't accumulate cached
            # blocks. The FINAL labels round stays pinned: it backs the
            # returned DataFrame (unpersisting it would force the whole
            # unpinned round chain to recompute on the caller's first
            # action); callers own that storage and may unpersist when
            # done with the result.
            if _edge_handle is not None:
                _edge_handle.unpersist()
            return labels
    if _edge_handle is not None:
        _edge_handle.unpersist()
    if prev_handle is not None:
        prev_handle.unpersist()
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def connected_components_star(
    pairs: DataFrame,
    col_a: str = "id_a",
    col_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) via alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — O(log n) rounds regardless of component DIAMETER,
    where min-label propagation (``connected_components``) needs one
    round per diameter hop. Use this for adversarial graphs (long
    chains through shared boilerplate); label propagation stays the
    default for the short-diameter clusters near-dup dedup produces.

    Each round is two grouped min-aggregations plus a join — the same
    shuffle volume as one label-propagation round — and the edge set
    provably shrinks toward star forests whose centers are component
    minima. Convergence is detected by the small-star output reaching a
    fixed point; like the label-propagation twin this raises rather
    than returning partial components."""

    def _pin(df: DataFrame, prev):
        try:
            out, handle = df.localCheckpoint(eager=True), None
        except Exception:
            out = df.persist()
            out.count()
            handle = out
        if prev is not None:
            prev.unpersist()
        return out, handle

    u, v = F.col("u"), F.col("v")
    e = pairs.select(F.col(col_a).alias("u"), F.col(col_b).alias("v"))
    # normalize: drop self-loops, orient (big, small), dedup
    edges = (
        e.unionByName(e.select(v.alias("u"), u.alias("v")))
        .where(u > v)
        .distinct()
    )
    edges, prev_handle = _pin(edges, None)

    def _large_star(ed: DataFrame) -> DataFrame:
        # symmetric neighborhoods; per node n the min label m =
        # min(Γ(n) ∪ {n}); every STRICTLY LARGER neighbor re-attaches
        # to m. Keeps (big, small) orientation by construction.
        sym = ed.unionByName(ed.select(v.alias("u"), u.alias("v")))
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        return (
            sym.join(m, "u")
            .where(v > u)
            .select(v.alias("u"), F.col("m").alias("v"))
            .where(F.col("u") > F.col("v"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # edges already point big -> small: per big node n with all-
        # smaller Γ(n), attach every neighbor AND n itself to the min.
        m = ed.groupBy("u").agg(F.min("v").alias("m"))
        j = ed.join(m, "u")
        re_nbrs = j.where(v != F.col("m")).select(v.alias("u"), F.col("m").alias("v"))
        re_self = m.select(u.alias("u"), F.col("m").alias("v"))
        return (
            re_nbrs.unionByName(re_self)
            .where(F.col("u") > F.col("v"))
            .distinct()
        )

    for _ in range(max_iter):
        new = _small_star(_large_star(edges))
        new, prev_handle = _pin(new, prev_handle)
        # fixed point: identical edge sets (counts equal and no edge of
        # the new set missing from the old)
        if (
            new.count() == edges.count()
            and new.join(edges, ["u", "v"], "left_anti").limit(1).count() == 0
        ):
            # star forest: every edge is (node, component-min); centers
            # label themselves
            labels = new.select(
                u.alias("node"), v.alias("component")
            ).unionByName(
                new.select(v.alias("node"), v.alias("component")).distinct()
            ).distinct()
            return labels
        edges = new
    if prev_handle is not None:
        prev_handle.unpersist()
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )


def _keep_cluster_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str, max_iter: int,
    algorithm: str = "label",
) -> DataFrame:
    """Shared tail of the *_dedup_cc operators: components over the
    verified pair graph, drop every node that is not its component's
    min-id representative. ``algorithm='star'`` switches to the
    O(log n)-round large/small-star solver for adversarial graphs."""
    cc = connected_components_star if algorithm == "star" else connected_components
    comp = cc(pairs, "id_a", "id_b", max_iter)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


def minhash_dedup_cc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    max_iter: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Near-dup removal with TRUE transitive clusters: LSH candidates →
    Jaccard verify → connected components over the verified pair graph
    → keep each component's min-id representative.

    ``minhash_dedup``'s one-hop rule keeps BOTH endpoints of a chain
    A–B–C when the middle node holds the smallest id; transitive
    clustering — the semantics corpus-dedup recipes specify (one
    survivor per duplicate CLUSTER) — keeps exactly one."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, num_hashes, bands, shingle_k)
    verified = ngram_jaccard_pairs(df, pairs, text_col, id_col, shingle_k, jaccard_threshold)
    return _keep_cluster_representatives(df, verified, id_col, max_iter, algorithm)


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_bits: int = 64
) -> DataFrame:
    """(__id, __sh bigint) 64-bit SimHash per document.

    Explode whitespace tokens to (id, token_hash) rows, then one groupBy
    with 64 signed bit-count sums (map-side combine, small codegen); the
    signature long is assembled from the 64 sums. Entirely JVM-side."""
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
    rows = df.select(F.col(id_col).alias("__id"), F.explode(words).alias("__w")).select(
        "__id", F.xxhash64("__w").alias("__h")
    )
    aggs = [
        F.sum(F.when(F.getbit(F.col("__h"), F.lit(i)) == 1, 1).otherwise(-1)).alias(f"__b{i}")
        for i in range(n_bits)
    ]
    g = rows.groupBy("__id").agg(*aggs)
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        weight = (1 << i) if i < 63 else -(1 << 63)
        out = out.bitwiseOR(
            F.when(F.col(f"__b{i}") > 0, F.lit(weight)).otherwise(F.lit(0)).cast("long")
        )
    return g.select("__id", out.alias("__sh"))


def simhash_candidate_pairs(
    sig: DataFrame, bands: int = 4, n_bits: int = 64, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, hamming ≤ max_hamming) via banded
    hamming LSH over SimHash signatures ``(__id, __sh)``.

    The 64-bit signature splits into ``bands`` equal slices; the
    self-join meets only rows sharing a slice value, then verifies
    ``bit_count(a ^ b) <= max_hamming`` JVM-side. By pigeonhole, any
    pair within hamming ≤ bands-1 agrees on at least one whole band —
    so with the defaults (4 bands, d=3) candidate generation is EXACT,
    not probabilistic. ``max_hamming > bands - 1`` would silently lose
    recall (a pair can then differ in every band), so it is refused.
    Join shape mirrors minhash_lsh_pairs: shuffle on
    (band, band_value), never all-pairs."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs at least {max_hamming + 1} "
            f"bands for exact candidate generation (got bands={bands}); "
            "pairs differing by one bit per band would share no band"
        )
    width = n_bits // bands
    mask = (1 << width) - 1
    banded = sig.select(
        "__id",
        "__sh",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("__band"),
    ).withColumn(
        "__bv", F.expr(f"shiftrightunsigned(__sh, __band * {width}) & {mask}")
    )
    if MATERIALIZE_SIGNATURES:
        try:
            banded = banded.localCheckpoint(eager=True)
        except Exception:
            pass  # optimization only; the join is correct without it
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bv") == F.col("b.__bv"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .where(
            F.bit_count(F.col("a.__sh").bitwiseXOR(F.col("b.__sh"))) <= max_hamming
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Drop documents whose SimHash is within ``max_hamming`` bits of a
    smaller-id doc (banded hamming buckets, simhash_candidate_pairs;
    reference shape: the SimHash near-dup stage of training-data
    pipelines)."""
    sig = simhash_signatures(df, text_col, id_col)
    pairs = simhash_candidate_pairs(sig, bands=bands, max_hamming=max_hamming)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_bits: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ t).

    block_bits>0 buckets vectors by the sign pattern of their first
    ``block_bits`` dimensions (cheap LSH) so the self-join only meets
    within buckets — the 100 TB path. 0 = exact all-pairs (test scale).
    """
    dot = lambda a, b: F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    norm = lambda a: F.sqrt(dot(a, a))
    v = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        norm(F.col(vec_col)).alias("__n"),
    )
    if block_bits > 0:
        from flink_table_store_spark.datapipe.similarity import signbit_bucket

        v = v.withColumn("__blk", signbit_bucket(F.col("__v"), block_bits))
        cond = (F.col("a.__blk") == F.col("b.__blk")) & (F.col("a.__id") < F.col("b.__id"))
    else:
        cond = F.col("a.__id") < F.col("b.__id")
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, cond)
        .withColumn(
            "cosine",
            dot(F.col("a.__v"), F.col("b.__v")) / (F.col("a.__n") * F.col("b.__n")),
        )
        .where(F.col("cosine") >= threshold)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    threshold: float = 0.95,
    kmeans_iter: int = 5,
    seed: int = 42,
    max_iter: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    near-dup WITHIN each cluster — pairwise work drops from O(n²) to
    O(Σ cell²), the design point that makes semantic dedup feasible on
    web-scale corpora. Pairs above the cosine threshold form transitive
    clusters (connected components); the min-id representative of each
    survives.

    Scale design: centroids train on one Spark ML job (at 100 TB, on a
    sample — k-means needs only a distribution sketch); assignment is a
    narrow per-row argmin over literal centroid arrays (JVM-side, no
    shuffle); the pairwise join shuffles once on the cell id. Accepted
    approximation (as in the paper): duplicates assigned to DIFFERENT
    cells are not compared — raise ``n_cells`` resolution or fall back
    to ``embedding_dedup_cc`` (sign-bit blocking) when cross-cell
    recall matters more than cost."""
    from flink_table_store_spark.datapipe.similarity import (
        nearest_cells,
        train_ivf_centroids,
    )

    centroids = train_ivf_centroids(
        emb, n_cells=n_cells, vec_col=vec_col, max_iter=kmeans_iter, seed=seed
    )
    assigned = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        nearest_cells(F.col(vec_col), centroids, nprobe=1)[0].alias("__cell"),
    )
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    norm = lambda a: F.sqrt(dot(a, a))
    v = assigned.withColumn("__n", norm(F.col("__v")))
    a, b = v.alias("a"), v.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__cell") == F.col("b.__cell"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .withColumn(
            "cosine",
            dot(F.col("a.__v"), F.col("b.__v")) / (F.col("a.__n") * F.col("b.__n")),
        )
        .where(F.col("cosine") >= threshold)
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
    )
    return _keep_cluster_representatives(emb, pairs, id_col, max_iter, algorithm)


def embedding_dedup_cc(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_bits: int = 0,
    max_iter: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Embedding-cosine near-dup removal with TRUE transitive clusters:
    cosine pairs (sign-bit-blocked at scale) → connected components →
    keep each component's min-id representative. Semantic duplicates
    chain through paraphrases the same way text duplicates chain
    through shared boilerplate, so the transitive rule applies here
    too (see minhash_dedup_cc)."""
    pairs = embedding_near_dup_pairs(emb, id_col, vec_col, threshold, block_bits)
    return _keep_cluster_representatives(emb, pairs, id_col, max_iter, algorithm)


def split_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str | None = "\n\n",
    words_per_para: int = 8,
) -> DataFrame:
    """(id, pos, para) rows: documents split on ``sep`` (the usual
    paragraph boundary), or — for corpora without structural breaks —
    re-segmented into fixed ``words_per_para`` word windows
    (``sep=None``), the granularity exact-substring dedup pipelines
    use when no markup exists."""
    if sep is not None:
        return df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
        )
    ws = F.split(F.col(text_col), " ")
    n = F.greatest(
        F.ceil(F.size(ws) / F.lit(words_per_para)).cast("int"), F.lit(1)
    )
    paras = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(
            " ", F.slice(ws, i * words_per_para + 1, words_per_para)
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(paras).alias("pos", "para")
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str | None = "\n\n",
    words_per_para: int = 8,
    out_sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide EXACT paragraph deduplication (the Dolma / CCNet /
    RefinedWeb paragraph-dedup step; Lee et al. exact-substring dedup
    at paragraph granularity): every paragraph keeps only its FIRST
    occurrence across the whole corpus — ordered by (doc id, position)
    — and each document is rebuilt from its surviving paragraphs in
    original order. Boilerplate (headers, navboxes, license blocks)
    repeated across millions of pages disappears from all but one.

    Scale shape: one explode (O(total paragraphs)), one map-side-
    combined groupBy(paragraph) picking the min (doc, pos) winner, one
    join back on the same paragraph key (Catalyst reuses the exchange),
    one groupBy(doc) to reassemble. No windows, no driver state — every
    stage keyed and combinable at 100 TB.

    Returns (id, text rebuilt, paras_kept); documents whose every
    paragraph was seen earlier elsewhere drop out entirely.
    """
    paras = split_paragraphs(df, text_col, id_col, sep, words_per_para)
    firsts = paras.groupBy("para").agg(
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
        ).alias("__w")
    )
    kept = (
        paras.join(firsts, on="para")
        .where(
            (F.col(id_col) == F.col("__w.d")) & (F.col("pos") == F.col("__w.p"))
        )
        .drop("__w")
    )
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            out_sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("paras_kept"),
    )


_SENT_SEP = "\u001e"


def split_sentences(col: Column) -> Column:
    """Sentence array: break after [.!?] followed by whitespace, drop
    blank fragments. Engine-portable on purpose: capture-and-replace
    (no lookbehind, which RE2 lacks) over an EXPLICIT whitespace class
    - Java's \\s matches vertical tab, RE2's does not, so the class
    is spelled out identically on both sides. The DuckDB replay is
    `regexp_replace(text, '([.!?])[ \\t\\n\\f\\r]+', '\\1' || chr(30), 'g')`."""
    marked = F.regexp_replace(col, r"([.!?])[ \t\n\f\r]+", "$1" + _SENT_SEP)
    return F.filter(
        F.split(marked, _SENT_SEP), lambda s: F.trim(s) != F.lit("")
    )


def sentence_span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 3,
) -> DataFrame:
    """C4's global fuzzy-dedup rule (Raffel et al. 2020 \u00a72.2; the
    tfds c4_utils three-sentence policy): any run of ``span``
    consecutive sentences that occurred earlier in the corpus - first
    occurrence by (doc id, window position) wins - is removed from
    every later document, and documents are rebuilt from their
    surviving sentences. Together with ``text.c4_clean`` (line rules +
    doc gates) and ``paragraph_dedup`` this completes the paper\'s
    cleaning stack.

    Sentences covered by ANY duplicated window are dropped, matching
    the published implementation\'s remove-the-span behavior; documents
    with fewer than ``span`` sentences emit no windows and pass
    untouched; a document whose every sentence is covered drops out.
    Rebuild joins with a single space (inter-sentence whitespace is
    already consumed by the splitter).

    Scale shape: window keys build as ``span-1`` shifted ``zip_with``
    passes (O(span*sentences) - NOT slice-inside-transform, the
    O(n^2) interpreted-HOF trap substring.py documents), then ONE
    map-combined groupBy(window) + a join back on the same key
    (Catalyst reuses the exchange) + one groupBy(doc) rebuild. Same
    shape as paragraph_dedup: no windows over the corpus, no driver
    state, no skew beyond a document\'s own length."""
    if span < 2:
        raise ValueError(f"span must be >= 2, got {span}")
    arr = split_sentences(F.col(text_col))
    win = arr
    for j in range(1, span):
        shifted = F.slice(
            arr, j + 1, F.greatest(F.size(arr) - j, F.lit(0))
        )
        # zip_with pads the shorter side with NULL and concat_ws skips
        # NULLs, so tail positions hold PARTIAL windows - the slice to
        # m below cuts them before they can collide with real keys
        win = F.zip_with(
            win, shifted, lambda a, b: F.concat_ws(_SENT_SEP, a, b)
        )
    m = F.greatest(F.size(arr) - F.lit(span - 1), F.lit(0))
    base = df.select(
        F.col(id_col),
        arr.alias("__sents"),
        F.slice(win, 1, m).alias("__wins"),
    )
    sents = base.select(
        id_col, F.posexplode("__sents").alias("pos", "__sent")
    )
    wins = base.select(
        id_col, F.posexplode("__wins").alias("wpos", "__key")
    )
    firsts = wins.groupBy("__key").agg(
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("wpos").alias("p"))
        ).alias("__w")
    )
    losers = (
        wins.join(firsts, "__key")
        .where(
            (F.col(id_col) != F.col("__w.d"))
            | (F.col("wpos") != F.col("__w.p"))
        )
        .select(id_col, "wpos")
    )
    covered = losers.select(
        id_col,
        F.explode(
            F.sequence(F.col("wpos"), F.col("wpos") + F.lit(span - 1))
        ).alias("pos"),
    ).distinct()
    kept = sents.join(covered, [id_col, "pos"], "left_anti")
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "__sent"))),
                lambda s: s["__sent"],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("sentences_kept"),
    )


def ngram_containment_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,  # columns id_a, id_b
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-k-gram CONTAINMENT (Broder 1997\'s asymmetric
    resemblance companion): c(a in b) = |Sa \u2229 Sb| / |Sa|. Jaccard
    misses the quote/subset pattern - a short doc wholly embedded in a
    long one scores low Jaccard but containment ~1 - so containment is
    the standard second gate for quote detection and
    contained-boilerplate removal. Emits BOTH directions per pair
    (containment_a_in_b, containment_b_in_a) and keeps rows where
    EITHER direction clears ``threshold``. Same scale shape as
    ngram_jaccard_pairs: two id-keyed joins, linear in |pairs|.
    Empty shingle sets (docs shorter than k words) yield NULL
    containment on that side, never a division error."""
    sh = df.select(
        F.col(id_col).alias("__id"), _shingles(F.col(text_col), k).alias("__sh")
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    ca = F.try_divide(inter, F.size("__sa").cast("double"))
    cb = F.try_divide(inter, F.size("__sb").cast("double"))
    return (
        candidate_pairs.join(
            sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "__sa"),
            "id_a",
        )
        .join(
            sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "__sb"),
            "id_b",
        )
        .withColumn("containment_a_in_b", F.round(ca, 6))
        .withColumn("containment_b_in_a", F.round(cb, 6))
        .where(
            (F.col("containment_a_in_b") >= threshold)
            | (F.col("containment_b_in_a") >= threshold)
        )
        .select("id_a", "id_b", "containment_a_in_b", "containment_b_in_a")
    )


def corpus_diff(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Content-level diff of two corpora (the WIMBD-style cross-corpus
    accounting: how much of crawl B is already in corpus A?): documents
    reduce to normalized md5 content fingerprints, and each DISTINCT
    fingerprint lands in exactly one status bucket — ``common``,
    ``only_a`` or ``only_b`` — with document counts on each side
    (duplicates within a corpus count as docs, not as extra
    fingerprints). One slim fingerprint projection per side, one
    full-outer join keyed on the fingerprint, one 3-row aggregate —
    near-linear, no corpus text ever shuffles.

    Returns (status, n_fingerprints, n_docs_a, n_docs_b) — one row per
    nonempty status."""
    from flink_table_store_spark.datapipe.text import fingerprint_md5

    fa = a.select(fingerprint_md5(text_col).alias("fp")).groupBy("fp").agg(
        F.count(F.lit(1)).alias("na")
    )
    fb = b.select(fingerprint_md5(text_col).alias("fp")).groupBy("fp").agg(
        F.count(F.lit(1)).alias("nb")
    )
    j = fa.join(fb, "fp", "full")
    status = (
        F.when(F.col("na").isNotNull() & F.col("nb").isNotNull(), "common")
        .when(F.col("na").isNotNull(), "only_a")
        .otherwise("only_b")
    )
    return (
        j.groupBy(status.alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.sum(F.coalesce(F.col("na"), F.lit(0))).alias("n_docs_a"),
            F.sum(F.coalesce(F.col("nb"), F.lit(0))).alias("n_docs_b"),
        )
        .orderBy("status")
    )
