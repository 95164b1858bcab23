"""Text analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs — so they scale linearly with
executors and stay inside Tungsten. Each operator is a narrow
(per-row) transform: no shuffle, fully pipelined with the parquet scan.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punctuation/stopword ratios), language ID (stopword n-gram
heuristic), document fingerprinting (rolling/content hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish tokenizer regex: words, numbers, contractions, single punctuation.
TOKEN_REGEX = r"[A-Za-z]+(?:'[a-z]+)?|[0-9]+|[^A-Za-z0-9\s]"

# Tiny stopword profiles for the n-gram language heuristic. Deterministic,
# dependency-free; real pipelines would swap in fastText — same plumbing.
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "dans"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
}


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count — `size(split(trim(text), '\\s+'))`."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_token_count(col: str | Column = "text") -> Column:
    """BPE-ish token count via the tokenizer regex (regexp_count, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def quality_score(col: str | Column = "text") -> Column:
    """Heuristic quality in [0,1]: mean word length sanity, alpha ratio,
    punctuation ratio, stopword presence. Pure built-ins."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double")
    n_tokens = token_count(c).cast("double")
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    word_len_ok = F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_hits = _stopword_hits(c, "en")
    stop_ok = F.when(stop_hits >= 2, F.lit(1.0)).otherwise(stop_hits.cast("double") / F.lit(2.0))
    score = (
        F.lit(0.35) * alpha_ratio
        + F.lit(0.25) * word_len_ok
        + F.lit(0.25) * stop_ok
        + F.lit(0.15) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
    )
    return F.round(score, 4)


def _stopword_hits(c: Column, lang: str) -> Column:
    lowered = F.lower(c)
    hits = F.lit(0)
    for w in _LANG_STOPWORDS[lang]:
        hits = hits + F.when(lowered.rlike(rf"\b{w}\b"), F.lit(1)).otherwise(F.lit(0))
    return hits


def lang_id(col: str | Column = "text") -> Column:
    """Stopword-profile language ID over {en,de,fr,es}, 'und' if no hits.

    A CASE over per-language stopword hit counts; ties broken by profile
    order. Entirely JVM-side regex — scales as a narrow transform.
    """
    c = F.col(col) if isinstance(col, str) else col
    scores = {lang: _stopword_hits(c, lang) for lang in _LANG_STOPWORDS}
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in ["en", "de", "fr", "es"]:
        s = scores[lang]
        better = s > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, s).otherwise(best_score)
    return best_lang


def fingerprint(col: str | Column = "text") -> Column:
    """Deterministic 64-bit content fingerprint: xxhash64 of the
    whitespace-normalized lowercased text (document identity hash)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.xxhash64(normalized)


def fingerprint_md5(col: str | Column = "text") -> Column:
    """SQL-portable content fingerprint: md5 hex of the whitespace-
    normalized lowercased text — the oracle-checkable sibling of
    ``fingerprint`` (xxhash64), identical normalization."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(F.encode(normalized, "utf-8"))


def gopher_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-rule quality metrics (Rae et al. 2021 §A1.1 heuristics,
    word-level subset) as one narrow JVM-side pass — the
    repetition-and-shape filter a training-data pipeline runs before
    dedup. Adds:

    - ``n_words``              whitespace word count
    - ``mean_word_len``        non-space chars / words
    - ``frac_distinct_words``  |distinct words| / words (repetition)
    - ``dup_2gram_frac``       1 − |distinct word 2-grams| / |2-grams|
    - ``frac_alpha_words``     words containing ≥1 [A-Za-z]
    - ``symbol_word_ratio``    (# + ellipsis occurrences) / words
    - ``gopher_keep``          the conjunctive pass/fail flag

    All arithmetic is double-precision built-ins in a fixed order so an
    ANSI-SQL oracle reproduces it bit-for-bit."""
    c = F.col(text_col)
    words = F.split(F.trim(c), r"\s+")
    df = df.withColumn("__w", words)
    n_words = F.size("__w").cast("double")
    nonspace = F.length(F.regexp_replace(c, r"\s", "")).cast("double")
    # O(n) shifted-zip_with, NOT transform(sequence, i -> element_at):
    # element_at inside an interpreted HOF is O(n) per element, turning
    # the 2-gram build O(n²) per document — measured 15 s vs sub-second
    # over the sf0.1 corpus. (Also guards Spark's sequence(1,0) -> [1,0]
    # descending surprise for single-word docs.)
    two_grams = F.expr(
        "CASE WHEN size(__w) > 1 THEN zip_with("
        "slice(__w, 1, size(__w) - 1), slice(__w, 2, size(__w) - 1), "
        "(a, b) -> concat(a, ' ', b)) "
        "ELSE array() END"
    )
    n_2g = F.size(two_grams).cast("double")
    alpha_words = F.size(F.expr("filter(__w, x -> x rlike '[A-Za-z]')")).cast("double")
    symbols = (
        F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit(r"\.\.\."))
    ).cast("double")
    mean_word_len = F.round(nonspace / n_words, 4)
    frac_distinct = F.round(F.size(F.array_distinct("__w")).cast("double") / n_words, 4)
    dup_2g = F.round(
        F.when(n_2g > 0, F.lit(1.0) - F.size(F.array_distinct(two_grams)).cast("double") / n_2g).otherwise(0.0),
        4,
    )
    frac_alpha = F.round(alpha_words / n_words, 4)
    sym_ratio = F.round(symbols / n_words, 4)
    keep = (
        (n_words >= 5)
        & (n_words <= 100000)
        & (mean_word_len >= 2)
        & (mean_word_len <= 12)
        & (dup_2g <= 0.6)
        & (frac_alpha >= 0.6)
        & (sym_ratio <= 0.1)
    )
    return (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("frac_distinct_words", frac_distinct)
        .withColumn("dup_2gram_frac", dup_2g)
        .withColumn("frac_alpha_words", frac_alpha)
        .withColumn("symbol_word_ratio", sym_ratio)
        .withColumn("gopher_keep", keep)
        .drop("__w")
    )


def word_ngrams(col: str | Column = "text", n: int = 7) -> Column:
    """Array of sliding word n-grams (space-joined) — the probe unit of
    benchmark-decontamination checks. Built with n-1 shifted-array
    ``zip_with`` passes (O(n·words) total; the naive
    ``transform(sequence, i -> slice(words, i, n))`` form is quadratic
    per document — same trap as gopher_metrics' 2-grams). Text is NOT
    normalized: probes must match the raw corpus text in ``contains``."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(c), r"\s+")
    size = F.size(words)
    grams = words
    for j in range(1, n):
        shifted = F.slice(words, j + 1, F.greatest(size - j, F.lit(0)))
        # concat_ws skips the null padding of short shifts; the final
        # slice drops those incomplete trailing grams
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(size >= n, F.slice(grams, 1, size - (n - 1))).otherwise(
        F.expr("array()")
    )


def contamination_counts(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    probe_col: str = "probe",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-probe count of corpus documents containing the probe n-gram
    as an exact substring — benchmark-decontamination (the check run
    before training to drop eval-set overlap). The probe set is small
    by construction (one eval suite), so it broadcasts; the corpus scan
    stays narrow (no shuffle of ``docs``) and the only exchange carries
    |probes| counted rows."""
    from pyspark.sql.functions import broadcast

    corpus = docs.alias("__corpus")
    joined = broadcast(probes).join(
        corpus, F.expr(f"contains(__corpus.{text_col}, {probe_col})"), "left"
    )
    return joined.groupBy(probe_col).agg(
        F.count(F.col(f"__corpus.{id_col}")).alias("n_docs")
    )


def decontaminate_exact(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    probe_col: str = "probe",
) -> DataFrame:
    """DROP every document containing ANY probe n-gram as an exact
    substring — the removal half of benchmark decontamination (GPT-3
    appendix C's 13-gram filter, The Pile's eval-overlap scrub;
    ``contamination_counts`` is the audit half). Planned as one
    broadcast LEFT-ANTI join on a ``contains`` condition: the probe
    set (one eval suite) broadcasts, the corpus streams through
    narrow — no corpus shuffle at any scale. NULL probes are dropped
    (they can never match); NULL texts survive (no content to
    contaminate)."""
    from pyspark.sql.functions import broadcast

    p = probes.where(F.col(probe_col).isNotNull()).select(probe_col)
    return docs.alias("__d").join(
        broadcast(p),
        F.expr(f"contains(__d.{text_col}, {probe_col})"),
        "left_anti",
    )


# PII patterns shared by redact_pii and the DuckDB oracle: valid in
# BOTH Java regex (Spark) and RE2 (DuckDB) — no lookarounds, no
# backreferences (RE2 has neither). Order matters: emails first (they
# contain dots and digits an IP/phone pattern could bite), then IPs,
# then phone shapes (international +digits, or separator-delimited
# NNN-NNN-NNNN — bare digit runs are NOT treated as phones, so ids and
# quantities survive).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d{7,15}\b", "<PHONE>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def redact_pii(col: str | Column = "text") -> Column:
    """Redact emails / IPv4s / phone shapes to typed placeholders — the
    standard pre-training scrub. A chain of built-in ``regexp_replace``
    calls: narrow, JVM-side, whole-stage codegen, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(col: str | Column = "text") -> list[Column]:
    """(n_emails, n_ips, n_phones) occurrence counts, for audit
    reports alongside :func:`redact_pii`. Phones are counted on the
    text with emails/IPs already redacted, mirroring the replace
    chain's order (an IP would otherwise double-count as a separator
    phone)."""
    c = F.col(col) if isinstance(col, str) else col
    n_email = F.regexp_count(c, F.lit(PII_PATTERNS[0][0]))
    after_email = F.regexp_replace(c, PII_PATTERNS[0][0], PII_PATTERNS[0][1])
    n_ip = F.regexp_count(after_email, F.lit(PII_PATTERNS[1][0]))
    after_ip = F.regexp_replace(after_email, PII_PATTERNS[1][0], PII_PATTERNS[1][1])
    n_phone = F.regexp_count(after_ip, F.lit(PII_PATTERNS[2][0])) + F.regexp_count(
        F.regexp_replace(after_ip, PII_PATTERNS[2][0], PII_PATTERNS[2][1]),
        F.lit(PII_PATTERNS[3][0]),
    )
    return [
        n_email.alias("n_emails"),
        n_ip.alias("n_ips"),
        n_phone.alias("n_phones"),
    ]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-budget chunks — the unit
    of context-window packing and RAG ingestion. Returns one row per
    chunk: (id, chunk_idx, n_tokens, chunk text), whitespace-normalized.

    Chunk i covers tokens [i*stride, i*stride + max_tokens) with
    stride = max_tokens - overlap; a document of n <= max_tokens
    tokens (including empty) is one chunk. Pure array expressions over
    ``posexplode`` — narrow, no UDF, no shuffle; output order within a
    doc is the chunk index."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}")
    stride = max_tokens - overlap
    c = F.trim(F.col(text_col))
    toks = F.when(F.length(c) == 0, F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )
    n = F.size(toks)
    # chunks m = ceil((n - max)/stride) + 1 (ceil via floor((a+b-1)/b))
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.floor((n - F.lit(max_tokens) + F.lit(stride - 1)) / F.lit(stride)) + 1
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, max_tokens),
    )
    other = [f for f in df.columns if f not in (text_col,)]
    return df.select(
        *other,
        F.posexplode(chunks).alias("chunk_idx", "__chunk"),
    ).select(
        *other,
        "chunk_idx",
        F.size("__chunk").alias("n_tokens"),
        F.concat_ws(" ", "__chunk").alias(text_col),
    )


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis columns in one narrow pass."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_bpe_tokens", bpe_token_count(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("lang_pred", lang_id(text_col))
        .withColumn("fp", fingerprint(text_col))
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFKC",
    strip_accents: bool = False,
    lowercase: bool = False,
) -> DataFrame:
    """Unicode normalization (the CCNet/Dolma pre-dedup step): NFKC by
    default folds width variants, ligatures and compatibility forms so
    visually-identical strings fingerprint identically; optional accent
    stripping (NFKD → drop combining marks) and lowercasing. REAL
    implementation — stdlib ``unicodedata`` in an Arrow-batched
    ``mapInPandas``; no external model or lib. Narrow transform, no
    shuffle. NULL stays NULL."""
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown unicode form {form!r}")
    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")

    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.StringType())]
    )

    def _norm(s):
        if s is None:
            return None
        s = unicodedata.normalize(form, s)
        if strip_accents:
            s = "".join(
                c
                for c in unicodedata.normalize("NFKD", s)
                if not unicodedata.combining(c)
            )
        return s.lower() if lowercase else s

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [_norm(s) for s in pdf[text_col]]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def c4_line_rules(
    line: Column, min_words_per_line: int = 5
) -> Column:
    """Boolean: does one line survive the C4 line filters (Raffel et
    al. 2020, "Exploring the Limits of Transfer Learning...", §2.2)?
    Kept iff it ends in a terminal mark — period, exclamation mark,
    question mark, or end quotation mark, the exact _END_MARKS set of
    the published C4 implementation (tensorflow_datasets c4_utils) —
    has at least ``min_words_per_line`` words, and does not contain
    the word "javascript" (case-insensitive), the published rule for
    boilerplate JS warnings. Pure built-ins, usable inside ``F.filter``
    over a split array (JVM-side, codegen'd)."""
    t = F.trim(line)
    words = F.size(F.split(t, r"\s+"))
    return (
        (t != F.lit(""))
        & t.rlike(r"""[.!?"]$""")
        & (words >= F.lit(int(min_words_per_line)))
        & ~F.lower(t).contains("javascript")
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_lines: int = 3,
    drop_markers: tuple[str, ...] = ("lorem ipsum", "{"),
) -> DataFrame:
    """C4-style line-level cleaning + document gating (Raffel et al.
    2020 §2.2): split each document on newlines, keep only lines that
    pass ``c4_line_rules``, rebuild the document from survivors, and
    drop documents that (a) keep fewer than ``min_lines`` lines or
    (b) contain any of ``drop_markers`` (the paper drops pages with
    "lorem ipsum" placeholder text and pages containing "{" — source
    code). The paper's third doc-level rule — global three-sentence
    span dedup — is ``dedup.sentence_span_dedup``; its bad-words
    page filter needs a wordlist this repo deliberately does not ship
    (pass the list's disjuncts as extra ``drop_markers`` if you have
    one).

    Scale shape: one narrow pass — split, higher-order ``F.filter``,
    re-join, two boolean gates. No shuffle, no UDF, no explode; the
    line filter runs inside whole-stage codegen over the array.

    Returns the surviving documents with ``text_col`` rebuilt and two
    appended columns (lines_kept, lines_dropped); every other input
    column rides through untouched, so the operator composes inside
    pipelines (e.g. the streaming curation writer) without losing
    metadata. NULL text never survives (a page with no lines has no
    content to keep)."""
    if min_lines < 1:
        raise ValueError(f"min_lines must be >= 1, got {min_lines}")
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda l: c4_line_rules(l, min_words_per_line))
    marker_hit = None
    low = F.lower(F.col(text_col))
    for m in drop_markers:
        hit = low.contains(m.lower())
        marker_hit = hit if marker_hit is None else (marker_hit | hit)
    others = [c for c in df.columns if c != text_col]
    out = df.select(
        *others,
        F.array_join(kept, "\n").alias(text_col),
        F.size(kept).alias("lines_kept"),
        (F.size(lines) - F.size(kept)).alias("lines_dropped"),
        (
            F.lit(False) if marker_hit is None else marker_hit
        ).alias("__marker"),
    )
    # put text back in its original slot so writers relying on column
    # order (createDataFrame round-trips, parquet appends) are stable
    out = out.select(*df.columns, "lines_kept", "lines_dropped", "__marker")
    return out.where(
        (F.col("lines_kept") >= F.lit(int(min_lines))) & ~F.col("__marker")
    ).drop("__marker")


def tfidf_keywords(
    docs: DataFrame,
    top_n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Top-``top_n`` keywords per document by tf-idf (the classic
    Sparck Jones weighting; smooth idf = ln((1+N)/(1+df)) + 1, the
    scikit-learn convention — public): the cheap per-document topic
    signal corpus curation uses for tagging, faceting, and eyeballing
    cluster/dedup output. Terms are lowercased whitespace tokens (the
    pillar's shared tokenization); ``min_df`` drops hapax noise before
    ranking.

    Scale design: one explode → (doc, term) counts groupBy, one term→df
    groupBy (vocabulary-sized, shuffles only distinct terms), one
    equi-join of the per-doc counts against the df table on the term
    key, and a per-doc window cut to ``top_n`` (WindowGroupLimit makes
    it a partial top-k per partition). Nothing is ever per-(doc × vocab);
    the biggest intermediate is the token list itself.

    Returns (id_col, term, tf, df, tfidf rounded 6, rank) — ties break
    lexicographically for cross-engine determinism."""
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    try:
        # the tf table feeds BOTH the df-table branch and the scoring
        # join; the broadcast on the df side defeats exchange reuse, so
        # without the pin the token explode + (doc, term) aggregate
        # execute twice (plan-verified: two parquet scans). Pinned, the
        # narrow (id, term, tf) rows materialize once to executor-local
        # disk — cheaper than a second full explode pass at any corpus
        # size (r11 optimization round, guide §2.4; measured ~25% off
        # the 10x-corpus run).
        tf = tf.localCheckpoint(eager=True)
    except Exception:
        pass
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.col(id_col)).distinct().count()
    scored = (
        tf.join(df_t.where(F.col("df") >= min_df), "term")
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df")))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("__id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            F.col("__id").alias(id_col),
            "term",
            "tf",
            "df",
            F.round("tfidf", 6).alias("tfidf"),
            "rank",
        )
    )


def keyness_terms(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
    alpha: float = 1.0,
    min_count: int = 1,
) -> DataFrame:
    """WHICH terms drifted: the ``top_n`` terms by absolute smoothed
    log-odds ratio between two corpora (corpus-linguistics "keyness",
    Monroe et al. 2008 *Fightin' Words* — public) — the interpretable
    complement of ``dsir.corpus_divergence``'s one-number JS drift.
    Positive log_odds = overrepresented in ``a``; negative = in ``b``.

    score(t) = ln((c_a + α)/(T_a + αV)) − ln((c_b + α)/(T_b + αV))
    with V = |vocabulary of a ∪ b|, so never-seen-on-one-side terms
    stay finite and the measure is symmetric under corpus swap (sign
    flip). ``min_count`` drops terms rarer than that on BOTH sides
    (hapax noise dominates raw log-odds).

    Scale design: one union-and-tag pass, ONE term-keyed groupBy
    (vocabulary-sized output), a 1-row totals aggregate broadcast back,
    and a global top-n by |score| via one ordered limit — the corpus is
    touched exactly once. All inputs to the logs are exact integers, so
    scores are bit-identical cross-engine.

    Returns (term, count_a, count_b, log_odds rounded 6) ordered by
    |log_odds| desc, term asc."""
    if top_n <= 0:
        raise ValueError(f"top_n must be positive, got {top_n}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")

    def _toks(df: DataFrame, tag: int) -> DataFrame:
        return df.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("term"),
            F.lit(tag).alias("__t"),
        ).where(F.col("term") != "")

    counts = (
        _toks(a, 0)
        .unionByName(_toks(b, 1))
        .groupBy("term")
        .agg(
            F.sum(F.when(F.col("__t") == 0, 1).otherwise(0)).alias("count_a"),
            F.sum(F.when(F.col("__t") == 1, 1).otherwise(0)).alias("count_b"),
        )
    )
    tot = counts.agg(
        F.sum("count_a").alias("__ta"),
        F.sum("count_b").alias("__tb"),
        F.count(F.lit(1)).alias("__v"),
    )
    al = float(alpha)
    lo = F.log(
        (F.col("count_a") + F.lit(al))
        / (F.col("__ta") + F.lit(al) * F.col("__v"))
    ) - F.log(
        (F.col("count_b") + F.lit(al))
        / (F.col("__tb") + F.lit(al) * F.col("__v"))
    )
    return (
        counts.where(
            (F.col("count_a") >= min_count) | (F.col("count_b") >= min_count)
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            "count_a",
            "count_b",
            F.round(lo, 6).alias("log_odds"),
        )
        .orderBy(F.abs(F.col("log_odds")).desc(), F.col("term").asc())
        .limit(top_n)
    )
