"""Byte-pair-encoding tokenizer: distributed training + Arrow-batched
encoding.

Token counting with a REAL subword vocabulary is the unit every
training-data budget is denominated in; a regex approximation
(text.bpe_token_count) drifts from the actual tokenizer. This module
carries the standard BPE algorithm (Sennrich et al. 2016; the GPT-2
merge-rank encoder) with the two halves split the way tokenizer
trainers actually split them:

- ``train_bpe``: the corpus-sized part — the WORD HISTOGRAM — is one
  map-combined distributed groupBy; the merge loop then runs on the
  driver over the *distinct-word* histogram (exactly how SentencePiece
  / HF trainers work: the histogram is bounded by vocabulary diversity,
  not corpus bytes — 100 TB of web text has ~10⁷ distinct words, a few
  hundred MB). Pair selection is made fully deterministic: max joint
  count, ties broken by the lexicographically smallest pair.
- ``bpe_encode``: inference is embarrassingly parallel — an
  Arrow-batched ``mapInPandas`` with the merge-rank table in the
  closure (≤ vocab_size entries) and a per-batch word→tokens cache
  (web text repeats words heavily; the cache turns per-occurrence work
  into per-distinct-word work within each batch).

Words are split on whitespace after lowercasing (matching the other
datapipe text ops); each word ends with the ``</w>`` marker so decoding
is exact: concatenate tokens, split on the marker, rejoin with spaces —
``bpe_decode`` inverts ``bpe_encode`` on normalized text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _words(col: Column) -> Column:
    return F.split(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "), " ")


def word_histogram(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over the corpus — one explode + one map-combined
    groupBy; empty texts contribute nothing."""
    w = F.explode(_words(F.col(text_col))).alias("word")
    return (
        df.select(w)
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe(
    corpus: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    max_words: int = 5_000_000,
) -> dict:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    ``{"merges": [(a, b), ...], "vocab": sorted tokens}``. The merge
    loop maintains pair→count and pair→{word ids} incrementally, so
    each merge touches only the words containing the merged pair —
    O(affected words) per merge, not O(histogram).

    ``min_count`` drops sub-threshold words from the HISTOGRAM only
    (they still encode fine at inference — into finer pieces);
    ``max_words`` is a loud guard on driver memory, not a silent cap."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    hist_df = word_histogram(corpus, text_col)
    if min_count > 1:
        hist_df = hist_df.where(F.col("cnt") >= min_count)
    # one corpus scan total: pin the histogram before the guard count
    # so the collect below reuses it instead of re-running the explode
    try:
        hist_df = hist_df.localCheckpoint(eager=True)
    except Exception:
        pass
    n_words = hist_df.count()
    if n_words > max_words:
        raise ValueError(
            f"word histogram has {n_words} entries > max_words="
            f"{max_words}; raise min_count (or max_words if the driver "
            "has the memory)"
        )
    hist = [(r["word"], int(r["cnt"])) for r in hist_df.collect()]
    return train_bpe_from_histogram(hist, n_merges)


def train_bpe_from_histogram(
    hist: list[tuple[str, int]], n_merges: int
) -> dict:
    """The driver-side merge loop over a (word, count) histogram —
    split out so the incremental bookkeeping can be property-tested
    against a naive recount-everything reference without a cluster."""
    # symbol sequences per distinct word, weighted by occurrence count
    words = [tuple(w) + (EOW,) for w, _ in hist]
    counts = [c for _, c in hist]

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        c = counts[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(i)

    # lazy max-heap over pair counts: every count change pushes a new
    # entry; stale entries are skipped at pop time. Selection is then
    # O(log |pairs|) amortized per merge instead of a full dict scan
    # (O(n_merges · |pairs|) — at 10⁷ distinct words and a 32k-merge
    # vocabulary that scan is the trainer's real bottleneck). Heap
    # order (-count, pair) reproduces the deterministic tie-break:
    # max count, then lexicographically smallest pair.
    import heapq

    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def _bump(p: tuple[str, str], c: int) -> None:
        if c > 0:
            heapq.heappush(heap, (-c, p))

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p) == -negc:
                pair = p
                break
        if pair is None:
            break
        merges.append(pair)
        joined = pair[0] + pair[1]
        for i in list(pair_words.get(pair, ())):
            syms = words[i]
            c = counts[i]
            # remove this word's contribution to all its pair stats,
            # rewrite the word, re-add — simple and exactly correct
            # (overlapping-pair accounting is where clever deltas rot)
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                else:
                    _bump(p, pair_counts[p])
                s = pair_words.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del pair_words[p]
            out = []
            j = 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == pair[0]
                    and syms[j + 1] == pair[1]
                ):
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = tuple(out)
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(i)
                _bump(p, pair_counts[p])
    vocab = set()
    for syms in words:
        vocab.update(syms)
    return {"merges": merges, "vocab": sorted(vocab)}


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style merge-rank encoding of one word: repeatedly merge
    the lowest-rank adjacent pair. Equivalent to replaying the merge
    list in training order."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_j = None, -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        a, b = syms[best_j], syms[best_j + 1]
        joined = a + b
        out = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(joined)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Add ``out_col`` (array<string>) — the BPE token sequence of each
    document — and ``bpe_len`` (its length). Arrow-batched; a per-batch
    word→tokens cache makes the cost per DISTINCT word, not per
    occurrence. NULL text encodes to an empty sequence."""
    import pandas as pd

    from pyspark.sql import types as T

    ranks = {p: i for i, p in enumerate(model["merges"])}
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(out_col, T.ArrayType(T.StringType())),
            T.StructField("bpe_len", T.LongType()),
        ]
    )

    def _run(batches):
        cache: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return []
            toks: list[str] = []
            for w in text.strip().lower().split():
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            encoded = [enc(t) for t in pdf[text_col]]
            pdf = pdf.copy()
            pdf[out_col] = encoded
            pdf["bpe_len"] = pd.Series(
                [len(e) for e in encoded], dtype="int64", index=pdf.index
            )
            yield pdf

    return df.mapInPandas(_run, schema=schema)


def bpe_decode(tokens_col: str | Column = "bpe_tokens") -> Column:
    """Inverse of ``bpe_encode`` on normalized text: tokens concatenate
    into words at ``</w>`` markers, words rejoin with single spaces.
    Contract: text containing the LITERAL marker string ``</w>``
    decodes with that substring as a word break (the usual
    marker-token hazard; byte-level BPE avoids it at the cost of a
    byte alphabet — out of scope here)."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.trim(
        F.replace(
            F.concat_ws("", c), F.lit(EOW), F.lit(" ")
        )
    )
