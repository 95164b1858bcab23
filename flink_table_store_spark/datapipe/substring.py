"""Cross-document repeated-substring (exact n-gram span) detection and
removal — the "exact substring dedup" of Lee et al., *Deduplicating
Training Data Makes Language Models Better* (ACL 2022), re-expressed
for Spark.

Whole-document dedup (``datapipe.dedup``) misses the dominant
duplication mode in web corpora: long shared SPANS (boilerplate,
licenses, quoted passages) inside otherwise-distinct documents. The
paper's suffix-array approach is single-machine; the distributed
re-expression is the standard token-window equivalent:

1. every document emits its overlapping W-token window keys
   (``transform`` over ``sequence`` — JVM-side, no UDF);
2. one hash-shuffle groups identical windows; a window occurring more
   than once across the corpus is a *repeated gram*;
3. repeated-gram occurrences join back to their (doc, position)s; the
   per-document position sets merge into maximal spans with a single
   ``aggregate`` fold over the sorted positions (array expression —
   still no UDF);
4. optionally the spans are cut out of the token stream
   (``strip_repeated_spans``), keeping the globally FIRST occurrence
   of each gram (min ``(doc_id, pos)``) so exactly one copy of every
   repeated passage survives — the paper's remove-all-but-one policy.

Scale: step 2 is the only wide operation — a single shuffle on the
window key with map-side combine, the same shape as MinHash-LSH
banding. ``key="hash"`` (default) shuffles 8-byte ``xxhash64`` keys
instead of W-token strings, collapsing shuffle volume by ~W×; at
web-corpus scale a 64-bit collision is ~p=n²/2⁶⁵ per gram pair and
only ever *over*-removes one window. ``key="text"`` keeps the exact
string key (used by the oracle-checked correctness query). Span
merging is per-row array math — no per-doc Python, no window
functions, no skew (a doc's gram list is bounded by its own length).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(col: Column) -> Column:
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def _gram_stream(
    df: DataFrame, text_col: str, id_col: str, width: int, key: str
) -> DataFrame:
    """(id, pos, gram-key) for every overlapping W-token window.

    ``pos`` is the 0-based token position of the window start; docs
    shorter than W emit nothing. Windows come from ``word_ngrams``
    (W-1 shifted-array ``zip_with`` passes) — the per-gram ``slice``
    form is the interpreted-HOF trap text.py already documents."""
    from flink_table_store_spark.datapipe.text import word_ngrams

    grams_arr = word_ngrams(F.col(text_col), n=width)
    if key == "hash":
        grams_arr = F.transform(grams_arr, lambda g: F.xxhash64(g))
    return df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(grams_arr).alias("pos", "gram"),
    )


def repeated_gram_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 8,
    key: str = "hash",
) -> DataFrame:
    """Per-document count of repeated W-gram occurrences.

    Returns (id_col, n_repeated, n_grams, rep_fraction) for every
    document with at least one window; ``n_repeated`` counts this
    document's windows whose key occurs ≥2 times corpus-wide."""
    # ONE explode, TWO shuffles: a no-order window over the gram key
    # counts corpus-wide occurrences per row in a single pass, then one
    # map-combined groupBy folds per-document stats. (The groupBy-then-
    # join-back form recomputes the explode 3x and shuffles the
    # occurrence stream by gram anyway — strictly more CPU and bytes.)
    grams = _gram_stream(df, text_col, id_col, width, key)
    gn = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    marked = grams.withColumn("__gn", gn)
    return (
        marked.groupBy("__id")
        .agg(
            F.sum((F.col("__gn") > 1).cast("long")).alias("n_repeated"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("n_repeated"),
            F.col("n_grams"),
            (F.col("n_repeated") / F.col("n_grams")).alias("rep_fraction"),
        )
    )


def _merge_positions_to_spans(pos_arr: Column, width: int) -> Column:
    """Sorted window starts -> maximal merged [start, end) token spans,
    as one ``aggregate`` fold (array<struct<s,e>>): a window starting
    inside-or-adjacent-to the open span extends it, otherwise a new
    span opens."""
    return F.aggregate(
        F.array_sort(pos_arr),
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, p: F.when(
            (F.size(acc) > 0)
            & (p <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(
                            F.element_at(acc, -1)["e"], p + F.lit(width)
                        ).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(p.alias("s"), (p + F.lit(width)).alias("e"))
                ),
            )
        ),
    )


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 8,
    key: str = "hash",
    keep_first: bool = True,
) -> DataFrame:
    """Per-document maximal repeated spans: (id, spans array<struct<s,e>>).

    With ``keep_first`` each repeated gram's globally first occurrence
    (min ``(id, pos)``) is EXEMPT — stripping the returned spans leaves
    exactly one copy of every repeated passage in the corpus. With
    ``keep_first=False`` every occurrence is marked (useful for
    contamination-style hard removal)."""
    # same single-explode window shape as repeated_gram_stats; the
    # keep-first exemption is a second aggregate over the SAME window
    # partition (one shuffle serves both)
    grams = _gram_stream(df, text_col, id_col, width, key)
    w = Window.partitionBy("gram")
    marked = grams.withColumn("__gn", F.count(F.lit(1)).over(w))
    if keep_first:
        marked = marked.withColumn(
            "__first", F.min(F.struct(F.col("__id"), F.col("pos"))).over(w)
        )
    marked = marked.where(F.col("__gn") > 1)
    if keep_first:
        marked = marked.where(
            (F.col("__id") != F.col("__first.__id"))
            | (F.col("pos") != F.col("__first.pos"))
        )
    return (
        marked.groupBy("__id")
        .agg(F.collect_list("pos").alias("__pos"))
        .select(
            F.col("__id").alias(id_col),
            _merge_positions_to_spans(F.col("__pos"), width).alias("spans"),
        )
    )


def strip_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 8,
    key: str = "hash",
    keep_first: bool = True,
) -> DataFrame:
    """Rewrite ``text_col`` with every repeated span's tokens removed
    (whitespace-normalized rejoin). Documents without repeated spans
    pass through unchanged; all other columns are preserved."""
    spans = repeated_spans(df, text_col, id_col, width, key, keep_first)
    toks = _tokens(F.col(text_col))
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("spans"),
            lambda sp: (s["i"] >= sp["s"]) & (s["i"] < sp["e"]),
        ),
    )
    out_text = F.when(
        F.col("spans").isNull(), F.col(text_col)
    ).otherwise(F.concat_ws(" ", F.transform(kept, lambda s: s["t"])))
    other = [c for c in df.columns if c != text_col]
    return (
        df.join(spans, id_col, "left")
        .select(*other, out_text.alias(text_col))
    )
