"""C4 line-level cleaning (Raffel et al. 2020 §2.2) — rule-by-rule."""

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.datapipe.text import c4_clean


def _clean(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in c4_clean(df, **kw).collect()}


GOOD = "this line has enough words to pass."


def test_c4_line_rules(spark):
    doc = "\n".join(
        [
            GOOD,                                   # kept
            "too short.",                           # < 5 words
            "no terminal punctuation at all here",  # no punct
            "ends with a question mark does it?",   # kept
            'he said "it ends in a quote."',        # kept (ends in ")
            'lines may end in a bare quote too "',   # kept (end-mark set)
            "please enable JavaScript to view this page.",  # javascript
            "",                                     # empty
            "   ",                                  # whitespace only
            "exclamation lines are fine as well!",  # kept
        ]
    )
    out = _clean(spark, [(1, doc)], min_lines=1)
    kept = out[1]["text"].split("\n")
    assert kept == [
        GOOD,
        "ends with a question mark does it?",
        'he said "it ends in a quote."',
        'lines may end in a bare quote too "',
        "exclamation lines are fine as well!",
    ]
    assert out[1]["lines_kept"] == 5 and out[1]["lines_dropped"] == 5


def test_c4_doc_gates(spark):
    three_good = "\n".join([GOOD] * 3)
    out = _clean(
        spark,
        [
            (1, three_good),                          # survives
            (2, "\n".join([GOOD] * 2)),               # < min_lines
            (3, three_good + "\nlorem ipsum dolor."), # marker
            (4, three_good + "\nif (x) { return; }"), # code brace
            (5, None),                                # NULL text
        ],
        min_lines=3,
    )
    assert sorted(out) == [1]
    # markers are case-insensitive and configurable
    out2 = _clean(
        spark,
        [(1, three_good + "\nLOREM IPSUM."), (2, three_good)],
        min_lines=3,
        drop_markers=("lorem ipsum",),
    )
    assert sorted(out2) == [2]
    # empty marker tuple disables doc-marker gating entirely
    out3 = _clean(
        spark,
        [(1, three_good + "\n{ }")],
        min_lines=3,
        drop_markers=(),
    )
    assert sorted(out3) == [1]


def test_c4_validation_and_word_threshold(spark):
    with pytest.raises(ValueError, match="min_lines"):
        _clean(spark, [(1, GOOD)], min_lines=0)
    out = _clean(
        spark,
        [(1, "one two three.\n" + GOOD)],
        min_words_per_line=3,
        min_lines=2,
    )
    assert out[1]["lines_kept"] == 2
