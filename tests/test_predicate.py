"""Pure-Python predicate AST tests (no Spark): stats-based file skipping
mirrors the reference's leaf set (PredicateBuilder.java:76-230)."""

from __future__ import annotations

from flink_table_store_spark import predicate as P


def stats(lo, hi, nulls=0):
    return {"x": {"min": lo, "max": hi, "nulls": nulls}}


def test_equal_skips_out_of_range():
    assert P.equal("x", 5).test(stats(1, 3), 10) is False
    assert P.equal("x", 2).test(stats(1, 3), 10) is True


def test_comparisons():
    assert P.less_than("x", 1).test(stats(1, 3), 10) is False
    assert P.less_or_equal("x", 1).test(stats(1, 3), 10) is True
    assert P.greater_than("x", 3).test(stats(1, 3), 10) is False
    assert P.greater_or_equal("x", 3).test(stats(1, 3), 10) is True


def test_between_and_in():
    assert P.between("x", 4, 9).test(stats(1, 3), 10) is False
    assert P.isin("x", [7, 9]).test(stats(1, 3), 10) is False
    assert P.isin("x", [2, 9]).test(stats(1, 3), 10) is True


def test_null_checks():
    assert P.is_null("x").test(stats(1, 3, nulls=0), 10) is False
    assert P.is_null("x").test(stats(1, 3, nulls=1), 10) is True
    assert P.is_not_null("x").test(stats(None, None, nulls=10), 10) is False


def test_compound():
    pred = P.and_(P.greater_than("x", 0), P.less_than("x", 2))
    assert pred.test(stats(1, 3), 10) is True
    assert P.and_(P.equal("x", 0), P.equal("x", 2)).test(stats(1, 3), 10) is False
    assert P.or_(P.equal("x", 0), P.equal("x", 2)).test(stats(1, 3), 10) is True


def test_unknown_column_never_skips():
    # missing stats => cannot prune (must read the file)
    assert P.equal("y", 5).test(stats(1, 3), 10) is True


def test_string_prefix():
    s = {"x": {"min": "apple", "max": "banana", "nulls": 0}}
    assert P.starts_with("x", "zz").test(s, 10) is False
    assert P.starts_with("x", "app").test(s, 10) is True


def test_partition_predicate():
    pred = P.equal("pt", "a")
    assert pred.test_partition({"pt": "a"}) is True
    assert pred.test_partition({"pt": "b"}) is False
    assert P.raw(None).test_partition({"pt": "b"}) is True


# --- property check: value-set pruning is never wrong ----------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_OPS = ["=", "<>", "<", "<=", ">", ">=", "in", "not_in", "between"]


def _row_matches(op, v, lits):
    return {
        "=": lambda: v == lits[0],
        "<>": lambda: v != lits[0],
        "<": lambda: v < lits[0],
        "<=": lambda: v <= lits[0],
        ">": lambda: v > lits[0],
        ">=": lambda: v >= lits[0],
        "in": lambda: v in lits,
        "not_in": lambda: v not in lits,
        "between": lambda: lits[0] <= v <= lits[1],
    }[op]()


@settings(max_examples=300, deadline=None)
@given(
    vals=st.lists(st.integers(-20, 20), min_size=1, max_size=8, unique=True),
    op=st.sampled_from(_OPS),
    lits=st.lists(st.integers(-25, 25), min_size=2, max_size=3),
)
def test_value_set_pruning_is_conservative(vals, op, lits):
    """If ANY value in the file's distinct set matches the predicate,
    Leaf.test must keep the file (range-bitmap/bsi projection can prune
    aggressively but never wrongly)."""
    if op == "between":
        lits = sorted(lits)[:2]
    s = {
        "x": {
            "min": min(vals),
            "max": max(vals),
            "nulls": 0,
            "values": sorted(vals),
        }
    }
    leaf = P.Leaf(op, "x", tuple(lits if op in ("in", "not_in") else lits[:2]))
    any_match = any(_row_matches(op, v, leaf.literals) for v in vals)
    verdict = leaf.test(s, len(vals))
    if any_match:
        assert verdict is True  # never prune a file with a matching row
    else:
        # with the full distinct set, pruning is EXACT for these ops
        assert verdict is False


def test_value_set_bytes_decimal_literals_not_wrongly_pruned():
    """ADVICE r2: value sets are persisted JSON-safe (bytes→base64,
    Decimal→float by fileindex._safe). Raw bytes/Decimal literals must be
    normalized into the SAME domain before membership tests, or '=' / 'in'
    silently return False and wrongly prune the file."""
    import base64
    from decimal import Decimal

    stored = base64.b64encode(b"abc").decode("ascii")
    s = {"x": {"min": None, "max": None, "nulls": 0, "values": [stored]}}
    assert P.equal("x", b"abc").test(s, 10) is True
    assert P.isin("x", [b"abc", b"zzz"]).test(s, 10) is True
    assert P.equal("x", b"other").test(s, 10) is False

    s2 = {"x": {"min": 1.0, "max": 3.5, "nulls": 0, "values": [1.0, 3.5]}}
    assert P.equal("x", Decimal("3.5")).test(s2, 10) is True
    assert P.equal("x", Decimal("2.0")).test(s2, 10) is False
    assert P.greater_than("x", Decimal("3.0")).test(s2, 10) is True
