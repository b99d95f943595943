"""Condition-list compiler unit tests (reference
tests/integration/query/test_filter_vectorized.py:27-127 semantics:
left-to-right fold, inclusive BETWEEN, NOT, CONTAINS token match)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.plans.conditions import (  # noqa: E402
    compile_conditions,
    tokenize_query,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [(i, i % 5, i % 100, ["hi", "bye", "oops", "hello", "world"][i % 5])
            for i in range(1000)]
    return spark.createDataFrame(rows, "id long, test long, test2 long, text string")


def _ids(df, conds, conns):
    return sorted(
        r["id"] for r in df.filter(compile_conditions(conds, conns)).select("id").collect()
    )


def _expect(df, fn):
    return sorted(r["id"] for r in df.collect() if fn(r))


def test_simple_ge(df):
    assert _ids(df, [("test", ">=", 2)], []) == _expect(df, lambda r: r["test"] >= 2)


def test_left_to_right_fold_no_precedence(df):
    # (test > 2 AND test <= 4) OR NOT(test2 < 60) — fold is left-to-right
    got = _ids(
        df,
        [("test", ">", 2), ("test", "<=", 4), ("test2", "<", 60, None, "NOT")],
        ["AND", "OR"],
    )
    want = _expect(
        df, lambda r: ((r["test"] > 2 and r["test"] <= 4) or not (r["test2"] < 60))
    )
    assert got == want


def test_or_then_and_binds_left(df):
    # a OR b AND c must evaluate as (a OR b) AND c, not a OR (b AND c)
    got = _ids(
        df,
        [("test", "==", 0), ("test", "==", 1), ("test2", "<", 50)],
        ["OR", "AND"],
    )
    want = _expect(
        df, lambda r: (r["test"] == 0 or r["test"] == 1) and r["test2"] < 50
    )
    assert got == want
    # and differs from the SQL-precedence reading on this data
    sql_precedence = _expect(
        df, lambda r: r["test"] == 0 or (r["test"] == 1 and r["test2"] < 50)
    )
    assert got != sql_precedence


def test_between_inclusive(df):
    got = _ids(df, [("test2", "BETWEEN", (3, 5))], [])
    want = _expect(df, lambda r: 3 <= r["test2"] <= 5)
    assert got == want


def test_not_on_equality(df):
    got = _ids(df, [("text", "==", "hi", None, "NOT")], [])
    want = _expect(df, lambda r: r["text"] != "hi")
    assert got == want


def test_like_regex_search(df):
    got = _ids(df, [("text", "LIKE", "h[ei]")], [])
    want = _expect(df, lambda r: r["text"] in ("hi", "hello"))  # 'h[ei]' matches both
    assert got == want


def test_contains_and_or_groups(df):
    got = _ids(df, [("text", "CONTAINS", "hi||world")], [])
    want = _expect(df, lambda r: r["text"] in ("hi", "world"))
    assert got == want


def test_tokenize_query():
    assert tokenize_query("hi||world") == [["hi"], ["world"]]
    assert tokenize_query("Big Cat") == [["big", "cat"]]
    assert tokenize_query("a b||c d") == [["a", "b"], ["c", "d"]]
    assert tokenize_query("") == []


def test_like_python_only_regex_falls_back(df):
    """Named-group syntax Java rejects runs under real Python re."""
    from muller_spark.plans.conditions import needs_python_regex

    assert needs_python_regex(r"(?P<w>h[ei])")
    got = _ids(df, [("text", "LIKE", r"(?P<w>h[ei])")], [])
    want = _expect(df, lambda r: r["text"] in ("hi", "hello"))
    assert got == want


def test_like_common_regex_stays_jvm_side(df):
    """Plain patterns must compile to rlike (codegen path), not a UDF."""
    from muller_spark.plans.conditions import compile_conditions, needs_python_regex

    assert not needs_python_regex("h[ei]")
    plan = df.filter(compile_conditions([("text", "LIKE", "h[ei]")], []))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "RLIKE" in plan.upper()


def test_like_null_semantics_identical_across_regex_paths(spark):
    """NULL text never matches LIKE and survives NOT LIKE on BOTH regex
    engines (round-6 review: rlike's SQL-null previously dropped the
    row after ~, while the pandas path's na=False kept it)."""
    df = spark.createDataFrame([(1, "abc"), (2, None)], "id long, t string")
    for pattern in ("a", "(?P<g>a)"):  # rlike path, python-re path
        pos = compile_conditions([("t", "LIKE", pattern)], [])
        assert [r["id"] for r in df.filter(pos).collect()] == [1]
        neg = compile_conditions([("t", "LIKE", pattern, False, "NOT")], [])
        assert [r["id"] for r in df.filter(neg).collect()] == [2]


def test_four_tuple_not_rejected(spark):
    """A misplaced 'NOT' in position 4 (the use_inverted_index slot)
    must raise, not silently invert nothing and flip index routing."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="position 5"):
        compile_conditions([("t", "==", 1, "NOT")], [])
