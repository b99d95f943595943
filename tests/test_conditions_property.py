"""Property-based check of the condition compiler: for random condition
lists and connector sequences, the compiled Catalyst predicate must
select exactly the rows a direct Python evaluation of the reference
semantics selects (left-to-right fold with no precedence, inclusive
BETWEEN, NOT as 5th element — reference ``filter_vectorized.py:600-604``).

Hypothesis drives the *predicate space*; the data is one fixed table so
each example costs a single Spark job.
"""

from __future__ import annotations

import operator
import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import prop_examples  # noqa: E402
from muller_spark.plans.conditions import compile_conditions  # noqa: E402

ROWS = [
    # (rid, x, y, tag)
    (0, 5.0, 0.5, "alpha beta"),
    (1, 12.0, -1.0, "beta gamma"),
    (2, 48.0, 2.5, "gamma delta"),
    (3, 48.0, 0.0, "alpha delta"),
    (4, 100.0, 3.25, "epsilon"),
    (5, -7.0, 1.5, "alpha"),
    (6, 0.0, 2.0, "zeta eta"),
    (7, 33.0, -2.75, "beta"),
]

_PY_OPS = {
    ">": operator.gt, "<": operator.lt, ">=": operator.ge,
    "<=": operator.le, "==": operator.eq, "!=": operator.ne,
}


def _eval_condition(row: dict, cond: tuple) -> bool:
    tensor, op, value = cond[0], cond[1], cond[2]
    negate = len(cond) >= 5 and cond[4] == "NOT"
    v = row[tensor]
    if op == "BETWEEN":
        lo, hi = value
        out = lo <= v <= hi  # inclusive both ends
    elif op == "CONTAINS":
        toks = set(str(v).lower().split())
        out = any(
            all(t in toks for t in part.lower().split())
            for part in str(value).split("||")
        )
    else:
        out = _PY_OPS[op](v, value)
    return (not out) if negate else out


def _eval_fold(row: dict, conditions: list, connectors: list) -> bool:
    acc = _eval_condition(row, conditions[0])
    for conn, cond in zip(connectors, conditions[1:]):
        nxt = _eval_condition(row, cond)
        acc = (acc and nxt) if conn == "AND" else (acc or nxt)
    return acc


_num_cond = st.tuples(
    st.sampled_from(["x", "y"]),
    st.sampled_from([">", "<", ">=", "<=", "==", "!="]),
    st.sampled_from([-7, 0, 0.0, 0.5, 2.0, 12, 33, 48, 100, 1.5]),
    st.just(False),
    st.sampled_from(["", "NOT"]),
)
_between_cond = st.tuples(
    st.sampled_from(["x", "y"]),
    st.just("BETWEEN"),
    st.tuples(st.sampled_from([-10, -2.75, 0, 5, 33]),
              st.sampled_from([0.0, 2.5, 48, 100])),
    st.just(False),
    st.sampled_from(["", "NOT"]),
)
_contains_cond = st.tuples(
    st.just("tag"),
    st.just("CONTAINS"),
    st.sampled_from(["alpha", "beta gamma", "delta||epsilon", "alpha||zeta eta"]),
    st.just(False),
    st.sampled_from(["", "NOT"]),
)
_condition = st.one_of(_num_cond, _between_cond, _contains_cond)


def _normalize(cond: tuple) -> tuple:
    # drop the empty 5th slot so 3/4/5-tuple forms are all exercised
    if cond[4] == "":
        return cond[:3]
    return cond


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        ROWS, "rid long, x double, y double, tag string"
    ).cache()


@settings(
    max_examples=prop_examples(25),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    conds=st.lists(_condition, min_size=1, max_size=4),
    conns=st.lists(st.sampled_from(["AND", "OR"]), min_size=3, max_size=3),
)
def test_compiled_predicate_matches_reference_fold(table, conds, conns):
    conditions = [_normalize(c) for c in conds]
    connectors = conns[: len(conditions) - 1]
    expected = {
        row[0]
        for row in ROWS
        if _eval_fold(dict(zip(["rid", "x", "y", "tag"], row)), conditions, connectors)
    }
    got = {
        r["rid"]
        for r in table.filter(compile_conditions(conditions, connectors)).collect()
    }
    assert got == expected, (conditions, connectors)
