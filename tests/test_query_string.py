"""Query-string compiler tests: security suite (ported nearly verbatim
from reference tests/security/test_query_security.py:23-103 and
tests/unit/query/test_safe_evaluator.py) plus semantics checks against
DataFrame results."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.plans.query_string import (  # noqa: E402
    QuerySecurityError,
    compile_query_string,
)

BLOCKED = [
    # import / os / subprocess
    "__import__('os').system('ls')",
    "__import__('os').system('rm -rf /')",
    "__import__('subprocess').call(['ls'])",
    "__import__('subprocess').Popen('ls')",
    # eval / exec / compile
    "eval('1+1')",
    "exec('print(1)')",
    "compile('1+1', '', 'eval')",
    # file access
    "open('/etc/passwd').read()",
    "open('/etc/shadow', 'r')",
    "open('file.txt', 'w').write('data')",
    # reflection
    "x.__class__",
    "x.__class__.__bases__",
    "x.__class__.__bases__[0].__subclasses__()",
    "globals()",
    "locals()",
    "vars(x)",
    "dir(x)",
    "getattr(x, 'attr')",
    "setattr(x, 'attr', 'value')",
    "delattr(x, 'attr')",
    # lambdas / comprehensions / misc calls
    "(lambda: 1)()",
    "[i for i in range(10)]",
    "{i: i for i in range(3)}",
    "x.method()",
    "min(x)",
    # walrus / f-string tricks rejected at parse or validation
    "x if True else y",
]


@pytest.mark.parametrize("query", BLOCKED)
def test_blocked_queries(query):
    with pytest.raises((QuerySecurityError, ValueError)):
        compile_query_string(query, columns=["x", "y"])


def test_unknown_tensor_rejected(spark):
    with pytest.raises(ValueError):
        compile_query_string("nope > 1", columns=["x"])


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (0, 1.0, "hi", [1, 2, 3], 0),
            (1, 2.5, "bye", [4, 5], 1),
            (2, -3.0, "hello world", [9], 2),
            (3, 10.0, "hi there", [0, 0], 0),
        ],
        "id long, v double, t string, arr array<int>, label int",
    )


def _ids(df, query, **kw):
    cond = compile_query_string(query, columns=df.columns, **kw)
    return sorted(r["id"] for r in df.filter(cond).select("id").collect())


def test_comparisons_and_boolops(df):
    assert _ids(df, "v > 1.0 and v < 3.0") == [1]
    assert _ids(df, "v > 1.0 or v < -1.0") == [1, 2, 3]
    assert _ids(df, "not (v > 0)") == [2]


def test_chained_comparison(df):
    assert _ids(df, "1.0 <= v <= 2.5") == [0, 1]


def test_arithmetic(df):
    assert _ids(df, "v * 2 == 5.0") == [1]
    assert _ids(df, "v + 1 > 0 and v % 2 == 0") == [3]
    assert _ids(df, "v ** 2 == 9.0") == [2]
    assert _ids(df, "v // 2 == 1") == [1]  # floor(2.5/2)=1


def test_in_operator(df):
    assert _ids(df, "t in ['hi', 'bye']") == [0, 1]
    assert _ids(df, "'hello' in t") == [2]  # substring containment
    assert _ids(df, "5 in arr") == [1]


def test_subscript_and_reductions(df):
    assert _ids(df, "arr[0] == 4") == [1]
    assert _ids(df, "arr[-1] == 3") == [0]
    assert _ids(df, "arr.min == 0") == [3]
    assert _ids(df, "arr.max >= 9") == [2]
    assert _ids(df, "arr.size == 2") == [1, 3]
    assert _ids(df, "arr.mean == 2.0") == [0]


def test_class_label_mapping(df):
    # comparing a class_label column to a name maps name → id
    labels = {"label": ["airplane", "car", "bird"]}
    assert _ids(df, "label == 'car'", class_labels=labels) == [1]
    assert _ids(df, "label in ['airplane', 'bird']", class_labels=labels) == [0, 2, 3]
