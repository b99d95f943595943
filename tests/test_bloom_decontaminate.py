"""bloom_decontaminate: exactness under any bloom configuration.

The bloom bitmap is a PREFILTER — false positives cost extra join
traffic in the confirm stage, never a wrong answer; false negatives
are impossible.  These tests pin that contract against a pure-Python
oracle, including a deliberately tiny bitmap where almost every doc is
a bloom candidate.
"""

from __future__ import annotations

import re

import pytest

from muller_spark.operators.dedup import bloom_decontaminate

_SPLIT = re.compile(r"[^a-z0-9一-鿿]+")


def _windows(text, n):
    if text is None:
        return set()
    norm = " ".join(str(text).lower().split())
    toks = [t for t in _SPLIT.split(norm) if t]
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _py_clean_ids(train, test, n, min_overlap):
    test_set = set()
    for _, text in test:
        test_set |= _windows(text, n)
    clean = []
    for doc_id, text in train:
        if len(_windows(text, n) & test_set) < min_overlap:
            clean.append(doc_id)
    return sorted(clean)


TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely unrelated corpus text about spark shuffles"),
    (3, "quick brown fox jumps over fences all day long"),
    (4, None),
    (5, ""),
    (6, "fox"),  # shorter than n: zero windows, always clean
    (7, "the quick brown fox jumps over the lazy dog again and again"),
]
TEST = [
    (100, "a benchmark sentence with the quick brown fox jumps over the lazy dog inside"),
    (101, "spark shuffles are expensive"),
]


def _dfs(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    return train, test


@pytest.mark.parametrize(
    "num_bits,num_hashes",
    [(1 << 20, 4), (64, 2), (32, 1), (1 << 12, 8)],
)
def test_exact_under_any_bloom_config(spark, num_bits, num_hashes):
    train, test = _dfs(spark)
    for n, mo in [(3, 1), (3, 3), (2, 2)]:
        got = sorted(
            r["doc_id"]
            for r in bloom_decontaminate(
                train, test, "text", "doc_id", n=n, min_overlap=mo,
                num_bits=num_bits, num_hashes=num_hashes,
            ).collect()
        )
        assert got == _py_clean_ids(TRAIN, TEST, n, mo), (n, mo)


def test_null_empty_short_docs_always_kept(spark):
    train, test = _dfs(spark)
    got = {
        r["doc_id"]
        for r in bloom_decontaminate(
            train, test, "text", "doc_id", n=3, min_overlap=1
        ).collect()
    }
    assert {4, 5, 6} <= got


def test_empty_heldout_set_keeps_everything(spark):
    train, _ = _dfs(spark)
    empty = spark.createDataFrame([], "doc_id long, text string")
    got = sorted(
        r["doc_id"]
        for r in bloom_decontaminate(
            train, empty, "text", "doc_id", n=3, min_overlap=1
        ).collect()
    )
    assert got == [1, 2, 3, 4, 5, 6, 7]


def test_all_original_columns_survive(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "s1", 22)],
        "doc_id long, text string, source string, n_chars int",
    )
    test = spark.createDataFrame([(9, "no overlap here")], "doc_id long, text string")
    out = bloom_decontaminate(train, test, "text", "doc_id", n=3, min_overlap=1)
    assert out.columns == ["doc_id", "text", "source", "n_chars"]
    assert out.count() == 1


def test_plan_prefilter_is_mapside_and_unhinted(spark):
    """The bloom stage must run as an Arrow map (MapInPandas) with no
    forced broadcast hint anywhere — the test-window set scales with
    the held-out corpus, so AQE must pick the confirm-join strategy."""
    train, test = _dfs(spark)
    out = bloom_decontaminate(train, test, "text", "doc_id", n=3, min_overlap=1)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan
    assert "ResolvedHint" not in plan
