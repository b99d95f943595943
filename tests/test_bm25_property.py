"""Property-based BM25 oracle: for random queries over a fixed random
corpus, the index-backed Spark BM25 must match a pure-Python reference
implementation (tokenize → tf/df/dl → Robertson formula) to the round5
tolerance.  The Python reference shares only the published formula —
none of the Spark/SQL code paths — so this is an independent oracle in
the same spirit as tests/test_known_answers.py, but over a driven input
space instead of one pinned example.

Hypothesis drives the QUERY space; the corpus and its index build once
per session so each example costs one bm25() call.
"""

from __future__ import annotations

import math
import os
import random
import re
import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import prop_examples  # noqa: E402

VOCAB = [
    "spark", "query", "join", "scan", "vector", "hash",
    "batch", "merge", "filter", "window", "stream", "table",
]


def _corpus() -> list[tuple[int, str]]:
    rng = random.Random(20260814)
    return [
        (i, " ".join(rng.choices(VOCAB, k=rng.randint(1, 40))))
        for i in range(30)
    ]


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    """Independent reference: plain-Python BM25 over the same corpus."""
    split = re.compile(r"[^a-z0-9一-鿿]+")
    toks = {i: [t for t in split.split(txt.lower()) if t] for i, txt in corpus}
    dl = {i: len(ts) for i, ts in toks.items() if ts}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    scores: dict[int, float] = {}
    for term in dict.fromkeys(terms):
        df = sum(1 for ts in toks.values() if term in ts)
        if not df:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, ts in toks.items():
            tf = ts.count(term)
            if tf:
                w = idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * dl[i] / avgdl)
                )
                scores[i] = scores.get(i, 0.0) + w
    return {i: round(s, 5) for i, s in scores.items()}


@pytest.fixture(scope="module")
def bm25_index(spark, tmp_path_factory):
    from muller_spark.index.inverted import InvertedIndex

    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    return InvertedIndex.build(
        df, "text", str(tmp_path_factory.mktemp("bm25prop") / "idx"),
        id_col="doc_id", positions=True,
    )


@settings(
    max_examples=prop_examples(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    terms=st.lists(st.sampled_from(VOCAB + ["absent"]), min_size=1, max_size=4)
)
def test_bm25_matches_python_reference(bm25_index, terms):
    expected = _py_bm25(_corpus(), terms)
    k = max(len(expected), 1)
    got = {
        r["id"]: r["score"]
        for r in bm25_index.bm25(" ".join(terms), k=k).collect()
    }
    assert set(got) == set(expected)
    for i, s in expected.items():
        assert got[i] == pytest.approx(s, abs=2e-5), (terms, i)
