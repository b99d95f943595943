"""Property-based typo_match oracle: for random probe words over a
fixed random corpus, the index-backed ``search_type='typo_match'``
must equal a plain-Python reference (tokenize → per-token Levenshtein
≤ d against each doc's token set → AND fold).  The reference shares
no Spark/SQL code — the same independent-oracle spirit as
test_bm25_property, driving the PROBE space while the corpus and its
deletion-key index build once per session.

The probe strategy is biased toward the hard region: words one or two
edits off vocabulary words (where SymSpell completeness is the
theorem under test), plus raw random strings for the no-match side.
"""

from __future__ import annotations

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
_SPLIT = re.compile(r"[^a-z0-9一-鿿]+")


def _corpus() -> list[tuple[int, str]]:
    rng = random.Random(20260816)
    return [
        (i, " ".join(rng.choices(VOCAB, k=rng.randint(1, 25))))
        for i in range(25)
    ]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[-1]


def _py_typo_match(corpus, query: str, d: int) -> set:
    q_tokens = [t for t in _SPLIT.split(query.lower()) if t]
    if not q_tokens:
        return set()
    out = set()
    for i, text in enumerate(corpus_texts(corpus)):
        toks = {t for t in _SPLIT.split(text.lower()) if t}
        if all(any(_lev(q, t) <= d for t in toks) for q in q_tokens):
            out.add(i)
    return out


def corpus_texts(corpus):
    return [text for _, text in corpus]


@pytest.fixture(scope="module")
def typo_index(spark, tmp_path_factory):
    from muller_spark.index.inverted import InvertedIndex

    corpus = _corpus()
    df = spark.createDataFrame(corpus, "_row_id long, text string")
    idx = InvertedIndex.build(
        df, "text", str(tmp_path_factory.mktemp("typoprop") / "idx"),
        typo_keys=2,
    )
    return corpus, idx


def _mutate(word: str, rng: random.Random, edits: int) -> str:
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(edits):
        if not word:
            word = rng.choice(alpha)
            continue
        op = rng.randrange(3)
        i = rng.randrange(len(word))
        if op == 0:    # substitute
            word = word[:i] + rng.choice(alpha) + word[i + 1:]
        elif op == 1:  # delete
            word = word[:i] + word[i + 1:]
        else:          # insert
            word = word[:i] + rng.choice(alpha) + word[i:]
    return word or "a"


probe_strategy = st.one_of(
    # near-vocabulary: seed word + 0/1/2 random edits (the theorem zone)
    st.tuples(
        st.sampled_from(VOCAB), st.integers(0, 2), st.integers(0, 2**32 - 1)
    ).map(lambda t: _mutate(t[0], random.Random(t[2]), t[1])),
    # raw random strings (the no-match side)
    st.text(alphabet="abcdefgh", min_size=1, max_size=8),
)


@settings(
    max_examples=prop_examples(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(probe=probe_strategy, d=st.integers(1, 2))
def test_typo_match_equals_python_reference(typo_index, probe, d):
    corpus, idx = typo_index
    got = {r["id"] for r in idx.search(probe, "typo_match",
                                       max_edits=d).collect()}
    assert got == _py_typo_match(corpus, probe, d), (probe, d)


@settings(
    max_examples=prop_examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    p1=st.sampled_from(VOCAB).map(
        lambda w: _mutate(w, random.Random(hash(w) & 0xFFFF), 1)
    ),
    p2=st.sampled_from(VOCAB),
)
def test_typo_match_multi_token_and_fold(typo_index, p1, p2):
    """Two-token queries: the AND fold over per-token tolerance."""
    corpus, idx = typo_index
    q = f"{p1} {p2}"
    got = {r["id"] for r in idx.search(q, "typo_match",
                                       max_edits=1).collect()}
    assert got == _py_typo_match(corpus, q, 1), q
