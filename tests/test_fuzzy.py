"""SymSpell deletion-key fuzzy matching: key-set theorem coverage
(sub/ins/del all caught, distance-2 false candidates filtered), parity
with brute-force Levenshtein, and the guard rails."""

from __future__ import annotations

import random

import pytest

from muller_spark.index.fuzzy import (
    deletion_keys,
    fuzzy_term_docs,
    fuzzy_terms_docs,
)


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


def test_deletion_keys_shape():
    assert set(deletion_keys("abc")) == {"abc", "bc", "ac", "ab"}
    assert set(deletion_keys("a")) == {"a", ""}
    # depth 2: all 0/1/2-char deletions
    assert set(deletion_keys("abc", max_edits=2)) == {
        "abc", "bc", "ac", "ab", "a", "b", "c"
    }


def test_key_intersection_is_necessary_for_distance_1():
    """Random word pairs: whenever lev ≤ 1, key sets intersect (the
    completeness direction the join relies on)."""
    rng = random.Random(53)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 6)))
        for _ in range(300)
    ]
    for a in words[:60]:
        for b in words[:60]:
            if _lev(a, b) <= 1:
                assert set(deletion_keys(a)) & set(deletion_keys(b)), (a, b)


@pytest.mark.parametrize("probe,expect", [
    ("sow", {"row", "slow"}),        # substitution + insertion neighbor
    ("scan", {"scan"}),              # exact hit
    ("scans", {"scan"}),             # deletion neighbor
    ("zzzz", set()),                 # nothing close
])
def test_fuzzy_docs_match_bruteforce(spark, probe, expect):
    rows = [
        (1, "slow scan over the table"),
        (2, "row by row merge"),
        (3, "vector window batch"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]
        for r in fuzzy_term_docs(df, "text", "doc_id", probe).collect()
    }
    brute = set()
    for did, text in rows:
        toks = {t for t in text.split() if t}
        if any(_lev(t, probe) <= 1 for t in toks):
            brute.add(did)
        assert {t for t in toks if _lev(t, probe) <= 1} <= expect | set()
    assert got == brute


def test_distance_2_pair_is_rejected():
    """'ab' and 'ba' share deletion keys but are distance 2 — the
    verify filter must reject them."""
    assert set(deletion_keys("ab")) & set(deletion_keys("ba"))
    assert _lev("ab", "ba") == 2


def test_fuzzy_docs_distance_2_not_returned(spark):
    df = spark.createDataFrame([(1, "ab here")], "doc_id long, text string")
    got = fuzzy_term_docs(df, "text", "doc_id", "ba").collect()
    assert got == []


def test_max_edits_guard(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_edits"):
        fuzzy_term_docs(df, "text", "doc_id", "x", max_edits=3)


def test_empty_probe_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        fuzzy_term_docs(df, "text", "doc_id", "")


def test_overlong_probe_rejected(spark):
    """r10 ADVICE: a probe longer than max_token_len used to make the
    vocabulary length window empty and silently return zero rows even
    on a verbatim hit — now a loud error."""
    long = "a" * 30
    df = spark.createDataFrame([(1, long)], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_token_len"):
        fuzzy_term_docs(df, "text", "doc_id", long)
    got = fuzzy_term_docs(
        df, "text", "doc_id", long, max_token_len=31
    ).collect()  # lifting the cap finds the verbatim hit
    assert [r["doc_id"] for r in got] == [1]


# ---------------------------------------------------------------------------
# multi-probe (round 11): fuzzy_terms_docs over a probe table
# ---------------------------------------------------------------------------

_CORPUS = [
    (1, "slow scan over the table"),
    (2, "row by row merge"),
    (3, "vector window batch"),
    (4, "the vectr pipeline lane"),
    (5, "zzz qqq"),
]


def _brute_pairs(probes):
    pairs = set()
    for did, text in _CORPUS:
        for t in {t for t in text.split() if t}:
            for p in probes:
                if _lev(t, p.lower()) <= 1:
                    pairs.add((p.lower(), did))
    return pairs


def test_fuzzy_terms_docs_matches_bruteforce(spark):
    probes = ["sow", "vector", "lanes", "nothing"]
    df = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    got = {
        (r["probe"], r["doc_id"])
        for r in fuzzy_terms_docs(df, "text", "doc_id", probes).collect()
    }
    assert got == _brute_pairs(probes)


def test_fuzzy_terms_docs_dataframe_probes_and_no_broadcast(spark):
    df = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    probes_df = spark.createDataFrame(
        [("SOW",), ("vector",), ("sow",)], "term string"
    )
    got = {
        (r["probe"], r["doc_id"])
        for r in fuzzy_terms_docs(
            df, "text", "doc_id", probes_df, broadcast_probes=False
        ).collect()
    }
    assert got == _brute_pairs(["sow", "vector"])


def test_fuzzy_terms_docs_single_probe_agrees_with_sugar(spark):
    df = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    multi = {
        r["doc_id"]
        for r in fuzzy_terms_docs(df, "text", "doc_id", ["sow"]).collect()
    }
    single = {
        r["doc_id"]
        for r in fuzzy_term_docs(df, "text", "doc_id", "sow").collect()
    }
    assert multi == single


def test_fuzzy_terms_docs_guards(spark):
    df = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one"):
        fuzzy_terms_docs(df, "text", "doc_id", [])
    with pytest.raises(ValueError, match="non-empty"):
        fuzzy_terms_docs(df, "text", "doc_id", ["ok", ""])
    with pytest.raises(ValueError, match="max_token_len"):
        fuzzy_terms_docs(df, "text", "doc_id", ["a" * 30])
    empty_df = spark.createDataFrame([], "term string")
    with pytest.raises(ValueError, match="empty"):
        fuzzy_terms_docs(df, "text", "doc_id", empty_df)
    long_df = spark.createDataFrame([("a" * 30,)], "term string")
    with pytest.raises(ValueError, match="max_token_len"):
        fuzzy_terms_docs(df, "text", "doc_id", long_df)


# ---------------------------------------------------------------------------
# distance 2 (round 11): depth-2 symmetric deletes
# ---------------------------------------------------------------------------

def test_key_intersection_is_necessary_for_distance_2():
    """Random word pairs: whenever lev ≤ 2, the depth-2 deletion
    neighborhoods intersect (the completeness direction for d=2)."""
    rng = random.Random(59)
    words = [
        "".join(rng.choice("abc") for _ in range(rng.randrange(1, 7)))
        for _ in range(200)
    ]
    for a in words[:50]:
        ka = set(deletion_keys(a, max_edits=2))
        for b in words[:50]:
            if _lev(a, b) <= 2:
                assert ka & set(deletion_keys(b, max_edits=2)), (a, b)


def test_fuzzy_docs_distance_2_matches_bruteforce(spark):
    rows = [
        (1, "slow scan over the table"),
        (2, "row by row merge"),
        (3, "vector window batch"),
        (4, "the vectr pipeline lane"),
        (5, "sc and nothing else"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for probe in ("sow", "vecto", "scan", "zzzz"):
        got = {
            r["doc_id"]
            for r in fuzzy_term_docs(
                df, "text", "doc_id", probe, max_edits=2
            ).collect()
        }
        brute = {
            did for did, text in rows
            if any(_lev(t, probe) <= 2 for t in text.split() if t)
        }
        assert got == brute, probe


def test_fuzzy_terms_docs_distance_2_matches_bruteforce(spark):
    probes = ["sow", "vecto", "zzzzzz"]
    df = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    got = {
        (r["probe"], r["doc_id"])
        for r in fuzzy_terms_docs(
            df, "text", "doc_id", probes, max_edits=2
        ).collect()
    }
    brute = set()
    for did, text in _CORPUS:
        for t in {t for t in text.split() if t}:
            for p in probes:
                if _lev(t, p) <= 2:
                    brute.add((p, did))
    assert got == brute
