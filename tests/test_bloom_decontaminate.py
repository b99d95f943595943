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



def test_canonical_keep_best_prefers_score_then_min_id(spark):
    from muller_spark.operators.dedup import canonical_keep_best

    # cluster {1,2,3}: 2 has the best score; cluster {4,5}: tie -> min id;
    # cluster {6,7}: all-NULL scores -> min id fallback; 8 is a singleton
    df = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0),
         (4, 7.0), (5, 7.0),
         (6, None), (7, None),
         (8, None)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 7)], "id_a long, id_b long"
    )
    got = {r["id"]: r for r in canonical_keep_best(
        df, pairs, "doc_id", "score"
    ).collect()}
    assert len(got) == 8
    assert all(got[i]["keep_id"] == 2 for i in (1, 2, 3))
    assert [got[i]["keep"] for i in (1, 2, 3)] == [False, True, False]
    assert all(got[i]["keep_id"] == 4 for i in (4, 5))
    assert all(got[i]["keep_id"] == 6 for i in (6, 7))
    assert got[8]["keep"] and got[8]["keep_id"] == 8


def test_canonical_keep_best_null_never_beats_scored(spark):
    from muller_spark.operators.dedup import canonical_keep_best

    df = spark.createDataFrame(
        [(1, None), (2, 0.0001)], "doc_id long, score double"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = {r["id"]: r for r in canonical_keep_best(
        df, pairs, "doc_id", "score"
    ).collect()}
    assert got[1]["keep_id"] == 2  # min-id NULL doc loses to any score



def test_lsh_tuning_report_arithmetic(spark):
    from muller_spark.operators.dedup import (
        lsh_tuning_report, minhash_lsh_pairs, ngram_jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog by the river"
    rows = [(i, base + f" variant {i % 4}") for i in range(40)]
    rows += [(100 + i, f"totally unrelated text number {i} about topic {i}")
             for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {r["bands"]: r for r in lsh_tuning_report(
        df, "text", "doc_id", threshold=0.5, configs=((64, 16),)
    ).collect()}
    r = got[16]
    truth = {(p["id_a"], p["id_b"]) for p in ngram_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold=0.5, max_shingle_freq=None
    ).collect()}
    cand = {(p["id_a"], p["id_b"]) for p in minhash_lsh_pairs(
        df, "text", "doc_id", num_hashes=64, bands=16, threshold=0.0
    ).collect()}
    hit = truth & cand
    assert r["n_truth"] == len(truth) and r["n_candidates"] == len(cand)
    assert r["n_hit"] == len(hit)
    # raw IEEE division (not decimal-rounded): engine-portable by
    # construction — any SQL oracle computes the identical bits
    assert r["recall"] == len(hit) / len(truth)
    assert r["precision"] == len(hit) / len(cand)
    assert r["rows_per_band"] == 4
    assert r["s_star"] == round((1 / 16) ** 0.25, 6)
    # this dense near-dup corpus should be easy for 16 bands
    assert r["recall"] >= 0.95


def test_lsh_tuning_report_portable_arithmetic(spark):
    """portable=True must count over minhash_portable_pairs candidates
    (the oracle-replayable kernel), not the numpy crc32 kernel."""
    from muller_spark.operators.dedup import (
        lsh_tuning_report, minhash_portable_pairs, ngram_jaccard_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog by the river"
    rows = [(i, base + f" variant {i % 4}") for i in range(30)]
    rows += [(100 + i, f"totally unrelated text number {i} about topic {i}")
             for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    r = lsh_tuning_report(
        df, "text", "doc_id", threshold=0.5, configs=((64, 32),),
        portable=True,
    ).collect()[0]
    truth = {(p["id_a"], p["id_b"]) for p in ngram_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold=0.5, max_shingle_freq=None
    ).collect()}
    cand = {(p["id_a"], p["id_b"]) for p in minhash_portable_pairs(
        df, "text", "doc_id", num_hashes=64, bands=32, threshold=0.0
    ).collect()}
    hit = truth & cand
    assert r["n_truth"] == len(truth) and r["n_candidates"] == len(cand)
    assert r["n_hit"] == len(hit)
    assert r["recall"] == len(hit) / len(truth)
    assert r["precision"] == len(hit) / len(cand)
    assert r["rows_per_band"] == 2


def test_lsh_tuning_report_empty_truth_is_null(spark):
    from muller_spark.operators.dedup import lsh_tuning_report

    df = spark.createDataFrame(
        [(i, f"unique doc {i} token{i} alpha{i} beta{i}") for i in range(8)],
        "doc_id long, text string",
    )
    r = lsh_tuning_report(
        df, "text", "doc_id", threshold=0.99, configs=((64, 16),)
    ).collect()[0]
    assert r["n_truth"] == 0 and r["recall"] is None
