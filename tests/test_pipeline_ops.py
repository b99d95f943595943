"""Round-4 pipeline operators: pipeline_survival semantics (NULL =
fail, one-pass), unigram_logprob vs hand math, top_fraction_per_group
ceil-cut + tie-break, top_ngrams n=3."""

from __future__ import annotations

import math
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.quality import pipeline_survival  # noqa: E402
from muller_spark.operators.sampling import top_fraction_per_group  # noqa: E402
from muller_spark.operators.text import top_ngrams, unigram_logprob  # noqa: E402


def test_pipeline_survival_basic_and_null(spark):
    df = spark.createDataFrame(
        [(1, 10, "en"), (2, 20, None), (3, 30, "en"), (4, 40, "de")],
        "id long, n int, lang string",
    )
    out = pipeline_survival(df, [
        ("big", F.col("n") >= 20),
        ("lang_en", F.col("lang") == "en"),  # NULL lang -> fails
    ]).collect()
    assert [(r["stage"], r["survivors"], r["dropped_here"]) for r in out] == [
        ("big", 3, 1),
        ("lang_en", 1, 2),
    ]
    assert out[0]["pct_of_input"] == 0.75
    assert out[1]["pct_of_input"] == 0.25


def test_pipeline_survival_empty_input(spark):
    df = spark.createDataFrame([], "id long, n int")
    out = pipeline_survival(df, [("any", F.col("n") > 0)]).collect()
    assert out[0]["survivors"] == 0 and out[0]["pct_of_input"] == 0.0


def test_pipeline_survival_bad_stage_name(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="stage name"):
        pipeline_survival(df, [("bad'name", F.lit(True))])


def test_unigram_logprob_hand_math(spark):
    # corpus: doc1 = "a a b", doc2 = "b c"  -> counts a:2 b:2 c:1, total 5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in unigram_logprob(df, "text", "doc_id").collect()}
    lp = lambda c: math.log2(c) - math.log2(5)
    exp1 = (2 * lp(2) + lp(2)) / 3
    exp2 = (lp(2) + lp(1)) / 2
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
    assert abs(out[1]["avg_logprob"] - round(exp1, 5)) < 1e-9
    assert abs(out[2]["avg_logprob"] - round(exp2, 5)) < 1e-9


def test_top_fraction_per_group_cut_and_ties(spark):
    rows = [(i, "g1", float(i % 3)) for i in range(10)]  # scores 0,1,2 tied
    rows += [(100 + i, "g2", 5.0) for i in range(4)]  # all tied
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = top_fraction_per_group(df, "grp", "score", 0.5, tie_break="id")
    got = sorted(r["id"] for r in out.collect())
    # g1: ceil(10*0.5)=5 -> scores desc (2.0: ids 2,5,8), then 1.0: ids 1,4
    # g2: ceil(4*0.5)=2 -> tie broken by id -> 100,101
    assert got == [1, 2, 4, 5, 8, 100, 101]


def test_top_fraction_keeps_at_least_one(spark):
    df = spark.createDataFrame([(1, "g", 1.0)], "id long, grp string, score double")
    assert top_fraction_per_group(df, "grp", "score", 0.01).count() == 1


def test_top_ngrams_trigram(spark):
    df = spark.createDataFrame(
        [("en", "x y z x y z"), ("en", "x y z"), ("de", "a b")],
        "lang string, text string",
    )
    out = top_ngrams(df, "text", n=3, k=2).collect()
    en = [(r["ngram"], r["cnt"], r["rank"]) for r in out if r["lang"] == "en"]
    assert en[0] == ("x y z", 3, 1)  # 2 in doc1 + 1 in doc2
    # "de" doc has only 2 tokens -> no trigram rows at all
    assert not [r for r in out if r["lang"] == "de"]


def test_source_overlap_guard_and_values(spark):
    from muller_spark.operators.dedup import source_overlap

    df = spark.createDataFrame(
        [
            ("s1", "alpha beta gamma delta"),
            ("s2", "alpha beta gamma echo"),
            ("s3", "zeta eta theta iota"),
            # boilerplate present in EVERY source
            ("s1", "common one two three"),
            ("s2", "common one two three"),
            ("s3", "common one two three"),
        ],
        "source string, text string",
    )
    out = {
        (r["group_a"], r["group_b"]): (r["n_shared"], r["jaccard"])
        for r in source_overlap(df, "text", "source", n=3).collect()
    }
    # s1/s2 share 'alpha beta gamma' + 2 boilerplate windows
    assert out[("s1", "s2")][0] == 3
    # with the guard at 2 groups, the everywhere-boilerplate drops and
    # only the real shared trigram remains
    guarded = {
        (r["group_a"], r["group_b"]): r["n_shared"]
        for r in source_overlap(
            df, "text", "source", n=3, max_groups_per_window=2
        ).collect()
    }
    assert guarded[("s1", "s2")] == 1
    assert ("s1", "s3") not in guarded  # only boilerplate linked them


def test_bigram_logprob_hand_math(spark):
    # corpus: doc1 "a b a b", doc2 "b a"
    # uni: a:3 b:3 total 6; bigrams: (a,b):2 (b,a):2
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a")], "doc_id long, text string"
    )
    from muller_spark.operators.text import bigram_logprob

    out = {r["id"]: r for r in bigram_logprob(df, "text", "doc_id", lam=0.75).collect()}
    lam = 0.75
    p_ab = lam * (2 / 3) + (1 - lam) * (3 / 6)  # P(b|a)
    p_ba = lam * (2 / 3) + (1 - lam) * (3 / 6)  # P(a|b), symmetric here
    exp1 = (math.log2(p_ab) + math.log2(p_ba) + math.log2(p_ab)) / 3
    exp2 = math.log2(p_ba) / 1
    assert out[1]["n_tokens"] == 4
    assert abs(out[1]["avg_logprob"] - round(exp1, 5)) < 1e-9
    assert abs(out[2]["avg_logprob"] - round(exp2, 5)) < 1e-9
    # single-token doc -> NULL score, still present
    df2 = spark.createDataFrame([(1, "a b a b"), (3, "only")], "doc_id long, text string")
    row = {r["id"]: r for r in bigram_logprob(df2, "text", "doc_id").collect()}[3]
    assert row["n_tokens"] == 1 and row["avg_logprob"] is None


def test_bigram_beats_unigram_on_shuffled_text(spark):
    """Shuffled real words keep unigram mass but lose bigram mass: the
    bigram score separates scrambled docs where unigram cannot."""
    import random

    from muller_spark.operators.text import bigram_logprob, unigram_logprob

    sent = "the quick brown fox jumps over the lazy dog near the old river bank"
    rng = random.Random(5)
    words = sent.split()
    rows = [(i, sent) for i in range(20)]
    scrambled = []
    for i in range(20, 30):
        w = words[:]
        rng.shuffle(w)
        scrambled.append((i, " ".join(w)))
    df = spark.createDataFrame(rows + scrambled, "doc_id long, text string")
    bi = {r["id"]: r["avg_logprob"] for r in bigram_logprob(df, "text", "doc_id").collect()}
    un = {r["id"]: r["avg_logprob"] for r in unigram_logprob(df, "text", "doc_id").collect()}
    bi_real = sum(bi[i] for i in range(20)) / 20
    bi_scr = sum(bi[i] for i in range(20, 30)) / 10
    un_real = sum(un[i] for i in range(20)) / 20
    un_scr = sum(un[i] for i in range(20, 30)) / 10
    assert abs(un_real - un_scr) < 1e-6  # unigram is blind to order
    assert bi_real > bi_scr + 0.2  # bigram separates clearly


def test_ccnet_normalize_and_entropy(spark):
    from muller_spark.operators.text import ccnet_normalize, char_entropy

    df = spark.createDataFrame(
        [("Héllo, Wörld 123!",), ("aaaa",), ("",), ("aab",)], "t string"
    )
    rows = df.select(
        ccnet_normalize(F.col("t")).alias("n"),
        char_entropy(F.col("t")).alias("e"),
    ).collect()
    got = [(r["n"], r["e"]) for r in rows]
    assert got[0][0] == "hello world 000"
    # tail of the fold table (index ≥ 45) — a src/dst length drift once
    # shifted these silently; pin them against the documented mapping
    tail = spark.createDataFrame(
        [("ùúû ýÿ šśŝş žźż đðþß ő ų",)], "t string"
    ).select(ccnet_normalize(F.col("t")).alias("n")).collect()
    assert tail[0]["n"] == "uuu yy ssss zzz ddtb o u"
    assert got[1] == ("aaaa", 0.0)
    assert got[2] == ("", 0.0)
    # p(a)=2/3, p(b)=1/3
    exp = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(got[3][1] - round(exp, 5)) < 1e-9


def test_vocab_drift_direction(spark):
    """A token exclusive to side A dominates KL(P||Q); a B-exclusive
    token contributes ~nothing to it (it shrinks P's mass, not grows)."""
    from muller_spark.operators.text import vocab_drift

    a = spark.createDataFrame(
        [("common words here shifted shifted shifted",)] * 5, "text string"
    )
    b = spark.createDataFrame(
        [("common words here other other other",)] * 5, "text string"
    )
    out = vocab_drift(a, b, "text", k=10).collect()
    assert out[0]["token"] == "shifted"
    ranks = {r["token"]: i for i, r in enumerate(out)}
    assert ranks["shifted"] < ranks["other"]
    kl = {r["token"]: r["kl_bits"] for r in out}
    assert kl["shifted"] > 0 and kl["other"] < kl["shifted"]
    # shared tokens with equal frequency contribute ~0
    assert abs(kl["common"]) < 0.01


def test_token_budget_sample_semantics(spark):
    from muller_spark.operators.sampling import token_budget_sample

    # every doc is exactly 4 tokens -> budget 10 keeps exactly 2 docs
    rows = [(i, "w x y z", "a") for i in range(10)]
    rows += [(100 + i, "p q", "b") for i in range(3)]  # 2-token docs
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    kept = token_budget_sample(
        df, "text", "dom", F.col("doc_id"), {"a": 10, "b": 4}
    ).collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r["dom"], set()).add(r["doc_id"])
    assert len(by_dom["a"]) == 2  # 4+4=8 <= 10, third crosses -> dropped
    assert len(by_dom["b"]) == 2  # 2+2=4 == budget, inclusive
    # unknown domains drop by default
    df2 = df.withColumn("dom", F.lit("unlisted"))
    assert token_budget_sample(
        df2, "text", "dom", F.col("doc_id"), {"a": 10}
    ).count() == 0
    # membership is repartition-stable
    again = token_budget_sample(
        df.repartition(7), "text", "dom", F.col("doc_id"), {"a": 10, "b": 4}
    ).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in kept}
