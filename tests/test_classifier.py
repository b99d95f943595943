"""Distributed IRLS logistic regression (operators/classifier.py):
weights match a driver-side numpy IRLS on the same data, scoring is
JVM-only (plan-asserted), and the quality-filter workflow separates
planted good/bad documents."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.classifier import (  # noqa: E402
    score_logreg,
    train_logreg,
)

FEATS = ["f0", "f1", "f2"]


def _numpy_irls(X, y, iters=8, l2=1e-6):
    mu, sd = X.mean(0), X.std(0)
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    Z = np.column_stack([np.ones(len(Xs)), Xs])
    beta = np.zeros(Z.shape[1])
    for _ in range(iters):
        zlin = np.clip(Z @ beta, -35.0, 35.0)
        p = 1.0 / (1.0 + np.exp(-zlin))
        w = np.clip(p * (1 - p), 1e-9, None)
        g = Z.T @ (y - p)
        H = (Z * w[:, None]).T @ Z + l2 * np.eye(Z.shape[1])
        step = np.linalg.solve(H, g - l2 * beta)
        beta = beta + step
        if np.max(np.abs(step)) < 1e-8:
            break
    wts = np.empty(len(beta))
    wts[1:] = beta[1:] / sd
    wts[0] = beta[0] - float(np.sum(beta[1:] * mu / sd))
    return wts


@pytest.fixture(scope="module")
def synth(spark):
    rng = np.random.RandomState(11)
    n = 2000
    X = rng.randn(n, 3) * [1.0, 5.0, 0.2] + [0.0, 3.0, -1.0]
    true_w = np.array([0.3, 1.2, -0.4, 2.0])
    z = true_w[0] + X @ true_w[1:]
    y = (rng.rand(n) < 1.0 / (1.0 + np.exp(-z))).astype(np.float64)
    rows = [
        (i, float(y[i]), float(X[i, 0]), float(X[i, 1]), float(X[i, 2]))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, label double, f0 double, f1 double, f2 double")
    return df, X, y


def test_weights_match_numpy_irls(spark, synth):
    df, X, y = synth
    w = train_logreg(df, FEATS, "label")
    ref = _numpy_irls(X, y)
    # same algorithm, distributed float summation -> tiny tolerance
    assert np.allclose(w, ref, rtol=1e-6, atol=1e-8), (w, ref)


def test_scoring_accuracy_and_jvm_only(spark, synth):
    df, X, y = synth
    w = train_logreg(df, FEATS, "label")
    scored = score_logreg(df, FEATS, w)
    pred = scored.select(
        "label", (scored["quality_prob"] >= 0.5).cast("int").alias("pred")
    ).collect()
    acc = sum(1 for r in pred if int(r["label"]) == r["pred"]) / len(pred)
    assert acc >= 0.85
    # scoring path is pure JVM: no Python evals in the plan
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_quality_filter_workflow(spark):
    """Weak-label workflow: label docs by a rule, train on features,
    verify held-out-style separation of planted good vs bad texts."""
    from muller_spark.operators.text import quality_features

    good = [
        (i, "the quick brown fox jumps over the lazy dog and runs far " * 4)
        for i in range(40)
    ]
    bad = [(100 + i, "zzz " * 3 + "!!!???##" * 10) for i in range(40)]
    df = spark.createDataFrame(good + bad, "doc_id long, text string")
    feats = quality_features(df, "text").withColumn(
        "label", (df["doc_id"] < 100).cast("double")
    )
    cols = ["n_tokens", "stopword_ratio", "punct_ratio"]
    w = train_logreg(feats, cols, "label")
    scored = score_logreg(feats, cols, w).select("doc_id", "quality_prob").collect()
    good_p = [r["quality_prob"] for r in scored if r["doc_id"] < 100]
    bad_p = [r["quality_prob"] for r in scored if r["doc_id"] >= 100]
    assert min(good_p) > max(bad_p)


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "label double, f0 double, f1 double, f2 double")
    with pytest.raises(ValueError, match="empty"):
        train_logreg(df, FEATS, "label")
