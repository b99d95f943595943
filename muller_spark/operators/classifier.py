"""Distributed logistic-regression quality classifier.

The fastText-style "train a quality filter on weak labels, score the
corpus" workflow (reference has no trainer; its transform pipeline at
``muller/core/transform/pipeline.py`` is the closest ETL surface), done
the Spark-native way:

- **train_logreg** — IRLS / Newton: each partition contributes a d×d
  Hessian partial and a d-vector gradient partial through
  ``treeAggregate`` (same bounded-fan-in pattern as
  ``embedding._gram_moments``); the driver solves the tiny d×d system.
  Feature count is the quality-signal dimension (≈ 5-20), so the
  aggregate traffic is a few KB per partition regardless of corpus
  size, and IRLS converges in ~5-8 passes where SGD needs dozens.
- **score_logreg** — pure Column arithmetic (dot product + sigmoid),
  whole-stage-codegen JVM scoring: no UDF, no Python, no shuffle.

Features are internally standardized (one stats pass) for conditioning;
the returned weights are folded back to RAW feature space so scoring
needs no stats at inference time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _design_matrix(pdf, feature_cols):
    cols = [pdf[c].to_numpy(dtype=np.float64) for c in feature_cols]
    return np.column_stack(cols)


def train_logreg(
    df: DataFrame,
    feature_cols: "list[str]",
    label_col: str,
    iters: int = 8,
    l2: float = 1e-6,
    tree_depth: int = 2,
) -> np.ndarray:
    """Fit logistic regression by distributed IRLS.

    Returns ``weights`` of length ``len(feature_cols) + 1`` — bias
    first, then one weight per feature, in RAW feature units (feed
    straight to :func:`score_logreg`).

    ``label_col`` must be 0/1 (int or bool).  ``l2`` regularizes the
    Newton system (and keeps separable data finite).  Each IRLS pass is
    one corpus scan; partials reduce through ``treeAggregate`` with
    ``tree_depth`` levels so driver fan-in stays bounded.
    """
    d = len(feature_cols)
    data = df.select(
        F.col(label_col).cast("double").alias("__y"), *feature_cols
    )

    # one stats pass: mean/std for conditioning
    stats = data.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.avg(c).alias(f"m{i}") for i, c in enumerate(feature_cols)],
        *[F.stddev_pop(c).alias(f"s{i}") for i, c in enumerate(feature_cols)],
    ).collect()[0]
    n = stats["n"]
    if n == 0:
        raise ValueError("train_logreg: empty input")
    mu = np.array([stats[f"m{i}"] or 0.0 for i in range(d)])
    sd = np.array([stats[f"s{i}"] or 0.0 for i in range(d)])
    sd[sd == 0] = 1.0

    # cache the feature blocks, not the corpus: d+1 doubles per row
    # (the projection already dropped text/embeddings), so 8 IRLS
    # passes re-read memory-resident matrices instead of parquet
    rdd = data.rdd.mapPartitions(
        lambda rows: _partition_arrays(rows, d)
    ).cache()

    beta = np.zeros(d + 1)  # standardized space, bias first
    try:
        for _ in range(iters):
            bc_beta = beta.copy()
            bc_mu, bc_sd = mu, sd

            def partials(block):
                X, y = block
                Xs = (X - bc_mu) / bc_sd
                Z = np.column_stack([np.ones(len(Xs)), Xs])
                zlin = np.clip(Z @ bc_beta, -35.0, 35.0)
                p = 1.0 / (1.0 + np.exp(-zlin))
                w = np.clip(p * (1.0 - p), 1e-9, None)
                g = Z.T @ (y - p)
                H = (Z * w[:, None]).T @ Z
                return g, H

            zero = (np.zeros(d + 1), np.zeros((d + 1, d + 1)))
            g, H = rdd.map(partials).treeAggregate(
                zero,
                lambda a, b: (a[0] + b[0], a[1] + b[1]),
                lambda a, b: (a[0] + b[0], a[1] + b[1]),
                depth=tree_depth,
            )
            H += l2 * np.eye(d + 1)
            step = np.linalg.solve(H, g - l2 * beta)
            beta = beta + step
            if np.max(np.abs(step)) < 1e-8:
                break
    finally:
        rdd.unpersist()

    # fold standardization into raw-space weights:
    # z = b0 + sum bi*(x-mu)/sd  ->  w0 = b0 - sum bi*mu_i/sd_i, wi = bi/sd_i
    w = np.empty(d + 1)
    w[1:] = beta[1:] / sd
    w[0] = beta[0] - float(np.sum(beta[1:] * mu / sd))
    return w


def _partition_arrays(rows, d):
    """Materialize one (X, y) block per partition — IRLS touches each
    partition's rows as a matrix, not row-at-a-time."""
    ys, xs = [], []
    for r in rows:
        ys.append(r["__y"])
        xs.append([r[i + 1] for i in range(d)])
    if not ys:
        return iter(())
    return iter([(np.asarray(xs, dtype=np.float64), np.asarray(ys))])


def score_logreg(
    df: DataFrame,
    feature_cols: "list[str]",
    weights,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append ``out_col`` = sigmoid(w·x) as a pure JVM expression —
    whole-stage codegen, no Python in the scoring path."""
    z: Column = F.lit(float(weights[0]))
    for i, c in enumerate(feature_cols):
        z = z + F.lit(float(weights[i + 1])) * F.col(c).cast("double")
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
