"""Embedding covariance / PCA (operators/embedding.py): fast Gram path
agrees with the exact path and numpy; PCA matches numpy eigh with
pinned signs; whitening yields unit variance."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.embedding import (  # noqa: E402
    _combine_gram_partials,
    _gram_moments,
    embedding_covariance,
    embedding_pca,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def mat(emb):
    rows = emb.select("embedding").collect()
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def _cov_dict(df):
    return {(r["i"], r["j"]): r["cov"] for r in df.collect()}


def test_fast_covariance_matches_numpy_and_exact(spark, emb, mat):
    want = np.cov(mat, rowvar=False, bias=True)
    fast = _cov_dict(embedding_covariance(emb, "embedding", exact=False))
    exact = _cov_dict(embedding_covariance(emb, "embedding", exact=True))
    d = mat.shape[1]
    assert len(fast) == d * (d + 1) // 2 == len(exact)
    for (i, j), v in fast.items():
        assert abs(v - want[i, j]) < 1e-9, (i, j)
        assert abs(v - exact[(i, j)]) < 1e-6, (i, j)  # exact path rounds at 6dp


def test_pca_matches_numpy(spark, emb, mat):
    out, comps, var = embedding_pca(emb, "embedding", k=4, id_col="vec_id")
    cov = np.cov(mat, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    assert np.allclose(np.sort(var)[::-1], vals[order], atol=1e-9)
    # components span the same subspace: |cos| of matched pairs ~ 1
    for r, col in enumerate(order):
        cos = abs(float(comps[r] @ vecs[:, col]))
        assert cos > 1 - 1e-9, (r, cos)
    # projection reproduces driver-side math
    got = {r["vec_id"]: np.asarray(r["pca"]) for r in out.collect()}
    mean = mat.mean(axis=0)
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    for n, vid in enumerate(ids):
        want_row = (mat[n] - mean) @ comps.T
        assert np.allclose(got[vid], want_row, atol=1e-9)


def test_pca_whitening_unit_variance(spark, emb):
    out, _, _ = embedding_pca(emb, "embedding", k=3, id_col="vec_id", whiten=True)
    proj = np.stack([np.asarray(r["pca"]) for r in out.collect()])
    assert np.allclose(proj.var(axis=0), 1.0, atol=1e-3)


def test_gram_partials_tree_combined_before_driver(spark, emb, mat):
    """The combine ladder bounds driver fan-in: with 40 input partitions
    and fanin=4, at most 4 partial rows are collected — and the moments
    still match numpy exactly enough."""
    wide = emb.repartition(40)
    sums, gram, n = _gram_moments(wide, "embedding", fanin=4)
    assert n == mat.shape[0]
    assert np.allclose(sums, mat.sum(axis=0), atol=1e-9)
    assert np.allclose(gram, mat.T @ mat, atol=1e-6)
    # the ladder itself: 40 partitions of partials reduce to ≤4 rows
    src = wide.select("embedding")
    from muller_spark.operators.embedding import _GRAM_SCHEMA

    def partial(iterator):
        import pandas as pd

        for pdf in iterator:
            if pdf.empty:
                continue
            m = np.stack(
                pdf["embedding"].map(
                    lambda v: np.asarray(v, dtype=np.float64)
                )
            )
            yield pd.DataFrame({
                "sums": [m.sum(axis=0).tolist()],
                "gram": [(m.T @ m).reshape(-1).tolist()],
                "n": [len(m)],
            })

    partials = src.mapInPandas(partial, _GRAM_SCHEMA)
    reduced = _combine_gram_partials(partials, 40, fanin=4)
    assert reduced.count() <= 4


def test_pca_rejects_bad_k(spark, emb):
    with pytest.raises(ValueError):
        embedding_pca(emb, "embedding", k=0)
    with pytest.raises(ValueError):
        embedding_pca(emb, "embedding", k=10_000)


def test_hard_negatives_label_mask_before_truncation(spark):
    from muller_spark.operators.embedding import hard_negatives

    # anchor 0 is surrounded by same-label clones; the true negatives
    # are farther away — a post-filtered knn would lose them, the
    # in-kernel mask must not
    rows = [(0, [1.0, 0.0], 0)]
    rows += [(i, [1.0, 0.001 * i], 0) for i in range(1, 8)]  # same-label wall
    rows += [(10, [0.9, 0.1], 1), (11, [0.0, 1.0], 1)]       # negatives
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negatives(df, "embedding", "vec_id", "label", [0], k=2).collect()
    assert [(r["id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (10, 1), (11, 2)
    ]


def test_hard_negatives_deterministic_across_partitioning(spark):
    from muller_spark.operators.embedding import hard_negatives

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(60)
    ]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    df8 = df1.repartition(8)
    a = sorted(
        (r["anchor_id"], r["id"], r["rank"])
        for r in hard_negatives(df1, "embedding", "vec_id", "label", [0, 5], k=5).collect()
    )
    b = sorted(
        (r["anchor_id"], r["id"], r["rank"])
        for r in hard_negatives(df8, "embedding", "vec_id", "label", [0, 5], k=5).collect()
    )
    assert a == b and len(a) == 10


def test_hard_negatives_validation(spark):
    import pytest

    from muller_spark.operators.embedding import hard_negatives

    df = spark.createDataFrame(
        [(0, [1.0], 0)], "vec_id long, embedding array<double>, label int"
    )
    with pytest.raises(ValueError, match="at least one anchor"):
        hard_negatives(df, "embedding", "vec_id", "label", [])
    with pytest.raises(ValueError, match="not in corpus"):
        hard_negatives(df, "embedding", "vec_id", "label", [99])
