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
