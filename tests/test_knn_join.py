"""Distributed table-to-table kNN join (index/vector.knn_join): both
sides unbounded DataFrames, IVF cell co-partitioning, JVM distance on
the candidate sliver.  The exhaustive-probe regime must EQUAL brute
force (a theorem: every cell probed → candidates = full co-partitioned
corpus); the approximate regime is recall-measured against
exact ground truth on the real embeddings table."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.index.vector import knn_join  # noqa: E402


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _brute_ranks(qp, cp, k, metric):
    qm = np.stack(qp["qvec"].apply(np.asarray)).astype(np.float64)
    cm = np.stack(cp["cvec"].apply(np.asarray)).astype(np.float64)
    if metric == "cosine":
        qm = qm / np.linalg.norm(qm, axis=1)[:, None]
        cm = cm / np.linalg.norm(cm, axis=1)[:, None]
    d2 = ((qm[:, None, :] - cm[None, :, :]) ** 2).sum(-1)
    want = {}
    for i, qid in enumerate(qp["qid"]):
        order = sorted(
            range(len(cp)), key=lambda j: (d2[i, j], cp["cid"][j])
        )[:k]
        for r, j in enumerate(order, 1):
            want[(int(qid), r)] = int(cp["cid"][j])
    return want


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_exhaustive_probe_equals_brute_force(spark, metric):
    """nprobe == num_centroids probes every cell → the result is exact
    by construction, for both metrics (cosine = squared L2 on the unit
    sphere, rank-equivalent)."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") % 7 == 1).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = emb.filter(F.col("vec_id") % 7 != 1).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    out = knn_join(
        q, "qvec", "qid", c, "cvec", "cid",
        k=4, metric=metric, num_centroids=6, nprobe=6,
    ).collect()
    got = {(r["query_id"], r["rank"]): r["id"] for r in out}
    want = _brute_ranks(q.toPandas(), c.toPandas(), 4, metric)
    assert got == want


def test_approximate_recall_on_real_embeddings(spark):
    """nprobe < num_centroids: deterministic seeded run; recall vs the
    exhaustive result must stay high on the organic embedding table
    (the measure-before-committing contract the docstring names)."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") % 7 == 1).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = emb.filter(F.col("vec_id") % 7 != 1).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    exact = knn_join(
        q, "qvec", "qid", c, "cvec", "cid",
        k=5, metric="l2", num_centroids=6, nprobe=6,
    )
    approx = knn_join(
        q, "qvec", "qid", c, "cvec", "cid",
        k=5, metric="l2", num_centroids=6, nprobe=3,
    )
    e = {(r["query_id"], r["id"]) for r in exact.collect()}
    a = {(r["query_id"], r["id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall
    # every approximate pair is a REAL corpus pair with a true distance
    # (the candidate set is a subset; no fabricated neighbors)
    assert a <= {(r["query_id"], r["id"]) for r in knn_join(
        q, "qvec", "qid", c, "cvec", "cid",
        k=len(c.collect()), metric="l2", num_centroids=6, nprobe=6,
    ).collect()}


def test_under_occupied_probe_returns_fewer_than_k(spark):
    """A query whose probed cells hold fewer than k corpus rows gets a
    short result — the documented recall contract, not silent
    padding."""
    # two tight clusters far apart; centroids split them; one corpus
    # row near cluster A, many near B; a query at A probing 1 cell
    # sees only the A occupants
    rows_c = [(1, [0.0, 0.0, 1.0])] + [
        (100 + i, [100.0 + 0.1 * i, 100.0, 0.0]) for i in range(8)
    ]
    rows_q = [(1000, [0.1, 0.0, 1.0])]
    c = spark.createDataFrame(rows_c, "cid long, cvec array<double>")
    q = spark.createDataFrame(rows_q, "qid long, qvec array<double>")
    out = knn_join(
        q, "qvec", "qid", c, "cvec", "cid",
        k=5, metric="l2", num_centroids=2, nprobe=1, sample_size=64,
    ).collect()
    ids = {r["id"] for r in out}
    assert ids == {1}  # only the co-cell occupant; 1 row < k=5


def test_null_vector_raises(spark):
    c = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)], "cid long, cvec array<double>"
    )
    q = spark.createDataFrame([(9, [0.0, 1.0])], "qid long, qvec array<double>")
    with pytest.raises(Exception, match="NULL vector"):
        knn_join(
            q, "qvec", "qid", c, "cvec", "cid", k=2, num_centroids=2,
        ).collect()


def test_inner_product_refused(spark):
    c = spark.createDataFrame([(1, [1.0])], "cid long, cvec array<double>")
    with pytest.raises(ValueError, match="inner_product"):
        knn_join(c, "cvec", "cid", c, "cvec", "cid", metric="inner_product")


def test_no_cartesian_in_plan(spark):
    """Candidates come from the cell-keyed join — never a query ×
    corpus product."""
    emb = _emb(spark)
    q = emb.limit(20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = knn_join(
        q, "qvec", "qid", emb, "embedding", "vec_id",
        k=3, num_centroids=4, nprobe=2,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_empty_corpus_returns_empty_with_schema(spark):
    q = spark.createDataFrame([(9, [0.0, 1.0])], "qid long, qvec array<double>")
    c = spark.createDataFrame([], "cid long, cvec array<double>")
    out = knn_join(q, "qvec", "qid", c, "cvec", "cid", k=3, num_centroids=2)
    assert out.count() == 0
    assert out.columns == ["query_id", "id", "distance", "rank"]


# ---------------------------------------------------------------------------
# knn_join_prebuilt: the join against persisted IVF artifacts
# ---------------------------------------------------------------------------

def _planted(spark, n=40, dim=6, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim)) * 10
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "cid long, cvec array<double>"),
        mat,
    )


def _brute_l2(qm, qids, cm, cids, k):
    d2 = ((qm[:, None, :] - cm[None, :, :]) ** 2).sum(-1)
    want = {}
    for i, qid in enumerate(qids):
        order = sorted(range(len(cids)), key=lambda j: (d2[i, j], cids[j]))[:k]
        for r, j in enumerate(order, 1):
            want[(int(qid), r)] = int(cids[j])
    return want


@pytest.mark.parametrize("layout", ["vectors", "bare", "sq8"])
def test_prebuilt_layouts_match_brute_force(spark, tmp_path, layout):
    """Exhaustive probes against each artifact layout equal brute
    force (SQ8 included: the planted spread is far wider than the
    scale/2 per-component quantization error, so ranks cannot flip)."""
    from muller_spark.index.vector import build_ivf_artifacts, knn_join_prebuilt

    c, cm = _planted(spark)
    q = c.limit(7).select(
        F.col("cid").alias("qid"), F.col("cvec").alias("qvec")
    )
    path = str(tmp_path / f"ivf_{layout}")
    build_ivf_artifacts(
        c, "cvec", "cid", path, num_centroids=4, sample_size=64,
        store_vectors=layout != "bare",
        quantize_bits=8 if layout == "sq8" else None,
    )
    kwargs = {}
    if layout == "bare":
        kwargs = dict(corpus=c, vec_col="cvec", id_col="cid")
    out = knn_join_prebuilt(
        q, "qvec", "qid", path, k=3, nprobe=4, **kwargs
    ).collect()
    got = {(r["query_id"], r["rank"]): r["id"] for r in out}
    qp = q.toPandas()
    qm = np.stack(qp["qvec"].apply(np.asarray))
    want = _brute_l2(qm, list(qp["qid"]), cm, list(range(len(cm))), 3)
    if layout == "sq8":
        # rank parity is the contract here; sq8 distance VALUES carry
        # quantization error by design
        assert got == want
    else:
        assert got == want
        # float layouts: distances match squared L2 up to the float32
        # at-rest rounding of the stored inverted lists
        d2 = {(r["query_id"], r["id"]): r["distance"] for r in out}
        for (qid, rank), rid in want.items():
            i = list(qp["qid"]).index(qid)
            assert abs(d2[(qid, rid)] - ((qm[i] - cm[rid]) ** 2).sum()) < 1e-3


def test_prebuilt_bare_without_corpus_raises(spark, tmp_path):
    from muller_spark.index.vector import build_ivf_artifacts, knn_join_prebuilt

    c, _ = _planted(spark)
    path = str(tmp_path / "ivf")
    build_ivf_artifacts(c, "cvec", "cid", path, num_centroids=2, sample_size=64)
    q = c.limit(2).select(F.col("cid").alias("qid"), F.col("cvec").alias("qvec"))
    with pytest.raises(ValueError, match="store_vectors"):
        knn_join_prebuilt(q, "qvec", "qid", path, k=2)


def test_prebuilt_prunes_to_probed_cells(spark, tmp_path):
    """A bounded query set probing a strict cell subset must push a
    partition filter — the plan's scan carries the probed-cell
    predicate, the artifact's whole point."""
    from muller_spark.index.vector import build_ivf_artifacts, knn_join_prebuilt

    c, cm = _planted(spark, n=60)
    path = str(tmp_path / "ivf")
    build_ivf_artifacts(
        c, "cvec", "cid", path, num_centroids=8, sample_size=64,
        store_vectors=True,
    )
    q = c.limit(1).select(F.col("cid").alias("qid"), F.col("cvec").alias("qvec"))
    out = knn_join_prebuilt(q, "qvec", "qid", path, k=2, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan  # partition column present in the pushed scan
    assert out.count() >= 1
