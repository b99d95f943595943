"""SemDeDup (operators/dedup.py semantic_* family): cluster-local
cosine pairs match a brute-force numpy oracle computed from the SAME
centroid assignment; both keep policies drop exactly the dominated
rows; the cluster-size ceiling raises."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.dedup import (  # noqa: E402
    assign_clusters,
    semantic_dedup,
    semantic_dup_pairs,
    train_semantic_centroids,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"
THRESH = 0.35


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def cents(emb):
    return train_semantic_centroids(emb, "embedding", num_clusters=6, seed=7)


@pytest.fixture(scope="module")
def oracle(emb, cents):
    """Brute-force: same assignment, exact intra-cluster cosine pairs."""
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    d = ((mat**2).sum(1)[:, None] + (cents**2).sum(1)[None, :]
         - 2.0 * mat @ cents.T)
    assign = d.argmin(axis=1)
    cdist = np.sqrt(np.maximum(d[np.arange(len(mat)), assign], 0.0))
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = unit @ unit.T
    pairs = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if assign[i] == assign[j] and cos[i, j] >= THRESH:
                a, b = sorted((int(ids[i]), int(ids[j])))
                pairs.add((a, b))
    by_id = {int(ids[i]): i for i in range(len(ids))}
    return {
        "assign": {int(ids[i]): int(assign[i]) for i in range(len(ids))},
        "cdist": {int(ids[i]): float(cdist[i]) for i in range(len(ids))},
        "pairs": pairs,
        "cos": lambda a, b: float(cos[by_id[a], by_id[b]]),
        "ids": set(int(i) for i in ids),
    }


def test_assignment_matches_numpy(emb, cents, oracle):
    got = {
        r["id"]: r["cluster"]
        for r in assign_clusters(emb, "embedding", "vec_id", cents).collect()
    }
    assert got == oracle["assign"]


def test_pairs_match_bruteforce(emb, cents, oracle):
    got = semantic_dup_pairs(
        emb, "embedding", "vec_id", threshold=THRESH, centroids=cents
    ).collect()
    got_pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert got_pairs == oracle["pairs"]
    assert len(oracle["pairs"]) > 0  # threshold chosen to be non-trivial
    for r in got:
        assert r["id_a"] < r["id_b"]
        assert r["cluster"] == oracle["assign"][r["id_a"]]
        assert abs(r["cosine"] - oracle["cos"](r["id_a"], r["id_b"])) < 1e-9


def _dominated(oracle, rank_key):
    """Rows dropped under the one-pass dominance rule."""
    dropped = set()
    for a, b in oracle["pairs"]:
        ra, rb = rank_key(a), rank_key(b)
        dropped.add(b if ra < rb else a)
    return dropped


def test_min_id_survivors(emb, cents, oracle):
    surv = semantic_dedup(
        emb, "embedding", "vec_id", threshold=THRESH, centroids=cents
    )
    got = {r["vec_id"] for r in surv.collect()}
    expect = oracle["ids"] - _dominated(oracle, lambda i: (i,))
    assert got == expect
    # survivors carry the cluster column, matching the assignment
    for r in surv.collect():
        assert r["cluster"] == oracle["assign"][r["vec_id"]]


def test_far_from_centroid_survivors(emb, cents, oracle):
    surv = semantic_dedup(
        emb, "embedding", "vec_id", threshold=THRESH, centroids=cents,
        keep="far_from_centroid",
    )
    got = {r["vec_id"] for r in surv.collect()}
    # better rank = larger cdist, ties -> smaller id
    expect = oracle["ids"] - _dominated(
        oracle, lambda i: (-oracle["cdist"][i], i)
    )
    assert got == expect
    assert got != oracle["ids"]  # something was actually dropped


def test_bad_keep_policy_raises(emb, cents):
    with pytest.raises(ValueError, match="keep must be"):
        semantic_dedup(emb, "embedding", "vec_id", keep="nope", centroids=cents)


def test_cluster_ceiling_raises(emb, cents):
    with pytest.raises(Exception, match="max_cluster_size"):
        semantic_dup_pairs(
            emb, "embedding", "vec_id", threshold=THRESH, centroids=cents,
            max_cluster_size=3,
        ).collect()


def test_tile_boundary_parity(spark):
    """Pairs spanning the 4096-row tile edge are still found: craft a
    cluster larger than one tile with duplicates placed across tiles."""
    rng = np.random.RandomState(0)
    base = rng.randn(4100, 8)
    base[4099] = base[0]  # dup across tile boundary (0 in tile A, 4099 in B)
    base[4098] = base[1]
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.zeros((1, 8))  # single cluster -> everything intra-cell
    got = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            df, "embedding", "vec_id", threshold=0.999999, centroids=cents
        ).collect()
    }
    assert (0, 4099) in got and (1, 4098) in got


def test_semantic_dedup_reuses_ivf_centroids(spark, emb, tmp_path_factory):
    """Index/dedup composition: the IVF index's coarse quantizer doubles
    as the SemDeDup cell assignment — one training pass serves search
    AND dedup, and the pair set matches training fresh centroids from
    the same artifacts."""
    from muller_spark.index.vector import build_ivf_artifacts, load_ivf_centroids
    from muller_spark.operators.dedup import semantic_dup_pairs

    path = str(tmp_path_factory.mktemp("ivfsem") / "idx")
    build_ivf_artifacts(emb, "embedding", "vec_id", path, num_centroids=6,
                        sample_size=65536, seed=7)
    cents = load_ivf_centroids(spark, path)
    via_index = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            emb, "embedding", "vec_id", threshold=THRESH, centroids=cents
        ).collect()
    }
    assert len(via_index) > 0
    # identical centroids -> identical pair set (loaded vs in-memory)
    direct = {
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            emb, "embedding", "vec_id", threshold=THRESH,
            centroids=load_ivf_centroids(spark, path),
        ).collect()
    }
    assert via_index == direct
