"""Dataset-level hybrid search: inverted index + vector index wiring."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark import dataset as ds_mod  # noqa: E402


@pytest.fixture()
def text_ds(spark, tmp_path):
    ds = ds_mod.dataset(str(tmp_path / "textds"), spark)
    ds.create_tensor("text", htype="text")
    ds.create_tensor("score", dtype="int64")
    corpus = ["hi there world", "bye bye", "oops hello", "hello world", "hi hi"]
    ds.extend({"text": corpus * 4, "score": list(range(20))})
    ds.commit("corpus")
    return ds


def test_index_search_and_filter_integration(text_ds):
    ds = text_ds
    ds.create_index_vectorized("text")
    hits = ds.query("text", "hello").select("text").collect()
    assert {r["text"] for r in hits} == {"oops hello", "hello world"}

    # complex fuzzy through the index inside filter_vectorized, mixed with
    # a scan condition, left-to-right fold
    out = ds.filter_vectorized(
        [("text", "CONTAINS", "hi||hello", True), ("score", "<", 10)],
        ["AND"],
    )
    rows = out.select("text", "score").collect()
    assert all(r["score"] < 10 for r in rows)
    assert all(
        ("hi" in r["text"].split()) or ("hello" in r["text"].split()) for r in rows
    )
    # equivalent scan-only result must match
    scan = ds.filter_vectorized(
        [("text", "CONTAINS", "hi||hello"), ("score", "<", 10)], ["AND"]
    ).select("text", "score").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, scan))


def test_index_staleness_falls_back(text_ds):
    ds = text_ds
    ds.create_index_vectorized("text")
    ds.text.extend(["fresh document hello"])
    ds.score.extend([99])
    ds.commit("moved head")
    # index is stale now → query() refuses, filter falls back to scan
    with pytest.raises(ValueError):
        ds.query("text", "hello")
    out = ds.filter_vectorized([("text", "CONTAINS", "hello", True)], [])
    assert out.filter(F.col("score") == 99).count() == 1


def test_vector_index_flat_and_lsh(spark, tmp_path):
    ds = ds_mod.dataset(str(tmp_path / "vecds"), spark)
    ds.create_tensor("emb", htype="embedding")
    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 8).astype("float32")
    ds.extend({"emb": [[float(x) for x in v] for v in vecs]})
    ds.commit("vectors")

    ds.create_vector_index("emb", index_type="FLAT", metric="l2")
    out = ds.vector_search(vecs[0], "emb", topk=3).collect()
    assert out[0]["id"] == 0 and out[0]["rank"] == 1  # self is nearest

    ds.create_vector_index("emb", index_name="lsh", index_type="HNSWFLAT",
                           metric="cosine", num_planes=3, num_tables=8)
    approx = ds.vector_search(vecs[0], "emb", index_name="lsh", topk=3).collect()
    assert any(r["id"] == 0 for r in approx)


def test_vector_index_diskann(spark, tmp_path):
    """create_vector_index(index_type='DISKANN') routes through the
    disk graph (reference vector_search_ops.py DISKANN type): self at
    rank 1 through the artifact, exact fallback once the dataset moves
    past the indexed commit."""
    ds = ds_mod.dataset(str(tmp_path / "dads"), spark)
    ds.create_tensor("emb", htype="embedding")
    rng = np.random.RandomState(11)
    vecs = rng.randn(80, 8).astype("float32")
    ds.extend({"emb": [[float(x) for x in v] for v in vecs]})
    ds.commit("vectors")

    ds.create_vector_index("emb", index_type="DISKANN", num_cells=4, R=8)
    idx_dir = tmp_path / "dads" / "_indexes" / "vector" / "emb" / "default"
    assert (idx_dir / "adjacency").is_dir() and (idx_dir / "medoids").is_dir()
    out = ds.vector_search(vecs[3], "emb", topk=3).collect()
    assert out[0]["id"] == 3 and out[0]["rank"] == 1

    # stale: new commit → exact fallback still returns correct result
    ds.extend({"emb": [[0.0] * 8]})
    ds.commit("more")
    out2 = ds.vector_search(vecs[3], "emb", topk=3).collect()
    assert out2[0]["id"] == 3 and out2[0]["rank"] == 1


def test_vector_index_diskann_update(spark, tmp_path):
    """update_vector_index on a DISKANN index appends the delta into
    the graph (O(touched cells)) and search finds the new vectors
    through the refreshed artifact — no exact-scan fallback."""
    ds = ds_mod.dataset(str(tmp_path / "daup"), spark)
    ds.create_tensor("emb", htype="embedding")
    rng = np.random.RandomState(13)
    vecs = rng.randn(60, 8).astype("float32")
    ds.extend({"emb": [[float(x) for x in v] for v in vecs[:40]]})
    ds.commit("base")
    ds.create_vector_index("emb", index_type="DISKANN", num_cells=4, R=8)

    ds.extend({"emb": [[float(x) for x in v] for v in vecs[40:]]})
    ds.commit("delta")
    ds.update_vector_index("emb")

    # fresh again: the manifest commit matches HEAD, so this is the
    # graph path (stale fallback would also be correct — the point is
    # the artifact itself now contains the delta)
    idx_dir = tmp_path / "daup" / "_indexes" / "vector" / "emb" / "default"
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    n_vec = sum(
        pq.read_metadata(f).num_rows
        for f in pads.dataset(str(idx_dir / "vectors")).files
    )
    assert n_vec == 60
    out = ds.vector_search(vecs[50], "emb", topk=3).collect()
    assert out[0]["id"] == 50 and out[0]["rank"] == 1


def test_filter_with_index_query_combination(text_ds):
    """Reference ds.filter(function, index_query, connector)
    (mixins/query.py:95-159): the row predicate combines with an
    inverted-index lookup via AND/OR; index-only when function is None."""
    ds = text_ds
    ds.create_index_vectorized("text")

    # index-only: rows containing 'hello'
    only = ds.filter(index_query="hello", index_tensor="text")
    assert {r["text"] for r in only.collect()} == {"oops hello", "hello world"}

    # AND: hello-docs with score < 10
    both = ds.filter(
        "score < 10", index_query="hello", index_tensor="text", connector="AND"
    ).collect()
    assert all(r["score"] < 10 and "hello" in r["text"] for r in both)
    want_and = {
        (r["text"], r["score"])
        for r in ds.df.filter(
            (F.col("score") < 10) & F.col("text").contains("hello")
        ).collect()
    }
    assert {(r["text"], r["score"]) for r in both} == want_and

    # OR: union of predicate matches and index matches, deduplicated
    either = ds.filter(
        "score >= 18", index_query="hello", index_tensor="text", connector="OR"
    ).collect()
    want_or = {
        (r["text"], r["score"])
        for r in ds.df.filter(
            (F.col("score") >= 18) | F.col("text").contains("hello")
        ).collect()
    }
    assert {(r["text"], r["score"]) for r in either} == want_or

    # lambda + index combination
    lam = ds.filter(
        lambda s: s["score"] % 2 == 0,
        index_query="hello", index_tensor="text", connector="AND",
    ).collect()
    assert all(r["score"] % 2 == 0 and "hello" in r["text"] for r in lam)

    with pytest.raises(ValueError, match="index_tensor"):
        ds.filter("score < 3", index_query="hello")


def test_inverted_index_lifecycle(spark, tmp_path):
    """update_index refreshes an append-only-stale inverted index with
    an O(delta) merge, rebuilds after a rewrite, drop_index removes it,
    and list_indexes reports freshness — the inverted twin of the
    vector lifecycle (reference inverted_index_vectorized_ops.py:146,
    vector_search_ops.py:131)."""
    import muller_spark.dataset as ds_mod

    ds = ds_mod.dataset(str(tmp_path / "ids"), spark)
    ds.create_tensor("text", htype="text")
    ds.extend({"text": ["alpha beta", "beta gamma", "gamma delta"]})
    ds.commit("base")
    ds.create_index_vectorized("text")

    assert ds.list_indexes()["text"]["inverted"]["fresh"]
    assert ds.query("text", "beta").count() == 2

    # append-only commit → stale → O(delta) update
    ds.extend({"text": ["beta epsilon", "zeta"]})
    ds.commit("more")
    assert not ds.list_indexes()["text"]["inverted"]["fresh"]
    with pytest.raises(ValueError, match="no fresh index"):
        ds.query("text", "beta")
    ds.update_index("text")
    assert ds.list_indexes()["text"]["inverted"]["fresh"]
    assert ds.query("text", "beta").count() == 3
    assert ds.query("text", "zeta").count() == 1

    # rewrite (update a cell) → rebuild path
    ds.text[0] = "omega only"
    ds.commit("rewrite")
    ds.update_index("text")
    assert ds.query("text", "omega").count() == 1
    assert ds.query("text", "alpha").count() == 0

    ds.drop_index("text")
    assert "text" not in ds.list_indexes() or "inverted" not in ds.list_indexes().get("text", {})
    with pytest.raises(ValueError, match="no fresh index"):
        ds.query("text", "beta")


def test_update_index_rebuild_preserves_positions(spark, tmp_path):
    """A rewrite commit forces update_index down the rebuild path; the
    rebuild must carry positions through (ADVICE r2: it silently rebuilt
    non-positional, breaking phrase_match on a positions=True index)."""
    ds = ds_mod.dataset(str(tmp_path / "posidx"), spark)
    ds.create_tensor("text", htype="text")
    ds.extend({"text": ["alpha beta gamma", "beta alpha", "gamma beta alpha"]})
    ds.commit("base")
    ds.create_index_vectorized("text", positions=True)

    ds.text[1] = "alpha beta"          # rewrite → renumber → rebuild
    ds.commit("rewrite")
    idx = ds.update_index("text")
    assert idx.manifest.get("positions") is True
    hits = {r["id"] for r in idx.search("alpha beta", "phrase_match").collect()}
    assert hits == {0, 1}


def test_vector_index_diskann_sq8_facade(spark, tmp_path):
    """create_vector_index(index_type='DISKANN', quantize_bits=8)
    builds the SQ8 graph through the facade: int8 vectors table at
    rest, search still self-matches at rank 1, and
    update_vector_index appends SQ8 rows (layout sniffed)."""
    ds = ds_mod.dataset(str(tmp_path / "dsq8"), spark)
    ds.create_tensor("emb", htype="embedding")
    rng = np.random.RandomState(13)
    vecs = rng.randn(80, 8).astype("float32")
    ds.extend({"emb": [[float(x) for x in v] for v in vecs]})
    ds.commit("vectors")

    ds.create_vector_index(
        "emb", index_type="DISKANN", num_cells=4, R=8, quantize_bits=8
    )
    idx_dir = tmp_path / "dsq8" / "_indexes" / "vector" / "emb" / "default"
    v = spark.read.parquet(str(idx_dir / "vectors"))
    assert "qvec" in v.columns and "vec" not in v.columns
    out = ds.vector_search(vecs[5], "emb", topk=3).collect()
    assert out[0]["id"] == 5 and out[0]["rank"] == 1
