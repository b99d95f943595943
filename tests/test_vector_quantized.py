"""SQ8 inverted-list IVF: int8-quantized list storage (the FAISS
IVF,SQ8 layout) must match the float32-list search at high recall —
the 4× footprint cut can't cost meaningful accuracy."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.index.vector import (  # noqa: E402
    build_ivf_artifacts,
    exact_knn,
    ivf_search_prebuilt,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def _topk_ids(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["id"]))
    return {q: [i for _, i in sorted(v)] for q, v in out.items()}


def test_sq8_ivf_recall_vs_exact(spark, emb, tmp_path):
    q = [r["embedding"] for r in emb.filter(F.col("vec_id") < 3).collect()]
    path = str(tmp_path / "ivf_sq8")
    build_ivf_artifacts(
        emb, "embedding", "vec_id", path,
        num_centroids=8, store_vectors=True, quantize_bits=8,
    )
    # exhaustive probe (nprobe == nlist) isolates QUANTIZATION error
    # from coarse-quantizer recall
    got = _topk_ids(ivf_search_prebuilt(
        emb, "embedding", "vec_id", path, q, k=10, nprobe=8,
    ))
    want = _topk_ids(exact_knn(emb, "embedding", "vec_id", q, k=10))
    recalls = [
        len(set(got[qi]) & set(want[qi])) / 10 for qi in range(3)
    ]
    assert min(recalls) >= 0.9, recalls


def test_sq8_storage_is_int8(spark, emb, tmp_path):
    path = str(tmp_path / "ivf_sq8b")
    build_ivf_artifacts(
        emb, "embedding", "vec_id", path,
        num_centroids=4, store_vectors=True, quantize_bits=8,
    )
    assign = spark.read.parquet(os.path.join(path, "assign"))
    kinds = dict(assign.dtypes)
    assert kinds["qvec"] == "array<tinyint>" and kinds["scale"] == "float"
    row = assign.limit(1).collect()[0]
    assert all(-127 <= x <= 127 for x in row["qvec"])
    assert row["scale"] >= 0


def test_sq8_requires_stored_vectors(spark, emb, tmp_path):
    with pytest.raises(ValueError):
        build_ivf_artifacts(
            emb, "embedding", "vec_id", str(tmp_path / "x"),
            store_vectors=False, quantize_bits=8,
        )
    with pytest.raises(ValueError):
        build_ivf_artifacts(
            emb, "embedding", "vec_id", str(tmp_path / "y"),
            store_vectors=True, quantize_bits=16,
        )


def test_dataset_facade_sq8_index_and_search(spark, emb, tmp_path):
    """create_vector_index(index_type='IVF', quantize_bits=8) through
    the Dataset facade builds SQ8 lists and vector_search uses them."""
    from muller_spark import dataset as ds_mod

    ds = ds_mod.dataset(str(tmp_path / "ds"), spark)
    ds.create_tensor("vec_id", dtype="int64")
    ds.create_tensor("embedding", htype="embedding", dtype="float32")
    ds.extend_df(emb.select("vec_id", "embedding"))
    ds.commit("seed")
    ds.create_vector_index(
        "embedding", index_type="IVF", nlist=8, quantize_bits=8,
    )
    idx_root = os.path.join(str(tmp_path / "ds"), "_indexes", "vector",
                            "embedding", "default", "assign")
    kinds = dict(spark.read.parquet(idx_root).dtypes)
    assert kinds["qvec"] == "array<tinyint>"
    q = [r["embedding"] for r in emb.filter(F.col("vec_id") == 0).collect()]
    hits = ds.vector_search(q[0], "embedding", topk=5)
    assert hits.count() == 5


def test_update_after_sq8_build_keeps_search_alive(spark, emb, tmp_path):
    """Regression (round-8 review): append_ivf_assignments must land
    delta rows in the SAME layout as the existing assign table —
    (id, cell)-only rows in an SQ8/vec table are NULL list entries
    that crash the next search's np.stack."""
    from muller_spark import dataset as ds_mod

    ds = ds_mod.dataset(str(tmp_path / "ds"), spark)
    ds.create_tensor("vec_id", dtype="int64")
    ds.create_tensor("embedding", htype="embedding", dtype="float32")
    ds.extend_df(emb.select("vec_id", "embedding").filter(F.col("vec_id") < 400))
    ds.commit("seed")
    ds.create_vector_index("embedding", index_type="IVF", nlist=4,
                           quantize_bits=8)
    ds.extend_df(emb.select("vec_id", "embedding").filter(F.col("vec_id") >= 400))
    ds.commit("delta")
    ds.update_vector_index("embedding")
    # the appended rows carry the SQ8 layout
    assign = spark.read.parquet(os.path.join(
        str(tmp_path / "ds"), "_indexes", "vector", "embedding",
        "default", "assign"))
    assert assign.filter(F.col("qvec").isNull()).count() == 0
    q = [r["embedding"] for r in emb.filter(F.col("vec_id") == 450).collect()]
    hits = ds.vector_search(q[0], "embedding", topk=5).collect()
    assert len(hits) == 5  # pre-fix: ValueError from np.stack on NULLs


def test_update_after_float32_lists_build(spark, emb, tmp_path):
    from muller_spark import dataset as ds_mod

    ds = ds_mod.dataset(str(tmp_path / "ds2"), spark)
    ds.create_tensor("vec_id", dtype="int64")
    ds.create_tensor("embedding", htype="embedding", dtype="float32")
    ds.extend_df(emb.select("vec_id", "embedding").filter(F.col("vec_id") < 400))
    ds.commit("seed")
    ds.create_vector_index("embedding", index_type="IVF", nlist=4,
                           store_vectors=True)
    ds.extend_df(emb.select("vec_id", "embedding").filter(F.col("vec_id") >= 400))
    ds.commit("delta")
    ds.update_vector_index("embedding")
    assign = spark.read.parquet(os.path.join(
        str(tmp_path / "ds2"), "_indexes", "vector", "embedding",
        "default", "assign"))
    assert assign.filter(F.col("vec").isNull()).count() == 0
    q = [r["embedding"] for r in emb.filter(F.col("vec_id") == 450).collect()]
    assert len(ds.vector_search(q[0], "embedding", topk=5).collect()) == 5
