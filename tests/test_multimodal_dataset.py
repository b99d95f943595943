"""F4 fixture: class-labeled multimodal table through the Dataset facade
(reference tests/utils.py:28-39, README.md:190-214): binary image cells
+ companion shape column + class_label name mapping + CONTAINS + stats."""

from __future__ import annotations

import hashlib
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark import dataset as ds_mod  # noqa: E402
from muller_spark.operators.aggregate import histogram  # noqa: E402

CLASS_NAMES = ["airplane", "automobile", "bird", "cat", "deer",
               "dog", "frog", "horse", "ship", "truck"]



# round-13 test tiering (VERDICT r12 #6): end-to-end tier, excluded
# from the driver-window default run; run with -m "slow or not slow"
pytestmark = pytest.mark.slow

@pytest.fixture()
def mds(spark, tmp_path):
    ds = ds_mod.dataset(str(tmp_path / "mm"), spark)
    ds.create_tensor("images", htype="image")
    ds.create_tensor("labels", htype="class_label", dtype="int32",
                     class_names=CLASS_NAMES)
    ds.create_tensor("categories", htype="text")
    ds.create_tensor("description", htype="text")
    fake_jpegs = [hashlib.md5(str(i).encode()).digest() * 4 for i in range(8)]
    labels = [3, 5, 3, 0, 5, 3, 8, 5]
    ds.extend({
        "images": fake_jpegs,
        "_images_shape": [[32, 32, 3]] * 8,
        "labels": labels,
        "categories": [CLASS_NAMES[i] for i in labels],
        "description": [f"a photo of a {CLASS_NAMES[i]} outdoors" for i in labels],
    })
    ds.commit("cifar-ish")
    return ds


def test_image_companion_shape_column(mds):
    assert "_images_shape" in mds.tensor_meta
    shapes = mds.df.select("_images_shape").collect()
    assert all(r[0] == [32, 32, 3] for r in shapes)
    blob = mds.df.select("images").first()[0]
    assert isinstance(bytes(blob), bytes) and len(blob) == 64


def test_class_label_filter_by_name(mds):
    # query-string engine maps 'cat' → id 3 via class_names info
    out = mds.filter("labels == 'cat'")
    assert out.count() == 3
    out = mds.filter("labels in ['cat', 'dog']")
    assert out.count() == 6


def test_contains_on_description(mds):
    out = mds.filter_vectorized([("description", "CONTAINS", "cat")], [])
    assert out.count() == 3
    both = mds.filter_vectorized(
        [("description", "CONTAINS", "cat||ship")], []
    )
    assert both.count() == 4


def test_lambda_filter_mapinpandas(mds):
    out = mds.filter(lambda row: row["labels"] == 5)
    assert out.count() == 3


def test_groupby_categories(mds):
    out = {
        r["categories"]: r["count_star"]
        for r in mds.aggregate_vectorized(
            group_by=["categories"], aggregate_tensors=["*"], method="count"
        ).collect()
    }
    assert out == {"cat": 3, "dog": 3, "airplane": 1, "ship": 1}


def test_statistics_and_histogram(mds):
    stats = mds.statistics().collect()
    by_col = {r["column"]: r for r in stats}
    assert by_col["labels"]["min"] == 0.0 and by_col["labels"]["max"] == 8.0
    assert by_col["description"]["kind"] == "text_length"

    hist = histogram(mds.df, "labels", bins=4).collect()
    assert sum(r["count"] for r in hist) == 8
    assert all(r["lo"] < r["hi"] for r in hist)


def test_index_update_incremental(spark, tmp_path):
    from muller_spark.index.inverted import InvertedIndex

    df1 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "id long, text string"
    )
    idx = InvertedIndex.build(df1, "text", str(tmp_path / "idx"), id_col="id")
    assert {r["id"] for r in idx.search("beta").collect()} == {0, 1}

    delta = spark.createDataFrame([(2, "beta delta")], "id long, text string")
    idx.update(delta, commit_id="c2")
    assert {r["id"] for r in idx.search("beta").collect()} == {0, 1, 2}
    assert {r["id"] for r in idx.search("delta").collect()} == {2}
    assert {r["id"] for r in idx.search("alpha").collect()} == {0}
    assert idx.manifest["commit_id"] == "c2"


def test_nifti_tensor_shape_companion_from_header(spark, tmp_path):
    """NIfTI volumes as a dataset tensor: bytes at rest in a binary
    column, decoded shape/dtype surfaced through extract_volume_metadata
    and written to the _volumes_shape companion — the same
    bytes+companion pattern as images, now with a real zero-dep NIfTI
    decode behind it."""
    import numpy as np

    from muller_spark.multimodal.codecs import decode_nifti, encode_nifti
    from muller_spark.multimodal.media import extract_volume_metadata

    vols = [
        (np.arange(24, dtype=np.int16).reshape(4, 3, 2), False),
        (np.linspace(0, 1, 30, dtype=np.float32).reshape(5, 3, 2), True),
    ]
    payloads = [encode_nifti(v, gz=gz) for v, gz in vols]

    ds = ds_mod.dataset(str(tmp_path / "nii"), spark)
    ds.create_tensor("volumes", htype="nifti")
    ds.create_tensor("patient", htype="text")
    ds.extend({"volumes": payloads, "patient": ["a", "b"]})

    meta = extract_volume_metadata(
        ds.df.select("_row_id", "volumes"), bytes_col="volumes", decode=True
    ).collect()
    got = {r["_row_id"]: r["volume_meta"] for r in meta}
    assert got[0]["shape"] == [4, 3, 2] and got[0]["dtype"] == "int16"
    assert got[1]["shape"] == [5, 3, 2] and got[1]["dtype"] == "float32"
    assert got[0]["n_voxels"] == 24 and got[1]["n_voxels"] == 30

    # write the decoded shapes into the companion, htype-pattern style
    assert "_volumes_shape" in ds.tensor_meta
    for i in range(2):
        ds["_volumes_shape"][i] = got[i]["shape"]
    shapes = {
        r["_row_id"]: r["_volumes_shape"]
        for r in ds.df.select("_row_id", "_volumes_shape").collect()
    }
    assert shapes == {0: [4, 3, 2], 1: [5, 3, 2]}

    # stored bytes decode back to the exact voxels
    rows = {r["_row_id"]: bytes(r["volumes"]) for r in ds.df.select("_row_id", "volumes").collect()}
    for i, (v, _gz) in enumerate(vols):
        assert np.array_equal(decode_nifti(rows[i]), v)

    # non-NIfTI payloads yield NULL metadata, not errors
    junk = spark.createDataFrame([(b"not a volume",)], "volumes binary")
    out = extract_volume_metadata(junk, bytes_col="volumes").collect()
    assert out[0]["volume_meta"]["shape"] is None
