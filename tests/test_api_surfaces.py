"""Coverage for small API surfaces that had no direct test (found by a
round-6 unused-symbol sweep): Dataset.to_dataframe / to_df / summary
(reference parity ops — export_data/to_dataframe.py:14, statistics/
summary.py:33), tables.load_tables, fs.read_json/write_json, and
sampling.bucket_of.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark import dataset as ds_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def small_ds(spark, tmp_path):
    ds = ds_mod.dataset(str(tmp_path / "api"), spark)
    ds.create_tensor("x", dtype="int64")
    ds.create_tensor("t", htype="text")
    ds.extend({"x": [3, 1, 2], "t": ["c", "a", "b"]})
    ds.commit("seed")
    return ds


def test_to_dataframe_pandas_export_row_order(small_ds):
    pdf = small_ds.to_dataframe()
    # row order = insertion order (ROW_ID), hidden columns dropped
    assert list(pdf["x"]) == [3, 1, 2]
    assert list(pdf["t"]) == ["c", "a", "b"]
    assert not any(c.startswith("_") for c in pdf.columns)


def test_to_df_hides_internal_columns(small_ds):
    cols = small_ds.to_df().columns
    assert set(cols) == {"x", "t"}


def test_summary_shape(small_ds):
    s = small_ds.summary()
    assert s["rows"] == 3
    assert s["branch"] == "main"
    assert s["tensors"]["x"]["dtype"] == "int64"
    assert s["tensors"]["t"]["htype"] == "text"
    assert s["commit"] == small_ds.commit_id


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_load_tables_loads_all_driver_tables(spark):
    from muller_spark.tables import TABLE_NAMES, load_tables

    tables = load_tables(spark, SF_DIR)
    assert set(tables) == set(TABLE_NAMES)
    assert tables["nation"].count() == 25


def test_fs_json_roundtrip(tmp_path):
    from muller_spark.fs import get_fs, read_json, write_json

    path = str(tmp_path / "meta" / "x.json")
    fs = get_fs(path)
    fs.makedirs(str(tmp_path / "meta"))
    write_json(fs, path, {"a": 1, "nested": {"b": [1, 2]}})
    assert read_json(fs, path) == {"a": 1, "nested": {"b": [1, 2]}}


def test_bucket_of_known_answers_and_range(spark):
    from muller_spark.operators.sampling import bucket_of

    # bucket_of = knuth_hash % n; knuth(1, salt 0) = 2654435761
    #   -> bucket_of(1, 10) = 1;  knuth(0) = 0 -> bucket 0
    df = spark.range(0, 1000).select(
        "id", bucket_of(F.col("id"), n_buckets=10).alias("b")
    )
    rows = {r["id"]: r["b"] for r in df.collect()}
    assert rows[0] == 0
    assert rows[1] == 2654435761 % 10
    assert set(rows.values()) <= set(range(10))
    # roughly uniform: every bucket populated over 1000 keys
    assert len(set(rows.values())) == 10


def test_dataset_search_bm25(spark, tmp_path):
    ds = ds_mod.dataset(str(tmp_path / "bm"), spark)
    ds.create_tensor("t", htype="text")
    ds.extend({"t": ["cat dog", "cat cat fish", "bird only"]})
    ds.commit("seed")
    with pytest.raises(ValueError):
        ds.search_bm25("t", "cat")  # no index yet
    ds.create_index_vectorized("t", positions=True)
    rows = ds.search_bm25("t", "cat", k=5).collect()
    # higher tf ranks first; the non-matching doc is absent
    assert [r["t"] for r in rows] == ["cat cat fish", "cat dog"]
    assert rows[0]["_bm25_score"] > rows[1]["_bm25_score"]
    # staleness guard: a new commit invalidates the index
    ds.extend({"t": ["cat again"]})
    ds.commit("more")
    with pytest.raises(ValueError):
        ds.search_bm25("t", "cat")
    ds.update_index("t")
    assert len(ds.search_bm25("t", "cat", k=5).collect()) == 3


def test_from_jsonl_quarantine_splits_good_and_bad(spark, tmp_path):
    from muller_spark.sources.readers import from_jsonl_quarantine

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "text": "ok"}\n'
        '{"id": 2, "text": "also ok"}\n'
        'this is not json at all\n'
        '{"id": 3, "text": "trunca…\n'
        '{"id": 4, "text": "fine"}\n'
    )
    good, bad = from_jsonl_quarantine(spark, str(p), "id long, text string")
    g = {r["id"]: r["text"] for r in good.collect()}
    assert g == {1: "ok", 2: "also ok", 4: "fine"}
    b = [r["raw_line"] for r in bad.collect()]
    assert len(b) == 2
    assert any("not json" in x for x in b)
    assert all(r["file"].endswith("feed.jsonl") for r in bad.collect())


def test_from_jsonl_quarantine_corrupt_name_collision(spark, tmp_path):
    from muller_spark.sources.readers import from_jsonl_quarantine

    p = tmp_path / "f.jsonl"
    p.write_text('{"_corrupt_record": "x", "id": 1}\nnot json\n')
    good, bad = from_jsonl_quarantine(
        spark, str(p), "_corrupt_record string, id long"
    )
    assert good.collect()[0]["_corrupt_record"] == "x"
    assert bad.count() == 1


def test_from_jsonl_quarantine_all_good_and_all_bad(spark, tmp_path):
    from muller_spark.sources.readers import from_jsonl_quarantine

    pg = tmp_path / "good.jsonl"
    pg.write_text('{"id": 1}\n{"id": 2}\n')
    good, bad = from_jsonl_quarantine(spark, str(pg), "id long")
    assert good.count() == 2 and bad.count() == 0

    pb = tmp_path / "bad.jsonl"
    pb.write_text("garbage\nmore garbage\n")
    good2, bad2 = from_jsonl_quarantine(spark, str(pb), "id long")
    assert good2.count() == 0 and bad2.count() == 2
