"""Posting-table count(*) fast path (reference aggregate.py:33-51,
255-309: class_label count group-bys answered purely from inverted-index
postings — the last custom-optimizer row of SURVEY §4)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark import dataset as ds_mod  # noqa: E402


@pytest.fixture()
def labeled_ds(spark, tmp_path):
    ds = ds_mod.dataset(str(tmp_path / "lab"), spark)
    ds.create_tensor("label", htype="class_label", dtype="int64")
    ds.create_tensor("other", dtype="int64")
    ds.create_tensor("note", htype="text")
    labels = [i % 3 for i in range(60)]
    ds.extend({
        "label": labels,
        "other": [i % 2 for i in range(60)],
        "note": [f"n{i}" for i in range(60)],
    })
    ds.commit("seed")
    return ds


def _counts(df):
    return {tuple(r[c] for c in df.columns[:-1]): r["count_star"] for r in df.collect()}


def test_count_fastpath_reads_only_postings(labeled_ds):
    ds = labeled_ds
    ds.create_index_vectorized("label")
    out = ds.aggregate_vectorized(group_by=["label"], order_by=["label"])
    # values match the hash-agg ground truth
    assert _counts(out) == {(0,): 20, (1,): 20, (2,): 20}
    # and the query reads ONLY posting files — never the base data
    files = out.inputFiles()
    assert files and all("_indexes/inverted" in f for f in files), files
    # ordering flows through the shared ORDER BY application
    assert [r["label"] for r in out.collect()] == [0, 1, 2]


def test_count_fastpath_multi_column_intersects_postings(labeled_ds):
    ds = labeled_ds
    ds.create_index_vectorized("label")
    ds.create_index_vectorized("other")
    out = ds.aggregate_vectorized(
        group_by=["label", "other"], order_by=["label", "other"]
    )
    want = ds.df.groupBy("label", "other").agg(
        F.count(F.lit(1)).alias("count_star")
    )
    assert _counts(out) == _counts(want.orderBy("label", "other"))
    files = out.inputFiles()
    assert files and all("_indexes/inverted" in f for f in files), files


def test_count_fastpath_falls_back_without_index(labeled_ds):
    ds = labeled_ds
    out = ds.aggregate_vectorized(group_by=["label"], order_by=["label"])
    assert _counts(out) == {(0,): 20, (1,): 20, (2,): 20}


def test_count_fastpath_falls_back_on_stale_index(labeled_ds):
    ds = labeled_ds
    ds.create_index_vectorized("label")
    ds.extend({"label": [0], "other": [0], "note": ["x"]})
    out = ds.aggregate_vectorized(group_by=["label"], order_by=["label"])
    assert _counts(out) == {(0,): 21, (1,): 20, (2,): 20}


def test_count_fastpath_falls_back_on_text_index(labeled_ds):
    """A TEXT index tokenizes cells — term counts are token stats, not
    row groups; the fast path must refuse it."""
    ds = labeled_ds
    ds.create_index_vectorized("note")
    out = ds.aggregate_vectorized(group_by=["note"])
    assert out.count() == 60  # one group per distinct note value


def test_count_fastpath_falls_back_on_nulls(spark, tmp_path):
    """NULL cells have no posting row; the hash-agg path emits a NULL
    group, so the fast path must detect the gap and fall back."""
    ds = ds_mod.dataset(str(tmp_path / "nul"), spark)
    ds.create_tensor("label", dtype="int64")
    ds.extend({"label": [0, 1, None, 1]})
    ds.commit("seed")
    ds.create_index_vectorized("label")
    out = ds.aggregate_vectorized(group_by=["label"])
    got = {r["label"]: r["count_star"] for r in out.collect()}
    assert got == {0: 1, 1: 2, None: 1}


def test_count_fastpath_rejects_non_star_and_other_methods(labeled_ds):
    ds = labeled_ds
    ds.create_index_vectorized("label")
    # sum goes to hash-agg (values must come from the base table)
    out = ds.aggregate_vectorized(
        group_by=["label"], aggregate_tensors=["other"], method="sum"
    )
    got = {r["label"]: r["sum_other"] for r in out.collect()}
    assert got == {0: 10, 1: 10, 2: 10}
