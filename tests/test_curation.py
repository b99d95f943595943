"""Unit tests for quantile_buckets and curation_pipeline — tiny
hand-checkable inputs, independent of the driver tables."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.curation import curation_pipeline  # noqa: E402
from muller_spark.operators.text import quantile_buckets  # noqa: E402


def test_quantile_buckets_terciles_by_hand(spark):
    # scores 1..9 in one group: cut points at the 1/3 and 2/3
    # continuous quantiles of [1..9] = 3.666…, 6.333…; <= lands tail
    # for 1-3, middle for 4-6, head for 7-9.
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 10)], "grp string, s double"
    )
    out = {
        r["s"]: r["bucket"]
        for r in quantile_buckets(df, "s", "grp").collect()
    }
    assert {k for k, v in out.items() if v == "tail"} == {1.0, 2.0, 3.0}
    assert {k for k, v in out.items() if v == "middle"} == {4.0, 5.0, 6.0}
    assert {k for k, v in out.items() if v == "head"} == {7.0, 8.0, 9.0}


def test_quantile_buckets_per_group_thresholds(spark):
    # group b's scores are 10x group a's — labels must be computed
    # within each group, so the same absolute score buckets differently
    rows = [("a", float(i)) for i in range(1, 10)] + [
        ("b", float(i * 10)) for i in range(1, 10)
    ]
    df = spark.createDataFrame(rows, "grp string, s double")
    out = quantile_buckets(df, "s", "grp").collect()
    by = {(r["grp"], r["s"]): r["bucket"] for r in out}
    assert by[("a", 9.0)] == "head"
    assert by[("b", 10.0)] == "tail"  # 10 is b's minimum


def test_quantile_buckets_ungrouped_and_custom_cuts(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "s double")
    out = quantile_buckets(
        df, "s", None, fractions=(0.5,), labels=("lo", "hi")
    ).collect()
    lo = {r["s"] for r in out if r["bucket"] == "lo"}
    assert lo == {1.0, 2.0, 3.0, 4.0, 5.0}  # median of 1..10 is 5.5


def test_quantile_buckets_validation(spark):
    df = spark.createDataFrame([(1.0,)], "s double")
    with pytest.raises(ValueError, match="len\\(labels\\)-1"):
        quantile_buckets(df, "s", None, fractions=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError, match="ascend"):
        quantile_buckets(df, "s", None, fractions=(0.7, 0.3))


def _doc(i, src, text):
    return (i, src, text)


def test_curation_pipeline_stages_by_hand(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        _doc(1, "a", good),                      # survives everything
        _doc(2, "a", good + " extra tail"),      # survives, unique content
        _doc(3, "a", "  " + good.upper() + " "), # exact dup of 1 after normalize
        _doc(4, "a", "x! y? z!!"),               # low quality: too short
        _doc(5, "b", good + " b variant one"),
        _doc(6, "b", None),                      # NULL text never survives
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = curation_pipeline(
        df, "text", "doc_id", "source", quality_min=0.5, top_fraction=1.0
    ).collect()
    kept = sorted(r["doc_id"] for r in out)
    # 3 deduped into 1 (min id wins), 4 quality-gated, 6 NULL-gated
    assert kept == [1, 2, 5]


def test_curation_pipeline_top_fraction_cut(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [_doc(i, "a", good + f" variant {i}") for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = curation_pipeline(
        df, "text", "doc_id", "source", quality_min=0.0, top_fraction=0.4
    ).collect()
    # ceil(round(5*0.4, 9)) = 2 survivors; equal scores -> min ids win
    assert sorted(r["doc_id"] for r in out) == [1, 2]


def test_quantile_buckets_null_score_gets_null_bucket(spark):
    # a NULL score contributes nothing to the thresholds, so no label
    # is honest — it must NOT fall through to the top bucket
    rows = [("g", float(i)) for i in range(1, 10)] + [("g", None)]
    df = spark.createDataFrame(rows, "grp string, s double")
    out = quantile_buckets(df, "s", "grp").collect()
    assert len(out) == 10  # the NULL-score row survives
    nulls = [r for r in out if r["s"] is None]
    assert len(nulls) == 1 and nulls[0]["bucket"] is None
    # thresholds unaffected by the NULL row
    assert {r["s"] for r in out if r["bucket"] == "head"} == {7.0, 8.0, 9.0}


def test_quantile_buckets_null_group_is_a_real_group(spark):
    # NULL group key must bucket against its own thresholds, not
    # disappear through a null-rejecting equi-join
    rows = [("a", float(i)) for i in range(1, 10)] + [
        (None, float(i * 100)) for i in range(1, 10)
    ]
    df = spark.createDataFrame(rows, "grp string, s double")
    out = quantile_buckets(df, "s", "grp").collect()
    assert len(out) == 18
    null_grp = {r["s"]: r["bucket"] for r in out if r["grp"] is None}
    assert {k for k, v in null_grp.items() if v == "head"} == {700.0, 800.0, 900.0}


def test_quantile_buckets_approx_mode_matches_exact_here(spark):
    # approx_percentile with a generous accuracy reproduces the exact
    # terciles on a tiny input — the bounded-state 100 TB path
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 10)], "grp string, s double"
    )
    exact = {
        r["s"]: r["bucket"] for r in quantile_buckets(df, "s", "grp").collect()
    }
    approx = {
        r["s"]: r["bucket"]
        for r in quantile_buckets(df, "s", "grp", approx_accuracy=10000).collect()
    }
    assert approx == exact
