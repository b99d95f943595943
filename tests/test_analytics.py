"""Event-analytics operators (operators/analytics.py) and
cross-document duplicate passages (operators/dedup.duplicate_passages)."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.analytics import cohort_retention, funnel  # noqa: E402
from muller_spark.operators.dedup import duplicate_passages  # noqa: E402


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # user 2: purchase BEFORE view → converts view only
        (2, "purchase", _ts(1)), (2, "view", _ts(2)),
        # user 3: view then click, no purchase
        (3, "view", _ts(1)), (3, "click", _ts(5)),
        # user 4: click only → not in funnel at all
        (4, "click", _ts(1)),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    ).cache()


def test_funnel_ordered_conversion(ev):
    out = {r["step_name"]: r["n_users"] for r in
           funnel(ev, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_counts(spark):
    rows = [(1, "view", _ts(1)), (1, "click", _ts(1))]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["step_name"]: r["n_users"] for r in
           funnel(df, ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 1}  # at-or-after: ties convert


def test_cohort_retention(spark):
    rows = [
        (1, "view", dt.datetime(2024, 1, 5)),   # cohort Jan; active Jan, Feb
        (1, "view", dt.datetime(2024, 2, 7)),
        (2, "view", dt.datetime(2024, 1, 9)),   # cohort Jan; active Jan, Mar
        (2, "view", dt.datetime(2024, 3, 2)),
        (3, "view", dt.datetime(2024, 2, 1)),   # cohort Feb; active Feb only
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {(str(r["cohort_month"]), r["month_offset"]): r["n_users"]
           for r in cohort_retention(df).collect()}
    assert out == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 2): 1,
        ("2024-02-01", 0): 1,
    }


def test_duplicate_passages(spark):
    rows = [
        (0, "the quick brown fox sleeps"),
        (1, "a very quick brown fox runs"),
        (2, "nothing shared here at all"),
        (3, "quick brown fox quick brown fox"),  # passage twice in one doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["passage"]: (r["n_docs"], r["n_occurrences"]) for r in
           duplicate_passages(df, "text", "doc_id", n=3, min_docs=2).collect()}
    assert out["quick brown fox"] == (3, 4)  # docs 0,1,3; doc 3 twice
    assert all(n_docs >= 2 for n_docs, _ in out.values())
