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


def test_funnel_within_window(ev):
    # user 3 clicks 4 days after viewing → drops out of a 1-day funnel
    out = {r["step_name"]: r["n_users"] for r in
           funnel(ev, ["view", "click", "purchase"],
                  within_seconds=86400).collect()}
    assert out == {"view": 3, "click": 1, "purchase": 1}


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


def test_dedup_clusters_components(spark):
    from muller_spark.operators.dedup import canonical_keep_list, dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id long"
    )
    keep = {r["id"]: (r["cluster_id"], r["keep"]) for r in
            canonical_keep_list(docs, pairs, "doc_id").collect()}
    assert keep[1] == (1, True) and keep[2] == (1, False) and keep[3] == (1, False)
    assert keep[10] == (10, True) and keep[11] == (10, False)
    assert keep[99] == (99, True)   # not in any pair → keeps itself


def test_dedup_clusters_chain_convergence(spark):
    from muller_spark.operators.dedup import dedup_clusters

    # path graph 0-1-2-...-9: worst-case diameter for label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    out = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert out == {i: 0 for i in range(10)}


def test_contamination_report(spark):
    from muller_spark.operators.dedup import contamination_report

    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [
            (100, "alpha beta gamma delta nothing else"),   # overlaps doc 0
            (101, "completely fresh held out words here"),  # clean
        ],
        "doc_id long, text string",
    )
    out = contamination_report(
        train, test, "text", "doc_id", n=3, min_overlap=1
    ).collect()
    rows = {(r["train_id"], r["test_id"]): r for r in out}
    assert set(rows) == {(0, 100)}
    r = rows[(0, 100)]
    # test doc 100 has 4 windows; "alpha beta gamma"+"beta gamma delta" shared
    assert r["n_shared"] == 2
    assert r["test_window_frac"] == 0.5


def test_funnel_plan_single_user_shuffle(ev):
    plan = (
        funnel(ev, ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one user-keyed Exchange + one single-partition final aggregate,
    # no joins over raw events
    assert plan.count("Exchange") == 2, plan
    assert "Join" not in plan, plan


def test_duplicate_passages_plan_topk(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e")], "doc_id long, text string"
    )
    plan = (
        duplicate_passages(docs, "text", "doc_id", n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # global top-k must be TakeOrderedAndProject, never a full sort
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan


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


def test_event_paths_by_hand(spark):
    from muller_spark.operators.analytics import event_paths

    # user 1: a b c a b c  -> 3-paths: abc, bca, cab, abc
    # user 2: a b c        -> abc
    rows = [(1, t, e) for t, e in enumerate("abcabc")] + [
        (2, t, e) for t, e in enumerate("abc")
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = {r["path"]: r["n"] for r in
           event_paths(df, "user_id", "event_type", "ts", length=3).collect()}
    assert out == {
        "a → b → c": 3,
        "b → c → a": 1,
        "c → a → b": 1,
    }


def test_event_paths_length_2_matches_transitions(spark):
    from muller_spark.operators.analytics import event_paths, event_transitions

    rows = [(1, t, e) for t, e in enumerate("abab")] + [
        (2, t, e) for t, e in enumerate("ba")
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    paths = {r["path"]: r["n"] for r in
             event_paths(df, "user_id", "event_type", "ts", length=2).collect()}
    trans = {f'{r["from_event"]} → {r["to_event"]}': r["n"] for r in
             event_transitions(df, "user_id", "event_type", "ts").collect()}
    assert paths == trans


def test_event_paths_validation(spark):
    import pytest as _pytest

    from muller_spark.operators.analytics import event_paths

    df = spark.createDataFrame([(1, 1, "a")], "user_id long, ts long, event_type string")
    with _pytest.raises(ValueError, match=">= 2"):
        event_paths(df, "user_id", "event_type", "ts", length=1)


def test_event_paths_null_event_values_excluded(spark):
    from muller_spark.operators.analytics import event_paths

    # a NULL event value inside a window must drop the whole window —
    # concat_ws would otherwise silently skip it and count a
    # 2-component string as a 3-step path
    rows = [
        ("u1", "view", 1), ("u1", None, 2), ("u1", "buy", 3),
        ("u2", "view", 1), ("u2", "cart", 2), ("u2", "buy", 3),
    ]
    df = spark.createDataFrame(rows, "user string, ev string, ts long")
    out = {
        r["path"]: r["n"]
        for r in event_paths(df, "user", "ev", "ts", length=3).collect()
    }
    assert out == {"view → cart → buy": 1}
