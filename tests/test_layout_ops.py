"""skew_report and shuffle_shards vs pure-Python oracles."""

from __future__ import annotations

import hashlib

from muller_spark.operators.layout import shuffle_shards, skew_report


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_skew_report_counts_shares_and_ties(spark):
    rows = (
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [(None,)] * 2 + [("d",)] * 1
    )
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, "k", k=3).orderBy("rank").collect()
    # ties (b=3, c=3) break on key string asc; NULL is a real group
    assert [(r["rank"], r["key"], r["cnt"]) for r in got] == [
        (1, "a", 5), (2, "b", 3), (3, "c", 3)
    ]
    assert [r["share"] for r in got] == [
        round(5 / 14, 6), round(3 / 14, 6), round(3 / 14, 6)
    ]
    assert [r["cum_share"] for r in got] == [
        round(5 / 14, 6), round(8 / 14, 6), round(11 / 14, 6)
    ]


def test_skew_report_null_group_visible(spark):
    df = spark.createDataFrame([(None,)] * 4 + [("x",)], "k string")
    got = skew_report(df, "k", k=2).orderBy("rank").collect()
    assert (got[0]["key"], got[0]["cnt"]) == ("NULL", 4)


def test_skew_report_plan_is_topk_not_full_window(spark):
    """The cumulative window must run over the k survivors, never the
    full key space: the plan's global sort-limit (TakeOrderedAndProject)
    sits BELOW the Window."""
    df = spark.createDataFrame([(str(i % 7),) for i in range(100)], "k string")
    plan = skew_report(df, "k", k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_shuffle_shards_matches_python_and_is_deterministic(spark):
    ids = list(range(200))
    df = spark.createDataFrame([(i, f"t{i}") for i in ids], "doc_id long, text string")
    out = shuffle_shards(df, "doc_id", num_shards=4, seed=0)
    got = {(r["shard"], r["pos"]): r["doc_id"] for r in out.collect()}

    hv = {i: _h60(f"0|{i}") for i in ids}
    expect = {}
    for shard in range(4):
        members = sorted(
            (i for i in ids if hv[i] % 4 == shard), key=lambda i: (hv[i], i)
        )
        for pos, i in enumerate(members):
            expect[(shard, pos)] = i
    assert got == expect

    again = {(r["shard"], r["pos"]): r["doc_id"]
             for r in shuffle_shards(df, "doc_id", 4, seed=0).collect()}
    assert again == got


def test_shuffle_shards_seed_changes_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = [r["doc_id"] for r in
         shuffle_shards(df, "doc_id", 4, seed=0).orderBy("shard", "pos").collect()]
    b = [r["doc_id"] for r in
         shuffle_shards(df, "doc_id", 4, seed=1).orderBy("shard", "pos").collect()]
    assert a != b
    assert sorted(a) == sorted(b) == list(range(100))


def test_shuffle_shards_positions_contiguous(spark):
    df = spark.createDataFrame([(i,) for i in range(137)], "doc_id long")
    out = shuffle_shards(df, "doc_id", 5, seed=3).collect()
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 5
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert sum(len(v) for v in by_shard.values()) == 137
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_shuffle_shards_null_id_fails_loudly(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with _pytest.raises(Exception) as exc:
        shuffle_shards(df, "doc_id", 2, seed=0).collect()
    assert "NULL value in id column" in str(exc.value)


def test_shuffle_shards_rejects_bad_shard_count(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError):
        shuffle_shards(df, "doc_id", 0)


def test_bloom_and_shuffle_temp_columns_survive(spark):
    """User columns literally named like the internal temp names must
    pass through untouched."""
    df = spark.createDataFrame(
        [(1, "a b c d", 7), (2, "x y z w", 8)],
        "doc_id long, text string, __h int",
    )
    out = shuffle_shards(df, "doc_id", 2, seed=0)
    assert "__h" in out.columns and out.filter("__h in (7,8)").count() == 2
