"""topk_per_group: result identical to the single-window plan, plan is
salted (no per-group single-task sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from muller_spark.operators.topk import topk_per_group


def _corpus(spark, n=5000, groups=4):
    return (
        spark.range(n)
        .select(
            (F.col("id") % groups).cast("string").alias("grp"),
            F.col("id").alias("key"),
            # collisions on purpose: score repeats every 97 ids so the
            # tie-break path is exercised
            (F.col("id") % 97).cast("double").alias("score"),
        )
    )


def _naive(df, k):
    w = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("key").asc()
    )
    return (
        df.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
    )


@pytest.mark.parametrize("k", [1, 3, 25])
def test_matches_single_window(spark, k):
    df = _corpus(spark)
    order = [F.col("score").desc(), F.col("key").asc()]
    got = topk_per_group(df, ["grp"], order, k=k).collect()
    want = _naive(df, k).collect()
    key = lambda r: (r["grp"], r["rnk"])
    assert sorted([tuple(r) for r in got], key=lambda t: (t[0], t[3])) == sorted(
        [tuple(r) for r in want], key=lambda t: (t[0], t[3])
    )
    assert len(got) == len(want)


def test_group_smaller_than_k(spark):
    df = _corpus(spark, n=6, groups=3)  # 2 rows per group
    out = topk_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("key").asc()], k=10
    )
    rows = out.collect()
    assert len(rows) == 6
    assert {r["rnk"] for r in rows} == {1, 2}


def test_salted_plan_shape(spark):
    """Phase-1 exchange must key on (group, salt), not group alone —
    that is the whole point: no low-cardinality hash partitioning of the
    full input."""
    df = _corpus(spark)
    out = topk_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("key").asc()], k=3,
        salt_on=["key"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    # two window nodes: salted partial + global re-rank
    assert plan.count("Window") >= 2


def test_rejects_bad_args(spark):
    df = _corpus(spark, n=10)
    with pytest.raises(ValueError):
        topk_per_group(df, ["grp"], [F.col("score").desc()], k=0)
    with pytest.raises(ValueError):
        topk_per_group(df, ["grp"], [], k=3)
