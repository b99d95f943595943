"""topk_per_group: both strategies identical to the single-window plan;
the native plan's scale proof is the map-side Partial WindowGroupLimit."""

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
@pytest.mark.parametrize("strategy", ["native", "salted"])
def test_matches_single_window(spark, k, strategy):
    df = _corpus(spark)
    order = [F.col("score").desc(), F.col("key").asc()]
    got = topk_per_group(df, ["grp"], order, k=k, strategy=strategy).collect()
    want = _naive(df, k).collect()
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


def test_native_plan_has_partial_group_limit(spark):
    """The scale property of the default strategy: Catalyst must place a
    Partial WindowGroupLimit BELOW the group-key Exchange, so each map
    task keeps only k rows per group and the shuffle carries at most
    tasks * groups * k rows — no per-group single-task sort of the full
    input ever exists.  If a Spark upgrade dropped this rewrite, the
    salted strategy would become the required default again; this test
    is the tripwire."""
    df = _corpus(spark)
    out = topk_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("key").asc()], k=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    partial = plan.find("WindowGroupLimit")
    assert partial != -1 and "Partial" in plan, plan[:2000]
    # the Partial node must sit below (after, in toString order) the
    # Exchange: map-side, pre-shuffle
    exchange = plan.find("Exchange hashpartitioning(grp")
    partial_node = plan.find(", 3, Partial")
    assert exchange != -1 and partial_node > exchange, plan[:2000]


def test_salted_plan_shape(spark):
    """The fallback strategy's phase-1 exchange must key on
    (group, salt), not group alone."""
    df = _corpus(spark)
    out = topk_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("key").asc()], k=3,
        strategy="salted", salt_on=["key"],
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
    with pytest.raises(ValueError):
        topk_per_group(df, ["grp"], [F.col("score").desc()], k=3,
                       strategy="bogus")


def test_rrf_fuse_hand_computed(spark):
    """RRF arithmetic pinned by hand: two 3-item lists with one common
    id; k=60.  doc 10 is rank 1 in A and rank 2 in B ->
    1/61 + 1/62; ids unique to one list get a single term."""
    from muller_spark.operators.topk import rrf_fuse
    from pyspark.sql import functions as F

    a = spark.createDataFrame(
        [(10, 5.0), (11, 3.0), (12, 1.0)], "id long, s double"
    )
    b = spark.createDataFrame(
        [(20, 9.0), (10, 8.0), (13, 7.0)], "id long, q double"
    )
    rows = {r["id"]: r["rrf_score"] for r in rrf_fuse(
        [(a, "s"), (b, "q")], k=60
    ).collect()}
    assert rows[10] == pytest.approx(round(1 / 61 + 1 / 62, 6), abs=1e-6)
    assert rows[20] == pytest.approx(round(1 / 61, 6), abs=1e-6)
    assert rows[11] == pytest.approx(round(1 / 62, 6), abs=1e-6)
    assert rows[13] == pytest.approx(round(1 / 63, 6), abs=1e-6)
    # consensus beats a single first place
    assert rows[10] > rows[20]

    # three lists: ordered fold keeps the sum deterministic
    c = spark.createDataFrame([(10, 1.0), (13, 0.5)], "id long, r double")
    fused3 = {r["id"]: r["rrf_score"] for r in rrf_fuse(
        [(a, "s"), (b, "q"), (c, "r")], k=60
    ).collect()}
    assert fused3[10] == pytest.approx(
        round(1 / 61 + 1 / 62 + 1 / 61, 6), abs=1e-6
    )

    # tie-break: equal scores rank by id ascending
    t = spark.createDataFrame([(2, 1.0), (1, 1.0)], "id long, s double")
    tied = {r["id"]: r["rrf_score"] for r in rrf_fuse([(t, "s")], k=60).collect()}
    assert tied[1] == pytest.approx(round(1 / 61, 6))
    assert tied[2] == pytest.approx(round(1 / 62, 6))

    with pytest.raises(ValueError):
        rrf_fuse([])
