"""aggregate_vectorized validation rules + property-style parity with a
pandas oracle (the reference checks the vectorized engine against the
row engine; we check against pandas groupby)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.aggregate import aggregate_vectorized  # noqa: E402


@pytest.fixture(scope="module")
def df(spark):
    rows = [(i % 3, f"g{i % 4}", float(i), i) for i in range(200)]
    return spark.createDataFrame(rows, "a int, b string, v double, n long")


def test_validation_selected_subset(df):
    with pytest.raises(ValueError, match="selected"):
        aggregate_vectorized(df, group_by=["a"], selected=["b"])


def test_validation_star_only_count(df):
    with pytest.raises(ValueError, match='"\\*"'):
        aggregate_vectorized(df, group_by=["a"], aggregate_tensors=["*"], method="sum")


def test_validation_order_by(df):
    with pytest.raises(ValueError, match="order_by"):
        aggregate_vectorized(df, group_by=["a"], order_by=["v"], method="count")


def test_validation_method(df):
    with pytest.raises(ValueError, match="method"):
        aggregate_vectorized(df, group_by=["a"], method="median")


def test_validation_direction(df):
    with pytest.raises(ValueError, match="order_direction"):
        aggregate_vectorized(df, group_by=["a"], order_by=["a"], order_direction="UP")


@pytest.mark.parametrize("method", ["count", "sum", "avg", "min", "max"])
def test_parity_with_pandas(df, method):
    out = aggregate_vectorized(
        df, group_by=["a", "b"], aggregate_tensors=["v"], method=method,
        order_by=["a", "b"],
    ).toPandas()
    pdf = df.toPandas()
    expected = getattr(pdf.groupby(["a", "b"])["v"], {"avg": "mean"}.get(method, method))()
    for _, row in out.iterrows():
        assert row[f"{method}_v"] == pytest.approx(expected.loc[(row["a"], row["b"])])


def test_order_desc_on_aggregate(df):
    out = aggregate_vectorized(
        df, group_by=["b"], aggregate_tensors=["*"], method="count",
        order_by=["count_star"], order_direction="DESC",
    ).toPandas()
    counts = out["count_star"].tolist()
    assert counts == sorted(counts, reverse=True)


def test_order_by_raw_tensor_name_resolves_to_alias(df):
    # the reference lets order_by name the aggregated tensor itself
    out = aggregate_vectorized(
        df, group_by=["b"], aggregate_tensors=["n"], method="sum",
        order_by=["n"], order_direction="ASC",
    ).toPandas()
    sums = out["sum_n"].tolist()
    assert sums == sorted(sums)


# ------------------------------------------------------------- plan audits
def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_semi_anti_joins_broadcast(spark):
    """q_join_semi_anti must broadcast both key sets: the customer scan
    never shuffles, which is what makes it safe at 100 TB."""
    import __spark_entry__ as entry

    df = entry.queries()["q_join_semi_anti"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cube_single_aggregation_shuffle(spark):
    """Cube's grouping lattice is computed via Expand feeding ONE
    partial+final hash aggregation — one data shuffle (plus the final
    presentation sort), never one pass per grouping set."""
    import __spark_entry__ as entry

    df = entry.queries()["q_cube"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "Expand" in plan, plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 hash shuffle, saw {n_exchanges}:\n{plan}"


def test_tfidf_broadcasts_vocabulary(spark):
    """The doc-frequency (vocabulary) side of TF-IDF must broadcast —
    a sort-merge join there would shuffle the full term-row table a
    third time for no reason."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tfidf_topterms"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_deterministic_split_stable_and_partitioned(spark):
    """Splits are a partition of the rows, invariant under repartition,
    and within 3 points of the requested fractions."""
    from pyspark.sql import functions as F

    from muller_spark.operators.sampling import deterministic_sample, deterministic_split

    df = spark.range(20_000).withColumnRenamed("id", "k")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = deterministic_split(df, F.col("k"), w)
    b = deterministic_split(df.repartition(7), F.col("k"), w)
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 20_000
    for name, frac in w.items():
        assert abs(counts[name] / 20_000 - frac) < 0.03, counts
    # identical assignment regardless of physical partitioning
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    # sample(fraction) == the first `fraction` of hash space
    n = deterministic_sample(df, F.col("k"), 0.25).count()
    assert abs(n / 20_000 - 0.25) < 0.03, n


def test_deterministic_hash_extreme_keys(spark):
    """Keys >= 2^31 and negative keys still hash into [0, 2^32) and
    match a pure-Python evaluation of the same formula — the int64
    overflow / dividend-sign regression guard for _hash_col.  DuckDB
    evaluates the mirrored SQL to the same values (hugeint promotion
    can't diverge because no intermediate exceeds 2^63-1)."""
    import duckdb
    from pyspark.sql import functions as F

    from muller_spark.operators.sampling import _KNUTH, _MOD, _KEY_MOD, _hash_col

    keys = [-(2**62), -5, -1, 0, 1, 2**31 - 1, 2**31, 2**40, 2**62]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["h"]
        for r in df.select("k", _hash_col(F.col("k"), 0).alias("h")).collect()
    }
    expect = {k: ((k % _KEY_MOD + _KEY_MOD) % _KEY_MOD) * _KNUTH % _MOD for k in keys}
    assert got == expect, (got, expect)
    assert all(0 <= h < _MOD for h in got.values())
    sql = (
        "SELECT k, ((k % 2147483648 + 2147483648) % 2147483648) * 2654435761 "
        "% 4294967296 AS h FROM (SELECT unnest($keys) AS k)"
    )
    duck = dict(duckdb.connect().execute(sql, {"keys": keys}).fetchall())
    assert duck == expect, (duck, expect)
