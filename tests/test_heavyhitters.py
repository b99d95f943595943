"""Misra–Gries heavy hitters: exact-regime parity, the frequent-item
guarantee and under-count bound in the compaction regime, and bound
preservation through the distributed merge."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from muller_spark.operators.heavyhitters import _MG, heavy_hitters


# ---------------------------------------------------------------- _MG unit


def test_exact_regime_is_exact():
    mg = _MG(10)
    mg.add_counts({"a": 5, "b": 3})
    mg.add_counts({"a": 2, "c": 1})
    assert mg.counts == {"a": 7, "b": 3, "c": 1}
    assert mg.err == 0


def test_guarantee_and_bound_over_capacity():
    rng = random.Random(41)
    # zipf-ish: a few heavy items over a long tail
    items = []
    for i in range(8):
        items += [f"hot{i}"] * (4000 >> i)
    items += [f"tail{j}" for j in range(3000)]
    rng.shuffle(items)
    k = 32
    mg = _MG(k)
    for i in range(0, len(items), 500):
        mg.add_counts(dict(Counter(items[i:i + 500])))
    true = Counter(items)
    n = len(items)
    assert mg.err <= n // (k + 1)
    for item, tc in true.items():
        if tc > n // (k + 1):
            assert item in mg.counts, item  # frequent-item guarantee
    for item, est in mg.counts.items():
        assert est <= true[item] <= est + mg.err, item  # undercount bound
    assert len(mg.counts) <= k


def test_merge_rows_preserves_bound():
    rng = random.Random(43)
    items = [f"i{rng.randrange(200)}" for _ in range(10000)]
    halves = [items[:5000], items[5000:]]
    partial_rows = []
    for h in halves:
        mg = _MG(16)
        mg.add_counts(dict(Counter(h)))
        partial_rows += mg.rows()
    merged = _MG(16)
    merged.merge_rows(
        [r[0] for r in partial_rows],
        [r[1] for r in partial_rows],
        [r[2] for r in partial_rows],
    )
    true = Counter(items)
    assert merged.err <= len(items) // 17 * 2 + 1
    for item, est in merged.counts.items():
        assert est <= true[item] <= est + merged.err


def test_k_validation():
    with pytest.raises(ValueError, match="k must be"):
        _MG(0)


# ------------------------------------------------------------- Spark level


def test_spark_exact_regime_per_group(spark):
    rows = [
        ("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"), ("g2", None),
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r["g"], r["item"]): (r["est_count"], r["err_bound"])
        for r in heavy_hitters(df, "v", k=8, group_cols=["g"]).collect()
    }
    assert got == {
        ("g1", "x"): (2, 0), ("g1", "y"): (1, 0), ("g2", "z"): (1, 0),
    }


def test_spark_over_capacity_guarantee(spark):
    rng = random.Random(47)
    items = ["hot"] * 3000 + [f"t{j}" for j in range(2000)]
    rng.shuffle(items)
    df = spark.createDataFrame([(i,) for i in items], "v string").repartition(8)
    out = {r["item"]: r for r in heavy_hitters(df, "v", k=16).collect()}
    n = len(items)
    assert "hot" in out
    r = out["hot"]
    assert r["est_count"] <= 3000 <= r["est_count"] + r["err_bound"]
    assert len(out) <= 16


def test_spark_numeric_items_stringified(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "v int")
    got = {r["item"]: r["est_count"] for r in heavy_hitters(df, "v", k=4).collect()}
    assert got == {"1": 2, "2": 1}
