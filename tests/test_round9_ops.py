"""Round-9 operator tests: per-group HLL."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.aggregate import (  # noqa: E402
    hll_distinct,
    hll_distinct_by,
)


def _frame(spark):
    rows = []
    for g, n in (("a", 300), ("b", 900), ("c", 1)):
        rows += [(g, f"{g}_val_{j}") for j in range(n)]
    return spark.createDataFrame(rows, "grp string, v string")


def test_grouped_estimate_tracks_exact_per_group(spark):
    df = _frame(spark)
    out = {r["grp"]: r for r in hll_distinct_by(df, "v", ["grp"]).collect()}
    exact = {
        r["grp"]: r["n"]
        for r in df.groupBy("grp").agg(
            F.count_distinct("v").alias("n")
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    for g, n in exact.items():
        err = abs(out[g]["estimate"] - n) / n
        # 1.04/sqrt(1024) ~ 3.25%; allow 4 sigma
        assert err < 0.13, (g, out[g]["estimate"], n)
    assert out["c"]["nonzero_registers"] == 1


def test_grouped_matches_global_when_one_group(spark):
    """A single-group frame must reproduce hll_distinct exactly —
    same registers, same fold, same estimate."""
    df = _frame(spark).filter(F.col("grp") == "b")
    grouped = hll_distinct_by(df, "v", ["grp"]).collect()[0]
    glob = hll_distinct(df, "v").collect()[0]
    assert grouped["estimate"] == glob["estimate"]
    assert grouped["nonzero_registers"] == glob["nonzero_registers"]


def test_grouped_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", "x"), ("b", None)], "grp string, v string"
    )
    out = {r["grp"]: r for r in hll_distinct_by(df, "v", ["grp"]).collect()}
    assert set(out) == {"a"}  # b had only NULLs -> no sketch rows
    assert out["a"]["nonzero_registers"] == 1


def test_grouped_validation(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="precision"):
        hll_distinct_by(df, "v", ["grp"], precision=3)
    with pytest.raises(ValueError, match="group_cols"):
        hll_distinct_by(df, "v", [])


# ---------------------------------------------------------------------------
# plan-shape assertions: the round-9 operators must keep their declared
# 100 TB shapes — keyed joins only (no cartesian), no windows on the
# corpus path, bounded aggregate state
# ---------------------------------------------------------------------------

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_neardup_ledger_plan_keyed_joins_only(spark, tmp_path):
    from muller_spark.operators.dedup import (
        init_neardup_ledger, neardup_against_ledger,
    )

    path = str(tmp_path / "ledger")
    seed = spark.createDataFrame(
        [(i, f"seed doc {i} alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    init_neardup_ledger(seed, "text", "doc_id", path)
    batch = spark.createDataFrame(
        [(100, "novel content entirely unseen here")],
        "doc_id long, text string",
    )
    plan = _plan(neardup_against_ledger(
        batch, "text", "doc_id", path, update=False
    ))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_prefix_pairs_plan_no_cartesian_no_window(spark):
    from muller_spark.operators.dedup import prefix_verified_pairs

    df = spark.createDataFrame(
        [(i, f"some shared words plus unique tail {i} x{i} y{i}")
         for i in range(12)],
        "doc_id long, text string",
    )
    plan = _plan(prefix_verified_pairs(df, "text", "doc_id", threshold=0.6))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_hll_by_group_plan_no_window_no_join(spark):
    df = _frame(spark)
    plan = _plan(hll_distinct_by(df, "v", ["grp"]))
    assert "Window" not in plan
    assert "Join" not in plan  # two hash aggregates, nothing else
