"""Round-6 plan assertions: the TPC-H-shaped join queries keep their
scale-safe physical shapes, and the sort-over-map-only fix stays fixed.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize(
    "name,max_shuffles,want_top",
    [
        # Q3: dims broadcast into the fact side; only the groupBy
        # shuffles; top-10 must be TakeOrderedAndProject (partial
        # per-partition top-k), never a global Sort of the aggregate.
        ("q_tpch_q3_shipping", 1, True),
        # Q5: six tables, zero SortMergeJoin — broadcast everywhere the
        # planner can; at most orders⋈lineitem + the agg shuffle.
        ("q_tpch_q5_local_supplier", 2, False),
        # Q10: one quarter of orders broadcasts; 'R' lineitems never
        # shuffle for the join, only for the customer-grain aggregate.
        ("q_tpch_q10_returns", 1, True),
    ],
)
def test_tpch_join_plans(spark, name, max_shuffles, want_top):
    plan = _plan(spark, name)
    assert "SortMergeJoin" not in plan, f"{name} fell back to SMJ:\n{plan}"
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= max_shuffles, (
        f"{name}: {shuffles} shuffle exchanges (cap {max_shuffles})"
    )
    if want_top:
        assert "TakeOrderedAndProject" in plan, (
            f"{name}: top-k planned as a global sort"
        )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("name", ["q_text_normalize", "q_chunk_documents"])
def test_sort_sits_below_heavy_projection(spark, name):
    """Round-6 fix regression guard: the global Sort must sit BELOW the
    expensive map-side projection (Project/Generate above Sort), so the
    range-partitioning sampling job never executes the translate/
    entropy/chunk expressions — the r5 '+17%' was exactly this shape
    inverted (EXPLAIN.md round-6 isolation table)."""
    plan = _plan(spark, name)
    # In the fixed shape the Sort's direct subtree is the raw scan —
    # heavy expressions (translate / sequence+transform) appear only
    # above it.  String check: the first Sort occurrence comes after
    # the Project/Generate mention in the top-down plan print.
    sort_pos = plan.find("Sort ")
    heavy_pos = max(plan.find("translate("), plan.find("Generate "))
    assert sort_pos != -1 and heavy_pos != -1
    assert heavy_pos < sort_pos, (
        f"{name}: heavy projection is below the Sort again\n{plan[:2000]}"
    )
