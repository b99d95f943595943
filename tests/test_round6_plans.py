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
    "name,max_hints,max_shuffles,want_top",
    [
        # Round-7 scale fix: NO forced broadcast hints on SF-scaling
        # relations (orders/customer/supplier — a hint is honored
        # regardless of size and would OOM the broadcast at 100x).
        # Only SF-invariant dims (region: 5 rows, nation: 25) may hint;
        # AQE must still converge every join to BroadcastHashJoin at
        # sf0.01 from RUNTIME stats, within the same shuffle caps as
        # the hinted round-6 plans.
        #
        # Q3: zero hints (no region/nation in the query); only the
        # groupBy shuffles; top-10 must be TakeOrderedAndProject.
        ("q_tpch_q3_shipping", 0, 1, True),
        # Q5: hints allowed only on region+nation (2); at most
        # orders⋈lineitem + the agg shuffle.
        ("q_tpch_q5_local_supplier", 2, 2, False),
        # Q10: hint allowed only on nation (1); 'R' lineitems shuffle
        # only for the customer-grain aggregate.
        ("q_tpch_q10_returns", 1, 1, True),
        # Round-7 additions.  Q6: pure scan + 1-row agg — the only
        # exchange is the final-agg gather.
        ("q_tpch_q6_forecast", 0, 1, False),
        # Q14: part scales with SF (no hint); AQE broadcasts it at
        # sf0.01, leaving only the final-agg gather.
        ("q_tpch_q14_promo", 0, 1, False),
        # Q18: the orderkey agg shuffles once; the post-HAVING survivor
        # set then AQE-broadcasts into orders/customer; top-100 must be
        # TakeOrderedAndProject.
        ("q_tpch_q18_big_orders", 0, 2, True),
    ],
)
def test_tpch_join_plans(spark, name, max_hints, max_shuffles, want_top):
    df = entry.queries()[name](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") <= max_hints, (
        f"{name}: forced broadcast hint on an SF-scaling relation\n"
        f"{analyzed[:2000]}"
    )
    # execute, then judge the FINAL adaptive plan (AQE converts the
    # statically-SMJ-planned joins to broadcast from runtime sizes)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final, f"{name} fell back to SMJ:\n{final}"
    shuffles = final.count("Exchange") - final.count("BroadcastExchange")
    assert shuffles <= max_shuffles, (
        f"{name}: {shuffles} shuffle exchanges (cap {max_shuffles})"
    )
    if want_top:
        assert "TakeOrderedAndProject" in final, (
            f"{name}: top-k planned as a global sort"
        )


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize(
    "name",
    ["q_text_normalize", "q_chunk_documents", "q_winnow_fingerprints"],
)
def test_sort_sits_below_heavy_projection(spark, name):
    """Round-6 fix regression guard: the global Sort must sit BELOW the
    expensive map-side projection (Project/Generate above Sort), so the
    range-partitioning sampling job never executes the translate/
    entropy/chunk expressions — the r5 '+17%' was exactly this shape
    inverted (EXPLAIN.md round-6 isolation table).

    Round-7 ADVICE addition: these queries' ordered-oracle correctness
    relies on Spark preserving row order through the map-only operators
    above the pre-sort.  That holds only while NO exchange sits above
    the Sort — assert it, so a future plan change (AQE coalescing, a
    new shuffle) turns into a plan-test failure instead of a silent
    oracle mismatch."""
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
    # order preservation: the only Exchange allowed is the Sort's own
    # range partitioning, which prints BELOW (after) the Sort — nothing
    # above the Sort may reorder rows
    above = plan[:sort_pos]
    assert "Exchange" not in above, (
        f"{name}: an exchange above the pre-sort breaks the ordered "
        f"oracle contract\n{plan[:2000]}"
    )
