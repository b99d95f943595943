"""Round-7 scale-shape assertions: the pop/merge renumber path runs
WITHOUT a single-partition exchange, and dense_row_numbers is
bit-identical to the naive global window."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.rowid import dense_row_numbers  # noqa: E402


def test_dense_row_numbers_matches_global_window(spark):
    rows = [(i * 7 % 997, f"v{i}") for i in range(500)]  # unique keys, shuffled
    df = spark.createDataFrame(rows, "pos long, val string").repartition(8)
    got = {
        r["val"]: r["rid"]
        for r in dense_row_numbers(df, ["pos"], "rid").collect()
    }
    w = Window.orderBy(F.col("pos").asc())
    want = {
        r["val"]: r["rid"]
        for r in df.withColumn(
            "rid", (F.row_number().over(w) - 1).cast("long")
        ).collect()
    }
    assert got == want


def test_dense_row_numbers_with_group_prefix(spark):
    # two priority groups, positions unique within each — the merge shape
    rows = [(0, p, f"o{p}") for p in (5, 1, 9)] + [(1, p, f"t{p}") for p in (2, 0)]
    df = spark.createDataFrame(rows, "pri long, pos long, val string")
    out = dense_row_numbers(df, ["pri", "pos"], "rid").collect()
    order = [r["val"] for r in sorted(out, key=lambda r: r["rid"])]
    assert order == ["o1", "o5", "o9", "t0", "t2"]
    assert sorted(r["rid"] for r in out) == [0, 1, 2, 3, 4]


def test_dense_row_numbers_empty_input(spark):
    df = spark.createDataFrame([], "pos long, val string")
    assert dense_row_numbers(df, ["pos"], "rid").collect() == []


def test_dense_row_numbers_plan_has_no_single_partition(spark):
    df = spark.createDataFrame(
        [(i, i) for i in range(100)], "pos long, x long"
    ).repartition(4)
    out = dense_row_numbers(df, ["pos"], "rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, (
        f"renumber still funnels through one task\n{plan[:2000]}"
    )


def test_pop_plan_has_no_single_partition(spark, tmp_path):
    """The pop path renumbers via bucket windows — no Exchange
    SinglePartition anywhere in the resulting work plan (round-6
    verdict What's-wrong #3)."""
    from muller_spark import dataset as ds_mod

    ds = ds_mod.dataset(str(tmp_path / "p"), spark)
    ds.create_tensor("x", dtype="int64")
    ds.extend({"x": list(range(50))})
    ds.commit("seed")
    ds.pop([3, 7])
    plan = ds.df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan[:2000]
    # positional parity intact
    assert [r["x"] for r in ds.df.orderBy("_row_id").select("x").collect()] == [
        v for v in range(50) if v not in (3, 7)
    ]


def test_merge_plan_has_no_single_partition(spark, tmp_path):
    """Merged row-id assignment uses the partition-offset pattern too."""
    from muller_spark import dataset as ds_mod

    ds = ds_mod.dataset(str(tmp_path / "m"), spark)
    ds.create_tensor("x", dtype="int64")
    ds.extend({"x": [0, 1, 2]})
    ds.commit("base")
    ds.checkout("dev", create=True)
    ds.extend({"x": [10, 11]})
    ds.commit("dev appends")
    ds.checkout("main")
    ds.extend({"x": [20]})
    ds.commit("main appends")
    ds.merge("dev", append_resolution="both")
    plan = ds.df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan[:2000]
    assert [r["x"] for r in ds.df.orderBy("_row_id").select("x").collect()] == [
        0, 1, 2, 20, 10, 11
    ]


def test_tpch_q4_semi_join_shape(spark):
    """Q4's EXISTS compiles to ONE left-semi join on the order key with
    the lateness inequality folded into the join condition — no row
    multiplication, no distinct, no forced broadcast hint (lineitem is
    never broadcastable at scale)."""
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        import pytest as _pytest

        _pytest.skip("driver testdata absent")
    df = entry.queries()["q_tpch_q4_priority"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "LeftSemi" in final
    assert "HashAggregate" in final
    assert final.count("Exchange") - final.count("BroadcastExchange") <= 3


SF_DIR = "/root/testdata/sf0.01"
needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata absent"
)


@needs_testdata
def test_tpch_q13_outer_join_shape(spark):
    """Q13's histogram keeps order-less customers: the plan is a LEFT
    OUTER join (never rewritten to inner by the non-key predicate,
    which lives in the join condition, not a post-filter) and carries
    no forced hint — orders scales with SF."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tpch_q13_custdist"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "LeftOuter" in final


@needs_testdata
def test_tpch_q19_single_join_shape(spark):
    """Q19's OR-of-ANDs stays ONE equi-join on the factored part key —
    not a union of three scans: exactly one lineitem scan and one part
    scan in the final plan."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tpch_q19_disjunctive"](spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("lineitem.parquet") == 1, final[:2000]
    assert final.count("part.parquet") == 1, final[:2000]


@needs_testdata
def test_tpch_q22_anti_join_shape(spark):
    """Q22's NOT EXISTS compiles to a LEFT ANTI join; the only hint in
    the query is the 1-row scalar-average broadcast (bounded by
    construction — an aggregate over zero grouping keys)."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tpch_q22_global_sales"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1  # the scalar avg only
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "LeftAnti" in final


@needs_testdata
def test_tpch_q8_hints_bounded_dims_only(spark):
    """Q8 joins seven relations; forced hints appear only on the
    SF-invariant dimensions (region-filtered nation + nation = 2
    hints).  part/customer/supplier/orders are AQE-sized."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tpch_q8_market_share"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 3  # region, n_cust, n_supp
    df.collect()
    assert df.columns == ["o_year", "mkt_share"]


@needs_testdata
def test_tpch_q12_no_hints_one_scan(spark):
    """Q12 is one equi-join + conditional aggregate: no forced hints
    (orders scales with SF), a single lineitem scan."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tpch_q12_late_priority"](spark, SF_DIR)
    assert df._jdf.queryExecution().analyzed().toString().count("ResolvedHint") == 0
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("lineitem.parquet") == 1
    assert "HashAggregate" in final


@needs_testdata
def test_tpch_q21_single_scan_no_self_join(spark):
    """Q21's EXISTS/NOT EXISTS pair is rewritten to ONE per-order
    aggregate: the fact table is scanned once (the classic correlated
    formulation would scan it three times and self-join twice), there
    is no single-partition exchange, and the only hint is the 25-row
    nation dimension."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tpch_q21_waiting_supplier"](spark, SF_DIR)
    assert df._jdf.queryExecution().analyzed().toString().count("ResolvedHint") == 1
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("lineitem.parquet") == 1, final[:2000]
    assert final.count("SinglePartition") == 0


@needs_testdata
def test_tpch_q11_scalar_reuse(spark):
    """Q11 computes the per-part aggregate once and derives both the
    output rows and the scalar threshold from it: one lineitem scan;
    hints are the nation dimension (referenced in both branches) plus
    the 1-row threshold — all bounded by construction."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tpch_q11_important_supply"](spark, SF_DIR)
    assert df._jdf.queryExecution().analyzed().toString().count("ResolvedHint") == 3
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("lineitem.parquet") == 1, final[:2000]


@needs_testdata
def test_tpch_q2_part_filter_below_min(spark):
    """Q2's correlated MIN is a per-part aggregate joined back; the
    part filter prunes BELOW the aggregate (one lineitem scan), the
    ordered limit compiles to TakeOrdered (no global sort), and the
    only hints are region+nation (counted twice in the analyzed tree
    because the regional subtree feeds both the output rows and the
    per-part minimum)."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tpch_q2_min_cost_supplier"](spark, SF_DIR)
    assert df._jdf.queryExecution().analyzed().toString().count("ResolvedHint") == 4
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("lineitem.parquet") == 1, final[:2000]
    assert "TakeOrdered" in final


@needs_testdata
def test_tpch_q16_anti_join_no_hints(spark):
    """Q16's supplier blacklist is a LEFT ANTI join (never a collected
    NOT IN list) and nothing is force-broadcast — part and supplier
    both scale with SF."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tpch_q16_supplier_counts"](spark, SF_DIR)
    assert df._jdf.queryExecution().analyzed().toString().count("ResolvedHint") == 0
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "LeftAnti" in final


@needs_testdata
def test_tpch_q20_semi_join_single_scan(spark):
    """Q20's correlated availability aggregate rides a window over the
    same partkey partitioning the rollup shuffled on: one lineitem
    scan, a LEFT SEMI join for the EXISTS, no single-partition
    exchange, nation as the only hint."""
    import __spark_entry__ as entry

    df = entry.queries()["q_tpch_q20_dominant_supplier"](spark, SF_DIR)
    assert df._jdf.queryExecution().analyzed().toString().count("ResolvedHint") == 1
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("lineitem.parquet") == 1, final[:2000]
    assert "LeftSemi" in final
    assert final.count("SinglePartition") == 0


@needs_testdata
def test_hard_negatives_single_corpus_scan(spark):
    """The mining kernel scans the embeddings corpus ONCE for the
    partial top-k (plus one bounded anchor-collection scan at plan
    build); the final window ranks only partitions*k candidates."""
    import __spark_entry__ as entry

    df = entry.queries()["q_hard_negatives"](spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("embeddings.parquet") == 1, final[:2000]


@needs_testdata
def test_psi_drift_no_join_no_window_on_fact(spark):
    """Bucket assignment is map-only size(filter(...)) against the
    broadcast cut array: no sort-merge join, no Window over the event
    rows — the only aggregates are the percentile, the per-bucket
    counts, and the 1-row totals."""
    import __spark_entry__ as entry

    df = entry.queries()["q_psi_drift"](spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "SortMergeJoin" not in final
    assert "Window" not in final


@needs_testdata
def test_rolling_anomalies_one_window_pass(spark):
    """Mean and std share one frame: exactly one Window node, keyed by
    user — no self-join, no global sort above it."""
    import __spark_entry__ as entry

    df = entry.queries()["q_rolling_anomalies"](spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert final.count("Window") == 1, final[:2000]
    assert final.count("events.parquet") == 1
