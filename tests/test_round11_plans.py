"""Round-11 plan assertions: the new surfaces keep their scale-safe
physical shapes — the multi-probe fuzzy join never scans vocabulary ×
probes, the components-ledger report resolves remaps with ONE
broadcast hop, the ledger ingest's label lookup is bucket-pruned, and
the MG ledger fold moves only summary rows."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_fuzzy_multi_plan_no_cartesian(spark):
    """The probe table must reach the vocabulary through the deletion-
    KEY equi-join — a cartesian/NL join of vocab × probes would be the
    scan the module exists to avoid."""
    import __spark_entry__ as entry

    plan = _executed(entry.queries()["q_fuzzy_multi"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # probe keys broadcast


def test_components_ledger_report_single_broadcast_hop(spark, tmp_path):
    """Merge-on-read = labels ⟕ broadcast(remaps), one hop: the remap
    table is closed, so the plan must contain exactly one join and it
    must be a broadcast join (remaps are merge-bounded, never
    corpus-sized)."""
    from muller_spark.operators.components import (
        components_ledger_ingest,
        components_ledger_report,
        init_components_ledger,
    )

    path = os.path.join(str(tmp_path), "cl")
    init_components_ledger(
        spark.createDataFrame([(1, 0), (11, 10)], "src long, dst long"),
        path, buckets=4,
    )
    components_ledger_ingest(
        spark.createDataFrame([(1, 10)], "src long, dst long"), path
    )
    plan = _executed(components_ledger_report(spark, path))
    assert plan.count("Join") == plan.count("BroadcastHashJoin") \
        or "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_components_ledger_ingest_label_read_is_bucket_pruned(spark,
                                                              tmp_path):
    """The ingest's label lookup must touch only the delta's bucket
    partitions — the partition filter shows in the scan, and the
    ledger's other buckets' files are never listed into the plan."""
    from muller_spark.operators.components import (
        _bucket_expr,
        _read_labels,
        init_components_ledger,
    )

    path = os.path.join(str(tmp_path), "cl")
    init_components_ledger(
        spark.createDataFrame(
            [(i + 1, i) for i in range(0, 200, 2)], "src long, dst long"
        ),
        path, buckets=16,
    )
    from pyspark.sql import functions as F

    # one delta node → its bucket only
    probe = spark.createDataFrame([(7,)], "id long")
    hit = [r[0] for r in probe.select(
        _bucket_expr("id", 16).alias("b")).collect()]
    sub = _read_labels(spark, path).where(F.col("bucket").isin(hit))
    plan = _executed(sub)
    # the physical scan carries the partition filter (pruning proof)
    assert "PartitionFilters" in plan
    assert "PartitionFilters: []" not in plan


def test_mg_ledger_report_moves_summary_rows_only(spark, tmp_path):
    """The ledger fold's single exchange is keyed on the group — input
    is the summary log (≤ keys × ingests × (k+1) rows), never corpus
    rows; no extra shuffle appears above the applyInPandas merge."""
    from muller_spark.operators.heavyhitters import (
        init_mg_ledger,
        mg_ledger_report,
    )

    path = os.path.join(str(tmp_path), "mg")
    init_mg_ledger(
        spark.createDataFrame([("a", "x"), ("b", "y")], "g string, v string"),
        ["g"], "v", path, k=8,
    )
    plan = _executed(mg_ledger_report(spark, path))
    assert "FlatMapGroupsInPandas" in plan  # the bounded per-key merge
    assert "SortMergeJoin" not in plan      # err-bound join broadcasts
