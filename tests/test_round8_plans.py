"""Round-8 scale-shape assertions: the new operators' plans stay
bounded — top-k shapes plan as TakeOrderedAndProject (partition-local
top-k, no global sort of the aggregate), the BPE kernel reads the
corpus exactly once, kfold is exchange-free, and the LSH-verified pair
stage never contains the corpus-wide shingle self-join."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_zipf_top_selection_is_take_ordered(spark):
    from muller_spark.operators.text import zipf_report

    plan = _plan(zipf_report(_docs(spark), "text", k=10, n_fit=100))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # the rank window runs AFTER the limit — bounded by n_fit, so a
    # single-partition exchange there is over <=n_fit rows by
    # construction; what must NOT appear is a global Sort of the full
    # vocabulary aggregate (Sort ... global=true outside the fold)
    assert plan.count("Sort") <= plan.count("TakeOrderedAndProject") + 2


def test_bpe_top_pairs_single_corpus_scan(spark):
    from muller_spark.operators.text import bpe_top_pairs

    out = bpe_top_pairs(_docs(spark), "text", k=10)
    plan = _plan(out)
    assert plan.count("documents.parquet") == 1, (
        "BPE kernel re-scans the corpus\n" + plan[:2000]
    )
    assert "TakeOrderedAndProject" in plan


def test_kfold_assign_is_exchange_free(spark):
    from muller_spark.operators.sampling import kfold_assign

    out = kfold_assign(_docs(spark), F.col("doc_id"), 7).select(
        "doc_id", "fold"
    )
    plan = _plan(out)
    assert "Exchange" not in plan, plan[:2000]


def test_lsh_verified_pairs_no_corpus_shingle_self_join(spark):
    """The verify stage joins shingle ARRAYS onto candidate pairs —
    the plan must not contain the exploded shingle-equality self-join
    (the corpus-wide quadratic stage the composition exists to avoid).
    Structural check: ngram_jaccard_pairs joins two EXPLODED shingle
    streams (a Generate on each join input); lsh_verified_pairs has no
    Generate feeding a join at all on the exact side."""
    from muller_spark.operators.dedup import lsh_verified_pairs

    out = lsh_verified_pairs(
        _docs(spark), "text", "doc_id", threshold=0.5, bands=32
    )
    plan = _plan(out)
    # array_intersect present (per-pair exact verify) ...
    assert "array_intersect" in plan, plan[:2000]
    # ... and the shingle streams are never exploded: the only
    # Generate nodes allowed are the band posexplode (column 'band')
    for line in plan.splitlines():
        if "Generate" in line:
            assert "band" in line, f"unexpected explode:\n{line}"


def test_cluster_size_report_singleton_branch_is_scalar_aggregates(spark):
    from muller_spark.operators.dedup import (
        cluster_size_report, ngram_jaccard_pairs,
    )

    docs = _docs(spark)
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.5, max_shingle_freq=None
    )
    out = cluster_size_report(docs, "doc_id", pairs)
    plan = _plan(out)
    # the union's singleton branch is two 1-row aggregates cross-joined
    # — there must be no Window anywhere in the report
    assert "Window" not in plan, plan[:2000]


def test_contamination_severity_inherits_broadcast_shape(spark):
    from muller_spark.operators.dedup import contamination_severity

    docs = _docs(spark)
    train = docs.filter(F.col("source") != "src0")
    test = docs.filter(F.col("source") == "src0")
    out = contamination_severity(
        train, test, "text", "doc_id", n=3, broadcast_test=True
    )
    plan = _plan(out)
    # the window-keyed join broadcasts the held-out side: no
    # SortMergeJoin may appear on the contamination path
    assert "SortMergeJoin" not in plan, plan[:2000]
