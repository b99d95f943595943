"""Plan assertions for the round-5 fixes — VERDICT r4 item 1 enforced:
token-budget provisioning must never put a whole domain through one
window task.  The window's partition spec has to include the hash-range
bucket alongside the domain, and the per-(domain, bucket) offsets must
arrive via a broadcast join."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_token_budget_window_is_bucket_partitioned(spark):
    from muller_spark.operators.sampling import token_budget_sample

    docs = spark.read.parquet(DOCS)
    out = token_budget_sample(
        docs, "text", "lang", F.col("doc_id"),
        {"en": 5000, "zh": 1500, "de": 1000},
    )
    plan = _plan(out)
    # the cumulative window partitions by (domain, bucket) — a dominant
    # domain spreads over num_buckets tasks instead of one
    assert "__tb_bucket" in plan, plan
    win = [ln for ln in plan.splitlines() if "Window" in ln and "__tb_h" in ln]
    assert win and all("__tb_bucket" in ln for ln in win), plan
    # per-(domain, bucket) offsets join back as a broadcast, never a
    # shuffle of the corpus on the offset key
    assert "BroadcastHashJoin" in plan, plan


def test_bigram_logprob_has_no_sort_merge_join(spark):
    """EXPLAIN.md round-5 recapture, enforced: after the map-only pair
    extraction the bigram LM plan has zero SortMergeJoins — every
    remaining join is a broadcastable token-count lookup."""
    from muller_spark.operators.text import bigram_logprob

    docs = spark.read.parquet(DOCS)
    plan = _plan(bigram_logprob(docs, "text", "doc_id"))
    assert "SortMergeJoin" not in plan, plan


def test_token_budget_bucketed_matches_single_bucket(spark):
    """Bit-identical membership across bucket counts (integer sums are
    associative): 1 bucket — the degenerate single-task shape — and 16
    buckets must select the same rows."""
    from muller_spark.operators.sampling import token_budget_sample

    docs = spark.read.parquet(DOCS).limit(300)
    budgets = {"en": 3000, "zh": 900, "de": 700}
    one = token_budget_sample(
        docs, "text", "lang", F.col("doc_id"), budgets, num_buckets=1
    )
    many = token_budget_sample(
        docs, "text", "lang", F.col("doc_id"), budgets, num_buckets=16
    )
    ids_one = {r["doc_id"] for r in one.select("doc_id").collect()}
    ids_many = {r["doc_id"] for r in many.select("doc_id").collect()}
    assert ids_one == ids_many and ids_one
