"""Plan assertions for the round-4 operators — the EXPLAIN.md claims,
enforced: cascade survival is ONE exchange, the broadcast
decontamination path has no sort-merge join, top_ngrams explodes
exactly once, and SemDeDup assignment is shuffle-free."""

from __future__ import annotations

import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_survival_is_one_exchange(spark):
    from muller_spark.operators.quality import pipeline_survival

    docs = spark.read.parquet(DOCS)
    out = pipeline_survival(docs, [
        ("a", F.col("n_chars") >= 100),
        ("b", F.col("lang") == "en"),
        ("c", F.length("text") < 5000),
    ])
    plan = _plan(out)
    # N stages never means N scans: one scan, one exchange of the
    # single aggregated row (AQE may add a trivial post-shuffle read)
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange") <= 2, plan


def test_contamination_broadcast_has_no_sort_merge_join(spark):
    from muller_spark.operators.dedup import contamination_report

    docs = spark.read.parquet(DOCS)
    out = contamination_report(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "text", "doc_id", n=3, min_overlap=3, broadcast_test=True,
    )
    plan = _plan(out)
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_top_ngrams_single_generate(spark):
    from muller_spark.operators.text import top_ngrams

    docs = spark.read.parquet(DOCS)
    plan = _plan(top_ngrams(docs, "text", n=2, k=5))
    # one explode; the token array is projected before the lambda so
    # nothing re-tokenizes per element
    assert plan.count("Generate explode") == 1, plan


def test_semantic_assign_is_map_only(spark):
    from muller_spark.operators.dedup import assign_clusters

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = np.zeros((4, 64))
    plan = _plan(assign_clusters(emb, "embedding", "vec_id", cents))
    # Arrow-batched assignment: no shuffle anywhere in the plan
    # (ensure_parallelism may add a round-robin repartition only when
    # the input has fewer partitions than cores — that is an Exchange
    # but never a key shuffle)
    assert "hashpartitioning" not in plan, plan


def test_unigram_logprob_total_is_broadcast(spark):
    from muller_spark.operators.text import unigram_logprob

    docs = spark.read.parquet(DOCS)
    plan = _plan(unigram_logprob(docs, "text", "doc_id"))
    # the corpus total folds in via a broadcast 1-row aggregate, not a
    # window over the corpus
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "Window" not in plan, plan
