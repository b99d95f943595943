"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall times.

Each query is materialized with the no-op sink so timings measure the
full distributed pipeline (scan → shuffle → agg) without driver collect
overhead skewing results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from muller_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_random_access",
    "q_full_scan",
    "q_projection",
    "q1_pricing_summary",
    "q_filter_fold",
    "q_contains_fuzzy",
    "q_like_regex",
    "q_agg_sum",
    "q_agg_count_star",
    "q_join_revenue",
    "q_join_multiway",
    "q_rollup",
    "q_window_rank",
    "q_topk_orders",
    "q_dedup_exact",
    "q_token_stats",
    "q_text_quality",
    "q_knn_cosine",
    "q_window_events",
    "q_json_extract",
    "q_dedup_normalized",
    "q_quality_score",
    "q_lang_id",
    "q_knn_l2",
    "q_minhash_pairs",
    "q_simhash",
    "q_sessionize",
    "q_count_distinct",
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    spark = get_spark("muller_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    all_queries = entrymod.queries()
    names = [n for n in HEADLINE if n in all_queries]

    # Warm the JVM + parquet footer caches with the cheapest query once,
    # and the Arrow/Python-worker pool with a no-op mapInPandas so the
    # first pandas-kernel query isn't charged worker-fork latency.
    materialize(all_queries["q_agg_count_star"](spark, sf_dir))
    materialize(
        spark.range(spark.sparkContext.defaultParallelism * 2)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(lambda it: it, "id long")
    )

    # Two timed iterations per query, report the min: local[N] JIT/GC
    # noise swings single runs 2-3x; the min is the reproducible figure.
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            materialize(all_queries[name](spark, sf_dir))
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
