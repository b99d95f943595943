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
from pyspark.sql import functions as F  # noqa: E402
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
    "q_tpch_q3_shipping",
    "q_tpch_q5_local_supplier",
    "q_tpch_q10_returns",
    "q_tpch_q4_priority",
    "q_tpch_q6_forecast",
    "q_tpch_q14_promo",
    "q_tpch_q18_big_orders",
    "q_tpch_q8_market_share",
    "q_tpch_q9_product_profit",
    "q_tpch_q13_custdist",
    "q_tpch_q15_top_supplier",
    "q_tpch_q17_small_quantity",
    "q_tpch_q19_disjunctive",
    "q_tpch_q22_global_sales",
    "q_tpch_q7_volume",
    "q_tpch_q2_min_cost_supplier",
    "q_tpch_q11_important_supply",
    "q_tpch_q12_late_priority",
    "q_tpch_q16_supplier_counts",
    "q_tpch_q20_dominant_supplier",
    "q_tpch_q21_waiting_supplier",
    "q_hard_negatives",
    "q_psi_drift",
    "q_version_drift",
    "q_hll_distinct",
    "q_hll_by_group",
    "q_cms_topk",
    "q_rolling_anomalies",
    "q_bloom_decontaminate",
    "q_semantic_decontaminate",
    "q_skew_report",
    "q_shuffle_shards",
    "q_mixture_plan",
    "q_leakage_split",
    "q_pii_redact",
    "q_ks_drift",
    "q_ks_by_type",
    "q_pmi_pairs",
    "q_pack_bins",
    "q_mojibake_scan",
    "q_compression_ratio",
    "q_keep_best_lsh",
    "q_search_snippets",
    "q_ds_query_posting",
    "q_cluster_sizes",
    "q_contamination_severity",
    "q_kfold",
    "q_sample_per_group",
    "q_length_percentile",
    "q_winsorize",
    "q_ngram_novelty",
    "q_zipf",
    "q_bpe_pairs",
    "q_feature_hash",
    "q_remove_dup_windows",
    "q_quantize_embeddings",
    "q_containment_pairs",
    "q_containment_lsh",
    "q_containment_prefix",
    "q_perplexity_buckets",
    "q_curation_pipeline",
    "q_cdc_changelog",
    "q_rollup",
    "q_window_rank",
    "q_topk_orders",
    "q_dedup_exact",
    "q_token_stats",
    "q_sequence_pack",
    "q_chunk_documents",
    "q_event_transitions",
    "q_dedup_incremental",
    "q_neardup_ledger",
    "q_embedding_ledger",
    "q_agg_ledger",
    "q_mg_ledger",
    "q_components_ledger",
    "q_keep_best_ledger",
    "q_flow_keeplist",
    "q_flow_semantic",
    "q_fuzzy_multi",
    "q_fuzzy_d2",
    "q_typo_match",
    "q_connected_components",
    "q_quantile_sketch",
    "q_resample_linear",
    "q_heavy_hitters",
    "q_fuzzy_search",
    "q_hll_ledger",
    "q_quantile_ledger",
    "q_text_quality",
    "q_knn_cosine",
    "q_window_events",
    "q_json_extract",
    "q_dedup_normalized",
    "q_quality_score",
    "q_lang_id",
    "q_knn_l2",
    "q_knn_join",
    "q_minhash_pairs",
    "q_simhash",
    "q_embedding_near_dups",
    "q_sessionize",
    "q_count_distinct",
    "q_gopher_filter",
    "q_dup_passages",
    "q_decontamination",
    "q_funnel",
    "q_cohort_retention",
    "q_semantic_dedup",
    "q_top_ngrams",
    "q_pipeline_report",
    "q_corpus_report",
    "q_unigram_logprob",
    "q_quality_filtered",
    "q_asof_join",
    "q_range_join",
    "q_moving_avg",
    "q_histogram",
    "q_unique_violations",
    "q_source_overlap",
    "q_bigram_logprob",
    "q_text_normalize",
    "q_vocab_drift",
    "q_window_battery",
    "q_array_battery",
    "q_token_budget",
    # q_corr_matrix stays out of the wall-time set: ~90% of its time is
    # whole-stage-codegen COMPILE of the 15-decimal-agg plan (~0.2 s per
    # decimal aggregate per fresh plan, measured 1/5/10/15-agg sweep),
    # which the oracle gate pays once but a per-round benchmark would
    # misread as data-path cost.
]

# Deliberately-priced runs (round-11, VERDICT r10 #8): these two are
# intentional exact-demo / measurement-harness queries whose documented
# cost is the point (q_keep_best: corpus-wide exact pair stage priced
# against its LSH twin; q_lsh_tuning: parameter-sweep harness with
# cached ground truth).  They live in the priced envelope so the
# HEADLINE section stays a pure regression signal — their LSH-twin
# scale paths (q_keep_best_lsh, the banded pair queries) remain
# headline-watched.
PRICED = ["q_keep_best", "q_lsh_tuning"]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _median(xs: "list[float]") -> float:
    import statistics

    return statistics.median(xs)


def timed_protocol(fn, warm_reps: int = 3) -> "tuple[dict, object]":
    """Pinned warm-vs-cold measurement protocol (round-6): one recorded
    cold first run, then ``warm_reps`` repeats whose MEDIAN is the
    steady-state figure.  Round-over-round comparisons use
    ``warm_steady_s`` only — cold runs fold in JIT/codegen/footer-cache
    state that varies with whatever ran earlier in the session, which
    manufactured phantom regressions in rounds 3-5.  Returns the timing
    dict and the last run's return value (for recall checks etc.)."""
    start = time.perf_counter()
    rv = fn()
    cold = time.perf_counter() - start
    warms = []
    for _ in range(warm_reps):
        start = time.perf_counter()
        rv = fn()
        warms.append(time.perf_counter() - start)
    return (
        {"cold_s": round(cold, 4), "warm_steady_s": round(_median(warms), 4)},
        rv,
    )


def calibration_anchor(spark) -> dict:
    """Fixed synthetic calibration workload (round-11, VERDICT r10 #1):
    generated in-memory data → project → shuffle agg → window — zero
    parquet/IO dependence, zero Python-worker dependence, byte-stable
    plan.  Its ``warm_steady_s`` measures THE HOST+JVM of this bench
    session, so cross-round per-query ratios can be normalized by the
    anchor ratio: a slow host then reads as a slow host instead of as
    N simultaneous regressions (round 10's ~1.4× session inflation made
    67 plan-identical queries read as regressions and pushed q_rollup
    nominally over the 2× gate).  Runs under the same pinned
    cold/warm-median protocol as the headline queries, in the SAME JVM
    that produced the headline numbers."""
    from pyspark.sql import Window

    n = 8_000_000

    def work():
        df = spark.range(n, numPartitions=32).select(
            (F.col("id") % 9973).alias("k"),
            ((F.xxhash64("id") % 100000) / 100.0).alias("v"),
        )
        agg = df.groupBy("k").agg(
            F.sum("v").alias("s"),
            F.avg("v").alias("a"),
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        w = Window.partitionBy(F.col("k") % 64).orderBy(
            F.col("s").desc(), F.col("k").asc()
        )
        materialize(
            agg.select("k", "s", "a", "n",
                       F.row_number().over(w).alias("r"))
        )

    rec, _ = timed_protocol(work)
    rec["n_rows"] = n
    return rec


def _prior_bench_detail() -> "dict | None":
    """The committed BENCH_DETAIL.json as the re-measure prior (the
    working-tree copy at session start IS last round's committed
    record for a driver run; for a repeat builder run it is the
    previous run of this same session — either way an anchored
    same-code prior)."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(path) as fh:
            prior = json.load(fh)
        if prior.get("queries_protocol") and prior.get("calibration"):
            return prior
    except Exception:
        pass
    return None


# Re-measure pass tuning (round-12, VERDICT r11 #1; made SYMMETRIC in
# round 13 per VERDICT r12 #7): a query whose warm median deviates from
# its anchored committed prior (fallback when no prior row: its own
# same-session cold) by more than OUTLIER_FACTOR in EITHER direction
# (|log ratio| > log OUTLIER_FACTOR) is treated as a within-session
# burst/luck suspect and re-measured as a median of OUTLIER_REPS fresh
# warm runs.  The anchor normalizes SESSIONS (steady host speed); this
# normalizes ROWS in both directions — slow bursts (r11's
# q_neardup_ledger read 9.97 s on a host the anchor proved FAST) no
# longer get kept, and fast-luck rows no longer keep their luck
# (the r12 one-sided pass biased totals downward).  The raw first-sweep
# total is reported alongside as ``total_raw``.
OUTLIER_FACTOR = 1.5
OUTLIER_REPS = 5
OUTLIER_MAX_QUERIES = 12  # bound the pass; worst offenders first


def remeasure_outliers(spark, sf_dir: str, timings: dict, protocol: dict,
                       calibration: "dict | None", sf_val) -> None:
    """Mutates timings/protocol in place: burst-suspect queries get a
    fresh median-of-``OUTLIER_REPS`` warm measurement recorded under a
    ``remeasured`` flag (the first sweep's value is kept alongside)."""
    prior = _prior_bench_detail()
    prior_rows: dict = {}
    ratio = None
    if prior is not None and calibration and prior.get("sf") == sf_val:
        try:
            ratio = (
                float(calibration["warm_steady_s"])
                / float(prior["calibration"]["warm_steady_s"])
            )
            prior_rows = prior["queries_protocol"]
        except (KeyError, TypeError, ValueError, ZeroDivisionError):
            ratio = None
    suspects = []
    for name, warm in timings.items():
        if ratio is not None and name in prior_rows:
            base = float(prior_rows[name]["warm_steady_s"]) * ratio
            kind = "anchored_prior"
        else:
            base = float(protocol[name]["cold_s"])
            kind = "same_session_cold"
        # symmetric trigger (round 13): suspect when the row deviates
        # from its baseline by >OUTLIER_FACTOR in EITHER direction, so
        # fast luck is re-measured exactly like slow bursts; rank by
        # the magnitude of the deviation.
        if base > 0 and warm > 0 and (
            warm > OUTLIER_FACTOR * base or warm * OUTLIER_FACTOR < base
        ):
            dev = max(warm / base, base / warm)
            suspects.append((dev, name, base, kind))
    suspects.sort(reverse=True)
    all_queries = dict(entrymod.queries())
    for n in HEADLINE:
        if n not in all_queries and hasattr(entrymod, n):
            all_queries[n] = getattr(entrymod, n)
    for rank, (ratio_over, name, base, kind) in enumerate(suspects):
        if rank >= OUTLIER_MAX_QUERIES or name not in all_queries:
            protocol[name]["remeasure_skipped"] = True
            continue
        reps = []
        for _ in range(OUTLIER_REPS):
            start = time.perf_counter()
            materialize(all_queries[name](spark, sf_dir))
            reps.append(time.perf_counter() - start)
        _isolate_between_queries(spark)  # same isolation as the main sweep
        new_warm = round(_median(reps), 4)
        protocol[name]["remeasured"] = True
        protocol[name]["first_warm_steady_s"] = timings[name]
        protocol[name]["remeasure_baseline_s"] = round(base, 4)
        protocol[name]["remeasure_baseline_kind"] = kind
        protocol[name]["warm_steady_s"] = new_warm
        timings[name] = new_warm


def run_headline(spark, sf_dir: str) -> "tuple[dict, dict]":
    """The headline per-query section: returns (warm-steady timings,
    full protocol records)."""
    # Headline set = registered queries plus the approximate-path twins
    # (q_minhash_pairs, q_simhash, q_embedding_near_dups) that were
    # deregistered from the driver's oracle gate — their oracle-checked
    # portable twins carry correctness; the bench keeps their 100 TB
    # plans (banded LSH joins, bucketed re-rank) under wall-time watch.
    all_queries = dict(entrymod.queries())
    for n in HEADLINE:
        if n not in all_queries and hasattr(entrymod, n):
            all_queries[n] = getattr(entrymod, n)
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

    # Pinned protocol per query: {cold_s, warm_steady_s = median of 3}.
    # `queries` (the round-over-round comparison map) carries
    # warm_steady only; the full protocol record goes to
    # `queries_protocol` / BENCH_DETAIL.json.
    timings: dict[str, float] = {}
    protocol: dict[str, dict] = {}
    for name in names:
        rec, _ = timed_protocol(
            lambda q=all_queries[name]: materialize(q(spark, sf_dir))
        )
        protocol[name] = rec
        timings[name] = rec["warm_steady_s"]
        # Round-12 measurement fix (documented in OPTIMIZATION_r12.md):
        # several operators pin intermediates with .cache() inside
        # their own lineage (pair-kernel shingle sets, ks CDF frames).
        # Spark's CacheManager holds those entries for the SESSION, so
        # by query #100 the storage pool carries every prior query's
        # pins — evicting, GC-thrashing, and inflating later rows (the
        # in-session burst class VERDICT r11 flagged).  Dropping the
        # cache REGISTRY between queries isolates each query's
        # measurement without touching its own cold/warm semantics
        # (a query's warm reps still reuse the caches ITS lineage
        # builds — unchanged protocol within a query).
        _isolate_between_queries(spark)
    return timings, protocol


def _isolate_between_queries(spark) -> None:
    """Between-query isolation (round-12 measurement fixes, guide §1):
    drop the session cache registry AND release dead localCheckpoint
    blocks.  ``clearCache`` only covers CacheManager entries; the
    ledger/cluster operators' ``localCheckpoint`` blocks are freed by
    the ContextCleaner only after a JVM GC notices the RDD is
    unreachable, and Spark's own periodic GC defaults to 30 min —
    longer than the whole sweep — so without the explicit GC the
    storage pool monotonically accumulates every prior query's
    barriers (measured ~50 MB over 4 ledger queries at sf0.1,
    unbounded over the 137-query sweep).  Runs BETWEEN queries only:
    nothing a query's own cold/warm reps see is touched, so the
    per-query protocol is unchanged."""
    import gc

    spark.catalog.clearCache()
    gc.collect()  # release py4j handles so the JVM refs are dead
    try:
        # A System.gc() is a stop-the-world full collection — run it
        # only when dead blocks have actually piled up (>256 MB), so
        # the common between-query path stays pause-free.
        bm = spark.sparkContext._jvm.org.apache.spark.SparkEnv.get().blockManager()
        if bm.memoryStore().blocksMemoryUsed() > (256 << 20):
            spark.sparkContext._jvm.System.gc()  # let ContextCleaner fire
    except Exception:
        pass  # isolation is best-effort; never fail the bench


def _headline_subprocess(sf_dir: str) -> "dict | None":
    """Run the headline section in a FRESH JVM (round-7: the recorded
    headline inflated ~1.35x two rounds running from bench-session
    cross-pressure — heap/codegen state shared with the 1M-vector and
    sf1-envelope sections).  A child process gives the headline its own
    JVM; the heavyweight sections then run in this process's separate
    session.  Returns the child's payload, or None to fall back to
    in-process measurement (the bench must always produce its line)."""
    import subprocess
    import tempfile

    out_file = os.path.join(
        tempfile.mkdtemp(prefix="bench_headline_"), "headline.json"
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_SECTION"] = "headline"
    env["SPARK_GRAFT_SECTION_OUT"] = out_file
    # forward explicitly: the child must benchmark the CALLER's sf_dir,
    # not whatever the inherited env happens to hold
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, timeout=1800,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        if proc.returncode == 0 and os.path.exists(out_file):
            with open(out_file) as fh:
                return json.load(fh)
    except Exception:
        pass
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    if os.environ.get("SPARK_GRAFT_SECTION") == "headline":
        # child mode: measure the headline in this fresh JVM and exit
        spark = get_spark("muller_spark_bench_headline")
        spark.sparkContext.setLogLevel("ERROR")
        timings, protocol = run_headline(spark, sf_dir)
        # anchor measured AFTER the headline in the same JVM: fully
        # warm steady-state host speed, the normalization basis
        calibration = calibration_anchor(spark)
        # burst guard AFTER the anchor (needs it for the prior ratio)
        remeasure_outliers(spark, sf_dir, timings, protocol,
                           calibration, sf_val)
        payload = {
            "queries": timings,
            "queries_protocol": protocol,
            "calibration": calibration,
            "jvm": spark.sparkContext.applicationId,
        }
        with open(os.environ["SPARK_GRAFT_SECTION_OUT"], "w") as fh:
            json.dump(payload, fh)
        return

    headline = None
    if os.environ.get("SPARK_GRAFT_ISOLATE_HEADLINE", "1") != "0":
        headline = _headline_subprocess(sf_dir)

    spark = get_spark("muller_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    if headline is not None:
        timings = headline["queries"]
        protocol = headline["queries_protocol"]
        calibration = headline.get("calibration")
        headline_jvm = headline.get("jvm", "isolated-child")
    else:
        timings, protocol = run_headline(spark, sf_dir)
        calibration = calibration_anchor(spark)
        remeasure_outliers(spark, sf_dir, timings, protocol,
                           calibration, sf_val)
        headline_jvm = spark.sparkContext.applicationId

    total = round(sum(timings.values()), 4)
    # VERDICT r12 #7: the raw FIRST-SWEEP total rides alongside the
    # remeasured total, so the remeasure pass can never silently move
    # the headline — both numbers are in the parseable line.
    total_raw = round(sum(
        rec.get("first_warm_steady_s", timings[name])
        for name, rec in protocol.items() if name in timings
    ), 4)
    # Key order matters: the driver records only the LAST 2000 chars of
    # stdout, so the bulky sections (baseline sweeps, per-query map) go
    # FIRST and the headline scalars (sf/unit/value/metric) go LAST —
    # a front-truncated capture still shows the metric.  The line stays
    # one valid JSON object (key order is semantically irrelevant), and
    # the complete result is also written to BENCH_DETAIL.json.
    result: dict = {
        "protocol": "cold+warm_steady(median of 3); compare warm only; "
        "warm deviating >1.5x from anchored committed prior in EITHER "
        "direction re-measured median-of-5 "
        "(queries_protocol[q].remeasured); total_raw = first-sweep sum"
    }
    # round-11 bench discipline: EVERY session self-identifies — label
    # from SPARK_GRAFT_SESSION / --session-label when set (builder runs:
    # e.g. builder-r11), else a generated auto-<utc>-<pid> so driver
    # runs never land as "unlabeled" again (VERDICT r10 #2).
    # Round-over-round comparisons must pair records with like session
    # CLASSES and normalize by the calibration anchor below.
    label = os.environ.get("SPARK_GRAFT_SESSION")
    for i, a in enumerate(sys.argv):
        if a == "--session-label" and i + 1 < len(sys.argv):
            label = sys.argv[i + 1]
    if not label:
        label = "auto-{}-p{}".format(
            time.strftime("%Y%m%dT%H%M%SZ", time.gmtime()), os.getpid()
        )
    result["session"] = {
        "label": label,
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    # the host-speed anchor: cross-round per-query comparisons divide
    # by the anchor ratio (this_round.calibration.warm_steady_s /
    # that_round.calibration.warm_steady_s) before reading regressions
    result["calibration"] = calibration

    # deliberately-priced runs: one cold + one warm each, OUTSIDE the
    # headline regression signal (see PRICED above)
    all_q = dict(entrymod.queries())
    priced: dict = {}
    for name in PRICED:
        if name in all_q:
            rec, _ = timed_protocol(
                lambda q=all_q[name]: materialize(q(spark, sf_dir)),
                warm_reps=1,
            )
            priced[name] = {
                "cold_s": rec["cold_s"], "warm_s": rec["warm_steady_s"]
            }
    result["priced_envelope"] = priced
    result["jvm_sections"] = {
        "headline": headline_jvm,
        "heavyweight": spark.sparkContext.applicationId,
    }
    result["queries_protocol"] = protocol
    if sf_val == 0.1 and os.environ.get("SPARK_GRAFT_VECTOR_1M", "1") != "0":
        try:
            result["vector_1m960d"] = vector_bench(spark)
        except Exception as e:  # the headline JSON line must survive
            result["vector_1m960d"] = {"error": repr(e)[:300]}
    if sf_val == 0.1 and os.environ.get("SPARK_GRAFT_FIG3D", "1") != "0":
        try:
            result["projection_fig3d"] = projection_bench(spark)
        except Exception as e:
            result["projection_fig3d"] = {"error": repr(e)[:300]}
    if sf_val == 0.1 and os.environ.get("SPARK_GRAFT_TABLE2", "1") != "0":
        try:
            result["version_control_table2"] = vc_bench(spark)
        except Exception as e:
            result["version_control_table2"] = {"error": repr(e)[:300]}
    if sf_val == 0.1 and os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        result["sf1_equivalent"] = sf1_envelope(spark, sf_dir)
    if sf_val == 0.1 and os.environ.get("SPARK_GRAFT_TEXT_SF1", "1") != "0":
        result["text_sf1_equivalent"] = text_sf1_envelope(spark, sf_dir)
    if sf_val == 0.1 and os.environ.get("SPARK_GRAFT_SF1_SCALING", "1") != "0":
        try:
            result["sf1_scaling"] = sf1_scaling(
                spark, sf_dir, headline_timings=timings
            )
        except Exception as e:
            result["sf1_scaling"] = {"error": repr(e)[:300]}
    if sf_val == 0.1 and os.environ.get("SPARK_GRAFT_MEDIA", "1") != "0":
        try:
            result["media_envelope"] = media_envelope(spark)
        except Exception as e:
            result["media_envelope"] = {"error": repr(e)[:300]}
    result["queries"] = timings
    result["total_raw"] = total_raw
    result["sf"] = sf_val
    result["unit"] = "sec"
    result["value"] = total
    result["metric"] = "headline_queries_total"
    try:
        detail = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_DETAIL.json")
        with open(detail, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # the printed line is the contract; the file is a courtesy
    print(json.dumps(result))
    # The driver parses the FINAL stdout line as the bench contract
    # line; round 12's final line carried only the total, which left
    # PERF_r12.per_query empty (VERDICT r12 "What's wrong #1").  The
    # final line now carries the full per-query map (additions-only vs
    # r12: same names, same protocol).  Key order: the bulky queries
    # map FIRST and the headline scalars LAST, so a capture that keeps
    # only the tail of stdout still ends with the metric/value pair.
    print(json.dumps({
        "queries": timings,
        "session": label,
        "calibration_warm_s": (
            calibration.get("warm_steady_s") if calibration else None
        ),
        "n_queries": len(timings),
        "total_raw": total_raw,
        "sf": sf_val,
        "unit": "sec",
        "value": total,
        "metric": "headline_queries_total",
    }))


def media_envelope(spark, cache_root: "str | None" = None) -> dict:
    """Round-9 media near-dup scale rows: 20k synthetic 32×32 PNGs
    (groups of 4 share a base image, members add per-pixel noise) and
    3k six-frame animated GIFs (groups of 3: full / trimmed / noisy
    cut).  Fixtures cache as parquet under ``cache_root`` (one-time
    encode cost, markers like the 1M-vector corpus), so per-round runs
    measure the PIPELINES: the map-only fingerprint scans must scale
    with the corpus, and the pigeonhole pair joins must stay
    bucket-bounded (never all-pairs)."""
    import numpy as np
    from pyspark.sql import functions as F

    from muller_spark.operators.dedup import (
        audio_fingerprint, audio_near_dups,
        image_dhash, image_near_dups, video_frame_hashes, video_near_dups,
    )

    root = cache_root or os.environ.get(
        "SPARK_GRAFT_MEDIA_CACHE", "/tmp/muller_spark_media_bench"
    )
    png_path = os.path.join(root, "png20k")
    gif_path = os.path.join(root, "gif3k")
    avi_path = os.path.join(root, "avi2k")
    mp4_path = os.path.join(root, "mp42k")
    mkv_path = os.path.join(root, "mkv2k")
    wav_path = os.path.join(root, "wav10k")
    m_png = os.path.join(root, "_PNG20K")
    m_gif = os.path.join(root, "_GIF3K")
    m_avi = os.path.join(root, "_AVI2K")
    m_mp4 = os.path.join(root, "_MP42K")
    m_mkv = os.path.join(root, "_MKV2K")
    m_wav = os.path.join(root, "_WAV10K")

    def gen_pngs():
        def gen(iterator):
            import pandas as pd

            from muller_spark.multimodal.codecs import encode_png

            for pdf in iterator:
                ids, blobs = [], []
                for i in pdf["id"]:
                    i = int(i)
                    rng = np.random.RandomState(10_000 + i // 4)
                    base = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
                    img = base.copy()
                    if i % 4:
                        rng2 = np.random.RandomState(17 + i)
                        mask = rng2.rand(32, 32) < 0.02 * (i % 4)
                        img[mask] = rng2.randint(
                            0, 256, (int(mask.sum()), 3), dtype=np.uint8
                        )
                    ids.append(i)
                    blobs.append(bytearray(encode_png(img)))
                yield pd.DataFrame({"img_id": ids, "data": blobs})

        (
            spark.range(20_000, numPartitions=32)
            .mapInPandas(gen, "img_id long, data binary")
            .write.mode("overwrite").parquet(png_path)
        )

    def gen_gifs():
        def gen(iterator):
            import pandas as pd

            from muller_spark.multimodal.gif import encode_gif_frames

            for pdf in iterator:
                ids, blobs = [], []
                for i in pdf["id"]:
                    i = int(i)
                    rng = np.random.RandomState(20_000 + i // 3)
                    pal = rng.randint(0, 256, (24, 3), dtype=np.uint8)
                    pool = [
                        pal[np.random.RandomState(7_000 * (i // 3) + f)
                            .randint(0, 24, (16, 16))]
                        for f in range(6)
                    ]
                    member = i % 3
                    if member == 0:
                        frames = pool
                    elif member == 1:
                        frames = pool[1:5]
                    else:
                        rng2 = np.random.RandomState(3 + i)
                        frames = []
                        for fr in pool[1:5]:
                            g = fr.copy()
                            mask = rng2.rand(16, 16) < 0.02
                            g[mask] = pal[rng2.randint(0, 24, int(mask.sum()))]
                            frames.append(g)
                    ids.append(i)
                    blobs.append(bytearray(encode_gif_frames(frames)))
                yield pd.DataFrame({"clip_id": ids, "data": blobs})

        (
            spark.range(3_000, numPartitions=32)
            .mapInPandas(gen, "clip_id long, data binary")
            .write.mode("overwrite").parquet(gif_path)
        )

    def gen_avis():
        """2k MJPEG-AVI clips in the GIF family's group-of-3 shape
        (full / trim / noisy-trim) — the round-10 second container;
        pure-python JPEG encode is the slow part, one-time cached."""
        def gen(iterator):
            import pandas as pd

            from muller_spark.multimodal.avi import encode_avi_mjpeg

            for pdf in iterator:
                ids, blobs = [], []
                for i in pdf["id"]:
                    i = int(i)
                    rng = np.random.RandomState(40_000 + i // 3)
                    pal = rng.randint(0, 256, (24, 3), dtype=np.uint8)
                    pool = [
                        pal[np.random.RandomState(9_000 * (i // 3) + f)
                            .randint(0, 24, (16, 16))]
                        for f in range(6)
                    ]
                    member = i % 3
                    if member == 0:
                        frames = pool
                    elif member == 1:
                        frames = pool[1:5]
                    else:
                        rng2 = np.random.RandomState(5 + i)
                        frames = []
                        for fr in pool[1:5]:
                            g = fr.copy()
                            mask = rng2.rand(16, 16) < 0.02
                            g[mask] = pal[rng2.randint(0, 24, int(mask.sum()))]
                            frames.append(g)
                    ids.append(i)
                    blobs.append(bytearray(
                        encode_avi_mjpeg(frames, quality=95)
                    ))
                yield pd.DataFrame({"clip_id": ids, "data": blobs})

        (
            spark.range(2_000, numPartitions=32)
            .mapInPandas(gen, "clip_id long, data binary")
            .write.mode("overwrite").parquet(avi_path)
        )

    def gen_mp4s():
        """2k MJPEG-MP4 clips, the round-11 third container, in the
        AVI family's group-of-3 shape (full / trim / noisy-trim) so
        the near-dup contract is identical across containers."""
        def gen(iterator):
            import pandas as pd

            from muller_spark.multimodal.mp4 import encode_mp4_mjpeg

            for pdf in iterator:
                ids, blobs = [], []
                for i in pdf["id"]:
                    i = int(i)
                    rng = np.random.RandomState(50_000 + i // 3)
                    pal = rng.randint(0, 256, (24, 3), dtype=np.uint8)
                    pool = [
                        pal[np.random.RandomState(11_000 * (i // 3) + f)
                            .randint(0, 24, (16, 16))]
                        for f in range(6)
                    ]
                    member = i % 3
                    if member == 0:
                        frames = pool
                    elif member == 1:
                        frames = pool[1:5]
                    else:
                        rng2 = np.random.RandomState(5 + i)
                        frames = []
                        for fr in pool[1:5]:
                            g = fr.copy()
                            mask = rng2.rand(16, 16) < 0.02
                            g[mask] = pal[rng2.randint(0, 24, int(mask.sum()))]
                            frames.append(g)
                    ids.append(i)
                    blobs.append(bytearray(
                        encode_mp4_mjpeg(frames, quality=95)
                    ))
                yield pd.DataFrame({"clip_id": ids, "data": blobs})

        (
            spark.range(2_000, numPartitions=32)
            .mapInPandas(gen, "clip_id long, data binary")
            .write.mode("overwrite").parquet(mp4_path)
        )

    def gen_mkvs():
        """2k MJPEG-Matroska clips (round-11 fourth container), same
        group-of-3 near-dup construction as the AVI/MP4 twins."""
        def gen(iterator):
            import pandas as pd

            from muller_spark.multimodal.mkv import encode_mkv_mjpeg

            for pdf in iterator:
                ids, blobs = [], []
                for i in pdf["id"]:
                    i = int(i)
                    rng = np.random.RandomState(60_000 + i // 3)
                    pal = rng.randint(0, 256, (24, 3), dtype=np.uint8)
                    pool = [
                        pal[np.random.RandomState(13_000 * (i // 3) + f)
                            .randint(0, 24, (16, 16))]
                        for f in range(6)
                    ]
                    member = i % 3
                    if member == 0:
                        frames = pool
                    elif member == 1:
                        frames = pool[1:5]
                    else:
                        rng2 = np.random.RandomState(5 + i)
                        frames = []
                        for fr in pool[1:5]:
                            g = fr.copy()
                            mask = rng2.rand(16, 16) < 0.02
                            g[mask] = pal[rng2.randint(0, 24, int(mask.sum()))]
                            frames.append(g)
                    ids.append(i)
                    blobs.append(bytearray(
                        encode_mkv_mjpeg(frames, quality=95)
                    ))
                yield pd.DataFrame({"clip_id": ids, "data": blobs})

        (
            spark.range(2_000, numPartitions=32)
            .mapInPandas(gen, "clip_id long, data binary")
            .write.mode("overwrite").parquet(mkv_path)
        )

    def gen_wavs():
        """10k one-second PCM WAV clips in groups of 4: each group is
        a distinct 8-note random melody (time-VARYING band energies —
        a stationary tone starves the Haitsma–Kalker gradient bits of
        entropy and the whole corpus collides), and members differ by
        GAIN only (0.9/0.45/0.225/0.1125) — the invariance the
        fingerprint guarantees, so designed pairs are exact while
        cross-group fingerprints stay far (measured: intra Hamming ≤1,
        inter ≤6 on 0.06% of group pairs at 64 bits)."""
        def gen(iterator):
            import io
            import wave

            import pandas as pd

            for pdf in iterator:
                ids, blobs = [], []
                for i in pdf["id"]:
                    i = int(i)
                    rng = np.random.RandomState(30_000 + i // 4)
                    notes = 200 + 40 * rng.randint(1, 40, size=8)
                    t = np.arange(8192) / 8000.0
                    freq = notes[np.arange(8192) // 1024]
                    sig = (0.5 * np.sin(2 * np.pi * freq * t)
                           + 0.2 * np.sin(2 * np.pi * 2 * freq * t))
                    gain = (0.9, 0.45, 0.225, 0.1125)[i % 4]
                    pcm = (np.clip(gain * sig, -1, 1) * 32767).astype("<i2")
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wf:
                        wf.setnchannels(1)
                        wf.setsampwidth(2)
                        wf.setframerate(8000)
                        wf.writeframes(pcm.tobytes())
                    ids.append(i)
                    blobs.append(bytearray(buf.getvalue()))
                yield pd.DataFrame({"clip_id": ids, "data": blobs})

        (
            spark.range(10_000, numPartitions=32)
            .mapInPandas(gen, "clip_id long, data binary")
            .write.mode("overwrite").parquet(wav_path)
        )

    out: dict = {}
    for marker, label, fn in ((m_png, "png_generate_s", gen_pngs),
                              (m_gif, "gif_generate_s", gen_gifs),
                              (m_avi, "avi_generate_s", gen_avis),
                              (m_mp4, "mp4_generate_s", gen_mp4s),
                              (m_mkv, "mkv_generate_s", gen_mkvs),
                              (m_wav, "wav_generate_s", gen_wavs)):
        if os.path.exists(marker):
            out[label] = 0.0
            continue
        start = time.perf_counter()
        fn()
        out[label] = round(time.perf_counter() - start, 2)
        os.makedirs(root, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("ok")

    pngs = spark.read.parquet(png_path)
    gifs = spark.read.parquet(gif_path)

    def timed2(fn):
        rec, _ = timed_protocol(fn, warm_reps=1)
        return {"cold_s": rec["cold_s"], "warm_s": rec["warm_steady_s"]}

    out["image_dhash_20k"] = timed2(lambda: materialize(
        image_dhash(pngs, "data", "img_id")
    ))
    out["image_near_dups_20k"] = timed2(lambda: materialize(
        image_near_dups(pngs, "data", "img_id", max_hamming=6)
    ))
    out["video_frame_hashes_3k"] = timed2(lambda: materialize(
        video_frame_hashes(gifs, "data", "clip_id")
    ))
    out["video_near_dups_3k"] = timed2(lambda: materialize(
        video_near_dups(gifs, "data", "clip_id", max_hamming=6,
                        min_match_fraction=0.8)
    ))
    avis = spark.read.parquet(avi_path)
    mp4s = spark.read.parquet(mp4_path)
    wavs = spark.read.parquet(wav_path)
    out["video_frame_hashes_avi_2k"] = timed2(lambda: materialize(
        video_frame_hashes(avis, "data", "clip_id")
    ))
    out["video_near_dups_avi_2k"] = timed2(lambda: materialize(
        video_near_dups(avis, "data", "clip_id", max_hamming=6,
                        min_match_fraction=0.8)
    ))
    out["video_frame_hashes_mp4_2k"] = timed2(lambda: materialize(
        video_frame_hashes(mp4s, "data", "clip_id")
    ))
    out["video_near_dups_mp4_2k"] = timed2(lambda: materialize(
        video_near_dups(mp4s, "data", "clip_id", max_hamming=6,
                        min_match_fraction=0.8)
    ))
    mkvs = spark.read.parquet(mkv_path)
    out["video_frame_hashes_mkv_2k"] = timed2(lambda: materialize(
        video_frame_hashes(mkvs, "data", "clip_id")
    ))
    out["video_near_dups_mkv_2k"] = timed2(lambda: materialize(
        video_near_dups(mkvs, "data", "clip_id", max_hamming=6,
                        min_match_fraction=0.8)
    ))
    # window=1024 fills all 8 gradient windows of the 64-bit print
    # (8192 samples / 1024); the default 2048 leaves half the bits
    # unused on one-second clips and the corpus collides
    out["audio_fingerprint_10k"] = timed2(lambda: materialize(
        audio_fingerprint(wavs, "data", "clip_id", window=1024)
    ))
    out["audio_near_dups_10k"] = timed2(lambda: materialize(
        audio_near_dups(wavs, "data", "clip_id", max_hamming=6,
                        window=1024)
    ))
    out["image_pairs"] = int(
        image_near_dups(pngs, "data", "img_id", max_hamming=6).count()
    )
    out["video_pairs"] = int(
        video_near_dups(gifs, "data", "clip_id", max_hamming=6,
                        min_match_fraction=0.8).count()
    )
    out["video_pairs_avi"] = int(
        video_near_dups(avis, "data", "clip_id", max_hamming=6,
                        min_match_fraction=0.8).count()
    )
    out["video_pairs_mp4"] = int(
        video_near_dups(mp4s, "data", "clip_id", max_hamming=6,
                        min_match_fraction=0.8).count()
    )
    out["video_pairs_mkv"] = int(
        video_near_dups(mkvs, "data", "clip_id", max_hamming=6,
                        min_match_fraction=0.8).count()
    )
    out["audio_pairs"] = int(
        audio_near_dups(wavs, "data", "clip_id", max_hamming=6,
                        window=1024).count()
    )
    return out


def vector_bench(
    spark,
    n: int = 1_000_000,
    d: int = 960,
    n_centers: int = 1024,
    n_queries: int = 10,
    k: int = 10,
    nlist: int = 1000,
    num_subspaces: int = 96,
    cache_root: "str | None" = None,
) -> dict:
    """ANN at the reference's published config (BASELINE.md Fig 3b:
    1M × 960-d float32, l2, nlist=1000, m=96 —
    /root/reference/exp_scripts/vector_filter.py:14-100): recall@10 +
    latency for IVF-FLAT and IVFPQ against the exact-scan baseline.

    The corpus is a deterministic 1024-center Gaussian mixture (the
    GIST-1M role: real embeddings cluster; uniform random in 960-d has
    no neighbor structure for recall to measure).  Vectors + index
    artifacts cache under ``cache_root`` keyed by config, so repeat
    runs pay only search time; ``build_s`` fields are 0 when cached.
    Searches run against store_vectors artifacts — the inverted-list
    layout — so a probe reads ~nprobe/nlist of the corpus and never
    shuffle-joins it."""
    import numpy as np

    from muller_spark.index.vector import (
        build_ivf_artifacts,
        build_ivfpq_artifacts,
        exact_knn,
        ivf_search_prebuilt,
        ivfpq_search,
        load_ivf_centroids,
        load_pq_codebooks,
    )

    root = cache_root or os.environ.get(
        "SPARK_GRAFT_VECTOR_CACHE", "/tmp/muller_spark_vec_bench"
    )
    base = os.path.join(root, f"v{n}x{d}c{n_centers}l{nlist}m{num_subspaces}")
    vec_path = os.path.join(base, "vectors")
    ivf_path = os.path.join(base, "ivf")
    pq_path = os.path.join(base, "pq")
    # per-artifact markers: layout changes (file-per-cell, residual PQ)
    # invalidate the index builds without regenerating the corpus
    m_vec = os.path.join(base, "_VECS")
    m_ivf = os.path.join(base, "_IVF2")
    m_pq = os.path.join(base, "_PQ2")
    legacy = os.path.join(base, "_BUILT")
    if os.path.exists(legacy) and not os.path.exists(m_vec):
        os.rename(legacy, m_vec)  # corpus is layout-stable; indexes are not

    centers = np.random.RandomState(7).standard_normal((n_centers, d)).astype(
        np.float32
    )
    out: dict = {"n": n, "d": d, "cached": all(
        os.path.exists(m) for m in (m_vec, m_ivf, m_pq)
    )}

    def built(marker, label, fn):
        if os.path.exists(marker):
            out[label] = 0.0
            return
        start = time.perf_counter()
        fn()
        out[label] = round(time.perf_counter() - start, 2)
        with open(marker, "w") as fh:
            fh.write("ok")

    def gen_corpus():
        bc = spark.sparkContext.broadcast(centers)
        dd, nc = d, n_centers

        def gen(iterator):
            import pandas as pd

            for pdf in iterator:
                ids = pdf["id"].to_numpy()
                rng = np.random.RandomState(1000003 + int(ids[0]) % (2**31))
                noise = rng.standard_normal((len(ids), dd)).astype(np.float32)
                mat = bc.value[ids % nc] + noise * np.float32(0.35)
                yield pd.DataFrame({"id": ids, "vec": list(mat)})

        (
            spark.range(n, numPartitions=64)
            .mapInPandas(gen, "id long, vec array<float>")
            .write.mode("overwrite")
            .parquet(vec_path)
        )

    built(m_vec, "generate_s", gen_corpus)
    corpus0 = spark.read.parquet(vec_path)
    built(m_ivf, "ivf_build_s", lambda: build_ivf_artifacts(
        corpus0, "vec", "id", ivf_path,
        num_centroids=nlist, sample_size=min(65536, n), store_vectors=True,
    ))
    built(m_pq, "pq_build_s", lambda: build_ivfpq_artifacts(
        corpus0, "vec", "id", pq_path,
        num_centroids=nlist, num_subspaces=num_subspaces,
        sample_size=min(16384, n), store_vectors=True,
        centroids=load_ivf_centroids(spark, ivf_path),
    ))

    corpus = spark.read.parquet(vec_path)
    qrng = np.random.RandomState(99)
    queries = (
        centers[:n_queries]
        + qrng.standard_normal((n_queries, d)).astype(np.float32) * 0.35
    )

    def result_sets(rows):
        sets: dict = {}
        for r in rows:
            sets.setdefault(r["query_id"], set()).add(r["id"])
        return sets

    exact_rec, exact_rows = timed_protocol(
        lambda: exact_knn(corpus, "vec", "id", queries, k=k).collect()
    )
    truth = result_sets(exact_rows)
    out["exact_scan_s"] = exact_rec["warm_steady_s"]
    out["exact_scan"] = exact_rec

    def recall(rows):
        sets = result_sets(rows)
        return round(
            sum(len(truth[qi] & sets.get(qi, set())) / k for qi in truth)
            / len(truth), 4,
        )

    # a resident index (the vector_search serving regime) keeps the
    # coarse quantizer + codebooks loaded; per-query work should not
    # re-read them
    ivf_cents = load_ivf_centroids(spark, ivf_path)
    pq_cents = load_ivf_centroids(spark, pq_path)
    pq_books = load_pq_codebooks(spark, pq_path)
    assign_df = spark.read.parquet(os.path.join(ivf_path, "assign"))
    codes_df = spark.read.parquet(os.path.join(pq_path, "codes"))

    for nprobe in (16, 64):
        rec, rows = timed_protocol(
            lambda np_=nprobe: ivf_search_prebuilt(
                corpus, "vec", "id", ivf_path, queries, k=k, nprobe=np_,
                centroids=ivf_cents, assign_df=assign_df,
            ).collect()
        )
        out[f"ivf_nprobe{nprobe}"] = {
            "search_s": rec["warm_steady_s"], "cold_s": rec["cold_s"],
            "recall_at10": recall(rows),
        }

    # refine=64: ADC over 96 subspaces ranks same-cell neighbors with
    # error comparable to their true separation on this corpus, so the
    # shortlist must be deep; exactly re-ranking 64·k of 1M vectors
    # (0.064% of the corpus) costs nothing and lifts recall 0.37→0.96
    rec, rows = timed_protocol(
        lambda: ivfpq_search(
            corpus, "vec", "id", pq_path, queries, k=k, nprobe=64, refine=64,
            centroids=pq_cents, codebooks=pq_books, codes_df=codes_df,
        ).collect()
    )
    out["ivfpq_nprobe64"] = {
        "search_s": rec["warm_steady_s"], "cold_s": rec["cold_s"],
        "recall_at10": recall(rows),
    }
    return out


def sf1_envelope(spark, sf_dir: str) -> dict:
    """Measured sf1-equivalent envelope: lineitem replicated 10× in-plan
    (~60 M rows ≈ sf1, the tests/test_scale_smoke.py technique), five
    headline shapes under the pinned cold/warm protocol.  Documents that
    the plans hold at 10× the bench SF with no spill — the
    linear-extrapolation basis EXPLAIN.md's 100 TB claims rest on."""
    from pyspark.sql import functions as F

    from muller_spark.operators.topk import topk_per_group

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    reps = spark.range(10).withColumnRenamed("id", "_rep")
    big = (
        li.crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey", F.col("l_orderkey") * 10 + F.col("_rep"))
        .drop("_rep")
    )
    # orders replicated on the SAME key transform so the q5_multi_join
    # shape joins sf1-equivalent fact tables with matching cardinality
    big_orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey", F.col("o_orderkey") * 10 + F.col("_rep"))
        .drop("_rep")
        .select("o_orderkey", "o_custkey")
    )
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_nationkey"
    )
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )

    def timed(fn):
        rec, _ = timed_protocol(fn)
        return rec

    shapes = {
        "full_count": timed(lambda: big.count()),
        "group_agg": timed(lambda: materialize(
            big.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity").alias("s1"),
                F.avg("l_extendedprice").alias("s2"),
                F.min("l_shipdate").alias("s3"),
                F.count(F.lit(1)).alias("n"),
            )
        )),
        "filter_fold": timed(lambda: big.filter(
            (F.col("l_quantity") > 10) & (F.col("l_discount") < 0.05)
        ).count()),
        # Despite 6 groups this plan never sorts a whole group in one
        # task: Spark 4's rank-limit pushdown keeps a map-side Partial
        # WindowGroupLimit before the shuffle (~tasks*6*3 shuffled
        # rows); measured 3x faster than the hand-salted two-phase
        # rewrite at this size — see operators/topk.py.
        "window_rank_top3": timed(lambda: materialize(
            topk_per_group(
                big,
                ["l_returnflag", "l_linestatus"],
                [F.col("l_extendedprice").desc(),
                 F.col("l_orderkey").asc(), F.col("l_linenumber").asc()],
                k=3,
            )
        )),
        # TPC-H Q5-shaped multi-join at sf1: both fact tables replicated
        # on matching keys, all dimension sides broadcast — extends the
        # envelope's evidence from scan/agg/window shapes to the join
        # pipeline (round-6; plan asserted SMJ-free at sf0.01 in
        # tests/test_round6_plans.py)
        "q5_multi_join": timed(lambda: materialize(
            big.join(
                big_orders, big.l_orderkey == big_orders.o_orderkey
            )
            .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
            .join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,4)")
                ).alias("revenue"),
                F.count(F.lit(1)).alias("n"),
            )
        )),
        # unhex: shuffle 32-byte binary digests, not 64-char hex strings
        # — measured 11.1 s -> 9.0 s warm at this size, same guarantee
        "exact_dedup": timed(lambda: materialize(
            big.select(
                F.unhex(F.sha2(
                    F.concat_ws("|", "l_orderkey", "l_partkey", "l_linenumber"), 256
                )).alias("h")
            ).distinct()
        )),
    }
    shapes["rows"] = int(big.count())
    return shapes




def sf1_scaling(spark, sf_dir: str, headline_timings: "dict | None" = None) -> dict:
    """Round-12 (VERDICT r11 #2): scaling-exponent envelope — the FULL
    TPC-H suite plus the LSH dedup family, each run at the bench SF and
    at a materialized 10× sf1-equivalent, recorded as ``t_sf1/t_sf0.1``
    per query with a ``super_linear`` flag (ratio > 12 for 10× data).
    The 2× correctness gate is certified at sf0.1; this section is the
    measured basis for the 100× design claims.

    The sf1-equivalent table set is REAL parquet (written once to a
    temp dir, removed at exit): lineitem and orders replicated 10× on a
    consistent ``orderkey*10+rep`` transform (referential integrity
    preserved: custkey/partkey/suppkey untouched), documents replicated
    10× on ``doc_id*10+rep``, dimensions copied — so the registered
    query functions run UNMODIFIED on both dirs and the ratio compares
    identical plans at two scales.

    Honest-annotation notes (no silent caps):
    - pair-stage dedup queries are measured but annotated
      ``pair_set_inflated_by_replication`` and exempt from the flag:
      replicating a doc 10× makes every replica-pair a TRUE near-dup,
      inflating the pair SET ~100× by construction (a data-distribution
      change, not a plan regression — EXPLAIN.md round-8/9 notes);
    - ``q_containment_prefix`` (the AllPairs completeness theorem,
      priced vs its LSH twin at sf0.1) is skipped here and logged: its
      corpus-wide exact pair stage was measured once at 10× (round 8:
      178 s vs 15.5 s) and re-measuring it per round buys no plan
      information.
    """
    import atexit
    import shutil
    import tempfile

    started = time.perf_counter()
    # wall-clock budget so the per-round driver bench cannot balloon:
    # measured rows stay, unmeasured names are RECORDED as skipped
    # (no silent caps) — builder-r12's full sweep took ~20 min, so the
    # default budget keeps the driver's run to the most useful prefix
    budget_s = float(os.environ.get("SPARK_GRAFT_SF1_SCALING_BUDGET_S",
                                    "900"))
    root = tempfile.mkdtemp(prefix="bench_sf1dir_")
    atexit.register(shutil.rmtree, root, True)
    sf1_dir = os.path.join(root, "sf1")
    os.makedirs(sf1_dir)
    reps = spark.range(10).withColumnRenamed("id", "_rep")

    def _rep_write(table: str, key: str) -> None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
        (
            df.crossJoin(F.broadcast(reps))
            .withColumn(key, F.col(key) * 10 + F.col("_rep"))
            .drop("_rep")
            .write.mode("overwrite")
            .parquet(os.path.join(sf1_dir, f"{table}.parquet"))
        )

    _rep_write("lineitem", "l_orderkey")
    _rep_write("orders", "o_orderkey")
    _rep_write("documents", "doc_id")
    for t in ("region", "nation", "customer", "supplier", "part",
              "events", "embeddings"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(sf1_dir, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        elif os.path.exists(src):
            shutil.copy(src, dst)

    all_q = dict(entrymod.queries())
    tpch = sorted(n for n in all_q if n.startswith("q_tpch_"))
    pair_family = [
        n for n in ("q_containment_lsh", "q_keep_best_lsh")
        if n in all_q
    ]
    if hasattr(entrymod, "q_minhash_pairs"):
        all_q["q_minhash_pairs"] = entrymod.q_minhash_pairs
        pair_family.insert(0, "q_minhash_pairs")

    def one_warm(fn) -> float:
        rec, _ = timed_protocol(fn, warm_reps=1)
        return rec["warm_steady_s"]

    out: dict = {
        "protocol": "cold+1 warm per (query, scale); ratio = warm_sf1/"
                    "warm_sf0.1; super_linear flag at ratio > 12 for "
                    "10x data",
        "skipped": {
            "q_containment_prefix": "AllPairs exact pair stage measured "
            "once at 10x (round 8: 178 s, 11.5x) — not re-run per round",
        },
        "queries": {},
    }
    out["build_s"] = round(time.perf_counter() - started, 1)
    names = tpch + pair_family
    for i, name in enumerate(names):
        if time.perf_counter() - started > budget_s:
            out["budget_exhausted_skipped"] = names[i:]
            break
        q = all_q[name]
        if headline_timings and name in headline_timings:
            # sf0.1 warm already measured this run (headline protocol,
            # median of 3) — reuse instead of re-running
            t_small = float(headline_timings[name])
            small_src = "headline"
        else:
            t_small = one_warm(lambda q=q: materialize(q(spark, sf_dir)))
            small_src = "measured"
        t_big = one_warm(lambda q=q: materialize(q(spark, sf1_dir)))
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        row = {
            "sf0.1_warm_s": round(t_small, 4),
            "sf0.1_source": small_src,
            "sf1_warm_s": round(t_big, 4),
            "ratio": ratio,
        }
        if name in pair_family:
            row["pair_set_inflated_by_replication"] = True
        elif ratio is not None and ratio > 12:
            row["super_linear"] = True
        out["queries"][name] = row
    flagged = [n for n, r in out["queries"].items() if r.get("super_linear")]
    out["super_linear_queries"] = flagged
    out["elapsed_s"] = round(time.perf_counter() - started, 1)
    return out


def text_sf1_envelope(spark, sf_dir: str) -> dict:
    """Text-pipeline 10× envelope: documents replicated 10× in-plan
    (~50k docs at the sf0.1 bench dir), three shuffle-bearing shapes —
    the Gopher gate (explode → id-keyed aggregates), the token-budget
    prefix sum (bucketed two-phase), and CCNet normalization + entropy
    (map-only control).  One cold + one warm run each ({cold_s,
    warm_s}): the section's purpose is "plans hold at 10× with no
    spill", not round-over-round precision — the headline set carries
    that."""
    from pyspark.sql import functions as F

    from muller_spark.operators.quality import gopher_filter
    from muller_spark.operators.sampling import token_budget_sample

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = spark.range(10).withColumnRenamed("id", "_rep")
    big = (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") * 10 + F.col("_rep"))
        .drop("_rep")
    )

    def timed2(fn):
        rec, _ = timed_protocol(fn, warm_reps=1)
        return {"cold_s": rec["cold_s"], "warm_s": rec["warm_steady_s"]}

    out = {
        "gopher_10x": timed2(lambda: materialize(
            gopher_filter(big, "text", "doc_id")
        )),
        "token_budget_10x": timed2(lambda: materialize(
            token_budget_sample(
                big, "text", "lang", F.col("doc_id"),
                {"en": 200_000, "zh": 60_000, "de": 40_000},
            )
        )),
        # normalize+entropy at 10x was measured once (18.5 s warm, linear
        # in CPU as a map-only kernel must be — EXPLAIN.md) and then
        # dropped from the per-round run: the headline q_text_normalize
        # tracks the kernel, and the 2x18 s bought no plan information.
    }
    # bloom decontamination at 10x: the prefilter's value proposition
    # IS scale — the bitmap build cost is held-out-set-bounded and the
    # exact-join traffic candidate-bounded, so 10x train docs should
    # cost ~linear map time, not 10x join traffic
    from muller_spark.operators.dedup import bloom_decontaminate

    train10 = big.filter(F.col("source") != "src0")
    test1 = docs.filter(F.col("source") == "src0")
    out["bloom_decontaminate_10x"] = timed2(lambda: materialize(
        bloom_decontaminate(
            train10, test1, "text", "doc_id", n=5, min_overlap=1
        )
    ))

    # round 8: the drift/split/keep family at 10x.  All three near-dup
    # consumers run the 100 TB pair stage (lsh_verified_pairs: banded
    # LSH candidates -> exact verify on the candidate sliver) — the
    # corpus-wide exact pair stage was measured ONCE at this scale for
    # evidence (178 s vs 15.5 s, 11.5x; EXPLAIN.md round-8) and is NOT
    # re-run per round.
    from muller_spark.operators.dedup import (
        canonical_keep_best, lsh_verified_pairs,
    )
    from muller_spark.operators.sampling import leakage_safe_split

    out["ks_drift_10x"] = timed2(lambda: materialize(_ks10(spark, sf_dir)))
    out["leakage_split_lsh_10x"] = timed2(lambda: materialize(
        leakage_safe_split(
            big, "text", "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
            pairs=lsh_verified_pairs(
                big, "text", "doc_id", threshold=0.5, bands=32
            ),
        )
    ))
    scored10 = big.withColumn("score", (F.col("doc_id") % 97).cast("double"))
    out["keep_best_lsh_10x"] = timed2(lambda: materialize(
        canonical_keep_best(
            scored10,
            lsh_verified_pairs(big, "text", "doc_id", threshold=0.5, bands=32),
            "doc_id", "score",
        )
    ))

    # round 9: the round-8 heavy family at 10x.  Census shapes (shingle
    # novelty, window census+rewrite) are linear in shingle volume and
    # must stay ~flat; the two pair-consuming shapes ride the LSH pair
    # stage and inherit keep_best_lsh's documented superlinearity —
    # replication turns every doc into a 10-clone cluster, inflating
    # the TRUE pair set ~100x (per-pair cost flat).  remove_dup_windows
    # scales min_docs with the replication factor (8 original docs ->
    # 80 replicas) so the hot-window set keeps its 1x meaning instead
    # of marking EVERY window hot.
    from muller_spark.operators.dedup import cluster_size_report, ngram_novelty
    from muller_spark.operators.text import remove_duplicated_windows

    out["ngram_novelty_10x"] = timed2(lambda: materialize(
        ngram_novelty(big, "text", "doc_id", n=3)
    ))
    out["remove_dup_windows_10x"] = timed2(lambda: materialize(
        remove_duplicated_windows(big, "text", "doc_id", n=3, min_docs=80)
    ))
    out["cluster_sizes_lsh_10x"] = timed2(lambda: materialize(
        cluster_size_report(
            big, "doc_id",
            lsh_verified_pairs(big, "text", "doc_id", threshold=0.5, bands=32),
        )
    ))
    # containment's corpus-wide shingle self-join grows with df^2 under
    # duplication (measured once: 31.3 s at 10x vs 2.4 s at 1x); the
    # scale path is the round-9 metric="containment" verify on the LSH
    # candidate sliver — that is what ships here.
    out["containment_lsh_10x"] = timed2(lambda: materialize(
        lsh_verified_pairs(
            big, "text", "doc_id", n=3, threshold=0.6, bands=32,
            metric="containment",
        )
    ))

    # round 9: the incremental near-dup ledger's BATCH DECISION at 10x
    # — the 100 TB daily-ingest claim is "batch cost, never corpus
    # re-LSH", so the measured unit is one 10x batch against a 10x
    # ledger (seeded once outside the timer; the seed is a one-time
    # migration cost, the decision is the recurring one)
    import tempfile as _tf

    from muller_spark.operators.dedup import (
        init_neardup_ledger, neardup_against_ledger,
    )

    nd_path = os.path.join(_tf.mkdtemp(prefix="bench_ndledger_"), "ledger")
    init_neardup_ledger(
        big.filter(F.col("doc_id") % 2 == 0), "text", "doc_id", nd_path,
        bands=32,
    )
    out["neardup_ledger_batch_10x"] = timed2(lambda: materialize(
        neardup_against_ledger(
            big.filter(F.col("doc_id") % 2 == 1), "text", "doc_id",
            nd_path, threshold=0.5, update=False,
        )
    ))
    # connected components at 10x: the replicated corpus has 10x the
    # chain count at the SAME diameter-250 per chain (replication adds
    # breadth, not depth), so the star algorithm's round count — the
    # cost driver — must stay flat (~9 = log2(250)+1) while per-round
    # data grows 10x; a diameter-bound algorithm (min-label) would need
    # 250 rounds here regardless of width
    from pyspark.sql import Window as _W

    from muller_spark.operators.components import connected_components

    _w = _W.partitionBy("source", (F.col("doc_id") % 10)).orderBy("doc_id")
    _ranked = big.select(
        "doc_id", "source", F.row_number().over(_w).alias("rk"),
        (F.col("doc_id") % 10).alias("_lane"),
    )
    _edges = (
        _ranked.alias("a")
        .join(
            _ranked.alias("b"),
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a._lane") == F.col("b._lane"))
            & (F.col("b.rk") == F.col("a.rk") + 1),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    out["connected_components_10x"] = timed2(lambda: materialize(
        connected_components(_edges)
    ))

    # round 11: the incremental components LEDGER's delta decision at
    # 1x and 10x — the 100 TB claim is "cluster maintenance costs
    # O(affected), never a full-edge-set re-run", so the measured unit
    # is one fixed-size delta batch (500 new nodes linked into existing
    # chains) against a 1x-seeded and a 10x-seeded ledger: the pair of
    # rows must read ~flat.  Seeds are one-time costs outside the
    # timers; each timed call ingests FRESH delta ids so the
    # semilattice doesn't absorb the work being measured.
    from muller_spark.operators.components import (
        components_ledger_ingest, init_components_ledger,
    )

    _w1 = _W.partitionBy("source", (F.col("doc_id") % 10)).orderBy("doc_id")
    _ranked_1x = docs.select(
        "doc_id", "source", F.row_number().over(_w1).alias("rk"),
        (F.col("doc_id") % 10).alias("_lane"),
    )
    _edges_1x = (
        _ranked_1x.alias("a")
        .join(
            _ranked_1x.alias("b"),
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a._lane") == F.col("b._lane"))
            & (F.col("b.rk") == F.col("a.rk") + 1),
        )
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    cl_root = _tf.mkdtemp(prefix="bench_clledger_")
    paths = {}
    for label, e in (("1x", _edges_1x), ("10x", _edges)):
        p = os.path.join(cl_root, label)
        init_components_ledger(e, p)
        paths[label] = p
    seen_docs = [
        r[0] for r in docs.select("doc_id").limit(2000).collect()
    ]
    delta_gen = {"n": 0}

    def _ingest_delta(label):
        # fresh src ids per call; dst ids exist in the target ledger
        # (originals for 1x, their _rep=0 replicas for 10x) so every
        # delta edge exercises the lookup + merge path
        delta_gen["n"] += 1
        base = 10_000_000_000 * delta_gen["n"]
        mul = 1 if label == "1x" else 10
        delta = spark.createDataFrame(
            [(base + i, int(d) * mul) for i, d in enumerate(seen_docs)],
            "src long, dst long",
        )
        components_ledger_ingest(delta, paths[label])

    out["components_ledger_delta_1x"] = timed2(
        lambda: _ingest_delta("1x")
    )
    out["components_ledger_delta_10x"] = timed2(
        lambda: _ingest_delta("10x")
    )

    # round 12 (second session): the EMBEDDING ledger's batch decision
    # at 1x and 10x corpus.  Honest cost model, distinct from the
    # components rows above: the SRP posting table is corpus-sized and
    # scanned once per batch (narrow 3-column parquet — the O(batch)
    # claim is about COMPUTE: candidate-bounded verify, no batch x
    # corpus distance matrix), so the 10x row may carry scan growth but
    # must never approach 10x verify growth (first measure: 8.4 s ->
    # 16.7 s warm at 12 tables, i.e. 2.0x at 10x; the envelope runs 6
    # tables to halve its budget — the RATIO is the claim, and it is
    # family-independent).  The fixed batch clones 2000 seeded vectors
    # under fresh ids, so every row exercises the full candidate ->
    # exact-cosine-verify -> reject path identically against both
    # ledgers (the 10x corpus CONTAINS the 1x ids' vectors; replicas
    # add mass under disjoint ids).
    from muller_spark.operators.dedup import (
        embedding_against_ledger, init_embedding_ledger,
    )

    emb_1x = entrymod._synthetic_embeddings(docs.select("doc_id"))
    emb_10x = entrymod._synthetic_embeddings(
        docs.crossJoin(F.broadcast(reps))
        .select(
            F.when(F.col("_rep") == 0, F.col("doc_id"))
            .otherwise(F.col("_rep") * 1_000_000_000 + F.col("doc_id"))
            .alias("doc_id")
        )
    )
    emb_root = _tf.mkdtemp(prefix="bench_embledger_")
    emb_paths = {}
    for label, e in (("1x", emb_1x), ("10x", emb_10x)):
        p = os.path.join(emb_root, label)
        init_embedding_ledger(
            e, "vec", "doc_id", p, num_planes=6, num_tables=6, dim=64
        )
        emb_paths[label] = p
    emb_batch = (
        emb_1x.filter(F.col("doc_id") < 2000)
        .select((F.col("doc_id") + 5_000_000_000).alias("doc_id"), "vec")
        .localCheckpoint()
    )

    def _emb_delta(label):
        materialize(embedding_against_ledger(
            emb_batch, "vec", "doc_id", emb_paths[label],
            threshold=0.9, update=False,
        ))

    out["embedding_ledger_delta_1x"] = timed2(lambda: _emb_delta("1x"))
    out["embedding_ledger_delta_10x"] = timed2(lambda: _emb_delta("10x"))
    out["rows"] = int(big.count())
    return out


def _ks10(spark, sf_dir: str):
    """Events replicated 10x in-plan, KS drift early-vs-late January —
    the bucket-prefix-sum shape's cost is bounded by DISTINCT values,
    so 10x rows should cost ~map time."""
    from pyspark.sql import functions as F

    from muller_spark.operators.quality import ks_drift

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    reps = spark.range(10).withColumnRenamed("id", "_rep")
    bigev = (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") * 10 + F.col("_rep"))
        .drop("_rep")
    )
    cut = F.lit("2024-01-15").cast("timestamp")
    return ks_drift(
        bigev.filter(F.col("ts") < cut),
        bigev.filter(F.col("ts") >= cut),
        "value",
    )


def projection_bench(
    spark,
    n_rows: int = 20_000,
    widths: "tuple[int, ...]" = (100, 1000, 5000),
    n_read: int = 10,
    cache_root: "str | None" = None,
) -> dict:
    """BASELINE Fig 3d: read 10 of N float64 columns as N grows
    (reference: exp_scripts/projection.py:53-80, N up to 20000 x 80000
    rows).  Measures what the reference's chunk-per-column layout is
    designed around: projection cost should track the 10 read columns,
    not N — for parquet that means footer parse + column pruning are
    the only width-dependent costs.  Wide tables cache under
    ``cache_root``; widths capped at 5000 to keep the one-off generate
    inside the bench budget."""
    import numpy as np

    root = cache_root or os.environ.get(
        "SPARK_GRAFT_VECTOR_CACHE", "/tmp/muller_spark_vec_bench"
    )
    out: dict = {"n_rows": n_rows, "n_read": n_read}
    for width in widths:
        path = os.path.join(root, f"proj_w{width}_r{n_rows}")
        marker = os.path.join(path, "_BUILT")
        if not os.path.exists(marker):
            cols = [f"c{i}" for i in range(width)]

            def gen(iterator, width=width, cols=cols):
                import pandas as pd

                for pdf in iterator:
                    ids = pdf["id"].to_numpy()
                    rng = np.random.RandomState(17 + int(ids[0]) % 65521)
                    mat = rng.standard_normal((len(ids), width))
                    frame = pd.DataFrame(
                        dict(zip(cols, mat.T)), copy=False
                    )
                    yield frame

            schema = ", ".join(f"{c} double" for c in cols)
            start = time.perf_counter()
            (
                spark.range(n_rows, numPartitions=8)
                .mapInPandas(gen, schema)
                .write.mode("overwrite").parquet(path)
            )
            gen_s = round(time.perf_counter() - start, 2)
            with open(marker, "w") as fh:
                fh.write("ok")
        else:
            gen_s = 0.0
        # fixed projection (the reference fixes its N=1000 projection):
        # first n_read columns, aggregated so the scan materializes
        sel = [f"c{i}" for i in range(n_read)]
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            spark.read.parquet(path).select(
                *[F.sum(c) for c in sel]
            ).collect()
            best = min(best, time.perf_counter() - start)
        out[f"w{width}"] = {"read10_s": round(best, 3), "generate_s": gen_s}
    return out


def vc_bench(spark, n_rows: int = 10_000, n_commits: int = 5) -> dict:
    """BASELINE Table 2: version-control op wall times (reference:
    exp_scripts/version_control.py:12-90 — commit/checkout/merge over a
    benchmark dataset).  Measures commit (snapshot manifest write),
    branch checkout, historical checkout, a row-level 3-way merge, and
    log traversal on a dataset of ``n_rows`` x ``n_commits`` appends."""
    import shutil
    import tempfile

    from muller_spark import dataset as ds_mod

    root = tempfile.mkdtemp(prefix="muller_vc_bench_")
    out: dict = {"n_rows_per_commit": n_rows, "n_commits": n_commits}
    try:
        ds = ds_mod.dataset(os.path.join(root, "ds"), spark)
        ds.create_tensor("x", dtype="int64")
        ds.create_tensor("t", htype="text")
        payload = {
            "x": list(range(n_rows)),
            "t": [f"row {i}" for i in range(n_rows)],
        }
        start = time.perf_counter()
        for c in range(n_commits):
            ds.extend(payload)
            ds.commit(f"append {c}")
        out["commit_avg_s"] = round((time.perf_counter() - start) / n_commits, 3)

        first = ds.log_history()[-1].commit_id
        start = time.perf_counter()
        ds.checkout("dev", create=True)
        out["branch_create_s"] = round(time.perf_counter() - start, 3)

        ds.extend(payload)
        ds.commit("dev work")
        start = time.perf_counter()
        ds.checkout("main")
        out["checkout_branch_s"] = round(time.perf_counter() - start, 3)

        start = time.perf_counter()
        ds.checkout(first)
        out["checkout_history_s"] = round(time.perf_counter() - start, 3)
        ds.checkout("main")

        start = time.perf_counter()
        ds.merge("dev")
        out["merge_s"] = round(time.perf_counter() - start, 3)

        start = time.perf_counter()
        out["log_entries"] = len(ds.log_history())
        out["log_s"] = round(time.perf_counter() - start, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
