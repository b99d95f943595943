"""Round-13 optimization-round regression tests (VERDICT r12 'Next
round' items): bench contract + symmetric remeasure."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ------------------------------------- 1. symmetric remeasure (VERDICT #7)

def test_bench_remeasure_fast_luck_row(spark, monkeypatch):
    """A row measuring FAST vs its anchored prior (below base/1.5) is
    now a suspect too — fast luck is re-measured exactly like slow
    bursts, so the one-sided downward bias of the r12 pass is gone."""
    import bench

    sf_dir = "/root/testdata/sf0.001"
    name = "q_agg_count_star"
    timings = {name: 0.05}  # fabricated lucky reading vs prior 0.2
    protocol = {name: {"cold_s": 1.0, "warm_steady_s": 0.05}}
    prior = {
        "sf": 0.001,
        "calibration": {"warm_steady_s": 0.5},
        "queries_protocol": {name: {"warm_steady_s": 0.2}},
    }
    monkeypatch.setattr(bench, "_prior_bench_detail", lambda: prior)
    bench.remeasure_outliers(
        spark, sf_dir, timings, protocol, {"warm_steady_s": 0.5}, 0.001
    )
    rec = protocol[name]
    assert rec["remeasured"] is True
    assert rec["first_warm_steady_s"] == 0.05
    assert rec["remeasure_baseline_kind"] == "anchored_prior"
    assert timings[name] == rec["warm_steady_s"] > 0.05  # real re-run


def test_bench_remeasure_within_band_untouched(monkeypatch):
    """Rows within the 1.5x band in BOTH directions stay untouched (no
    Spark work scheduled for them at all)."""
    import bench

    name = "q_agg_count_star"
    prior = {
        "sf": 0.001,
        "calibration": {"warm_steady_s": 0.5},
        "queries_protocol": {name: {"warm_steady_s": 0.2}},
    }
    monkeypatch.setattr(bench, "_prior_bench_detail", lambda: prior)
    for warm in (0.15, 0.2, 0.29):  # 0.75x .. 1.45x of base
        timings = {name: warm}
        protocol = {name: {"cold_s": 1.0, "warm_steady_s": warm}}
        bench.remeasure_outliers(
            None, "/root/testdata/sf0.001", timings, protocol,
            {"warm_steady_s": 0.5}, 0.001,
        )
        assert "remeasured" not in protocol[name]
        assert timings[name] == warm


# ------------------------------------- 2. driver-side xxh64 shard routing

def test_xxh64_matches_spark_bit_for_bit(spark):
    """The pure-Python xxh64 twin must agree with F.xxhash64 on a
    hostile vocabulary — shard routing may only live on the driver
    because the two implementations are bit-identical."""
    from pyspark.sql import functions as F

    from muller_spark.xxh64 import shard_of, xxhash64

    vocab = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "stream", "streem", "hash", "x" * 31, "y" * 32, "z" * 33,
        "w" * 100, "嗨你好世界", "naïve café", "a\x00b", "\x00",
        "tab\tsep", "line\nbreak", "🚀🔥", "mixed漢字and latin",
        "0123456789" * 13,
    ]
    df = spark.createDataFrame([(v,) for v in vocab], ["term"])
    got = {
        r["term"]: (r["h"], r["s"])
        for r in df.select(
            "term",
            F.xxhash64("term").alias("h"),
            F.pmod(F.xxhash64("term"), F.lit(16)).alias("s"),
        ).collect()
    }
    for v in vocab:
        assert got[v][0] == xxhash64(v.encode("utf-8")), repr(v)
        assert got[v][1] == shard_of(v, 16), repr(v)


def test_lookup_terms_shard_pruning_unchanged(spark, tmp_path):
    """Index lookups must return identical rows after the shard math
    moved driver-side (same shards read, same terms matched)."""
    from muller_spark.index.inverted import InvertedIndex

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta delta"), (3, "gamma epsilon"),
         (4, "zeta alpha"), (5, "beta beta gamma")],
        ["id", "text"],
    )
    idx = InvertedIndex.build(
        docs, "text", str(tmp_path / "idx"), id_col="id", num_shards=4,
    )
    hits = idx._lookup_terms(["beta", "gamma", "missing"]).collect()
    got = sorted((r["term"], r["id"]) for r in hits)
    assert got == [
        ("beta", 1), ("beta", 2), ("beta", 5),
        ("gamma", 1), ("gamma", 3), ("gamma", 5),
    ]
    exact = sorted(r["id"] for r in idx.search("alpha", "exact_match").collect())
    assert exact == [1, 4]


# ------------------------------------- 3. SRP degenerate-bucket guard

def test_srp_hot_bucket_guard(spark):
    """With max_bucket_size set, a degenerate SRP bucket (here: many
    IDENTICAL vectors — every table's bucket is corpus-sized) is
    excluded from candidate generation; default None keeps the exact
    candidate set."""
    import numpy as np

    from muller_spark.operators.dedup import embedding_near_dups

    rng = np.random.RandomState(7)
    hot = [float(x) for x in rng.randn(16)]
    rows = [(i, hot) for i in range(50)]           # degenerate cluster
    a = [float(x) for x in rng.randn(16)]
    rows += [(100, a), (101, [x * 1.001 for x in a])]  # one true pair
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    unguarded = embedding_near_dups(
        df, "embedding", "vec_id", threshold=0.98,
        num_planes=4, num_tables=8,
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in unguarded}
    assert (100, 101) in found
    assert sum(1 for p in found if p[0] < 50 and p[1] < 50) == 50 * 49 // 2

    guarded = embedding_near_dups(
        df, "embedding", "vec_id", threshold=0.98,
        num_planes=4, num_tables=8, max_bucket_size=10,
    ).collect()
    gfound = {(r["id_a"], r["id_b"]) for r in guarded}
    # the quadratic cluster is gone; the small-bucket true pair stays
    assert (100, 101) in gfound
    assert not any(p[0] < 50 and p[1] < 50 for p in gfound)


# ------------------------------------- 4. final-line contract (VERDICT #2)

def test_bench_final_line_source_carries_queries_and_total_raw():
    """The driver parses the FINAL stdout line; it must carry the
    per-query map, total_raw, and the headline scalars with the
    scalars LAST (tail-truncation-robust key order).  Asserted against
    the print-site source so the check needs no bench run."""
    src = open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")
    ).read()
    final = src.rsplit("print(json.dumps({", 1)[1]
    for key in ('"queries"', '"total_raw"', '"value"', '"metric"',
                '"sf"', '"unit"', '"n_queries"'):
        assert key in final, f"final bench line lost {key}"
    # scalars after the bulky map: metric must come last
    assert final.index('"queries"') < final.index('"total_raw"') \
        < final.index('"value"') < final.index('"metric"')
