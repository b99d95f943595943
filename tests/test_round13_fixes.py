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


# ------------------------------------- 2. final-line contract (VERDICT #2)

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
