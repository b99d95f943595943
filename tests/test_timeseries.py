"""Unit tests for operators/timeseries.resample — hand-checkable
grids, gap marking, and fill policies."""

from __future__ import annotations

import os
import sys
from datetime import datetime, timezone

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.timeseries import resample  # noqa: E402


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 0, minute, tzinfo=timezone.utc)


def test_resample_fills_gaps_forward(spark):
    # key "a": events in minutes 0 and 3 of the hour grid at 60 s —
    # buckets 1 and 2 are gaps carrying minute-0's value forward
    rows = [("a", _ts(0), 10.0), ("a", _ts(0), 20.0), ("a", _ts(3), 7.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = sorted(
        resample(df, "k", "ts", "value", interval=60).collect(),
        key=lambda r: r["bucket"],
    )
    base = int(_ts(0).timestamp())
    assert [(r["bucket"] - base, r["value"], r["was_gap"]) for r in out] == [
        (0, 15.0, False),    # avg(10, 20)
        (60, 15.0, True),    # gap, forward-filled
        (120, 15.0, True),   # gap, forward-filled
        (180, 7.0, False),
    ]


def test_resample_no_fill_leaves_nulls(spark):
    rows = [("a", _ts(0), 1.0), ("a", _ts(2), 3.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = sorted(
        resample(df, "k", "ts", "value", interval=60, fill=None).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["value"] for r in out] == [1.0, None, 3.0]
    assert [r["was_gap"] for r in out] == [False, True, False]


def test_resample_keys_span_only_their_own_range(spark):
    rows = [("a", _ts(0), 1.0), ("a", _ts(5), 2.0), ("b", _ts(30), 9.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = resample(df, "k", "ts", "value", interval=60).collect()
    by_key: dict[str, int] = {}
    for r in out:
        by_key[r["k"]] = by_key.get(r["k"], 0) + 1
    assert by_key == {"a": 6, "b": 1}  # b's single bucket, no global span


def test_resample_agg_choices_and_validation(spark):
    rows = [("a", _ts(0), 1.0), ("a", _ts(0), 5.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    assert resample(df, "k", "ts", "value", 60, agg="max").collect()[0][
        "value"
    ] == 5.0
    assert resample(df, "k", "ts", "value", 60, agg="sum").collect()[0][
        "value"
    ] == 6.0
    with pytest.raises(ValueError, match="agg must be"):
        resample(df, "k", "ts", "value", 60, agg="median")
    with pytest.raises(ValueError, match="fill must be"):
        resample(df, "k", "ts", "value", 60, fill="bfill")
    with pytest.raises(ValueError, match="positive"):
        resample(df, "k", "ts", "value", 0)


def test_resample_observed_null_bucket_is_not_a_gap(spark):
    # bucket 1 HAS an event whose value is NULL: it is observed
    # (was_gap=False) and keeps its NULL aggregate — never mislabeled
    # as a gap and overwritten by the previous bucket's value
    rows = [("a", _ts(0), 10.0), ("a", _ts(1), None), ("a", _ts(3), 7.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = sorted(
        resample(df, "k", "ts", "value", interval=60).collect(),
        key=lambda r: r["bucket"],
    )
    assert [(r["value"], r["was_gap"]) for r in out] == [
        (10.0, False),
        (None, False),   # observed, genuinely NULL
        (None, True),    # gap: fill repeats the last OBSERVED value (NULL)
        (7.0, False),
    ]


def test_resample_gap_after_null_observation_fills_null(spark):
    # the forward fill repeats what was last measured — it must not
    # reach past a NULL measurement to an older non-null value
    rows = [("a", _ts(0), 5.0), ("a", _ts(1), None), ("a", _ts(2), None)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = sorted(
        resample(df, "k", "ts", "value", interval=60).collect(),
        key=lambda r: r["bucket"],
    )
    assert [(r["value"], r["was_gap"]) for r in out] == [
        (5.0, False),
        (None, False),
        (None, False),
    ]


def test_rolling_anomalies_by_hand(spark):
    from muller_spark.operators.timeseries import rolling_anomalies

    # flat baseline 10,10,10,10 then a spike: z = (100-10)/0 undefined?
    # no — baseline has zero variance, so the spike is NOT flagged
    # (documented); make the baseline noisy instead
    vals = [10.0, 12.0, 11.0, 9.0, 10.0, 100.0]
    rows = [("a", float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts double, value double")
    out = rolling_anomalies(df, "k", "ts", "value", window_n=5, threshold=3.0).collect()
    assert [(r["ts_epoch"], r["value"]) for r in out] == [(5, 100.0)]
    # z by hand: mean(10,12,11,9,10)=10.4, sample std≈1.1402
    assert abs(out[0]["zscore"] - round((100 - 10.4) / 1.140175425, 4)) < 1e-9


def test_rolling_anomalies_zero_variance_and_cold_start_not_flagged(spark):
    from muller_spark.operators.timeseries import rolling_anomalies

    rows = [("a", 0.0, 5.0), ("a", 1.0, 5.0), ("a", 2.0, 5.0), ("a", 3.0, 50.0)]
    df = spark.createDataFrame(rows, "k string, ts double, value double")
    out = rolling_anomalies(df, "k", "ts", "value", window_n=5, threshold=1.0).collect()
    assert out == []  # zero-variance baseline: never flagged
    with __import__("pytest").raises(ValueError, match="window_n"):
        rolling_anomalies(df, "k", "ts", "value", window_n=1)


def test_rolling_anomalies_spike_excluded_from_own_baseline(spark):
    from muller_spark.operators.timeseries import rolling_anomalies

    # with the spike INSIDE its own window the std would explode and
    # mask it; the frame ends at -1 PRECEDING so it cannot
    vals = [10.0, 12.0, 11.0, 9.0, 10.0, 100.0, 11.0]
    rows = [("a", float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts double, value double")
    out = rolling_anomalies(df, "k", "ts", "value", window_n=5, threshold=3.0).collect()
    assert [(r["ts_epoch"], r["value"]) for r in out] == [(5, 100.0)]


def test_resample_linear_interpolates_gaps(spark):
    # observed at minutes 0 (value 10) and 3 (value 40): interior gap
    # buckets interpolate proportionally to bucket distance
    rows = [("a", _ts(0), 10.0), ("a", _ts(3), 40.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = sorted(
        resample(df, "k", "ts", "value", interval=60, fill="linear").collect(),
        key=lambda r: r["bucket"],
    )
    base = int(_ts(0).timestamp())
    assert [(r["bucket"] - base, r["value"], r["was_gap"]) for r in out] == [
        (0, 10.0, False),
        (60, 20.0, True),
        (120, 30.0, True),
        (180, 40.0, False),
    ]


def test_resample_linear_null_neighbor_stays_null(spark):
    # minute-0 bucket observed but its only value is NULL → gaps that
    # would interpolate from it stay NULL (no invented measurements)
    rows = [("a", _ts(0), None), ("a", _ts(2), 6.0), ("a", _ts(4), 8.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = sorted(
        resample(df, "k", "ts", "value", interval=60, fill="linear").collect(),
        key=lambda r: r["bucket"],
    )
    base = int(_ts(0).timestamp())
    assert [(r["bucket"] - base, r["value"], r["was_gap"]) for r in out] == [
        (0, None, False),
        (60, None, True),     # left neighbor is a NULL observation
        (120, 6.0, False),
        (180, 7.0, True),     # both neighbors measured → interpolated
        (240, 8.0, False),
    ]


def test_resample_rejects_unknown_fill(spark):
    df = spark.createDataFrame(
        [("a", _ts(0), 1.0)], "k string, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="fill must be"):
        resample(df, "k", "ts", "value", interval=60, fill="cubic")


def test_resample_span_guard_raises_on_pathological_key(spark):
    """One 1970-epoch dirt row under a hot key: the spine would be a
    ~1.7-billion-bucket grid at interval=1 — the guard must raise a
    clear error naming the key instead of OOMing a task."""
    from datetime import datetime as _dt

    rows = [
        ("hot", _ts(0), 1.0),
        ("hot", _dt(1970, 1, 1, tzinfo=timezone.utc), 2.0),  # dirt
        ("clean", _ts(0), 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    with pytest.raises(Exception, match="max_buckets"):
        resample(df, "k", "ts", "value", interval=1).collect()
    # the guard is configurable, and None disables it entirely (the
    # chunked spine still protects task memory; we keep the span tiny)
    ok = resample(
        df.where("k = 'clean'"), "k", "ts", "value",
        interval=1, max_buckets=None,
    ).collect()
    assert len(ok) == 1


def test_resample_chunked_spine_matches_single_sequence(spark, monkeypatch):
    """Force multi-chunk spine generation (chunk=4 buckets) on a span
    of 11 buckets: the grid, gap flags, and both fill policies must be
    identical to the normal one-chunk shape."""
    import muller_spark.operators.timeseries as ts_mod

    rows = [("a", _ts(0), 2.0), ("a", _ts(10), 12.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")

    def run():
        return sorted(
            resample(df, "k", "ts", "value", interval=60,
                     fill="linear").collect(),
            key=lambda r: r["bucket"],
        )

    want = [(r["bucket"], r["value"], r["was_gap"]) for r in run()]
    monkeypatch.setattr(ts_mod, "_SPINE_CHUNK_BUCKETS", 4)
    got = [(r["bucket"], r["value"], r["was_gap"]) for r in run()]
    assert got == want
    assert len(got) == 11  # full grid, nothing dropped at chunk seams
    assert [v for _, v, _ in got] == [2.0 + i for i in range(11)]
