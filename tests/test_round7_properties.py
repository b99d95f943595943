"""Property tests for the round-7 operators: apply_changelog matches a
pure-Python last-write-wins fold for arbitrary changelogs; resample's
grid is dense, gap-marking matches observation, and ffill carries the
last observed aggregate; event_paths counts match a pure-Python n-gram
scan including NULL windows."""

from __future__ import annotations

import os
import sys
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import prop_examples  # noqa: E402

from muller_spark.operators.analytics import event_paths  # noqa: E402
from muller_spark.operators.cdc import apply_changelog  # noqa: E402
from muller_spark.operators.timeseries import resample  # noqa: E402

_SLOW = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@settings(max_examples=prop_examples(8), **_SLOW)
@given(
    snap=st.dictionaries(st.integers(0, 9), st.integers(0, 99), max_size=8),
    log=st.lists(
        st.tuples(
            st.integers(0, 9),        # key
            st.integers(0, 99),       # value
            st.sampled_from("IUD"),   # op
            st.integers(0, 20),       # seq
        ),
        max_size=20,
    ),
)
def test_apply_changelog_matches_python_fold(spark, snap, log):
    """Oracle: sort by seq with delete-biased ties, fold into a dict."""
    snap_df = spark.createDataFrame(
        [(k, v) for k, v in snap.items()] or [], "id long, v long"
    )
    log_df = spark.createDataFrame(
        [(k, v, op, s) for (k, v, op, s) in log] or [],
        "id long, v long, op string, seq long",
    )
    got = {
        r["id"]: r["v"]
        for r in apply_changelog(snap_df, log_df, ["id"], "seq").collect()
    }
    want = dict(snap)
    # winner per key: max seq, delete preferred on seq ties
    winners: dict[int, tuple[int, int, str]] = {}
    for k, v, op, s in log:
        cur = winners.get(k)
        rank = (s, 1 if op == "D" else 0)
        if cur is None or rank > (cur[0], 1 if cur[2] == "D" else 0):
            winners[k] = (s, v, op)
    for k, (_, v, op) in winners.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


@settings(max_examples=prop_examples(8), **_SLOW)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from("ab"),                      # key
            st.integers(0, 40),                         # ts (seconds)
            st.one_of(st.none(), st.integers(0, 9)),    # value (int-safe avg? use sum)
        ),
        min_size=1,
        max_size=25,
    ),
    interval=st.sampled_from([1, 3, 7, 10]),
)
def test_resample_grid_gap_and_ffill_invariants(spark, events, interval):
    df = spark.createDataFrame(
        [(k, float(t), float(v) if v is not None else None) for k, t, v in events],
        "k string, ts double, value double",
    )
    out = resample(df, "k", "ts", "value", interval=interval, agg="max").collect()
    by_key: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["k"], r["bucket"])):
        by_key.setdefault(r["k"], []).append(r)
    # python oracle state
    obs: dict[tuple[str, int], list] = {}
    for k, t, v in events:
        obs.setdefault((k, (t // interval) * interval), []).append(v)
    for k, rows in by_key.items():
        buckets = [r["bucket"] for r in rows]
        # dense grid spanning exactly the observed range
        kb = sorted(b for (kk, b) in obs if kk == k)
        assert buckets == list(range(kb[0], kb[-1] + 1, interval))
        carried = None
        for r in rows:
            key = (k, r["bucket"])
            if key in obs:
                assert r["was_gap"] is False
                vals = [v for v in obs[key] if v is not None]
                want = float(max(vals)) if vals else None
                assert r["value"] == want
                carried = want
            else:
                assert r["was_gap"] is True
                assert r["value"] == carried  # last OBSERVED aggregate
    # no keys invented
    assert set(by_key) == {k for (k, _) in obs}


@settings(max_examples=prop_examples(8), **_SLOW)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(0, 2),                                    # user
            st.one_of(st.none(), st.sampled_from(["v", "c", "b"])),  # event
        ),
        min_size=0,
        max_size=20,
    ),
    length=st.integers(2, 4),
)
def test_event_paths_matches_python_ngrams(spark, evs, length):
    rows = [(u, e, i) for i, (u, e) in enumerate(evs)]
    df = spark.createDataFrame(rows or [], "user long, ev string, ts long")
    got = {
        r["path"]: r["n"]
        for r in event_paths(df, "user", "ev", "ts", length=length, k=100).collect()
    }
    seqs: dict[int, list] = {}
    for u, e, _ in rows:
        seqs.setdefault(u, []).append(e)
    want: Counter = Counter()
    for seq in seqs.values():
        for i in range(len(seq) - length + 1):
            window = seq[i : i + length]
            if all(x is not None for x in window):
                want[" → ".join(window)] += 1
    assert got == dict(want)
