"""Property-based check of the three-way merge: random divergence on two
branches, merged with random resolutions, must equal a pure-Python model
of the reference resolution matrix (``merge.py:208-288,1011-1092``)
applied to the uuid-keyed branch states.

The model reads the actual ``_uuid``/``_row_id`` states of base/ours/
theirs right before the merge, so it checks the merge operator itself,
independent of how the divergence was produced.
"""

from __future__ import annotations

import os
import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import prop_examples  # noqa: E402
from muller_spark import dataset as ds_mod  # noqa: E402
from muller_spark.schema import ROW_ID_COL, UUID_COL  # noqa: E402

_branch_op = st.one_of(
    st.tuples(st.just("append"), st.integers(100, 105)),
    st.tuples(st.just("update"), st.integers(0, 7), st.integers(0, 3)),
    st.tuples(st.just("pop"), st.integers(0, 7)),
)


def _apply(ds, ops):
    for op in ops:
        n = len(ds)
        if op[0] == "append":
            ds.extend({"x": [op[1]]})
        elif op[0] == "update" and n:
            ds.x[op[1] % n] = op[2]
        elif op[0] == "pop" and n:
            ds.pop(op[1] % n)


def _state(ds):
    """uuid → (row_id, x) for the current checkout."""
    return {
        r[UUID_COL]: (r[ROW_ID_COL], r["x"])
        for r in ds.df.select(UUID_COL, ROW_ID_COL, "x").collect()
    }


def _model_merge(base, ours, theirs, append_res, update_res, pop_res):
    """Pure-Python mirror of three_way_merge for a single tensor x.

    Returns the merged (x values) list in output order, or raises
    AssertionError if the scenario should not need the given resolutions
    (we always pass all three, so no conflict errors are expected)."""
    app_o = [u for u in ours if u not in base]
    app_t = [u for u in theirs if u not in base]
    both_appended = bool(app_o) and bool(app_t)

    rows = []  # (pri, pos, value)
    uuids = set(base) | set(ours) | set(theirs)
    for u in uuids:
        in_o, in_t, in_b = u in ours, u in theirs, u in base
        o = ours.get(u)
        t = theirs.get(u)
        b = base.get(u)
        if in_b and in_o and in_t:
            o_v, t_v, b_v = o[1], t[1], b[1]
            if o_v != b_v and t_v != b_v and o_v != t_v:
                v = t_v if update_res == "theirs" else o_v
            elif t_v != b_v and o_v == b_v:
                v = t_v
            else:
                v = o_v
            rows.append((0, o[0], v))
        elif in_b and in_o and not in_t:  # theirs popped
            if pop_res == "ours":
                rows.append((0, o[0], o[1]))
        elif in_b and not in_o and in_t:  # we popped
            t_updated = t[1] != b[1]
            if (update_res == "theirs" and t_updated) or pop_res == "theirs":
                rows.append((1, t[0], t[1]))
        elif in_o and not in_b:  # our append
            if not (both_appended and append_res == "theirs"):
                rows.append((0, o[0], o[1]))
        elif in_t and not in_b:  # their append
            if (not both_appended) or append_res in ("theirs", "both"):
                rows.append((1, t[0], t[1]))
    rows.sort()
    return [v for _, _, v in rows]


@settings(
    max_examples=prop_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops_a=st.lists(_branch_op, min_size=0, max_size=3),
    ops_b=st.lists(_branch_op, min_size=0, max_size=3),
    append_res=st.sampled_from(["ours", "theirs", "both"]),
    update_res=st.sampled_from(["ours", "theirs"]),
    pop_res=st.sampled_from(["ours", "theirs", "both"]),
)
def test_merge_matches_resolution_model(
    spark, tmp_path_factory, ops_a, ops_b, append_res, update_res, pop_res
):
    root = str(tmp_path_factory.mktemp("mergeprop") / "ds")
    ds = ds_mod.dataset(root, spark)
    ds.create_tensor("x", dtype="int64")
    ds.extend({"x": [10, 11, 12, 13]})
    base_commit = ds.commit("base")

    base_state = _state(ds)

    ds.checkout("other", create=True)
    _apply(ds, ops_b)
    ds.commit("theirs", allow_empty=True)
    theirs_state = _state(ds)

    ds.checkout("main")
    _apply(ds, ops_a)
    ds.commit("ours", allow_empty=True)
    ours_state = _state(ds)

    expected = _model_merge(
        base_state, ours_state, theirs_state, append_res, update_res, pop_res
    )
    ds.merge(
        "other",
        append_resolution=append_res,
        update_resolution=update_res,
        pop_resolution=pop_res,
    )
    got = list(ds.x.numpy())
    assert got == expected, (
        ops_a, ops_b, append_res, update_res, pop_res,
        base_state, ours_state, theirs_state,
    )
