"""Property-based check of the three-way merge: random divergence on two
branches, merged with random resolutions, must equal a pure-Python model
of the reference resolution matrix (``merge.py:208-288,1011-1092``)
applied to the uuid-keyed branch states.

Two tensors (x, y) are mutated independently so the model also pins
*column-level* conflict detection: branches updating different tensors
of the same row must merge silently, and a divergent update of one cell
must not disturb the sibling column's one-sided change.

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

TENSORS = ("x", "y")

_branch_op = st.one_of(
    st.tuples(st.just("append"), st.integers(100, 105)),
    st.tuples(st.just("update"), st.sampled_from(TENSORS),
              st.integers(0, 7), st.integers(0, 3)),
    st.tuples(st.just("pop"), st.integers(0, 7)),
)


def _apply(ds, ops):
    for op in ops:
        n = len(ds)
        if op[0] == "append":
            ds.extend({"x": [op[1]], "y": [op[1] * 10]})
        elif op[0] == "update" and n:
            getattr(ds, op[1])[op[2] % n] = op[3]
        elif op[0] == "pop" and n:
            ds.pop(op[1] % n)


def _state(ds):
    """uuid → (row_id, {tensor: value}) for the current checkout."""
    return {
        r[UUID_COL]: (r[ROW_ID_COL], {t: r[t] for t in TENSORS})
        for r in ds.df.select(UUID_COL, ROW_ID_COL, *TENSORS).collect()
    }


def _model_merge(base, ours, theirs, append_res, update_res, pop_res):
    """Pure-Python mirror of three_way_merge over TENSORS.

    Row presence follows the reference's append/pop matrix; each column
    resolves independently (one-sided changes merge silently; divergent
    cells follow update_res).  Returns merged [(x, y), ...] in output
    order."""
    app_o = [u for u in ours if u not in base]
    app_t = [u for u in theirs if u not in base]
    both_appended = bool(app_o) and bool(app_t)

    rows = []  # (pri, pos, (x, y))
    uuids = set(base) | set(ours) | set(theirs)
    for u in uuids:
        in_o, in_t, in_b = u in ours, u in theirs, u in base
        o = ours.get(u)
        t = theirs.get(u)
        b = base.get(u)
        if in_b and in_o and in_t:
            vals = []
            for col in TENSORS:
                o_v, t_v, b_v = o[1][col], t[1][col], b[1][col]
                if o_v != b_v and t_v != b_v and o_v != t_v:
                    vals.append(t_v if update_res == "theirs" else o_v)
                elif t_v != b_v and o_v == b_v:
                    vals.append(t_v)
                else:
                    vals.append(o_v)
            rows.append((0, o[0], tuple(vals)))
        elif in_b and in_o and not in_t:  # theirs popped
            if pop_res == "ours":
                rows.append((0, o[0], tuple(o[1][c] for c in TENSORS)))
        elif in_b and not in_o and in_t:  # we popped
            t_updated = any(t[1][c] != b[1][c] for c in TENSORS)
            if (update_res == "theirs" and t_updated) or pop_res == "theirs":
                rows.append((1, t[0], tuple(t[1][c] for c in TENSORS)))
        elif in_o and not in_b:  # our append
            if not (both_appended and append_res == "theirs"):
                rows.append((0, o[0], tuple(o[1][c] for c in TENSORS)))
        elif in_t and not in_b:  # their append
            if (not both_appended) or append_res in ("theirs", "both"):
                rows.append((1, t[0], tuple(t[1][c] for c in TENSORS)))
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
    ds.create_tensor("y", dtype="int64")
    ds.extend({"x": [10, 11, 12, 13], "y": [50, 51, 52, 53]})
    ds.commit("base")

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
    got = [
        (r["x"], r["y"])
        for r in ds.df.orderBy(ROW_ID_COL).select("x", "y").collect()
    ]
    assert got == expected, (
        ops_a, ops_b, append_res, update_res, pop_res,
        base_state, ours_state, theirs_state,
    )


def test_cross_column_updates_merge_silently(spark, tmp_path):
    """The canonical column-level case: we update x of row 0, they update
    y of row 0 — no conflict, both changes land."""
    ds = ds_mod.dataset(str(tmp_path / "colmerge"), spark)
    ds.create_tensor("x", dtype="int64")
    ds.create_tensor("y", dtype="int64")
    ds.extend({"x": [1, 2], "y": [10, 20]})
    ds.commit("base")
    ds.checkout("other", create=True)
    ds.y[0] = 99
    ds.commit("their y")
    ds.checkout("main")
    ds.x[0] = 77
    ds.commit("our x")
    # no resolutions needed: the cells are disjoint
    ds.merge("other")
    rows = [(r["x"], r["y"]) for r in ds.df.orderBy(ROW_ID_COL).select("x", "y").collect()]
    assert rows == [(77, 99), (2, 20)]
