"""Model-based property test of the CRUD + versioning surface: a random
op sequence (append / positional update / positional pop / commit) is
applied both to a ``Dataset`` and to a plain Python list model; state
must agree after every commit, and checkout of any recorded commit must
reproduce the model's state at that point.

This pins the positional-vs-uuid discipline SURVEY §7 flags as hard
part 1: rows are addressed by position (``pop(i)``, ``x[i]=v``,
positions renumber after pop — reference ``crud_operations.py:216,259``)
while snapshots/merges key on ``_uuid``.
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

_op = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 999)),
    st.tuples(st.just("update"), st.integers(0, 9), st.integers(0, 999)),
    st.tuples(st.just("pop"), st.integers(0, 9)),
    st.tuples(st.just("commit"), st.just(0)),
)


@settings(
    max_examples=prop_examples(12),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=3, max_size=10))
def test_crud_sequence_matches_list_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("crud") / "ds")
    ds = ds_mod.dataset(root, spark)
    ds.create_tensor("x", dtype="int64")
    ds.extend({"x": [1, 2, 3]})
    ds.commit("seed")

    model = [1, 2, 3]
    history: list[tuple[str, list[int]]] = [(ds.log.get_ref("main"), list(model))]

    for op in ops:
        if op[0] == "append":
            ds.extend({"x": [op[1]]})
            model.append(op[1])
        elif op[0] == "update":
            if not model:
                continue
            i = op[1] % len(model)
            ds.x[i] = op[2]
            model[i] = op[2]
        elif op[0] == "pop":
            if not model:
                continue
            i = op[1] % len(model)
            ds.pop(i)
            del model[i]
        else:
            cid = ds.commit("step")
            history.append((cid, list(model)))

    cid = ds.commit("final")
    history.append((cid, list(model)))

    assert list(ds.x.numpy()) == model
    assert len(ds) == len(model)

    # every committed state must be reproducible by checkout
    for cid, snapshot_model in history:
        ds.checkout(cid)
        assert list(ds.x.numpy()) == snapshot_model, cid
    ds.checkout("main")
