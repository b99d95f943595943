"""Pin the mirror's canonicalization to the driver's observed behavior.

Round 7 (str()-sorted "draw-ready" sweep) and round 8 (ArrayType crash)
both caught the local mirror being WEAKER than the driver's compare: the
mirror str()-sorted rows where the driver pandas-``sort_values`` them, so
the mirror certified output shapes the driver then crashed on.  These
tests feed adversarial frames through :func:`tests.oracle_utils.driver_canon`
and assert it behaves exactly like the driver's ``_canon``:

* list / dict cells  -> ``TypeError`` (pandas lexsort ``factorize`` on an
  unhashable object), the round-8 failure verbatim;
* scalar frames      -> a deterministic total order, stable across
  engine-specific input orderings;
* NaN / None cells   -> do not crash, land in a deterministic position;
* column order       -> canonicalized by (lower-cased) name, so Spark and
  DuckDB column orderings never affect the verdict.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import _rows, driver_canon  # noqa: E402


def test_list_cell_crashes_like_driver():
    # Verbatim round-8 shape: (id bigint, embedding array<bigint>).
    cols = ["id", "embedding"]
    data = [(1, [0, 2, -1]), (2, [1, 0, 0])]
    with pytest.raises(TypeError):
        driver_canon(cols, data)


def test_list_cell_crashes_even_in_trailing_column():
    cols = ["a", "b", "c"]
    data = [(1, "x", [1.0]), (2, "y", [2.0])]
    with pytest.raises(TypeError):
        driver_canon(cols, data)


def test_dict_cell_crashes_like_driver():
    cols = ["id", "m"]
    data = [(1, {"k": 1}), (2, {"k": 2})]
    with pytest.raises(TypeError):
        driver_canon(cols, data)


def test_scalar_frame_sorts_total_order():
    cols = ["b", "a"]
    data = [(2, "x"), (1, "y"), (2, "a")]
    out = driver_canon(cols, data)
    # columns name-sorted -> (a, b); rows sorted by (a, b)
    assert out == [("a", 2), ("x", 2), ("y", 1)]


def test_input_order_invariance():
    cols = ["k", "v"]
    data = [(3, 0.5), (1, -2.0), (2, float("nan")), (1, 7.0)]
    fwd = driver_canon(cols, data)
    rev = driver_canon(cols, list(reversed(data)))
    assert len(fwd) == len(rev) == 4
    for r_f, r_r in zip(fwd, rev):
        for a, b in zip(r_f, r_r):
            if isinstance(a, float) and math.isnan(a):
                assert isinstance(b, float) and math.isnan(b)
            else:
                assert a == b


def test_none_cells_do_not_crash():
    cols = ["x", "y"]
    data = [(None, 1), (3, None), (2, 2)]
    out = driver_canon(cols, data)
    assert len(out) == 3
    assert {r[1] for r in out} == {None, 1, 2} or {r[0] for r in out} >= {2, 3}


def test_unicode_and_mixed_width_strings():
    cols = ["s"]
    data = [("ß",), ("ss",), ("日本",), ("",)]
    out = driver_canon(cols, data)
    assert [r[0] for r in out] == sorted(s for (s,) in data)


def test_column_name_canonicalization_case_insensitive():
    # Spark may emit `Sum_Qty` where DuckDB emits `sum_qty`; the driver
    # pairs them by name — canon must agree regardless of case/order.
    a = driver_canon(["B", "a"], [(1, "p"), (2, "q")])
    b = driver_canon(["a", "b"], [("p", 1), ("q", 2)])
    assert a == b


def test_rows_pipeline_rejects_arrays_end_to_end():
    # _rows (used by every mirror compare) must propagate the crash,
    # not normalize lists into hashable tuples first (the round-8 hole).
    with pytest.raises(TypeError):
        _rows(["id", "vec"], [(1, [1, 2]), (2, [3, 4])])
