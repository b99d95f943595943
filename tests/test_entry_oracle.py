"""Mirror of the driver's t2 correctness gate, run locally at sf0.01."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_utils import compare_query  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_every_query_has_oracle_or_is_flagged():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    if name not in _ORACLES:
        df = _QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    problems = compare_query(spark, name, _QUERIES[name], _ORACLES[name], SF_DIR)
    assert not problems, "\n".join(problems)
