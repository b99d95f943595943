"""CDC operators (operators/cdc): upsert + changelog application."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.cdc import apply_changelog, upsert  # noqa: E402


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double",
    )


def test_upsert_replaces_and_inserts(spark):
    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (9, "new", 99.0)], "id long, name string, bal double"
    )
    got = {
        r["id"]: (r["name"], r["bal"])
        for r in upsert(_snap(spark), updates, ["id"]).collect()
    }
    assert got == {
        1: ("a", 10.0),
        2: ("b2", 25.0),
        3: ("c", 30.0),
        9: ("new", 99.0),
    }


def test_upsert_validates_schema_and_keys(spark):
    with pytest.raises(ValueError, match="at least one key"):
        upsert(_snap(spark), _snap(spark), [])
    bad = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="missing target columns"):
        upsert(_snap(spark), bad, ["id"])


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "id long, name string, bal double, op string, seq long"
    )


def test_changelog_last_write_wins(spark):
    ch = _changes(
        spark,
        [
            (2, "first", 1.0, "U", 10),
            (2, "last", 2.0, "U", 20),  # supersedes seq=10
            (3, None, 0.0, "D", 5),
            (9, "ins", 9.0, "I", 1),
        ],
    )
    got = {
        r["id"]: (r["name"], r["bal"])
        for r in apply_changelog(_snap(spark), ch, ["id"], "seq").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("last", 2.0), 9: ("ins", 9.0)}


def test_changelog_delete_then_reinsert_ordered_by_seq(spark):
    ch = _changes(spark, [(3, None, 0.0, "D", 1), (3, "back", 33.0, "I", 2)])
    got = {
        r["id"]: r["name"]
        for r in apply_changelog(_snap(spark), ch, ["id"], "seq").collect()
    }
    assert got[3] == "back"


def test_changelog_equal_seq_tie_prefers_delete(spark):
    ch = _changes(spark, [(2, "upd", 2.0, "U", 7), (2, None, 0.0, "D", 7)])
    got = {
        r["id"]
        for r in apply_changelog(_snap(spark), ch, ["id"], "seq").collect()
    }
    assert got == {1, 3}


def test_changelog_is_idempotent_on_replay(spark):
    ch = _changes(
        spark,
        [(1, "u1", 11.0, "U", 1), (2, None, 0.0, "D", 2), (9, "i", 9.0, "I", 3)],
    )
    once = apply_changelog(_snap(spark), ch, ["id"], "seq")
    twice = apply_changelog(once, ch, ["id"], "seq")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_changelog_requires_op_and_seq(spark):
    missing = spark.createDataFrame(
        [(1, "x", 1.0)], "id long, name string, bal double"
    )
    with pytest.raises(ValueError, match="missing required column"):
        apply_changelog(_snap(spark), missing, ["id"], "seq")


def test_changelog_window_only_touches_changes(spark):
    """The snapshot side must not appear under the window: only the
    changelog is windowed (the snapshot is the 100 TB side)."""
    ch = _changes(spark, [(1, "u", 1.0, "U", 1)])
    out = apply_changelog(_snap(spark), ch, ["id"], "seq")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # exactly one Window node ("Window [" — WindowGroupLimit is the
    # map-side top-1 companion, not a second window): the anti-join
    # branch uses distinct keys, so the windowed subplan is not
    # duplicated by DataFrame reuse
    assert plan.count("Window [") == 1


def test_changelog_unknown_op_raises_not_silent_delete(spark):
    from muller_spark.operators.cdc import apply_changelog

    snap = spark.createDataFrame(
        [(5, "old"), (6, "keep")], "id long, v string"
    )
    # lowercase 'u' (Debezium-style producer bug): before the guard this
    # anti-joined id=5 out of the snapshot and inserted nothing — a
    # silent delete.  Now the job fails at execution.
    changes = spark.createDataFrame(
        [(5, "new", "u", 9)], "id long, v string, op string, seq long"
    )
    out = apply_changelog(snap, changes, ["id"], "seq")
    with pytest.raises(Exception, match="op value outside"):
        out.collect()


def test_changelog_null_op_raises(spark):
    from muller_spark.operators.cdc import apply_changelog

    snap = spark.createDataFrame([(1, "a")], "id long, v string")
    changes = spark.createDataFrame(
        [(1, "b", None, 2)], "id long, v string, op string, seq long"
    )
    with pytest.raises(Exception, match="op value outside"):
        apply_changelog(snap, changes, ["id"], "seq").collect()
