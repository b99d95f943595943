"""Misra–Gries heavy hitters: exact-regime parity, the frequent-item
guarantee and under-count bound in the compaction regime, and bound
preservation through the distributed merge."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from muller_spark.operators.heavyhitters import _MG, heavy_hitters


# ---------------------------------------------------------------- _MG unit


def test_exact_regime_is_exact():
    mg = _MG(10)
    mg.add_counts({"a": 5, "b": 3})
    mg.add_counts({"a": 2, "c": 1})
    assert mg.counts == {"a": 7, "b": 3, "c": 1}
    assert mg.err == 0


def test_guarantee_and_bound_over_capacity():
    rng = random.Random(41)
    # zipf-ish: a few heavy items over a long tail
    items = []
    for i in range(8):
        items += [f"hot{i}"] * (4000 >> i)
    items += [f"tail{j}" for j in range(3000)]
    rng.shuffle(items)
    k = 32
    mg = _MG(k)
    for i in range(0, len(items), 500):
        mg.add_counts(dict(Counter(items[i:i + 500])))
    true = Counter(items)
    n = len(items)
    assert mg.err <= n // (k + 1)
    for item, tc in true.items():
        if tc > n // (k + 1):
            assert item in mg.counts, item  # frequent-item guarantee
    for item, est in mg.counts.items():
        assert est <= true[item] <= est + mg.err, item  # undercount bound
    assert len(mg.counts) <= k


def test_merge_rows_preserves_bound():
    rng = random.Random(43)
    items = [f"i{rng.randrange(200)}" for _ in range(10000)]
    halves = [items[:5000], items[5000:]]
    partial_rows = []
    for h in halves:
        mg = _MG(16)
        mg.add_counts(dict(Counter(h)))
        partial_rows += mg.rows()
    merged = _MG(16)
    merged.merge_rows(
        [r[0] for r in partial_rows],
        [r[1] for r in partial_rows],
        [r[2] for r in partial_rows],
    )
    true = Counter(items)
    assert merged.err <= len(items) // 17 * 2 + 1
    for item, est in merged.counts.items():
        assert est <= true[item] <= est + merged.err


def test_k_validation():
    with pytest.raises(ValueError, match="k must be"):
        _MG(0)


# ------------------------------------------------------------- Spark level


def test_spark_exact_regime_per_group(spark):
    rows = [
        ("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"), ("g2", None),
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r["g"], r["item"]): (r["est_count"], r["err_bound"])
        for r in heavy_hitters(df, "v", k=8, group_cols=["g"]).collect()
    }
    assert got == {
        ("g1", "x"): (2, 0), ("g1", "y"): (1, 0), ("g2", "z"): (1, 0),
    }


def test_spark_over_capacity_guarantee(spark):
    rng = random.Random(47)
    items = ["hot"] * 3000 + [f"t{j}" for j in range(2000)]
    rng.shuffle(items)
    df = spark.createDataFrame([(i,) for i in items], "v string").repartition(8)
    out = {r["item"]: r for r in heavy_hitters(df, "v", k=16).collect()}
    n = len(items)
    assert "hot" in out
    r = out["hot"]
    assert r["est_count"] <= 3000 <= r["est_count"] + r["err_bound"]
    assert len(out) <= 16


def test_spark_numeric_items_stringified(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "v int")
    got = {r["item"]: r["est_count"] for r in heavy_hitters(df, "v", k=4).collect()}
    assert got == {"1": 2, "2": 1}


# ---------------------------------------------------------------------------
# incremental heavy-hitters ledger (round 11): split invariance in the
# exact regime, guarantee preservation over capacity, compaction
# equivalence, streaming replay + the stopped-stream compaction hazard
# ---------------------------------------------------------------------------

def _ledger_report(spark, path):
    from muller_spark.operators.heavyhitters import mg_ledger_report

    return {
        (r["g"], r["item"]): (r["est_count"], r["err_bound"])
        for r in mg_ledger_report(spark, path).collect()
    }


def test_mg_ledger_exact_regime_split_invariance(spark, tmp_path):
    import os

    from muller_spark.operators.heavyhitters import (
        compact_mg_ledger,
        init_mg_ledger,
        mg_ledger_ingest,
    )

    rng = random.Random(41)
    rows = [
        (f"g{rng.randrange(3)}", f"item{rng.randrange(20)}")
        for _ in range(1200)
    ]
    truth = Counter(rows)
    path = os.path.join(str(tmp_path), "mg")
    df0 = spark.createDataFrame(rows[:400], "g string, v string")
    init_mg_ledger(df0, ["g"], "v", path, k=64)
    for a, b in ((400, 900), (900, 1200)):
        mg_ledger_ingest(
            spark.createDataFrame(rows[a:b], "g string, v string"), path
        )
    got = _ledger_report(spark, path)
    # 20 distinct items < k=64: exact frequency table, err_bound 0
    assert got == {
        (g, i): (n, 0) for (g, i), n in truth.items()
    }
    compact_mg_ledger(spark, path)
    assert _ledger_report(spark, path) == got  # compaction equivalence


def test_mg_ledger_over_capacity_guarantees(spark, tmp_path):
    """Over capacity the ledger keeps the MG guarantees across any
    ingest split: est ≤ true ≤ est + err_bound, and every item with
    true frequency > N/(k+1) is present."""
    import os

    from muller_spark.operators.heavyhitters import (
        init_mg_ledger,
        mg_ledger_ingest,
    )

    k = 8
    rng = random.Random(43)
    # two heavy items + a long tail of 60 distinct light items
    vals = (["big"] * 300 + ["mid"] * 120
            + [f"t{rng.randrange(60)}" for _ in range(400)])
    rng.shuffle(vals)
    truth = Counter(vals)
    n = len(vals)
    path = os.path.join(str(tmp_path), "mg")
    init_mg_ledger(
        spark.createDataFrame([("a", v) for v in vals[:250]],
                              "g string, v string"),
        ["g"], "v", path, k=k,
    )
    for a, b in ((250, 600), (600, n)):
        mg_ledger_ingest(
            spark.createDataFrame([("a", v) for v in vals[a:b]],
                                  "g string, v string"),
            path,
        )
    got = _ledger_report(spark, path)
    for (g, item), (est, err) in got.items():
        assert est <= truth[item] <= est + err, (item, est, err)
    for item, cnt in truth.items():
        if cnt > n / (k + 1):
            assert ("a", item) in got, (item, cnt)


def test_mg_ledger_stream_replay_and_compaction_manifest(spark, tmp_path):
    """Streaming handler contract: replayed batch is a no-op (marker),
    and after compaction drops the marker the landed manifest still
    blocks the double-count (the r10-ADVICE hazard, applied to the new
    family member from day one)."""
    import os

    from muller_spark.operators.heavyhitters import (
        compact_mg_ledger,
        init_mg_ledger,
    )
    from muller_spark.streaming.windows import make_mg_ledger_batch_handler

    path = os.path.join(str(tmp_path), "mg")
    init_mg_ledger(
        spark.createDataFrame([("a", "x")], "g string, v string"),
        ["g"], "v", path, k=16,
    )
    handler = make_mg_ledger_batch_handler(path, run_ns="testns")
    batch = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "z")], "g string, v string"
    )
    handler(batch, 0)
    expect = {("a", "x"): (2, 0), ("a", "y"): (1, 0), ("b", "z"): (1, 0)}
    assert _ledger_report(spark, path) == expect
    handler(batch, 0)  # crash-replay: marker skip
    assert _ledger_report(spark, path) == expect
    compact_mg_ledger(spark, path)
    handler(batch, 0)  # post-compaction replay rides the manifest
    assert _ledger_report(spark, path) == expect
    handler(spark.createDataFrame([("b", "z")], "g string, v string"), 1)
    expect[("b", "z")] = (2, 0)
    assert _ledger_report(spark, path) == expect


def test_mg_ledger_global_key(spark, tmp_path):
    """key_cols=[] — one global summary."""
    import os

    from muller_spark.operators.heavyhitters import (
        init_mg_ledger,
        mg_ledger_ingest,
        mg_ledger_report,
    )

    path = os.path.join(str(tmp_path), "mg")
    init_mg_ledger(
        spark.createDataFrame([("x",), ("y",)], "v string"),
        [], "v", path, k=8,
    )
    mg_ledger_ingest(spark.createDataFrame([("x",)], "v string"), path)
    got = {
        r["item"]: (r["est_count"], r["err_bound"])
        for r in mg_ledger_report(spark, path).collect()
    }
    assert got == {"x": (2, 0), "y": (1, 0)}


def test_mg_ledger_stream_end_to_end(spark, tmp_path):
    """File-source stream of batches → MG ledger; restart with the
    same checkpoint continues; report equals the exact frequency
    table (exact regime)."""
    import os

    import pyspark.sql.types as T

    from muller_spark.operators.heavyhitters import init_mg_ledger
    from muller_spark.streaming.windows import (
        mg_ledger_stream,
        stream_from_directory,
    )

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("v", T.StringType()),
    ])
    src = os.path.join(str(tmp_path), "src"); os.makedirs(src)
    path = os.path.join(str(tmp_path), "mg")
    init_mg_ledger(
        spark.createDataFrame([("a", "x")], "g string, v string"),
        ["g"], "v", path, k=16,
    )
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/{name}")

    def drain():
        stream = stream_from_directory(spark, src + "/*/", schema)
        q = mg_ledger_stream(stream, path, ckpt, available_now=True)
        q.awaitTermination(120)

    write_batch("b1", [("a", "x"), ("b", "z")])
    drain()
    assert _ledger_report(spark, path) == {
        ("a", "x"): (2, 0), ("b", "z"): (1, 0)
    }
    write_batch("b2", [("a", "y")])
    drain()  # same checkpoint: resume, b1 not re-counted
    assert _ledger_report(spark, path) == {
        ("a", "x"): (2, 0), ("a", "y"): (1, 0), ("b", "z"): (1, 0)
    }
