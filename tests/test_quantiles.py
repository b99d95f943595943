"""MRL quantile sketch: exact-regime parity, compaction-regime rank
error bounds, merge bounds, and determinism (the properties the
module's docstring promises)."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from muller_spark.operators.quantiles import (
    _MRL,
    quantile_report,
    quantile_sketch,
    quantile_values,
)

PHIS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def _exact_lower_quantile(values, phi):
    s = sorted(values)
    return s[max(1, math.ceil(phi * len(s))) - 1]


def _rank_error(values, phi, got):
    """|rank(got) - phi*n| as a fraction of n, using the closest rank
    any duplicate of `got` occupies."""
    s = sorted(values)
    n = len(s)
    target = max(1, math.ceil(phi * n))
    lo = np.searchsorted(s, got, side="left") + 1
    hi = np.searchsorted(s, got, side="right")
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target)) / n


# ---------------------------------------------------------------- _MRL unit


def test_exact_regime_is_exact():
    rng = random.Random(11)
    vals = [rng.uniform(-50, 50) for _ in range(200)]
    sk = _MRL(256)
    sk.add(np.array(vals))
    assert sk.total_weight() == 200
    for phi, got in sk.quantiles(PHIS):
        assert got == _exact_lower_quantile(vals, phi)


@pytest.mark.parametrize("k,n,bound", [(64, 20000, 0.10), (256, 20000, 0.03)])
def test_compaction_rank_error_bound(k, n, bound):
    rng = random.Random(13)
    vals = [rng.gauss(0, 1) for _ in range(n)]
    sk = _MRL(k)
    for i in range(0, n, 777):  # uneven batches exercise compaction paths
        sk.add(np.array(vals[i:i + 777]))
    assert sk.total_weight() == n
    stored = sum(v.size for v in sk.levels)
    assert stored <= k * (math.log2(n / k) + 3)  # bounded summary
    for phi, got in sk.quantiles(PHIS):
        assert _rank_error(vals, phi, got) <= bound, phi


def test_merge_preserves_bound_and_weight():
    rng = random.Random(17)
    a = [rng.uniform(0, 1000) for _ in range(8000)]
    b = [rng.uniform(500, 1500) for _ in range(12000)]
    sa, sb = _MRL(128), _MRL(128)
    sa.add(np.array(a))
    sb.add(np.array(b))
    sa.merge(sb)
    assert sa.total_weight() == 20000
    for phi, got in sa.quantiles(PHIS):
        assert _rank_error(a + b, phi, got) <= 0.06, phi


def test_determinism():
    vals = np.array([math.sin(i) * 100 for i in range(5000)])
    s1, s2 = _MRL(64), _MRL(64)
    s1.add(vals)
    s2.add(vals)
    assert list(s1.rows()) == list(s2.rows())


def test_nan_and_empty():
    sk = _MRL(32)
    sk.add(np.array([np.nan, np.nan]))
    assert sk.total_weight() == 0
    assert sk.quantiles([0.5]) == []


def test_small_k_rejected():
    with pytest.raises(ValueError, match="k must be"):
        _MRL(4)


# ------------------------------------------------------------- Spark level


def test_spark_exact_regime_per_group(spark):
    rng = random.Random(23)
    rows = [
        (f"g{i % 5}", float(rng.randrange(1000))) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["q"]): r["value"]
        for r in quantile_report(
            df, "v", [0.5, 0.9], group_cols=["g"], k=512
        ).collect()
    }
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        for phi in (0.5, 0.9):
            assert got[(g, phi)] == _exact_lower_quantile(vals, phi)


def test_spark_global_sketch_compaction_bound(spark):
    rng = random.Random(29)
    vals = [rng.gauss(100, 15) for _ in range(30000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(8)
    sk = quantile_sketch(df, "v", k=128)
    n_rows = sk.count()
    assert n_rows <= 128 * (math.log2(30000 / 128) + 4)
    got = {
        r["q"]: r["value"]
        for r in quantile_values(sk, [0.1, 0.5, 0.99]).collect()
    }
    for phi, val in got.items():
        assert _rank_error(vals, phi, val) <= 0.05, phi


def test_spark_nulls_dropped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("a", 2.0)], "g string, v double"
    )
    got = quantile_report(df, "v", [1.0], group_cols=["g"], k=64).collect()
    assert got[0]["value"] == 3.0


def test_quantile_values_rejects_bad_phi(spark):
    df = spark.createDataFrame([(0, 1.0)], "level int, value double")
    with pytest.raises(ValueError, match="quantiles must be"):
        quantile_values(df, [0.0])


# ---------------------------------------------------------------- ledger


def test_quantile_ledger_split_equals_oneshot_exact_regime(spark, tmp_path):
    import os

    from muller_spark.operators.quantiles import (
        compact_quantile_ledger,
        init_quantile_ledger,
        quantile_ledger_ingest,
        quantile_ledger_report,
    )

    rng = random.Random(67)
    rows = [
        (f"g{i % 4}", float(rng.randrange(100000))) for i in range(700)
    ]
    path = os.path.join(str(tmp_path), "qledger")
    init_quantile_ledger(
        spark.createDataFrame(rows[:200], "g string, v double"),
        ["g"], "v", path, k=1024,
    )
    for a, b in ((200, 450), (450, 700)):
        quantile_ledger_ingest(
            spark.createDataFrame(rows[a:b], "g string, v double"), path
        )
    got = {
        (r["g"], r["q"]): r["value"]
        for r in quantile_ledger_report(spark, path, [0.5, 0.9]).collect()
    }
    by_g: dict = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        for phi in (0.5, 0.9):
            assert got[(g, phi)] == _exact_lower_quantile(vals, phi), (g, phi)

    # compaction: exact regime (no compaction fired at k=1024) keeps
    # the report bit-identical, and the log folds to ≤ 700 rows total
    compact_quantile_ledger(spark, path)
    n = spark.read.parquet(os.path.join(path, "sketches")).count()
    assert n <= 700
    got2 = {
        (r["g"], r["q"]): r["value"]
        for r in quantile_ledger_report(spark, path, [0.5, 0.9]).collect()
    }
    assert got2 == got


def test_quantile_ledger_compaction_regime_bound(spark, tmp_path):
    import os

    from muller_spark.operators.quantiles import (
        init_quantile_ledger,
        quantile_ledger_ingest,
        quantile_ledger_report,
    )

    rng = random.Random(71)
    vals = [rng.gauss(0, 100) for _ in range(12000)]
    path = os.path.join(str(tmp_path), "qledger")
    init_quantile_ledger(
        spark.createDataFrame([("a", v) for v in vals[:4000]],
                              "g string, v double"),
        ["g"], "v", path, k=128,
    )
    for a, b in ((4000, 8000), (8000, 12000)):
        quantile_ledger_ingest(
            spark.createDataFrame([("a", v) for v in vals[a:b]],
                                  "g string, v double"),
            path,
        )
    got = {
        r["q"]: r["value"]
        for r in quantile_ledger_report(spark, path, [0.25, 0.5, 0.9]).collect()
    }
    for phi, val in got.items():
        assert _rank_error(vals, phi, val) <= 0.06, phi


def test_quantile_ledger_stream_exactly_once(spark, tmp_path):
    """Streaming ingest lands marker-guarded sketch subdirs; a replayed
    batch_id is a no-op (no double-weighting), and the report equals
    the exact quantiles in the exact regime."""
    import os

    from muller_spark.operators.quantiles import (
        init_quantile_ledger,
        quantile_ledger_report,
    )
    from muller_spark.streaming.windows import (
        make_quantile_ledger_batch_handler,
    )

    path = os.path.join(str(tmp_path), "qledger")
    init_quantile_ledger(
        spark.createDataFrame([("a", 1.0), ("a", 9.0)], "g string, v double"),
        ["g"], "v", path, k=256,
    )
    handler = make_quantile_ledger_batch_handler(path, run_ns="testns")
    batch = spark.createDataFrame(
        [("a", 5.0), ("b", 2.0)], "g string, v double"
    )
    handler(batch, 0)
    expect = {("a", 0.5): 5.0, ("a", 1.0): 9.0, ("b", 0.5): 2.0,
              ("b", 1.0): 2.0}
    got = {
        (r["g"], r["q"]): r["value"]
        for r in quantile_ledger_report(spark, path, [0.5, 1.0]).collect()
    }
    assert got == expect
    handler(batch, 0)  # crash-replay: marker skip, no double-weight
    got2 = {
        (r["g"], r["q"]): r["value"]
        for r in quantile_ledger_report(spark, path, [0.5, 1.0]).collect()
    }
    assert got2 == expect
    assert os.path.exists(os.path.join(
        path, "sketches", "ingest_run=testns", "ingest_batch=0", "_SUCCESS"
    ))
    # stopped-stream-then-compact hazard (r10 ADVICE): compaction drops
    # the batch subdir markers, so a restart replaying batch 0 must
    # ride the compaction-surviving landed manifest instead
    from muller_spark.operators.quantiles import compact_quantile_ledger

    compact_quantile_ledger(spark, path)
    handler(batch, 0)
    got3 = {
        (r["g"], r["q"]): r["value"]
        for r in quantile_ledger_report(spark, path, [0.5, 1.0]).collect()
    }
    assert got3 == expect


def test_quantile_ledger_stream_end_to_end(spark, tmp_path):
    import os

    import pyspark.sql.types as T

    from muller_spark.operators.quantiles import (
        init_quantile_ledger,
        quantile_ledger_report,
    )
    from muller_spark.streaming.windows import (
        quantile_ledger_stream,
        stream_from_directory,
    )

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    src = os.path.join(str(tmp_path), "src"); os.makedirs(src)
    path = os.path.join(str(tmp_path), "qledger")
    init_quantile_ledger(
        spark.createDataFrame([("a", 10.0)], "g string, v double"),
        ["g"], "v", path, k=256,
    )
    spark.createDataFrame(
        [("a", 30.0), ("a", 20.0)], schema
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/b1")
    q = quantile_ledger_stream(
        stream_from_directory(spark, src + "/*/", schema),
        path, os.path.join(str(tmp_path), "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    got = {
        r["q"]: r["value"]
        for r in quantile_ledger_report(spark, path, [0.5, 1.0])
        .where("g = 'a'").collect()
    }
    assert got == {0.5: 20.0, 1.0: 30.0}


# ---------------------------------------------------------------------------
# over-capacity golden (round 11, VERDICT r10 #7): the registered sketch
# oracles run in the exact regime, so this pins the COMPACTION path — a
# numpy MRL replay over the same partition layout must reproduce the
# distributed sketch bit-for-bit, and the answers must satisfy the MRL
# rank-error bound vs exact numpy quantiles
# ---------------------------------------------------------------------------

def _q_compacted_values(i):
    import numpy as np

    ids = np.arange(*i, dtype=np.int64)
    return ((ids * 2654435761) % 1000003) / 997.0


def test_quantile_compacted_golden_replay(spark):
    import numpy as np

    import __spark_entry__ as entrymod
    from muller_spark.operators.quantiles import _MRL, quantile_sketch

    from pyspark.sql import functions as F

    n, parts, k = 100_000, 32, 64
    # the distributed sketch over the q_quantile_compacted input (NB:
    # F.lit(997.0) is a DOUBLE; the SQL literal 997.0 would be DECIMAL
    # and silently round the values)
    df = spark.range(n, numPartitions=parts).select(
        F.lit(1).alias("g"),
        ((F.col("id") * F.lit(2654435761)) % F.lit(1000003)
         / F.lit(997.0)).alias("v"),
    )
    got = sorted(
        (r["level"], r["value"])
        for r in quantile_sketch(df, "v", group_cols=["g"], k=k).collect()
    )

    # numpy replay: one _MRL per contiguous range partition (3125 rows
    # = one Arrow batch), merged exactly as merge_group does
    partials = []
    for p in range(parts):
        lo = n * p // parts
        hi = n * (p + 1) // parts
        sk = _MRL(k)
        sk.add(_q_compacted_values((lo, hi)))
        partials.append(sk)
    merged = _MRL(k)
    by_level: dict = {}
    for sk in partials:
        for lv, v in sk.rows():
            by_level.setdefault(lv, []).append(v)
    for lv in sorted(by_level):
        merged.add_level(lv, np.asarray(by_level[lv]))
    want = sorted(merged.rows())
    assert len(got) == len(want)
    for (gl, gv), (wl, wv) in zip(got, want):
        assert gl == wl and gv == wv  # bit-identical sketch

    # compaction fired for real: weights above level 0 dominate
    assert any(lv > 5 for lv, _ in got)

    # rank-error bound vs exact quantiles on the query's outputs
    vals = np.sort(_q_compacted_values((0, n)))
    out = {
        r["q"]: r["value"]
        for r in entrymod.q_quantile_compacted(spark, "").collect()
    }
    assert set(out) == {0.01, 0.25, 0.5, 0.75, 0.9, 0.99}
    for phi, v in out.items():
        rank = np.searchsorted(vals, v, side="right") / n
        assert abs(rank - phi) <= 0.05, (phi, v, rank)
