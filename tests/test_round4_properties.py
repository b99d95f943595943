"""Property tests for the round-4 operators: cascade survival is
monotone non-increasing and drop-accounting exact; top-fraction sizes
are sum-of-ceils; the SemDeDup dominance rule is anti-join-consistent
with its own pair list for arbitrary thresholds."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import prop_examples  # noqa: E402

from muller_spark.operators.quality import pipeline_survival  # noqa: E402
from muller_spark.operators.sampling import top_fraction_per_group  # noqa: E402

_SLOW = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@settings(max_examples=prop_examples(8), **_SLOW)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 100)),
        min_size=0, max_size=40,
    ),
    cuts=st.lists(st.integers(0, 100), min_size=1, max_size=4),
)
def test_pipeline_survival_monotone_and_accounted(spark, rows, cuts):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "id long, a int, b int"
    )
    stages = [(f"s{j}", F.col("a") >= c) for j, c in enumerate(cuts)]
    out = pipeline_survival(df, stages).collect()
    n0 = len(rows)
    prev = n0
    for r in out:
        # survivors never increase stage-to-stage, drops account exactly
        assert 0 <= r["survivors"] <= prev
        assert r["dropped_here"] == prev - r["survivors"]
        prev = r["survivors"]
    # last stage equals a direct AND-fold count
    expect_last = sum(1 for a, _ in rows if all(a >= c for c in cuts))
    assert out[-1]["survivors"] == expect_last


@settings(max_examples=prop_examples(8), **_SLOW)
@given(
    sizes=st.lists(st.integers(1, 25), min_size=1, max_size=5),
    frac=st.floats(0.05, 1.0),
)
@example(sizes=[20], frac=0.05000000000000001)  # ulp above 0.05: raw ceil=2, contract=1
@example(sizes=[25], frac=0.28)  # 25*0.28 = 7.000000000000001 in doubles
def test_top_fraction_sizes_are_sum_of_ceils(spark, sizes, frac):
    rows, rid = [], 0
    for g, n in enumerate(sizes):
        for _ in range(n):
            rows.append((rid, f"g{g}", float(rid % 7)))
            rid += 1
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    out = top_fraction_per_group(df, "grp", "score", frac, tie_break="id")
    got = out.groupBy("grp").count().collect()
    counts = {r["grp"]: r["count"] for r in got}
    for g, n in enumerate(sizes):
        # the operator's documented contract: ceil(round(n*frac, 9)) —
        # round9-before-ceil absorbs double noise a hair above the exact
        # product (operators/sampling.py top_fraction_per_group)
        assert counts[f"g{g}"] == math.ceil(round(n * frac, 9))


@settings(max_examples=prop_examples(6), **_SLOW)
@given(
    seed=st.integers(0, 2**31 - 1),
    thr=st.floats(0.2, 0.9),
    k=st.integers(1, 4),
)
def test_semantic_dedup_dominance_consistency(spark, seed, thr, k):
    from muller_spark.operators.dedup import (
        assign_clusters,
        semantic_dedup,
        semantic_dup_pairs,
        train_semantic_centroids,
    )

    rng = np.random.RandomState(seed)
    mat = rng.randn(60, 8)
    # plant a few duplicates so thresholds bite
    mat[10] = mat[3] + 0.01 * rng.randn(8)
    mat[20] = mat[5]
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_semantic_centroids(df, "embedding", num_clusters=k, seed=seed)
    pairs = semantic_dup_pairs(
        df, "embedding", "vec_id", threshold=thr, centroids=cents
    ).collect()
    surv = {
        r["vec_id"]
        for r in semantic_dedup(
            df, "embedding", "vec_id", threshold=thr, centroids=cents
        ).collect()
    }
    dropped = {r["id_b"] for r in pairs}
    assert surv == set(range(len(mat))) - dropped
    # pairs are intra-cluster by construction
    assign = {
        r["id"]: r["cluster"]
        for r in assign_clusters(df, "embedding", "vec_id", cents).collect()
    }
    for r in pairs:
        assert assign[r["id_a"]] == assign[r["id_b"]] == r["cluster"]
