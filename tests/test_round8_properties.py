"""Property tests for the round-8 operators: quantization error bound
and range hold for arbitrary vectors; kfold partitions completely and
stably; FFD-replayed pack_bins is already covered — here the
cluster-size report's conservation law (n_docs sums to the corpus)
holds for arbitrary pair sets."""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import prop_examples  # noqa: E402

from muller_spark.operators.dedup import cluster_size_report  # noqa: E402
from muller_spark.operators.embedding import (  # noqa: E402
    dequantize_embeddings,
    quantize_embeddings,
)
from muller_spark.operators.sampling import kfold_assign  # noqa: E402

_SLOW = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
    width=32,
)


@settings(max_examples=prop_examples(8), **_SLOW)
@given(
    vecs=st.lists(
        st.lists(_finite, min_size=1, max_size=12), min_size=1, max_size=8
    ),
    bits=st.integers(min_value=2, max_value=12),
)
def test_quantize_error_bound_and_range(spark, vecs, bits):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = quantize_embeddings(df, "embedding", "vec_id", bits=bits)
    out = {r["id"]: r for r in dequantize_embeddings(q).collect()}
    qmax = 2 ** (bits - 1) - 1
    for i, v in rows:
        rec = out[i]
        s = rec["scale"]
        if all(x == 0.0 for x in v):
            assert s == 0.0 and rec["embedding"] == [0.0] * len(v)
            continue
        assert s > 0
        for orig, back, qv in zip(v, rec["embedding"], rec["qvec"]):
            assert abs(qv) <= qmax + 1  # +1: floor(x+0.5) at the exact max
            assert abs(orig - back) <= s / 2 + 1e-9 * max(1.0, abs(orig))


@settings(max_examples=prop_examples(8), **_SLOW)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1, max_size=40, unique=True,
    ),
    k=st.integers(min_value=1, max_value=9),
    salt=st.integers(min_value=0, max_value=1000),
)
def test_kfold_total_and_stable(spark, keys, k, salt):
    df = spark.createDataFrame([(x,) for x in keys], "id long")
    out = {r["id"]: r["fold"]
           for r in kfold_assign(df, F.col("id"), k, salt=salt).collect()}
    assert set(out) == set(keys)                       # total: every row folded
    assert all(0 <= f < k for f in out.values())       # range
    re = {r["id"]: r["fold"] for r in kfold_assign(
        df.repartition(5), F.col("id"), k, salt=salt).collect()}
    assert re == out                                   # partitioning-stable


@settings(max_examples=prop_examples(6), **_SLOW)
@given(
    n_docs=st.integers(min_value=1, max_value=14),
    edges=st.lists(
        st.tuples(st.integers(0, 13), st.integers(0, 13)),
        max_size=15,
    ),
)
def test_cluster_size_report_conserves_docs(spark, n_docs, edges):
    df = spark.createDataFrame([(i,) for i in range(n_docs)], "doc_id long")
    pair_rows = [(min(a, b), max(a, b)) for a, b in edges
                 if a != b and a < n_docs and b < n_docs]
    pairs = spark.createDataFrame(
        pair_rows or [(None, None)], "id_a long, id_b long"
    ).filter(F.col("id_a").isNotNull())
    out = cluster_size_report(df, "doc_id", pairs).collect()
    assert sum(r["n_docs"] for r in out) == n_docs
    for r in out:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
