"""Sequence packing (operators/packing.py): two-phase prefix sum equals
the single-task window bit-for-bit, plan stays bucket-parallel, chunk
assignment matches a driver-side reference."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.packing import global_cumsum, pack_concat_chunks  # noqa: E402


def _corpus(spark, n=5000, seed=0):
    rng = np.random.RandomState(seed)
    rows = [(int(i), int(t)) for i, t in enumerate(rng.randint(0, 900, size=n))]
    return spark.createDataFrame(rows, "id long, tokens long")


def test_cumsum_matches_single_task_window(spark):
    df = _corpus(spark)
    got = {
        r["id"]: r["cum_excl"]
        for r in global_cumsum(df, "id", "tokens").collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["id"]: r["want"]
        for r in df.withColumn(
            "want", F.coalesce(F.sum("tokens").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_cumsum_plan_is_bucket_parallel(spark):
    """The window must partition by the range bucket — a global ORDER BY
    window (SinglePartition exchange feeding a Window node) is the
    one-task shape this operator exists to avoid."""
    df = _corpus(spark, n=2000)
    out = global_cumsum(df, "id", "tokens")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__pk_bucket" in plan, plan[:2000]
    window_at = plan.find("Window ")
    single_at = plan.find("Exchange SinglePartition")
    assert single_at == -1 or single_at < window_at or window_at == -1, plan[:3000]


def test_cumsum_handles_degenerate_distributions(spark):
    # constant order column values are impossible (unique id), but a
    # tiny corpus collapses every quantile to one boundary
    df = spark.createDataFrame([(1, 10), (2, 0), (3, 5)], "id long, tokens long")
    got = {r["id"]: r["cum_excl"] for r in global_cumsum(df, "id", "tokens").collect()}
    assert got == {1: 0, 2: 10, 3: 10}


def test_pack_concat_chunks_reference(spark):
    df = spark.createDataFrame(
        [(0, 100), (1, 400), (2, 0), (3, 600), (4, 24)],
        "id long, tokens long",
    )
    rows = {
        r["id"]: r
        for r in pack_concat_chunks(df, "id", "tokens", seq_len=512).collect()
    }
    # stream: doc0 [0,100), doc1 [100,500), doc2 at 500 (empty),
    # doc3 [500,1100), doc4 [1100,1124)
    assert rows[0]["start_pos"] == 0 and rows[0]["chunk_start"] == 0
    assert rows[0]["chunk_end"] == 0
    assert rows[1]["chunk_start"] == 0 and rows[1]["chunk_end"] == 0
    assert rows[2]["n_tokens"] == 0 and rows[2]["chunk_end"] == rows[2]["chunk_start"]
    assert rows[3]["start_pos"] == 500
    assert rows[3]["chunk_start"] == 0 and rows[3]["chunk_end"] == 2
    assert rows[3]["offset_in_chunk"] == 500
    assert rows[4]["start_pos"] == 1100 and rows[4]["chunk_start"] == 2
    assert rows[4]["chunk_end"] == 2


def test_pack_rejects_bad_seq_len(spark):
    df = _corpus(spark, n=10)
    with pytest.raises(ValueError):
        pack_concat_chunks(df, "id", "tokens", seq_len=0)


def test_cumsum_property_random_corpora(spark):
    """Randomized sizes/buckets: the two-phase result must equal a
    pandas exclusive cumsum exactly, including empty-bucket layouts and
    token counts of zero."""
    import numpy as np

    rng = np.random.RandomState(7)
    for trial in range(4):
        n = int(rng.randint(1, 800))
        ids = rng.choice(10_000, size=n, replace=False)
        toks = rng.randint(0, 50, size=n)
        toks[rng.rand(n) < 0.2] = 0
        df = spark.createDataFrame(
            [(int(i), int(t)) for i, t in zip(ids, toks)], "id long, tokens long"
        )
        buckets = int(rng.choice([1, 2, 7, 64]))
        got = {
            r["id"]: r["cum_excl"]
            for r in global_cumsum(df, "id", "tokens", num_buckets=buckets).collect()
        }
        order = np.argsort(ids)
        run = 0
        for idx in order:
            assert got[int(ids[idx])] == run, (trial, buckets)
            run += int(toks[idx])


def test_mixture_sample_flattens_distribution(spark):
    """90/10 two-domain corpus sampled to equal weights within a 40%
    budget: the dominant domain downsamples toward the target share,
    the rare one keeps everything; membership is deterministic."""
    from muller_spark.operators.sampling import mixture_sample
    from pyspark.sql import functions as F

    rows = [(i, "big" if i % 10 else "small") for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, dom string")
    budget = 0.4 * 20000
    out = mixture_sample(df, F.col("id"), "dom", budget)
    counts = {r["dom"]: r["n"] for r in
              out.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
    # small domain: rate = min(1, 4000/2000) = 1 -> all 2000 kept
    assert counts["small"] == 2000
    # big domain: rate = 4000/18000 ~ 0.222 -> ~4000 of 18000
    assert abs(counts["big"] - 4000) < 300
    again = mixture_sample(df, F.col("id"), "dom", budget)
    assert {r["id"] for r in out.collect()} == {r["id"] for r in again.collect()}


def test_mixture_sample_documented_drop_rules(spark):
    """The two documented drops, asserted: NULL-domain rows never
    survive (no domain -> no budget share), and with an explicit
    weights dict an observed-but-unlisted domain gets weight 0 — while
    weights=None keeps every observed domain."""
    from muller_spark.operators.sampling import mixture_sample
    from pyspark.sql import functions as F

    rows = [(i, "listed") for i in range(100)]
    rows += [(200 + i, "unlisted") for i in range(100)]
    rows += [(400 + i, None) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, dom string")

    explicit = mixture_sample(
        df, F.col("id"), "dom", budget=1000, weights={"listed": 1.0}
    )
    doms = {r["dom"] for r in explicit.select("dom").distinct().collect()}
    assert doms == {"listed"}  # unlisted + NULL both dropped

    default = mixture_sample(df, F.col("id"), "dom", budget=1000)
    doms2 = {r["dom"] for r in default.select("dom").distinct().collect()}
    assert doms2 == {"listed", "unlisted"}  # NULL still dropped


def test_mixture_sample_temperature_null_and_zero_sizes(spark):
    """ADVICE r5: the temperature path must tolerate domains whose
    size_col sum is NULL (all-NULL sizes) or 0 — previously a NULL sum
    raised TypeError on the += fold, and at temperature=0 a zero-size
    domain got weight 0**0 == 1, diluting every real domain's share."""
    from muller_spark.operators.sampling import mixture_sample
    from pyspark.sql import functions as F

    rows = [(i, "real", 10) for i in range(100)]
    rows += [(200, "nullsz", None), (201, "nullsz", None)]
    rows += [(300, "zerosz", 0)]
    df = spark.createDataFrame(rows, "id long, dom string, toks int")

    # temperature=0 flattens to uniform over domains WITH size; the two
    # degenerate domains must not absorb budget share
    out = mixture_sample(
        df, F.col("id"), "dom", budget=2000,
        size_col="toks", temperature=0.0,
    )
    counts = {r["dom"]: r["n"] for r in
              out.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
    # real: w=1.0 (only sized domain), rate=min(1, 2000*1.0/1000)=1
    assert counts.get("real") == 100
    assert "nullsz" not in counts and "zerosz" not in counts

    # all-degenerate corpus: empty result, not a crash
    deg = spark.createDataFrame(
        [(1, "a", None), (2, "b", 0)], "id long, dom string, toks int"
    )
    assert mixture_sample(
        deg, F.col("id"), "dom", budget=10, size_col="toks", temperature=0.5
    ).count() == 0


def test_top_fraction_ceil_not_inflated_by_double_rounding(spark):
    """25 rows at fraction 0.28: 25*0.28 = 7.000000000000001 in IEEE
    doubles — a raw ceil kept 8 rows; the contract is ceil(7.0) = 7."""
    from muller_spark.operators.sampling import top_fraction_per_group
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("g", i, float(i)) for i in range(25)], "g string, id long, score double"
    )
    out = top_fraction_per_group(df, "g", "score", 0.28, tie_break="id")
    assert out.count() == 7


def test_global_cumsum_all_null_bucket(spark):
    """A bucket whose value sum is NULL (all-NULL values) must not
    TypeError the driver prefix loop; NULL values contribute nothing."""
    from muller_spark.operators.packing import global_cumsum
    from pyspark.sql import functions as F

    rows = [(i, 10 if i < 50 else None) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, v int")
    out = global_cumsum(df, "k", F.col("v"), num_buckets=4)
    got = {r["k"]: r["cum_excl"] for r in out.collect()}
    assert got[0] == 0 and got[50] == 500 and got[99] == 500


def test_pack_bins_matches_python_ffd_and_capacity(spark):
    from muller_spark.operators.packing import pack_bins
    from muller_spark.operators.sampling import bucket_of
    import pyspark.sql.functions as F

    rows = [(i, (i * 37) % 900 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = pack_bins(df, "doc_id", "n", max_len=1024, num_buckets=4).collect()
    got = {r["id"]: (r["bucket"], r["bin_id"]) for r in out}
    assert len(got) == 500

    # per-bin capacity never exceeded
    fill = {}
    for r in out:
        assert r["bin_id"] != -1
        fill[r["bin_id"]] = fill.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(v <= 1024 for v in fill.values())

    # exact python FFD replay per bucket
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", bucket_of(F.col("doc_id"), 4).cast("int").alias("b")
        ).collect()
    }
    toks = dict(rows)
    for b in set(buckets.values()):
        members = sorted(
            (i for i in toks if buckets[i] == b),
            key=lambda i: (-toks[i], i),
        )
        caps, assign = [], {}
        for i in members:
            for j, cap in enumerate(caps):
                if cap >= toks[i]:
                    caps[j] = cap - toks[i]
                    assign[i] = j
                    break
            else:
                caps.append(1024 - toks[i])
                assign[i] = len(caps) - 1
        for i in members:
            assert got[i] == (b, (b << 32) | assign[i])


def test_pack_bins_oversize_and_zero(spark):
    from muller_spark.operators.packing import pack_bins

    df = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 0), (4, None)],
        "doc_id long, n long",
    )
    got = {r["id"]: r for r in
           pack_bins(df, "doc_id", "n", max_len=1024, num_buckets=2).collect()}
    assert got[1]["bin_id"] == -1          # oversize flagged, not truncated
    assert got[3]["n_tokens"] == 0 and got[3]["bin_id"] != -1
    assert got[4]["n_tokens"] == 0         # NULL counts pack as 0


def test_pack_bins_deterministic_across_partitioning(spark):
    from muller_spark.operators.packing import pack_bins

    rows = [(i, (i * 13) % 300 + 1) for i in range(200)]
    a = spark.createDataFrame(rows, "doc_id long, n long").repartition(1)
    b = spark.createDataFrame(rows, "doc_id long, n long").repartition(17)
    ra = sorted(map(tuple, pack_bins(a, "doc_id", "n", 512, num_buckets=3).collect()))
    rb = sorted(map(tuple, pack_bins(b, "doc_id", "n", 512, num_buckets=3).collect()))
    assert ra == rb


def test_pack_bins_beats_one_doc_per_bin(spark):
    from muller_spark.operators.packing import pack_bins

    df = spark.createDataFrame(
        [(i, 100) for i in range(100)], "doc_id long, n long"
    )
    out = pack_bins(df, "doc_id", "n", max_len=1000, num_buckets=2)
    n_bins = out.select("bin_id").distinct().count()
    assert n_bins <= 12  # 100 docs x 100 tok into 1000-cap bins: ~10 per bucket pair
