"""Scale smoke tests: multiply the sf0.1 tables in-plan (no disk) and
prove the hot operators still complete with sane wall times — the
"would this survive a scale-up" check run as part of the suite.

These bounds are deliberately loose (CI noise), but they catch
complexity regressions: an accidental N² pair explosion, a lost
broadcast, or a kernel that stopped being map-only blows straight
through them.
"""

from __future__ import annotations

import os
import sys
import time

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _multiplied(df, copies: int, id_col: str, spark):
    """copies× the rows with distinct ids, still a single narrow plan."""
    reps = spark.range(copies).withColumnRenamed("id", "_rep")
    return (
        df.crossJoin(F.broadcast(reps))
        .withColumn(id_col, F.col(id_col) * copies + F.col("_rep"))
        .drop("_rep")
    )


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_group_agg_at_6m_rows(spark, lineitem):
    """10× lineitem (6M rows): scan → partial agg → 1 shuffle; partial
    aggregation keeps the shuffle tiny regardless of input size."""
    big = _multiplied(lineitem, 10, "l_orderkey", spark)
    start = time.perf_counter()
    out = (
        big.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    elapsed = time.perf_counter() - start
    assert sum(r["n"] for r in out) == 6_000_000
    assert elapsed < 60, f"6M-row aggregate took {elapsed:.1f}s"


def test_broadcast_join_at_6m_rows(spark, lineitem):
    big = _multiplied(lineitem, 10, "l_orderkey", spark)
    bands = spark.createDataFrame(
        [("A",), ("N",), ("R",)], "l_returnflag string"
    ).withColumn("tag", F.concat(F.lit("t_"), "l_returnflag"))
    start = time.perf_counter()
    n = big.join(F.broadcast(bands), "l_returnflag").count()
    elapsed = time.perf_counter() - start
    assert n == 6_000_000
    assert elapsed < 60, f"6M-row broadcast join took {elapsed:.1f}s"


def test_minhash_pipeline_at_20k_docs(spark, documents):
    """4× documents (20k docs): the MinHash-LSH pipeline must stay
    near-linear — signatures are map-only, the only shuffles are the
    band join + dedup.  Exact duplicates (the 4 copies of each doc)
    must all surface as pairs without an N² blow-up."""
    from muller_spark.operators.dedup import minhash_lsh_pairs

    big = _multiplied(documents.select("doc_id", "text"), 4, "doc_id", spark)
    start = time.perf_counter()
    pairs = minhash_lsh_pairs(
        big, "text", "doc_id", num_hashes=32, bands=8, threshold=0.9
    )
    n_pairs = pairs.count()
    elapsed = time.perf_counter() - start
    # each of the 5k originals has 4 identical copies → ≥ C(4,2)=6 pairs each
    assert n_pairs >= 5000 * 6
    assert elapsed < 120, f"20k-doc minhash pipeline took {elapsed:.1f}s"


def test_exact_knn_at_40k_vectors(spark):
    from muller_spark.index.vector import exact_knn

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    big = _multiplied(emb, 20, "vec_id", spark)  # 40k vectors
    q = [r["embedding"] for r in emb.limit(2).collect()]
    start = time.perf_counter()
    out = exact_knn(big, "embedding", "vec_id", q, k=10, metric="cosine").collect()
    elapsed = time.perf_counter() - start
    assert len(out) == 20
    assert elapsed < 60, f"40k-vector exact knn took {elapsed:.1f}s"


def test_semantic_dedup_at_50k_vectors(spark):
    """50k × 64-d SemDeDup: assignment is map-only, the pair scan is
    cluster-keyed and tile-bounded — cells of ~800 rows each stay far
    from the quadratic ceiling, and the whole pass finishes in seconds.
    A lost cluster shuffle or an all-pairs regression blows the bound."""
    import numpy as np

    from muller_spark.operators.dedup import semantic_dedup

    n = 50_000
    base = (
        spark.range(n)
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: F.sin(F.col("id") * i * 0.7),
            ),
        )
        .withColumnRenamed("id", "vec_id")
    )
    start = time.perf_counter()
    survivors = semantic_dedup(
        base, "embedding", "vec_id", threshold=0.999, num_clusters=64
    ).count()
    elapsed = time.perf_counter() - start
    assert 0 < survivors <= n
    assert elapsed < 90, f"50k semantic dedup took {elapsed:.1f}s"


def test_pipeline_survival_at_6m_rows(spark, lineitem):
    """Cascade survival at 6M rows is ONE aggregate pass — adding
    stages adds sums, not scans."""
    from muller_spark.operators.quality import pipeline_survival

    big = _multiplied(lineitem, 10, "l_orderkey", spark)
    start = time.perf_counter()
    out = pipeline_survival(big, [
        ("qty", F.col("l_quantity") >= 10),
        ("price", F.col("l_extendedprice") >= 1000),
        ("disc", F.col("l_discount") <= 0.05),
    ]).collect()
    elapsed = time.perf_counter() - start
    assert out[0]["survivors"] + out[0]["dropped_here"] == 6_000_000
    assert elapsed < 45, f"6M-row cascade took {elapsed:.1f}s"


def test_top_ngrams_at_20k_docs(spark, documents):
    """4× documents (20k docs): tokenize-once + explode + hash agg +
    post-agg window.  The O(tokens²) lambda regression this guards
    against took 26 s at 5k docs — 20k docs would be minutes."""
    from muller_spark.operators.text import top_ngrams

    big = _multiplied(documents, 4, "doc_id", spark)
    start = time.perf_counter()
    out = top_ngrams(big, "text", n=2, k=5).collect()
    elapsed = time.perf_counter() - start
    assert len(out) > 0
    assert elapsed < 45, f"20k-doc top_ngrams took {elapsed:.1f}s"


def test_token_budget_dominant_domain_at_100k_docs(spark, documents):
    """20× documents (100k docs) squeezed into ONE domain — the exact
    shape that killed the old per-domain window (the dominant domain IS
    the corpus).  The two-phase prefix sum spreads it over hash-range
    buckets, so this completes in seconds; a regression to the
    single-task window would crawl through 100k rows in one task."""
    from muller_spark.operators.sampling import token_budget_sample

    big = _multiplied(
        documents.select("doc_id", "text"), 20, "doc_id", spark
    ).withColumn("dom", F.lit("web"))
    start = time.perf_counter()
    kept = token_budget_sample(
        big, "text", "dom", F.col("doc_id"), {"web": 2_000_000}
    )
    n = kept.count()
    elapsed = time.perf_counter() - start
    assert 0 < n < 100_000
    assert elapsed < 90, f"100k-doc token budget took {elapsed:.1f}s"


def test_logreg_train_at_1m_rows(spark):
    """IRLS at 1M rows: 8 passes over cached feature blocks, d×d
    partials through treeAggregate — driver traffic is KBs."""
    from muller_spark.operators.classifier import score_logreg, train_logreg

    base = (
        spark.range(1_000_000)
        .withColumn("f0", F.sin(F.col("id") * 0.01))
        .withColumn("f1", F.cos(F.col("id") * 0.003))
        .withColumn("f2", (F.col("id") % 97).cast("double") / 97.0)
        .withColumn(
            "label",
            ((F.col("f0") + F.col("f1") * 0.5 - F.col("f2")) > 0).cast("double"),
        )
    )
    start = time.perf_counter()
    w = train_logreg(base, ["f0", "f1", "f2"], "label")
    elapsed = time.perf_counter() - start
    scored = score_logreg(base.limit(2000), ["f0", "f1", "f2"], w)
    pred = scored.select(
        "label", (F.col("quality_prob") >= 0.5).cast("double").alias("p")
    ).collect()
    acc = sum(1 for r in pred if r["label"] == r["p"]) / len(pred)
    assert acc >= 0.9
    assert elapsed < 90, f"1M-row IRLS took {elapsed:.1f}s"
