"""Incremental MinHash near-dup ledger (operators/dedup.py:
init_neardup_ledger / neardup_against_ledger) — the near-dup twin of
the exact-hash ledger: seed once, then every batch pays O(batch)
signatures + candidate-bounded joins instead of a corpus re-LSH.

Parity target: the batch-vs-ledger decision must equal the exact
cross-corpus near-dup relation (Jaccard over portable-hashed shingle
sets ≥ threshold) whenever LSH recall is 1.0 — asserted here against a
brute-force replay, the q_keep_best_lsh discipline."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.dedup import (  # noqa: E402
    _portable_signature_frame,
    init_neardup_ledger,
    neardup_against_ledger,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """Near-dup families spanning the even/odd split + singletons:
    every odd member of a family near-dups its even members, so the
    ledger must reject it; odd singletons must survive."""
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "machine learning models require large curated training corpora",
        "open source database engines optimize analytical query plans",
    ]
    rows = []
    for fam, text in enumerate(base):
        for v in range(6):
            rows.append((fam * 100 + v, text + f" variant {v % 2}"))
    rows += [(901 + 2 * i, f"completely unrelated document {i} topic{i} alpha{i}")
             for i in range(8)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact_cross_dups(spark, seed, batch, threshold=0.5):
    """Brute-force truth: batch ids with ≥1 seed doc at hashed-shingle
    Jaccard ≥ threshold."""
    a = _portable_signature_frame(seed, "text", "doc_id", 64, 3).select(
        F.col("id").alias("sid"), F.col("hs").alias("shs")
    )
    b = _portable_signature_frame(batch, "text", "doc_id", 64, 3).select(
        F.col("id").alias("bid"), F.col("hs").alias("bhs")
    )
    inter = F.size(F.array_intersect("bhs", "shs"))
    union = F.size("bhs") + F.size("shs") - inter
    return {
        r["bid"]
        for r in b.crossJoin(a)
        .filter((inter / union) >= threshold)
        .select("bid").distinct().collect()
    }


def test_batch_decision_matches_exact_cross_relation(spark, corpus, tmp_path):
    path = str(tmp_path / "ledger")
    seed = corpus.filter(F.col("doc_id") % 2 == 0)
    batch = corpus.filter(F.col("doc_id") % 2 == 1)
    init_neardup_ledger(seed, "text", "doc_id", path, bands=32)
    out = neardup_against_ledger(
        batch, "text", "doc_id", path, threshold=0.5, update=False
    )
    got = {r["doc_id"] for r in out.collect()}
    dups = _exact_cross_dups(spark, seed, batch)
    want = {r["doc_id"] for r in batch.collect()} - dups
    assert got == want
    assert dups, "fixture must produce cross-split near-dups"
    # survivors keep their original columns
    assert set(out.columns) == {"doc_id", "text"}


def test_update_makes_next_batch_see_survivors(spark, corpus, tmp_path):
    """A doc admitted in batch 1 must reject its near-dup in batch 2 —
    the whole point of the ledger."""
    path = str(tmp_path / "ledger")
    seed = corpus.filter(F.col("doc_id") < 3)  # family-0 members 0..2
    init_neardup_ledger(seed, "text", "doc_id", path, bands=32)

    b1 = spark.createDataFrame(
        [(500, "a wholly novel sentence about spark physical plans today")],
        "doc_id long, text string",
    )
    out1 = neardup_against_ledger(b1, "text", "doc_id", path, update=True)
    assert {r["doc_id"] for r in out1.collect()} == {500}

    b2 = spark.createDataFrame(
        [(600, "a wholly novel sentence about spark physical plans today"),
         (601, "nothing like anything stored before qqq zzz www")],
        "doc_id long, text string",
    )
    out2 = neardup_against_ledger(b2, "text", "doc_id", path, update=True)
    assert {r["doc_id"] for r in out2.collect()} == {601}

    # and with update=False nothing was ever appended for rejected rows:
    # the bands table holds seed + both admitted survivors only
    ids = {
        r["id"] for r in
        spark.read.parquet(os.path.join(path, "bands")).select("id")
        .distinct().collect()
    }
    assert ids == {0, 1, 2, 500, 601}


def test_dry_run_leaves_ledger_untouched(spark, corpus, tmp_path):
    path = str(tmp_path / "ledger")
    seed = corpus.filter(F.col("doc_id") % 2 == 0)
    init_neardup_ledger(seed, "text", "doc_id", path)
    before = spark.read.parquet(os.path.join(path, "bands")).count()
    batch = corpus.filter(F.col("doc_id") % 2 == 1)
    neardup_against_ledger(
        batch, "text", "doc_id", path, update=False
    ).collect()
    assert spark.read.parquet(os.path.join(path, "bands")).count() == before


def test_family_config_sniffed_from_meta(spark, corpus, tmp_path):
    """Queries must use the ledger's (num_hashes, bands, shingle_size)
    — a caller cannot accidentally band with a different family."""
    path = str(tmp_path / "ledger")
    seed = corpus.filter(F.col("doc_id") % 2 == 0)
    init_neardup_ledger(
        seed, "text", "doc_id", path, num_hashes=32, bands=16, shingle_size=2
    )
    meta = spark.read.parquet(os.path.join(path, "meta")).first()
    assert (meta["num_hashes"], meta["bands"], meta["shingle_size"]) \
        == (32, 16, 2)
    batch = corpus.filter(F.col("doc_id") % 2 == 1)
    # runs clean against the 32/16/2 family (no arg needed or accepted)
    out = neardup_against_ledger(batch, "text", "doc_id", path, update=False)
    assert out.count() > 0


def test_null_text_rows_dropped(spark, corpus, tmp_path):
    path = str(tmp_path / "ledger")
    init_neardup_ledger(
        corpus.filter(F.col("doc_id") % 2 == 0), "text", "doc_id", path
    )
    batch = spark.createDataFrame(
        [(700, None), (701, "genuinely new content entirely xyzzy")],
        "doc_id long, text string",
    )
    out = neardup_against_ledger(batch, "text", "doc_id", path, update=True)
    assert {r["doc_id"] for r in out.collect()} == {701}
    sh = spark.read.parquet(os.path.join(path, "shingles"))
    assert sh.filter(F.col("id") == 700).count() == 0


def test_init_rejects_bad_band_config(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="divisible"):
        init_neardup_ledger(
            corpus, "text", "doc_id", str(tmp_path / "bad"),
            num_hashes=64, bands=24,
        )
