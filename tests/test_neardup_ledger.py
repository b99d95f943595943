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


# ---------------------------------------------------------------------------
# streaming: neardup_dedup_stream (the ledger_dedup_stream contract over
# the near-dup ledger)
# ---------------------------------------------------------------------------

def _write_batch(spark, src_dir, name, rows):
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src_dir}/{name}")


def test_neardup_stream_dedups_within_and_across_runs(spark, tmp_path):
    """Micro-batches drop near-dups of the ledger, admit novelties,
    and a SECOND stream run (fresh checkpoint, same ledger) rejects
    near-dups of batch-1 survivors — restart durability."""
    import glob as _glob

    import pyspark.sql.types as T

    from muller_spark.streaming.windows import (
        neardup_dedup_stream,
        stream_from_directory,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = str(tmp_path / "src"); os.makedirs(src)
    ledger = str(tmp_path / "ledger")
    out = str(tmp_path / "out")

    seed = "the quick brown fox jumps over the lazy dog near the river bank"
    init_neardup_ledger(
        spark.createDataFrame([(0, seed)], "doc_id long, text string"),
        "text", "doc_id", ledger, bands=32,
    )

    _write_batch(spark, src, "b1", [
        (1, seed + " variant 1"),                      # near-dup of ledger
        (2, "completely novel content about compilers and registers"),
    ])

    def drain(ckpt):
        stream = stream_from_directory(spark, src + "/*/", schema)
        q = neardup_dedup_stream(
            stream, "text", "doc_id", ledger, out, ckpt,
            threshold=0.5, available_now=True,
        )
        q.awaitTermination(120)

    drain(str(tmp_path / "ckpt1"))
    landed = spark.read.parquet(*_glob.glob(out + "/ingest_run=*/ingest_batch=*"))
    assert {r["doc_id"] for r in landed.collect()} == {2}

    # run 2: a near-dup of batch-1's SURVIVOR must now be rejected
    _write_batch(spark, src, "b2", [
        (3, "completely novel content about compilers and registers today"),
        (4, "another wholly different text on sailing across the bay"),
    ])
    drain(str(tmp_path / "ckpt2"))
    landed = spark.read.parquet(*_glob.glob(out + "/ingest_run=*/ingest_batch=*"))
    assert {r["doc_id"] for r in landed.collect()} == {2, 4}


def test_neardup_stream_replay_marker_skip_and_heal(spark, tmp_path):
    """Calling the handler twice with the same batch_id must not
    rewrite the landed output and must re-append ledger state (the
    heal window between land and append)."""
    from muller_spark.streaming.windows import make_neardup_batch_handler

    ledger = str(tmp_path / "ledger")
    out = str(tmp_path / "out")
    init_neardup_ledger(
        spark.createDataFrame([(0, "baseline ledger text content here")],
                              "doc_id long, text string"),
        "text", "doc_id", ledger, bands=32,
    )
    handler = make_neardup_batch_handler(
        "text", "doc_id", ledger, out, run_ns="testns", threshold=0.5
    )
    batch = spark.createDataFrame(
        [(10, "a brand new document about orbital mechanics and fuel")],
        "doc_id long, text string",
    )
    handler(batch, 0)
    landed_dir = f"{out}/ingest_run=testns/ingest_batch=0"
    first_mtime = os.path.getmtime(os.path.join(landed_dir, "_SUCCESS"))
    n_band_rows = spark.read.parquet(
        os.path.join(ledger, "bands")
    ).count()

    handler(batch, 0)  # replay
    assert os.path.getmtime(
        os.path.join(landed_dir, "_SUCCESS")
    ) == first_mtime  # marker skip: output not rewritten
    n_after = spark.read.parquet(os.path.join(ledger, "bands")).count()
    assert n_after > n_band_rows  # heal re-appended (duplicates harmless)

    # and decisions stay correct despite duplicate ledger rows
    out2 = neardup_against_ledger(
        spark.createDataFrame(
            [(11, "a brand new document about orbital mechanics and fuel "
                  "extra"),
             (12, "unrelated musings on typography and kerning today")],
            "doc_id long, text string",
        ),
        "text", "doc_id", ledger, threshold=0.5, update=False,
    )
    assert {r["doc_id"] for r in out2.collect()} == {12}


# ---------------------------------------------------------------------------
# Hamming fingerprint ledger: the media twin (images/audio/video hashes)
# ---------------------------------------------------------------------------

def test_hamming_ledger_batch_decision_matches_bruteforce(spark, tmp_path):
    from muller_spark.operators.dedup import (
        hamming_against_ledger, init_hamming_ledger,
    )

    path = str(tmp_path / "hledger")
    # seed hashes with known structure: 0b...0, one-bit flips, far hashes
    seed = spark.createDataFrame(
        [(1, 0), (2, (1 << 40) | (1 << 3)), (3, -(1 << 62))],
        "id long, dhash long",
    )
    init_hamming_ledger(seed, path, max_hamming=2)
    batch = spark.createDataFrame(
        [
            (10, 1),                    # ham 1 to seed 1 -> dup
            (11, (1 << 40) | (1 << 3) | (1 << 50)),  # ham 1 to seed 2 -> dup
            (12, 0x0F0F0F0F0F0F0F0F),   # far from everything -> survive
            (13, None),                 # undecodable -> dropped
        ],
        "id long, dhash long",
    )
    out = hamming_against_ledger(batch, path, update=False)
    assert {r["id"] for r in out.collect()} == {12}


def test_hamming_ledger_update_accumulates(spark, tmp_path):
    from muller_spark.operators.dedup import (
        hamming_against_ledger, init_hamming_ledger,
    )

    path = str(tmp_path / "hledger")
    init_hamming_ledger(
        spark.createDataFrame([(1, 12345)], "id long, dhash long"),
        path, max_hamming=2,
    )
    b1 = spark.createDataFrame([(10, 777777)], "id long, dhash long")
    assert hamming_against_ledger(b1, path, update=True).count() == 1
    # batch 2: within radius of batch 1's survivor -> rejected
    b2 = spark.createDataFrame(
        [(20, 777776), (21, -999999999)], "id long, dhash long"
    )
    out = hamming_against_ledger(b2, path, update=True)
    assert {r["id"] for r in out.collect()} == {21}


def test_hamming_ledger_end_to_end_with_image_hashes(spark, tmp_path):
    """The composition story: image_dhash output seeds the ledger, a
    later batch containing a noisy re-encode of a seeded image is
    rejected, novel content admitted."""
    import numpy as np

    from muller_spark.multimodal.codecs import encode_png
    from muller_spark.operators.dedup import (
        hamming_against_ledger, image_dhash, init_hamming_ledger,
    )

    rng = np.random.RandomState(77)
    base = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    other = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    noisy = base.copy()
    noisy[::7, ::5] = (noisy[::7, ::5].astype(int) + 12).clip(0, 255)

    seed_df = spark.createDataFrame(
        [(1, bytearray(encode_png(base)))], "img_id long, data binary"
    )
    path = str(tmp_path / "imgledger")
    init_hamming_ledger(
        image_dhash(seed_df, "data", "img_id"), path, max_hamming=6
    )
    batch_df = spark.createDataFrame(
        [(10, bytearray(encode_png(noisy))),
         (11, bytearray(encode_png(other)))],
        "img_id long, data binary",
    )
    out = hamming_against_ledger(
        image_dhash(batch_df, "data", "img_id"), path, update=False
    )
    assert {r["id"] for r in out.collect()} == {11}


def test_hamming_ledger_geometry_sniffed(spark, tmp_path):
    from muller_spark.operators.dedup import (
        hamming_against_ledger, init_hamming_ledger,
    )

    path = str(tmp_path / "hledger")
    init_hamming_ledger(
        spark.createDataFrame([(1, 0)], "id long, dhash long"),
        path, max_hamming=4,
    )
    meta = spark.read.parquet(os.path.join(path, "meta")).first()
    assert (meta["max_hamming"], meta["nbits"]) == (4, 64)
    # hash at ham 5 from the seed: admitted under the LEDGER's radius 4
    batch = spark.createDataFrame([(10, 0b11111)], "id long, dhash long")
    assert hamming_against_ledger(batch, path, update=False).count() == 1


def test_hamming_ledger_validation(spark, tmp_path):
    from muller_spark.operators.dedup import init_hamming_ledger

    with pytest.raises(ValueError, match="max_hamming"):
        init_hamming_ledger(
            spark.createDataFrame([(1, 0)], "id long, dhash long"),
            str(tmp_path / "bad"), max_hamming=64,
        )


# ---------------------------------------------------------------------------
# streaming Hamming ledger: the media twin of neardup_dedup_stream (round 10)
# ---------------------------------------------------------------------------

def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _write_fp_batch(spark, src_dir, name, rows):
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("fp", T.LongType()),
    ])
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src_dir}/{name}")


def test_hamming_stream_dedups_within_and_across_runs(spark, tmp_path):
    """Micro-batches drop fingerprints within the ledger's Hamming
    radius, admit novelties, and a SECOND stream run (fresh
    checkpoint, same ledger) rejects near-dups of run-1 survivors —
    restart durability, mirroring the text stream's contract."""
    import glob as _glob

    import pyspark.sql.types as T

    from muller_spark.operators.dedup import init_hamming_ledger
    from muller_spark.streaming.windows import (
        hamming_dedup_stream,
        stream_from_directory,
    )

    seed = 0
    near_seed = 0b11                     # ham 2 from seed
    novel1 = int("1" * 20, 2)            # ham 20 from seed
    near_novel1 = novel1 ^ 0b101000      # ham 2 from novel1
    novel2 = 0x5555000000000000          # high bits: far from everything
    assert _hamming(seed, near_seed) <= 6
    assert _hamming(seed, novel1) > 6 and _hamming(novel1, novel2) > 6
    assert _hamming(novel1, near_novel1) <= 6
    assert _hamming(seed, novel2) > 6 and _hamming(near_novel1, novel2) > 6

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("fp", T.LongType()),
    ])
    src = str(tmp_path / "src"); os.makedirs(src)
    ledger = str(tmp_path / "hledger")
    out = str(tmp_path / "out")
    init_hamming_ledger(
        spark.createDataFrame([(0, seed)], "id long, dhash long"),
        ledger, max_hamming=6,
    )

    _write_fp_batch(spark, src, "b1", [(1, near_seed), (2, novel1)])

    def drain(ckpt):
        stream = stream_from_directory(spark, src + "/*/", schema)
        q = hamming_dedup_stream(
            stream, "fp", "media_id", ledger, out, ckpt,
            available_now=True,
        )
        q.awaitTermination(120)

    drain(str(tmp_path / "ckpt1"))
    landed = spark.read.parquet(*_glob.glob(out + "/ingest_run=*/ingest_batch=*"))
    assert {r["id"] for r in landed.collect()} == {2}

    # run 2: a near-dup of run-1's SURVIVOR must now be rejected
    _write_fp_batch(spark, src, "b2", [(3, near_novel1), (4, novel2)])
    drain(str(tmp_path / "ckpt2"))
    landed = spark.read.parquet(*_glob.glob(out + "/ingest_run=*/ingest_batch=*"))
    assert {r["id"] for r in landed.collect()} == {2, 4}


def test_hamming_stream_replay_marker_skip_and_heal(spark, tmp_path):
    """Calling the handler twice with the same batch_id must not
    rewrite the landed output and must re-append ledger block state
    (the heal window between land and append), with decisions staying
    correct despite the duplicate posting rows."""
    from muller_spark.operators.dedup import (
        hamming_against_ledger, init_hamming_ledger,
    )
    from muller_spark.streaming.windows import make_hamming_batch_handler

    ledger = str(tmp_path / "hledger")
    out = str(tmp_path / "out")
    init_hamming_ledger(
        spark.createDataFrame([(0, 0)], "id long, dhash long"),
        ledger, max_hamming=6,
    )
    handler = make_hamming_batch_handler(
        "fp", "media_id", ledger, out, run_ns="testns"
    )
    novel = int("1" * 20, 2)
    batch = spark.createDataFrame([(10, novel)], "media_id long, fp long")
    handler(batch, 0)
    landed_dir = f"{out}/ingest_run=testns/ingest_batch=0"
    first_mtime = os.path.getmtime(os.path.join(landed_dir, "_SUCCESS"))
    n_block_rows = spark.read.parquet(os.path.join(ledger, "blocks")).count()

    handler(batch, 0)  # replay
    assert os.path.getmtime(
        os.path.join(landed_dir, "_SUCCESS")
    ) == first_mtime  # marker skip: output not rewritten
    n_after = spark.read.parquet(os.path.join(ledger, "blocks")).count()
    assert n_after > n_block_rows  # heal re-appended (duplicates harmless)

    out2 = hamming_against_ledger(
        spark.createDataFrame(
            [(11, novel ^ 0b1), (12, 0x5555000000000000)],
            "id long, dhash long",
        ),
        ledger, update=False,
    )
    assert {r["id"] for r in out2.collect()} == {12}


def test_hamming_stream_empty_and_null_batches_no_op(spark, tmp_path):
    """A batch of only NULL fingerprints must land nothing and append
    nothing (no marker, no empty ledger churn)."""
    from muller_spark.operators.dedup import init_hamming_ledger
    from muller_spark.streaming.windows import make_hamming_batch_handler

    ledger = str(tmp_path / "hledger")
    out = str(tmp_path / "out")
    init_hamming_ledger(
        spark.createDataFrame([(0, 0)], "id long, dhash long"),
        ledger, max_hamming=6,
    )
    handler = make_hamming_batch_handler(
        "fp", "media_id", ledger, out, run_ns="ns2"
    )
    n0 = spark.read.parquet(os.path.join(ledger, "blocks")).count()
    handler(
        spark.createDataFrame([(1, None)], "media_id long, fp long"), 0
    )
    assert not os.path.exists(f"{out}/ingest_run=ns2/ingest_batch=0")
    assert spark.read.parquet(os.path.join(ledger, "blocks")).count() == n0


# ---------------------------------------------------------------------------
# compaction: distinct-fold + crash-safe swap + recover-on-read
# (round-12 continuation: the docstrings said "compact offline when
# churn accumulates" but only the exact-hash ledger had the function)
# ---------------------------------------------------------------------------

def test_neardup_compact_folds_heal_duplicates(spark, corpus, tmp_path):
    from muller_spark.operators.dedup import compact_neardup_ledger
    from muller_spark.streaming.windows import make_neardup_batch_handler

    path = str(tmp_path / "ledger")
    init_neardup_ledger(
        corpus.filter(F.col("doc_id") % 2 == 0), "text", "doc_id", path,
        bands=32,
    )
    handler = make_neardup_batch_handler(
        "text", "doc_id", path, str(tmp_path / "out"), run_ns="c",
        threshold=0.5,
    )
    batch = spark.createDataFrame(
        [(7001, "a wholly novel passage regarding glacier dynamics")],
        "doc_id long, text string",
    )
    handler(batch, 0)
    handler(batch, 0)  # heal replay duplicates bands + shingles rows
    bands = os.path.join(path, "bands")
    shingles = os.path.join(path, "shingles")
    nb, ns = (spark.read.parquet(bands).count(),
              spark.read.parquet(shingles).count())
    assert nb > spark.read.parquet(bands).distinct().count()
    compact_neardup_ledger(spark, path)
    assert spark.read.parquet(bands).count() < nb
    assert spark.read.parquet(shingles).count() < ns
    # decision unchanged after the fold
    out = neardup_against_ledger(
        spark.createDataFrame(
            [(7003, "a wholly novel passage regarding glacier dynamics too"),
             (7005, "unrelated sentence about tidal harmonics and buoys")],
            "doc_id long, text string",
        ),
        "text", "doc_id", path, threshold=0.5, update=False,
    )
    assert {r["doc_id"] for r in out.collect()} == {7005}


def test_neardup_compact_crash_heals_on_next_read(spark, corpus, tmp_path):
    path = str(tmp_path / "ledger")
    seed = corpus.filter(F.col("doc_id") % 2 == 0)
    batch = corpus.filter(F.col("doc_id") % 2 == 1)
    init_neardup_ledger(seed, "text", "doc_id", path, bands=32)
    bands = os.path.join(path, "bands")
    spark.read.parquet(bands).distinct().write.mode("overwrite").parquet(
        bands + ".compact"
    )
    os.rename(bands, bands + ".old")  # crash between the two renames
    out = neardup_against_ledger(
        batch, "text", "doc_id", path, threshold=0.5, update=False
    )
    got = {r["doc_id"] for r in out.collect()}
    dups = _exact_cross_dups(spark, seed, batch)
    assert got == {r["doc_id"] for r in batch.collect()} - dups
    assert os.path.isdir(bands)
    assert not os.path.isdir(bands + ".old")


def test_hamming_compact_folds_and_heals(spark, tmp_path):
    from muller_spark.operators.dedup import (
        compact_hamming_ledger,
        hamming_against_ledger,
        init_hamming_ledger,
    )
    from muller_spark.streaming.windows import make_hamming_batch_handler

    path = str(tmp_path / "ledger")
    init_hamming_ledger(
        spark.createDataFrame([(0, 0)], "id long, dhash long"), path,
        max_hamming=2, nbits=64,
    )
    handler = make_hamming_batch_handler(
        "dhash", "id", path, str(tmp_path / "out"), run_ns="c"
    )
    batch = spark.createDataFrame([(10, 0x3F)], "id long, dhash long")
    handler(batch, 0)
    handler(batch, 0)  # heal replay duplicates block rows
    blocks = os.path.join(path, "blocks")
    nb = spark.read.parquet(blocks).count()
    assert nb > spark.read.parquet(blocks).distinct().count()
    compact_hamming_ledger(spark, path)
    assert spark.read.parquet(blocks).count() < nb
    # crash-heal: simulate interrupted swap, next read repairs
    spark.read.parquet(blocks).distinct().write.mode("overwrite").parquet(
        blocks + ".compact"
    )
    os.rename(blocks, blocks + ".old")
    out = hamming_against_ledger(
        spark.createDataFrame(
            [(11, 0x3F ^ 1), (12, 0xF000000000)], "id long, dhash long"
        ),
        path, update=False,
    )
    assert {r["id"] for r in out.collect()} == {12}
    assert os.path.isdir(blocks)
