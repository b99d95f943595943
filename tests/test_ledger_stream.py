"""ledger_dedup_stream: restart-durable streaming dedup against the
persistent hash ledger — survivors are exactly the ledger-unseen
contents, a second run (fresh query, same ledger) admits nothing seen
before, and compact_dedup_ledger heals duplicate hash rows."""

from __future__ import annotations

import pytest

import os
import sys

import pyspark.sql.types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.dedup import (  # noqa: E402
    compact_dedup_ledger,
    init_dedup_ledger,
)
from muller_spark.streaming.windows import (  # noqa: E402
    ledger_dedup_stream,
    stream_from_directory,
)

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])



# round-13 test tiering (VERDICT r12 #6): end-to-end tier, excluded
# from the driver-window default run; run with -m "slow or not slow"
pytestmark = pytest.mark.slow

def _write_batch(spark, src_dir, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{src_dir}/{name}")


def _run_drain(spark, src_glob, ledger, out, ckpt):
    stream = stream_from_directory(spark, src_glob, SCHEMA)
    q = ledger_dedup_stream(
        stream, "text", ledger, out, ckpt,
        keep_by="doc_id", available_now=True,
    )
    q.awaitTermination(120)


def test_ledger_stream_dedups_within_and_across_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    ledger = str(tmp_path / "ledger")
    out = str(tmp_path / "out")
    ckpt1 = str(tmp_path / "ckpt1")
    os.makedirs(src)

    # seed the ledger with one known content
    init_dedup_ledger(
        spark.createDataFrame([(0, "seen before")], SCHEMA), "text", ledger
    )

    # batch 1: one ledger-dup, one intra-batch dup pair, one fresh
    _write_batch(spark, src, "b1", [
        (1, "seen before"),          # dropped: in ledger
        (2, "fresh one"),
        (3, "twin"), (4, "twin"),    # intra-batch: keep_by doc_id -> 3
    ])
    _run_drain(spark, src + "/*", ledger, out, ckpt1)

    got = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }
    assert got == {(2, "fresh one"), (3, "twin")}

    # run 2: FRESH query + checkpoint (simulates a restart after the
    # checkpoint is gone) — only ledger state protects history
    _write_batch(spark, src, "b2", [
        (5, "fresh one"),            # dropped: landed by run 1
        (6, "twin"),                 # dropped: landed by run 1
        (7, "brand new"),
    ])
    ckpt2 = str(tmp_path / "ckpt2")
    _run_drain(spark, src + "/b2", ledger, out, ckpt2)

    got2 = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out).select("doc_id", "text").collect()
    }
    assert got2 == got | {(7, "brand new")}

    # output keeps content_hash so the heal step reads hashes from the
    # landed parquet
    assert "content_hash" in spark.read.parquet(out).columns


def test_compact_ledger_distinct_and_swap(spark, tmp_path):
    ledger = str(tmp_path / "ledger")
    df = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    init_dedup_ledger(df, "text", ledger)
    # simulate crash-replay duplicate appends
    spark.read.parquet(ledger).write.mode("append").parquet(ledger)
    assert spark.read.parquet(ledger).count() == 4
    compact_dedup_ledger(spark, ledger)
    post = spark.read.parquet(ledger)
    assert post.count() == 2
    assert post.columns == ["content_hash"]
    # backup dir is cleaned up
    assert not os.path.exists(ledger + "-pre-compact")


def test_ledger_single_writer_contract_interleaved_jobs(spark, tmp_path):
    """The documented single-writer contract, asserted: two jobs that
    BOTH anti-join before either appends admit shared content twice
    (that is the docstring's stated outcome, not a surprise), while the
    same batches processed serially admit it exactly once."""
    import pyspark.sql.functions as F

    from muller_spark.operators.dedup import (
        dedup_against_ledger,
        normalized_text,
    )

    b1 = spark.createDataFrame([(1, "shared"), (2, "only one")], SCHEMA)
    b2 = spark.createDataFrame([(3, "shared"), (4, "only two")], SCHEMA)

    # interleaved: both jobs read the empty ledger before either appends
    inter = str(tmp_path / "interleaved")
    init_dedup_ledger(spark.createDataFrame([], SCHEMA), "text", inter)
    s1 = dedup_against_ledger(b1, "text", inter, update=False).localCheckpoint()
    s2 = dedup_against_ledger(b2, "text", inter, update=False).localCheckpoint()
    for s in (s1, s2):  # each job's commit point, after both reads
        s.select(
            F.md5(normalized_text(F.col("text"))).alias("content_hash")
        ).write.mode("append").parquet(inter)
    assert s1.count() == 2 and s2.count() == 2  # 'shared' admitted twice
    led = spark.read.parquet(inter)
    assert led.count() == 4 and led.distinct().count() == 3

    # serialized (the contract): second batch sees the first's append
    ser = str(tmp_path / "serial")
    init_dedup_ledger(spark.createDataFrame([], SCHEMA), "text", ser)
    assert dedup_against_ledger(b1, "text", ser).count() == 2
    got2 = {r["doc_id"] for r in dedup_against_ledger(b2, "text", ser).collect()}
    assert got2 == {4}  # 'shared' filtered


def test_replay_marker_skip_and_ledger_heal(spark, tmp_path):
    """Direct crash-replay contract: calling the handler again with the
    same batch_id (1) does not rewrite the landed output even though
    the input changed, and (2) re-appends the landed hashes — healing a
    crash between output land and ledger append."""
    from muller_spark.streaming.windows import make_ledger_batch_handler

    ledger = str(tmp_path / "ledger")
    out = str(tmp_path / "out")
    init_dedup_ledger(
        spark.createDataFrame([], SCHEMA), "text", ledger
    )
    land = make_ledger_batch_handler("text", ledger, out, "testns")

    b0 = spark.createDataFrame([(1, "alpha"), (2, "beta")], SCHEMA)
    land(b0, 0)
    assert spark.read.parquet(out).count() == 2
    assert spark.read.parquet(ledger).count() == 2

    # replay with DIFFERENT content: marker wins, output unchanged,
    # hashes re-appended (duplicates in the ledger are harmless)
    b0_replay = spark.createDataFrame([(9, "gamma")], SCHEMA)
    land(b0_replay, 0)
    got = {r["text"] for r in spark.read.parquet(out).collect()}
    assert got == {"alpha", "beta"}
    assert spark.read.parquet(ledger).count() == 4  # healed append
    assert spark.read.parquet(ledger).distinct().count() == 2

    # compaction restores the minimal ledger
    compact_dedup_ledger(spark, ledger)
    assert spark.read.parquet(ledger).count() == 2


def test_ledger_batch_cost_flat_as_ledger_grows(spark, tmp_path):
    """100 TB ingest story (round-6 item #6): per-micro-batch wall time
    must stay ~flat while the ledger grows 16x — the handler's cost is
    O(batch) + one narrow hash anti-join, never a corpus re-scan.  The
    ledger is grown in-plan (spark.range -> md5) to 16x its seed size
    between two timed 3-batch drives; medians are compared with a
    generous bound since this is a wall-clock smoke, not a benchmark."""
    import time

    from pyspark.sql import functions as F

    from muller_spark.streaming.windows import make_ledger_batch_handler

    ledger = str(tmp_path / "ledger")
    out = str(tmp_path / "out")

    def synth_hashes(lo, hi):
        return spark.range(lo, hi).select(
            F.md5(F.concat(F.lit("ledger-seed-"), F.col("id"))).alias(
                "content_hash"
            )
        )

    base_n = 60_000
    synth_hashes(0, base_n).write.mode("overwrite").parquet(ledger)

    land = make_ledger_batch_handler(
        "text", ledger, out, "scale", keep_by="doc_id"
    )

    def batch(tag, n=200):
        return spark.createDataFrame(
            [(i, f"doc {tag} {i} unique body") for i in range(n)],
            "doc_id long, text string",
        )

    def drive(tags, first_id):
        times = []
        for off, tag in enumerate(tags):
            start = time.perf_counter()
            land(batch(tag), first_id + off)
            times.append(time.perf_counter() - start)
        return sorted(times)[len(times) // 2]

    land(batch("warmup"), 0)  # absorb Python-worker / writer warmup
    base_median = drive(["a1", "a2", "a3"], 1)

    # grow the ledger to 16x in-plan: 15 more base_n chunks of fresh hashes
    synth_hashes(base_n, 16 * base_n).write.mode("append").parquet(ledger)
    big_median = drive(["b1", "b2", "b3"], 10)

    assert big_median < 3.5 * base_median + 0.5, (
        f"per-batch cost grew with ledger size: {base_median:.2f}s -> "
        f"{big_median:.2f}s at 16x ledger"
    )

    # and the batches actually landed + deduped against the big ledger
    landed = spark.read.parquet(out)
    assert landed.filter(F.col("text").contains("b1")).count() == 200
