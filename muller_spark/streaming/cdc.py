"""Streaming CDC: maintain a keyed parquet snapshot from a changelog
stream.

Each micro-batch is folded into the snapshot by the SAME
``operators/cdc.apply_changelog`` the batch path uses (one shared
function — the round-6 ledger/batch drift lesson), so last-write-wins,
delete-on-tie, and idempotent-replay semantics can never diverge
between a backfill and the live stream.

Snapshot storage is versioned copy-on-write:

- ``<snapshot_path>/version=<n>/`` (zero-padded, MONOTONIC across
  runs — micro-batch ids restart at 0 per fresh checkpoint, so batch
  ids cannot order versions) plus Spark's ``_SUCCESS`` marker.
  Readers (:func:`read_cdc_snapshot`) pick the highest marked version,
  so a crash mid-write is invisible (no marker).
- ``<snapshot_path>/_applied/<ns>-<batch_id>`` records each folded
  batch (``ns`` = checkpoint-dir hash); a foreachBatch REPLAY of a
  recorded batch is a no-op.  A crash in the window between the
  version landing and its applied-record landing makes the replay fold
  once more — producing an extra version with IDENTICAL content,
  because ``apply_changelog`` replay is value-idempotent (tested) —
  never wrong data.

At scale each fold is one changelog-sized window + one anti-join over
the snapshot — O(snapshot scan + batch) per trigger; the snapshot is
never windowed.  Old versions are retained for time travel; prune with
:func:`prune_cdc_versions` once downstream readers have moved on.

Ordering contract: ``seq_col`` orders changes WITHIN a batch; across
batches, fold order wins (the snapshot retains values, not per-key
sequence numbers or delete tombstones, so replaying a stale changelog
over a newer snapshot can resurrect rows).  Deliver batches in
sequence order — file streams do (modification-time order), and any
log-backed source with ordered offsets does too.
"""

from __future__ import annotations

import hashlib
import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_RE = re.compile(r"version=(\d+)$")


def _fs(spark: SparkSession, path: str):
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jvm_path.getFileSystem(spark._jsc.hadoopConfiguration()), jvm_path


def _list_versions(spark: SparkSession, snapshot_path: str) -> "list[tuple[int, str]]":
    """Marked (version, dir) pairs, ascending."""
    fs, root = _fs(spark, snapshot_path)
    if not fs.exists(root):
        return []
    out = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        m = _VERSION_RE.match(name)
        if not m:
            continue
        marker = spark._jvm.org.apache.hadoop.fs.Path(
            status.getPath(), "_SUCCESS"
        )
        if fs.exists(marker):
            out.append((int(m.group(1)), str(status.getPath())))
    return sorted(out)


def read_cdc_snapshot(spark: SparkSession, snapshot_path: str) -> "DataFrame | None":
    """The latest complete snapshot version, or None before the first
    fold."""
    versions = _list_versions(spark, snapshot_path)
    if not versions:
        return None
    return spark.read.parquet(versions[-1][1])


def prune_cdc_versions(
    spark: SparkSession, snapshot_path: str, keep: int = 2
) -> "list[str]":
    """Delete all but the newest ``keep`` versions (>= 2 so the
    in-flight replay window — the latest batch — always has its
    predecessor on disk).  Returns deleted paths."""
    if keep < 2:
        raise ValueError("keep must be >= 2: the latest batch's replay "
                         "reads its predecessor version")
    versions = _list_versions(spark, snapshot_path)
    doomed = versions[:-keep] if len(versions) > keep else []
    fs, _ = _fs(spark, snapshot_path)
    for _, path in doomed:
        fs.delete(spark._jvm.org.apache.hadoop.fs.Path(path), True)
    return [p for _, p in doomed]


def make_cdc_batch_handler(
    snapshot_path: str,
    keys: Sequence[str],
    seq_col: str,
    run_ns: str,
    op_col: str = "op",
):
    """The foreachBatch handler behind :func:`cdc_apply_stream`,
    exposed so replay idempotence is directly testable: calling the
    handler twice with the same ``batch_id`` must not produce a second
    fold (the applied-record short-circuits)."""
    from muller_spark.operators.cdc import apply_changelog

    keys = list(keys)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        root = snapshot_path.rstrip("/")
        fs, applied = _fs(spark, f"{root}/_applied/{run_ns}-{batch_id}")
        if fs.exists(applied):
            return  # replay of a completed fold
        current = read_cdc_snapshot(spark, root)
        data_cols = [
            c for c in batch_df.columns if c not in (op_col, seq_col)
        ]
        if current is None:
            current = spark.createDataFrame(
                [], batch_df.select(*data_cols).schema
            )
        folded = apply_changelog(
            current, batch_df, keys, seq_col, op_col=op_col
        )
        versions = _list_versions(spark, root)
        next_n = versions[-1][0] + 1 if versions else 0
        folded.write.mode("overwrite").parquet(f"{root}/version={next_n:08d}")
        fs.create(applied, True).close()  # record AFTER the fold lands

    return land


def cdc_apply_stream(
    changes: DataFrame,
    snapshot_path: str,
    keys: Sequence[str],
    seq_col: str,
    checkpoint_dir: str,
    op_col: str = "op",
    trigger_seconds: int = 5,
    available_now: bool = False,
):
    """Start a streaming query folding the changelog ``changes`` stream
    into the versioned snapshot at ``snapshot_path``.  foreachBatch
    serializes folds, satisfying the snapshot's single-writer contract;
    ``available_now=True`` drains available input then stops (backfill
    trigger)."""
    run_ns = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:10]
    land = make_cdc_batch_handler(
        snapshot_path, keys, seq_col, run_ns, op_col=op_col
    )
    writer = changes.writeStream.foreachBatch(land).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
