"""Multi-key Z-order clustering for parquet data skipping.

``Dataset.optimize_layout`` range-clusters on the key prefix, which
makes file/row-group min-max stats selective for the FIRST key only —
a filter on the second key alone still scans everything.  Z-ordering
interleaves the bits of per-column quantile ranks so every clustered
column gets partial locality: each file covers a small hyper-rectangle
of the key space, and a predicate on ANY clustered column prunes most
files (the lakehouse ``OPTIMIZE ... ZORDER BY`` mechanism).

Scale shape, per step:

1. one ``approxQuantile`` pass computes ≤ ``buckets``-1 boundaries per
   column (driver state is a few KB — bounded regardless of SF);
2. a map-only expression ranks each value against its boundary list
   (a flat sum of comparisons, whole-stage codegen, no UDF) and
   interleaves the rank bits into a single z-value column;
3. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` — one range
   exchange, exactly what single-key clustering already pays.

Quantile ranks (not linear min-max buckets) make the curve
skew-resistant: a hot key range still spreads over many buckets.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = (
    "int",
    "bigint",
    "smallint",
    "tinyint",
    "float",
    "double",
    "decimal",
    "date",
    "timestamp",
)


def _rankable(df: DataFrame, col: str) -> Column:
    """Cast a clusterable column to double for quantile ranking."""
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise ValueError(f"unknown column {col!r}")
    if not dtype.startswith(_NUMERIC_PREFIXES):
        raise ValueError(
            f"zorder supports numeric/date/timestamp columns; {col!r} is "
            f"{dtype} (cluster strings via a derived numeric key, e.g. a "
            f"prefix hash column)"
        )
    c = F.col(col)
    if dtype.startswith(("date", "timestamp")):
        c = c.cast("timestamp").cast("double")
    return c.cast("double")


def zvalue_column(
    df: DataFrame, cols: Sequence[str], buckets: int = 64
) -> Column:
    """Build the interleaved-bit z-value expression for ``cols``.

    ``buckets`` must be a power of two (rank width in bits =
    log2(buckets)); NULLs rank below everything (bucket 0) so they
    cluster together at the curve origin.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use range clustering "
                         "for a single key)")
    bits = (buckets - 1).bit_length()
    if buckets != 1 << bits:
        raise ValueError(f"buckets must be a power of two, got {buckets}")

    # Quantile boundaries per column: one lightweight sample-based job,
    # driver receives (buckets-1) doubles per column.
    exprs = [_rankable(df, c) for c in cols]
    probe = df.select(*[e.alias(f"_z{i}") for i, e in enumerate(exprs)])
    qs = [i / buckets for i in range(1, buckets)]
    bounds = probe.approxQuantile(
        [f"_z{i}" for i in range(len(cols))], qs, 0.001
    )

    ranks: list[Column] = []
    for expr, bnds in zip(exprs, bounds):
        # rank = number of boundaries <= value: a FLAT sum of integer
        # comparisons (codegen-friendly; no nested-when depth limits).
        # Deduplicate boundaries so constant columns rank to 0.
        uniq = sorted(set(bnds))
        rank = F.lit(0)
        for b in uniq:
            rank = rank + F.when(expr >= F.lit(b), F.lit(1)).otherwise(
                F.lit(0)
            )
        ranks.append(
            F.when(expr.isNull(), F.lit(0)).otherwise(
                F.least(rank, F.lit(buckets - 1))
            )
        )

    # Interleave: output bit (i*ncols + j) takes bit i of column j's
    # rank — the standard Morton curve.
    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, rank in enumerate(ranks):
            bit = F.shiftright(rank.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder(
    df: DataFrame,
    cols: Sequence[str],
    target_partitions: int | None = None,
    buckets: int = 64,
) -> DataFrame:
    """Return ``df`` re-laid-out along the Z-curve of ``cols`` — write
    the result to parquet and min-max stats prune on every clustered
    column.  Row content is unchanged (pure reorder)."""
    z = zvalue_column(df, cols, buckets)
    # collision-proof temp name: a user column literally named "_zorder"
    # (e.g. from a previous layout experiment written to parquet) must
    # survive the reorder, not be overwritten and dropped
    zcol = "_zorder"
    while zcol in df.columns:
        zcol += "_"
    with_z = df.withColumn(zcol, z)
    if target_partitions:
        with_z = with_z.repartitionByRange(int(target_partitions), zcol)
    else:
        with_z = with_z.repartitionByRange(zcol)
    return with_z.sortWithinPartitions(zcol).drop(zcol)


def skew_report(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """Join/groupBy-key skew diagnostics: the top-``k`` heaviest key
    values with exact count, share of all rows, and cumulative share —
    the report that decides whether a planned shuffle key needs
    salting, AQE skew-join, or a broadcast rewrite before the job runs
    at corpus scale.

    Returns (rank, key, cnt, share, cum_share), rank 1 = heaviest;
    ties break on the key value so the report is deterministic.  NULL
    keys count as a real group (rendered as the string 'NULL') — a
    NULL-heavy foreign key is precisely the skew one most needs to see.
    (A string key whose literal value is 'NULL' merges with that group
    in the REPORT rendering only — counts are still exact per row.)

    Scale shape: ONE hash aggregate on the key (map-side partial
    combine does the heavy lifting — per-partition output is bounded
    by the partition's distinct keys), then TakeOrderedAndProject for
    the global top-k; the share denominator is a 1-row scalar count
    broadcast into the k-row result, and the cumulative window runs
    over k rows only.  Nothing but the top-k rows ever reaches one
    task."""
    from pyspark.sql import Window

    key = F.when(F.col(key_col).isNull(), F.lit("NULL")).otherwise(
        F.col(key_col).cast("string")
    )
    counts = (
        df.select(key.alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = df.select(F.count(F.lit(1)).alias("_total"))
    topk = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    return (
        topk.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
            F.round(
                F.sum("cnt").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.col("_total"),
                6,
            ).alias("cum_share"),
        )
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic training-export shuffle: a reproducible global
    permutation of the corpus into ``num_shards`` shards with a
    position inside each shard — what an epoch-shuffled dataloader
    consumes, computed WITHOUT a global sort.

    Each row's salted portable hash (md5 family, so the permutation is
    engine- and run-independent) drives both the shard assignment
    (``hash mod num_shards`` — near-uniform shard sizes regardless of
    id distribution) and the within-shard order; changing ``seed``
    yields an independent permutation for the next epoch.  Returns the
    input columns plus (shard, pos).

    Scale shape: one map-only hash projection + one hash-partition
    exchange on ``shard``; the per-shard position is a row_number over
    the shard partition, so each shard serializes through one task —
    size ``num_shards`` so a shard matches the intended OUTPUT FILE
    size (the write is one task per file regardless), e.g. 100 TB /
    256 MB ⇒ ~400k shards, each a sub-second task.  Ties on the hash
    break on the id so duplicate-id inputs still order
    deterministically."""
    from muller_spark.operators.dedup import portable_hash60
    from pyspark.sql import Window

    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    taken = [c for c in ("shard", "pos") if c in df.columns]
    if taken:
        raise ValueError(
            f"shuffle_shards outputs columns {taken} which already exist "
            f"in the input — rename them first (silently overwriting "
            f"user data would violate the all-columns-kept contract)"
        )
    # a NULL id has no deterministic place in the permutation (the hash
    # and the tie-break both die) — fail the job at execution time with
    # a row-level guard rather than silently emitting a NULL shard
    ids = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(f"shuffle_shards: NULL value in id column {id_col!r}")
        ).cast("string"),
    ).otherwise(F.col(id_col).cast("string"))
    h = portable_hash60(F.concat(F.lit(f"{seed}|"), ids))
    hcol = "__h"
    while hcol in df.columns:
        hcol += "_"
    w = Window.partitionBy("shard").orderBy(
        F.col(hcol).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn(hcol, h)
        .withColumn("shard", F.pmod(F.col(hcol), F.lit(num_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop(hcol)
    )
