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
