"""Distributed dense row numbering — the pop/merge renumber path.

The naive ``row_number() OVER (ORDER BY key)`` with no PARTITION BY
funnels the ENTIRE table through one task (``Exchange SinglePartition``)
— a scale-killer on the mutation path at 100 TB.  This module numbers
rows with the two-phase parallel prefix sum instead (the same pattern as
``operators/packing`` and ``token_budget_sample``):

1. bucket rows by VALUE RANGE of the position key (``pos DIV span``) —
   deterministic arithmetic, not sampling;
2. one tiny aggregate counts rows per (group, bucket) — driver state is
   bounded by #groups × #buckets longs;
3. the driver prefix-sums the counts in (group, bucket) order and
   broadcasts the offsets back as a literal map;
4. a window PARTITIONED by (group, bucket) finishes the within-bucket
   ``row_number`` — parallel across ~4×cores tasks.

Why not ``repartitionByRange`` + partition offsets: range-partition
boundaries come from SAMPLING whose seed involves the RDD id, so the
count job and the final job can disagree on where a boundary falls and
silently misnumber rows.  Value-range bucketing is deterministic by
construction; integer sums are associative, so the result is
bit-identical to the single-task global window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_row_numbers(
    df: DataFrame,
    key_cols: Sequence[str],
    out_col: str,
    num_buckets: "int | None" = None,
) -> DataFrame:
    """Assign 0-based dense positions ordered by ``key_cols`` (all
    ascending, non-null) without a single-partition exchange.

    The LAST key column must be a non-negative integer UNIQUE within
    each combination of the leading columns (row ids / positions
    satisfy this — uniqueness makes the total order, and thus the
    output, deterministic).  Leading columns must be low-cardinality
    numerics (the driver holds #combos × ``num_buckets`` counts).
    ``out_col`` may shadow one of the key columns — the window sorts on
    the OLD value before the column is replaced."""
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = max(spark.sparkContext.defaultParallelism, 1) * 4
    *coarse, fine = list(key_cols)
    hi = df.agg(F.max(F.col(fine)).alias("hi")).collect()[0]["hi"]
    if hi is None:  # empty input — nothing to number
        return df.withColumn(out_col, F.lit(0).cast("long"))
    span = int(hi) // num_buckets + 1
    b = df.withColumn("_rn_bucket", F.expr(f"`{fine}` DIV {span}"))
    cnt_rows = (
        b.groupBy(*coarse, "_rn_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    ordered = sorted(
        (tuple(r[c] for c in coarse), r["_rn_bucket"], r["cnt"]) for r in cnt_rows
    )
    offsets: dict[str, int] = {}
    acc = 0
    for coarse_vals, bucket, cnt in ordered:
        offsets["|".join(str(v) for v in (*coarse_vals, bucket))] = acc
        acc += cnt
    offset_map = F.create_map(
        *[F.lit(x) for pair in offsets.items() for x in pair]
    )
    map_key = F.concat_ws(
        "|",
        *[F.col(c).cast("string") for c in coarse],
        F.col("_rn_bucket").cast("string"),
    )
    w = Window.partitionBy(*coarse, "_rn_bucket").orderBy(F.col(fine).asc())
    return (
        b.withColumn(
            out_col,
            (offset_map[map_key] + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_rn_bucket")
    )
