"""Partition-count hygiene for Python-kernel operators.

Arrow-batched ``mapInPandas`` kernels parallelize per *partition*.  A
small parquet file (one HDFS block) arrives as a single partition, so a
map-only kernel would run on one core of the whole cluster.  At real
scale (100 TB → thousands of input splits) the input is already wide
and no extra shuffle should be paid.

``ensure_parallelism`` encodes exactly that policy: round-robin
repartition only when the plan's partition count is below the cluster's
default parallelism — a cheap shuffle of a provably small input — and a
no-op (zero shuffles) on wide inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the cluster's default parallelism iff its
    current plan yields fewer partitions.  Inspecting the partition count
    converts the plan to an RDD (no job is triggered)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
