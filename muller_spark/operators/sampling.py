"""Deterministic sampling / dataset splitting for training-data pipelines.

A training corpus needs train/val/test assignment that is (1) stable
across runs, engines, and repartitions — never `rand()`; (2) computable
row-locally with zero shuffle; (3) reproducible from the row's identity
alone so late-arriving rows land in the same split.  We derive the
assignment from a Knuth multiplicative hash of an integer row key —
plain 64-bit arithmetic, so any engine (Spark, DuckDB, a feature store)
reproduces the exact same split, unlike engine-specific hash builtins
(Spark `hash()` and DuckDB `hash()` disagree).

Extension beyond the reference (its closest surface is positional
`sub_ds` partitioning, ``muller/core/dataset/dataset.py:1727``), in the
spirit of SURVEY §7 phase 5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant (2^32 / phi); modulus 2^32 keeps every
# intermediate below 2^63 for keys < 2^31, so the arithmetic never
# overflows bigint in any engine.
_KNUTH = 2654435761
_MOD = 4294967296


def bucket_of(key: Column, n_buckets: int = 10_000, salt: int = 0) -> Column:
    """Deterministic bucket in ``[0, n_buckets)`` from an integer key."""
    return ((key.cast("long") + F.lit(salt)) * F.lit(_KNUTH) % F.lit(_MOD)) % F.lit(
        n_buckets
    )


def deterministic_sample(
    df: DataFrame, key: Column, fraction: float, salt: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — stable under
    re-runs and appends, unlike ``DataFrame.sample`` (seeded per-partition,
    so a repartition reshuffles membership)."""
    cut = int(round(fraction * _MOD))
    h = (key.cast("long") + F.lit(salt)) * F.lit(_KNUTH) % F.lit(_MOD)
    return df.filter(h < F.lit(cut))


def deterministic_split(
    df: DataFrame,
    key: Column,
    weights: "dict[str, float]",
    salt: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split with the given weights.

    Weights are normalized; boundaries are cumulative over insertion
    order of ``weights`` (Python dicts preserve it).  Row-local — no
    shuffle, no driver state; the same (key, salt, weights) always
    yields the same split anywhere.
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = (key.cast("long") + F.lit(salt)) * F.lit(_KNUTH) % F.lit(_MOD)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cut = F.lit(int(round(acc * _MOD)))
        branch = F.when(h < cut, F.lit(name))
        expr = branch if expr is None else expr.when(h < cut, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)
