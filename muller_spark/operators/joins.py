"""Join extensions Spark lacks natively: as-of join and range join.

The reference has no relational joins at all (SURVEY §2.7); these are
the join shapes a time-series / training-data pipeline needs, built to
scale:

- **asof_join** — "latest right row at or before the left timestamp, per
  key".  Implemented with the union + windowed last-value-fill pattern:
  one shuffle on the key, no per-row range probe, no skew-prone
  inequality join.  (An inequality-condition join would be O(n·m) per
  key; this is O((n+m) log) via sort within key partitions.)
- **range_join** — left rows matched to [lo, hi) band dimensions via a
  broadcast inequality join: the band table is tiny, so Spark turns it
  into BroadcastNestedLoopJoin with no shuffle of the fact side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def maybe_broadcast(
    df: DataFrame,
    bound: "int | None" = None,
    max_broadcast_rows: int = 4_000_000,
) -> DataFrame:
    """Size-gated broadcast hint.  An explicit ``F.broadcast`` is
    honored REGARDLESS of the relation's actual size — on a cluster a
    hint on a data-dependent frame (e.g. the docs containing a frequent
    query term over a 100 TB corpus) forces an unbounded broadcast and
    kills the job.  This helper hints ONLY when the caller can prove a
    row bound (``bound`` — e.g. a ``LIMIT k`` result, a fixed dimension
    table, ``len(query_terms)``); otherwise it returns the frame
    unhinted and AQE picks broadcast-vs-shuffle from the relation's
    RUNTIME size, which degrades gracefully at any scale.

    ``bound`` is a statically known upper bound on rows, not a measured
    count — passing one never triggers a job."""
    if bound is not None and bound <= max_broadcast_rows:
        return F.broadcast(df)
    return df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[on] <= left[on]`` (inclusive), matching ``by`` keys.

    Returns all left columns plus ``<right_col><suffix>`` columns
    (null when no prior right row exists).
    """
    by = list(by)
    right_cols = [c for c in (right_cols or right.columns) if c not in by and c != on]

    r = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    l = left.select(
        *left.columns, F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(r.dtypes)[f"{c}{suffix}"]).alias(f"{c}{suffix}")
          for c in right_cols],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps → inclusive <=
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u
    for c in right_cols:
        filled = filled.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        )
    return filled.filter(F.col("_side") == 1).drop("_side").select(
        *left.columns, *[f"{c}{suffix}" for c in right_cols]
    )


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to [lo, hi) bands; the band side broadcasts."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the left (skewed) side gets a random
    salt in [0, num_salts); the right side is exploded ``num_salts``×
    with every salt value; the join key becomes (key, salt), so one hot
    key spreads over ``num_salts`` shuffle partitions instead of one
    straggler task.

    Use when a handful of keys dominate (AQE's skew-join handles
    *partition*-level skew after the fact; salting fixes *key*-level
    skew up front, and works for aggregations-after-join too).  The
    right side is replicated — intended for moderate-size right tables
    where broadcast is too big but replication ``num_salts``× is fine.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salt = (F.rand(seed=42) * num_salts).cast("int")
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = l_salted.join(r_salted, [on, "_salt"], how)
    return out.drop("_salt")
