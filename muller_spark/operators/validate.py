"""Data-quality expectations: declarative constraint checking.

The ingestion-side counterpart of the quality filters — assert what the
data *should* look like (not-null, ranges, membership, format) and get
a violation report instead of silent corruption downstream:

- **validate** — named row-level expectations evaluated in ONE
  aggregate pass over the table (a conditional count per rule inside a
  single partial/final aggregate; the scan is never repeated per rule).
- **duplicate_keys** — uniqueness constraint: key tuples appearing more
  than once, with counts (groupBy + HAVING, one shuffle).
- **validate_or_raise** — gate a pipeline stage on the report.

Row-rule conditions are plain Catalyst Columns, so anything expressible
in a WHERE clause can be an expectation, and the report is reproducible
by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExpectationError(ValueError):
    """Raised by validate_or_raise when expectations fail."""


def validate(df: DataFrame, rules: "dict[str, Column]") -> DataFrame:
    """Evaluate named expectations in one pass.

    ``rules`` maps rule name → Column predicate that should hold for
    every row.  Returns (rule, n_rows, n_violations, violation_frac)
    with one row per rule, ordered by rule name; ``violation_frac`` is
    rounded to 6 dp (engine-exact: integer counts divided once).
    """
    if not rules:
        raise ValueError("validate needs at least one rule")
    names = sorted(rules)
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                F.when(~rules[name] | rules[name].isNull(), 1).otherwise(0)
            ).alias(f"_v_{i}")
            for i, name in enumerate(names)
        ],
    )
    report = F.array(*[
        F.struct(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v_{i}").cast("long").alias("n_violations"),
            F.round(
                F.when(F.col("_n") > 0, F.col(f"_v_{i}") / F.col("_n"))
                .otherwise(F.lit(0.0)), 6,
            ).alias("violation_frac"),
        )
        for i, name in enumerate(names)
    ])
    return (
        agg.select(F.explode(report).alias("r"))
        .select("r.rule", "r.n_rows", "r.n_violations", "r.violation_frac")
    )


def duplicate_keys(df: DataFrame, key_cols: "list[str]") -> DataFrame:
    """Uniqueness expectation: (key..., n_occurrences) for every key
    tuple appearing more than once.  Empty result = constraint holds."""
    if not key_cols:
        raise ValueError("duplicate_keys needs at least one key column")
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 1)
    )


def validate_or_raise(
    df: DataFrame,
    rules: "dict[str, Column]",
    max_violation_frac: float = 0.0,
) -> DataFrame:
    """Run :func:`validate`; raise :class:`ExpectationError` listing
    every rule whose violation fraction exceeds the tolerance, else
    return ``df`` unchanged (pipeline-gate composition)."""
    report = validate(df, rules).collect()
    failed = [
        f"{r['rule']}: {r['n_violations']}/{r['n_rows']}"
        f" ({r['violation_frac']:.4%})"
        for r in report
        if r["violation_frac"] > max_violation_frac
    ]
    if failed:
        raise ExpectationError("expectations failed — " + "; ".join(failed))
    return df
