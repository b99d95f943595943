"""Mergeable heavy-hitters summaries (Misra–Gries, deterministic).

The CMS top-k report (``operators/aggregate.cms_frequency_report``)
answers frequency queries probabilistically — overestimates possible,
collision-dependent.  Misra–Gries is its deterministic complement, the
other classic mergeable-summary primitive (Agarwal, Cormode, Huang,
Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012): a k-counter
summary where

- every item with true frequency > N/(k+1) is GUARANTEED present;
- estimates never overcount: ``est ≤ true ≤ est + err_bound``, with
  ``err_bound`` = the summary's total decrement (≤ N/(k+1)), carried
  in the output so downstream consumers see the uncertainty;
- merging two summaries (combine counts, subtract the (k+1)-th largest
  count, keep positives) preserves both properties — the theorem that
  makes the two-level distributed build below correct.

Below capacity (≤ k distinct items per group, no decrement fires) the
summary IS the exact frequency table with ``err_bound`` 0 — the regime
the sf0.01 driver oracle value-checks; the over-capacity guarantees
are pinned by property tests (tests/test_heavyhitters.py).

Build shape (the 100 TB shape, same as ``quantiles.quantile_sketch``):
a ``mapInPandas`` pass holds one bounded k-counter summary per group
seen in its partition and emits only summary rows, so the single
shuffle moves ≤ groups × (k+1) rows; an ``applyInPandas`` merge folds
the partials per group.  No stage holds a full group.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# sentinel item for the per-partial error row (parquet-safe: a real
# item can never be NULL because nulls are dropped before counting)
_ERR_ITEM = None


class _MG:
    """Deterministic Misra–Gries k-counter summary (executor-side)."""

    __slots__ = ("k", "counts", "err")

    def __init__(self, k: int):
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.k = k
        self.counts: dict[str, int] = {}
        self.err = 0

    def add_counts(self, new: "dict[str, int]") -> None:
        c = self.counts
        for item, n in new.items():
            c[item] = c.get(item, 0) + int(n)
        if len(c) > self.k:
            # subtract the (k+1)-th largest count, keep positives —
            # the mergeable-summaries combine step (deterministic:
            # ties broken by count value only, items never compared)
            d = sorted(c.values(), reverse=True)[self.k]
            self.counts = {i: n - d for i, n in c.items() if n > d}
            self.err += d

    def merge_rows(self, items, counts, errs) -> None:
        """Fold partial rows (sentinel err rows carry item=None)."""
        new: dict[str, int] = {}
        for item, n, e in zip(items, counts, errs):
            if item is None:
                self.err += int(e)
            else:
                new[item] = new.get(item, 0) + int(n)
        self.add_counts(new)

    def rows(self) -> "list[tuple[str | None, int, int]]":
        out: list[tuple[str | None, int, int]] = [
            (i, n, 0) for i, n in self.counts.items()
        ]
        out.append((_ERR_ITEM, 0, self.err))
        return out


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Deterministic heavy hitters per group: ``(*group_cols, item
    string, est_count long, err_bound long)``.

    ``est_count`` never overcounts; the true frequency lies in
    ``[est_count, est_count + err_bound]`` and every item with
    frequency > N/(k+1) is present (N = the group's non-null rows).
    ``err_bound`` is the same for every item in a group — it is the
    summary's total decrement, reported per row for self-contained
    consumption.  NULL values are dropped (they are not an item).
    With ≤ k distinct items per group the output is the exact
    frequency table and ``err_bound`` is 0.
    """
    gcols = list(group_cols)
    src_fields = [df.schema[c] for c in gcols]
    part_schema = StructType(
        src_fields
        + [
            StructField("item", StringType(), True),
            StructField("cnt", LongType(), False),
            StructField("err", LongType(), False),
        ]
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summaries: dict[tuple, _MG] = {}
        for pdf in batches:
            vals = pdf[value_col].astype("string")
            if gcols:
                for key, sub in pdf.assign(_v=vals).groupby(
                    gcols, dropna=False, sort=False
                ):
                    key = key if isinstance(key, tuple) else (key,)
                    vc = sub["_v"].dropna().value_counts()
                    summaries.setdefault(tuple(key), _MG(k)).add_counts(
                        {str(i): int(n) for i, n in vc.items()}
                    )
            else:
                vc = vals.dropna().value_counts()
                summaries.setdefault((), _MG(k)).add_counts(
                    {str(i): int(n) for i, n in vc.items()}
                )
        for key, mg in summaries.items():
            rows = mg.rows()
            out = pd.DataFrame(rows, columns=["item", "cnt", "err"])
            for i, c in enumerate(gcols):
                out.insert(i, c, key[i])
            yield out

    partials = df.select(*gcols, value_col).mapInPandas(partial, part_schema)
    merge_keys = gcols if gcols else ["_g"]
    if not gcols:
        partials = partials.withColumn("_g", F.lit(0))

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mg = _MG(k)
        items = [None if pd.isna(i) else str(i) for i in pdf["item"]]
        mg.merge_rows(items, pdf["cnt"], pdf["err"])
        err = mg.err
        out = pd.DataFrame(
            sorted(mg.counts.items()), columns=["item", "est_count"]
        )
        out["err_bound"] = err
        for i, c in enumerate(gcols):
            out.insert(i, c, pdf[c].iloc[0])
        return out

    out_schema = StructType(
        src_fields
        + [
            StructField("item", StringType(), False),
            StructField("est_count", LongType(), False),
            StructField("err_bound", LongType(), False),
        ]
    )
    return (
        partials.groupBy(*merge_keys)
        .applyInPandas(merge_group, out_schema)
        .select(*gcols, "item", "est_count", "err_bound")
    )
