"""Deterministic offset/limit pagination.

The reference paginates filter results by slicing the matched-index list,
whose order is row order (reference ``filter_vectorized.py:108-141``).
In Spark, row order is only meaningful under an explicit sort, so
pagination requires an ordering column — ``_row_id`` on managed datasets,
or any caller-supplied key.  ``orderBy(key).offset(o).limit(n)`` lets
Spark push the limit into a TakeOrderedAndProject instead of a full sort
at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paginate(
    df: DataFrame,
    order_col: str = "_row_id",
    offset: int = 0,
    limit: int | None = None,
) -> DataFrame:
    out = df.orderBy(F.col(order_col).asc())
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out
