"""Export connectors (reference ``muller/core/dataset/export_data/``)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from muller_spark.schema import HIDDEN_COLS


def _visible(df: DataFrame) -> DataFrame:
    return df.drop(*[c for c in HIDDEN_COLS if c in df.columns])


def to_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """(reference ``to_parquet.py:10``)"""
    _visible(df).write.mode(mode).parquet(path)


def to_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Row-per-line JSON export (reference ``to_json.py:44`` writes JSONL
    in parallel — exactly ``df.write.json``)."""
    _visible(df).write.mode(mode).json(path)


def to_arrow(df: DataFrame):
    """Arrow table export (reference ``to_arrow/arrow_dataset.py:28``
    wraps the dataset as a pyarrow Dataset with projection/filter
    pushdown; a Spark DataFrame already *is* that scanner, so export is
    a terminal toArrow())."""
    return _visible(df).toArrow()


def to_numpy(df: DataFrame, tensor: str):
    """Single-column materialization (reference ``to_numpy.py:14``)."""
    import numpy as np

    return np.array([r[0] for r in _visible(df).select(tensor).collect()])
