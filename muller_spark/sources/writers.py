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


def to_mindrecord(df: DataFrame, path: str, shard_count: int = 1) -> None:
    """Export to MindSpore MindRecord (reference ``to_mindrecord.py:69``,
    producer/consumer shard writer).  The MindRecord codec lives in the
    ``mindspore`` package, which is optional here: when importable we
    stream Arrow batches into its FileWriter; otherwise this raises with
    a pointer at the parquet/JSON/Arrow exports that cover the same
    surface."""
    try:
        from mindspore.mindrecord import FileWriter  # type: ignore
    except ImportError as exc:  # pragma: no cover - mindspore not in env
        raise NotImplementedError(
            "to_mindrecord requires the optional 'mindspore' package; "
            "use to_parquet / to_json / to_arrow for portable exports"
        ) from exc

    type_map = {"bigint": "int64", "int": "int32", "double": "float64",
                "float": "float32", "string": "string", "binary": "bytes"}
    schema = {}
    for name, dtype in _visible(df).dtypes:
        if dtype not in type_map:
            raise ValueError(f"column {name!r} of type {dtype!r} has no MindRecord mapping")
        schema[name] = {"type": type_map[dtype]}
    writer = FileWriter(file_name=path, shard_num=shard_count, overwrite=True)
    writer.add_schema(schema, "muller_spark export")
    for batch in _visible(df).toArrow().to_batches():
        writer.write_raw_data(batch.to_pylist())
    writer.commit()


def to_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: "str | list[str]",
    num_buckets: int = 32,
    sort_cols: "str | list[str] | None" = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (hive-clustered) table so later equi-joins
    and aggregations on ``bucket_cols`` are co-located: two tables
    bucketed the same way join with **zero Exchange** — the shuffle is
    paid once at write time, not per query.  This is the Spark-native
    answer to "pre-partition the 100 TB fact table by join key".

    Requires a metastore-backed session (`enableHiveSupport` or the
    default in-memory catalog); plain ``path``-based parquet cannot
    carry bucket metadata.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        _visible(df).write.mode(mode)
        .bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    writer.format("parquet").saveAsTable(table_name)
