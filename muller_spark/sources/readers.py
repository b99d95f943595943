"""Ingest connectors (reference ``muller/api/dataset/import_data.py``).

Every reader returns a plain DataFrame; pair with ``Dataset.extend_df``
to land rows in a versioned dataset.  Schema dicts use the reference's
shape ``{column: {"htype": ..., "dtype": ...}}``.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from muller_spark.schema import spark_type_for


def _apply_schema(df: DataFrame, schema: Mapping[str, Mapping] | None) -> DataFrame:
    if not schema:
        return df
    for name, meta in schema.items():
        if name in df.columns:
            target = spark_type_for(meta.get("htype", "generic"), meta.get("dtype"))
            df = df.withColumn(name, F.col(name).cast(target))
    return df.select(*[c for c in schema if c in df.columns])


def from_csv(
    spark: SparkSession,
    path: str,
    schema: Mapping[str, Mapping] | None = None,
    header: bool = True,
    path_columns: Sequence[str] = (),
) -> DataFrame:
    """CSV ingest with per-column htype schema (reference
    ``import_data.py:16``, ``csv_add_data.py:14``).  Columns listed in
    ``path_columns`` contain file paths; their bytes are joined in from a
    binaryFile read (the reference loads them via ``muller.read``)."""
    df = spark.read.option("header", str(header).lower()).option(
        "inferSchema", "true"
    ).csv(path)
    df = _apply_schema(df, schema)
    for col in path_columns:
        paths = [r[0] for r in df.select(col).distinct().collect() if r[0]]
        if not paths:
            continue
        blob = spark.read.format("binaryFile").load(paths)
        blob = blob.select(F.col("path").alias(f"__{col}_path"), F.col("content").alias(f"{col}_bytes"))
        # binaryFile yields file: URIs; compare on suffix
        df = df.join(
            blob,
            F.col(f"__{col}_path").endswith(F.col(col)),
            "left",
        ).drop(f"__{col}_path")
    return df


def from_file(
    spark: SparkSession,
    path: str,
    schema: Mapping[str, Mapping] | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON / JSONL ingest (reference ``import_data.py:57``)."""
    df = spark.read.option("multiLine", str(multiline).lower()).json(path)
    return _apply_schema(df, schema)


def from_dataframes(spark: SparkSession, pdf, schema: Mapping[str, Mapping] | None = None) -> DataFrame:
    """pandas → Spark (reference ``import_data.py:91``)."""
    df = spark.createDataFrame(pdf)
    return _apply_schema(df, schema)


def read_binary_files(spark: SparkSession, path: str | None, pattern: str | None = None) -> DataFrame:
    """Image/audio/video file ingest as (path, length, content) — the
    ``muller.read`` analogue (reference ``api/read.py:21``): bytes stay
    encoded at rest, decode happens in pandas UDFs at use time."""
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    return reader.load(path).select(
        "path", "length", F.col("content")
    )
