"""Ingest connectors (reference ``muller/api/dataset/import_data.py``).

Every reader returns a plain DataFrame; pair with ``Dataset.extend_df``
to land rows in a versioned dataset.  Schema dicts use the reference's
shape ``{column: {"htype": ..., "dtype": ...}}``.
"""

from __future__ import annotations

import os
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from muller_spark.schema import spark_type_for

# Path-column ingest loads blobs per parent DIRECTORY, so the only
# driver-side materialization is the distinct dirname set — bounded by
# this cap (a media corpus has few directories; a corpus with one dir
# per file should be ingested with read_binary_files + an explicit join
# instead).
_MAX_PATH_DIRS = 1024


def _apply_schema(df: DataFrame, schema: Mapping[str, Mapping] | None) -> DataFrame:
    if not schema:
        return df
    for name, meta in schema.items():
        if name in df.columns:
            target = spark_type_for(meta.get("htype", "generic"), meta.get("dtype"))
            df = df.withColumn(name, F.col(name).cast(target))
    return df.select(*[c for c in schema if c in df.columns])


def _abs_path_key(col: Column, cwd: str) -> Column:
    """Normalize a path string column to an absolute-path join key:
    strip any ``file:`` scheme and ``./`` prefix, absolutize relative
    paths against the driver cwd (the same base the old per-path
    ``binaryFile.load`` resolved against)."""
    p = F.regexp_replace(col, "^file:(//)?", "")
    p = F.regexp_replace(p, "^\\./", "")
    return F.when(p.startswith("/"), p).otherwise(
        F.concat(F.lit(cwd.rstrip("/") + "/"), p)
    )


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
    binaryFile read (the reference loads them via ``muller.read``).

    Scale shape: the blob side is loaded per parent *directory* (the
    only driver materialization is the distinct dirname set, capped at
    ``_MAX_PATH_DIRS``) and attached with a hash equi-join on the
    normalized absolute path — never a per-row path collect, never a
    non-equi (nested-loop) join.

    Note the trade: binaryFile loads **every file in each referenced
    directory**, not just the referenced ones — a CSV pointing at a few
    files inside a directory that also holds large unrelated blobs
    scans (and shuffles) all of them before the left join discards the
    extras.  Keep blob directories dedicated to the referenced files,
    or pre-load with ``read_binary_files`` +
    ``pathGlobFilter``/explicit paths and join manually."""
    df = spark.read.option("header", str(header).lower()).option(
        "inferSchema", "true"
    ).csv(path)
    df = _apply_schema(df, schema)
    cwd = os.getcwd()
    for col in path_columns:
        key = _abs_path_key(F.col(col), cwd)
        dirname = F.regexp_extract(key, "^(.*)/[^/]*$", 1)
        dir_rows = (
            df.filter(F.col(col).isNotNull())
            .select(dirname.alias("d")).distinct()
            .limit(_MAX_PATH_DIRS + 1).collect()
        )
        dirs = sorted(r["d"] for r in dir_rows if r["d"])
        if not dirs:
            continue
        if len(dirs) > _MAX_PATH_DIRS:
            raise ValueError(
                f"path column {col!r} spans more than {_MAX_PATH_DIRS} "
                "directories; load the blobs with read_binary_files and "
                "join explicitly instead"
            )
        blob = spark.read.format("binaryFile").load(dirs).select(
            _abs_path_key(F.col("path"), cwd).alias(f"__{col}_key"),
            F.col("content").alias(f"{col}_bytes"),
        )
        df = df.join(
            blob, key == F.col(f"__{col}_key"), "left"
        ).drop(f"__{col}_key")
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


def from_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
) -> "tuple[DataFrame, DataFrame]":
    """Fault-tolerant JSONL ingest: returns ``(good, quarantine)``.

    Real feeds at corpus scale always carry a sliver of malformed
    lines (truncated writes, encoding corruption, schema drift); a
    default PERMISSIVE read silently NULL-fills them and a FAILFAST
    read kills the whole job for one bad byte.  This splits instead:
    ``good`` carries rows that parsed against ``schema_ddl`` in full;
    ``quarantine`` carries (raw_line, file) for every line that did
    not — replayable after the producer is fixed, countable for feed
    health monitoring, and never silently dropped.

    Mechanics: the file lands as raw TEXT lines (so the original bytes
    of a bad line are never lost), each line parsed by ``from_json``
    in PERMISSIVE mode with ``columnNameOfCorruptRecord`` declared in
    the schema — a malformed line yields its raw text in that column
    and NULLs elsewhere.  (Parsing a string COLUMN sidesteps Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction on raw-file scans.)
    The split is two filters over the same lazy scan; whitespace-only
    lines are dropped to match JSONL reader semantics.  The corrupt
    column name dodges user columns."""
    from pyspark.sql.types import StringType, StructField, StructType

    base = StructType.fromDDL(schema_ddl)
    corrupt = "_corrupt_record"
    while corrupt in base.names:
        corrupt += "_"
    full = StructType(
        list(base.fields) + [StructField(corrupt, StringType(), True)]
    )
    raw = (
        spark.read.text(path)
        .select(
            F.col("value").alias("raw_line"),
            F.input_file_name().alias("file"),
        )
        .filter(F.trim(F.col("raw_line")) != "")
    )
    parsed = raw.withColumn(
        "__rec",
        F.from_json(
            F.col("raw_line"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt},
        ),
    )
    is_bad = F.col("__rec").isNull() | F.col(f"__rec.{corrupt}").isNotNull()
    good = (
        parsed.filter(~is_bad)
        .select(*[F.col(f"__rec.{f.name}").alias(f.name) for f in base.fields])
    )
    quarantine = parsed.filter(is_bad).select("raw_line", "file")
    return good, quarantine
