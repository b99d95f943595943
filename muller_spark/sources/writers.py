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


def to_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    num_shards: int = 8,
    bytes_cols: "dict[str, str] | None" = None,
) -> DataFrame:
    """Export rows as WebDataset-style tar shards — the de-facto
    training-data layout for multimodal loaders (one ``{key}.{ext}``
    entry per column, samples grouped by key, ``.tar`` shards streamed
    sequentially by data loaders).

    Sharding is deterministic: ``pmod(xxhash64(key), num_shards)`` picks
    the shard, rows sort by key inside it, and each shard is written by
    the executor that owns its partition — no driver I/O, shard count =
    task count.  ``bytes_cols`` maps binary columns to extensions (e.g.
    ``{"content": "jpg"}``); every other column lands in a single
    ``{key}.json`` entry.  Returns a manifest DataFrame
    ``(shard, n_samples, n_bytes)`` (also written to ``_manifest``).

    Extension beyond the reference's exporters (``to_mindrecord.py``
    producer/consumer regime) — same role, open format, stdlib-only.
    """
    import os as _os

    from pyspark.sql import functions as F

    _os.makedirs(path, exist_ok=True)
    bytes_cols = dict(bytes_cols or {})
    src = _visible(df)
    for c in (key_col, *bytes_cols):
        if c not in src.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_shards))
    arranged = (
        src.withColumn("__shard", shard)
        .repartition(num_shards, "__shard")
        .sortWithinPartitions("__shard", key_col)
    )
    json_cols = [c for c in src.columns if c not in bytes_cols]
    out_dir = path

    def write_shards(iterator):
        import io
        import json as _json
        import tarfile

        import pandas as pd

        # A shard's rows can span several Arrow batches; concatenate the
        # whole partition before writing or a later batch's
        # tarfile.open(..., "w") would truncate an earlier batch's shard
        # (silently dropping samples).  Bounded: one shard's samples
        # must fit its writing task anyway.
        batches = [pdf for pdf in iterator if not pdf.empty]
        if batches:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            attempt = ctx.taskAttemptId() if ctx else _os.getpid()
            pdf = pd.concat(batches, ignore_index=True)
            rows = []
            for shard_id, group in pdf.groupby("__shard"):
                name = f"shard-{int(shard_id):05d}.tar"
                full = _os.path.join(out_dir, name)
                # Task-attempt-unique temp + atomic rename: a retried or
                # speculative attempt never truncates the winner's shard
                # mid-read, and a failed job leaves only .tmp-* litter,
                # never a half-written shard under its final name.
                tmp = f"{full}.tmp-{attempt}"
                n_bytes = 0
                with tarfile.open(tmp, "w") as tar:
                    for _, row in group.iterrows():
                        key = str(row[key_col])
                        meta = {
                            c: (row[c].tolist() if hasattr(row[c], "tolist")
                                else row[c])
                            for c in json_cols if c != "__shard"
                        }
                        payload = _json.dumps(meta, default=str).encode()
                        entries = [(f"{key}.json", payload)]
                        for c, ext in bytes_cols.items():
                            data = row[c]
                            if data is None:
                                continue
                            entries.append((f"{key}.{ext}", bytes(data)))
                        for entry_name, data in entries:
                            info = tarfile.TarInfo(entry_name)
                            info.size = len(data)
                            info.mtime = 0  # deterministic archives
                            tar.addfile(info, io.BytesIO(data))
                            n_bytes += len(data)
                _os.replace(tmp, full)  # atomic on POSIX
                rows.append((name, len(group), n_bytes))
            if rows:
                yield pd.DataFrame(rows, columns=["shard", "n_samples", "n_bytes"])

    written = arranged.mapInPandas(
        write_shards, "shard string, n_samples long, n_bytes long"
    ).collect()  # bounded: ≤ num_shards rows
    # Emit empty tars for shards no row hashed into, so loaders always
    # see exactly num_shards files.
    seen = {r["shard"] for r in written}
    rows = [(r["shard"], r["n_samples"], r["n_bytes"]) for r in written]
    import tarfile as _tarfile

    for s in range(num_shards):
        name = f"shard-{s:05d}.tar"
        if name not in seen:
            with _tarfile.open(_os.path.join(path, name), "w"):
                pass
            rows.append((name, 0, 0))
    rows.sort()
    manifest = df.sparkSession.createDataFrame(
        rows, "shard string, n_samples long, n_bytes long"
    )
    manifest.coalesce(1).write.mode("overwrite").json(
        _os.path.join(path, "_manifest")
    )
    return df.sparkSession.read.json(_os.path.join(path, "_manifest"))


def to_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC export — the second columnar interchange format Spark ships
    natively (reference's export surface is parquet/json/numpy/arrow at
    ``muller/core/dataset/export_data/``; ORC is the Spark-side bonus
    for Hive-ecosystem consumers).  Same visible-columns contract as
    ``to_parquet``."""
    _visible(df).write.mode(mode).orc(path)


def from_orc(spark, path: str) -> DataFrame:
    return spark.read.orc(path)


def to_jsonl_shards(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    mode: str = "overwrite",
) -> DataFrame:
    """Sharded JSONL export — the LLM-data interchange format (one JSON
    object per line, bounded shard sizes so downstream loaders stream
    without a 100 GB file).  ``maxRecordsPerFile`` bounds rows per
    file; the partition count is pre-sized from a distributed count so
    writers don't emit one giant task.  Returns a manifest DataFrame
    ``(file, rows)`` read back from the landed output — the loader-side
    contract, verified against what is actually on disk.  The manifest
    read uses ``spark.read.text`` (one JSONL line = one row), never
    ``read.json``: schema inference raises on an empty export (zero
    data files) and degrades on all-null columns, while a line count
    needs no schema at all — an empty input yields an empty manifest
    instead of a crash after a successful write."""
    from pyspark.sql import functions as F

    out = _visible(df)
    n = out.count()
    parts = max(1, (n + rows_per_shard - 1) // rows_per_shard)
    (
        out.repartition(parts)
        .write.mode(mode)
        .option("maxRecordsPerFile", rows_per_shard)
        .json(path)
    )
    spark = df.sparkSession
    landed = spark.read.text(path).withColumn(
        "file", F.input_file_name()
    )
    return landed.groupBy("file").agg(F.count(F.lit(1)).alias("rows"))


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    seed: int = 0,
    format: str = "parquet",
    mode: str = "overwrite",
) -> DataFrame:
    """Epoch-shuffled training export: land the deterministic
    :func:`muller_spark.operators.layout.shuffle_shards` permutation as
    ``num_shards`` files, each internally ordered by the permutation —
    the layout an epoch dataloader streams sequentially.

    One ``repartition(num_shards, shard)`` hash exchange +
    ``sortWithinPartitions(shard, pos)`` + one write task per shard
    file; size ``num_shards`` to the intended file size (a shard IS a
    file).  Returns a per-shard manifest (shard, rows) aggregated from
    the landed data — the loader-side contract, verified against disk,
    not against what we intended to write.  Rows keep all visible
    input columns plus (shard, pos)."""
    from pyspark.sql import functions as F

    from muller_spark.operators.layout import shuffle_shards

    if format not in ("parquet", "json"):
        raise ValueError(f"format must be parquet or json, got {format!r}")
    out = shuffle_shards(_visible(df), id_col, num_shards, seed)
    writer = (
        out.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
    )
    getattr(writer, format)(path)
    spark = df.sparkSession
    landed = getattr(spark.read, format)(path)
    return landed.groupBy("shard").agg(F.count(F.lit(1)).alias("rows"))
