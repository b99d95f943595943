"""Sequence packing for LLM pretraining batches.

``pack_concat_chunks`` implements the dominant pretraining packing
scheme — concatenate every document's tokens in a deterministic order
and cut the stream every ``seq_len`` tokens (documents may straddle a
cut; the trainer masks across the boundary).  Each document's placement
is a pure function of the *global exclusive prefix sum* of token
counts, which is the interesting distributed problem:

``sum() OVER (ORDER BY id)`` with no PARTITION BY collapses to a single
task in any engine — the whole corpus sorted and summed in one place.
``global_cumsum`` instead runs the classic two-phase parallel prefix
sum, entirely JVM-side:

1. bucket rows by contiguous ``order_col`` ranges (boundaries from
   ``approxQuantile`` — any contiguous split is *correct*, quantiles
   just balance it; ``2 x defaultParallelism`` buckets by default);
2. one tiny aggregate gives per-bucket totals; the driver prefix-sums
   them (one row per bucket) and broadcasts the offsets back;
3. a window partitioned BY BUCKET computes the within-bucket exclusive
   cumsum — each bucket is an independent sort task, bounded by
   ``rows / buckets``, so parallelism scales with the cluster instead
   of degrading to one task.

The result is bit-identical to the single-task window (integer sums,
associative), which is exactly what the DuckDB oracle for
``q_sequence_pack`` computes with a plain ``ORDER BY`` window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: "str | Column",
    num_buckets: int | None = None,
    out_col: str = "cum_excl",
) -> DataFrame:
    """Add ``out_col`` = exclusive prefix sum of ``value_col`` under the
    total order of ``order_col`` (must be unique and NUMERIC — the
    bucketing rides on ``approxQuantile``, which rejects string
    columns; hash string ids to a numeric surrogate first), without
    ever forming a single-task global window."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = max(2 * spark.sparkContext.defaultParallelism, 8)

    probes = [i / num_buckets for i in range(1, num_buckets)]
    # num_buckets=1 → no interior boundaries (and approxQuantile NPEs
    # on an empty probability list)
    bounds = (
        sorted(set(df.stat.approxQuantile(order_col, probes, 0.001)))
        if probes else []
    )
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: b < F.col(order_col)))
    else:  # degenerate corpus (constant / tiny): one bucket
        bucket = F.lit(0)
    with_bucket = df.withColumn("__pk_bucket", bucket).withColumn(
        "__pk_val", value.cast("long")
    )

    totals = (
        with_bucket.groupBy("__pk_bucket")
        .agg(F.sum("__pk_val").alias("t"))
        .collect()
    )  # bounded: one row per bucket
    by_bucket = {r["__pk_bucket"]: r["t"] for r in totals}
    offsets, running = [], 0
    for b in sorted(by_bucket):
        offsets.append((b, running))
        if by_bucket[b] is not None:  # all-NULL value bucket sums to NULL
            running += by_bucket[b]
    offset_df = spark.createDataFrame(offsets, "__pk_bucket int, __pk_offset long")

    w = (
        Window.partitionBy("__pk_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum("__pk_val").over(w), F.lit(0))
    return (
        with_bucket.join(F.broadcast(offset_df), "__pk_bucket")
        .withColumn(out_col, (F.col("__pk_offset") + local))
        .drop("__pk_bucket", "__pk_val", "__pk_offset")
    )


def pack_concat_chunks(
    df: DataFrame,
    id_col: str,
    token_col: "str | Column",
    seq_len: int,
    num_buckets: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: documents ordered by ``id_col`` are
    concatenated and the token stream is cut every ``seq_len`` tokens.

    Returns one row per document:
      ``start_pos``       global token offset of the document,
      ``chunk_start/_end`` first/last training chunk it lands in,
      ``offset_in_chunk``  position within its first chunk.
    Zero-token documents occupy no stream space (chunk_end =
    chunk_start - 1 when they sit exactly on a boundary is avoided by
    clamping to chunk_start)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    value = F.col(token_col) if isinstance(token_col, str) else token_col
    out = global_cumsum(
        df.withColumn("__pk_tokens", value.cast("long")),
        id_col,
        "__pk_tokens",
        num_buckets=num_buckets,
        out_col="start_pos",
    )
    chunk_start = F.floor(F.col("start_pos") / seq_len)
    last_tok = F.col("start_pos") + F.greatest(F.col("__pk_tokens") - 1, F.lit(0))
    return (
        out.withColumn("n_tokens", F.col("__pk_tokens"))
        .withColumn("chunk_start", chunk_start.cast("long"))
        .withColumn(
            "chunk_end",
            F.greatest(F.floor(last_tok / seq_len), chunk_start).cast("long"),
        )
        .withColumn(
            "offset_in_chunk", (F.col("start_pos") % seq_len).cast("long")
        )
        .drop("__pk_tokens")
    )


def pack_bins(
    df: DataFrame,
    id_col: str,
    token_col: "str | Column",
    max_len: int,
    num_buckets: int | None = None,
) -> DataFrame:
    """Whole-document bin packing: group documents into training bins
    of capacity ``max_len`` tokens WITHOUT splitting any document —
    the packing used when examples must stay intact (instruction
    tuning, contrastive batches), minimizing padding via first-fit-
    decreasing.

    Returns (id, n_tokens, bucket, bin_id) — ``bin_id`` globally
    unique (bucket-prefixed); documents LONGER than ``max_len`` get
    ``bin_id = -1`` (visible, never silently truncated).  Zero/NULL
    token counts pack as 0-cost members.

    Scale shape: a deterministic hash bucket (engine-portable Knuth
    hash of the id) splits the corpus into ``num_buckets`` independent
    packing problems; each bucket runs exact FFD in one Arrow task via
    ``applyInPandas`` — one shuffle on the bucket key, no global sort,
    no driver state.  Bucket-local FFD trades a bounded amount of
    cross-bucket padding for full parallelism (FFD itself is
    inherently sequential); results are deterministic for a given
    (corpus, num_buckets) regardless of input partitioning because
    bucket membership and the in-bucket FFD order (tokens desc, id
    asc) are both data-derived."""
    import pandas as pd

    from muller_spark.operators.sampling import bucket_of

    if max_len <= 0:
        raise ValueError("max_len must be positive")
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"pack_bins needs an integral id column for the portable "
            f"bucket hash and the long output schema; {id_col!r} is "
            f"{id_type} — derive a numeric surrogate first "
            f"(e.g. xxhash64(id))"
        )
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = max(2 * spark.sparkContext.defaultParallelism, 8)

    value = F.col(token_col) if isinstance(token_col, str) else token_col
    src = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(value.cast("long"), F.lit(0)).alias("n_tokens"),
        bucket_of(F.col(id_col), num_buckets).cast("int").alias("bucket"),
    )

    def _ffd(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        caps: "list[int]" = []  # remaining capacity per local bin
        bins = []
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if tok > max_len:
                bins.append(-1)
                continue
            for j, cap in enumerate(caps):
                if cap >= tok:
                    caps[j] = cap - tok
                    bins.append(j)
                    break
            else:
                caps.append(max_len - tok)
                bins.append(len(caps) - 1)
        out = pdf[["id", "n_tokens", "bucket"]].copy()
        out["bin_id"] = [
            -1 if b < 0 else (bucket << 32) | b for b in bins
        ]
        return out

    return src.groupBy("bucket").applyInPandas(
        _ffd, "id long, n_tokens long, bucket int, bin_id long"
    )
