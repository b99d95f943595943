"""Time-series regularization: bucket, gap-fill, and forward-fill a
metric stream per key — the resample primitive behind monitoring
rollups and training-telemetry dashboards.

The reference exposes event streams through filters/aggregations
(SURVEY §2.5's statistics over time columns); a regular grid with
explicit gaps is the missing piece a pipeline needs before windowed
feature extraction.  Everything here is native DataFrame algebra:
no UDF, no driver state beyond the plan.

Scale shape:
- the bucket aggregate is one (key, bucket) hash aggregate —
  map-side combined, keyed shuffle;
- the dense spine comes from ``sequence()`` + ``explode`` on the
  per-key [min, max] bucket range — O(range/interval) rows per key,
  generated distributed, never on the driver.  Pick ``interval`` so
  range/interval is sane (a year of 1-second buckets per key is 31M
  rows/key — that is a caller decision, loudly documented);
- gap-join is one (key, bucket) equi-join of spine to aggregates;
- forward fill is ``last(value, ignorenulls=True)`` over a per-key
  ordered window — partition per key, single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_AGGS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}

# Spine chunking: sequence() builds a key's whole grid as ONE array
# value before explode, so an unguarded span is a single-task OOM (and
# sequence() hard-caps at 2^31 elements with an opaque error).  The
# spine is generated in chunks of this many buckets — no single array
# exceeds it, regardless of span.
_SPINE_CHUNK_BUCKETS = 65536


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval: int,
    agg: str = "avg",
    fill: "str | None" = "ffill",
    round_to: int = 6,
    max_buckets: "int | None" = 10_000_000,
) -> DataFrame:
    """Resample ``value_col`` onto a regular ``interval``-second grid
    per key: ``(key, bucket, value, was_gap)`` where ``bucket`` is the
    epoch-second bucket start (long — engine-portable, cast to
    timestamp downstream if wanted), ``value`` is the in-bucket
    aggregate (round ``round_to`` — cross-engine stable), and
    ``was_gap`` marks buckets that had NO events (their value comes
    from the fill policy).

    The grid spans each key's [first, last] OBSERVED bucket — keys are
    never extended to a global range, so a short-lived key costs only
    its own span.  ``was_gap`` is a JOIN-MISS indicator (the bucket
    had no events), NOT a value-NULL test: a bucket whose events all
    carried NULL values is observed (was_gap=false) and keeps its NULL
    aggregate.  ``fill='ffill'`` fills GAP buckets with the most
    recent observed bucket's aggregate — including a NULL one (the
    fill repeats what was last measured; it never reaches past a NULL
    measurement to an older value); ``fill=None`` leaves gaps NULL.

    ``fill='linear'`` interpolates GAP buckets between the nearest
    observed bucket on each side, proportional to bucket distance —
    the raw double expression over the already-rounded endpoints (not
    re-rounded: it is bit-exact cross-engine as-is, while re-rounding
    midpoints diverges per engine).  Both neighbors always
    exist (the grid spans each key's observed range, so gaps are
    strictly interior); when either neighbor's aggregate is NULL the
    gap stays NULL (interpolating across a non-measurement would
    invent data).

    ``max_buckets`` guards the spine against timestamp dirt: a key
    whose observed span exceeds ``max_buckets`` grid points (one
    1970-epoch row under a hot key at interval=1 is a ~1.7-billion
    bucket span) raises a clear per-key error instead of generating
    an OOM-sized grid — widen ``interval``, raise the guard, or clean
    the outlier rows.  ``None`` disables the guard.  Independently of
    the guard, the spine is generated in ≤ 64k-element sequence
    chunks, so no single task ever materializes a span-sized array.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}, got {agg!r}")
    if fill not in (None, "ffill", "linear"):
        raise ValueError(
            f"fill must be None, 'ffill' or 'linear', got {fill!r}"
        )
    if interval <= 0:
        raise ValueError(f"interval must be positive seconds, got {interval}")
    epoch = F.col(ts_col).cast("double")
    bucket = (F.floor(epoch / interval) * interval).cast("long")
    per = (
        df.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket"))
        .agg(
            F.round(_AGGS[agg](value_col), round_to).alias("_v"),
            # never-null observation marker: distinguishes a join miss
            # (gap) from an observed bucket whose aggregate is NULL
            F.count(F.lit(1)).alias("_n"),
        )
    )
    rng = per.groupBy("key").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    if max_buckets is not None:
        n_buckets = (
            (F.col("_hi") - F.col("_lo")) / F.lit(int(interval))
        ).cast("long") + 1
        rng = rng.withColumn(
            "_lo",
            F.when(
                n_buckets > int(max_buckets),
                F.raise_error(F.concat(
                    F.lit("resample: key "),
                    F.col("key").cast("string"),
                    F.lit(" spans "),
                    n_buckets.cast("string"),
                    F.lit(
                        f" buckets at interval={int(interval)}s, over "
                        f"max_buckets={int(max_buckets)}; widen interval,"
                        " raise max_buckets, or clean outlier timestamps"
                    ),
                )).cast("long"),
            ).otherwise(F.col("_lo")),
        )
    # two-level explode: chunk starts, then ≤ _SPINE_CHUNK_BUCKETS
    # buckets per chunk — bounded task memory at any span (a one-chunk
    # key degenerates to the single-sequence shape)
    chunk_span = int(interval) * _SPINE_CHUNK_BUCKETS
    spine = rng.select(
        "key",
        "_hi",
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.lit(chunk_span).cast("long")
            )
        ).alias("_chunk"),
    ).select(
        "key",
        F.explode(
            F.sequence(
                F.col("_chunk"),
                F.least(
                    F.col("_chunk")
                    + F.lit(chunk_span - int(interval)).cast("long"),
                    F.col("_hi"),
                ),
                F.lit(int(interval)).cast("long"),
            )
        ).alias("bucket"),
    )
    joined = spine.join(per, ["key", "bucket"], "left")
    was_gap = F.col("_n").isNull()
    if fill == "ffill":
        w = (
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # struct-wrap observed aggregates so last(ignorenulls) carries
        # the most recent OBSERVED value even when that value is NULL,
        # instead of reaching past it to an older measurement
        carried = F.last(
            F.when(~was_gap, F.struct(F.col("_v"))), ignorenulls=True
        ).over(w)["_v"]
        value = F.when(was_gap, carried).otherwise(F.col("_v"))
    elif fill == "linear":
        w_prev = (
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # descending RUNNING frame, not (0, unboundedFollowing): Spark's
        # UnboundedFollowingWindowFunctionFrame re-scans the remainder of
        # the partition per row — O(n²), measured 111 s vs sub-second on
        # the sf0.1 events table; last-ignorenulls over the reversed
        # running frame is the same value via the O(n) accumulating frame
        w_next = (
            Window.partitionBy("key")
            .orderBy(F.col("bucket").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        obs = F.when(~was_gap, F.struct(F.col("bucket"), F.col("_v")))
        # one window column per direction, fields projected afterwards:
        # inlining prev["bucket"] / prev["_v"] etc. makes Spark emit one
        # window FUNCTION per field access (4× asc + 2× desc measured in
        # the plan); withColumn evaluates each direction exactly once
        joined = joined.withColumn(
            "_prev", F.last(obs, ignorenulls=True).over(w_prev)
        ).withColumn("_nxt", F.last(obs, ignorenulls=True).over(w_next))
        prev, nxt = F.col("_prev"), F.col("_nxt")
        frac = (F.col("bucket") - prev["bucket"]) / (
            nxt["bucket"] - prev["bucket"]
        )
        # deliberately NOT re-rounded: the endpoints are already the
        # round_to-rounded aggregates, so this is the identical IEEE
        # double expression in any engine (bit-exact cross-engine) —
        # while rounding it WOULD diverge: interpolation midpoints land
        # exactly on .xxxxxx5 where HALF_UP / HALF_EVEN / DuckDB's
        # multiply-then-std::round all disagree value-by-value
        interp = prev["_v"] + (nxt["_v"] - prev["_v"]) * frac
        value = F.when(was_gap, interp).otherwise(F.col("_v"))
    else:
        value = F.col("_v")
    return joined.select(
        F.col("key").alias(key_col),
        "bucket",
        value.alias("value"),
        was_gap.alias("was_gap"),
    )


def rolling_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_n: int = 20,
    threshold: float = 3.0,
    round_to: int = 4,
    tie_col: "str | None" = None,
) -> DataFrame:
    """Trailing-window anomaly detection: flag points whose value is
    ``threshold`` standard deviations away from the mean of the
    PREVIOUS ``window_n`` observations of the same key (the current
    point is excluded from its own baseline, so a spike cannot mask
    itself).  Returns ``(key, ts_epoch, value, zscore)`` for flagged
    rows, ``zscore`` rounded to ``round_to`` (the rounded value drives
    the threshold comparison too, keeping the row set cross-engine
    stable).

    Points with fewer than 2 prior observations or a zero-variance
    baseline yield no z-score and are never flagged — a cold start is
    not an anomaly.  ``tie_col`` disambiguates duplicate timestamps.

    Scale shape: ONE per-key window pass (both mean and std come from
    the same frame, Spark evaluates them in a single sort of each
    key's partition), then a map-only filter.  No self-join, no
    global sort; per-key partitions bound the window cost."""
    if window_n < 2:
        raise ValueError(f"window_n must be >= 2, got {window_n}")
    order = [ts_col] + ([tie_col] if tie_col else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-window_n, -1)
    )
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = F.round((F.col(value_col) - mu) / sd, round_to)
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).cast("double").cast("long").alias("ts_epoch"),
            F.col(value_col).alias("value"),
            F.when(sd > 0, z).alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) >= threshold)
        .orderBy("key", "ts_epoch")
    )
