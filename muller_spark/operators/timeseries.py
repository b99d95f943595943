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
    # Round-12 shape: the grid is generated from CONSECUTIVE OBSERVED
    # buckets — each observed row emits itself plus the gap buckets up
    # to (excluding) the key's next observed bucket, with both fill
    # policies computed in closed form from the (this, next) endpoint
    # pair.  This replaces the old dense-spine construction (explode
    # the full [min, max] grid, left-join the aggregates back, then
    # TWO full-grid ignorenulls window sorts for linear fill) with ONE
    # lead() window over observed rows only: the join and both
    # grid-sized sorts disappear, and everything after the lead is
    # map-side.  Values are identical by construction: every gap lies
    # strictly between two consecutive observed buckets, so the old
    # prev/next ignorenulls scans resolve to exactly this row's
    # (bucket, _v) and its lead — the interpolation expression below
    # is the same IEEE double arithmetic on the same operands.
    step = int(interval)
    w_lead = Window.partitionBy("key").orderBy("bucket")
    base = per.withColumn("_nb", F.lead("bucket").over(w_lead)).withColumn(
        "_nv", F.lead("_v").over(w_lead)
    )
    if max_buckets is not None:
        w_span = (
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        n_buckets = (
            (F.max("bucket").over(w_span) - F.min("bucket").over(w_span))
            / F.lit(step)
        ).cast("long") + 1
        base = base.withColumn(
            "bucket",
            F.when(
                n_buckets > int(max_buckets),
                F.raise_error(F.concat(
                    F.lit("resample: key "),
                    F.col("key").cast("string"),
                    F.lit(" spans "),
                    n_buckets.cast("string"),
                    F.lit(
                        f" buckets at interval={step}s, over "
                        f"max_buckets={int(max_buckets)}; widen interval,"
                        " raise max_buckets, or clean outlier timestamps"
                    ),
                )).cast("long"),
            ).otherwise(F.col("bucket")),
        )
    # two-level explode of each observed row's half-open [bucket, _nb)
    # range (the last observed bucket emits only itself): chunk starts,
    # then ≤ _SPINE_CHUNK_BUCKETS buckets per chunk — bounded task
    # memory however long a single gap is
    chunk_span = step * _SPINE_CHUNK_BUCKETS
    hi = F.coalesce(F.col("_nb") - F.lit(step).cast("long"), F.col("bucket"))
    hi2 = F.coalesce(F.col("_nb") - F.lit(step).cast("long"), F.col("_ob"))
    grid = base.select(
        "key", F.col("bucket").alias("_ob"), "_v", "_nb", "_nv",
        F.explode(
            F.sequence(F.col("bucket"), hi, F.lit(chunk_span).cast("long"))
        ).alias("_chunk"),
    ).select(
        "key", "_ob", "_v", "_nb", "_nv",
        F.explode(
            F.sequence(
                F.col("_chunk"),
                F.least(
                    F.col("_chunk") + F.lit(chunk_span - step).cast("long"),
                    hi2,
                ),
                F.lit(step).cast("long"),
            )
        ).alias("bucket"),
    )
    was_gap = F.col("bucket") != F.col("_ob")
    if fill == "ffill":
        # the most recent observed bucket before a gap IS this row's
        # own aggregate (including a NULL one — the fill repeats what
        # was last measured, never reaching past a NULL measurement)
        value = F.col("_v")
    elif fill == "linear":
        frac = (F.col("bucket") - F.col("_ob")) / (
            F.col("_nb") - F.col("_ob")
        )
        # deliberately NOT re-rounded: the endpoints are already the
        # round_to-rounded aggregates, so this is the identical IEEE
        # double expression in any engine (bit-exact cross-engine) —
        # while rounding it WOULD diverge: interpolation midpoints land
        # exactly on .xxxxxx5 where HALF_UP / HALF_EVEN / DuckDB's
        # multiply-then-std::round all disagree value-by-value
        interp = F.col("_v") + (F.col("_nv") - F.col("_v")) * frac
        value = F.when(was_gap, interp).otherwise(F.col("_v"))
    else:
        value = F.when(was_gap, F.lit(None).cast("double")).otherwise(
            F.col("_v")
        )
    return grid.select(
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
