"""Event-analytics operators: ordered funnels and retention cohorts.

Beyond the reference's query surface (it has no event analytics), these
are the standard product-analytics shapes a 100 TB event store needs,
expressed as user-keyed aggregations:

- **funnel** — ordered-step conversion: a user converts step k only if
  step k's event happens at-or-after their first step-(k−1) conversion
  time.  One groupBy per step, every shuffle keyed on the user column —
  co-partitioned, no skew beyond user hot-keys, never a self-join over
  raw events.
- **cohort_retention** — users bucketed by first-activity month; counts
  of distinct active users per (cohort, month-offset).  Month math is
  integer ``year*12 + month`` so both engines agree exactly.

Both return small aggregate DataFrames suitable for driver display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: "int | None" = None,
) -> DataFrame:
    """Ordered-funnel conversion counts: (step, step_name, n_users).

    A user converts step k only if a step-k event occurs at-or-after
    their first step-(k−1) conversion time (conv_0 = first step-0
    event) — and, when ``within_seconds`` is set, no later than that
    many seconds after it (the classic "converted within 24 h" form).
    Single plan: one user-keyed aggregation collects each user's
    per-step event times (bounded by that user's event count),
    conversion times chain through array_min over filtered arrays, and
    a final global aggregate emits one row per step — one shuffle on
    the user key, no self-joins over raw events, no driver-side loops.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = df.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    )
    per_user = ev.groupBy("u").agg(
        *[
            F.min(F.when(F.col("t") == s, F.col("ts"))).alias(f"_first_{i}")
            for i, s in enumerate(steps)
        ],
        # unsorted: the only consumer is array_min(filter(...)), which
        # doesn't need order — sorting here is O(m log m) per user/step
        # of pure waste.  The full per-step time lists (not just the
        # first event) are semantically required even without a window:
        # the first step-k event may precede conv_{k-1} while a later
        # one still qualifies.
        *[
            F.collect_list(F.when(F.col("t") == s, F.col("ts"))).alias(
                f"_all_{i}"
            )
            for i, s in enumerate(steps[1:], start=1)
        ],
    )
    gap = (
        F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
        if within_seconds is not None else None
    )
    # conv_0 = first step-0 event; conv_k = earliest step-k event ≥ conv_{k-1}
    # (single-arg predicate factory: a 2-parameter lambda would be
    # treated by F.filter as an (element, index) lambda)
    def in_range(p):
        if gap is None:
            return lambda x: x >= p
        return lambda x: (x >= p) & (x <= p + gap)

    # chain through MATERIALIZED conv_i columns (one withColumn per
    # step) rather than nesting each conv expression inside the next:
    # inlining prev 2-3 times per level grows the expression tree
    # ~3^k with step count (a 10-step windowed funnel would hand
    # Catalyst ~59k nodes); column references keep it linear and the
    # projections collapse into one stage anyway
    marked = per_user.withColumn("conv_0", F.col("_first_0"))
    for i in range(1, len(steps)):
        prev = F.col(f"conv_{i - 1}")
        nxt = F.array_min(F.filter(F.col(f"_all_{i}"), in_range(prev)))
        marked = marked.withColumn(
            f"conv_{i}", F.when(prev.isNotNull(), nxt)
        )
    marked = marked.select(*[f"conv_{i}" for i in range(len(steps))])
    agg = marked.agg(
        *[
            F.count(F.col(f"conv_{i}")).alias(f"n_{i}")
            for i in range(len(steps))
        ]
    )
    pairs = F.array(*[
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(s).alias("step_name"),
            F.col(f"n_{i}").alias("n_users"),
        )
        for i, s in enumerate(steps)
    ])
    return (
        agg.select(F.explode(pairs).alias("r"))
        .select("r.step", "r.step_name", F.col("r.n_users").cast("long").alias("n_users"))
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Monthly retention cohorts: (cohort_month date, month_offset int,
    n_users long) — distinct users active ``month_offset`` months after
    their first-ever activity month.  Two user-keyed shuffles (first
    month, then distinct-activity dedup); month arithmetic is integer
    ``year*12+month`` so Spark and SQL oracles agree exactly."""
    ev = df.select(
        F.col(user_col).alias("u"),
        (F.year(ts_col) * 12 + F.month(ts_col)).alias("ym"),
    ).distinct()
    first = ev.groupBy("u").agg(F.min("ym").alias("ym0"))
    j = ev.join(first, "u")
    out = (
        j.groupBy("ym0", (F.col("ym") - F.col("ym0")).alias("month_offset"))
        # plain count, NOT countDistinct: ev is already distinct on
        # (u, ym) and ym0 is functionally determined by u, so each user
        # contributes exactly one row per group — countDistinct would
        # pay an Expand + extra hash-aggregate stage for identical output
        .agg(F.count("u").alias("n_users"))
        .select(
            F.make_date(
                ((F.col("ym0") - 1) / 12).cast("int"),
                ((F.col("ym0") - 1) % 12) + 1,
                F.lit(1),
            ).alias("cohort_month"),
            "month_offset",
            "n_users",
        )
        .orderBy("cohort_month", "month_offset")
    )
    return out


def event_transitions(
    df: DataFrame,
    user_col: str,
    event_col: str,
    ts_col: str,
    tie_col: "str | None" = None,
) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences: ``(from_event, to_event, n, p)`` where ``p`` is the
    row-normalized transition probability (one correctly-rounded
    division — engine-exact).

    One user-keyed window (lag) + one (from, to) aggregation — the same
    single-pass shape as the sessionizer; the transition matrix is
    |event types|² rows, map-side-combined.  ``tie_col`` breaks
    duplicate timestamps so both engines see the same sequence."""
    from pyspark.sql import Window

    order = [ts_col] + ([tie_col] if tie_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        df.withColumn("__prev", F.lag(F.col(event_col)).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("from_event"),
                 F.col(event_col).alias("to_event"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_from = Window.partitionBy("from_event")
    return (
        pairs.withColumn(
            "p", F.round(F.col("n") / F.sum("n").over(w_from), 6)
        )
        .orderBy("from_event", "to_event")
    )


def event_paths(
    df: DataFrame,
    user_col: str,
    event_col: str,
    ts_col: str,
    length: int = 3,
    k: int = 20,
    tie_col: "str | None" = None,
) -> DataFrame:
    """Top-``k`` most common event paths of exactly ``length``
    consecutive events per user — the n-gram generalization of
    ``event_transitions`` ("view → click → purchase" style journey
    mining).  Returns ``(path, n)`` with ``path`` the '→'-joined
    event names, ordered by count desc then path asc.

    Scale shape: ONE user-keyed window pass computing ``length-1``
    leads (all leads share the same window frame, so Spark evaluates
    them in a single sort of each user's partition — no per-step
    shuffle), then a hash aggregate on the path key (map-side
    combined; at most |event types|^length distinct groups) and a
    TakeOrderedAndProject for the top-k.  Per-user partitions bound
    the window cost; a single hyperactive user is a data-quality
    problem upstream, not a plan hazard.  ``tie_col`` breaks duplicate
    timestamps so both engines see the same sequence."""
    from pyspark.sql import Window

    if length < 2:
        raise ValueError(f"path length must be >= 2, got {length}")
    order = [ts_col] + ([tie_col] if tie_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    steps = df.select(
        F.col(event_col).alias("__s0"),
        *[
            F.lead(F.col(event_col), i).over(w).alias(f"__s{i}")
            for i in range(1, length)
        ],
    )
    complete = F.col("__s0").isNotNull()
    for i in range(1, length):
        complete = complete & F.col(f"__s{i}").isNotNull()
    with_path = steps.filter(
        # every component must be non-null: the last lead is NULL on
        # the final length-1 rows of each user's sequence (incomplete
        # windows), and a NULL EVENT VALUE anywhere in the window
        # would otherwise be silently skipped by concat_ws, counting a
        # (length-1)-component string as a length-step path
        complete
    ).select(
        F.concat_ws(" → ", *[F.col(f"__s{i}") for i in range(length)]).alias(
            "__path"
        )
    )
    return (
        with_path.groupBy(F.col("__path").alias("path"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(k)
    )
