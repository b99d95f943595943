"""Scale-safe top-k rows per group.

The classic worry about ``row_number() OVER (PARTITION BY group ORDER BY
...) ... WHERE rn <= k`` with a low-cardinality group key is that every
row shuffles into one task per group and gets fully sorted there — a
handful of giant single-task sorts.

**On Spark 4 that worry is obsolete.** Catalyst's rank-limit pushdown
(``InferWindowGroupLimit``) rewrites the filtered window into::

    Window (Final)
      WindowGroupLimit [group], [order], row_number(), k, Final
        Sort (group, order) local
          Exchange hashpartitioning(group)
            WindowGroupLimit [group], [order], row_number(), k, Partial
              Sort (group, order) local
                Scan

The *Partial* node runs before the Exchange: each map task locally sorts
its own partition (fully parallel, no skew possible — partition sizes
are input-split sizes, not group sizes) and keeps only ``k`` rows per
group, so the shuffle carries at most ``tasks * groups * k`` rows and
the "giant per-group sort" never materializes.  Measured at 6 M rows /
6 groups: the native plan beat a hand-rolled salted two-phase rewrite
3× (9.9 s vs 30.5 s) because the rewrite pays for a second full local
sort and an extra exchange to do what the Partial node already does.

``topk_per_group`` therefore emits the plain filtered-window plan by
default and asserts nothing else is needed.  ``strategy="salted"`` keeps
the explicit two-phase rewrite (rank within ``(group, salt)`` buckets,
then a global re-rank of the tiny survivor set) for engines or window
functions where the pushdown does not apply — it is semantically
identical, just redundant on Spark 4.

The salt is ``xxhash64`` over deterministic input columns — not
``spark_partition_id()`` / ``rand()`` — so a recomputed task under
speculative execution or fetch failure re-derives the same buckets.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SALT = "__mk_topk_salt"


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    *,
    rank_col: str = "rnk",
    strategy: str = "native",
    salt_buckets: int | None = None,
    salt_on: Sequence[str] | None = None,
) -> DataFrame:
    """Top-``k`` rows per group under ``order_by``, with a ``rank_col``
    (1-based ``row_number`` semantics).  ``order_by`` should include a
    unique tie-break column so the result is total-order deterministic.

    ``strategy="native"`` (default) relies on Spark's rank-limit
    pushdown (``WindowGroupLimit`` Partial before the shuffle — see
    module docstring); ``strategy="salted"`` forces the explicit
    two-phase rewrite.

    ``salt_on``: columns hashed into the salted phase-1 bucket key;
    defaults to every input column (deterministic, collision-harmless —
    a collision only means two rows share a bucket).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if not order_by:
        raise ValueError("order_by must not be empty")
    if strategy not in ("native", "salted"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    group_cols = list(group_cols)
    order_by = list(order_by)

    w_final = Window.partitionBy(*group_cols).orderBy(*order_by)

    if strategy == "native":
        return (
            df.withColumn(rank_col, F.row_number().over(w_final))
            .filter(F.col(rank_col) <= k)
        )

    if salt_buckets is None:
        salt_buckets = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    salt_src = [df[c] for c in (salt_on or df.columns)]

    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*salt_src), F.lit(salt_buckets))
    )
    w_partial = Window.partitionBy(*group_cols, _SALT).orderBy(*order_by)
    survivors = (
        salted.withColumn(rank_col, F.row_number().over(w_partial))
        .filter(F.col(rank_col) <= k)
        .drop(_SALT, rank_col)
    )

    return (
        survivors.withColumn(rank_col, F.row_number().over(w_final))
        .filter(F.col(rank_col) <= k)
    )


def rrf_fuse(
    ranked: "Sequence[tuple[DataFrame, str]]",
    id_col: str = "id",
    k: int = 60,
    topk: "int | None" = None,
    out_col: str = "rrf_score",
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of candidate lists — the standard hybrid-
    retrieval combiner (Cormack et al. 2009; what Elasticsearch/Vespa
    call "RRF"): each list contributes ``1/(k + rank)`` per id and ids
    are scored by the sum, so agreement across heterogeneous scorers
    (BM25, vector KNN, a quality prior) beats a high rank in one.

    ``ranked`` is a sequence of ``(df, score_col)`` pairs; each frame is
    ranked by ``score_col`` desc with ``id_col`` asc tie-break.  Rows
    absent from a list simply contribute nothing (no imputation).
    Returns ``(id, rrf_score)`` ordered score-desc / id-asc, limited to
    ``topk`` when given.

    Determinism: rank ties break on id in every list, and each id
    receives at most one contribution per list, so with ≤ 2 lists the
    fused double is order-independent (float addition is commutative;
    associativity only matters from 3 summands up — for >2 lists the
    contributions are summed in list order via an ordered fold to keep
    the result engine-reproducible).  Scores round to ``round_to``.

    Scale shape: inputs are CANDIDATE lists (a top-k from an index or
    ANN probe — typically ≤ thousands of rows), so the single-partition
    ranking window is bounded by construction — never apply this to an
    unranked corpus; rank the corpus with ``topk_per_group`` or an
    index first.  The fusion itself is one union + one id-keyed
    aggregate."""
    if not ranked:
        raise ValueError("need at least one ranked input")
    contribs = []
    for i, (df, score_col) in enumerate(ranked):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        contribs.append(
            df.select(
                F.col(id_col).alias("id"),
                F.lit(i).alias("_list"),
                (F.lit(1.0) / (F.lit(k) + F.row_number().over(w))).alias("_c"),
            )
        )
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    # ordered fold over list index: sort_array of (list, contribution)
    # structs then aggregate — bit-identical regardless of row order
    fused = (
        allc.groupBy("id")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_list"), F.col("_c")))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["_c"],
            ).alias("_sum")
        )
        .select("id", F.round(F.col("_sum"), round_to).alias(out_col))
        .orderBy(F.col(out_col).desc(), F.col("id").asc())
    )
    return fused.limit(topk) if topk is not None else fused
