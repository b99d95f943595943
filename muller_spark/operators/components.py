"""Connected components at scale: alternating large-star / small-star.

:func:`muller_spark.operators.dedup.dedup_clusters` propagates min
labels one hop per round — O(component diameter) rounds.  That is fine
for dense near-dup clusters (diameter 2–4) and fatal for chain-shaped
components (drifting boilerplate, consecutive-crawl near-dups, linked
CDC lineages) whose diameter grows with corpus size: at 100 TB a
10 000-doc chain would need 10 000 shuffle rounds.

This module implements the alternating large-star / small-star
algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014): each round
is two keyed aggregate+join stages, and the edge set provably
converges to per-component min-rooted stars in O(log² n) rounds
(observed O(log n)), INDEPENDENT of diameter.  No step ever
materializes anything larger than the (monotonically shrinking-target)
edge list, every stage is keyed on a node id, and the driver only sees
per-round change *counts* — never rows.

Reference parity note: the reference engine has no graph operator at
all (SURVEY.md §2.7 — "there are no relational joins"); this is part
of the training-data-pipeline extension surface, the stage that turns
near-dup *pairs* (MinHash/SimHash/prefix joins in operators/dedup.py)
into duplicate *clusters*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Orient every edge large→small, drop self-loops, dedup."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u}).

    Output edges are already large→small oriented: the emitted pair is
    (v, m) with v > u ≥ m, so no re-orientation pass is needed."""
    nbrs = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least("_mn", F.col("u")).alias("m"))
    )
    # deliberately NOT distinct-ed: duplicate edges change neither the
    # min aggregates nor the emitted pair set of the following
    # small-star pass (whose output distinct restores set semantics),
    # and dropping the dedup saves one shuffle stage per round
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u itself) to
    min(Γ⁻(u) ∪ {u}).  Input must be large→small oriented (u > v);
    output stays oriented."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    joined = edges.join(mins, "u")
    leaf_edges = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edges = mins.select("u", F.col("m").alias("v"))
    return (
        leaf_edges.union(self_edges)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Connected components of an undirected graph, diameter-independent.

    Returns ``(id, component)`` with ``component`` = the minimum member
    id of the node's component (by the id column's natural ordering —
    works for any orderable id type, longs and strings alike).  Every
    node incident to at least one non-self-loop edge gets a row;
    self-loops are ignored, so isolated self-loop-only nodes do not
    appear (same contract as ``dedup_clusters`` over a pair graph,
    which never contains self-pairs).

    Each round runs one large-star then one small-star pass (two keyed
    aggregates + joins, each ``localCheckpoint``-ed so the iterative
    plan's lineage stays flat), then compares the edge set against the
    previous round — convergence in ≤ O(log² n) rounds is a theorem of
    the construction, so ``max_rounds=30`` covers any graph that fits
    on disk; hitting the cap RAISES rather than returning a partially
    contracted labeling (the ``dedup_clusters`` policy: a silent split
    component would let duplicates survive as multiple "canonical"
    rows).

    At 100 TB scale: every stage shuffles on a node id, the edge list
    never grows beyond its symmetrized input, and long chains — the
    min-label algorithm's worst case — contract exponentially (a
    diameter-10 000 chain converges in ~15 rounds, not 10 000).
    """
    cur = _canonical(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint()
    if not cur.take(1):
        return cur.select(
            F.col("u").alias("id"), F.col("v").alias("component")
        )

    # Per-round cost discipline: ONE checkpoint (large-star + small-star
    # composed in a single plan) and ONE aggregate job computing a
    # (count, xxhash64-sum) set fingerprint.  A fingerprint match only
    # TRIGGERS the exact set-equality check (subtract) — convergence is
    # still decided by the exact check, the fingerprint merely keeps the
    # expensive comparison off the per-round path, so a hash collision
    # costs one wasted subtract, never a wrong answer.
    def _stats(df: DataFrame) -> tuple:
        # decimal sum: long-sum of 64-bit hashes overflows under ANSI
        return tuple(
            df.agg(
                F.count(F.lit(1)),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            ).first()
        )

    prev = _stats(cur)
    converged = False
    for _ in range(max_rounds):
        # lazy checkpoint + stats aggregate = ONE job per round: the
        # fingerprint action is what materializes the checkpoint, so
        # the per-round scheduling overhead (which dominates on small
        # edge sets) is a single job, not checkpoint-then-count
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        stats = _stats(nxt)
        if stats == prev and nxt.subtract(cur).count() == 0:
            cur = nxt
            converged = True
            break
        prev = stats
        cur = nxt
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "large-star/small-star rounds — theoretically impossible "
            "below 2^max_rounds nodes; raise max_rounds"
        )
    # fixed point is a min-rooted star forest: non-roots appear only on
    # the large side (u), roots only on the small side (v)
    leaves = cur.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = (
        cur.select(F.col("v").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    return leaves.union(roots)
