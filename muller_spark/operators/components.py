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

import os

from pyspark.sql import DataFrame, Window
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
    (v, m) with v > u ≥ m, so no re-orientation pass is needed.

    Shape: min(Γ(u)) is a partitionBy-only window over the symmetrized
    edge list — ONE exchange on u and one in-partition pass, where the
    groupBy(u).min + join-back-on-u shape paid the same exchange PLUS a
    join (sort-merge = two more sorts, and a second AQE query stage per
    round).  The symmetrization itself is a single-pass explode instead
    of a union of two scans."""
    nbrs = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("n"), F.col("v").alias("w")),
                F.struct(F.col("v").alias("n"), F.col("u").alias("w")),
            )
        ).alias("e")
    ).select(F.col("e.n").alias("u"), F.col("e.w").alias("v"))
    win = Window.partitionBy("u")
    m = F.least(F.min("v").over(win), F.col("u"))
    return (
        nbrs.select("u", "v", m.alias("m"))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u (and u itself) to
    min(Γ⁻(u) ∪ {u}).  Input must be large→small oriented (u > v);
    output stays oriented.

    Same window shape as :func:`_large_star`; the per-node self edge
    (u, m) is emitted per ROW and deduped by the closing ``distinct``
    (which the algorithm needs anyway to restore set semantics), so no
    separate aggregate or union branch exists."""
    win = Window.partitionBy("u")
    pairs = (
        edges.select("u", "v", F.min("v").over(win).alias("m"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
                    F.struct(F.col("u").alias("a"), F.col("m").alias("b")),
                )
            ).alias("e")
        )
        .select(F.col("e.a").alias("u"), F.col("e.b").alias("v"))
    )
    return pairs.where(F.col("u") != F.col("v")).distinct()


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
    # lazy checkpoint: the initial fingerprint below materializes it,
    # so setup is one scheduled job instead of three (eager checkpoint
    # + take(1) emptiness probe + fingerprint)
    cur = _canonical(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=False)

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
    if not prev[0]:  # empty edge set: no components
        return cur.select(
            F.col("u").alias("id"), F.col("v").alias("component")
        )
    converged = False
    # Round-13 NEGATIVE results (kept as documentation, guide §1):
    # (a) folding TWO star rounds per checkpoint + fingerprint cycle
    # (half the scheduled barriers) measured WORSE — 60 → 55 jobs only
    # and ~4.1 → ~5.4 s warm at sf0.1 (same-host probes): the fixed
    # cost is per EXCHANGE-STAGE materialization (unchanged at 3 per
    # star round under AQE), not per driver action, and the doubled
    # per-cycle plan optimizes/schedules worse.  Reverted.
    # (b) hash-to-min (VERDICT r12 #5) was analyzed and not adopted:
    # on the diameter-250 bench chain it needs ~log2(250) ≈ 8 message
    # rounds — no fewer than the 9 star rounds — while each round
    # shuffles growing cluster SETS and its root row accumulates the
    # whole component (exactly the giant-key/straggler hazard of guide
    # §2.5 that large-star/small-star was chosen to avoid at 100 TB).
    for _ in range(max_rounds):
        # lazy checkpoint + stats aggregate = ONE job per round: the
        # fingerprint action is what materializes the checkpoint, so
        # the per-round scheduling overhead (which dominates on small
        # edge sets) is a single driver action, not checkpoint-then-
        # count
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


# ---------------------------------------------------------------------------
# incremental connected components — cluster maintenance for the ledger flow
# (ingest → candidate pairs via the near-dup ledgers → THIS → keep-list)
# ---------------------------------------------------------------------------

_LEDGER_BUCKETS_DEFAULT = 64


def _bucket_expr(col: "F.Column | str", buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


def init_components_ledger(
    edges: DataFrame,
    path: str,
    src: str = "src",
    dst: str = "dst",
    buckets: int = _LEDGER_BUCKETS_DEFAULT,
    lock=False,
) -> None:
    """Seed a persistent incremental CONNECTED-COMPONENTS ledger:
    cluster labels maintained across edge-ingest batches without ever
    re-running the star algorithm on the full edge set — the cluster-
    maintenance stage the near-dup ledgers feed (their batch decisions
    emit candidate PAIRS in O(batch); this turns pairs into CLUSTERS
    in O(affected)).

    Layout at ``path`` (parquet):

    - ``labels`` — the star forest, ``(id, component)`` rows hash-
      partitioned into ``bucket=`` directories so an ingest resolves
      its delta endpoints with a PARTITION-PRUNED lookup (reads only
      the buckets its batch touches, never the corpus); append-only —
      a node's row is written once and never rewritten;
    - ``remaps`` — a CLOSED mapping ``(old_root, root)`` for roots
      demoted by later merges; values are always CURRENT roots (one
      hop resolves), kept closed by re-resolving existing entries at
      each ingest.  Bounded by the number of merges, not corpus size;
      rewritten (crash-safe swap) per merging ingest;
    - ``meta`` — pins (buckets, id type) so mixed-geometry state is
      impossible.

    Crash class: REPLAY-ABSORBING BY THEOREM, the HLL ledger's class
    and the strongest in the family — component merging is a join-
    semilattice (idempotent, commutative, associative), so re-ingesting
    any batch maps every edge to endpoints that already share a root
    (self-loops, dropped) and the ingest is a no-op.  The one ordered
    crash window (labels appended, remaps not yet swapped) leaves the
    batch half-absorbed and HEALS on the replay Structured Streaming
    guarantees — so the streaming twin needs no marker machinery at
    all.  Single-writer discipline as the other ledgers.

    At 100 TB: ingest cost = bucket-pruned label lookup (O(batch
    buckets)) + star rounds on the ROOT-SPACE reduced graph (≤ batch
    edges, O(log affected) rounds) + a remap-table rewrite (O(merges
    ever)) + a label append (O(new nodes)).  Nothing scales with
    corpus edges; only report scans the label log, and report OUTPUT
    is corpus-sized by definition.

    ``lock=`` enforces the single-writer discipline with a lease
    (``operators.aggregate._writer_lease``).
    """
    if lock:
        from muller_spark.operators.aggregate import _writer_lease

        with _writer_lease(path, lock):
            return init_components_ledger(
                edges, path, src=src, dst=dst, buckets=buckets
            )
    spark = edges.sparkSession
    canon = _canonical(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    )
    labels = connected_components(canon, src="u", dst="v")
    id_type = labels.schema["id"].dataType.simpleString()
    spark.createDataFrame(
        [(int(buckets), id_type)], "buckets int, id_type string"
    ).write.mode("error").parquet(os.path.join(path, "meta"))
    (
        labels.withColumn("bucket", _bucket_expr("id", buckets))
        # co-locate each bucket before the partitioned write: without
        # this every task writes a file per bucket it holds (tasks ×
        # buckets tiny files per ingest — a listing-cost leak)
        .repartition(F.col("bucket"))
        .write.mode("error")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "labels"))
    )
    spark.createDataFrame(
        [], f"old_root {id_type}, root {id_type}"
    ).write.mode("error").parquet(os.path.join(path, "remaps"))


def _read_labels(spark, path: str) -> DataFrame:
    """The label log with its ``bucket`` partition column.  An
    all-empty log (seeded from an empty edge set, or never appended)
    has no partition directories for schema inference, so fall back
    to an empty frame with the meta-pinned schema."""
    from pyspark.errors import AnalysisException

    from muller_spark.operators.aggregate import _recover_log_swap

    _recover_log_swap(os.path.join(path, "labels"))
    try:
        return spark.read.parquet(os.path.join(path, "labels"))
    except AnalysisException:
        t = spark.read.parquet(os.path.join(path, "meta")).first()["id_type"]
        return spark.createDataFrame(
            [], f"id {t}, component {t}, bucket int"
        )


_BROADCAST_REMAPS_MAX_BYTES = 128 << 20


def _remaps_df(spark, path: str) -> DataFrame:
    """The remap table, broadcast-hinted only while it is small on
    disk.  Remaps are bounded by merges-ever between compactions —
    usually tiny, but a long-uncompacted ledger under a merge-heavy
    workload can outgrow a safe broadcast, so the hint is size-gated
    (the uuid→position join's discipline); past the gate the join
    shuffles on the root key and AQE takes over.  Compaction folds the
    table into the labels and resets it to empty."""
    remap_dir = os.path.join(path, "remaps")
    size = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(remap_dir) for f in fs
    )
    remaps = spark.read.parquet(remap_dir)
    return F.broadcast(remaps) if size <= _BROADCAST_REMAPS_MAX_BYTES \
        else remaps


def _resolved_labels(spark, path: str) -> DataFrame:
    """labels ⟕ remaps, one hop (remaps are closed): the CURRENT
    ``(id, component)`` view."""
    from muller_spark.operators.aggregate import _recover_log_swap

    _recover_log_swap(os.path.join(path, "remaps"))
    labels = _read_labels(spark, path).select("id", "component")
    remaps = _remaps_df(spark, path)
    return (
        labels.join(
            remaps,
            labels["component"] == remaps["old_root"],
            "left",
        )
        .select(
            labels["id"],
            F.coalesce(remaps["root"], labels["component"]).alias(
                "component"
            ),
        )
    )


def components_ledger_report(spark, path: str) -> DataFrame:
    """Current cluster labels from the ledger: ``(id, component)``,
    exactly what :func:`connected_components` over the union of every
    ingested edge batch returns (component = min member id) — the
    equivalence the tests and the driver oracle pin."""
    return _resolved_labels(spark, path)


def components_ledger_ingest(
    edges: DataFrame,
    path: str,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
    lock=False,
) -> None:
    """Fold one edge batch into the ledger, touching only affected
    components:

    1. resolve the batch's endpoints to their current roots with a
       bucket-pruned label lookup + the (closed, broadcast) remap
       table; unseen ids are their own roots;
    2. contract each delta edge to root space — edges whose endpoints
       already share a root collapse to self-loops and vanish (this
       is what makes replay free);
    3. run the star algorithm on the tiny reduced graph → a mapping
       ``node → new min root`` over affected roots and new ids;
    4. append label rows for NEW ids (labels before remaps: the crash
       window between the two writes heals on replay — see
       :func:`init_components_ledger`);
    5. rewrite the remap table: demoted roots gain entries, existing
       entries whose value was demoted re-resolve (keeps the table
       closed so reads stay one-hop).

    ``lock=`` enforces the single-writer discipline with a lease —
    NOTE: replay of a COMPLETED ingest is absorbed by the semilattice,
    but two ingests racing mid-flight can interleave the label/remap
    writes, which the lease prevents.
    """
    if lock:
        from muller_spark.operators.aggregate import _writer_lease

        with _writer_lease(path, lock):
            return components_ledger_ingest(
                edges, path, src=src, dst=dst, max_rounds=max_rounds
            )
    spark = edges.sparkSession
    meta = spark.read.parquet(os.path.join(path, "meta")).first()
    buckets = int(meta["buckets"])
    # Geometry guard: bucketing hashes with xxhash64, which is
    # TYPE-sensitive — an int-typed batch against a long-seeded ledger
    # buckets the same ids differently, missing existing label rows and
    # silently appending duplicate (id, component) rows with conflicting
    # components.  Widen integrals to the pinned type; anything lossy or
    # cross-family raises instead of corrupting state.
    pinned = meta["id_type"]
    _INT_WIDTH = {"tinyint": 1, "smallint": 2, "int": 4, "bigint": 8}
    batch = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    for c in ("u", "v"):
        got = batch.schema[c].dataType.simpleString()
        if got == pinned:
            continue
        if (
            got in _INT_WIDTH
            and pinned in _INT_WIDTH
            and _INT_WIDTH[got] <= _INT_WIDTH[pinned]
        ):
            batch = batch.withColumn(c, F.col(c).cast(pinned))
        else:
            raise TypeError(
                f"components ledger at {path!r} is keyed by id type "
                f"{pinned!r} but the batch column "
                f"{src if c == 'u' else dst!r} is {got!r}; xxhash64 "
                "bucketing is type-sensitive, so mixed geometry would "
                "silently fork labels — cast the batch explicitly"
            )
    delta = _canonical(batch).localCheckpoint()
    nodes = (
        delta.select(F.col("u").alias("id"))
        .union(delta.select(F.col("v").alias("id")))
        .distinct()
    )
    # bucket-pruned lookup: ≤ min(|nodes|, buckets) partition dirs read.
    # ONE job decides emptiness AND the bucket list (bounded driver
    # state: ≤ `buckets` ints)
    hit = sorted(
        r[0]
        for r in nodes.select(
            _bucket_expr("id", buckets).alias("b")
        ).distinct().collect()
    )
    if not hit:
        return  # empty batch after self-loop/dedup canonicalization
    from muller_spark.operators.aggregate import (
        _recover_log_swap,
        _swap_log_dir,
    )

    _recover_log_swap(os.path.join(path, "remaps"))
    labels_sub = (
        _read_labels(spark, path)
        .where(F.col("bucket").isin(hit))
        .select("id", "component")
    )
    remaps = _remaps_df(spark, path)
    resolved = (
        nodes.join(labels_sub, "id", "left")
        .join(
            remaps,
            F.col("component") == remaps["old_root"],
            "left",
        )
        # unseen id → its own root (new node)
        .select(
            "id",
            F.coalesce("root", "component", "id").alias("cur_root"),
        )
        .localCheckpoint()
    )
    reduced = (
        delta.join(resolved.withColumnRenamed("id", "u"), "u")
        .withColumnRenamed("cur_root", "ru")
        .join(resolved.withColumnRenamed("id", "v"), "v")
        .withColumnRenamed("cur_root", "rv")
        .select(F.col("ru").alias("src"), F.col("rv").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    new_nodes = resolved.where(F.col("cur_root") == F.col("id")).join(
        labels_sub.select("id"), "id", "left_anti"
    ).select("id")
    if reduced.take(1):
        # no extra checkpoint: connected_components' own fixed point is
        # already checkpointed; its output is two cheap projections
        m = connected_components(reduced, max_rounds=max_rounds)
    else:
        m = None

    # 4. label rows for new ids: their reduced-CC component, or (for a
    # new id whose every edge collapsed — only possible on a healing
    # replay, where it already resolves through nothing) itself
    if m is not None:
        new_labels = (
            new_nodes.join(m, "id", "left")
            .select(
                "id", F.coalesce("component", "id").alias("component")
            )
        )
    else:
        new_labels = new_nodes.select(
            "id", F.col("id").alias("component")
        )
    (
        new_labels.withColumn("bucket", _bucket_expr("id", buckets))
        .repartition(F.col("bucket"))  # one file per touched bucket
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(os.path.join(path, "labels"))
    )

    # 5. remap rewrite: demoted EXISTING roots (identity rows excluded;
    # new ids live in labels, not remaps) + re-resolve old entries
    if m is not None:
        demoted = (
            m.where(F.col("id") != F.col("component"))
            .join(new_nodes.withColumnRenamed("id", "_n"),
                  F.col("id") == F.col("_n"), "left_anti")
            .select(
                F.col("id").alias("old_root"),
                F.col("component").alias("root"),
            )
        )
        refreshed = (
            remaps.alias("r")
            .join(
                m.alias("m2"),
                F.col("r.root") == F.col("m2.id"),
                "left",
            )
            .select(
                F.col("r.old_root").alias("old_root"),
                F.coalesce(F.col("m2.component"), F.col("r.root")).alias(
                    "root"
                ),
            )
        )
        remap_dir = os.path.join(path, "remaps")
        refreshed.unionByName(demoted).write.mode("overwrite").parquet(
            remap_dir + ".compact"
        )
        _swap_log_dir(remap_dir)


def compact_components_ledger(spark, path: str, lock=False) -> None:
    """Fold the remap table into the label log (labels rewritten to
    their current roots, remaps emptied) — bounds the remap table
    after many merging ingests.  Reports before and after are
    identical.  Crash-safe: the resolved label log swaps first
    (rename-rename-rmtree + self-healing recovery); a crash before
    the remap truncate leaves stale remap entries whose keys no
    longer appear in any label — harmless (left-join misses; demoted
    roots can never become roots again, since a component's root is
    its min member and mins only decrease under merges).  ``lock=``
    enforces the no-compact-while-ingesting discipline with a lease."""
    from muller_spark.operators.aggregate import (
        _recover_log_swap,
        _swap_log_dir,
        _writer_lease,
    )

    if lock:
        with _writer_lease(path, lock):
            return compact_components_ledger(spark, path)

    meta = spark.read.parquet(os.path.join(path, "meta")).first()
    buckets = int(meta["buckets"])
    labels_dir = os.path.join(path, "labels")
    remap_dir = os.path.join(path, "remaps")
    _recover_log_swap(labels_dir)
    _recover_log_swap(remap_dir)
    (
        _resolved_labels(spark, path)
        .withColumn("bucket", _bucket_expr("id", buckets))
        .repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(labels_dir + ".compact")
    )
    _swap_log_dir(labels_dir)
    # Reset the remap table through the same crash-safe swap as the
    # label log: write the empty frame to a `.compact` sibling and
    # promote it.  A plain overwrite has a window (old dir deleted,
    # new dir uncommitted) where a crash leaves `remaps/` missing and
    # _recover_log_swap cannot heal it (no .compact sibling) — every
    # subsequent report/ingest would raise until manual repair.
    id_type = meta["id_type"]
    spark.createDataFrame(
        [], f"old_root {id_type}, root {id_type}"
    ).write.mode("overwrite").parquet(remap_dir + ".compact")
    _swap_log_dir(remap_dir)
