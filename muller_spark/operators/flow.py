"""The incremental dedup flow as ONE user-facing facade (round 12,
VERDICT r11 #8): ingest → candidate pairs → cluster maintenance →
keep-list, without reading four modules.

The chain it wires (each stage O(batch), nothing re-scans the corpus):

1. ``operators/dedup.neardup_pairs_against_ledger`` — the batch's
   near-dup edges against the persisted MinHash ledger (read-only);
2. ``operators/components.components_ledger_ingest`` — folds those
   edges into the persisted cluster labels in O(affected);
3. ``operators/dedup.neardup_against_ledger`` — admits the batch's
   non-duplicate survivors into the near-dup ledger;
4. ``operators/dedup.keep_best_against_ledger`` — the keep decision
   off the persisted label table (one label read, two keyed
   aggregates, zero graph work at read time).

Reference parity note: the reference engine has no incremental
pipeline at all (SURVEY.md §2 — batch filters over committed chunks);
this is the training-data-pipeline extension surface, the composition
``tests/test_incremental_flow.py`` pins end-to-end (including flow-
level replay absorption).

Crash/consistency contract, inherited from the stages: pair ingest
into the components ledger is replay-absorbing (semilattice), near-dup
admission is marker-guarded in its streaming twin, and ``lock=``
passes an enforced single-writer lease down to every mutation
(``operators/aggregate._writer_lease``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class IncrementalDedupFlow:
    """Persistent incremental near-dup pipeline rooted at ``root``
    (two ledgers: ``<root>/neardup`` and ``<root>/clusters``).

    Usage::

        flow = IncrementalDedupFlow(root, "text", "doc_id",
                                    threshold=0.5)
        flow.init(seed_corpus)              # once
        for batch in batches:
            survivors = flow.ingest(batch)  # admit non-dups, O(batch)
        flow.labels()                       # (id, component) clusters
        flow.keep_best(scored_df, "score")  # keep-list per cluster
        flow.compact()                      # bound merge-on-read cost
    """

    def __init__(
        self,
        root: str,
        text_col: str,
        id_col: str,
        threshold: float = 0.5,
        num_hashes: int = 64,
        shingle_size: int = 3,
        bands: int = 32,
        buckets: int = 64,
        lock=False,
    ) -> None:
        self.root = root
        self.neardup_path = os.path.join(root, "neardup")
        self.clusters_path = os.path.join(root, "clusters")
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.shingle_size = shingle_size
        self.bands = bands
        self.buckets = buckets
        self.lock = lock

    # -- lifecycle ---------------------------------------------------------
    def init(self, seed_df: DataFrame) -> None:
        """Seed both ledgers: the near-dup ledger from the (already
        deduplicated or trusted) seed corpus, the cluster ledger empty
        — seed-internal duplicates are the one-time corpus-wide pass
        (``dedup_clusters``), not this flow's job."""
        from muller_spark.operators.components import init_components_ledger
        from muller_spark.operators.dedup import init_neardup_ledger

        init_neardup_ledger(
            seed_df, self.text_col, self.id_col, self.neardup_path,
            num_hashes=self.num_hashes, shingle_size=self.shingle_size,
            bands=self.bands,
        )
        spark = seed_df.sparkSession
        id_type = seed_df.schema[self.id_col].dataType.simpleString()
        init_components_ledger(
            spark.createDataFrame([], f"src {id_type}, dst {id_type}"),
            self.clusters_path, buckets=self.buckets, lock=self.lock,
        )

    def ingest(self, batch_df: DataFrame) -> DataFrame:
        """One batch through the whole chain; returns the batch's
        non-duplicate survivors (now admitted to the ledger).

        Order matters and is pinned here: pair discovery runs BEFORE
        admission mutates the near-dup ledger (else a batch document
        would pair with itself), and the pair edges are checkpointed
        before the components ingest consumes them twice (resolve +
        append) — re-deriving them after admission would see the
        mutated ledger."""
        from muller_spark.operators.components import (
            components_ledger_ingest,
        )
        from muller_spark.operators.dedup import (
            neardup_against_ledger,
            neardup_pairs_against_ledger,
        )

        pairs = neardup_pairs_against_ledger(
            batch_df, self.text_col, self.id_col, self.neardup_path,
            threshold=self.threshold,
        ).localCheckpoint()
        components_ledger_ingest(
            pairs, self.clusters_path, src="id_a", dst="id_b",
            lock=self.lock,
        )
        return neardup_against_ledger(
            batch_df, self.text_col, self.id_col, self.neardup_path,
            threshold=self.threshold, update=True,
        )

    def stream(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int = 5,
        available_now: bool = False,
    ):
        """Streaming twin: run the same chain per micro-batch
        (``streaming/windows.incremental_dedup_flow_stream`` — shares
        this flow's ledger layout, so batch and stream ingest compose
        against the same state).  Survivors land exactly-once under
        ``<root>/admitted``.  ``init()`` must have run."""
        from muller_spark.streaming.windows import (
            incremental_dedup_flow_stream,
        )

        return incremental_dedup_flow_stream(
            stream_df, self.root, checkpoint_dir,
            text_col=self.text_col, id_col=self.id_col,
            threshold=self.threshold,
            trigger_seconds=trigger_seconds, available_now=available_now,
        )

    # -- reads -------------------------------------------------------------
    def labels(self) -> DataFrame:
        """Current cluster labels ``(id, component)`` — every document
        that ever appeared in a near-dup pair, labeled by its cluster's
        min id.  Documents with no near-dups are absent (singletons)."""
        from muller_spark.operators.components import (
            components_ledger_report,
        )

        spark = self._spark()
        return components_ledger_report(spark, self.clusters_path)

    def keep_best(self, scored_df: DataFrame, score_col: str) -> DataFrame:
        """Keep-list for ``scored_df``: one row per document with its
        cluster's winner (``keep_id``) and the ``keep`` verdict;
        singletons keep themselves."""
        from muller_spark.operators.dedup import keep_best_against_ledger

        return keep_best_against_ledger(
            scored_df, self.clusters_path, self.id_col, score_col
        )

    # -- maintenance -------------------------------------------------------
    def compact(self) -> None:
        """Bound merge-on-read cost after many ingests: fold the
        cluster ledger's remap log AND distinct-fold the near-dup
        ledger's posting/operand logs (heals the duplicates the
        streaming twin's heal-or-advance replays accumulate)."""
        from muller_spark.operators.components import (
            compact_components_ledger,
        )
        from muller_spark.operators.dedup import compact_neardup_ledger

        spark = self._spark()
        compact_components_ledger(spark, self.clusters_path, lock=self.lock)
        compact_neardup_ledger(spark, self.neardup_path, lock=self.lock)

    def _spark(self):
        from pyspark.sql import SparkSession

        return SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()


class IncrementalSemanticDedupFlow:
    """The incremental dedup flow for the EMBEDDING modality —
    :class:`IncrementalDedupFlow` with the SRP-cosine embedding ledger
    as the pair/admission stage, so SemDeDup-style semantic
    deduplication runs O(batch) per ingest too: batch SRP signatures →
    cosine pairs against the persisted buckets
    (``embedding_pairs_against_ledger``) → cluster-ledger fold
    (O(affected)) → admission (``embedding_against_ledger``) →
    keep-list off the persisted labels.  Ledger layout at ``root``:
    ``<root>/embeddings`` + ``<root>/clusters``.

    Usage::

        flow = IncrementalSemanticDedupFlow(root, "embedding", "doc_id",
                                            threshold=0.95, dim=768)
        flow.init(seed_corpus)              # once
        for batch in batches:
            survivors = flow.ingest(batch)  # admit non-dups, O(batch)
        flow.labels()                       # (id, component) clusters
        flow.keep_best(scored_df, "score")  # keep-list per cluster
        flow.compact()                      # bound merge-on-read cost

    Same stage-order pinning, crash classes, and ``lock=`` lease
    plumbing as the text flow; ids are cast to long by the embedding
    ledger, so the cluster ledger is seeded with long ids regardless
    of the input id type (mixed-geometry state is impossible on both
    axes — vector width AND id type)."""

    def __init__(
        self,
        root: str,
        vec_col: str,
        id_col: str,
        threshold: float = 0.95,
        num_planes: int = 10,
        num_tables: int = 6,
        seed: int = 42,
        dim: "int | None" = None,
        buckets: int = 64,
        lock=False,
    ) -> None:
        self.root = root
        self.embedding_path = os.path.join(root, "embeddings")
        self.clusters_path = os.path.join(root, "clusters")
        self.vec_col = vec_col
        self.id_col = id_col
        self.threshold = threshold
        self.num_planes = num_planes
        self.num_tables = num_tables
        self.seed = seed
        self.dim = dim
        self.buckets = buckets
        self.lock = lock

    # -- lifecycle ---------------------------------------------------------
    def init(self, seed_df: DataFrame) -> None:
        """Seed both ledgers: the embedding ledger from the (already
        deduplicated or trusted) seed corpus, the cluster ledger empty
        — seed-internal duplicates are the one-time corpus-wide pass
        (``semantic_dedup`` / ``embedding_near_dups``), not this
        flow's job."""
        from muller_spark.operators.components import init_components_ledger
        from muller_spark.operators.dedup import init_embedding_ledger

        init_embedding_ledger(
            seed_df, self.vec_col, self.id_col, self.embedding_path,
            num_planes=self.num_planes, num_tables=self.num_tables,
            seed=self.seed, dim=self.dim, lock=self.lock,
        )
        spark = seed_df.sparkSession
        init_components_ledger(
            spark.createDataFrame([], "src long, dst long"),
            self.clusters_path, buckets=self.buckets, lock=self.lock,
        )

    def ingest(self, batch_df: DataFrame) -> DataFrame:
        """One batch through the whole chain; returns the batch's
        non-duplicate survivors (now admitted to the ledger).  Stage
        order pinned exactly like the text flow: pair discovery BEFORE
        admission mutates the embedding ledger, pair edges
        checkpointed before the components ingest consumes them
        twice."""
        from muller_spark.operators.components import (
            components_ledger_ingest,
        )
        from muller_spark.operators.dedup import (
            embedding_against_ledger,
            embedding_pairs_against_ledger,
        )

        pairs = embedding_pairs_against_ledger(
            batch_df, self.vec_col, self.id_col, self.embedding_path,
            threshold=self.threshold,
        ).select("id_a", "id_b").localCheckpoint()
        components_ledger_ingest(
            pairs, self.clusters_path, src="id_a", dst="id_b",
            lock=self.lock,
        )
        return embedding_against_ledger(
            batch_df, self.vec_col, self.id_col, self.embedding_path,
            threshold=self.threshold, update=True, lock=self.lock,
        )

    def stream(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int = 5,
        available_now: bool = False,
    ):
        """Streaming twin (``streaming/windows.
        semantic_dedup_flow_stream`` — shares this flow's ledger
        layout, so batch and stream ingest compose against the same
        state).  Survivors land exactly-once under
        ``<root>/admitted``.  ``init()`` must have run."""
        from muller_spark.streaming.windows import (
            semantic_dedup_flow_stream,
        )

        return semantic_dedup_flow_stream(
            stream_df, self.root, checkpoint_dir,
            vec_col=self.vec_col, id_col=self.id_col,
            threshold=self.threshold,
            trigger_seconds=trigger_seconds, available_now=available_now,
        )

    # -- reads -------------------------------------------------------------
    def labels(self) -> DataFrame:
        """Current cluster labels ``(id, component)`` — every vector
        that ever appeared in a semantic pair, labeled by its cluster's
        min id; singletons absent."""
        from muller_spark.operators.components import (
            components_ledger_report,
        )

        return components_ledger_report(self._spark(), self.clusters_path)

    def keep_best(self, scored_df: DataFrame, score_col: str) -> DataFrame:
        """Keep-list for ``scored_df``: one row per document with its
        cluster's winner (``keep_id``) and the ``keep`` verdict;
        singletons keep themselves."""
        from muller_spark.operators.dedup import keep_best_against_ledger

        return keep_best_against_ledger(
            scored_df, self.clusters_path, self.id_col, score_col
        )

    # -- maintenance -------------------------------------------------------
    def compact(self) -> None:
        """Fold the cluster ledger's remap log and distinct-fold the
        embedding ledger's bucket/vector logs."""
        from muller_spark.operators.components import (
            compact_components_ledger,
        )
        from muller_spark.operators.dedup import compact_embedding_ledger

        spark = self._spark()
        compact_components_ledger(spark, self.clusters_path, lock=self.lock)
        compact_embedding_ledger(spark, self.embedding_path, lock=self.lock)

    def _spark(self):
        from pyspark.sql import SparkSession

        return SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
