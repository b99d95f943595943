"""End-to-end training-data curation: quality gate → exact dedup →
per-source top-fraction selection, composed from the individually
oracle-proven operators.

This is the pipeline a 100 TB pre-training ingest actually runs (the
FineWeb / CCNet / Gopher recipe shape): score every document with
cheap JVM-side heuristics, drop the junk, collapse exact duplicates
keeping one canonical copy, then keep the best fraction of each
source so no domain dominates the mixture.

Reference parity: the reference expresses this as a chained
filter → dedup → sample user script over
/root/reference/muller/core/query/filter_vectorized.py and
/root/reference/muller/core/query/aggregate.py; here it is ONE
composed DataFrame plan, so Catalyst sees the whole pipeline (the
quality filter prunes before the dedup shuffle, the tokenize runs
once, and the final per-source window runs on the surviving sliver).

Scale shape of the composed plan:
- quality scoring is map-only (one tokenize pass per row);
- the dedup is ONE min_by hash aggregate on md5(normalized text)
  (map-side partials, no semi-join-back, so the corpus and its
  tokenize are scanned once) on the PRUNED survivor set, never the
  raw corpus;
- the per-source top-fraction is one window shuffle on the source
  key (skew bounded by the largest single source — salt upstream if
  one source is a large share of the corpus).
No driver state, no broadcasts of SF-scaling frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from muller_spark.operators.dedup import normalized_text
from muller_spark.operators.sampling import top_fraction_per_group
from muller_spark.operators.text import quality_score


def curation_pipeline(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    quality_min: float = 0.5,
    top_fraction: float = 0.5,
    normalize: bool = True,
) -> DataFrame:
    """Quality-gate, dedup, and per-group-select ``df`` in one plan.

    Steps (each step sees only the previous step's survivors):
      1. ``quality_score`` >= ``quality_min`` (NULL text never
         survives: content-free rows score through the 0-token
         branch and carry no content identity for step 2);
      2. exact dedup on (optionally normalized) content — the
         MIN-id copy of each content group survives;
      3. ``top_fraction_per_group``: ceil(round(n·fraction, 9))
         best-scoring docs per ``group_col``, id ascending on ties.

    Returns (id_col, group_col, quality_score) ordered by nothing —
    order downstream.  Deterministic for fixed input: every cut is a
    pure function of content, score, and id.
    """
    scored = (
        quality_score(df, text_col)
        .filter(F.col(text_col).isNotNull())
        .filter(F.col("quality_score") >= quality_min)
        .select(id_col, group_col, text_col, "quality_score")
    )
    # Same keep-min-id contract as operators.dedup.exact_dedup, folded
    # into ONE min_by hash aggregate instead of groupBy + semi-join-back:
    # the semi-join form evaluates `scored` (and its tokenize) twice —
    # once per join side — while min_by carries the survivor's columns
    # through map-side partial aggregation in a single scan.
    content = (
        normalized_text(F.col(text_col)) if normalize else F.col(text_col)
    )
    survivors = (
        scored.groupBy(F.md5(content).alias("_content_hash"))
        .agg(
            F.min_by(
                F.struct(
                    F.col(id_col), F.col(group_col), F.col("quality_score")
                ),
                F.col(id_col),
            ).alias("_keep")
        )
        .select(
            F.col(f"_keep.{id_col}").alias(id_col),
            F.col(f"_keep.{group_col}").alias(group_col),
            F.col("_keep.quality_score").alias("quality_score"),
        )
    )
    return top_fraction_per_group(
        survivors,
        group_col,
        "quality_score",
        top_fraction,
        tie_break=id_col,
    ).select(id_col, group_col, "quality_score")
