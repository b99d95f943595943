"""Change-data-capture application: apply a keyed changelog (or a plain
upsert batch) to a snapshot as one declarative plan.

The reference mutates datasets in place (``update`` / ``append`` row
ops, SURVEY §2.3); at 100 TB the pipeline-shaped equivalent is
re-ingest: a day's crawl produces a changelog of inserts/updates/
deletes that must be folded into the corpus snapshot.  Both operators
here are pure DataFrame compositions:

- ``upsert`` — last-write-wins merge of an update batch into a target:
  one anti-join shuffle on the key (AQE broadcasts the batch while it
  fits) plus a union.  The target is never widened, exploded, or
  windowed — the cost is O(target scan + batch) at any scale.
- ``apply_changelog`` — full CDC semantics: the changelog carries an
  op column (insert/update/delete) and a sequence column; only the
  LATEST change per key wins (per-key window over the changelog only —
  the changelog is the small side, the snapshot is never windowed),
  deletes drop the row, inserts/updates replace it.

Both return new DataFrames (CoW — pair with ``Dataset.commit`` for a
versioned fold-in).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Merge ``updates`` into ``target`` by ``keys``: matched target
    rows are replaced by their update row, unmatched update rows are
    inserted.  ``updates`` must carry the full target schema.

    If the batch holds several rows for one key the caller must
    pre-dedupe (use :func:`apply_changelog` with a sequence column for
    last-write-wins) — this operator is deliberately a two-step plan
    (anti-join + union) with no window, so a duplicate-keyed batch
    would insert duplicates rather than silently picking a winner.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("upsert needs at least one key column")
    missing = [c for c in target.columns if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing target columns: {missing}")
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    insert_ops: Sequence[str] = ("I", "U"),
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC changelog to ``snapshot`` with last-write-wins
    semantics per key.

    ``changes`` columns: the snapshot schema plus ``op_col`` (values in
    ``insert_ops`` upsert the row, ``delete_op`` removes it) and
    ``seq_col`` (monotone change order; the max-``seq_col`` change per
    key is the one applied — earlier changes to the same key are
    superseded, matching Debezium/Delta CDF apply semantics).

    Plan shape: one per-key window over the CHANGELOG (the small,
    recent side — the snapshot is never windowed or widened), then the
    same anti-join + union as :func:`upsert`.  Ties on ``seq_col``
    break deterministically by preferring the delete (a delete and an
    upsert bearing the same sequence number is producer misbehavior;
    biasing to delete keeps re-runs idempotent rather than
    order-dependent).

    Op values outside ``insert_ops`` + ``delete_op`` FAIL the job at
    execution time (a row-level ``raise_error`` guard in the plan — no
    extra validation pass).  Without the guard an unknown op (e.g. a
    producer switching to lowercase 'u') would anti-join the key out
    of the snapshot and then contribute no upsert row — i.e. a silent
    delete of every touched key.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("apply_changelog needs at least one key column")
    for c in (seq_col, op_col):
        if c not in changes.columns:
            raise ValueError(f"changes is missing required column {c!r}")

    known = F.col(op_col).isin(delete_op, *insert_ops)
    changes = changes.withColumn(
        op_col,
        F.when(known, F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "apply_changelog: op value outside "
                        f"{tuple(insert_ops)} + {delete_op!r}: "
                    ),
                    F.coalesce(F.col(op_col), F.lit("NULL")),
                )
            )
        ),
    )
    is_delete = F.col(op_col) == delete_op
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), is_delete.cast("int").desc()
    )
    latest = (
        changes.withColumn("_cdc_rn", F.row_number().over(w))
        .filter(F.col("_cdc_rn") == 1)
        .drop("_cdc_rn")
    )
    # The anti-join side needs only "which keys changed at all" — any
    # changed key's snapshot row is superseded regardless of which
    # change won.  Using distinct keys instead of `latest` keeps the
    # window out of this branch (it would otherwise be COMPUTED TWICE:
    # DataFrame reuse duplicates the subplan), so the changelog pays
    # one distinct + one windowed top-1, both on the small side.
    changed_keys = changes.select(*keys).distinct()
    kept = snapshot.join(changed_keys, keys, "left_anti")
    upserts = latest.filter(F.col(op_col).isin(*insert_ops)).select(
        *snapshot.columns
    )
    return kept.unionByName(upserts)
