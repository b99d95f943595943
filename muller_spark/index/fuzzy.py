"""Edit-distance fuzzy term matching via deletion keys (SymSpell).

The reference's "fuzzy" search (`/root/reference/muller/core/query/
inverted_index_vectorized.py:741-758`) is AND-of-tokenized-terms —
no typo tolerance anywhere in the engine.  This module adds the
scale-correct primitive for edit-distance term matching: the
SymSpell deletion-key construction (Garbe's symmetric delete
algorithm, public domain).  Two terms are within Levenshtein
distance d ONLY IF their depth-≤d deletion neighborhoods intersect —
a theorem that turns fuzzy matching into an equi-join (d ∈ {1, 2}
here; the depth-2 fan-out is 1 + L + L(L−1)/2 keys per token,
bounded by the token-length cap):

- vocabulary side: explode each distinct token into ≤ len+1 keys;
- probe side: the probe's ≤ len+1 keys (computed driver-side, tiny,
  broadcast);
- verify: the key join is necessary-but-not-sufficient (e.g. "ab" and
  "ba" share deletion keys at distance 2), so candidates pass through
  an exact ``levenshtein() ≤ max_edits`` filter — complete by the
  key theorem, exact by the verify.

No stage ever scans the vocabulary against the probe: the plan is
token explode → distinct → bounded key explode → broadcast-join the
handful of probe keys → Levenshtein on the candidate sliver → semi-
join back to documents.  At 100 TB the vocabulary key table is the
only corpus-sized artifact, and it shuffles once on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from muller_spark.plans.conditions import TOKEN_SPLIT_REGEX


def deletion_keys(term: str, max_edits: int = 1) -> list[str]:
    """The probe-side key set: the term plus every deletion of up to
    ``max_edits`` characters (driver-side twin of the Column
    expressions below).  Depth 2 is the full symmetric-delete
    neighborhood for Levenshtein radius 2."""
    keys = {term}
    frontier = {term}
    for _ in range(max_edits):
        frontier = {
            t[:i] + t[i + 1:] for t in frontier for i in range(len(t))
        }
        keys |= frontier
    return sorted(keys)


def _deletion_keys_col(t: Column) -> Column:
    """{t} ∪ single-char deletions of t, as an array Column (JVM-side:
    a transform over character positions, no Python round-trip)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.concat(
            F.substring(t, F.lit(1), i - F.lit(1)),
            t.substr(i + F.lit(1), F.length(t)),
        ),
    )
    return F.array_union(F.array(t), dels)


def _deletion_keys2_col(t: Column) -> Column:
    """{t} ∪ 1-char ∪ 2-char deletions of t (JVM-side).  The 2-char
    layer deletes positions i<j in one pass (three-way substring
    concat), so the fan-out is 1 + L + L(L-1)/2 keys per token —
    bounded by max_token_len before this is ever evaluated.  Guarded
    for L<2 (Spark's sequence() runs DESCENDING when start > stop, so
    an unguarded sequence(2, L) would fabricate keys)."""
    two = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(1)),
            lambda i: F.transform(
                F.sequence(i + F.lit(1), F.length(t)),
                lambda j: F.concat(
                    F.substring(t, F.lit(1), i - F.lit(1)),
                    t.substr(i + F.lit(1), j - i - F.lit(1)),
                    t.substr(j + F.lit(1), F.length(t)),
                ),
            ),
        )
    )
    return F.array_union(
        _deletion_keys_col(t),
        F.when(F.length(t) >= 2, F.array_distinct(two)).otherwise(
            F.array()
        ),
    )


def _keys_col(t: Column, max_edits: int) -> Column:
    return _deletion_keys_col(t) if max_edits == 1 else _deletion_keys2_col(t)


def fuzzy_terms_docs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    probes,
    max_edits: int = 1,
    max_token_len: int = 24,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Typo-tolerant containment over a probe TABLE: ``(probe,
    id_col)`` pairs where the document contains any token within
    ``max_edits`` (Levenshtein) of that probe — the batch shape of
    :func:`fuzzy_term_docs` for dictionaries of variant terms,
    decontamination word lists, and PII term sweeps.

    ``probes`` is either a sequence of strings or a single-column
    DataFrame; probes are lower-cased and de-duplicated.  The plan is
    the single-probe plan with the probe side generalized from a
    broadcast literal list to a small keyed frame:

    - probe keys: each probe explodes to ≤ len+1 deletion keys,
      carried WITH its probe so matches stay keyed by probe;
    - vocabulary keys: distinct corpus tokens pruned to the GLOBAL
      probe length window [min_len−1, max_len+1] (lengths at distance
      1 differ by ≤ 1) before the bounded key explode — one corpus-
      sized artifact, shuffled once on the key, independent of probe
      count;
    - verify: exact ``levenshtein(t, probe) ≤ max_edits`` on the
      candidate sliver (the per-probe length discipline rides the
      verify — the global window only bounds the explode);
    - output: document tokens joined to the matched (probe, term)
      pairs, distinct per (probe, id).

    Empty probes and probes longer than ``max_token_len`` are rejected
    loudly (they would silently return zero or degenerate rows — the
    single-probe guards, applied table-wide; for a DataFrame input the
    validation is one bounded aggregate over the probe table).
    ``broadcast_probes=False`` drops the broadcast hints for
    dictionaries too large to broadcast — the key join then shuffles,
    still never scanning vocabulary × probes.
    """
    if max_edits not in (1, 2):
        raise ValueError(
            "fuzzy_terms_docs implements the symmetric-delete "
            f"construction for max_edits in (1, 2); got {max_edits}"
        )
    spark = df.sparkSession
    if isinstance(probes, DataFrame):
        pcol = probes.columns[0]
        probe_df = (
            probes.select(F.lower(F.col(pcol).cast("string")).alias("probe"))
            .where(F.col("probe").isNotNull())
            .distinct()
        )
        n_probes, min_len, max_len = probe_df.agg(
            F.count(F.lit(1)), F.min(F.length("probe")),
            F.max(F.length("probe")),
        ).first()
        if not n_probes:
            raise ValueError("probes table is empty")
        if min_len == 0:
            raise ValueError("probes table contains an empty term")
        if max_len > max_token_len:
            raise ValueError(
                f"probes table contains a term of length {max_len} > "
                f"max_token_len {max_token_len}; raise max_token_len"
            )
    else:
        plist = sorted({str(p).lower() for p in probes})
        if not plist:
            raise ValueError("probes must contain at least one term")
        for p in plist:
            if not p:
                raise ValueError("probes must be non-empty terms")
            if len(p) > max_token_len:
                raise ValueError(
                    f"probe {p!r} length {len(p)} exceeds max_token_len "
                    f"{max_token_len}; raise max_token_len"
                )
        min_len = min(len(p) for p in plist)
        max_len = max(len(p) for p in plist)
        probe_df = spark.createDataFrame([(p,) for p in plist], "probe string")

    hint = F.broadcast if broadcast_probes else (lambda d: d)
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_REGEX)
                )
            ).alias("t"),
        )
        .where(F.col("t") != "")
    )
    # round 13 (guide §1.2): the token frame feeds BOTH the vocabulary
    # branch and the final containment join — pin it so the tokenize
    # pass runs once, not twice (MEMORY_AND_DISK_DESER: eviction
    # degrades to a recompute of the map-only explode, never an OOM)
    from pyspark import StorageLevel

    toks = toks.persist(StorageLevel.MEMORY_AND_DISK_DESER)
    vocab = (
        toks.select("t")
        .distinct()
        .where(
            (F.length("t") <= F.lit(
                min(max_token_len + max_edits, int(max_len) + max_edits)
            ))
            & (F.length("t") >= F.lit(int(min_len) - max_edits))
        )
    )
    vkeys = vocab.select(
        "t", F.explode(_keys_col(F.col("t"), max_edits)).alias("k")
    )
    pkeys = probe_df.select(
        "probe", F.explode(_keys_col(F.col("probe"), max_edits)).alias("k")
    )
    matched = (
        vkeys.join(hint(pkeys), "k")
        .select("probe", "t")
        .distinct()
        .where(F.levenshtein(F.col("t"), F.col("probe")) <= max_edits)
    )
    return (
        toks.join(hint(matched), "t")
        .select("probe", "id")
        .distinct()
        .withColumnRenamed("id", id_col)
    )


def fuzzy_term_docs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    probe: str,
    max_edits: int = 1,
    max_token_len: int = 24,
) -> DataFrame:
    """Ids of documents containing any token within ``max_edits``
    (Levenshtein) of ``probe`` — typo-tolerant containment search.
    Sugar over :func:`fuzzy_terms_docs` with a one-row probe table
    (same plan: the probe keys broadcast, the vocabulary explodes
    once, the verify is exact); ``max_edits`` ∈ {1, 2} — depth-2
    symmetric deletes fan out to 1 + L + L(L−1)/2 keys per token,
    bounded by ``max_token_len``.  Probes that are empty or longer
    than ``max_token_len`` are rejected loudly (an empty probe would
    "match" every short token via the empty key; an overlong one
    would silently return zero rows even on a verbatim hit)."""
    return fuzzy_terms_docs(
        df, text_col, id_col, [probe],
        max_edits=max_edits, max_token_len=max_token_len,
    ).select(id_col)
