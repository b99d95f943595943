"""Edit-distance fuzzy term matching via deletion keys (SymSpell).

The reference's "fuzzy" search (`/root/reference/muller/core/query/
inverted_index_vectorized.py:741-758`) is AND-of-tokenized-terms —
no typo tolerance anywhere in the engine.  This module adds the
scale-correct primitive for edit-distance-1 term matching: the
SymSpell deletion-key construction (Garbe's symmetric delete
algorithm, public domain).  Two terms are within Levenshtein
distance 1 ONLY IF their {self} ∪ {single-char deletions} key sets
intersect — a theorem that turns fuzzy matching into an equi-join:

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


def deletion_keys(term: str) -> list[str]:
    """The probe-side key set: the term plus every single-character
    deletion (driver-side twin of the Column expression below)."""
    return [term] + [term[:i] + term[i + 1:] for i in range(len(term))]


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
    if max_edits != 1:
        raise ValueError(
            "fuzzy_terms_docs implements the single-edit deletion-key "
            f"construction; got max_edits={max_edits}"
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
    vocab = (
        toks.select("t")
        .distinct()
        .where(
            (F.length("t") <= F.lit(min(max_token_len + 1, int(max_len) + 1)))
            & (F.length("t") >= F.lit(int(min_len) - 1))
        )
    )
    vkeys = vocab.select(
        "t", F.explode(_deletion_keys_col(F.col("t"))).alias("k")
    )
    pkeys = probe_df.select(
        "probe", F.explode(_deletion_keys_col(F.col("probe"))).alias("k")
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

    ``max_edits`` must be 1 (the deletion-key completeness theorem
    used here covers one edit; higher radii need multi-deletion keys,
    which explode combinatorially and want a different design).
    Tokens longer than ``max_token_len`` are skipped on the vocabulary
    side (bounds the key fan-out per token; a 25-char token is not a
    plausible 1-edit neighbor of a short probe anyway — lengths may
    differ by at most 1 for distance 1, enforced separately below).
    """
    if max_edits != 1:
        raise ValueError(
            "fuzzy_term_docs implements the single-edit deletion-key "
            f"construction; got max_edits={max_edits}"
        )
    probe = probe.lower()
    if not probe:
        # an empty probe would "match" every single-char token via the
        # empty deletion key — a degenerate query, not a typo search
        raise ValueError("probe must be a non-empty term")
    if len(probe) > max_token_len:
        # the vocabulary-side cap would make the length window empty
        # (or exclude the probe's own length), silently returning zero
        # rows even on a verbatim hit — reject loudly instead, like
        # the empty-probe guard above
        raise ValueError(
            f"probe length {len(probe)} exceeds max_token_len "
            f"{max_token_len}; raise max_token_len to search for "
            "terms this long"
        )
    spark = df.sparkSession
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
    vocab = (
        toks.select("t")
        .distinct()
        # distance-1 neighbors differ in length by ≤ 1: prune before
        # the key explode (also caps fan-out via max_token_len)
        .where(
            (F.length("t") <= F.lit(min(max_token_len, len(probe) + 1)))
            & (F.length("t") >= F.lit(len(probe) - 1))
        )
    )
    vkeys = vocab.select(
        "t", F.explode(_deletion_keys_col(F.col("t"))).alias("k")
    )
    pkeys = spark.createDataFrame(
        [(k,) for k in sorted(set(deletion_keys(probe)))], "k string"
    )
    matched = (
        vkeys.join(F.broadcast(pkeys), "k")
        .select("t")
        .distinct()
        .where(F.levenshtein(F.col("t"), F.lit(probe)) <= max_edits)
    )
    return (
        toks.join(F.broadcast(matched), "t")
        .select("id")
        .distinct()
        .withColumnRenamed("id", id_col)
    )
