"""The documented 100 TB composition, made a TESTED path: LSH-banded
candidate prefilter → exact Jaccard verify on the candidate sliver →
the same cluster/split/keep tails that the corpus-wide exact pair stage
feeds.  On a corpus where LSH recall is 1.0 the two paths must agree
EXACTLY — pairs, jaccard values, split assignments, keep verdicts.

Reference parity: the MULLER dedup/curation flows run pair discovery
as a pluggable stage (/root/reference/muller docs position exact
verification after candidate generation at scale); here the plug point
is the ``pairs=`` parameter on leakage_safe_split / canonical_keep_best.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from muller_spark.operators.dedup import (
    canonical_keep_best,
    lsh_verified_pairs,
    ngram_jaccard_pairs,
)
from muller_spark.operators.sampling import leakage_safe_split


@pytest.fixture(scope="module")
def corpus(spark):
    """Dense near-dup families + unrelated singletons: easy for
    (64, 32) banding (S-curve midpoint ~0.18 « threshold 0.5), so LSH
    recall is 1.0 and path parity is exact, not approximate."""
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "machine learning models require large curated training corpora",
        "open source database engines optimize analytical query plans",
    ]
    rows = []
    for fam, text in enumerate(base):
        for v in range(6):
            rows.append((fam * 100 + v, text + f" variant {v % 2}"))
    rows += [(900 + i, f"completely unrelated document {i} topic{i} alpha{i}")
             for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pair_map(df):
    return {(r["id_a"], r["id_b"]): r["jaccard"] for r in df.collect()}


def test_lsh_verified_pairs_match_exact(corpus):
    exact = _pair_map(ngram_jaccard_pairs(
        corpus, "text", "doc_id", n=3, threshold=0.5, max_shingle_freq=None
    ))
    lsh = _pair_map(lsh_verified_pairs(
        corpus, "text", "doc_id", n=3, threshold=0.5,
        num_hashes=64, bands=32,
    ))
    assert exact, "fixture must produce near-dup pairs"
    # exactness: every surviving pair is a true pair with the identical
    # jaccard (same integer counts -> same IEEE division)
    assert set(lsh) <= set(exact)
    for k in lsh:
        assert lsh[k] == exact[k]
    # recall 1.0 on this corpus: the prefilter lost nothing
    assert set(lsh) == set(exact)


def test_lsh_verified_pairs_portable_kernel(corpus):
    a = _pair_map(lsh_verified_pairs(
        corpus, "text", "doc_id", threshold=0.5, bands=32, portable=True
    ))
    b = _pair_map(lsh_verified_pairs(
        corpus, "text", "doc_id", threshold=0.5, bands=32, portable=False
    ))
    # both kernels at full recall: identical verified output
    assert a == b and a


def test_leakage_split_parity_exact_vs_lsh(corpus):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    exact = {r["doc_id"]: r["split"] for r in leakage_safe_split(
        corpus, "text", "doc_id", weights
    ).collect()}
    pairs = lsh_verified_pairs(
        corpus, "text", "doc_id", threshold=0.5, bands=32
    )
    lsh = {r["doc_id"]: r["split"] for r in leakage_safe_split(
        corpus, "text", "doc_id", weights, pairs=pairs
    ).collect()}
    assert lsh == exact
    # and the no-leak property itself: each family in ONE split
    for fam in (0, 100, 200):
        fam_splits = {lsh[fam + v] for v in range(6)}
        assert len(fam_splits) == 1, f"family {fam} split across {fam_splits}"


def test_keep_best_parity_exact_vs_lsh(corpus):
    scored = corpus.withColumn(
        "score", (F.col("doc_id") % 7).cast("double")
    )
    exact_pairs = ngram_jaccard_pairs(
        corpus, "text", "doc_id", n=3, threshold=0.5, max_shingle_freq=None
    )
    lsh_pairs = lsh_verified_pairs(
        corpus, "text", "doc_id", threshold=0.5, bands=32
    )
    a = {r["id"]: (r["keep_id"], r["keep"]) for r in canonical_keep_best(
        scored, exact_pairs, "doc_id", "score"
    ).collect()}
    b = {r["id"]: (r["keep_id"], r["keep"]) for r in canonical_keep_best(
        scored, lsh_pairs, "doc_id", "score"
    ).collect()}
    assert a == b and a


def test_lsh_verified_containment_matches_exact(corpus):
    from muller_spark.operators.dedup import ngram_containment_pairs

    exact = {
        (r["id_a"], r["id_b"]): (r["inter"], r["size_a"], r["size_b"],
                                 r["containment"])
        for r in ngram_containment_pairs(
            corpus, "text", "doc_id", n=3, threshold=0.6,
            max_shingle_freq=None,
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): (r["inter"], r["size_a"], r["size_b"],
                                 r["containment"])
        for r in lsh_verified_pairs(
            corpus, "text", "doc_id", n=3, threshold=0.6,
            num_hashes=64, bands=32, metric="containment",
        ).collect()
    }
    assert exact, "fixture must produce containment pairs"
    # exactness: every surviving pair carries the exact kernel's counts
    # and the identical IEEE division
    assert set(lsh) <= set(exact)
    for k in lsh:
        assert lsh[k] == exact[k]
    # recall 1.0 here: family variants have Jaccard well above the
    # (64,32) S-curve midpoint, so Jaccard banding finds every
    # containment pair of this corpus (the asymmetric-size recall
    # caveat is documented on the operator, not exercised by same-size
    # variants)
    assert set(lsh) == set(exact)


def test_lsh_containment_schema_matches_exact_kernel(corpus):
    from muller_spark.operators.dedup import ngram_containment_pairs

    a = ngram_containment_pairs(
        corpus, "text", "doc_id", threshold=0.6, max_shingle_freq=None
    )
    b = lsh_verified_pairs(
        corpus, "text", "doc_id", threshold=0.6, metric="containment"
    )
    assert [(f.name, f.dataType.simpleString()) for f in a.schema.fields] \
        == [(f.name, f.dataType.simpleString()) for f in b.schema.fields]


def test_lsh_verified_pairs_rejects_unknown_metric(corpus):
    with pytest.raises(ValueError):
        lsh_verified_pairs(corpus, "text", "doc_id", metric="cosine")


def test_prefix_verified_jaccard_equals_exact(corpus):
    """Prefix filtering (AllPairs/PPJoin) is COMPLETE by theorem — the
    output must equal the corpus-wide exact kernel's, pair for pair,
    value for value, at any threshold."""
    from muller_spark.operators.dedup import prefix_verified_pairs

    for t in (0.3, 0.5, 0.8):
        exact = _pair_map(ngram_jaccard_pairs(
            corpus, "text", "doc_id", n=3, threshold=t, max_shingle_freq=None
        ))
        pfx = _pair_map(prefix_verified_pairs(
            corpus, "text", "doc_id", n=3, threshold=t, metric="jaccard"
        ))
        assert pfx == exact, f"threshold {t}"
    assert exact or t == 0.8  # the fixture produces pairs at low t


def test_prefix_verified_containment_equals_exact(corpus):
    from muller_spark.operators.dedup import (
        ngram_containment_pairs, prefix_verified_pairs,
    )

    def cmap(df):
        return {
            (r["id_a"], r["id_b"]): (r["inter"], r["size_a"], r["size_b"],
                                     r["containment"])
            for r in df.collect()
        }

    exact = cmap(ngram_containment_pairs(
        corpus, "text", "doc_id", n=3, threshold=0.6, max_shingle_freq=None
    ))
    pfx = cmap(prefix_verified_pairs(
        corpus, "text", "doc_id", n=3, threshold=0.6, metric="containment"
    ))
    assert pfx == exact and exact


def test_prefix_catches_short_embedded_in_long(spark):
    """The case Jaccard-LSH banding can MISS (documented caveat on
    lsh_verified_pairs): a short doc quoted wholesale inside a much
    longer one — containment ~1, Jaccard ~|A|/|B| « banding midpoint.
    The prefix path must find it (completeness theorem), matching the
    exact kernel."""
    from muller_spark.operators.dedup import (
        ngram_containment_pairs, prefix_verified_pairs,
    )

    short = "the reactor safety margin depends on coolant flow rate"
    filler = " ".join(f"unrelated filler token{i} alpha{i} beta{i}"
                      for i in range(60))
    rows = [
        (1, short),
        (2, filler + " " + short + " " + filler.replace("token", "word")),
        (3, "entirely different content about music theory and chords"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in ngram_containment_pairs(
            df, "text", "doc_id", n=3, threshold=0.8, max_shingle_freq=None
        ).collect()
    }
    pfx = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in prefix_verified_pairs(
            df, "text", "doc_id", n=3, threshold=0.8, metric="containment"
        ).collect()
    }
    assert (1, 2) in exact and exact[(1, 2)] >= 0.8
    assert pfx == exact


def test_prefix_verified_rejects_bad_args(corpus):
    from muller_spark.operators.dedup import prefix_verified_pairs

    with pytest.raises(ValueError, match="metric"):
        prefix_verified_pairs(corpus, "text", "doc_id", metric="cosine")
    with pytest.raises(ValueError, match="threshold"):
        prefix_verified_pairs(corpus, "text", "doc_id", threshold=0.0)
    with pytest.raises(ValueError, match="prefix_order"):
        prefix_verified_pairs(corpus, "text", "doc_id", prefix_order="random")


def test_prefix_order_invariance(corpus):
    """The completeness theorem holds for ANY global total order —
    df-ascending and lexical prefixes must produce the identical
    verified pair set."""
    from muller_spark.operators.dedup import prefix_verified_pairs

    a = _pair_map(prefix_verified_pairs(
        corpus, "text", "doc_id", threshold=0.5, prefix_order="df"
    ))
    b = _pair_map(prefix_verified_pairs(
        corpus, "text", "doc_id", threshold=0.5, prefix_order="lexical"
    ))
    assert a == b and a


def test_verified_pairs_never_emit_false_positives(spark):
    """Below-threshold LSH candidates (band collisions happen at any
    similarity) must be killed by the verify stage."""
    rows = [(i, f"some shared prefix tokens here then unique tail {i} "
                f"word{i} item{i} thing{i} object{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lsh_verified_pairs(df, "text", "doc_id", threshold=0.9, bands=32)
    truth = _pair_map(ngram_jaccard_pairs(
        df, "text", "doc_id", threshold=0.9, max_shingle_freq=None
    ))
    for r in out.collect():
        assert (r["id_a"], r["id_b"]) in truth
        assert r["jaccard"] >= 0.9


def test_prefix_skew_guard_fires_and_output_stays_exact(spark):
    """Round 10: the documented prefix-filter worst case (clone-
    replicated corpora) now has a runtime guard.  On a 12x-cloned
    corpus the mean-df probe must warn (or raise under
    skew_probe='error'), the warning must point at the LSH
    alternative, and the output must STILL equal the exact kernel's —
    the guard prices the run, it never changes completeness."""
    import warnings

    from muller_spark.operators.dedup import (
        ngram_jaccard_pairs, prefix_verified_pairs,
    )

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "a completely different sentence about database systems here",
        "spark catalyst optimizer rewrites logical plans into physical",
    ]
    rows = [(100 * c + i, t) for i, t in enumerate(base) for c in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    with pytest.warns(UserWarning, match="lsh_verified_pairs"):
        pfx = _pair_map(prefix_verified_pairs(
            df, "text", "doc_id", n=3, threshold=0.5, metric="jaccard"
        ))
    exact = _pair_map(ngram_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold=0.5, max_shingle_freq=None
    ))
    assert pfx == exact and exact  # 12 clones x 3 families -> pairs

    with pytest.raises(ValueError, match="skew guard"):
        prefix_verified_pairs(
            df, "text", "doc_id", skew_probe="error"
        )
    with pytest.raises(ValueError, match="skew_probe"):
        prefix_verified_pairs(df, "text", "doc_id", skew_probe="loud")

    # probe off: no warning, same output
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        quiet = _pair_map(prefix_verified_pairs(
            df, "text", "doc_id", n=3, threshold=0.5, metric="jaccard",
            skew_probe="off",
        ))
    assert quiet == exact


def test_prefix_skew_guard_quiet_on_low_skew(corpus):
    """The guard must NOT fire on an ordinary low-replication corpus
    (the fixture's near-dup families keep mean df well under the
    threshold)."""
    import warnings

    from muller_spark.operators.dedup import prefix_verified_pairs

    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        prefix_verified_pairs(
            corpus, "text", "doc_id", n=3, threshold=0.5
        ).collect()
