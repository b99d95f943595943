"""Quality-filter operators (operators/quality.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.quality import (  # noqa: E402
    gopher_filter,
    pii_scan,
    repetition_stats,
)


@pytest.fixture(scope="module")
def qdocs(spark):
    rows = [
        (0, "spam spam spam spam"),                              # pure repetition
        (1, "the quick brown fox jumps over the lazy dog"),      # normal prose
        (2, ""),                                                 # empty
        (3, "alpha beta alpha beta alpha beta"),                 # bigram loop
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_repetition_stats_values(qdocs):
    out = {r["id"]: r for r in repetition_stats(qdocs, "text", "doc_id").collect()}
    r0 = out[0]
    assert r0["n_words"] == 4
    assert r0["distinct_word_frac"] == 0.25
    assert r0["consec_dup_frac"] == 1.0
    assert r0["top_bigram_frac"] == 1.0          # only gram: "spam spam"
    r1 = out[1]
    assert r1["n_words"] == 9
    assert r1["consec_dup_frac"] == 0.0
    assert r1["distinct_word_frac"] == pytest.approx(8 / 9, abs=1e-6)
    r2 = out[2]
    assert r2["n_words"] == 0 and r2["top_bigram_frac"] == 0.0
    r3 = out[3]
    # "alpha beta"×3 of 5 bigrams
    assert r3["top_bigram_frac"] == 0.6


def test_gopher_filter_flags(qdocs):
    out = {r["id"]: r for r in gopher_filter(
        qdocs, "text", "doc_id", min_words=4, min_stop_hits=0,
    ).collect()}
    assert not out[0]["pass_consec"] and not out[0]["keep"]
    assert out[1]["pass_word_len"] and out[1]["pass_consec"]
    assert not out[2]["pass_n_words"] and not out[2]["keep"]
    assert out[1]["stop_hits"] == 1              # 'the'


def test_stratified_sample_fractions(spark):
    from pyspark.sql import functions as F

    from muller_spark.operators.sampling import stratified_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, s string")
    out = stratified_sample(
        df, F.col("id"), "s", {"a": 1.0, "b": 0.25}
    )
    counts = {r["s"]: r["n"] for r in
              out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["a"] == 1000                       # keep-all stratum
    assert 150 <= counts.get("b", 0) <= 350          # ~25% of 1000
    # deterministic: identical second evaluation
    ids1 = sorted(r["id"] for r in out.collect())
    ids2 = sorted(r["id"] for r in stratified_sample(
        df, F.col("id"), "s", {"a": 1.0, "b": 0.25}).collect())
    assert ids1 == ids2
    # strata not listed fall back to default_fraction=0
    extra = spark.createDataFrame([(1, "zz")], "id long, s string")
    assert stratified_sample(extra, F.col("id"), "s", {"a": 1.0}).count() == 0


def test_group_zscores_values(spark):
    from muller_spark.operators.quality import group_zscores

    df = spark.createDataFrame(
        [(1, "g", 10.0), (2, "g", 20.0), (3, "g", 30.0), (4, "h", 5.0)],
        "id long, g string, v double",
    )
    out = {r["id"]: r for r in group_zscores(df, "v", ["g"]).collect()}
    assert out[1]["group_mean"] == 20.0
    assert out[1]["group_std"] == 10.0               # sample std of {10,20,30}
    assert out[1]["z"] == -1.0 and out[3]["z"] == 1.0 and out[2]["z"] == 0.0
    assert out[4]["z"] is None                       # n=1 group → NULL


def test_validate_expectations(spark):
    from pyspark.sql import functions as F

    from muller_spark.operators.validate import (
        ExpectationError,
        duplicate_keys,
        validate,
        validate_or_raise,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (1, 3.0)],
        "id long, v double",
    )
    rules = {
        "v_not_null": F.col("v").isNotNull(),
        "v_positive": F.col("v") > 0,
    }
    rep = {r["rule"]: r for r in validate(df, rules).collect()}
    assert rep["v_not_null"]["n_violations"] == 1
    # NULL predicate counts as violation, plus the genuine negative
    assert rep["v_positive"]["n_violations"] == 2
    assert rep["v_positive"]["violation_frac"] == 0.5

    dups = duplicate_keys(df, ["id"]).collect()
    assert [(r["id"], r["n_occurrences"]) for r in dups] == [(1, 2)]

    with pytest.raises(ExpectationError, match="v_positive"):
        validate_or_raise(df, rules)
    # tolerant gate passes through
    assert validate_or_raise(df, rules, max_violation_frac=0.6) is df


def test_pii_scan_counts(spark):
    rows = [
        (0, "mail me at a@b.co or c.d@e-f.org today"),
        (1, "server 10.0.0.1 and gateway 192.168.1.254"),
        (2, "call +1 (555) 123-4567 now"),
        (3, "see https://x.com/a?b=1 and http://y.io"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in pii_scan(df, "text", "doc_id").collect()}
    assert out[0]["n_emails"] == 2 and out[0]["has_pii"]
    assert out[1]["n_ipv4"] == 2
    assert out[2]["n_phones"] == 1
    assert out[3]["n_urls"] == 2
    assert not out[4]["has_pii"]


def test_group_zscores_null_group_and_constant_group(spark):
    """Round-6 review: (1) rows whose group key is NULL must survive the
    stats join (null-safe equi-join), and (2) a constant-valued group's
    variance can cancel to a tiny NEGATIVE double — z must be NULL, not
    the NaN sqrt(-1e-20) produces."""
    from muller_spark.operators.quality import group_zscores

    rows = [("en", 10.0), ("en", 20.0), ("en", 30.0)]
    rows += [(None, 5.0), (None, 6.0)]
    rows += [("cz", 0.01)] * 5  # constant group: power sums cancel
    df = spark.createDataFrame(rows, "lang string, v double")
    out = group_zscores(df, "v", ["lang"], scale=2).collect()
    assert len(out) == len(rows), "NULL-group rows were dropped by the join"
    null_rows = [r for r in out if r["lang"] is None]
    assert len(null_rows) == 2 and all(r["z"] is not None for r in null_rows)
    cz = [r for r in out if r["lang"] == "cz"]
    import math
    for r in cz:
        assert r["z"] is None, f"constant group z should be NULL, got {r['z']}"
        assert r["group_std"] is not None and not math.isnan(r["group_std"])


def test_mad_outliers_null_group_not_dropped(spark):
    from muller_spark.operators.quality import mad_outliers

    rows = [(None, float(v)) for v in [1, 2, 3, 4, 100]]
    df = spark.createDataFrame(rows, "g string, v double")
    out = mad_outliers(df, "v", ["g"], threshold=3.5).collect()
    assert [r["v"] for r in out] == [100.0]  # the outlier in the NULL group


def test_pii_scan_null_text_total_verdict(spark):
    from muller_spark.operators.quality import pii_scan

    df = spark.createDataFrame(
        [(1, "mail a@b.co"), (2, None)], "id long, text string"
    )
    rows = {r["id"]: r for r in pii_scan(df, "text", "id").collect()}
    assert rows[2]["n_emails"] == 0 and rows[2]["has_pii"] is False
    assert rows[1]["has_pii"] is True


def test_pipeline_survival_empty_stages_raises(spark):
    from muller_spark.operators.quality import pipeline_survival

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="at least one stage"):
        pipeline_survival(df, [])


def test_psi_drift_identical_distributions_near_zero(spark):
    from muller_spark.operators.quality import psi_drift

    df = spark.createDataFrame(
        [(float(i),) for i in range(100)], "value double"
    )
    out = psi_drift(df, df, "value", buckets=10).collect()
    assert len(out) == 10
    assert sum(r["psi_contrib"] for r in out) < 1e-9
    # reference deciles: each bucket holds ~10% of the reference
    assert all(abs(r["ref_frac"] - 0.1) < 0.02 for r in out)


def test_psi_drift_shift_is_large_and_buckets_stay_finite(spark):
    from muller_spark.operators.quality import psi_drift

    ref = spark.createDataFrame([(float(i),) for i in range(100)], "value double")
    cur = spark.createDataFrame(
        [(float(i + 200),) for i in range(100)], "value double"
    )
    out = psi_drift(ref, cur, "value", buckets=10).collect()
    psi = sum(r["psi_contrib"] for r in out)
    assert psi > 0.25  # "shifted" by the public rule of thumb
    # every current row lands in the top bucket; the empty ones are
    # finite thanks to Laplace smoothing
    import math

    assert all(math.isfinite(r["psi_contrib"]) for r in out)
    top = [r for r in out if r["bucket"] == 9][0]
    assert top["cur_frac"] > 0.9


def test_psi_drift_excludes_nulls_and_validates(spark):
    import pytest as _pytest

    from muller_spark.operators.quality import psi_drift

    ref = spark.createDataFrame(
        [(float(i),) for i in range(20)] + [(None,)] * 5, "value double"
    )
    out = psi_drift(ref, ref, "value", buckets=4).collect()
    # fractions built from the 20 non-null rows only: ~uniform quarters
    assert all(abs(r["ref_frac"] - 0.25) < 0.05 for r in out)
    with _pytest.raises(ValueError, match="buckets"):
        psi_drift(ref, ref, "value", buckets=1)


def test_pii_redact_known_answers(spark):
    from muller_spark.operators.quality import pii_redact

    rows = [
        (1, "email me at bob@test.org or visit https://a.b/c?d=1"),
        (2, "server 10.0.0.1 and phone +1 (555) 123-4567 here"),
        (3, "perfectly clean text with nothing sensitive"),
        (4, None),
        (5, "two mails: a@b.co x@y.io"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in pii_redact(df, "text", "doc_id").collect()}
    assert got[1]["redacted"] == "email me at <EMAIL> or visit <URL>"
    assert got[1]["n_redactions"] == 2
    assert got[2]["redacted"] == "server <IP> and phone <PHONE> here"
    assert got[2]["n_redactions"] == 2
    assert got[3]["redacted"] == rows[2][1] and got[3]["n_redactions"] == 0
    assert got[4]["redacted"] is None and got[4]["n_redactions"] == 0
    assert got[5]["redacted"] == "two mails: <EMAIL> <EMAIL>"
    assert got[5]["n_redactions"] == 2


def test_pii_redact_count_ignores_placeholder_artifacts(spark):
    """n_redactions is counted on the ORIGINAL text, so a placeholder
    can never be double-counted by a later class's pattern."""
    from muller_spark.operators.quality import pii_redact

    df = spark.createDataFrame(
        [(1, "mail a@b.co and ip 1.2.3.4 and http://x.y/z")],
        "doc_id long, text string",
    )
    r = pii_redact(df, "text", "doc_id").collect()[0]
    assert r["n_redactions"] == 3
    assert r["redacted"] == "mail <EMAIL> and ip <IP> and <URL>"


def test_ks_drift_matches_python_oracle(spark):
    from muller_spark.operators.quality import ks_drift

    ref_vals = [1.0, 2.0, 2.0, 3.5, 7.0, 9.0, 4.2, None]
    cur_vals = [2.0, 5.0, 5.0, 8.0, 9.0, 9.0, 1.5]
    ref = spark.createDataFrame([(v,) for v in ref_vals], "value double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "value double")
    row = ks_drift(ref, cur, "value").collect()[0]

    rv = sorted(v for v in ref_vals if v is not None)
    cv = sorted(cur_vals)
    pts = sorted(set(rv) | set(cv))
    ks = max(
        abs(
            sum(1 for x in rv if x <= p) / len(rv)
            - sum(1 for x in cv if x <= p) / len(cv)
        )
        for p in pts
    )
    assert row["ks_stat"] == round(ks, 6)
    assert (row["n_ref"], row["n_cur"]) == (len(rv), len(cv))


def test_ks_drift_identical_distributions_zero(spark):
    from muller_spark.operators.quality import ks_drift

    df = spark.createDataFrame([(float(i % 10),) for i in range(100)], "value double")
    row = ks_drift(df, df, "value").collect()[0]
    assert row["ks_stat"] == 0.0


def test_ks_drift_disjoint_supports_is_one(spark):
    from muller_spark.operators.quality import ks_drift

    ref = spark.createDataFrame([(float(i),) for i in range(10)], "value double")
    cur = spark.createDataFrame([(float(i + 100),) for i in range(10)], "value double")
    assert ks_drift(ref, cur, "value").collect()[0]["ks_stat"] == 1.0


def test_ks_drift_empty_side_raises(spark):
    import pytest as _pytest
    from muller_spark.operators.quality import ks_drift

    df = spark.createDataFrame([(1.0,)], "value double")
    empty = spark.createDataFrame([], "value double")
    with _pytest.raises(ValueError):
        ks_drift(df, empty, "value")


def test_pmi_top_pairs_known_answer(spark):
    """Hand-computed PMI on a tiny corpus: 'new york' appears as a pair
    in every doc; 'the the' never does despite 'the' being frequent."""
    import math
    from muller_spark.operators.text import pmi_top_pairs

    docs = [
        "new york is the city the people the crowds",
        "i love new york and the bridges the parks",
        "new york new york the song the anthem",
    ]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    out = pmi_top_pairs(df, "text", k=5, min_count=2).collect()
    got = {(r["w1"], r["w2"]): (r["pair_count"], r["pmi"], r["rank"])
           for r in out}
    # counts by hand: 26 tokens, 23 bigrams; 'new'=4, 'york'=4,
    # (new,york) appears 4 times
    assert ("new", "york") in got
    n_tok = sum(len(d.split()) for d in docs)
    n_pair = sum(len(d.split()) - 1 for d in docs)
    assert (n_tok, n_pair) == (26, 23)
    cnt = got[("new", "york")][0]
    assert cnt == 4
    expect = round(math.log((4 / n_pair) / ((4 / n_tok) * (4 / n_tok))), 6)
    assert got[("new", "york")][1] == expect
    # ranks are 1..k contiguous and ordered by pmi desc
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))
    pmis = [r["pmi"] for r in sorted(out, key=lambda r: r["rank"])]
    assert pmis == sorted(pmis, reverse=True)


def test_pmi_min_count_drops_hapax_noise(spark):
    from muller_spark.operators.text import pmi_top_pairs

    df = spark.createDataFrame(
        [("rare hapax pair seen once only here",),
         ("common words common words common words",)],
        "text string",
    )
    out = pmi_top_pairs(df, "text", k=10, min_count=2).collect()
    assert all(r["pair_count"] >= 2 for r in out)
    assert not any({r["w1"], r["w2"]} & {"rare", "hapax"} for r in out)


def test_compression_ratio_replays_zlib_exactly(spark):
    import zlib
    from muller_spark.operators.quality import compression_ratio

    rows = [
        (1, "the quick brown fox " * 20),          # repetitive: low ratio
        (2, "k9#xQ!mZ@r7&vL$pW*aB^cD(eF)gH_jN"),   # noise: high ratio
        (3, None),
        (4, ""),
        (5, "naïve café résumé — unicode bytes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in compression_ratio(df, "text", "doc_id").collect()}
    for doc_id, text in rows:
        r = got[doc_id]
        if text is None:
            assert (r["raw_len"], r["compressed_len"], r["ratio"]) == (0, 0, None)
            continue
        raw = text.encode("utf-8")
        comp = zlib.compress(raw, 6)
        assert r["raw_len"] == len(raw)
        assert r["compressed_len"] == len(comp)
        expect = round(len(comp) / len(raw), 6) if raw else None
        assert r["ratio"] == expect
    assert got[1]["ratio"] < 0.3 < got[2]["ratio"]


def test_mojibake_scan_known_answers(spark):
    from muller_spark.operators.quality import mojibake_scan

    rows = [
        (1, "perfectly clean ascii text"),
        (2, "broken \ufffd char and another \ufffd"),
        (3, "latin1 bleed: caf\u00c3\u00a9 and na\u00c3\u00afve"),
        (4, "control\x01char and \x7f del"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in mojibake_scan(df, "text", "doc_id").collect()}
    assert got[1]["is_clean"] and got[5]["is_clean"]
    assert got[2]["n_replacement"] == 2 and not got[2]["is_clean"]
    assert got[3]["n_mojibake"] == 2 and not got[3]["is_clean"]
    assert got[4]["n_control"] == 2 and not got[4]["is_clean"]



def test_search_snippets_known_answers(spark):
    from muller_spark.operators.text import search_snippets

    rows = [
        (1, "x" * 100 + " the magic TABLE sits here " + "y" * 100),
        (2, "no relevant words at all in this document"),
        (3, None),
        (4, "table at the very start"),
        (5, "tablecloth is not a hit for the boundary count"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in search_snippets(
        df, "text", "doc_id", ["table"], width=20
    ).collect()}
    t1 = rows[0][1]
    p1 = t1.lower().index("table") + 1
    assert got[1]["first_pos"] == p1 and got[1]["n_hits"] == 1
    assert got[1]["snippet"] == t1[p1 - 10 - 1 : p1 - 10 - 1 + 20]
    assert "table" in got[1]["snippet"].lower()
    assert got[2]["first_pos"] == 0 and got[2]["n_hits"] == 0
    assert got[2]["snippet"] == rows[1][1][:20]  # prefix fallback
    assert got[3] ["snippet"] is None and got[3]["n_hits"] == 0
    assert got[4]["first_pos"] == 1  # window clamps at the left edge
    assert got[4]["snippet"] == rows[3][1][:20]
    # substring match positions but word-boundary count excludes it
    assert got[5]["first_pos"] == 1 and got[5]["n_hits"] == 0


def test_search_snippets_rejects_regex_terms(spark):
    import pytest as _pytest
    from muller_spark.operators.text import search_snippets

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        search_snippets(df, "text", "doc_id", ["a.b"])
    with _pytest.raises(ValueError):
        search_snippets(df, "text", "doc_id", ["ok"], width=0)



def test_psi_against_reference_equals_psi_drift(spark):
    from muller_spark.operators.quality import (
        psi_against_reference, psi_drift, psi_reference,
    )

    ref = spark.createDataFrame(
        [(float(i % 37),) for i in range(400)], "value double"
    )
    cur = spark.createDataFrame(
        [(float((i * 7) % 41) + 3.0,) for i in range(150)] + [(None,)],
        "value double",
    )
    a = psi_drift(ref, cur, "value").collect()
    state = psi_reference(ref, "value")
    b = psi_against_reference(cur, "value", state).collect()
    assert [
        (r["bucket"], r["ref_frac"], r["cur_frac"], r["psi_contrib"])
        for r in a
    ] == [
        (r["bucket"], r["ref_frac"], r["cur_frac"], r["psi_contrib"])
        for r in b
    ]
    assert sum(r["cur_count"] for r in b) == 150  # NULL excluded



def test_ks_drift_by_matches_per_group_python(spark):
    from muller_spark.operators.quality import ks_drift_by

    ref_rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0),
                ("b", 6.0), ("c", 1.0), (None, 9.0), ("a", None)]
    cur_rows = [("a", 2.5), ("a", 3.0), ("b", 5.0), ("b", 5.0),
                ("d", 1.0)]
    ref = spark.createDataFrame(ref_rows, "g string, value double")
    cur = spark.createDataFrame(cur_rows, "g string, value double")
    got = {r["group_key"]: r for r in ks_drift_by(
        ref, cur, "value", "g"
    ).collect()}
    # c only in ref, d only in cur, NULL group excluded -> a, b only
    assert set(got) == {"a", "b"}

    def ks(rv, cv):
        pts = sorted(set(rv) | set(cv))
        return round(max(
            abs(sum(1 for x in rv if x <= p) / len(rv)
                - sum(1 for x in cv if x <= p) / len(cv))
            for p in pts
        ), 6)

    ra = [v for g, v in ref_rows if g == "a" and v is not None]
    ca = [v for g, v in cur_rows if g == "a"]
    assert got["a"]["ks_stat"] == ks(ra, ca)
    assert (got["a"]["n_ref"], got["a"]["n_cur"]) == (3, 2)
    rb = [v for g, v in ref_rows if g == "b"]
    cb = [v for g, v in cur_rows if g == "b"]
    assert got["b"]["ks_stat"] == ks(rb, cb)
