"""Known-answer vectors for every constant family the DuckDB oracles
share with the implementation (round-6 item #1, VERDICT r5).

The accent-fold misalignment (fixed in c6641bd) proved that when the
implementation and the oracle SQL share a literal — a hash recipe, a
fold table, a threshold — hash parity proves *consistency*, not
*correctness* ("parity by shared bug").  Each test here asserts pinned
outputs for hand-computed inputs where the expected values were derived
OUTSIDE both engines:

- md5-based hashes: ``hashlib`` (a third md5 implementation) + plain
  Python integer arithmetic,
- the accent table: ``unicodedata`` NFD decomposition per character,
  with the six non-decomposable folds pinned as documented exceptions,
- counting/thresholds (Gopher stats, PII counts, lang-id, entropy):
  worked by hand on tiny documents (the derivations are written out in
  the comments).

If any shared literal drifts (in either the impl or the oracle SQL it
feeds), one of these pins breaks even though the cross-engine hash gate
stays green.
"""

from __future__ import annotations

import hashlib
import unicodedata

import pytest
from pyspark.sql import functions as F

from muller_spark.operators.dedup import (
    _MINHASH_PRIME,
    minhash_coefficients,
    normalized_text,
    portable_hash60,
)
from muller_spark.operators.quality import (
    PII_PATTERNS,
    STOP_WORDS_EN,
    gopher_filter,
    pii_scan,
)
from muller_spark.operators.sampling import _KNUTH, _MOD, _hash_col
from muller_spark.operators.text import (
    ACCENT_DST,
    ACCENT_SRC,
    LANG_PROFILES,
    ccnet_normalize,
    char_entropy,
    lang_id,
    tokens_of,
)


# ---------------------------------------------------------------- md5 family

# int(hashlib.md5(s).hexdigest()[:15], 16) — computed with hashlib,
# not with Spark's md5()/conv() or DuckDB's md5().
PORTABLE_HASH60_VECTORS = {
    "abc": 648541476951500027,
    "": 955282973525019424,
    "hello world": 426544247714475757,
    "muller": 1038906165560405033,
    "0": 935853755618645598,
}


def test_portable_hash60_known_answers(spark):
    rows = (
        spark.createDataFrame(
            [(s,) for s in PORTABLE_HASH60_VECTORS], ["s"]
        )
        .select("s", portable_hash60(F.col("s")).alias("h"))
        .collect()
    )
    got = {r["s"]: r["h"] for r in rows}
    assert got == PORTABLE_HASH60_VECTORS


def test_portable_hash60_matches_hashlib_on_arbitrary_strings(spark):
    # sanity beyond the pinned set: the recipe really is "first 15 hex
    # chars of md5", checked against hashlib for fresh inputs
    samples = [f"doc-{i} body text" for i in range(20)]
    expected = {
        s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in samples
    }
    rows = (
        spark.createDataFrame([(s,) for s in samples], ["s"])
        .select("s", portable_hash60(F.col("s")).alias("h"))
        .collect()
    )
    assert {r["s"]: r["h"] for r in rows} == expected


# a_i = ((2654435761 * (i+1)) mod p) or 1;  b_i = (40503*(i+1)^2 + 12345) mod p
# — hand-evaluated with plain Python ints for p = 2^31 - 1.
MINHASH_COEFF_VECTORS = {
    0: (506952114, 52848),
    1: (1013904228, 174357),
    2: (1520856342, 376872),
    7: (1908133265, 2604537),
    63: (232680591, 165912633),
}


def test_minhash_coefficients_known_answers():
    assert _MINHASH_PRIME == 2**31 - 1
    a, b = minhash_coefficients(64)
    for i, (ai, bi) in MINHASH_COEFF_VECTORS.items():
        assert (a[i], b[i]) == (ai, bi), f"coefficient {i} drifted"
    assert all(x != 0 for x in a), "a_i must stay invertible-ish (never 0)"


# ------------------------------------------------------------- Knuth family

# ((x % 2^31 + 2^31) % 2^31) * 2654435761 mod 2^32, hand-computed.
# Includes the portability edge cases the pmod exists for: a negative
# key and a key >= 2^31 (where Spark/DuckDB `%`/overflow semantics
# would otherwise diverge).
KNUTH_VECTORS = {
    (0, 0): 0,
    (1, 0): 2654435761,
    (12345, 0): 2703968361,
    (-7, 0): 746302505,
    (2**31 + 5, 0): 387276917,
    (42, 99): 613287549,
}


def test_knuth_hash_known_answers(spark):
    assert (_KNUTH, _MOD) == (2654435761, 2**32)
    rows = spark.createDataFrame(
        [(x, s) for (x, s) in KNUTH_VECTORS], ["x", "salt"]
    ).collect()
    for r in rows:
        got = (
            spark.createDataFrame([(r["x"],)], ["x"])
            .select(_hash_col(F.col("x"), r["salt"]).alias("h"))
            .first()["h"]
        )
        assert got == KNUTH_VECTORS[(r["x"], r["salt"])], (
            f"knuth hash drifted for key={r['x']} salt={r['salt']}"
        )


# ------------------------------------------------------- accent-fold family

# The six source chars whose fold is NOT their NFD base (they don't
# decompose); every other entry must equal its NFD-stripped base.
ACCENT_NON_DECOMPOSABLE = {
    "ı": "i", "ø": "o", "đ": "d", "ð": "d", "þ": "t", "ß": "b",
}


def test_accent_table_alignment_via_unicodedata():
    assert len(ACCENT_SRC) == len(ACCENT_DST) == 69
    assert len(set(ACCENT_SRC)) == 69, "duplicate src char would shadow a fold"
    for s, d in zip(ACCENT_SRC, ACCENT_DST):
        nfd = unicodedata.normalize("NFD", s)
        base = "".join(c for c in nfd if not unicodedata.combining(c))
        if s in ACCENT_NON_DECOMPOSABLE:
            assert d == ACCENT_NON_DECOMPOSABLE[s], f"exception fold {s!r}"
        else:
            assert base == d, (
                f"fold {s!r} -> {d!r} disagrees with NFD base {base!r}"
            )


def test_ccnet_normalize_known_answer(spark):
    # hand-derived: lower -> fold (ç->c û->u ï->i é->e è->e) ->
    # digits->0 -> punctuation/symbols (€ , – !) -> space -> collapse
    got = (
        spark.createDataFrame(
            [("Ça coûte 12 €, naïve – ÉLÈVE!",)], ["t"]
        )
        .select(ccnet_normalize(F.col("t")).alias("n"))
        .first()["n"]
    )
    assert got == "ca coute 00 naive eleve"


# ------------------------------------------------------ tokenizer family

def test_tokenizer_known_answers(spark):
    df = spark.createDataFrame(
        [("Hello, World! 123",), ("  Foo\t BAR  baz ",), ("",)], ["t"]
    )
    rows = df.select(
        normalized_text(F.col("t")).alias("n"),
        tokens_of(F.col("t")).alias("toks"),
    ).collect()
    assert rows[0]["n"] == "hello, world! 123"
    assert rows[0]["toks"] == ["hello", "world", "123"]
    assert rows[1]["n"] == "foo bar baz"
    assert rows[1]["toks"] == ["foo", "bar", "baz"]
    assert rows[2]["toks"] == []


def test_split_tokens_equals_normalized_split(spark):
    # split_tokens drops normalized_text's trim + whitespace-collapse
    # passes; this pins the equivalence proof (every whitespace char is
    # in the separator class, '+' eats whole runs) against the old
    # expression on hostile inputs: unicode whitespace, CJK, leading/
    # trailing separator runs, NULLs, separator-only and empty strings.
    from muller_spark.plans.conditions import TOKEN_SPLIT_REGEX

    df = spark.createDataFrame(
        [
            ("Hello, World! 123",),
            ("  Foo\t BAR \r\n baz ",),
            ("",),
            (None,),
            (" nbsp separated　ideographic",),
            ("中文 测试 mixed EN 中文",),
            ("...!!!???",),
            ("a" * 500 + "  " + "b" * 500,),
            ("tab\tnew\nline\rmix\f\x0b end",),
        ],
        ["t"],
    )
    old = F.filter(
        F.split(normalized_text(F.col("t")), TOKEN_SPLIT_REGEX),
        lambda t: t != "",
    )
    got = df.select(
        F.col("t"),
        tokens_of(F.col("t")).alias("new"),
        old.alias("old"),
    ).collect()
    for r in got:
        assert r["new"] == r["old"], r["t"]


# ------------------------------------------------------- Gopher family

def test_gopher_stats_hand_computed(spark):
    # "The cat sat on the mat" -> tokens [the,cat,sat,on,the,mat]
    #   n_words = 6
    #   mean_word_len = (3+3+3+2+3+3)/6 = 17/6 = 2.833333 (round6)
    #   stop_hits = |distinct tokens ∩ STOP_WORDS_EN| = |{the, on}| = 2
    #   consec_dup_frac = 0 (no adjacent equal pair)
    #   top_bigram_frac: 5 bigrams, all distinct -> 1/5 = 0.2
    assert "the" in STOP_WORDS_EN and "on" in STOP_WORDS_EN
    assert "cat" not in STOP_WORDS_EN
    df = spark.createDataFrame([(1, "The cat sat on the mat")], ["id", "text"])
    r = gopher_filter(df, "text", "id").first()
    assert r["n_words"] == 6
    assert r["mean_word_len"] == pytest.approx(2.833333, abs=1e-6)
    assert r["stop_hits"] == 2
    assert r["consec_dup_frac"] == 0.0
    assert r["top_bigram_frac"] == pytest.approx(0.2, abs=1e-9)
    # default thresholds: fails min_words (6<50), fails word_len
    # (2.83<3.0), fails bigram (0.2>0.18); passes stop + consec
    assert not r["pass_n_words"]
    assert not r["pass_word_len"]
    assert r["pass_stop"]
    assert not r["pass_bigram"]
    assert r["pass_consec"]
    assert not r["keep"]


def test_gopher_consec_dup_hand_computed(spark):
    # "go go go stop" -> 4 tokens, adjacent-equal positions: (go,go),
    # (go,go) = 2 of 3 -> 2/3 = 0.666667;
    # distinct bigrams: "go go" x2, "go stop" -> top 2/3 = 0.666667
    df = spark.createDataFrame([(1, "go go go stop")], ["id", "text"])
    r = gopher_filter(df, "text", "id").first()
    assert r["consec_dup_frac"] == pytest.approx(0.666667, abs=1e-6)
    assert r["top_bigram_frac"] == pytest.approx(0.666667, abs=1e-6)


# --------------------------------------------------------- PII family

def test_pii_counts_hand_computed(spark):
    text = "contact a@b.co or visit https://x.y now 1.2.3.4 ok"
    # n_emails: "a@b.co" -> 1; n_ipv4: "1.2.3.4" -> 1;
    # n_urls: "https://x.y" -> 1; n_phones: no +digit run -> 0
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    r = pii_scan(df, "text", "id").first()
    assert (r["n_emails"], r["n_ipv4"], r["n_phones"], r["n_urls"]) == (
        1, 1, 0, 1,
    )
    assert r["has_pii"]
    clean = pii_scan(
        spark.createDataFrame([(2, "just words here")], ["id", "text"]),
        "text", "id",
    ).first()
    assert not clean["has_pii"]


def test_pii_pattern_set_pinned():
    # the oracle SQL embeds these exact four patterns; renaming or
    # re-ordering keys silently changes the output schema
    assert list(PII_PATTERNS) == ["n_emails", "n_ipv4", "n_phones", "n_urls"]


# ------------------------------------------------------ lang-id family

def test_lang_id_hand_computed(spark):
    # "der hund und die katze ist nicht hier": de profile hits
    # {der, und, die, ist, nicht} = 5; en/fr/es = 0 -> "de"
    # "the der": en=1 (the), de=1 (der) -> tie; first language in
    # LANG_PROFILES insertion order (en) wins
    # "zzz qqq xxx": no profile hit -> "und"
    assert list(LANG_PROFILES) == ["en", "de", "fr", "es"]
    df = spark.createDataFrame(
        [
            (1, "der hund und die katze ist nicht hier"),
            (2, "the der"),
            (3, "zzz qqq xxx"),
            (4, "le chat est sur la table et les livres pour"),
        ],
        ["id", "text"],
    )
    rows = df.select("id", lang_id(F.col("text")).alias("lang")).collect()
    got = {r["id"]: r["lang"] for r in rows}
    assert got == {1: "de", 2: "en", 3: "und", 4: "fr"}


# ------------------------------------------------------ entropy family

def test_char_entropy_hand_computed(spark):
    # H("aabb") = log2(4) - (2·log2 2 + 2·log2 2)/4 = 2 - 1 = 1.0
    # H("abcd") = log2(4) - 0 = 2.0
    # H("aaaa") = log2(4) - 4·log2(4)/4 = 0.0
    # H("") = 0.0 by convention
    df = spark.createDataFrame(
        [("aabb",), ("abcd",), ("aaaa",), ("",)], ["t"]
    )
    rows = df.select(char_entropy(F.col("t")).alias("h")).collect()
    assert [r["h"] for r in rows] == [1.0, 2.0, 0.0, 0.0]


# ------------------------------------------------- LM-scoring family

def test_unigram_logprob_hand_computed(spark):
    # corpus: d1 = "a a b", d2 = "b c" -> counts a:2 b:2 c:1, total 5
    # d1: every token has P = 2/5 -> avg = log2(0.4)
    # d2: (log2(2/5) + log2(1/5)) / 2
    import math

    from muller_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = {
        r["id"]: r
        for r in unigram_logprob(df, "text", "doc_id").collect()
    }
    assert rows[1]["n_tokens"] == 3 and rows[2]["n_tokens"] == 2
    assert rows[1]["avg_logprob"] == pytest.approx(
        round(math.log2(2 / 5), 5), abs=1e-5
    )
    assert rows[2]["avg_logprob"] == pytest.approx(
        round((math.log2(2 / 5) + math.log2(1 / 5)) / 2, 5), abs=1e-5
    )


def test_bigram_logprob_hand_computed(spark):
    # corpus: d1 = "a b a b", d2 = "b a"
    #   unigrams a:3 b:3 total 6; bigrams (a,b):2 (b,a):2
    #   every bigram position scores the same interpolated prob:
    #   P = lam*(2/3) + (1-lam)*(3/6); d3 = "solo" has <2 tokens -> NULL
    import math

    from muller_spark.operators.text import bigram_logprob

    lam = 0.7
    p = lam * (2 / 3) + (1 - lam) * 0.5
    # "solo" adds 1 to total unigrams (total 7) and its own count —
    # keep it OUT of the trained corpus to keep the arithmetic above
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a")], "doc_id long, text string"
    )
    rows = {
        r["id"]: r for r in bigram_logprob(df, "text", "doc_id", lam=lam).collect()
    }
    expected = round(math.log2(p), 5)
    assert rows[1]["avg_logprob"] == pytest.approx(expected, abs=1e-5)
    assert rows[2]["avg_logprob"] == pytest.approx(expected, abs=1e-5)

    short = bigram_logprob(
        spark.createDataFrame([(9, "solo")], "doc_id long, text string"),
        "text", "doc_id", lam=lam,
    ).first()
    assert short["avg_logprob"] is None  # <2 tokens: no bigram positions


def test_dsir_importance_hand_computed(spark):
    # Pure-Python replica of the published recipe (hashed unigram
    # buckets, add-one smoothing, log ratio) using hashlib + math —
    # shares only the SPEC with the implementation, none of its code.
    import math

    from muller_spark.operators.text import dsir_importance

    n_buckets = 256
    docs = {1: "alpha beta beta", 2: "gamma alpha", 3: "beta delta delta"}
    target_ids = {1}

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n_buckets

    raw, tgt = {}, {}
    for did, text in docs.items():
        for tok in text.split():
            b = bucket(tok)
            raw[b] = raw.get(b, 0) + 1
            if did in target_ids:
                tgt[b] = tgt.get(b, 0) + 1
    tr, tt = sum(raw.values()), sum(tgt.values())

    def lw(text):
        out = 0.0
        for tok in text.split():
            b = bucket(tok)
            pt = (tgt.get(b, 0) + 1) / (tt + n_buckets)
            pr = (raw.get(b, 0) + 1) / (tr + n_buckets)
            out += math.log(pt / pr)
        return round(out, 5)

    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    rows = {
        r["id"]: r
        for r in dsir_importance(
            df, "text", "doc_id", F.col("doc_id") == 1, n_buckets=n_buckets
        ).collect()
    }
    for did, text in docs.items():
        assert rows[did]["n_tokens"] == len(text.split())
        assert rows[did]["logweight"] == pytest.approx(lw(text), abs=2e-5), did
    # target doc must out-weigh the fully-off-target doc
    assert rows[1]["logweight"] > rows[3]["logweight"]


# --------------------------------------------------------- BM25 family

def test_bm25_hand_computed(spark, tmp_path):
    # corpus: d1="cat dog", d2="cat cat fish", d3="bird"
    #   N=3, dl = 2/3/1, avgdl = 2
    # query "cat": df=2, idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    #   d1: tf=1, K = 1.2*(0.25+0.75*2/2) = 1.2  -> w = idf*2.2/2.2 = idf
    #   d2: tf=2, K = 1.2*(0.25+0.75*3/2) = 1.65 -> w = idf*4.4/3.65
    # -> d2 ranks first (higher tf wins at comparable dl)
    import math

    from muller_spark.index.inverted import InvertedIndex

    df = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat fish"), (3, "bird")],
        "doc_id long, text string",
    )
    idx = InvertedIndex.build(
        df, "text", str(tmp_path / "idx"), id_col="doc_id", positions=True
    )
    rows = idx.bm25("cat", k=10).collect()
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    expect = {
        2: round(idf * (2 * 2.2) / (2 + 1.65), 5),
        1: round(idf * (1 * 2.2) / (1 + 1.2), 5),
    }
    assert [r["id"] for r in rows] == [2, 1]
    for r in rows:
        assert r["score"] == pytest.approx(expect[r["id"]], abs=2e-5)

    # tf needs position rows: a non-positional index must refuse
    flat = InvertedIndex.build(
        df, "text", str(tmp_path / "flat"), id_col="doc_id", positions=False
    )
    with pytest.raises(ValueError):
        flat.bm25("cat")


# ----------------------------------------------- quality-score family

def test_quality_score_hand_computed(spark):
    # doc 1: "the cat is on the mat and it is very good here today now"
    #   14 tokens (>=10 -> length_ok 1.0); stopwords
    #   {the,is,on,the,and,it,is} = 7 -> ratio 0.5 >= 0.05 -> 1.0;
    #   no punct, no digits -> 1.0 * 1.0; score = 1.0
    # doc 2: "x1 y2 z3" -> 3 tokens (<10 -> 0.3); 0 stopwords (-> 0.5);
    #   digits 3 of 8 chars = 0.375 > 0.3 (-> 0.5); no punct (-> 1.0)
    #   score = 0.3 * 0.5 * 1.0 * 0.5 = 0.075
    from muller_spark.operators.text import quality_score

    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is very good here today now"),
            (2, "x1 y2 z3"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_score(df, "text").collect()}
    assert rows[1]["n_tokens"] == 14
    assert rows[1]["stopword_ratio"] == pytest.approx(0.5)
    assert rows[1]["quality_score"] == pytest.approx(1.0)
    assert rows[2]["n_tokens"] == 3
    assert rows[2]["digit_ratio"] == pytest.approx(0.375)
    assert rows[2]["quality_score"] == pytest.approx(0.075)


def test_bm25_after_incremental_update(spark, tmp_path):
    """BM25 must reflect incremental `update()` deltas: corpus stats
    (N, avgdl) and tf/df all derive from the merged posting table, so a
    newly appended doc both scores and shifts existing scores."""
    from muller_spark.index.inverted import InvertedIndex

    df = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat fish")], "doc_id long, text string"
    )
    idx = InvertedIndex.build(
        df, "text", str(tmp_path / "idx"), id_col="doc_id", positions=True
    )
    idx = idx.update(
        spark.createDataFrame([(3, "cat bird bird")], "doc_id long, text string")
    )
    rows = {r["id"]: r["score"] for r in idx.bm25("cat", k=10).collect()}
    assert set(rows) == {1, 2, 3}  # the delta doc participates
    # N=3, df(cat)=3 -> idf = ln((3-3+0.5)/(3+0.5)+1) = ln(8/7); dl all
    # relative: d2 (tf=2, dl=3) still out-ranks d1 and d3 (tf=1)
    import math

    idf = math.log((3 - 3 + 0.5) / (3 + 0.5) + 1.0)
    k1, b, avgdl = 1.2, 0.75, 8 / 3
    def w(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 5)
    assert rows[2] == pytest.approx(w(2, 3), abs=2e-5)
    assert rows[1] == pytest.approx(w(1, 2), abs=2e-5)
    assert rows[3] == pytest.approx(w(1, 3), abs=2e-5)
    assert rows[2] > rows[1] > rows[3]


def test_winnow_fingerprints_containment_and_hand_hash(spark):
    """The winnowing sketch's containment property (shared long passage
    ⇒ shared fingerprints) plus a hand-computed hash pin: a doc shorter
    than the window sketches its whole token stream as ONE shingle whose
    H60 we can compute with hashlib directly."""
    from muller_spark.operators.text import rolling_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, shared + " unique tail one two three"),
            (2, "different head words here " + shared),
            (3, "totally unrelated content about other things entirely"),
            (4, "tiny doc"),  # < window tokens -> one whole-doc shingle
        ],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id", rolling_fingerprints(F.col("text"), window=8, keep=4).alias("fp")
    ).collect()
    fp = {r["doc_id"]: set(r["fp"]) for r in rows}
    assert fp[1] & fp[2], "docs sharing a 10-token passage share no fp"
    assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])
    expected = int(hashlib.md5(b"tiny doc").hexdigest()[:15], 16)
    assert fp[4] == {expected}


def test_winnow_fingerprints_null_and_empty_text_sketch_empty(spark):
    """NULL/''/whitespace-only docs must sketch to an EMPTY array — not
    the hash of '' — or every content-free doc 'shares a passage' with
    every other and diverges from the ordered SQL oracle, which emits
    no shingle rows for them (round-7 ADVICE fix)."""
    from muller_spark.operators.text import rolling_fingerprints

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "real content words")],
        "doc_id long, text string",
    )
    rows = df.select(
        "doc_id", rolling_fingerprints(F.col("text"), window=8, keep=4).alias("fp")
    ).collect()
    fp = {r["doc_id"]: r["fp"] for r in rows}
    assert fp[1] == [] and fp[2] == [] and fp[3] == []
    assert len(fp[4]) == 1  # short real doc: one whole-doc shingle


# ----------------------------------------------- analytics semantics

def test_funnel_hand_computed(spark):
    # steps [view, click, buy]; conversion rule: step k needs an event
    # at-or-AFTER the step-(k-1) conversion time (inclusive).
    #   A: view@10 click@20 buy@30   -> all 3 steps
    #   B: click@8 view@10           -> click precedes view: step 0 only
    #   C: view@10 click@10          -> same-ts click converts (inclusive)
    # within_seconds=5: A's click@20 is 10s after view@10 -> too late;
    # C's click@10 is 0s after -> converts.
    from datetime import datetime

    from muller_spark.operators.analytics import funnel

    t = lambda s: datetime(2026, 1, 1, 0, 0, s)
    rows = [
        ("A", "view", t(10)), ("A", "click", t(20)), ("A", "buy", t(30)),
        ("B", "click", t(8)), ("B", "view", t(10)),
        ("C", "view", t(10)), ("C", "click", t(10)),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    got = {r["step_name"]: r["n_users"] for r in
           funnel(df, ["view", "click", "buy"]).collect()}
    assert got == {"view": 3, "click": 2, "buy": 1}

    tight = {r["step_name"]: r["n_users"] for r in
             funnel(df, ["view", "click", "buy"], within_seconds=5).collect()}
    assert tight == {"view": 3, "click": 1, "buy": 0}


def test_sessionize_batch_gap_boundary_hand_computed(spark):
    # gap rule: a NEW session starts only when gap > gap_seconds —
    # a gap of exactly gap_seconds continues the session.
    #   u: 0, 500, 1500 (gap 1000 == limit -> same), 2501 (gap 1001 -> new)
    from muller_spark.streaming.stateful import sessionize_batch

    df = spark.createDataFrame(
        [("u", 0.0), ("u", 500.0), ("u", 1500.0), ("u", 2501.0)],
        "k string, ts double",
    )
    rows = sorted(
        sessionize_batch(df, "ts", "k", gap_seconds=1000).collect(),
        key=lambda r: r["session_start"],
    )
    assert [(r["session_start"], r["session_end"], r["n_events"]) for r in rows] == [
        (0.0, 1500.0, 3), (2501.0, 2501.0, 1),
    ]


def test_asof_join_hand_computed(spark):
    # most recent right row with right.on <= left.on (inclusive)
    from muller_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("g", 2.0), ("g", 5.0), ("g", 10.0)], "grp string, t double"
    )
    right = spark.createDataFrame(
        [("g", 3.0, "r3"), ("g", 5.0, "r5"), ("g", 7.0, "r7")],
        "grp string, t double, v string",
    )
    rows = {r["t"]: r["v_right"] for r in
            asof_join(left, right, on="t", by=["grp"]).collect()}
    assert rows == {2.0: None, 5.0: "r5", 10.0: "r7"}


def test_case_sensitive_contains_and_index(spark, tmp_path):
    """Round-6 review finding: the case-sensitive tokenizer must treat
    uppercase letters as token characters, not separators — previously
    CONTAINS 'ABC' compiled to lit(False) and 'World' was mangled to
    'orld' (false positives on 'Xorld')."""
    from muller_spark.index.inverted import InvertedIndex
    from muller_spark.plans.conditions import contains_predicate

    df = spark.createDataFrame(
        [(1, "the ABC standard"), (2, "a Xorld apart"), (3, "hello World")],
        "doc_id long, text string",
    )
    hits = df.filter(
        contains_predicate(F.col("text"), "ABC", case_sensitive=True)
    ).collect()
    assert [r["doc_id"] for r in hits] == [1]
    world = df.filter(
        contains_predicate(F.col("text"), "World", case_sensitive=True)
    ).collect()
    assert [r["doc_id"] for r in world] == [3]  # Xorld must NOT match
    # case-sensitive: lowercase query misses the capitalized token
    lower = df.filter(
        contains_predicate(F.col("text"), "world", case_sensitive=True)
    ).collect()
    assert lower == []

    idx = InvertedIndex.build(
        df, "text", str(tmp_path / "cs"), id_col="doc_id",
        case_sensitive=True,
    )
    assert [r["id"] for r in idx.search("ABC").collect()] == [1]
    assert [r["id"] for r in idx.search("World").collect()] == [3]
    assert idx.search("world").collect() == []
