"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All JVM-side (split/filter/aggregate on token arrays — no Python UDFs),
so they codegen and scale linearly with the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from muller_spark.operators.dedup import normalized_text, split_tokens
from muller_spark.plans.conditions import TOKEN_SPLIT_REGEX

# Tiny deterministic stopword profiles for the n-gram/stopword-overlap
# language heuristic (top function words per language).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "was"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"),
    "es": ("el", "la", "de", "que", "y", "los", "un", "es", "en", "una"),
}

STOPWORDS_EN = frozenset(
    "a an and are as at be by for from has he in is it its of on that the to was were will with".split()
)


def tokens_of(col: Column) -> Column:
    # lower-only split: see split_tokens' equivalence proof (one regex
    # pass cheaper than split(normalized_text(...)))
    return split_tokens(col)


def token_count(col: Column) -> Column:
    return F.size(tokens_of(col))


def lang_id(col: Column) -> Column:
    """Stopword-profile language guess: the language whose function words
    cover the most tokens; 'und' (undetermined) when nothing matches.

    Single-pass formulation: one ``F.aggregate`` over the token array
    accumulates all per-language counts in a struct, and the *finish*
    lambda resolves the winner — so the expensive tokenize (normalize +
    regex split) is evaluated exactly once per row.  Higher-order
    functions sit outside whole-stage codegen, so the naive
    one-filter-per-language version re-tokenizes per profile (measured
    3× slower at sf0.1)."""
    langs = list(LANG_PROFILES)

    def merge(acc: Column, t: Column) -> Column:
        return F.struct(*[
            (acc[lang] + F.when(t.isin(*LANG_PROFILES[lang]), 1).otherwise(0)).alias(lang)
            for lang in langs
        ])

    def finish(acc: Column) -> Column:
        best = F.greatest(*[acc[lang] for lang in langs])
        out = F.lit("und")
        # reversed so the first language in the dict wins ties
        for lang in reversed(langs):
            out = F.when((acc[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
        return out

    zero = F.struct(*[F.lit(0).alias(lang) for lang in langs])
    return F.aggregate(tokens_of(col), zero, merge, finish)


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Append standard quality-signal columns: n_tokens, mean_token_len,
    stopword_ratio, punct_ratio, digit_ratio, upper_ratio.

    Token count and stopword count come from ONE ``F.aggregate`` pass
    over the token array (struct accumulator), so the tokenize runs once
    per row — same single-pass trick as ``lang_id``, measured ~40%
    faster than size+filter at sf0.1 (HOFs don't codegen, so Catalyst
    won't dedup the tokenize across expressions for us)."""
    raw = F.col(text_col)
    tok_stats = F.aggregate(
        tokens_of(raw),
        F.struct(F.lit(0).alias("n"), F.lit(0).alias("stop")),
        lambda acc, t: F.struct(
            (acc["n"] + 1).alias("n"),
            (acc["stop"] + F.when(t.isin(*sorted(STOPWORDS_EN)), 1).otherwise(0)).alias("stop"),
        ),
    )
    stage = df.withColumn("_tok_stats", tok_stats)
    n_tok = F.col("_tok_stats.n")
    stop = F.col("_tok_stats.stop")
    n_chars = F.length(raw)
    non_space = F.length(F.regexp_replace(raw, r"\s+", ""))
    punct = F.length(raw) - F.length(F.regexp_replace(raw, r"[^\w\s]", ""))
    digits = F.length(raw) - F.length(F.regexp_replace(raw, r"[0-9]", ""))
    uppers = F.length(raw) - F.length(F.regexp_replace(raw, r"[A-Z]", ""))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    return (
        stage.withColumn("n_tokens", n_tok)
        .withColumn("mean_token_len", safe(non_space, n_tok))
        .withColumn("stopword_ratio", safe(stop, n_tok))
        .withColumn("punct_ratio", safe(punct, n_chars))
        .withColumn("digit_ratio", safe(digits, n_chars))
        .withColumn("upper_ratio", safe(uppers, n_chars))
        .drop("_tok_stats")
    )


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Single 0-1 heuristic quality score from the feature columns."""
    feats = quality_features(df, text_col)
    length_ok = F.when(
        (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0
    ).otherwise(0.3)
    stop_ok = F.when(F.col("stopword_ratio") >= 0.05, 1.0).otherwise(0.5)
    punct_ok = F.when(F.col("punct_ratio") <= 0.3, 1.0).otherwise(0.4)
    digit_ok = F.when(F.col("digit_ratio") <= 0.3, 1.0).otherwise(0.5)
    return feats.withColumn(
        "quality_score",
        F.round((length_ok * stop_ok * punct_ok * digit_ok), 6),
    )


def fingerprint(col: Column) -> Column:
    """Normalized content fingerprint: md5 of the canonical text form."""
    return F.md5(normalized_text(col))


def rolling_fingerprints(col: Column, window: int = 8, keep: int = 4) -> Column:
    """Winnowing-style fingerprint sketch: hash each ``window``-token
    shingle, keep the ``keep`` smallest DISTINCT hashes — a fixed-size
    deterministic sketch of the document usable for containment /
    overlap checks (two docs sharing a long passage share small-hash
    shingles with high probability).  Hashes come from the
    engine-portable md5-60bit family (``portable_hash60``) rather than
    ``xxhash64`` so a DuckDB oracle reproduces the sketch value-for-
    value (q_winnow_fingerprints); the min-of-hashes selection makes
    the sketch order- and partition-independent.  Documents shorter
    than ``window`` tokens sketch their whole token stream as one
    shingle.  NULL or token-free documents sketch to an EMPTY array —
    without that guard a NULL/'' text would hash the empty string to a
    real fingerprint and every content-free doc would spuriously "share
    a passage" with every other (and with any ordered SQL oracle that
    emits no shingle rows for them)."""
    from muller_spark.operators.dedup import portable_hash60

    toks = tokens_of(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0)))
    hashes = F.transform(
        idx,
        lambda i: portable_hash60(F.concat_ws(" ", F.slice(toks, i + 1, window))),
    )
    sketch = F.slice(F.array_sort(F.array_distinct(hashes)), 1, keep)
    return F.when(F.size(toks) > 0, sketch).otherwise(
        F.array().cast("array<long>")
    )


# GPT-2-style pretokenizer family, restricted to a dialect-portable core:
# contractions | space?+letters | space?+digits | space?+punct-run | spaces.
# No lookaheads, so the same pattern runs identically under Java regex
# (Spark) and RE2 (DuckDB oracle).
BPE_TOKEN_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"


def bpe_token_count(col: Column) -> Column:
    """Approximate BPE token count: matches of the GPT-2-ish pretokenizer
    over the case-folded text, excluding pure-whitespace runs.  The
    standard 'how many LLM tokens is this corpus' estimator, entirely
    JVM-side."""
    pieces = F.regexp_extract_all(F.lower(col), F.lit(BPE_TOKEN_REGEX), 0)
    return F.size(F.filter(pieces, lambda p: F.trim(p) != ""))


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into token windows of ``chunk_tokens`` with
    ``overlap`` tokens shared between consecutive chunks (stride =
    chunk_tokens - overlap) — the RAG / pretraining chunking primitive.

    One row per chunk: ``(id, chunk_id, n_tokens, chunk_text)``; the
    final chunk may be short, empty documents emit nothing.  Pure
    JVM expression (sequence + transform + explode inside whole-stage
    codegen): map-only, zero shuffle — chunking 100 TB is a scan.

    Two deliberate shapes for scale:

    * The token array is materialized in its own projection first, so
      tokenization runs exactly once per document.  Referencing the
      raw ``tokens_of`` expression from inside the chunk lambda would
      inline it there (CollapseProject does not merge projections when
      it would duplicate a non-cheap expression — this separate select
      is what prevents that), re-tokenizing once per *chunk*.
    * The slice happens *inside* ``transform(starts, ...)`` before the
      explode, so each generated row carries only its own chunk (total
      copy = O(total chunk tokens)).  Slicing after the explode would
      drag the full token array into every generated row — O(chunks ×
      doc_tokens), a ~2000× copy amplification for a 1M-token document
      at chunk 512."""
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    base = df.select(
        F.col(id_col), tokens_of(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") > 0)
    toks = F.col("__toks")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("long").alias("cid"),
            F.array_join(F.slice(toks, s + 1, chunk_tokens), " ").alias("txt"),
            F.least(F.lit(chunk_tokens), n - s).cast("int").alias("nt"),
        ),
    )
    ex = base.select(F.col(id_col), F.explode(chunks).alias("__c"))
    return ex.select(
        F.col(id_col),
        F.col("__c.cid").alias("chunk_id"),
        F.col("__c.nt").alias("n_tokens"),
        F.col("__c.txt").alias("chunk_text"),
    )


def rare_token_stats(
    df: DataFrame, id_col: str, text_col: str, max_df: int = 2
) -> DataFrame:
    """Corpus-relative rarity profile per document: ``n_tokens``,
    ``n_rare`` (occurrences of tokens whose corpus *document frequency*
    is ≤ ``max_df``) and ``rare_ratio`` — the integer-exact cousin of
    LM-perplexity quality filters (a high rare-token ratio flags
    boilerplate-free but garbled text; transcendental-free so the
    cross-engine oracle is bit-exact: one correctly-rounded IEEE
    division per row, then round).

    Shape: explode → token-keyed distinct + aggregate for document
    frequency → token-keyed hash join back onto occurrences → id-keyed
    aggregates.  Every shuffle is keyed on token or id; the rare-token
    table stays distributed (it is vocabulary-sized, often too big to
    broadcast at corpus scale)."""
    tok = df.select(
        F.col(id_col), F.explode(tokens_of(F.col(text_col))).alias("t")
    )
    dfreq = (
        tok.distinct()
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    rare = dfreq.filter(F.col("df") <= max_df).select("t")
    per_doc = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    n_rare = (
        tok.join(rare, "t")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_rare"))
    )
    return (
        per_doc.join(n_rare, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("n_rare"), F.lit(0)).alias("n_rare"),
            F.round(
                F.coalesce(F.col("n_rare"), F.lit(0)) / F.col("n_tokens"), 6
            ).alias("rare_ratio"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords (training-data keyword
    extraction; natural extension of the reference's token surface,
    ``inverted_index_vectorized.py:122-158`` tokenizer family).

    Shape: explode → two hash aggregations (term-freq, then doc-freq) →
    join the vocabulary-sized doc-freq table back onto term rows →
    per-doc window top-k.  The only big shuffles are the two aggs on
    (doc, token) / (token).  The doc-freq side is vocabulary-scaling —
    typically far smaller than the corpus but NOT statically bounded (a
    100 TB web corpus has billions of distinct tokens), so it carries no
    forced hint: AQE broadcasts it while it fits and falls back to a
    shuffled join on (token), which both sides already produced.
    ``score`` = tf · ln(N/df), N from a broadcast 1-row aggregate
    (never a driver-side count at plan time).
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens_of(F.col(text_col))).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ndocs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "rk", "token", "tf", "df", F.round("score", 6).alias("score"))
    )


def corpus_report(
    df: DataFrame,
    text_col: str,
    group_cols: "tuple[str, ...]" = ("lang", "source"),
) -> DataFrame:
    """Corpus composition report: per group, document/token/char counts
    plus each group's share of corpus documents and tokens (round6).

    Scale shape: one hash aggregate on ``group_cols`` (map-side partial
    token counting — the token arrays never shuffle, only per-group
    sums), then window totals over the POST-aggregation frame, whose
    cardinality is the number of groups, not rows — the single-partition
    window is deliberate and safe."""
    from pyspark.sql import Window

    toks = token_count(F.col(text_col))
    per = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks.cast("long")).alias("total_tokens"),
        F.sum(F.length(text_col).cast("long")).alias("total_chars"),
        F.round(F.avg(F.length(text_col)), 6).alias("avg_chars"),
    )
    w = Window.partitionBy()
    return (
        per.select(
            *group_cols,
            "n_docs",
            "total_tokens",
            "total_chars",
            "avg_chars",
            F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("pct_docs"),
            F.round(
                F.col("total_tokens") / F.sum("total_tokens").over(w), 6
            ).alias("pct_tokens"),
        )
        .orderBy(*group_cols)
    )


def top_ngrams(
    df: DataFrame,
    text_col: str,
    n: int = 2,
    k: int = 5,
    by: str = "lang",
) -> DataFrame:
    """Top-k most frequent word n-grams per ``by`` group, deterministic
    tie-break (count desc, gram asc).  Returns
    ``(by, ngram, cnt, rank)`` with rank ≤ k.

    Scale shape: tokens → n-gram strings inside ``transform`` (no
    Python), explode, ONE hash aggregate on (group, gram) with map-side
    combine, then a per-group top-k window.  The window partitions by
    the group key over already-aggregated counts — never over corpus
    rows; skew is bounded by distinct-gram cardinality per group.

    The tokenize is projected into a column BEFORE the n-gram lambda:
    HOF lambdas don't codegen and Catalyst won't dedup a subexpression
    into them, so referencing ``tokens_of(text)`` inside ``transform``
    re-tokenizes the document once per n-gram — O(tokens²) per doc
    (measured 26 s → sub-second at sf0.1 for this exact query)."""
    from pyspark.sql import Window

    toked = df.select(F.col(by), tokens_of(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        toked.select(F.col(by), F.explode(grams).alias("ngram"))
        .groupBy(by, "ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(by).orderBy(F.col("cnt").desc(), F.col("ngram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(by, "rank")
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    round_to: int = 5,
) -> DataFrame:
    """Corpus-trained unigram log-probability per document — the
    zero-dependency analogue of CCNet's LM-perplexity quality signal:
    ``avg_logprob = mean over tokens of log2 P(token)`` with P from the
    corpus's own unigram counts (MLE, no smoothing — every scored token
    is in-vocabulary by construction).  Low values flag gibberish /
    rare-token-heavy documents.  Returns ``(id, n_tokens, avg_logprob)``.

    Rounded to ``round_to`` (default 5) places: log2 is transcendental,
    so engines may differ in the last ulp — round5 keeps cross-engine
    value-hash parity while preserving the signal.

    Scale shape: two passes over the exploded tokens — (1) one hash
    aggregate to the vocab count table, (2) per-doc token counts joined
    to vocab on the token key (AQE broadcasts when the vocab is small;
    otherwise a token-keyed shuffle join — never a driver collect) and
    one final per-doc aggregate.  The log factorization
    ``sum log2 cnt_t − n·log2 total`` means the corpus total is folded
    in as a literal-free cross join of a 1-row aggregate, not a window
    over the corpus."""
    toks = tokens_of(F.col(text_col))
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("tok")
    )
    # (doc, token) multiplicities first: the join then moves one row per
    # DISTINCT token per doc, not one per occurrence.  The vocab counts
    # DERIVE from this frame (sum of multiplicities == occurrence count)
    # so every branch shares one explode + one (id, tok) shuffle via
    # ReusedExchange instead of re-tokenizing the corpus per branch.
    per_doc_tok = exploded.groupBy("id", "tok").agg(
        F.count(F.lit(1)).alias("k")
    )
    vocab = per_doc_tok.groupBy("tok").agg(
        F.sum("k").cast("long").alias("cnt")
    )
    total = vocab.agg(F.sum(F.col("cnt").cast("long")).alias("total"))
    scored = (
        per_doc_tok.join(vocab, "tok")
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.sum(F.col("k") * F.log2(F.col("cnt"))).alias("_sum_log_cnt"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            "n_tokens",
            F.round(
                (F.col("_sum_log_cnt") - F.col("n_tokens") * F.log2("total"))
                / F.col("n_tokens"),
                round_to,
            ).alias("avg_logprob"),
        )
    )
    return scored


def bigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lam: float = 0.7,
    round_to: int = 5,
) -> DataFrame:
    """Interpolated bigram LM score per document:
    ``P(tok|prev) = lam·P_bi + (1−lam)·P_uni`` with both distributions
    trained on the corpus itself (MLE; the unigram interpolation floor
    makes unseen-in-train bigrams impossible only for the first token,
    which scores as unigram).  Better gibberish separation than
    :func:`unigram_logprob` because shuffled real words keep their
    unigram mass but lose their bigram mass.

    Returns ``(id, n_tokens, avg_logprob)`` — avg over positions 2..n
    of log2 of the interpolated probability, round5 (log2 is
    transcendental).  Documents with < 2 tokens get NULL avg_logprob.

    Scale shape: bigram pairs come straight from the token array — a
    map-only ``transform`` over positions inside the projected array,
    then one explode — so there is NO corpus self-join and no window;
    the only shuffles are the count aggregations and the token-keyed
    count joins (AQE broadcasts small vocabularies).  The token array
    is projected into a column before the pair lambda (the
    tokenize-once discipline shared with ``chunk_documents`` /
    ``top_ngrams``)."""
    toked = df.select(
        F.col(id_col).alias("id"), tokens_of(F.col(text_col)).alias("__toks")
    )
    tk = F.col("__toks")
    pair_arr = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.struct(
                F.element_at(tk, i).alias("prev"),
                F.element_at(tk, i + 1).alias("tok"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,tok:string>>"))
    bi = toked.select("id", F.explode(pair_arr).alias("p")).select(
        "id", F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok")
    )
    uni = (
        toked.select(F.explode(tk).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("uc"))
    )
    total = uni.agg(F.sum(F.col("uc").cast("long")).alias("total"))
    prevc = uni.select(F.col("tok").alias("prev"), F.col("uc").alias("pc"))
    # per-(doc, prev, tok) multiplicities so joins move distinct keys
    per = bi.groupBy("id", "prev", "tok").agg(F.count(F.lit(1)).alias("k"))
    # corpus bigram counts FOLD the per-doc table (sum of per-doc
    # multiplicities == the raw occurrence count, exactly) instead of
    # re-exploding every bigram occurrence — one corpus-wide
    # pair-generation pass instead of two, and the (prev, tok) shuffle
    # moves distinct per-doc keys, not occurrences (round 12, guide
    # §2.3 "aggregate before you shuffle")
    bic = per.groupBy("prev", "tok").agg(
        F.sum("k").cast("long").alias("bc")
    )
    scored = (
        per.join(bic, ["prev", "tok"])
        .join(prevc, "prev")
        .join(uni, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "_lp",
            F.log2(
                F.lit(lam) * (F.col("bc") / F.col("pc"))
                + F.lit(1.0 - lam) * (F.col("uc") / F.col("total"))
            ),
        )
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("_lp")).alias("_slp"),
        )
    )
    # n_tokens comes from the SAME tokenized projection (identical
    # expression, so identical values) — re-tokenizing df here cost a
    # third full normalize+regex-split pass over the corpus (round 12)
    n_tok = toked.select("id", F.size(tk).alias("n_tokens"))
    return (
        n_tok.join(scored, "id", "left")
        .select(
            "id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("_slp") / F.col("n_bigrams"), round_to).alias(
                "avg_logprob"
            ),
        )
    )


def dsir_importance(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_cond: Column,
    n_buckets: int = 256,
    round_to: int = 5,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how much more likely its hashed-unigram features are under the
    TARGET distribution (rows where ``target_cond`` holds — e.g. a
    trusted high-quality source) than under the RAW corpus.  Selecting
    top-weight (or Gumbel-top-k) rows then shifts the corpus toward the
    target domain — the published recipe for "make 100 TB of web text
    look like Wikipedia".

    Features are token buckets ``portable_hash60(token) % n_buckets``
    (the same engine-portable 60-bit md5 hash as the dedup family), and
    both bag-of-buckets models use add-one smoothing:
    ``p̂[b] = (count[b] + 1) / (total + n_buckets)``.  Returns
    ``(id, n_tokens, logweight)`` with
    ``logweight = Σ_tokens ln(p̂_target[b]/p̂_raw[b])`` rounded to
    ``round_to`` (ln is transcendental — engines differ in the last
    ulp).  Zero-token documents drop out (no features, no weight).

    Scale shape: one token explode → one ``(id, bucket)`` multiplicity
    aggregate; BOTH bucket-count models derive from that frame (≤
    ``n_buckets`` rows each — broadcast joins), so the corpus is
    tokenized and shuffled exactly once; the final per-doc aggregate
    reuses the same ``id``-keyed partitioning.  No driver state beyond
    the two 1-row totals."""
    from muller_spark.operators.dedup import portable_hash60

    ex = df.select(
        F.col(id_col).alias("id"),
        target_cond.alias("__is_target"),
        F.explode(tokens_of(F.col(text_col))).alias("tok"),
    ).select(
        "id", "__is_target",
        (portable_hash60(F.col("tok")) % F.lit(n_buckets)).alias("b"),
    )
    per = ex.groupBy("id", "__is_target", "b").agg(
        F.count(F.lit(1)).alias("k")
    )
    raw = per.groupBy("b").agg(F.sum("k").cast("long").alias("cr"))
    tgt = (
        per.filter(F.col("__is_target"))
        .groupBy("b")
        .agg(F.sum("k").cast("long").alias("ct"))
    )
    counts = (
        raw.join(tgt, "b", "left")
        .select("b", "cr", F.coalesce("ct", F.lit(0)).alias("ct"))
    )
    totals = counts.agg(
        F.sum("cr").cast("long").alias("tr"),
        F.sum("ct").cast("long").alias("tt"),
    )
    lr = F.log(
        (F.col("ct") + 1) / (F.col("tt") + F.lit(n_buckets))
    ) - F.log((F.col("cr") + 1) / (F.col("tr") + F.lit(n_buckets)))
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "b", lr.alias("lr")
    )
    return (
        per.join(F.broadcast(ratios), "b")
        .groupBy("id")
        .agg(
            F.sum("k").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("k") * F.col("lr")), round_to).alias(
                "logweight"
            ),
        )
    )


# accent-fold table (shared verbatim with the DuckDB oracle so both
# engines translate identically — Latin-1/Latin-Extended-A coverage).
# Groups: 9×a 5×c 9×e 9×i 4×n 9×o 10×u 3×y 4×s 3×z đ→d ð→d þ→t ß→b;
# the assert pins src/dst alignment (a 2-char drift here once shifted
# every fold from index 45 on, invisibly to the shared-literal oracle).
ACCENT_SRC = "àáâãäåāăąçćĉċčèéêëēĕėęěìíîïĩīĭįıñńņňòóôõöøōŏőùúûüũūŭůűųýÿŷšśŝşžźżđðþß"
ACCENT_DST = "aaaaaaaaaccccceeeeeeeeeiiiiiiiiinnnnooooooooouuuuuuuuuuyyysssszzzddtb"
assert len(ACCENT_SRC) == len(ACCENT_DST), (
    "accent fold table misaligned: %d src vs %d dst chars"
    % (len(ACCENT_SRC), len(ACCENT_DST))
)


def ccnet_normalize(col: Column) -> Column:
    """CCNet-style text normalization for dedup/LM training: lowercase,
    fold accents (fixed translate table — the SAME table string feeds
    the SQL oracle, so parity is by construction), map every digit to
    0, strip non-text punctuation to spaces, collapse whitespace.
    Entirely JVM-side (translate + regexp) — codegen, no UDF."""
    x = F.lower(col)
    x = F.translate(x, ACCENT_SRC, ACCENT_DST)
    x = F.regexp_replace(x, "[0-9]", "0")
    x = F.regexp_replace(x, r"[^a-z0一-鿿\s]+", " ")
    return F.regexp_replace(F.trim(x), r"\s+", " ")


def char_entropy(col: Column, round_to: int = 5) -> Column:
    """Shannon entropy (bits/char) of the character distribution —
    near-zero entropy flags repeated-character junk; unusually high
    entropy flags base64/binary spill.

    Single O(chars) pass: sort the char array, accumulate run lengths
    and Σ r·log2(r) at run boundaries in one struct-accumulator
    aggregate, then H = log2(n) − Σ r·log2(r) / n.  (The obvious
    count-map formulation re-evaluates the map per element inside HOF
    lambdas — the same subexpression trap as chunk/top_ngrams — and a
    run of it measured ~30× slower.)  round5: log2 is transcendental."""
    chars = F.array_sort(F.filter(F.split(col, ""), lambda c: c != ""))
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0.0).alias("s"),
        F.lit(0).alias("cnt"),
    )

    def step(acc, c):
        same = acc["prev"] == c
        closed = F.when(
            (~same) & (acc["run"] > 0),
            acc["s"] + acc["run"] * F.log2(acc["run"]),
        ).otherwise(acc["s"])
        return F.struct(
            c.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            closed.alias("s"),
            (acc["cnt"] + 1).alias("cnt"),
        )

    def finish(acc):
        s = F.when(
            acc["run"] > 0, acc["s"] + acc["run"] * F.log2(acc["run"])
        ).otherwise(acc["s"])
        n = acc["cnt"].cast("double")
        return F.when(acc["cnt"] > 0, F.log2(n) - s / n).otherwise(F.lit(0.0))

    return F.round(F.aggregate(chars, zero, step, finish), round_to)


def vocab_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    k: int = 50,
    round_to: int = 5,
) -> DataFrame:
    """Token-distribution drift between two corpus slices (snapshots,
    sources, train vs incoming batch): per-token contribution to
    KL(P‖Q) in bits, P from ``df_a`` and Q from ``df_b``, add-1
    smoothed over the union vocabulary so unseen tokens stay finite.
    Returns the top ``k`` drift-driving tokens
    ``(token, p, q, kl_bits)`` ordered by contribution (desc, token
    tie-break) — the drift-monitoring primitive for detecting topic /
    pipeline changes between ingests.

    Scale shape: one hash aggregate per side, a full-outer join on the
    token key, and a top-k sort of the (vocabulary-sized, not
    corpus-sized) result.  Totals fold in via broadcast 1-row
    aggregates."""
    def counts(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode(tokens_of(F.col(text_col))).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    ca = counts(df_a).withColumnRenamed("c", "ca")
    cb = counts(df_b).withColumnRenamed("c", "cb")
    joined = ca.join(cb, "token", "full_outer").select(
        "token",
        F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
        F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
    )
    tot = joined.agg(
        F.sum("ca").alias("ta"),
        F.sum("cb").alias("tb"),
        F.count(F.lit(1)).alias("v"),
    )
    p = (F.col("ca") + 1) / (F.col("ta") + F.col("v")).cast("double")
    q = (F.col("cb") + 1) / (F.col("tb") + F.col("v")).cast("double")
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.round(p, round_to + 4).alias("p"),
            F.round(q, round_to + 4).alias("q"),
            F.round(p * F.log2(p / q), round_to).alias("kl_bits"),
        )
        .orderBy(F.col("kl_bits").desc(), F.col("token").asc())
        .limit(k)
    )


def quantile_buckets(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    fractions: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, ...] = ("tail", "middle", "head"),
    bucket_col: str = "bucket",
    approx_accuracy: int | None = None,
) -> DataFrame:
    """CCNet-style quality bucketing: split documents into quantile
    buckets of a score column (head / middle / tail in the CCNet
    paper's terms, with HIGHER score = better, so ``head`` is the top
    fraction), optionally per group (language, source).  ``fractions``
    are the CUT POINTS (ascending, len(labels)-1 of them): a doc whose
    score is <= the group's p-quantile for cut i gets ``labels[i]``.

    Scale shape — deliberately NOT an ntile window: a per-group window
    serializes each language through one task (a one-language 100 TB
    corpus = one sorting reducer).  Instead the cut thresholds are one
    percentile aggregate per group broadcast back, and the label is a
    map-only comparison.  The default EXACT percentile buffers the
    distinct score values of each group in the aggregation state —
    fine at test/bench scale and required for cross-engine oracle
    parity, but for a continuous score over a one-language 100 TB
    corpus that state is corpus-sized; pass ``approx_accuracy`` (e.g.
    10000) to switch to ``approx_percentile``, whose sketch state is
    bounded by the accuracy constant — that is the 100 TB path.  Ties
    land on the <= side in both engines, so the split is deterministic
    for any score column that is itself cross-engine stable (e.g. a
    round5 ``avg_logprob``).

    NULL handling: rows with a NULL score get a NULL bucket (they are
    excluded from the thresholds by both engines' percentile, so no
    label is honest — they must NOT land in the top bucket); a NULL
    group key is a real group (null-safe join), bucketed against its
    own thresholds.

    Reference parity: quality-partitioned exports mirror the filter +
    materialize flow of /root/reference/muller/core/query
    /filter_vectorized.py; the bucketing rule is public CCNet
    (Wenzek et al., 2020) head/middle/tail."""
    if len(fractions) != len(labels) - 1:
        raise ValueError(
            f"need len(labels)-1 cut fractions, got {len(fractions)} cuts "
            f"for {len(labels)} labels"
        )
    if list(fractions) != sorted(fractions):
        raise ValueError(f"cut fractions must ascend, got {fractions}")
    cuts = F.array(*[F.lit(p) for p in fractions])
    if approx_accuracy is not None:
        pct = F.percentile_approx(F.col(score_col), cuts, F.lit(approx_accuracy))
    else:
        pct = F.percentile(F.col(score_col), cuts)
    if group_col is not None:
        thr = df.groupBy(group_col).agg(pct.alias("_thr"))
        labeled = df.join(
            F.broadcast(thr.withColumnRenamed(group_col, "_thr_g")),
            F.col(group_col).eqNullSafe(F.col("_thr_g")),
        ).drop("_thr_g")
    else:
        thr = df.agg(pct.alias("_thr"))
        labeled = df.crossJoin(F.broadcast(thr))
    expr = F.lit(labels[-1])
    for i in range(len(fractions) - 1, -1, -1):
        expr = F.when(
            F.col(score_col) <= F.element_at("_thr", i + 1), F.lit(labels[i])
        ).otherwise(expr)
    expr = F.when(F.col(score_col).isNull(), F.lit(None).cast("string")).otherwise(
        expr
    )
    return labeled.withColumn(bucket_col, expr).drop("_thr")


def pmi_top_pairs(
    df: DataFrame,
    text_col: str,
    k: int = 50,
    min_count: int = 5,
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information over
    adjacent token pairs: PMI = ln(p(ab) / (p(a)·p(b))) with p(ab)
    from the corpus bigram distribution and p(·) from the unigram
    distribution — the classic "which word pairs stick together"
    analysis used to mine multi-word entities and template boilerplate.

    Returns (rank, w1, w2, pair_count, pmi), pmi rounded to 6 (ln is
    transcendental; the rounded value also drives the rank so both
    engines order identically), ties broken on (w1, w2).  Pairs and
    unigrams below ``min_count`` are dropped BEFORE ranking — low
    counts make PMI explode (a pair seen once between two hapaxes gets
    near-maximal PMI), so unfiltered PMI surfaces noise, not signal.

    Scale shape: bigram pairs come from a map-only transform over the
    projected token array (no self-join, no window — the
    bigram_logprob discipline); the unigram table is vocabulary-sized,
    so AQE broadcasts it into both count joins; the final ranking is a
    TakeOrderedAndProject over the filtered pair table."""
    from pyspark.sql import Window

    toked = df.select(tokens_of(F.col(text_col)).alias("__toks"))
    tk = F.col("__toks")
    pair_arr = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - 2),
            lambda i: F.struct(
                tk[i].alias("w1"), tk[i + 1].alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pairs = toked.select(F.explode(pair_arr).alias("p")).select(
        "p.w1", "p.w2"
    )
    # cache the two VOCABULARY-sized aggregates: uni feeds three
    # consumers (n_tok scalar + both count joins) and pc_all two (the
    # n_pair scalar + the filtered ranking input) — uncached, Spark
    # re-runs the corpus tokenize+explode+aggregate per consumer
    # (5 passes observed in the executed plan).  Both frames are
    # bounded by vocabulary size, safe to pin at any corpus scale.
    uni = (
        toked.select(F.explode(tk).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .cache()
    )
    n_tokens = uni.agg(F.sum("wc").alias("n_tok"))
    pc_all = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("pair_count")
    ).cache()
    # p(ab) normalizes by the TOTAL bigram mass, not the post-filter
    # mass — filtering first would inflate every surviving pair's
    # probability by the dropped tail's share
    n_pairs = pc_all.agg(F.sum("pair_count").alias("n_pair"))
    pc = pc_all.filter(F.col("pair_count") >= min_count)
    u1 = uni.select(F.col("w").alias("w1"), F.col("wc").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("wc").alias("c2"))
    scored = (
        pc.join(u1, "w1")
        .join(u2, "w2")
        .filter((F.col("c1") >= min_count) & (F.col("c2") >= min_count))
        .crossJoin(F.broadcast(n_tokens))
        .crossJoin(F.broadcast(n_pairs))
        .select(
            "w1", "w2", "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("n_pair"))
                    / ((F.col("c1") / F.col("n_tok"))
                       * (F.col("c2") / F.col("n_tok")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    topk = scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)
    w = Window.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "w1", "w2", "pair_count", "pmi"
    )


def search_snippets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    terms: "list[str]",
    width: int = 80,
) -> DataFrame:
    """Result-display snippets for a term query — the presentation
    layer BM25/phrase search needs: per document, a ``width``-char
    window centred on the FIRST occurrence of any query term
    (case-insensitive), plus the total term hit count.

    Returns (id, first_pos, n_hits, snippet): ``first_pos`` is the
    1-based char position of the earliest term match (0 = no match,
    snippet falls back to the document prefix — a search UI still
    shows context rows for filter-only hits); ``n_hits`` counts
    word-boundary occurrences of ALL terms.  NULL text yields
    (0, 0, NULL).  Terms must be alphanumeric tokens (the word-
    boundary regex and the engine-portable contract both assume no
    regex metacharacters).

    Map-only: locate/substring/regexp_count compose in whole-stage
    codegen; no UDF, no shuffle."""
    import re as _re

    if not terms:
        raise ValueError("terms must be a non-empty list")
    for t in terms:
        if not _re.fullmatch(r"[a-z0-9]+", t, _re.IGNORECASE):
            raise ValueError(
                f"terms must be alphanumeric tokens, got {t!r}"
            )
    if width <= 0:
        raise ValueError("width must be positive")
    low = F.lower(F.col(text_col))
    positions = [F.locate(t.lower(), low) for t in terms]
    nonzero = [
        F.when(p > 0, p).otherwise(F.lit(2**31 - 1)) for p in positions
    ]
    first = F.least(*nonzero) if len(nonzero) > 1 else nonzero[0]
    first_pos = F.when(first == 2**31 - 1, F.lit(0)).otherwise(first)
    hits = None
    for t in terms:
        c = F.coalesce(
            F.regexp_count(low, F.lit(rf"\b{t.lower()}\b")), F.lit(0)
        )
        hits = c if hits is None else (hits + c)
    start = F.greatest(first_pos - F.lit(width // 2), F.lit(1))
    snippet = F.when(
        F.col(text_col).isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.when(
            first_pos > 0, F.substring(F.col(text_col), start, width)
        ).otherwise(F.substring(F.col(text_col), 1, width))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(first_pos).cast("int").alias("first_pos"),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(hits).cast("int").alias("n_hits"),
        snippet.alias("snippet"),
    )


def zipf_report(
    df: DataFrame,
    text_col: str,
    k: int = 25,
    n_fit: int = 500,
) -> DataFrame:
    """Rank-frequency (Zipf) corpus report: the top-``k`` tokens with
    their global rank and count, each row carrying ``zipf_slope`` — the
    least-squares slope of ln(count) on ln(rank) fitted over the top
    ``n_fit`` tokens.  A healthy natural-language corpus sits near −1;
    a flat slope flags templated/synthetic text, a cliff flags
    boilerplate domination — the one-number corpus-health check run
    before and after a curation pass.

    The fit uses the top ``n_fit`` tokens BY DESIGN (the hapax tail is
    where Zipf breaks and where rank requires a vocabulary-wide total
    order); everything after the one corpus-wide hash aggregate is
    bounded by ``n_fit``: top-n selection plans as
    TakeOrderedAndProject (partition-local top-k, no global sort), the
    rank window and the fold run over ≤ ``n_fit`` rows.

    Engine-portable by construction: the slope's four sums fold over
    the points IN RANK ORDER (``F.aggregate`` over a sorted array —
    the DuckDB oracle folds the identical order with ``list_reduce``),
    so partition count can't reorder float addition; the final slope
    is rounded to 6 (ln differs between libm implementations only in
    the last ulp — noise ~1e-13 across 500 terms)."""
    counts = (
        df.select(F.explode(tokens_of(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(n_fit)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    ranked = top.withColumn("rank", F.row_number().over(w).cast("long"))

    pts = ranked.groupBy().agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("rank").alias("r"),
                    F.log(F.col("rank").cast("double")).alias("x"),
                    F.log(F.col("cnt").cast("double")).alias("y"),
                )
            )
        ).alias("pts")
    )
    zero = F.lit(0.0).cast("double")
    init = F.struct(
        zero.alias("n"), zero.alias("sx"), zero.alias("sy"),
        zero.alias("sxx"), zero.alias("sxy"),
    )
    acc = F.aggregate(
        F.col("pts"),
        init,
        lambda a, p: F.struct(
            (a["n"] + 1).alias("n"),
            (a["sx"] + p["x"]).alias("sx"),
            (a["sy"] + p["y"]).alias("sy"),
            (a["sxx"] + p["x"] * p["x"]).alias("sxx"),
            (a["sxy"] + p["x"] * p["y"]).alias("sxy"),
        ),
    )
    varx = acc["sxx"] - acc["sx"] * acc["sx"] / acc["n"]
    # degenerate fits (a 1-token vocabulary -> zero ln-rank variance)
    # yield NULL, not an engine-dependent inf/NaN; the oracle guards
    # with the identical CASE
    slope = F.when(
        varx > 0,
        F.round(
            (acc["sxy"] - acc["sx"] * acc["sy"] / acc["n"]) / varx, 6
        ),
    )
    slope_df = pts.select(slope.alias("zipf_slope"))
    return (
        ranked.filter(F.col("rank") <= k)
        .crossJoin(F.broadcast(slope_df))
        .select("rank", "token", "cnt", "zipf_slope")
        .orderBy("rank")
    )


def bpe_top_pairs(
    df: DataFrame,
    text_col: str,
    k: int = 20,
) -> DataFrame:
    """The first byte-pair-encoding merge round, distributed: adjacent
    SYMBOL pairs over the corpus vocabulary (each word split to
    characters plus a terminal ``</w>`` marker), weighted by word
    frequency — exactly the statistic a BPE tokenizer trainer computes
    to pick each merge.  Returns the top-``k`` pairs as (rank, left,
    right, pair_count), count desc / (left, right) asc tie-break —
    rank 1 is the merge BPE would perform.

    Scale shape: ONE corpus pass aggregates word frequencies (the
    vocabulary is the working set from there on — corpus-size-free);
    pairs explode per VOCAB WORD (bounded by Σ word lengths over the
    vocabulary, not the corpus), one weighted hash aggregate, then
    TakeOrderedAndProject for the top-k and a ≤k-row rank window.
    Iterative multi-merge training loops this kernel with the merge
    applied to the vocabulary between rounds — the per-round cost
    never touches the corpus again."""
    words = (
        df.select(F.explode(tokens_of(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.concat(
        F.split(F.col("word"), ""),
        F.array(F.lit("</w>")),
    )
    sym_pairs = F.transform(
        F.sequence(F.lit(1), F.size(chars) - 1),
        lambda i: F.struct(
            F.element_at(chars, i).alias("left"),
            F.element_at(chars, i + 1).alias("right"),
        ),
    )
    pair_counts = (
        words.select("freq", F.explode(sym_pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("pair_count"))
    )
    top = pair_counts.orderBy(
        F.col("pair_count").desc(), F.col("left").asc(), F.col("right").asc()
    ).limit(k)
    w = Window.orderBy(
        F.col("pair_count").desc(), F.col("left").asc(), F.col("right").asc()
    )
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "left", "right", "pair_count")
        .orderBy("rank")
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 50,
    max_vocab_words: int = 100_000,
) -> DataFrame:
    """Train a byte-pair-encoding merge table: ``num_merges`` merges
    learned greedily (most frequent adjacent symbol pair, count desc /
    (left, right) asc tie-break — the :func:`bpe_top_pairs` statistic
    applied iteratively).  Returns (merge_idx, left, right,
    pair_count) — the ordered merge table a tokenizer ships.

    Scale shape — the standard industrial split: the CORPUS work is
    ONE distributed pass (token hash-aggregate → word-frequency
    table); the merge loop then runs over that table on the driver,
    bounded by ``max_vocab_words`` (top words by frequency, then word
    asc — at web scale the top 100k words carry ~all token mass, and
    truncation only perturbs counts of rare-word pairs).  Iterating
    merges distributedly would re-shuffle the vocabulary per merge for
    no benefit: after the corpus pass the working set is vocabulary-
    sized by construction.  NOT SQL-expressible (greedy iteration), so
    driver coverage is rows-only; tests replay a pure-Python BPE."""
    if num_merges <= 0:
        raise ValueError("num_merges must be positive")
    rows = (
        df.select(F.explode(tokens_of(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_vocab_words)
        .collect()
    )  # bounded: max_vocab_words rows, the documented driver budget
    vocab = {tuple(r["word"]) + ("</w>",): int(r["freq"]) for r in rows}

    merges = []
    for idx in range(num_merges):
        counts: "dict[tuple[str, str], int]" = {}
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((idx, left, right, cnt))
        merged = left + right
        new_vocab: "dict[tuple[str, ...], int]" = {}
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return df.sparkSession.createDataFrame(
        merges, "merge_idx int, left string, right string, pair_count long"
    )


def apply_bpe(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: "list[tuple[str, str]]",
) -> DataFrame:
    """Encode documents with a trained BPE merge table
    (:func:`bpe_train` output): per word, merges apply greedily in
    LEARNED ORDER (lowest merge_idx first — the standard
    priority-ranked BPE encoder), and the document's symbol count is
    returned as (id, n_bpe_symbols).  Completes the train→apply loop:
    ``bpe_train`` learns on the corpus once; this encoder then runs
    map-only anywhere.

    Scale shape: the merge table (≤ vocab-merge-sized, kilobytes) rides
    the task closure; encoding is an Arrow-batched mapInPandas over
    (id, text) — zero shuffle, linear in corpus bytes.  Python is
    legitimate here: ranked-merge rewriting is inherently sequential
    per word (same reasoning as the zlib/signature kernels)."""
    import pandas as pd

    from muller_spark.plans.conditions import TOKEN_SPLIT_REGEX

    ranks = {pair: i for i, pair in enumerate(merges)}
    split_regex = TOKEN_SPLIT_REGEX

    def encode_word(word: str, cache: dict) -> int:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            syms[best:best + 2] = [syms[best] + syms[best + 1]]
        cache[word] = len(syms)
        return len(syms)

    def run(iterator):
        import re

        split = re.compile(split_regex)
        cache: dict = {}
        for pdf in iterator:
            ids, counts = [], []
            for doc_id, text in zip(pdf["id"], pdf["text"]):
                norm = " ".join(str(text or "").lower().split())
                toks = [t for t in split.split(norm) if t]
                ids.append(doc_id)
                counts.append(sum(encode_word(t, cache) for t in toks))
            yield pd.DataFrame({"id": ids, "n_bpe_symbols": counts})

    src = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    return src.mapInPandas(run, "id long, n_bpe_symbols long")


def remove_duplicated_windows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Boilerplate-span removal: REWRITE each document dropping every
    token covered by an ``n``-gram window that appears in ≥
    ``min_docs`` distinct documents — the span-level companion to
    document-level dedup (cross-doc duplicated text is memorized
    disproportionately; removing the span keeps the document's unique
    content instead of dropping the whole doc).

    Returns (id, clean_text, n_tokens_removed): ``clean_text`` is the
    surviving NORMALIZED token stream (space-joined — same
    canonicalization as every text operator here); token-free/NULL
    docs pass through as empty with 0 removed.

    Scale shape: windows explode once, duplicated windows come from ONE
    (window → distinct-doc count) hash aggregate; marked window starts
    are semi-joined back and collected per doc (bounded by the doc's
    own window count), and the rewrite is a map-side two-arg
    ``filter`` over the token array — no second corpus shuffle, no
    windows.  The per-token coverage probe is O(marked starts) with
    marked starts ≤ tokens, so worst case is O(len²) for a fully
    boilerplate doc — the pathological case that gets emptied anyway."""
    if n <= 0 or min_docs <= 1:
        raise ValueError("need n >= 1 and min_docs >= 2")
    toked = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(
            tokens_of(F.col(text_col)), F.array().cast("array<string>")
        ).alias("toks"),
    )
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wins = toked.select("id", F.posexplode(grams).alias("pos", "w"))
    hot = (
        wins.groupBy("w")
        .agg(F.count_distinct(F.col("id")).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("w")
    )
    # NO broadcast hint: unlike the df>10k hot-shingle guards elsewhere
    # (provably tiny sets), min_docs>=2 duplicated windows can be a
    # large fraction of ALL distinct windows on a boilerplate-heavy
    # corpus — pinning broadcast would drive the driver into the 8 GB
    # cap exactly at scale.  AQE broadcasts it when it IS small.
    marked = (
        wins.join(hot, "w", "semi")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    starts = F.coalesce(F.col("starts"), F.array().cast("array<int>"))
    covered = lambda idx: F.exists(  # noqa: E731
        starts, lambda s: (idx >= s) & (idx < s + n)
    )
    clean = F.filter(toks, lambda t, i: ~covered(i))
    return (
        toked.join(marked, "id", "left")
        .select(
            "id",
            F.concat_ws(" ", clean).alias("clean_text"),
            (F.size(toks) - F.size(clean)).cast("long")
            .alias("n_tokens_removed"),
        )
    )
