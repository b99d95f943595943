"""Corpus quality filtering for training-data pipelines.

The reference engine has no quality filters; these are the standard
pre-training corpus gates (Gopher §A1.1-style repetition and word
rules, C4-style content flags, PII surface scans) re-expressed as
DataFrame transforms:

- **repetition_stats** — per-document repetition signals: distinct-word
  fraction, adjacent-duplicate fraction, most-frequent-bigram/trigram
  mass.  The n-gram mode is an explode → (id, gram) count → per-id
  max/sum — two id-keyed shuffles, no per-doc state on the driver.
- **gopher_filter** — word-count / mean-word-length / stopword /
  repetition thresholds folded into per-rule flags + a `keep` verdict.
- **pii_scan** — regex surface counts (emails, IPv4, phone-ish runs,
  URLs) per document; patterns stay in the RE2 ∩ java.util.regex
  dialect so SQL oracles reproduce counts exactly.

Everything is built from JVM-side expressions (split / filter /
zip_with / regexp_count); fractions are rounded to 6 dp so
cross-engine value hashes match (same float discipline as
`__spark_entry__`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from muller_spark.operators.dedup import let_bound
from muller_spark.operators.text import STOPWORDS_EN, tokens_of
from muller_spark.partitioning import ensure_parallelism

# single source of truth: text.STOPWORDS_EN — a second hand-copied list
# here had to be kept in sync by eye (the round-5 accent-table lesson)
STOP_WORDS_EN = tuple(sorted(STOPWORDS_EN))

# RE2 ∩ java.util.regex — no lookaround, no \b (dialect-safe)
PII_PATTERNS = {
    "n_emails": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "n_ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
    "n_phones": r"\+[0-9][0-9() .-]{7,}[0-9]",
    "n_urls": r"https?://[^ \t\n]+",
}


# single tokenizer everywhere: text.tokens_of (was a verbatim re-impl)
_tokens = tokens_of


def _round6(col: Column) -> Column:
    return F.round(col, 6)


def _null_safe_on(left: DataFrame, right: DataFrame, cols: "list[str]"):
    """Null-safe equi-join condition on shared group keys: a plain
    USING-style join drops every row whose key is NULL (NULL != NULL),
    silently losing the NULL group a groupBy dutifully produced."""
    cond = None
    for c in cols:
        e = left[c].eqNullSafe(right[c])
        cond = e if cond is None else cond & e
    return cond


def repetition_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Per-document repetition signals (Gopher §A1.1 analogues).

    Returns (id, n_words, distinct_word_frac, consec_dup_frac,
    top_bigram_frac, top_trigram_frac):

    - ``distinct_word_frac`` — |set(words)| / |words|
    - ``consec_dup_frac`` — adjacent equal-word positions / (n−1)
    - ``top_{bi,tri}gram_frac`` — occurrences of the most frequent
      n-gram / total n-gram occurrences

    The adjacent-duplicate check uses ``zip_with`` over two shifted
    slices (each referencing the token array once) rather than indexing
    the array inside a lambda — projection collapse would otherwise
    inline the tokenizer per element.  The n-gram modes shuffle on
    (id, gram) then (id): scale is bounded by corpus token count, never
    by per-document state.
    """
    toks = _tok_df(df, text_col, id_col)
    base = toks.select(
        "id",
        F.size("t").alias("n_words"),
        _round6(
            let_bound(
                F.col("t"),
                lambda t: F.when(
                    F.size(t) > 0,
                    F.size(F.array_distinct(t)) / F.size(t),
                ).otherwise(F.lit(0.0)),
            )
        ).alias("distinct_word_frac"),
        _consec_dup_frac_col(),
    )
    out = (
        base
        .join(_top_gram_frac(toks, 2, "top_bigram_frac"), "id", "left")
        .join(_top_gram_frac(toks, 3, "top_trigram_frac"), "id", "left")
        .fillna(0.0, ["top_bigram_frac", "top_trigram_frac"])
    )
    return out


def _tok_df(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, t=token array), width-corrected for single-file inputs.
    Every multi-reference of ``t`` downstream goes through let_bound:
    after projection collapse a plain column reference re-runs the
    tokenizer per lambda element (see dedup.let_bound)."""
    return ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("t")
    )


def _consec_dup_frac_col() -> Column:
    return _round6(
        let_bound(
            F.col("t"),
            lambda t: F.when(
                F.size(t) > 1,
                F.size(
                    F.filter(
                        F.zip_with(
                            F.slice(t, 1, F.size(t) - 1),
                            F.slice(t, 2, F.size(t) - 1),
                            lambda x, y: x == y,
                        ),
                        lambda eq: eq,
                    )
                ) / (F.size(t) - 1),
            ).otherwise(F.lit(0.0)),
        )
    ).alias("consec_dup_frac")


def _mean_word_len_col() -> Column:
    return _round6(
        let_bound(
            F.col("t"),
            lambda t: F.when(
                F.size(t) > 0,
                F.aggregate(
                    F.transform(t, lambda w: F.length(w)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ) / F.size(t),
            ).otherwise(F.lit(0.0)),
        )
    ).alias("mean_word_len")


def _top_gram_frac(toks: DataFrame, gram_n: int, out_name: str) -> DataFrame:
    grams = toks.select(
        "id",
        F.explode(
            let_bound(
                F.col("t"),
                lambda t: F.when(
                    F.size(t) >= gram_n,
                    F.transform(
                        F.sequence(F.lit(0), F.size(t) - gram_n),
                        lambda i: F.concat_ws(" ", F.slice(t, i + 1, gram_n)),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy("id").agg(
        _round6(F.max("c") / F.sum("c")).alias(out_name)
    )


def gopher_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stop_hits: int = 2,
    max_top_bigram_frac: float = 0.18,
    max_consec_dup_frac: float = 0.30,
) -> DataFrame:
    """Gopher-style document quality gate.

    Returns per-document rule flags plus ``keep`` (all rules pass):
    (id, n_words, mean_word_len, stop_hits, top_bigram_frac,
    consec_dup_frac, pass_n_words, pass_word_len, pass_stop,
    pass_bigram, pass_consec, keep).
    """
    # one token scan: every per-row stat is a projection over the same
    # toks frame; only the bigram mode needs an aggregate + join
    toks = _tok_df(df, text_col, id_col)
    stop_arr = F.array(*[F.lit(w) for w in STOP_WORDS_EN])
    per_row = toks.select(
        "id",
        F.size("t").alias("n_words"),
        _mean_word_len_col(),
        F.size(F.array_intersect("t", stop_arr)).alias("stop_hits"),
        _consec_dup_frac_col(),
    )
    j = (
        per_row
        .join(_top_gram_frac(toks, 2, "top_bigram_frac"), "id", "left")
        .fillna(0.0, ["top_bigram_frac"])
    )
    pass_n_words = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    pass_word_len = (F.col("mean_word_len") >= min_mean_word_len) & (
        F.col("mean_word_len") <= max_mean_word_len
    )
    pass_stop = F.col("stop_hits") >= min_stop_hits
    pass_bigram = F.col("top_bigram_frac") <= max_top_bigram_frac
    pass_consec = F.col("consec_dup_frac") <= max_consec_dup_frac
    return j.select(
        "id", "n_words", "mean_word_len", "stop_hits",
        "top_bigram_frac", "consec_dup_frac",
        pass_n_words.alias("pass_n_words"),
        pass_word_len.alias("pass_word_len"),
        pass_stop.alias("pass_stop"),
        pass_bigram.alias("pass_bigram"),
        pass_consec.alias("pass_consec"),
        (pass_n_words & pass_word_len & pass_stop & pass_bigram & pass_consec)
        .alias("keep"),
    )


def group_zscores(
    df: DataFrame,
    value_col: str,
    group_cols: "list[str]",
    scale: int = 2,
) -> DataFrame:
    """Per-group standardization / outlier scoring: appends
    (group_mean, group_std, z) for ``value_col`` within each group.

    Mean and sample variance come from decimal power sums (exact,
    accumulation-order independent — the repo's float discipline), so a
    SQL oracle reproduces every z bit-for-bit after 6-dp rounding.
    One aggregate + one broadcast-friendly join back on the group keys;
    ``z`` is NULL for degenerate groups (n < 2 or zero variance).
    """
    n = F.count(F.lit(1)).alias("_n")
    s1 = F.sum(F.col(value_col).cast(f"decimal(28,{scale})")).alias("_s1")
    s2 = F.sum(
        (F.col(value_col).cast(f"decimal(28,{scale})")
         * F.col(value_col).cast(f"decimal(28,{scale})"))
    ).alias("_s2")
    stats = df.groupBy(*group_cols).agg(n, s1, s2)
    nn = F.col("_n").cast("double")
    s1d = F.col("_s1").cast("double")
    s2d = F.col("_s2").cast("double")
    mean = s1d / nn
    # greatest(.., 0): the power-sum difference can cancel to a tiny
    # NEGATIVE double for constant-valued groups (s2 - s1^2/n ~ -1e-20),
    # and sqrt of that is NaN — which nullif(NaN, 0) does NOT catch, so
    # the whole group's z would silently become NaN instead of NULL
    var = F.when(
        F.col("_n") > 1,
        F.greatest((s2d - s1d * s1d / nn) / (nn - 1), F.lit(0.0)),
    )
    stats = stats.select(
        *group_cols,
        F.round(mean, 6).alias("group_mean"),
        F.round(F.sqrt(var), 6).alias("group_std"),
    )
    joined = df.join(F.broadcast(stats), _null_safe_on(df, stats, group_cols))
    joined = joined.drop(*[stats[c] for c in group_cols])
    z = (F.col(value_col) - F.col("group_mean")) / F.nullif(
        F.col("group_std"), F.lit(0.0)
    )
    return joined.withColumn("z", F.round(z, 6))


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: "list[str]",
    threshold: float = 3.5,
    round_to: int = 6,
) -> DataFrame:
    """Robust per-group outlier detection via the modified z-score
    ``0.6745 · (x − median) / MAD`` (Iglewicz–Hoaglin): unlike
    :func:`group_zscores`' mean/std, the median/MAD pair does not let a
    single pathological document (a 100 MB crawl artifact) inflate the
    spread and mask every other outlier — the failure mode that matters
    when the statistic's JOB is to find corrupt rows.  Returns the rows
    with ``|robust_z| > threshold`` plus (group_median, group_mad,
    robust_z); groups whose MAD is 0 (over half the values identical)
    yield no outliers, by definition of the statistic.

    Both medians are exact interpolated percentiles (Spark
    ``percentile``, DuckDB ``quantile_cont`` — the same (a+b)/2
    definition, so doubles agree bit-for-bit before the 6-dp round).

    Scale shape: two group-keyed aggregates (values → median, absolute
    deviations → MAD) and two broadcast joins back — group stats are
    one row per group, so the corpus shuffles only on the group key,
    twice, with map-side partial percentile buffers.  For the typical
    "per-source / per-language" grouping, group count ≪ corpus."""
    med = (
        df.groupBy(*group_cols)
        .agg(F.percentile(F.col(value_col).cast("double"), 0.5).alias(
            "group_median"
        ))
    )
    with_med = df.join(F.broadcast(med), _null_safe_on(df, med, group_cols))
    with_med = with_med.drop(*[med[c] for c in group_cols])
    mad = (
        with_med.groupBy(*group_cols)
        .agg(F.percentile(
            F.abs(F.col(value_col).cast("double") - F.col("group_median")),
            0.5,
        ).alias("group_mad"))
    )
    z = (
        F.lit(0.6745)
        * (F.col(value_col).cast("double") - F.col("group_median"))
        / F.col("group_mad")
    )
    return (
        with_med.join(F.broadcast(mad), _null_safe_on(with_med, mad, group_cols))
        .drop(*[mad[c] for c in group_cols])
        .filter(F.col("group_mad") > 0)
        .withColumn("robust_z", F.round(z, round_to))
        .filter(F.abs(F.col("robust_z")) > threshold)
    )


def pii_scan(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Per-document PII / link surface counts: (id, n_emails, n_ipv4,
    n_phones, n_urls, has_pii).  Counts are leftmost non-overlapping
    regex matches — identical semantics in Spark ``regexp_count`` and
    DuckDB ``len(regexp_extract_all(...))``."""
    # coalesce to 0: regexp_count(NULL) is NULL, which would make
    # has_pii NULL — a verdict matching neither filter(has_pii) nor
    # filter(~has_pii), silently dropping NULL-text docs from both sides
    counts = [
        F.coalesce(F.regexp_count(F.col(text_col), F.lit(pat)), F.lit(0))
        .alias(name)
        for name, pat in PII_PATTERNS.items()
    ]
    out = df.select(F.col(id_col).alias("id"), *counts)
    any_pii = None
    for name in PII_PATTERNS:
        c = F.col(name) > 0
        any_pii = c if any_pii is None else (any_pii | c)
    return out.withColumn("has_pii", any_pii)


def pipeline_survival(
    df: DataFrame,
    stages: "list[tuple[str, Column]]",
) -> DataFrame:
    """Filter-cascade survival report — the per-stage accounting every
    curation pipeline (RefinedWeb/Dolma-style) publishes next to its
    corpus: for each named stage, how many documents survive all stages
    up to and including it.

    ``stages`` is an ordered list of ``(name, boolean Column)``; a NULL
    predicate counts as NOT passing (coalesced to false).  Returns
    ``(stage_idx, stage, survivors, dropped_here, pct_of_input)`` with
    ``pct_of_input`` rounded to 6 places.

    Scale shape: ONE aggregate pass over the corpus — every stage's
    cumulative conditions are folded into sums in the same partial
    aggregation (map-side combine), then the single result row is
    unpivoted driver-free with ``stack``.  N stages never means N scans.
    """
    import re

    if not stages:
        # stack(0, ) is malformed SQL — fail with the real reason
        raise ValueError("pipeline_survival needs at least one stage")
    for name, _ in stages:
        if not re.fullmatch(r"[A-Za-z0-9_ .\-]+", name):
            raise ValueError(f"stage name {name!r} must be [A-Za-z0-9_ .-]+")
    cum = F.lit(True)
    aggs = [F.count(F.lit(1)).alias("n0")]
    for i, (_, cond) in enumerate(stages, 1):
        cum = cum & F.coalesce(cond, F.lit(False))
        # coalesce: sum over zero rows is NULL, the report wants 0
        aggs.append(
            F.coalesce(F.sum(cum.cast("long")), F.lit(0).cast("long")).alias(f"s{i}")
        )
    one = df.agg(*aggs)
    parts = []
    prev = "n0"
    for i, (name, _) in enumerate(stages, 1):
        parts.append(f"{i}, '{name}', s{i}, {prev} - s{i}")
        prev = f"s{i}"
    stacked = one.selectExpr(
        "n0",
        f"stack({len(stages)}, {', '.join(parts)}) as "
        "(stage_idx, stage, survivors, dropped_here)",
    )
    return (
        stacked.select(
            "stage_idx",
            "stage",
            "survivors",
            "dropped_here",
            F.when(F.col("n0") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("survivors") / F.col("n0"), 6))
            .alias("pct_of_input"),
        )
        .orderBy("stage_idx")
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between a REFERENCE and a CURRENT
    snapshot of a numeric column — the standard drift monitor a
    training pipeline runs on feature/score distributions between
    crawls (public credit-scoring practice: PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted).

    Buckets are the reference's exact ``buckets``-quantile cut points
    (so the reference distributes ~uniformly); each side's rows are
    assigned ``bucket = #cuts strictly below the value`` and counted.
    Laplace smoothing (+0.5 per bucket) keeps empty buckets finite
    without dropping them.  Returns one row per bucket,
    ``(bucket, ref_frac, cur_frac, psi_contrib)`` rounded to 6; the
    headline PSI is ``sum(psi_contrib)``.  NULL values are excluded
    from both sides (they carry no position in the distribution —
    monitor them with a separate null-rate check).

    Scale shape: one exact-percentile aggregate over the reference
    (distinct-value-bounded state — for continuous 100 TB columns
    substitute approx quantiles upstream), then ONE map-only bucket
    assignment + hash-aggregate count per side: the comparison against
    the broadcast cut array is ``size(filter(...))``, codegen-friendly,
    no join, no window.  The bucket spine is a literal ``sequence`` —
    empty buckets still report."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    fr = [i / buckets for i in range(1, buckets)]
    bnds = ref.filter(F.col(value_col).isNotNull()).agg(
        F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in fr])).alias(
            "_bnds"
        )
    )

    def counts(df: DataFrame, name: str) -> DataFrame:
        v = F.col(value_col)
        return (
            df.filter(v.isNotNull())
            .crossJoin(F.broadcast(bnds))
            .select(
                F.size(F.filter("_bnds", lambda b: v > b)).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    spine = ref.sparkSession.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("bucket")
    )
    joined = (
        spine.join(counts(ref, "_rc"), "bucket", "left")
        .join(counts(cur, "_cc"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("_rc", F.lit(0)).alias("_rc"),
            F.coalesce("_cc", F.lit(0)).alias("_cc"),
        )
    )
    tot = joined.agg(
        F.sum("_rc").alias("_rt"), F.sum("_cc").alias("_ct")
    )
    p = (F.col("_rc") + 0.5) / (F.col("_rt") + 0.5 * buckets)
    q = (F.col("_cc") + 0.5) / (F.col("_ct") + 0.5 * buckets)
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(p, 6).alias("ref_frac"),
            F.round(q, 6).alias("cur_frac"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
        )
        .orderBy("bucket")
    )


# redaction placeholders per PII class, applied in PII_PATTERNS order —
# the order matters: an email's domain must not first be half-eaten by
# the URL pattern, so classes are replaced in the dict's fixed order in
# BOTH engines (Spark regexp_replace chain = DuckDB regexp_replace
# chain with 'g')
PII_REDACTIONS = {
    "n_emails": "<EMAIL>",
    "n_ipv4": "<IP>",
    "n_phones": "<PHONE>",
    "n_urls": "<URL>",
}


def pii_redact(
    df: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str = "redacted",
) -> DataFrame:
    """Replace every PII match with its class placeholder — the
    map-only redaction stage run AFTER :func:`pii_scan` decides which
    docs need it (or standalone over the whole corpus: a clean doc
    passes through unchanged at regexp cost only).

    Returns (id, ``out_col``, n_redactions) where n_redactions is the
    total matches replaced across the four classes (counted BEFORE
    replacement on the original text, so the count can't be skewed by
    one class's placeholder containing another class's pattern).  NULL
    text stays NULL with 0 redactions.  A chain of four
    ``regexp_replace`` calls in fixed class order — whole-stage
    codegen, no shuffle, no UDF."""
    text = F.col(text_col)
    redacted = text
    for name, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(
            redacted, pat, PII_REDACTIONS[name]
        )
    total = None
    for name, pat in PII_PATTERNS.items():
        c = F.coalesce(F.regexp_count(text, F.lit(pat)), F.lit(0))
        total = c if total is None else (total + c)
    return df.select(
        F.col(id_col).alias("id"),
        redacted.alias(out_col),
        total.cast("int").alias("n_redactions"),
    )


def ks_drift(
    ref_df: DataFrame,
    cur_df: DataFrame,
    value_col: str,
    num_buckets: "int | None" = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between a
    reference and a current snapshot of a numeric column — the
    distribution-free companion to :func:`psi_drift` (PSI needs bucket
    choices; KS is the sup-norm gap between the two empirical CDFs and
    has standard critical values).

    Returns ONE row: (ks_stat, n_ref, n_cur), ``ks_stat`` rounded to 6.
    NULL values are excluded on both sides (they have no place on the
    real line).  Either side empty raises — a KS statistic against an
    empty sample is undefined, and returning 0/NULL would read as "no
    drift".

    Scale shape (no global window): both sides tag-union into one
    frame, ONE hash aggregate per distinct value computes both side
    counts, then the packing prefix-sum pattern — approxQuantile range
    buckets + per-bucket totals (a ≤``num_buckets``-row collect that
    also yields n_ref/n_cur for free) + bucket-local cumulative
    windows offset by the collected running totals — turns both CDFs
    into one pass; the final row is a 1-row max aggregate.  Cost is
    bounded by DISTINCT values, not corpus rows."""
    from pyspark.sql import Window

    v = F.col(value_col)
    tagged = ref_df.filter(v.isNotNull()).select(
        v.cast("double").alias("v"),
        F.lit(1).alias("rc"), F.lit(0).alias("cc"),
    ).unionByName(
        cur_df.filter(v.isNotNull()).select(
            v.cast("double").alias("v"),
            F.lit(0).alias("rc"), F.lit(1).alias("cc"),
        )
    )
    # cached: g feeds three consumers (approxQuantile, the per-bucket
    # totals collect, and the final max-gap aggregate) and is bounded
    # by DISTINCT values — without the pin every consumer re-scans
    # both corpora and redoes the union+aggregate
    g = tagged.groupBy("v").agg(
        F.sum("rc").alias("rc"), F.sum("cc").alias("cc")
    ).cache()
    spark = g.sparkSession
    if num_buckets is None:
        num_buckets = max(2 * spark.sparkContext.defaultParallelism, 8)
    probes = [i / num_buckets for i in range(1, num_buckets)]
    bounds = (
        sorted(set(g.stat.approxQuantile("v", probes, 0.001)))
        if probes else []
    )
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: b < F.col("v")))
    else:
        bucket = F.lit(0)
    with_bucket = g.withColumn("__ks_bucket", bucket)
    totals = (
        with_bucket.groupBy("__ks_bucket")
        .agg(F.sum("rc").alias("tr"), F.sum("cc").alias("tc"))
        .collect()
    )  # bounded: one row per bucket
    n_ref = sum(r["tr"] for r in totals)
    n_cur = sum(r["tc"] for r in totals)
    if n_ref == 0 or n_cur == 0:
        raise ValueError(
            f"ks_drift needs non-empty sides, got n_ref={n_ref} "
            f"n_cur={n_cur}"
        )
    offsets, run_r, run_c = [], 0, 0
    for r in sorted(totals, key=lambda r: r["__ks_bucket"]):
        offsets.append((r["__ks_bucket"], run_r, run_c))
        run_r += r["tr"]
        run_c += r["tc"]
    offset_df = spark.createDataFrame(
        offsets, "__ks_bucket int, __ks_or long, __ks_oc long"
    )
    w = (
        Window.partitionBy("__ks_bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    diffs = (
        with_bucket.join(F.broadcast(offset_df), "__ks_bucket")
        .select(
            F.abs(
                (F.col("__ks_or") + F.sum("rc").over(w))
                / F.lit(float(n_ref))
                - (F.col("__ks_oc") + F.sum("cc").over(w))
                / F.lit(float(n_cur))
            ).alias("gap")
        )
    )
    return diffs.agg(
        F.round(F.max("gap"), 6).alias("ks_stat"),
        F.lit(n_ref).cast("long").alias("n_ref"),
        F.lit(n_cur).cast("long").alias("n_cur"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str,
    id_col: str,
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the cheap gibberish /
    boilerplate detector (RefinedWeb-style): natural prose compresses
    to ~0.3–0.5 of raw size, random-character noise stays near 1.0,
    and heavily templated or repeated text drops far below 0.3, so
    both tails of the ratio distribution are removal candidates.

    Returns (id, raw_len, compressed_len, ratio) with ratio rounded
    to 6; NULL text yields (0, 0, NULL).  ``level`` is pinned so the
    signal is reproducible run-to-run (zlib output is deterministic
    for a given level/strategy).

    Scale shape: map-only Arrow pass carrying (id, text); zlib runs
    inside the Python worker per batch — there is no JVM/SQL zlib, so
    this is a legitimate pandas-UDF case, and it is why the operator
    has no cross-engine SQL oracle (the pytest oracle replays the same
    zlib call verbatim)."""
    id_field = df.schema[id_col]

    def run(iterator):
        import zlib

        import pandas as pd

        for pdf in iterator:
            ids, raws, comps, ratios = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                ids.append(doc_id)
                if text is None:
                    raws.append(0)
                    comps.append(0)
                    ratios.append(None)
                    continue
                raw = str(text).encode("utf-8")
                comp = zlib.compress(raw, level)
                raws.append(len(raw))
                comps.append(len(comp))
                ratios.append(
                    round(len(comp) / len(raw), 6) if raw else None
                )
            yield pd.DataFrame(
                {"id": ids, "raw_len": raws,
                 "compressed_len": comps, "ratio": ratios}
            )

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    schema = StructType([
        StructField("id", id_field.dataType, id_field.nullable),
        StructField("raw_len", LongType(), False),
        StructField("compressed_len", LongType(), False),
        StructField("ratio", DoubleType(), True),
    ])
    return df.select(id_col, text_col).mapInPandas(run, schema)


# character classes whose presence marks decode damage: the U+FFFD
# replacement char (a decoder already gave up), C0/C1 control chars
# outside whitespace (binary bleed-through), and the Latin-1-read-as-
# UTF-8 mojibake leaders \u00c3/\u00c2 followed by another high char
_MOJIBAKE_PATTERNS = {
    "n_replacement": "\uFFFD",
    "n_control": "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]",
    "n_mojibake": "[\u00c3\u00c2][\u00a0-\u00ff]",
}


def mojibake_scan(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Encoding-damage scan: per-document counts of replacement chars,
    stray control chars, and classic UTF-8-decoded-as-Latin-1 mojibake
    pairs, plus an ``is_clean`` flag — the triage pass run before any
    normalizer, because mojibake survives lowercasing and tokenizes
    into vocabulary noise.  Map-only regexp counts with the same
    leftmost non-overlap semantics in Spark and DuckDB (the regexes
    use only portable character classes).  NULL text is CLEAN (nothing
    was damaged) with zero counts — the pii_scan coalesce rule."""
    counts = [
        F.coalesce(
            F.regexp_count(F.col(text_col), F.lit(pat)), F.lit(0)
        ).alias(name)
        for name, pat in _MOJIBAKE_PATTERNS.items()
    ]
    out = df.select(F.col(id_col).alias("id"), *counts)
    dirty = None
    for name in _MOJIBAKE_PATTERNS:
        c = F.col(name) > 0
        dirty = c if dirty is None else (dirty | c)
    return out.withColumn("is_clean", ~dirty)


def psi_reference(
    ref: DataFrame,
    value_col: str,
    buckets: int = 10,
) -> dict:
    """Precompute the batch-invariant reference side of a PSI monitor
    ONCE: the exact quantile cuts and per-bucket reference counts —
    both bounded driver state (``buckets`` floats + ints).  Feed the
    result to :func:`psi_against_reference` per snapshot/micro-batch
    instead of re-aggregating the (possibly huge) reference frame on
    every comparison."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    fr = [i / buckets for i in range(1, buckets)]
    nn = ref.filter(F.col(value_col).isNotNull())
    cuts = [
        float(c)
        for c in nn.agg(
            F.percentile(
                F.col(value_col), F.array(*[F.lit(p) for p in fr])
            ).alias("_b")
        ).collect()[0]["_b"]
    ]
    barr = F.array(*[F.lit(c) for c in cuts])
    v = F.col(value_col)
    rows = (
        nn.select(F.size(F.filter(barr, lambda b: v > b)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_bucket = {r["bucket"]: r["n"] for r in rows}
    return {
        "cuts": cuts,
        "ref_counts": [int(by_bucket.get(b, 0)) for b in range(buckets)],
        "buckets": buckets,
    }


def psi_against_reference(
    cur: DataFrame,
    value_col: str,
    ref_state: dict,
) -> DataFrame:
    """PSI of ``cur`` against a :func:`psi_reference` precompute —
    identical math and output to :func:`psi_drift` (same smoothing,
    same rounding; the drift-monitor test pins row-for-row equality)
    plus a ``cur_count`` column so callers get the batch's non-NULL
    row count from the SAME single scan.  One map-only bucket
    assignment + one hash aggregate over ``cur``; the reference never
    rescans."""
    buckets = ref_state["buckets"]
    barr = F.array(*[F.lit(c) for c in ref_state["cuts"]])
    v = F.col(value_col)
    cc = (
        cur.filter(v.isNotNull())
        .select(F.size(F.filter(barr, lambda b: v > b)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_cc"))
    )
    spine = cur.sparkSession.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("bucket")
    )
    rc_arr = F.array(*[F.lit(n) for n in ref_state["ref_counts"]])
    rt = sum(ref_state["ref_counts"])
    joined = (
        spine.join(cc, "bucket", "left")
        .select(
            "bucket",
            F.element_at(rc_arr, F.col("bucket") + 1).alias("_rc"),
            F.coalesce("_cc", F.lit(0)).alias("_cc"),
        )
    )
    tot = joined.agg(F.sum("_cc").alias("_ct"))
    p = (F.col("_rc") + 0.5) / (F.lit(rt) + 0.5 * buckets)
    q = (F.col("_cc") + 0.5) / (F.col("_ct") + 0.5 * buckets)
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(p, 6).alias("ref_frac"),
            F.round(q, 6).alias("cur_frac"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
            F.col("_cc").alias("cur_count"),
        )
        .orderBy("bucket")
    )


def ks_drift_by(
    ref_df: DataFrame,
    cur_df: DataFrame,
    value_col: str,
    group_col: str,
    min_side: int = 1,
) -> DataFrame:
    """Per-group exact two-sample KS: one row per group key present on
    BOTH sides — drift triage across segments (per language, source,
    event type) in one pass, where :func:`ks_drift` gives the global
    answer.  Returns (group, ks_stat, n_ref, n_cur) with ks rounded
    to 6; NULL values and NULL groups are excluded; groups with fewer
    than ``min_side`` non-NULL rows on either side are omitted (KS
    against near-nothing is noise, and against nothing undefined).

    Scale shape: tag-union → ONE (group, value) hash aggregate →
    group-partitioned cumulative windows (groups parallelize; within
    a group the window is bounded by the group's DISTINCT values —
    the per-group serial cost that lets every group run independently)
    → one per-group max aggregate.  No driver state, no collect."""
    from pyspark.sql import Window

    v = F.col(value_col)
    gcol = F.col(group_col)

    def side(df: DataFrame, rc: int, cc: int) -> DataFrame:
        return df.filter(v.isNotNull() & gcol.isNotNull()).select(
            gcol.cast("string").alias("g"),
            v.cast("double").alias("v"),
            F.lit(rc).alias("rc"), F.lit(cc).alias("cc"),
        )

    g = (
        side(ref_df, 1, 0)
        .unionByName(side(cur_df, 0, 1))
        .groupBy("g", "v")
        .agg(F.sum("rc").alias("rc"), F.sum("cc").alias("cc"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = g.select(
        "g",
        F.sum("rc").over(w).alias("crc"),
        F.sum("cc").over(w).alias("ccc"),
    )
    n = g.groupBy("g").agg(
        F.sum("rc").alias("n_ref"), F.sum("cc").alias("n_cur")
    ).filter(
        (F.col("n_ref") >= min_side) & (F.col("n_cur") >= min_side)
    )
    return (
        c.join(n, "g")
        .groupBy("g")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("crc") / F.col("n_ref")
                        - F.col("ccc") / F.col("n_cur")
                    )
                ),
                6,
            ).alias("ks_stat"),
            F.first("n_ref").alias("n_ref"),
            F.first("n_cur").alias("n_cur"),
        )
        .withColumnRenamed("g", "group_key")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: "str | None" = None,
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` at the group's
    exact interpolated [``lower``, ``upper``] percentiles — the
    outlier-taming companion to the MAD z-scores (tame the tails
    instead of dropping the rows; the standard normalization before a
    quality score feeds a training-mix weight).

    Returns df + ``out_col`` (default ``{value}_winsorized``) plus the
    per-group bounds (``__w_lo``/``__w_hi`` dropped; bounds visible as
    the clipped values themselves).  In-range values pass through
    BIT-EXACT (no rounding of untouched data); clipped rows take the
    round-6 bound — interpolated percentiles are arithmetic on
    doubles, and round-6 is the repo's established cross-engine
    discipline for them (q_percentile_groups).  NULL values stay NULL.

    Scale shape: one exact-percentile aggregate per group (full sort
    per group by declared intent — swap percentile_approx at 100 TB,
    same as q_statistics), one join back keyed on the group (AQE
    broadcasts the bounds frame — one row per group)."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError("need 0 <= lower < upper <= 1")
    out_col = out_col or f"{value_col}_winsorized"
    bounds = df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({value_col}, {lower})"), 6).alias("__w_lo"),
        F.round(F.expr(f"percentile({value_col}, {upper})"), 6).alias("__w_hi"),
    )
    v = F.col(value_col).cast("double")
    clipped = (
        F.when(v < F.col("__w_lo"), F.col("__w_lo"))
        .when(v > F.col("__w_hi"), F.col("__w_hi"))
        .otherwise(v)
    )
    return (
        df.join(bounds, group_col)
        .withColumn(out_col, clipped)
        .drop("__w_lo", "__w_hi")
    )
