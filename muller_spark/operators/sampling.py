"""Deterministic sampling / dataset splitting for training-data pipelines.

A training corpus needs train/val/test assignment that is (1) stable
across runs, engines, and repartitions — never `rand()`; (2) computable
row-locally with zero shuffle; (3) reproducible from the row's identity
alone so late-arriving rows land in the same split.  We derive the
assignment from a Knuth multiplicative hash of an integer row key —
plain 64-bit arithmetic, so any engine (Spark, DuckDB, a feature store)
reproduces the exact same split, unlike engine-specific hash builtins
(Spark `hash()` and DuckDB `hash()` disagree).

Extension beyond the reference (its closest surface is positional
`sub_ds` partitioning, ``muller/core/dataset/dataset.py:1727``), in the
spirit of SURVEY §7 phase 5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's multiplicative constant (2^32 / phi).  The key is first
# reduced to [0, 2^31) with a portable pmod — ((x % m) + m) % m, the
# same expression both Spark and DuckDB evaluate with identical
# sign/overflow behavior — so (reduced * _KNUTH) peaks at ~5.7e18,
# safely below 2^63-1 in *both* engines.  Without the reduction,
# keys >= 2^31 overflow int64 (Spark wraps silently, DuckDB promotes
# to hugeint → the two engines diverge), and negative keys make
# Spark's `%` return a negative h (dividend sign), so every such row
# lands in the first split.
_KNUTH = 2654435761
_MOD = 4294967296
_KEY_MOD = 2147483648  # 2^31


def _hash_col(key: Column, salt: int) -> Column:
    """Engine-portable Knuth hash in [0, _MOD) for any int64 key."""
    x = key.cast("long") + F.lit(salt)
    k = (x % F.lit(_KEY_MOD) + F.lit(_KEY_MOD)) % F.lit(_KEY_MOD)
    return (k * F.lit(_KNUTH)) % F.lit(_MOD)


def bucket_of(key: Column, n_buckets: int = 10_000, salt: int = 0) -> Column:
    """Deterministic bucket in ``[0, n_buckets)`` from an integer key."""
    return _hash_col(key, salt) % F.lit(n_buckets)


def deterministic_sample(
    df: DataFrame, key: Column, fraction: float, salt: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — stable under
    re-runs and appends, unlike ``DataFrame.sample`` (seeded per-partition,
    so a repartition reshuffles membership)."""
    cut = int(round(fraction * _MOD))
    return df.filter(_hash_col(key, salt) < F.lit(cut))


def stratified_sample(
    df: DataFrame,
    key: Column,
    strata_col: str,
    fractions: "dict[str, float]",
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its
    own keep-fraction (corpus rebalancing — e.g. downsample the
    dominant language, keep all of a rare one).  Same Knuth-hash
    contract as :func:`deterministic_sample`: row-local, zero shuffle,
    stable under appends/repartition, engine-portable.  Strata missing
    from ``fractions`` use ``default_fraction``."""
    h = _hash_col(key, salt)
    expr = None
    for value, frac in fractions.items():
        cut = F.lit(int(round(frac * _MOD)))
        cond = F.col(strata_col) == value
        branch = F.when(cond, h < cut)
        expr = branch if expr is None else expr.when(cond, h < cut)
    default_cut = F.lit(int(round(default_fraction * _MOD)))
    expr = (h < default_cut) if expr is None else expr.otherwise(h < default_cut)
    return df.filter(expr)


def mixture_sample(
    df: DataFrame,
    key: Column,
    domain_col: str,
    budget: float,
    weights: "dict[str, float] | None" = None,
    size_col: "str | None" = None,
    salt: int = 0,
    temperature: "float | None" = None,
) -> DataFrame:
    """Sample a target data *mixture*: each domain ``d`` keeps
    ``min(1, budget·w_d / size_d)`` of its rows, so the surviving
    corpus approaches the target proportions ``w_d`` within a total
    ``budget`` (rows, or ``size_col`` units such as chars/tokens).

    ``weights=None`` means equal weight per observed domain — the
    common "flatten the language distribution" case.  The only driver
    materialization is the per-domain size aggregate (one row per
    domain); the keep decision is the same row-local engine-portable
    Knuth hash as :func:`deterministic_sample`, with ``floor`` cuts so
    any engine derives identical membership from the same arithmetic.

    Two drop rules, by design (not data loss): rows whose
    ``domain_col`` is NULL are always dropped (no domain → no budget
    share), and with an explicit ``weights`` dict an observed domain
    absent from the dict gets weight 0 — i.e. fully dropped.  Pass
    ``weights=None`` to keep every observed domain, or include the
    domain with an explicit weight.

    ``temperature`` (with ``weights=None``) derives the target mixture
    from the OBSERVED one by temperature scaling — ``w_d ∝ p_d^T`` with
    ``p_d`` the observed share — the standard multilingual-LM
    rebalancing knob (T=1 keeps the natural mixture, T→0 flattens it to
    uniform, T≈0.3–0.7 upweights rare domains without drowning the
    head).  The normalizing sum folds in ascending-domain order so any
    engine reproduces the exact double bits (float addition is not
    associative; an unordered sum could flip a floor-cut boundary).
    """
    import math

    if temperature is not None and weights is not None:
        raise ValueError("pass either weights or temperature, not both")

    size = (
        F.sum(F.col(size_col).cast("long")) if size_col else F.count(F.lit(1))
    )
    sizes = {
        r["d"]: r["sz"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(size.alias("sz"))
        .collect()  # bounded: one row per domain
        if r["d"] is not None
    }
    if not sizes:
        return df.filter(F.lit(False))
    if weights is not None:
        total_w = 0.0
        for d in sorted(weights):  # ordered fold, same discipline as below
            w = weights[d]
            if w < 0:
                raise ValueError(f"negative weight for domain {d!r}")
            total_w += w
        if total_w <= 0:
            raise ValueError("weights must sum to a positive value")
        # normalize: the docstring promises target PROPORTIONS within a
        # total budget — un-normalized weights would silently scale the
        # effective budget by sum(w)
        weights = {d: weights[d] / total_w for d in weights}
    if weights is None and temperature is not None:
        # Only domains with a truthy (non-NULL, non-zero) size take part
        # in the mixture: a NULL sum (all-NULL size_col) would TypeError
        # on +=, and a zero-size domain at temperature=0 would get
        # 0**0 == 1.0, diluting every real domain's budget share.  Such
        # domains keep rate 0 via the `if sz else 0.0` cut below either way.
        total_sz = 0
        for d in sorted(sizes):
            if sizes[d]:
                total_sz += sizes[d]
        if not total_sz:
            return df.filter(F.lit(False))
        pw = {d: (sizes[d] / total_sz) ** temperature for d in sizes if sizes[d]}
        norm = 0.0
        for d in sorted(pw):  # ordered fold — see docstring
            norm += pw[d]
        weights = {d: pw[d] / norm for d in pw}
    elif weights is None:
        weights = {d: 1.0 / len(sizes) for d in sizes}
    cuts = {}
    for d, sz in sizes.items():
        w = weights.get(d, 0.0)
        rate = min(1.0, (budget * w) / sz) if sz else 0.0
        cuts[d] = math.floor(rate * _MOD)
    h = _hash_col(key, salt)
    expr = None
    for d, cut in cuts.items():
        cond = F.col(domain_col) == d
        branch = F.when(cond, h < F.lit(cut))
        expr = branch if expr is None else expr.when(cond, h < F.lit(cut))
    return df.filter(expr.otherwise(F.lit(False)))


def weighted_sample(
    df: DataFrame,
    key: Column,
    weight_col: str,
    k: int,
    salt: int = 0,
    key_out: str = "aes_key",
    round_to: int = 9,
) -> DataFrame:
    """Weighted random sampling without replacement: keep the ``k``
    rows with the largest Efraimidis–Spirakis A-ES keys
    ``ln(u) / w`` (equivalently ``u^(1/w)``) — sequential
    probability-proportional-to-size sampling without replacement, the
    guarantee quality-weighted corpus subsampling wants ("sample 1 M
    docs, high-quality docs proportionally more often").  Two caveats on
    the probabilistic claim: ``u`` is a deterministic hash of (key,
    salt), so "probability" holds under the idealized assumption that
    the hash behaves as a uniform draw in (0, 1) over the key
    population; and A-ES gives PPS *sequentially* (each successive pick
    proportional to weight among the remainder), which is not exactly
    proportional *marginal* inclusion probability for finite k.

    Determinism: ``u`` derives from the engine-portable Knuth hash
    (``(h + 0.5) / 2^32`` — the half-offset keeps u strictly inside
    (0, 1), so ``ln`` never sees 0), NOT an RNG, so the same
    (key, salt, k) selects the same rows in any engine and under any
    partitioning.  The A-ES key is rounded to ``round_to`` places
    (``ln`` is transcendental — engines may differ in the last ulp)
    and ties break on the key column, so the k-boundary is exact
    cross-engine.  Rows with NULL or non-positive weight are dropped
    (they have no well-defined inclusion probability).

    Scale shape: map-only scoring followed by ``orderBy(...).limit(k)``
    — Spark plans that as TakeOrderedAndProject (per-partition partial
    top-k, then a single reduced merge), NEVER a global sort of the
    corpus; cost is one scan regardless of corpus size.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = F.col(weight_col).cast("double")
    u = (_hash_col(key, salt).cast("double") + F.lit(0.5)) / F.lit(float(_MOD))
    aes = F.round(F.log(u) / w, round_to)
    return (
        df.filter(w > 0)
        .withColumn(key_out, aes)
        .orderBy(F.col(key_out).desc(), key.asc())
        .limit(k)
    )


def deterministic_split(
    df: DataFrame,
    key: Column,
    weights: "dict[str, float]",
    salt: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split with the given weights.

    Weights are normalized; boundaries are cumulative over insertion
    order of ``weights`` (Python dicts preserve it).  Row-local — no
    shuffle, no driver state; the same (key, salt, weights) always
    yields the same split anywhere.
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = _hash_col(key, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cut = F.lit(int(round(acc * _MOD)))
        branch = F.when(h < cut, F.lit(name))
        expr = branch if expr is None else expr.when(h < cut, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def kfold_assign(
    df: DataFrame,
    key: Column,
    k: int,
    salt: int = 0,
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: ``out_col`` =
    portable-Knuth-hash(key, salt) mod ``k`` — row-local, shuffle-free,
    stable under appends/repartition, engine-portable (the DuckDB
    oracle replays the identical arithmetic).  For LEAKAGE-SAFE folds
    pass the near-dup cluster root as ``key`` (the
    ``leakage_safe_split`` recipe: every near-dup family shares the
    hash input, so no fold ever holds a paraphrase of another fold's
    document) — tested in tests/test_round8_ops.py.  ``key`` must be
    integral (the Knuth-hash family's contract, same as
    deterministic_split/bucket_of): under this repo's ANSI-mode
    sessions a non-numeric string key raises CAST_INVALID_INPUT at
    runtime (with ANSI off it would cast to NULL and silently fold
    everything together) — hash it to a numeric surrogate first."""
    if k <= 0:
        raise ValueError("k must be positive")
    return df.withColumn(
        out_col, (_hash_col(key, salt) % F.lit(k)).cast("int")
    )


def sample_k_per_group(
    df: DataFrame,
    key: Column,
    group_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Deterministic fixed-size sample per group: the ``k`` rows with
    the smallest Knuth hash of ``key`` within each group (hash asc —
    a uniform, append-stable, engine-portable pseudo-order) — the
    "give me 100 docs from every domain to eyeball" primitive, without
    DataFrame.sample's per-partition seeding (reshuffles membership on
    repartition) or an ORDER BY rand() (non-reproducible).

    Scale shape: one rank window PARTITIONED BY GROUP — Spark's
    rank-limit pushdown keeps a map-side partial WindowGroupLimit
    before the shuffle, so ~k·tasks rows shuffle per group, never the
    corpus (same plan family as topk_per_group)."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    h = _hash_col(key, salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(), key.asc())
    return (
        df.withColumn("__skg_rn", F.row_number().over(w))
        .filter(F.col("__skg_rn") <= k)
        .drop("__skg_rn")
    )


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    order_col,
    fraction: float,
    tie_break: "str | None" = None,
) -> DataFrame:
    """Keep the top ``fraction`` of rows per group by ``order_col``
    (descending) — quality-filtered mixture curation ("best 30% per
    domain by LM score").  Contract: ``ceil(round(n_group · fraction, 9))``
    rows survive per group — the round-to-9-decimals absorbs IEEE-double
    noise a hair above the exact product (25·0.28 = 7.000000000000001)
    so the intended ``ceil(n·fraction)`` count is kept, never one extra.
    Any oracle (SQL or Python) must apply the same round-then-ceil.
    ``tie_break`` (a column name, ascending) makes the cut deterministic
    when scores tie.

    Scale shape: one shuffle on ``group_col``; rank and group size come
    from the same window pass (row_number + count over the group), so no
    second aggregate or self-join.  Skewed domains bound the single-task
    cost — salt upstream or split the domain if one group is a large
    fraction of the corpus."""
    from pyspark.sql import Window

    order = [F.col(order_col).desc() if isinstance(order_col, str) else order_col]
    if tie_break is not None:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    wall = Window.partitionBy(group_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wall))
        # round9 before ceil: n*fraction in doubles lands a hair ABOVE
        # the exact product for many (n, fraction) pairs (25*0.28 =
        # 7.000000000000001), and raw ceil would keep one extra row —
        # breaking the documented ceil(n*fraction) contract.  The same
        # round-then-ceil runs in the SQL oracle.
        .filter(F.col("__rn") <= F.ceil(F.round(F.col("__n") * F.lit(fraction), 9)))
        .drop("__rn", "__n")
    )


def token_budget_sample(
    df: DataFrame,
    text_col: str,
    domain_col: str,
    key: Column,
    budgets: "dict[str, int]",
    default_budget: int = 0,
    salt: int = 0,
    num_buckets: "int | None" = None,
) -> DataFrame:
    """Token-budget provisioning: per domain, keep the deterministic
    hash-ordered prefix of rows whose CUMULATIVE token count stays
    within the domain's budget — how LLM training data is actually
    provisioned ("3 B tokens of web, 400 M of code"), vs row-count
    sampling.  A row survives iff its running total INCLUDING itself is
    ≤ ``budgets[domain]`` (domains absent from ``budgets`` get
    ``default_budget`` — 0 drops them, like ``mixture_sample``'s
    documented behavior).

    Determinism: rows order by the same engine-portable Knuth hash as
    :func:`deterministic_sample` (tie-broken by the key itself), so
    membership is stable under re-runs, appends, and repartitioning,
    and reproducible in any engine.

    Scale shape: the naive formulation — ``sum() OVER (PARTITION BY
    domain ORDER BY hash ROWS UNBOUNDED PRECEDING)`` — funnels each
    domain's ENTIRE row set through one task, and at training-corpus
    scale the dominant domain IS the corpus.  This runs the two-phase
    parallel prefix sum instead (the :mod:`packing` pattern): rows are
    bucketed by contiguous hash ranges, one tiny aggregate yields
    per-(domain, bucket) token totals, the driver prefix-sums them per
    domain (bounded: domains × buckets rows) and broadcasts the offsets
    back, and a window partitioned by (domain, bucket) finishes the
    within-bucket cumsum — so a dominant domain spreads over
    ``num_buckets`` parallel tasks.  Integer sums are associative, so
    membership is bit-identical to the single-task window (which is
    exactly what the DuckDB oracle computes)."""
    from pyspark.sql import Window

    from muller_spark.operators.text import token_count

    spark = df.sparkSession
    h = _hash_col(key, salt)
    budget = None
    for d, b in sorted(budgets.items()):
        cond = F.col(domain_col) == d
        budget = F.when(cond, b) if budget is None else budget.when(cond, b)
    budget = (
        budget.otherwise(F.lit(default_budget))
        if budget is not None
        else F.lit(default_budget)
    )

    base = (
        df.withColumn("__tb_h", h)
        .withColumn("__tb_dom", F.col(domain_col).cast("string"))
        .withColumn(
            "__tb_tok", token_count(F.col(text_col)).cast("long")
        )
    )
    if num_buckets is None:
        num_buckets = max(2 * spark.sparkContext.defaultParallelism, 8)
    probes = [i / num_buckets for i in range(1, num_buckets)]
    # any contiguous split of the hash space is CORRECT (quantiles just
    # balance it); equal hashes always share a bucket (strict <), so the
    # (hash, key) order never straddles a boundary mid-tie
    bounds = (
        sorted(set(base.stat.approxQuantile("__tb_h", probes, 0.001)))
        if probes else []
    )
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(barr, lambda b: b < F.col("__tb_h")))
    else:
        bucket = F.lit(0)
    base = base.withColumn("__tb_bucket", bucket)

    totals = (
        base.groupBy("__tb_dom", "__tb_bucket")
        .agg(F.sum("__tb_tok").alias("t"))
        .collect()
    )  # bounded: one row per (domain, bucket)
    per_dom: "dict[str | None, dict[int, int | None]]" = {}
    for r in totals:
        per_dom.setdefault(r["__tb_dom"], {})[r["__tb_bucket"]] = r["t"]
    offsets = []
    for d, by_bucket in per_dom.items():
        running: "int | None" = None  # NULL until a non-null token row
        for b in sorted(by_bucket):
            offsets.append((d, b, running))
            t = by_bucket[b]
            if t is not None:
                running = (running or 0) + t
    if not offsets:
        return df.filter(F.lit(False))
    offset_df = spark.createDataFrame(
        offsets, "__tb_dom string, __tb_bucket int, __tb_off long"
    )

    w = (
        Window.partitionBy("__tb_dom", "__tb_bucket")
        .orderBy(F.col("__tb_h").asc(), key.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = F.sum("__tb_tok").over(w)
    # NULL iff no non-null token row precedes (matches the single-task
    # window, where sum over an all-NULL prefix is NULL)
    cum = F.when(
        local.isNull() & F.col("__tb_off").isNull(), F.lit(None).cast("long")
    ).otherwise(F.coalesce(F.col("__tb_off"), F.lit(0)) + F.coalesce(local, F.lit(0)))
    off = offset_df.withColumnRenamed(
        "__tb_dom", "__tb_dom2"
    ).withColumnRenamed("__tb_bucket", "__tb_bucket2")
    joined = base.join(
        F.broadcast(off),
        F.col("__tb_dom").eqNullSafe(F.col("__tb_dom2"))
        & (F.col("__tb_bucket") == F.col("__tb_bucket2")),
    )
    return (
        joined.withColumn("__tb_cum", cum)
        .filter(F.col("__tb_cum") <= budget)
        .drop("__tb_h", "__tb_dom", "__tb_dom2", "__tb_tok",
              "__tb_bucket", "__tb_bucket2", "__tb_off", "__tb_cum")
    )


def mixture_plan(
    df: DataFrame,
    domain_col: str,
    targets: "dict[str, float]",
    size_col: "str | None" = None,
) -> DataFrame:
    """Data-mixing feasibility plan: given per-domain target shares,
    compute the LARGEST total corpus that satisfies the mixture without
    upsampling any domain, and each domain's resulting sampling rate —
    the planning math run before :func:`mixture_sample` executes the
    mix.

    The binding constraint is the domain that runs out first:
    ``feasible_total = min over target domains of available_d / share_d``
    (a target domain with zero available rows pins the feasible total
    to 0 — visible in its output row rather than silently ignored).
    Returns one row per domain observed in the data OR named in
    ``targets``: (domain, available, target_share, sample_rate,
    expected_units), where ``sample_rate = share·total / available``
    (0 for domains without a target — mixture_sample's weight-0 drop
    rule) and ``expected_units = floor(round(share·total, 9))`` (the
    round9-before-floor contract from top_fraction_per_group).

    ``size_col`` plans in that unit (chars/tokens) instead of rows.
    Shares are normalized to sum to 1, so callers may pass any
    positive proportions.  NULL domains are excluded, matching
    mixture_sample's NULL-drop rule.

    Scale shape: one hash aggregate on the domain (map-side combine),
    a broadcast join against the ≤len(targets)-row target table, and a
    1-row scalar min broadcast back — driver state is one row per
    domain, never corpus rows."""
    from muller_spark.operators.joins import maybe_broadcast

    if not targets:
        raise ValueError("mixture_plan needs at least one target share")
    if any(v < 0 for v in targets.values()):
        raise ValueError("target shares must be non-negative")
    tot = sum(targets.values())
    if tot <= 0:
        raise ValueError("target shares must sum to a positive value")
    norm = {d: v / tot for d, v in targets.items()}

    spark = df.sparkSession
    unit = (
        F.sum(F.col(size_col).cast("long")) if size_col else F.count(F.lit(1))
    )
    sizes = (
        df.filter(F.col(domain_col).isNotNull())
        .groupBy(F.col(domain_col).cast("string").alias("domain"))
        .agg(unit.alias("available"))
    )
    tgt = spark.createDataFrame(
        [(d, s) for d, s in sorted(norm.items())],
        "domain string, target_share double",
    )
    joined = sizes.join(
        maybe_broadcast(tgt, bound=len(norm)), "domain", "full_outer"
    ).select(
        "domain",
        F.coalesce("available", F.lit(0)).cast("long").alias("available"),
        F.coalesce("target_share", F.lit(0.0)).alias("target_share"),
    )
    feasible = joined.filter(F.col("target_share") > 0).agg(
        F.min(F.col("available") / F.col("target_share")).alias("_total")
    )
    return (
        joined.crossJoin(F.broadcast(feasible))
        .select(
            "domain",
            "available",
            F.round("target_share", 6).alias("target_share"),
            F.when(
                (F.col("target_share") > 0) & (F.col("available") > 0),
                F.round(
                    F.col("target_share") * F.col("_total") / F.col("available"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("sample_rate"),
            F.floor(
                F.round(F.col("target_share") * F.col("_total"), 9)
            )
            .cast("long")
            .alias("expected_units"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: "dict[str, float]",
    n: int = 3,
    threshold: float = 0.5,
    salt: int = 0,
    out_col: str = "split",
    max_shingle_freq: "int | None" = None,
    pairs: "DataFrame | None" = None,
) -> DataFrame:
    """Near-duplicate-aware train/val/test split: every near-dup
    CLUSTER lands entirely in one split, so a paraphrase or boilerplate
    copy of a training document can never leak into the eval side —
    the failure mode a plain row-hash split cannot prevent.

    Pipeline: exact n-gram-Jaccard pairs (≥ ``threshold``) → connected
    components (:func:`~muller_spark.operators.dedup.dedup_clusters`)
    → each doc's split decided by the Knuth hash of its CLUSTER ROOT
    (its own id when it has no near-dup), via
    :func:`deterministic_split` — so all members of a component share
    the hash input and therefore the split.

    Scale shape: the pair/cluster stages are the bucketed near-dup
    machinery (never all-pairs); cluster membership is a left join
    bounded by docs that participate in ≥1 pair (AQE broadcasts it
    when small); the split itself is row-local.  At 100 TB swap the
    exact-Jaccard pair stage for :func:`~muller_spark.operators.dedup.
    lsh_verified_pairs` (pass it via ``pairs=``) feeding the same
    cluster/split tail.

    ``pairs``: pre-computed near-dup pair frame with ``id_a``/``id_b``
    columns — typically :func:`~muller_spark.operators.dedup.
    lsh_verified_pairs` output (the 100 TB path: LSH prefilter + exact
    verify on the candidate sliver).  When given, the corpus-wide
    exact pair stage is skipped and ``n``/``threshold``/
    ``max_shingle_freq`` are ignored; split exactness then inherits
    the pair frame's recall."""
    from muller_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs

    if pairs is None:
        # max_shingle_freq defaults to None — UNLIKE ngram_jaccard_pairs'
        # own 10k df-cutoff — because dropping hot shingles here silently
        # weakens the no-leak guarantee: two near-dups overlapping mostly
        # on a boilerplate shingle would lose the pair and land in
        # different splits.  Pass a cutoff explicitly only with a
        # downstream exactness story (e.g. an LSH stage re-finding pairs).
        pairs = ngram_jaccard_pairs(
            df, text_col, id_col, n=n, threshold=threshold,
            max_shingle_freq=max_shingle_freq,
        )
    clusters = dedup_clusters(pairs.select("id_a", "id_b"))
    root_col = "__lss_root"
    while root_col in df.columns or (root_col + "_id") in df.columns:
        root_col += "_"
    members = clusters.select(
        F.col("id").alias(root_col + "_id"),
        F.col("cluster_id").alias(root_col),
    )
    rooted = df.join(
        members, F.col(id_col) == F.col(root_col + "_id"), "left"
    ).drop(root_col + "_id")
    root = F.coalesce(F.col(root_col), F.col(id_col))
    return deterministic_split(
        rooted, root, weights, salt=salt, out_col=out_col
    ).drop(root_col)
