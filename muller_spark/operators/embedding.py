"""Embedding-matrix statistics: covariance and PCA/whitening.

Two covariance paths with different contracts:

- ``embedding_covariance(exact=True)`` — posexplode² pair expansion +
  decimal-exact sums.  Bit-reproducible across engines (its DuckDB
  oracle is ``q_embedding_covariance``), but the expansion is N·d²
  rows: right for correctness gates and modest dimensions, wrong for
  d≫100 at corpus scale.
- ``embedding_covariance(exact=False)`` — Arrow-batched partition-local
  Gram accumulation (each task computes its own ``Xᵀ X``, d×d, plus
  column sums and a count; one tiny final reduce of P matrices).  The
  data-volume-optimal plan: one pass, no expansion, shuffle size
  P · d² floats.  Float summation order differs per partitioning, so
  results are 1e-9-close, not bit-equal.

``embedding_pca`` rides the fast path: covariance → driver ``eigh``
(d×d is driver-sized by definition) → broadcast the projection matrix →
map-only matmul per batch.  The reference's vector pipeline has no PCA;
this is part of the training-data extension surface (embedding
whitening / dimensionality reduction before ANN or clustering).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(
    df: DataFrame,
    vec_col: str,
    exact: bool = False,
) -> DataFrame:
    """Upper-triangle covariance of an ``array<float|double>`` column in
    long form: ``(i, j, cov, n)`` with ``j >= i``, population (1/n)
    normalization."""
    if exact:
        arr = df.select(F.col(vec_col).cast("array<double>").alias("arr"))
        ex = arr.select("arr", F.posexplode("arr").alias("i", "vi"))
        pairs = (
            ex.select("i", "vi", F.posexplode("arr").alias("j", "vj"))
            .filter(F.col("j") >= F.col("i"))
        )
        sp = pairs.groupBy("i", "j").agg(
            F.sum((F.col("vi") * F.col("vj")).cast("decimal(28,14)"))
            .cast("double")
            .alias("sp"),
            F.count(F.lit(1)).alias("n"),
        )
        means = (
            arr.select(F.posexplode("arr").alias("dim", "v"))
            .groupBy("dim")
            .agg(
                (
                    F.sum(F.col("v").cast("decimal(18,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("mean")
            )
        )
        mi = means.select(F.col("dim").alias("i"), F.col("mean").alias("mi"))
        mj = means.select(F.col("dim").alias("j"), F.col("mean").alias("mj"))
        return (
            sp.join(F.broadcast(mi), "i")
            .join(F.broadcast(mj), "j")
            .select(
                "i", "j",
                # + 0.0 canonicalizes IEEE negative zero after rounding
                (F.round(
                    F.col("sp") / F.col("n") - F.col("mi") * F.col("mj"), 6
                ) + F.lit(0.0)).alias("cov"),
                "n",
            )
            .orderBy("i", "j")
        )

    sums, gram, n = _gram_moments(df, vec_col)
    d = len(sums)
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    rows = [
        (int(i), int(j), float(cov[i, j]), int(n))
        for i in range(d)
        for j in range(i, d)
    ]
    return df.sparkSession.createDataFrame(
        rows, "i int, j int, cov double, n long"
    )


_GRAM_SCHEMA = "sums array<double>, gram array<double>, n long"


def _combine_gram_partials(partials: DataFrame, nparts: int, fanin: int):
    """Tree-reduce the per-partition (sums, gram, n) partials down to
    ≤ ``fanin`` rows with intermediate mapInPandas levels, so the
    driver never sees O(input partitions) × d² state.  Each level
    shuffles only the partial rows themselves (P · d² doubles spread
    across the cluster), never data rows."""
    import math

    def combine(iterator):
        import pandas as pd

        acc_s = None
        acc_g = None
        count = 0
        for pdf in iterator:
            for s, g, c in zip(pdf["sums"], pdf["gram"], pdf["n"]):
                s = np.asarray(s, dtype=np.float64)
                g = np.asarray(g, dtype=np.float64)
                acc_s = s if acc_s is None else acc_s + s
                acc_g = g if acc_g is None else acc_g + g
                count += int(c)
        if count:
            yield pd.DataFrame({
                "sums": [acc_s.tolist()],
                "gram": [acc_g.tolist()],
                "n": [count],
            })

    while nparts > fanin:
        nparts = max(1, math.ceil(nparts / fanin))
        partials = partials.repartition(nparts).mapInPandas(
            combine, _GRAM_SCHEMA
        )
    return partials


def _gram_moments(df: DataFrame, vec_col: str, fanin: int = 64):
    """One distributed pass → (column sums (d,), Gram matrix XᵀX (d,d),
    row count).  Each partition ships three numbers' worth of state —
    never rows — and partials are tree-combined so at most ``fanin``
    rows (not one per input partition) ever reach the driver: at
    d=1024 a partial is ~8 MB, so a 10⁵-partition corpus would
    otherwise put ~800 GB on the driver."""

    def partial(iterator):
        import pandas as pd

        acc_s = None
        acc_g = None
        count = 0
        for pdf in iterator:
            if pdf.empty:
                continue
            mat = np.stack(
                pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64))
            )
            s = mat.sum(axis=0)
            g = mat.T @ mat
            acc_s = s if acc_s is None else acc_s + s
            acc_g = g if acc_g is None else acc_g + g
            count += len(mat)
        if count:
            yield pd.DataFrame({
                "sums": [acc_s.tolist()],
                "gram": [acc_g.reshape(-1).tolist()],
                "n": [count],
            })

    src = df.select(vec_col)
    partials = src.mapInPandas(partial, _GRAM_SCHEMA)
    nparts = src.rdd.getNumPartitions()
    parts = _combine_gram_partials(partials, nparts, fanin).collect()
    if not parts:
        raise ValueError("empty embedding column")
    d = len(parts[0]["sums"])
    sums = np.zeros(d)
    gram = np.zeros((d, d))
    n = 0
    for r in parts:  # bounded: ≤ fanin rows regardless of partitioning
        sums += np.asarray(r["sums"])
        gram += np.asarray(r["gram"]).reshape(d, d)
        n += r["n"]
    return sums, gram, n


def embedding_pca(
    df: DataFrame,
    vec_col: str,
    k: int,
    id_col: str | None = None,
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> "tuple[DataFrame, np.ndarray, np.ndarray]":
    """Project embeddings onto their top-``k`` principal components.

    Returns ``(projected_df, components (k,d), explained_var (k,))``.
    Component signs are pinned (largest-|coeff| entry positive) so runs
    are deterministic.  ``whiten=True`` scales each component to unit
    variance."""
    if k <= 0:
        raise ValueError("k must be positive")
    sums, gram, n = _gram_moments(df, vec_col)
    d = len(sums)
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    var = np.maximum(vals[order], 0.0)
    # deterministic sign: largest-|coeff| entry of each component > 0
    for r in range(k):
        pivot = np.argmax(np.abs(comps[r]))
        if comps[r, pivot] < 0:
            comps[r] = -comps[r]
    scale = 1.0 / np.sqrt(var + eps) if whiten else np.ones(k)

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((mean, comps, scale))
    cols = df.columns if id_col is None else [id_col, vec_col]
    src = df if id_col is None else df.select(*cols)
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    )

    def project(iterator):
        import pandas as pd

        mu, c, sc = bc.value
        for pdf in iterator:
            if pdf.empty:
                continue
            mat = np.stack(
                pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64))
            )
            proj = (mat - mu) @ c.T * sc
            pdf = pdf.copy()
            pdf[out_col] = list(proj)
            yield pdf

    return (
        src.mapInPandas(project, f"{out_fields}, {out_col} array<double>"),
        comps,
        var,
    )


def hard_negatives(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    label_col: str,
    anchor_ids,
    k: int = 10,
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor, the ``k``
    most cosine-similar corpus vectors carrying a DIFFERENT label —
    the negatives that teach an embedding model the most (public
    in-batch/hard-negative practice from SimCLR/DPR-style training).
    Returns ``(anchor_id, id, rank)``, rank 1 = hardest, ties broken
    by id ascending.  Rank (not raw similarity) is the output so the
    result is stable across float-summation orders — the same
    contract as ``index.vector.exact_knn``'s oracle-gated queries.

    Scale shape: ``anchor_ids`` is a BOUNDED batch (mining runs batch
    by batch — the practical pattern for training loops): their
    vectors+labels are collected once (guarded) and numpy-broadcast.
    The corpus is scanned ONCE; each Arrow batch computes a
    (rows × anchors) similarity block, masks same-label and self
    pairs, and emits only its partition-local top-k per anchor
    (argpartition, never a sort of the block), so the final per-anchor
    window ranks ≤ partitions·k candidate rows, not the corpus.  No
    corpus-sized shuffle at any scale.

    The label mask runs BEFORE truncation — an anchor surrounded by
    same-label neighbors still gets k true negatives (a post-filter
    over a plain knn's top-k would lose them)."""
    import pandas as pd

    from muller_spark.index.vector import fast_matrix
    from muller_spark.partitioning import ensure_parallelism

    anchor_ids = sorted(int(a) for a in anchor_ids)
    if not anchor_ids:
        raise ValueError("hard_negatives needs at least one anchor id")
    if len(anchor_ids) > 4096:
        raise ValueError(
            f"{len(anchor_ids)} anchors in one batch: mine in bounded "
            "batches (<=4096) so the anchor matrix stays broadcastable"
        )
    apdf = (
        df.filter(F.col(id_col).isin(anchor_ids))
        .select(id_col, vec_col, label_col)
        .toPandas()
    )
    if len(apdf) != len(anchor_ids):
        missing = set(anchor_ids) - set(int(x) for x in apdf[id_col])
        raise ValueError(f"anchor ids not in corpus: {sorted(missing)[:10]}")
    apdf = apdf.sort_values(id_col).reset_index(drop=True)
    amat = fast_matrix(apdf[vec_col], np.float64)
    amat = amat / np.maximum(np.linalg.norm(amat, axis=1, keepdims=True), 1e-30)
    a_ids = apdf[id_col].to_numpy(np.int64)
    a_lbl = apdf[label_col].to_numpy()
    spark = df.sparkSession
    ba = spark.sparkContext.broadcast((amat, a_ids, a_lbl))
    kk = int(k)

    def partial_topk(iterator):
        qm, qids, qlbl = ba.value
        for pdf in iterator:
            if pdf.empty:
                continue
            mat = fast_matrix(pdf[vec_col], np.float64)
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-30
            )
            sims = mat @ qm.T  # (n, na)
            lbl = pdf["__lbl"].to_numpy()
            rid = pdf["__id"].to_numpy(np.int64)
            out = []
            for qi in range(qm.shape[0]):
                ok = (lbl != qlbl[qi]) & (rid != qids[qi])
                if not ok.any():
                    continue
                cand = np.flatnonzero(ok)
                take = min(kk, cand.size)
                s = sims[cand, qi]
                top = cand[np.argpartition(-s, take - 1)[:take]]
                out.append(pd.DataFrame({
                    "anchor_id": qids[qi],
                    "id": rid[top],
                    "sim": sims[top, qi],
                }))
            if out:
                yield pd.concat(out)

    corpus = ensure_parallelism(
        df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias(vec_col),
            F.col(label_col).alias("__lbl"),
        )
    )
    partial = corpus.mapInPandas(
        partial_topk, "anchor_id long, id long, sim double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("anchor_id", "id", "rank")
    )


def feature_hash_embed(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    normalize: bool = False,
) -> DataFrame:
    """Feature-hashing ("hashing trick") document embedding: each token
    lands in bucket ``(h >> 1) mod dim`` with sign ``±1`` from the
    hash's low bit (the sign hash unbiases collisions — Weinberger et
    al.), summed per document into an integer vector.  Deterministic,
    vocabulary-free, engine-portable (the md5-60bit hash family) —
    the standard no-model text featurizer feeding the quality
    classifier, drift monitors, or a cheap ANN recall stage.

    Returns (id, embedding array<long>) — exact integers, so the
    DuckDB oracle replays every component (q_feature_hash);
    ``normalize=True`` adds ``embedding_l2`` array<double> (unit
    L2; zero vectors stay zero), pinned in pytest rather than oracled
    (sqrt is transcendental).

    Scale shape: explode → ONE (id, bucket) hash aggregate with
    map-side combine → per-doc map assembly; the dense fill is a
    ``transform`` over ``sequence(0, dim)`` — no joins against a
    bucket range, no windows.  Token-less/NULL docs embed as the zero
    vector via the left join from the id spine."""
    from muller_spark.operators.dedup import portable_hash60
    from muller_spark.operators.text import tokens_of

    if dim <= 0:
        raise ValueError("dim must be positive")
    h = portable_hash60(F.col("__fh_tok"))
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_of(F.col(text_col))).alias("__fh_tok"),
    ).select(
        "id",
        (F.shiftright(h, 1) % F.lit(dim)).cast("int").alias("bucket"),
        F.when(h % 2 == 0, F.lit(1)).otherwise(F.lit(-1)).alias("sgn"),
    )
    agg = exploded.groupBy("id", "bucket").agg(
        F.sum("sgn").cast("long").alias("v")
    )
    maps = agg.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "v"))
        ).alias("__fh_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__fh_m"), i.cast("int")), F.lit(0).cast("long")
        ),
    )
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(maps, "id", "left")
        .select("id", dense.alias("embedding"))
    )
    if normalize:
        norm = F.sqrt(
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda a, x: a + (x * x).cast("double"),
            )
        )
        out = out.withColumn(
            "embedding_l2",
            F.when(
                norm > 0,
                F.transform(F.col("embedding"), lambda x: x / norm),
            ).otherwise(
                F.transform(F.col("embedding"), lambda x: F.lit(0.0)),
            ),
        )
    return out


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization — the 4× (int8) /
    2× (int16) storage-and-bandwidth cut applied to embedding columns
    before they hit a 100 TB ANN index or a network shuffle.  Each
    vector gets its own scale ``s = max|v| / (2^(bits-1) - 1)``;
    components quantize as ``floor(v/s + 0.5)`` — floor-plus-half
    instead of ``round()`` because the engines disagree on round-half
    ties while floor of the identical IEEE double is bit-identical
    everywhere, which is what lets the DuckDB oracle replay every
    component (q_quantize_embeddings).

    Returns (id, scale double, qvec array<int>).  Zero/NULL vectors
    carry scale 0 and an empty/zero qvec (dequantize maps them back to
    zeros).  Map-only — no shuffle, no state."""
    if not 2 <= bits <= 16:
        raise ValueError("bits must be in [2, 16]")
    qmax = float(2 ** (bits - 1) - 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(amax > 0, amax / F.lit(qmax)).otherwise(F.lit(0.0))
    stage = df.select(
        F.col(id_col).alias("id"),
        v.alias("__qe_v"),
        scale.alias("scale"),
    )
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("__qe_v"),
            lambda x: F.floor(x / F.col("scale") + 0.5).cast("int"),
        ),
    ).otherwise(
        F.transform(F.col("__qe_v"), lambda x: F.lit(0).cast("int"))
    )
    return stage.select("id", "scale", q.alias("qvec"))


def dequantize_embeddings(
    df: DataFrame,
    qvec_col: str = "qvec",
    scale_col: str = "scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``v_i ≈ q_i · s`` with
    per-component error ≤ s/2 by construction (pinned in pytest).
    Map-only."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col), lambda x: x.cast("double") * F.col(scale_col)
        ),
    )
