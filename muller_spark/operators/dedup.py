"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (it has no dedup), these are the
operations a 100 TB corpus pipeline needs, each designed shuffle-light:

- **exact_dedup** — content-hash groupBy; one shuffle on the hash.
- **minhash_lsh_pairs** — shingle → k-permutation MinHash signature →
  banded LSH bucket join → candidate pairs → exact/estimated Jaccard
  verify.  The corpus shuffles once per band on (band, band_hash); no
  N² comparison ever materializes.
- **simhash** — 64-bit sign-of-weighted-bit-votes fingerprint; near-dups
  are pairs within a Hamming radius (bucketed by rotated prefixes).
- **ngram_jaccard_pairs** — exact token-shingle Jaccard via explode +
  pair-count identity |A∩B| / (|A|+|B|-|A∩B|); bounded by a candidate
  filter on shared shingles.
- **embedding_near_dups** — cosine-threshold pairs via the LSH bucket
  join from muller_spark.index.vector.

All functions take/return DataFrames and never collect corpus rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from muller_spark.plans.conditions import TOKEN_SPLIT_REGEX


def normalized_text(col: Column) -> Column:
    """Case-fold + collapse whitespace — the canonical form used for
    exact/near dedup."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Group identical documents by md5(content); keep the min id.

    Returns (content_hash, keep_id, dup_count).
    """
    content = normalized_text(F.col(text_col)) if normalize else F.col(text_col)
    return (
        df.groupBy(F.md5(content).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _shingles(col: Column, n: int) -> Column:
    """Distinct token n-gram shingles of a text column (JVM-side)."""
    tokens = F.split(normalized_text(col), TOKEN_SPLIT_REGEX)
    if n == 1:
        return F.array_distinct(tokens)
    # slide an n-window over the token array with transform+slice
    idx = F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0)))
    return F.array_distinct(
        F.when(
            F.size(tokens) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n))),
        ).otherwise(F.array(F.concat_ws(" ", tokens)))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, signature array<long>) — k-hash MinHash over token shingles.

    Each hash function is ``xxhash64(shingle, seed=i)``; the signature is
    the per-document minimum.  Computed as explode → groupBy(id) with k
    ``min`` aggregates — partial (map-side) aggregation keeps the shuffle
    at one row per (doc, k)."""
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(F.col(text_col), shingle_size)).alias("shingle"),
    )
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_size: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, est_jaccard ≥ threshold).

    LSH banding: split the signature into ``bands`` bands of
    ``num_hashes // bands`` rows; docs sharing any band hash become
    candidates; est_jaccard = fraction of matching signature positions.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size).cache()

    band_arr = F.array(*[
        F.xxhash64(F.concat_ws(",",
            *[F.col("signature")[b * rows + r].cast("string") for r in range(rows)]
        )).alias(f"b{b}")
        for b in range(bands)
    ])
    banded = sig.select(
        "id", "signature", F.posexplode(band_arr).alias("band", "band_hash")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    out = candidates.select(
        "id_a", "id_b",
        (matches / F.lit(num_hashes)).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= threshold)
    return out


def simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 64,
) -> DataFrame:
    """(id, simhash long) — sign of per-bit token-hash votes.

    explode tokens → for each bit position sum(±1) → pack sign bits.
    One shuffle (groupBy id), ``bits`` map-side-combined aggregates.
    """
    tokens = F.split(normalized_text(F.col(text_col)), TOKEN_SPLIT_REGEX)
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(tokens).alias("token")
    ).filter(F.col("token") != "")
    h = F.xxhash64("token")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    votes = exploded.groupBy("id").agg(*aggs)
    packed = F.lit(0).cast("long")
    for b in range(bits):
        packed = packed.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(0)
        )
    return votes.select("id", packed.alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    num_blocks: int = 4,
) -> DataFrame:
    """Pairs within a Hamming radius, via the block-permutation trick:
    split 64 bits into ``num_blocks`` blocks; any pair within distance
    ``max_hamming < num_blocks`` shares at least one exact block →
    bucket-join on (block_idx, block_value), verify bit_count."""
    sh = simhash(df, text_col, id_col).cache()
    width = 64 // num_blocks
    blocks = F.array(*[
        F.shiftright(F.col("simhash"), i * width)
        .bitwiseAND(F.lit((1 << width) - 1))
        for i in range(num_blocks)
    ])
    keyed = sh.select("id", "simhash", F.posexplode(blocks).alias("block", "key"))
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(b, (F.col("a.block") == F.col("b.block"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            hamming_distance(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over token n-gram sets for pairs sharing ≥1 shingle.

    |A∩B| from a shingle self-join count; |A|,|B| from per-doc set sizes.
    Candidate explosion is bounded by shingle selectivity — suitable as
    the verify stage after an LSH prefilter at scale.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        _shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("size", F.size("shingles")).cache()
    exploded = sh.select("id", "size", F.explode("shingles").alias("shingle"))
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.size").alias("size_a"), F.col("b.size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter"))
    return inter.select(
        "id_a", "id_b", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def embedding_near_dups(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    num_planes: int = 10,
    num_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Cosine-similarity ≥ threshold pairs via hyperplane-LSH buckets +
    exact re-rank (same tables as index.vector.ann_knn)."""
    import numpy as np

    from muller_spark.index.vector import _hyperplanes

    spark = df.sparkSession
    first = df.select(vec_col).first()
    if first is None:
        return spark.createDataFrame([], "id_a long, id_b long, cosine double")
    dim = len(first[0])
    planes = [_hyperplanes(dim, num_planes, seed + t) for t in range(num_tables)]
    bp = spark.sparkContext.broadcast(planes)

    def bucketize(iterator):
        import pandas as pd

        ps = bp.value
        for pdf in iterator:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            frames = []
            for t, pl in enumerate(ps):
                bits = (unit @ pl.T) > 0
                bucket = np.zeros(len(mat), dtype=np.int64)
                for c in range(bits.shape[1]):
                    bucket = (bucket << 1) | bits[:, c]
                frames.append(pd.DataFrame({
                    "id": pdf[id_col], "table": t, "bucket": bucket,
                    "vec": list(unit),
                }))
            yield pd.concat(frames)

    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("table", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("vec", T.ArrayType(T.DoubleType())),
    ])
    buckets = df.select(id_col, vec_col).mapInPandas(lambda it: bucketize(it), schema)
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(b, (F.col("a.table") == F.col("b.table"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.aggregate(
                F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x,
            ).alias("cosine"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("cosine") >= threshold)
    )
    return pairs
