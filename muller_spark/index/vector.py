"""Vector similarity search: exact distributed top-k + LSH-bucketed ANN.

Re-expresses the reference's FAISS/DiskANN vector index surface
(``muller/core/vector/vector_index.py:199-279``, metrics l2 / cosine /
inner_product at ``core/vector/utils.py:25-42``) on Spark:

- **exact_knn** — the correctness oracle and the FLAT-index analogue.
  Partial top-k per partition (Arrow-batched numpy inside
  ``mapInPandas``), then a global ``orderBy(dist).limit(k)`` re-rank of
  the P·k candidates — the same partial+final shape as a distributed
  aggregation, so the full N×Q distance matrix never leaves executors.
- **ann_knn** — hyperplane-LSH path: random projections → bucket id,
  candidates = bucket-join matches, exact re-rank within candidates.
  Recall is tunable via ``num_planes``/``num_tables``.
- **ivf_knn** — inverted-file path (FAISS IVFFLAT/IVFPQ analogue): a
  coarse k-means quantizer trained on a bounded sample, queries probe
  their ``nprobe`` nearest cells, a single map-only pass emits
  per-partition partial top-k over probed rows.  ``num_centroids`` /
  ``nprobe`` play exactly the roles of nlist/nprobe.

Query vectors ship via broadcast (they're small); the corpus never
shuffles in the exact path and shuffles once (by bucket) in the ANN path.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from muller_spark.partitioning import ensure_parallelism

METRICS = ("l2", "cosine", "inner_product")


def _as_matrix(query_vectors) -> np.ndarray:
    q = np.asarray(query_vectors, dtype=np.float64)
    if q.ndim == 1:
        q = q[None, :]
    return q


def _distances(mat: np.ndarray, q: np.ndarray, metric: str) -> np.ndarray:
    """(n, d) x (m, d) → (n, m) distance (smaller = closer)."""
    if metric == "l2":
        # squared L2 (monotone with L2; FAISS also returns squared)
        n2 = (mat * mat).sum(axis=1)[:, None]
        q2 = (q * q).sum(axis=1)[None, :]
        return n2 + q2 - 2.0 * (mat @ q.T)
    if metric == "inner_product":
        return -(mat @ q.T)
    if metric == "cosine":
        mn = np.linalg.norm(mat, axis=1, keepdims=True)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        denom = np.clip(mn @ qn.T, 1e-30, None)
        return 1.0 - (mat @ q.T) / denom
    raise ValueError(f"metric must be one of {METRICS}, got {metric!r}")


def exact_knn(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vectors,
    k: int = 10,
    metric: str = "l2",
) -> DataFrame:
    """Exact top-k for each query vector.

    Returns (query_id, id, distance) with k rows per query.
    """
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}")
    q = _as_matrix(query_vectors)
    spark = df.sparkSession
    bq = spark.sparkContext.broadcast(q)
    m = metric
    kk = k

    def partial_topk(iterator):
        import pandas as pd

        qm = bq.value
        for pdf in iterator:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            dists = _distances(mat, qm, m)  # (n, nq)
            n = dists.shape[0]
            take = min(kk, n)
            out_frames = []
            for qi in range(qm.shape[0]):
                idx = np.argpartition(dists[:, qi], take - 1)[:take]
                out_frames.append(pd.DataFrame({
                    "query_id": qi,
                    "id": pdf[id_col].to_numpy()[idx],
                    "distance": dists[idx, qi],
                }))
            yield pd.concat(out_frames)

    partial = ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        partial_topk, "query_id int, id long, distance double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "distance", "rank")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(num_planes, dim)


def train_centroids(
    df: DataFrame,
    vec_col: str,
    num_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer training for IVF: Lloyd's k-means on a bounded
    driver-side sample — the same train-on-sample regime as FAISS IVF
    (reference trains on the committed tensor,
    ``core/vector/vector_index.py:199-255``).  The sample is capped at
    ``sample_size`` rows regardless of corpus size; the corpus itself is
    never collected."""
    rows = df.select(vec_col).limit(sample_size).collect()
    mat = np.asarray([r[0] for r in rows], dtype=np.float64)
    k = min(num_centroids, len(mat))
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(iters):
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def ivf_knn(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vectors,
    k: int = 10,
    metric: str = "l2",
    num_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) coarse quantizer —
    the FAISS ``IVFPQ``/``IVFFLAT`` analogue (recall tuned by
    ``num_centroids``/``nprobe`` exactly like nlist/nprobe).

    Single map-only pass over the corpus: each Arrow batch assigns its
    vectors to the nearest broadcast centroid, keeps only rows whose
    cell is in a query's probe set, and emits a per-partition partial
    top-k.  No shuffle touches the corpus; the final re-rank sees at
    most P·Q·k candidate rows."""
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}")
    q = _as_matrix(query_vectors)
    centroids = train_centroids(df, vec_col, num_centroids, sample_size, seed=seed)
    # probe sets: the nprobe nearest centroids per query (same metric space)
    cd = _distances(centroids, q, metric)  # (n_centroids, nq)
    probes = [set(np.argsort(cd[:, qi])[:nprobe].tolist()) for qi in range(q.shape[0])]

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((centroids, q, probes))
    m, kk = metric, k

    def probe_topk(iterator):
        import pandas as pd

        cents, qm, probe_sets = bc.value
        for pdf in iterator:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            assign = _distances(mat, cents, "l2").argmin(axis=1)
            out = []
            for qi, probe in enumerate(probe_sets):
                mask = np.isin(assign, list(probe))
                if not mask.any():
                    continue
                sub = mat[mask]
                dists = _distances(sub, qm[qi][None, :], m)[:, 0]
                take = min(kk, len(sub))
                idx = np.argpartition(dists, take - 1)[:take]
                out.append(pd.DataFrame({
                    "query_id": qi,
                    "id": pdf[id_col].to_numpy()[mask][idx],
                    "distance": dists[idx],
                }))
            if out:
                yield pd.concat(out)

    partial = ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        probe_topk, "query_id int, id long, distance double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "distance", "rank")
    )


def ann_knn(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vectors,
    k: int = 10,
    metric: str = "cosine",
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH + exact re-rank.

    Each of ``num_tables`` hash tables assigns every vector a bucket from
    the sign pattern of ``num_planes`` projections; a query probes its
    buckets in every table, candidates = union, exact distance re-rank.
    """
    q = _as_matrix(query_vectors)
    dim = q.shape[1]
    spark = df.sparkSession
    planes = [_hyperplanes(dim, num_planes, seed + t) for t in range(num_tables)]
    bp = spark.sparkContext.broadcast(planes)

    def bucketize(iterator):
        import pandas as pd

        ps = bp.value
        for pdf in iterator:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            frames = []
            for t, pl in enumerate(ps):
                bits = (mat @ pl.T) > 0
                bucket = np.zeros(len(mat), dtype=np.int64)
                for b in range(bits.shape[1]):
                    bucket = (bucket << 1) | bits[:, b]
                frames.append(pd.DataFrame({
                    "id": pdf[id_col], "table": t, "bucket": bucket,
                }))
            yield pd.concat(frames)

    corpus_buckets = ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        bucketize, "id long, table int, bucket long"
    )

    # query buckets computed on the driver (queries are tiny)
    q_rows = []
    for qi in range(q.shape[0]):
        for t, pl in enumerate(planes):
            bits = (q[qi] @ pl.T) > 0
            bucket = 0
            for b in bits:
                bucket = (bucket << 1) | int(b)
            q_rows.append((qi, t, bucket))
    q_buckets = spark.createDataFrame(q_rows, "query_id int, table int, bucket long")

    candidates = (
        corpus_buckets.join(F.broadcast(q_buckets), ["table", "bucket"])
        .select("query_id", "id")
        .distinct()
    )
    with_vec = candidates.join(df.select(F.col(id_col).alias("id"), vec_col), "id")

    bq = spark.sparkContext.broadcast(q)
    m = metric

    def rerank(iterator):
        import pandas as pd

        qm = bq.value
        for pdf in iterator:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            dist = np.empty(len(pdf))
            for qi in np.unique(pdf["query_id"].to_numpy()):
                mask = (pdf["query_id"] == qi).to_numpy()
                dist[mask] = _distances(mat[mask], qm[int(qi)][None, :], m)[:, 0]
            yield pd.DataFrame({
                "query_id": pdf["query_id"], "id": pdf["id"], "distance": dist,
            })

    scored = with_vec.mapInPandas(rerank, "query_id int, id long, distance double")
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "distance", "rank")
    )
