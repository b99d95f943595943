"""Disk-resident graph ANN index — the DiskANN analogue.

Reference parity target: ``muller/core/vector/algorithms/diskann_index.py``
(a Vamana graph on SSD searched with a bounded in-memory beam).  The
Spark-first translation keeps the defining property — **the graph and
the vectors live on disk (parquet); search memory is bounded by the
beam, never by the corpus** — and expresses traversal as a short
driver-side loop of id-keyed equi-joins, the same iterative pattern as
``operators/dedup.py`` connected components:

Artifacts (``build_graph_artifacts``):

- ``vectors``   — ``(id, vec)`` parquet, partitioned by coarse cell;
- ``adjacency`` — ``(id, neighbors array<long>)``: each node links to
  its ``R`` nearest neighbors *within its cell* (cells are spatially
  coherent, so in-cell edges are the short Vamana-style edges) plus its
  cell medoid;
- ``medoids``   — one row per cell, the vector nearest the centroid;
  medoids are mutually fully connected, forming a tiny global backbone
  so any cell is reachable from any entry in ≤ 2 backbone hops.

Search (``graph_search``) is best-first beam search: seed with the
``entry_probe`` nearest medoids per query (driver-side, tiny), then per
hop expand every unexpanded beam member — neighbors via an equi-join on
``adjacency``, distances via an equi-join on ``vectors`` + an
Arrow-batched kernel, state truncated to the top-``beam`` rows per query
(rank-limit pushdown keeps that shuffle map-bounded).  Per-hop state is
``≤ nq x (beam + frontier x R)`` rows regardless of corpus size, and
lineage is cut with ``localCheckpoint`` each hop so plans stay flat.

In-cell graph construction is exact KNN per cell (numpy, one Arrow
batch per cell) — cells are sized by the coarse k-means the same way
IVF cells are, so a cell fits an executor even when the corpus does
not.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from muller_spark.index.vector import (
    _as_matrix,
    _distances,
    fast_matrix,
    load_ivf_centroids,
    train_centroids,
)
from muller_spark.partitioning import ensure_parallelism

# The medoid backbone is a driver-built full mesh: cells² adjacency
# entries.  4096² longs ≈ 128 MB — the driver-sized ceiling.
MAX_CELLS = 4096


def build_graph_artifacts(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    num_cells: int = 16,
    R: int = 12,
    sample_size: int = 4096,
    seed: int = 42,
    quantize_bits: "int | None" = None,
) -> None:
    """Materialize the disk graph: ``centroids``, cell-partitioned
    ``vectors`` and ``adjacency`` (in-cell KNN + medoid links), and the
    ``medoids`` backbone.

    ``num_cells`` is capped at ``MAX_CELLS`` (4096): the medoid
    backbone is a full mesh built driver-side — O(cells²) adjacency
    entries — so cell count must stay driver-sized.  4096 cells ×
    ~1M-vector cells is ~4B vectors; shard above that.

    ``quantize_bits=8`` stores the ``vectors`` table SQ8 (symmetric
    per-vector int8 + float scale, the same at-rest layout as the IVF
    SQ8 lists in :func:`build_ivf_artifacts`) — 8× smaller than the
    float64 layout.  The disk graph is the declared 100 TB ANN path
    and its vector payload IS its footprint, so this is the difference
    between SSD-resident and not.  The in-cell KNN graph and the
    search both run on batch-dequantized values (one multiply; error ≤
    scale/2 per component — the original DiskANN builds its graph on
    even coarser PQ distances); the tiny medoid table keeps full
    precision so entry routing is unaffected.  Recall vs the float
    graph is pinned in tests/test_graph_index.py."""
    if num_cells > MAX_CELLS:
        raise ValueError(
            f"num_cells={num_cells} exceeds MAX_CELLS={MAX_CELLS}: the "
            "medoid backbone is a driver-built full mesh (cells^2 "
            "entries); use fewer, larger cells or shard the index"
        )
    if quantize_bits is not None and not 2 <= quantize_bits <= 8:
        raise ValueError("quantize_bits must be in [2, 8] (int8 storage)")
    spark = df.sparkSession
    centroids = train_centroids(df, vec_col, num_cells, sample_size, seed=seed)
    bc = spark.sparkContext.broadcast(centroids)
    spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))

    # persist the quantization grid so append_graph_vectors re-reads it
    # instead of assuming 8 bits — appended rows must land on the SAME
    # grid as the build or recall silently drifts across ingests
    spark.createDataFrame(
        [(int(quantize_bits),)] if quantize_bits else [(None,)],
        "quantize_bits int",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "meta"))

    qmax = float(2 ** (quantize_bits - 1) - 1) if quantize_bits else None
    assigned = ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        _assigner(bc, vec_col, id_col, qmax=qmax), _vector_schema(qmax)
    )
    # cluster by cell first: one file per cell instead of one per
    # (writer task, cell) — beam search reads a handful of cells and
    # must not pay a tasks×cells small-file listing tax
    assigned.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(path, "vectors"))
    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    _write_cells(spark, path, vectors, bc, R, prior_medoids=[])


def _vector_schema(qmax) -> str:
    if qmax is not None:
        return "id long, qvec array<tinyint>, scale float, cell int"
    return "id long, vec array<double>, cell int"


def _with_float_vec(cell_vectors: DataFrame) -> DataFrame:
    """Normalize either vectors layout to carry a float ``vec`` column:
    SQ8 rows dequantize JVM-side (one HOF multiply, no UDF) so the
    graph-build kernel and medoid extraction are layout-blind."""
    if "qvec" in cell_vectors.columns:
        return cell_vectors.withColumn(
            "vec",
            F.transform(
                F.col("qvec"),
                lambda x: x.cast("double") * F.col("scale").cast("double"),
            ),
        )
    return cell_vectors


def _assigner(bc, vec_col: str, id_col: str, qmax: "float | None" = None):
    def assign(iterator):
        import pandas as pd

        cents = bc.value
        for pdf in iterator:
            if pdf.empty:
                continue
            mat = fast_matrix(pdf[vec_col])
            cell = _distances(mat, cents, "l2").argmin(axis=1)
            if qmax is not None:
                amax = np.abs(mat).max(axis=1)
                scale = np.where(amax > 0, amax / qmax, 0.0).astype(np.float32)
                safe = np.where(scale > 0, scale, 1.0)[:, None]
                qm = np.floor(mat / safe + 0.5).astype(np.int8)
                qm[scale == 0] = 0
                yield pd.DataFrame({
                    "id": pdf[id_col],
                    "qvec": list(qm),
                    "scale": scale,
                    "cell": cell.astype(np.int32),
                })
            else:
                yield pd.DataFrame({
                    "id": pdf[id_col],
                    "vec": pdf[vec_col].map(
                        lambda v: [float(x) for x in v]
                    ),
                    "cell": cell.astype(np.int32),
                })

    return assign


def _make_cell_graph(bc, R: int):
    # one Arrow batch per cell => exact in-cell KNN graph + medoid
    def cell_graph(key, pdf):
        import pandas as pd

        cents = bc.value
        cell = int(key[0])
        mat = fast_matrix(pdf["vec"])
        ids = pdf["id"].to_numpy()
        medoid = int(
            ids[_distances(mat, cents[cell][None, :], "l2")[:, 0].argmin()]
        )
        n = len(ids)
        r = min(R, n - 1)
        sq = (mat * mat).sum(axis=1)
        rows = []
        # block-wise KNN: O(block x n) scratch instead of an n x n
        # matrix, so a cell's graph builds even when n^2 would not fit
        block = 256
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            d = sq[lo:hi, None] - 2.0 * (mat[lo:hi] @ mat.T) + sq[None, :]
            d[np.arange(hi - lo), np.arange(lo, hi)] = np.inf
            for bi, i in enumerate(range(lo, hi)):
                nbrs = (
                    [] if r <= 0
                    else [int(ids[j]) for j in np.argpartition(d[bi], r - 1)[:r]]
                )
                if medoid != int(ids[i]) and medoid not in nbrs:
                    nbrs.append(medoid)
                rows.append((int(ids[i]), nbrs, int(ids[i]) == medoid, cell))
        return pd.DataFrame(rows, columns=["id", "neighbors", "is_medoid", "cell"])

    return cell_graph


def _write_cells(spark, path, cell_vectors, bc, R, prior_medoids):
    """Build graph rows for every cell present in ``cell_vectors`` and
    write adjacency (dynamic partition overwrite: only those cells'
    partitions are replaced) + the merged medoid table.
    ``prior_medoids``: (cell, id, vec) rows of cells NOT being rebuilt."""
    cell_vectors = _with_float_vec(cell_vectors).select("id", "vec", "cell")
    graph = cell_vectors.groupBy("cell").applyInPandas(
        _make_cell_graph(bc, R),
        "id long, neighbors array<long>, is_medoid boolean, cell int",
    )
    graph.persist()
    try:
        new_medoids = (
            graph.filter("is_medoid")
            .join(cell_vectors.select("id", "vec"), "id")
            .select("cell", "id", "vec")
            .collect()
        )  # bounded: one row per rebuilt cell
        all_medoids = list(prior_medoids) + [
            (r["cell"], r["id"], list(r["vec"])) for r in new_medoids
        ]
        medoid_ids = sorted(m[1] for m in all_medoids)
        backbone = spark.createDataFrame(
            [(m, [x for x in medoid_ids if x != m]) for m in medoid_ids],
            "id long, extra array<long>",
        )
        adjacency = (
            graph.join(F.broadcast(backbone), "id", "left")
            .select(
                "id",
                F.when(
                    F.col("extra").isNotNull(),
                    F.array_union("neighbors", "extra"),
                ).otherwise(F.col("neighbors")).alias("neighbors"),
                "cell",
            )
        )
        (
            adjacency.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell")
            .parquet(os.path.join(path, "adjacency"))
        )
        spark.createDataFrame(
            all_medoids, "cell int, id long, vec array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "medoids")
        )
    finally:
        graph.unpersist()


def append_graph_vectors(
    df_delta: DataFrame, vec_col: str, id_col: str, path: str, R: int = 12
) -> None:
    """Incremental maintenance, O(affected cells) not O(corpus): assign
    the delta to the persisted centroids, append to ``vectors``, rebuild
    the in-cell graphs of ONLY the touched cells (partition-pruned read,
    dynamic partition overwrite of their adjacency), refresh the medoid
    table and backbone.  Untouched cells' nodes keep links to any
    replaced medoid — still a valid graph node in its cell, so search
    through a stale backbone edge still descends correctly; fresh seeds
    always come from the updated medoid table."""
    spark = df_delta.sparkSession
    # same (cell, centroid) parquet layout as the IVF artifacts — reuse
    # its loader rather than a second copy of the read
    centroids = load_ivf_centroids(spark, path)
    bc = spark.sparkContext.broadcast(centroids)

    # appended rows must match the existing at-rest layout AND grid —
    # read quantize_bits from the build-time meta table, not a caller
    # flag that could silently diverge; pre-meta artifacts (or a
    # missing meta) fall back to column sniffing at the 8-bit default
    qmax = None
    try:
        meta = spark.read.parquet(os.path.join(path, "meta")).first()
        bits = meta["quantize_bits"] if meta is not None else None
        if bits is not None:
            qmax = float(2 ** (int(bits) - 1) - 1)
    except Exception:
        existing_cols = spark.read.parquet(
            os.path.join(path, "vectors")
        ).columns
        qmax = 127.0 if "qvec" in existing_cols else None
    delta = df_delta.select(id_col, vec_col).mapInPandas(
        _assigner(bc, vec_col, id_col, qmax=qmax), _vector_schema(qmax)
    )
    delta.write.mode("append").partitionBy("cell").parquet(
        os.path.join(path, "vectors")
    )
    affected = sorted(
        r["cell"] for r in delta.select("cell").distinct().collect()
    )  # bounded: <= num_cells
    if not affected:
        return
    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    cell_vectors = vectors.filter(F.col("cell").isin(affected))
    prior = [
        (r["cell"], r["id"], list(r["vec"]))
        for r in spark.read.parquet(os.path.join(path, "medoids")).collect()
        if r["cell"] not in set(affected)
    ]
    _write_cells(spark, path, cell_vectors, bc, R, prior_medoids=prior)


def graph_search(
    spark,
    path: str,
    query_vectors,
    k: int = 10,
    beam: int = 32,
    max_hops: int = 6,
    entry_probe: "int | None" = None,
) -> DataFrame:
    """Best-first beam search over the disk graph.  Returns
    ``(query_id, id, distance, rank)`` — rank 1..k per query, L2.

    ``entry_probe=None`` (default) seeds the beam from EVERY cell's
    medoid: the medoid table is tiny (cell ceiling is ~4k) and per-cell
    entry guarantees the search starts one intra-cell graph away from
    any target's cell — on unstructured/high-entropy vectors, greedy
    routing between cells is nearly blind, and nearest-few-medoid entry
    measurably loses exact self-matches that all-cell entry finds.
    Pass an int to probe only the closest N medoids (cheaper first hop
    when cells are many and the corpus is well clustered).

    Memory: the only driver-side materialization is the medoid table
    (one row per cell) and a per-hop frontier count; per-hop executor
    state is bounded by ``nq x (beam + frontier x degree)`` rows.  The
    corpus (``vectors``) and graph (``adjacency``) are read through
    id-keyed equi-joins only — never collected, never held resident."""
    q = _as_matrix(query_vectors)
    nq = q.shape[0]
    bq = spark.sparkContext.broadcast(q)

    medoids = spark.read.parquet(os.path.join(path, "medoids")).collect()
    mvecs = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in medoids])
    mids = np.array([r["id"] for r in medoids])
    md = _distances(mvecs, q, "l2")  # (n_medoids, nq)

    n_entry = len(mids) if entry_probe is None else min(entry_probe, len(mids))
    seeds = [
        (qi, int(mids[j]), float(md[j, qi]), False)
        for qi in range(nq)
        for j in np.argsort(md[:, qi])[:n_entry]
    ]
    state = spark.createDataFrame(
        seeds, "query_id int, id long, distance double, expanded boolean"
    ).localCheckpoint()

    adjacency = spark.read.parquet(os.path.join(path, "adjacency"))
    raw = spark.read.parquet(os.path.join(path, "vectors"))
    quantized = "qvec" in raw.columns
    vectors = raw.select(
        *(["id", "qvec", "scale"] if quantized else ["id", "vec"])
    )

    def score(iterator):
        import pandas as pd

        qm = bq.value
        for pdf in iterator:
            if pdf.empty:
                continue
            if quantized:
                # SQ8 batch dequant: one multiply per row — the join
                # moved 1/8th the bytes, precision cost ≤ scale/2/dim
                mat = fast_matrix(pdf["qvec"]) \
                    * pdf["scale"].to_numpy(dtype=np.float64)[:, None]
            else:
                mat = fast_matrix(pdf["vec"])
            dist = np.empty(len(pdf))
            for qi in np.unique(pdf["query_id"].to_numpy()):
                mask = (pdf["query_id"] == qi).to_numpy()
                dist[mask] = _distances(mat[mask], qm[int(qi)][None, :], "l2")[:, 0]
            yield pd.DataFrame({
                "query_id": pdf["query_id"], "id": pdf["id"], "distance": dist,
            })

    w_beam = Window.partitionBy("query_id").orderBy(
        F.col("distance").asc(), F.col("id").asc()
    )
    for _hop in range(max_hops):
        frontier = state.filter(~F.col("expanded")).select("query_id", "id")
        if frontier.isEmpty():
            break
        candidates = (
            frontier.join(adjacency, "id")
            .select("query_id", F.explode("neighbors").alias("id"))
            # a node reached for one query may be known to another —
            # dedup per (query, node), then drop already-scored nodes
            .distinct()
            .join(state.select("query_id", "id"), ["query_id", "id"], "left_anti")
        )
        scored = candidates.join(vectors, "id").mapInPandas(
            score, "query_id int, id long, distance double"
        ).withColumn("expanded", F.lit(False))
        state = (
            state.withColumn("expanded", F.lit(True))
            .unionByName(scored)
            .withColumn("_r", F.row_number().over(w_beam))
            .filter(F.col("_r") <= beam)
            .drop("_r")
            .localCheckpoint()  # cut lineage: plans stay flat across hops
        )

    return (
        state.withColumn("rank", F.row_number().over(w_beam))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "distance", "rank")
    )
