"""Disk-resident graph ANN (index/graph.py — the DiskANN analogue):
artifacts on parquet, bounded-beam search, recall vs exact KNN."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.index.graph import build_graph_artifacts, graph_search  # noqa: E402
from muller_spark.index.vector import exact_knn  # noqa: E402

EMB = "/root/testdata/sf0.01/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def artifacts(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("graph") / "idx")
    build_graph_artifacts(emb, "embedding", "vec_id", path, num_cells=8, R=12)
    return path


def _recall_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["id"])
    return out


def test_artifacts_layout(spark, artifacts):
    vectors = spark.read.parquet(os.path.join(artifacts, "vectors"))
    adjacency = spark.read.parquet(os.path.join(artifacts, "adjacency"))
    medoids = spark.read.parquet(os.path.join(artifacts, "medoids"))
    n = vectors.count()
    assert adjacency.count() == n  # one adjacency row per vector
    assert medoids.count() == 8
    # cell partitioning exists on disk (disk layout, prunable)
    assert any(
        f.startswith("cell=") for f in os.listdir(os.path.join(artifacts, "vectors"))
    )
    # degree bounded: R in-cell + medoid + (medoid backbone for medoids)
    from pyspark.sql import functions as F

    max_deg = adjacency.select(F.max(F.size("neighbors"))).first()[0]
    assert max_deg <= 12 + 1 + 7


def test_graph_recall_against_exact(spark, emb, artifacts):
    rows = emb.limit(5).collect()
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    exact = _recall_sets(
        exact_knn(emb, "embedding", "vec_id", q, k=10, metric="l2").collect()
    )
    got_rows = graph_search(spark, artifacts, q, k=10, beam=48, max_hops=6).collect()
    got = _recall_sets(got_rows)
    recalls = [len(exact[qi] & got.get(qi, set())) / 10 for qi in exact]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    # ranks are 1..k and distances non-decreasing within a query
    by_q = {}
    for r in sorted(got_rows, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["distance"])
    for dists in by_q.values():
        assert dists == sorted(dists)


def test_graph_search_deterministic(spark, artifacts, emb):
    rows = emb.limit(2).collect()
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    a = graph_search(spark, artifacts, q, k=5, beam=32, max_hops=5).collect()
    b = graph_search(spark, artifacts, q, k=5, beam=32, max_hops=5).collect()
    key = lambda r: (r["query_id"], r["rank"], r["id"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sorted(a, key=key) == sorted(b, key=key)


def test_append_graph_vectors_incremental(spark, emb, tmp_path_factory):
    """Build on half the corpus, append the rest: appended vectors are
    reachable (an appended vector's own id comes back at rank 1), the
    medoid table stays one-row-per-cell, adjacency covers every row,
    and recall holds on the merged corpus."""
    from pyspark.sql import functions as F

    from muller_spark.index.graph import append_graph_vectors

    path = str(tmp_path_factory.mktemp("graphapp") / "idx")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    build_graph_artifacts(half, "embedding", "vec_id", path, num_cells=8, R=12)
    append_graph_vectors(rest, "embedding", "vec_id", path)

    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    adjacency = spark.read.parquet(os.path.join(path, "adjacency"))
    medoids = spark.read.parquet(os.path.join(path, "medoids"))
    assert vectors.count() == emb.count()
    assert adjacency.count() == emb.count()
    assert medoids.count() == medoids.select("cell").distinct().count()

    # orderBy before limit: a bare limit(3) takes whichever partition
    # answers first, so the probed ids (and thus recall marginality)
    # changed run-to-run
    probe = rest.orderBy("vec_id").limit(3).collect()
    q = np.array([r["embedding"] for r in probe], dtype=np.float64)
    got = graph_search(spark, path, q, k=5, beam=48, max_hops=6).collect()
    rank1 = {r["query_id"]: r["id"] for r in got if r["rank"] == 1}
    for qi, row in enumerate(probe):
        assert rank1[qi] == row["vec_id"], (qi, rank1)

    exact = _recall_sets(
        exact_knn(emb, "embedding", "vec_id", q, k=10, metric="l2").collect()
    )
    full = _recall_sets(
        graph_search(spark, path, q, k=10, beam=48, max_hops=6).collect()
    )
    recalls = [len(exact[qi] & full.get(qi, set())) / 10 for qi in exact]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_graph_search_state_is_beam_bounded(spark, artifacts, emb):
    """The defining DiskANN property: search never holds the corpus —
    the returned frontier/state per query is capped by the beam, so a
    1-hop search with a tiny beam returns at most beam rows per query
    and touches vectors only through joins (no full-corpus collect in
    the driver path — structurally guaranteed, asserted here on the
    output bound)."""
    rows = emb.limit(3).collect()
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    out = graph_search(spark, artifacts, q, k=50, beam=7, max_hops=2).collect()
    per_q = {}
    for r in out:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert per_q and all(v <= 7 for v in per_q.values())


def test_build_rejects_driver_sized_cell_overflow(spark, emb, tmp_path_factory):
    """num_cells above MAX_CELLS must fail fast with a clear error —
    the medoid backbone is a driver-built cells^2 mesh."""
    from muller_spark.index.graph import MAX_CELLS

    path = str(tmp_path_factory.mktemp("graph_guard"))
    with pytest.raises(ValueError, match="MAX_CELLS"):
        build_graph_artifacts(
            emb, "embedding", "vec_id", path, num_cells=MAX_CELLS + 1
        )


@pytest.fixture(scope="module")
def sq8_artifacts(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("graphsq8") / "idx")
    build_graph_artifacts(
        emb, "embedding", "vec_id", path, num_cells=8, R=12, quantize_bits=8
    )
    return path


def test_sq8_layout_and_size(spark, artifacts, sq8_artifacts):
    """SQ8 vectors table stores int8 + scale (no float vec column) and
    is materially smaller at rest than the float64 layout."""
    v = spark.read.parquet(os.path.join(sq8_artifacts, "vectors"))
    assert "qvec" in v.columns and "scale" in v.columns
    assert "vec" not in v.columns
    assert dict((f.name, f.dataType.simpleString()) for f in v.schema.fields)[
        "qvec"
    ] == "array<tinyint>"

    def _bytes(root):
        tot = 0
        for dirpath, _dirs, files in os.walk(root):
            tot += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
        return tot

    fsz = _bytes(os.path.join(artifacts, "vectors"))
    qsz = _bytes(os.path.join(sq8_artifacts, "vectors"))
    # float64 -> int8 is 8x on raw payload; parquet overhead and the
    # scale column eat some of it, but >= 3x must survive
    assert qsz * 3 <= fsz, (qsz, fsz)

    # medoid backbone keeps full precision (entry routing unaffected)
    med = spark.read.parquet(os.path.join(sq8_artifacts, "medoids"))
    assert dict((f.name, f.dataType.simpleString()) for f in med.schema.fields)[
        "vec"
    ] == "array<double>"


def test_sq8_recall_matches_float_graph(spark, emb, artifacts, sq8_artifacts):
    """The quantized graph must hold the float graph's recall bar vs
    exact KNN (SQ8 reconstruction error ≤ scale/2 per component is far
    below inter-neighbor distance gaps at k=10)."""
    rows = emb.limit(5).collect()
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    exact = _recall_sets(
        exact_knn(emb, "embedding", "vec_id", q, k=10, metric="l2").collect()
    )
    flt = _recall_sets(
        graph_search(spark, artifacts, q, k=10, beam=48, max_hops=6).collect()
    )
    sq8 = _recall_sets(
        graph_search(spark, sq8_artifacts, q, k=10, beam=48, max_hops=6).collect()
    )
    r_flt = [len(exact[qi] & flt.get(qi, set())) / 10 for qi in exact]
    r_sq8 = [len(exact[qi] & sq8.get(qi, set())) / 10 for qi in exact]
    assert sum(r_sq8) / len(r_sq8) >= 0.8, (r_sq8, r_flt)
    # and not materially below the float graph on the same queries
    assert sum(r_sq8) >= sum(r_flt) - 1.0, (r_sq8, r_flt)


def test_sq8_append_matches_artifact_layout(spark, emb, tmp_path_factory):
    """append_graph_vectors sniffs the at-rest layout: appending to an
    SQ8 artifact writes SQ8 rows (no mixed float/int files), appended
    ids come back at rank 1, recall holds on the merged corpus."""
    from pyspark.sql import functions as F

    from muller_spark.index.graph import append_graph_vectors

    path = str(tmp_path_factory.mktemp("graphsq8app") / "idx")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    build_graph_artifacts(
        half, "embedding", "vec_id", path, num_cells=8, R=12, quantize_bits=8
    )
    append_graph_vectors(rest, "embedding", "vec_id", path)

    v = spark.read.parquet(os.path.join(path, "vectors"))
    assert "qvec" in v.columns and "vec" not in v.columns
    assert v.count() == emb.count()
    assert v.filter(F.col("qvec").isNull()).count() == 0

    probe = rest.orderBy("vec_id").limit(3).collect()
    q = np.array([r["embedding"] for r in probe], dtype=np.float64)
    got = graph_search(spark, path, q, k=5, beam=48, max_hops=6).collect()
    rank1 = {r["query_id"]: r["id"] for r in got if r["rank"] == 1}
    for qi, row in enumerate(probe):
        assert rank1[qi] == row["vec_id"], (qi, rank1)


def test_sq8_build_rejects_bad_bits(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("graphsq8bad"))
    with pytest.raises(ValueError, match="quantize_bits"):
        build_graph_artifacts(
            emb, "embedding", "vec_id", path, quantize_bits=9
        )


def test_quantize_bits_persisted_and_reused_on_append(
    spark, emb, tmp_path_factory
):
    """Round 10: the build persists quantize_bits in a meta table and
    append reads it back, so appended rows land on the SAME grid as
    the build even for bits < 8 (before, append hard-coded qmax=127
    and sub-8-bit artifacts silently mixed quantization grids)."""
    from pyspark.sql import functions as F

    from muller_spark.index.graph import append_graph_vectors

    path = str(tmp_path_factory.mktemp("graphq4") / "idx")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    build_graph_artifacts(
        half, "embedding", "vec_id", path, num_cells=4, R=8, quantize_bits=4
    )
    meta = spark.read.parquet(os.path.join(path, "meta")).first()
    assert meta["quantize_bits"] == 4

    append_graph_vectors(rest, "embedding", "vec_id", path)
    v = spark.read.parquet(os.path.join(path, "vectors"))
    # 4-bit grid: every stored component must be in [-7, 7] — an
    # 8-bit-assuming append would write values up to 127
    mx = v.select(
        F.max(F.aggregate(
            "qvec", F.lit(0), lambda acc, x: F.greatest(acc, F.abs(x))
        )).alias("m")
    ).first()["m"]
    assert mx <= 7, mx
    assert v.count() == emb.count()

    # unquantized build records NULL bits and append stays float
    path2 = str(tmp_path_factory.mktemp("graphf") / "idx")
    build_graph_artifacts(half, "embedding", "vec_id", path2,
                          num_cells=4, R=8)
    meta2 = spark.read.parquet(os.path.join(path2, "meta")).first()
    assert meta2["quantize_bits"] is None
    append_graph_vectors(rest, "embedding", "vec_id", path2)
    v2 = spark.read.parquet(os.path.join(path2, "vectors"))
    assert "vec" in v2.columns and "qvec" not in v2.columns
