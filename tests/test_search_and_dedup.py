"""Inverted-index, vector-search, and dedup operator tests.

Models the reference's test strategy (SURVEY §5): dual-engine oracles —
index search vs scan CONTAINS, ANN recall vs exact KNN (reference
``test_vector_search_recall.py``), MinHash estimate vs exact Jaccard.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.index.inverted import InvertedIndex  # noqa: E402
from muller_spark.index.vector import ann_knn, exact_knn  # noqa: E402
from muller_spark.operators.dedup import (  # noqa: E402
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from muller_spark.operators.text import lang_id, quality_score, token_count  # noqa: E402
from muller_spark.plans.conditions import contains_predicate  # noqa: E402

DOCS = "/root/testdata/sf0.01/documents.parquet"
EMB = "/root/testdata/sf0.01/embeddings.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


# ----------------------------------------------------------------- inverted
def test_inverted_index_fuzzy_matches_scan(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx") / "text_index")
    idx = InvertedIndex.build(docs, "text", path, id_col="doc_id")
    for query in ["vector merge", "spark", "stream window"]:
        via_index = {r["id"] for r in idx.search(query, "fuzzy_match").collect()}
        via_scan = {
            r["doc_id"]
            for r in docs.filter(contains_predicate(F.col("text"), query)).collect()
        }
        assert via_index == via_scan, query


def test_inverted_index_phrase_search(spark, docs, tmp_path_factory):
    """Positional index: phrase_match = token-adjacency, verified
    against a regex scan oracle over the normalized token stream."""
    path = str(tmp_path_factory.mktemp("idx") / "pos_index")
    idx = InvertedIndex.build(docs, "text", path, id_col="doc_id",
                              positions=True)
    assert idx.manifest["positions"] is True
    for phrase in ["table part", "fast merge batch", "spark"]:
        via_index = {r["id"] for r in
                     idx.search(phrase, "phrase_match").collect()}
        pattern = r"(^|[^a-z0-9])" + r"[^a-z0-9]+".join(
            phrase.split()) + r"($|[^a-z0-9])"
        via_scan = {r["doc_id"] for r in
                    docs.filter(F.lower("text").rlike(pattern)).collect()}
        assert via_index == via_scan, phrase
    # phrase absent from the corpus → empty
    assert idx.search("zzz qqq xxx", "phrase_match").count() == 0
    # incremental update preserves positions: new doc becomes findable
    extra = spark.createDataFrame(
        [(990001, "wholly novel table part phrase appended later")],
        "doc_id long, text string",
    )
    idx.update(extra.withColumn("lang", F.lit("en"))
               .withColumn("source", F.lit("srcX"))
               .withColumn("n_chars", F.length("text")), commit_id="c2")
    hits = {r["id"] for r in idx.search("table part", "phrase_match").collect()}
    assert 990001 in hits


def test_phrase_requires_positional_index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx") / "nopos_index")
    idx = InvertedIndex.build(docs, "text", path, id_col="doc_id")
    with pytest.raises(ValueError, match="positional"):
        idx.search("table part", "phrase_match")


def test_inverted_index_complex_fuzzy(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx") / "text_index2")
    idx = InvertedIndex.build(docs, "text", path, id_col="doc_id")
    via_index = {r["id"] for r in idx.search("vector merge||stream window",
                                             "complex_fuzzy_match").collect()}
    pred = contains_predicate(F.col("text"), "vector merge||stream window")
    via_scan = {r["doc_id"] for r in docs.filter(pred).collect()}
    assert via_index == via_scan


def test_inverted_index_scalar_exact_and_range(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx") / "scalar_index")
    idx = InvertedIndex.build(docs, "n_chars", path, id_col="doc_id", is_text=False)
    some = docs.select("n_chars").first()[0]
    via_index = {r["id"] for r in idx.search(some, "exact_match").collect()}
    via_scan = {r["doc_id"] for r in docs.filter(F.col("n_chars") == some).collect()}
    assert via_index == via_scan

    lo, hi = 200, 400
    via_index = {r["id"] for r in idx.search((lo, hi), "range_match").collect()}
    via_scan = {
        r["doc_id"] for r in docs.filter(F.col("n_chars").between(lo, hi)).collect()
    }
    assert via_index == via_scan  # inclusive both ends


def test_inverted_index_stop_words(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx") / "stop_index")
    idx = InvertedIndex.build(docs, "text", path, id_col="doc_id",
                              stop_words=["the", "a"])
    assert idx.search("the", "fuzzy_match").count() == 0


# ------------------------------------------------------------------- vector
def test_exact_knn_matches_numpy_bruteforce(spark, emb):
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = mat[:3]

    for metric in ("l2", "cosine", "inner_product"):
        got = exact_knn(emb, "embedding", "vec_id", q, k=5, metric=metric).collect()
        by_query = {}
        for r in got:
            by_query.setdefault(r["query_id"], []).append((r["rank"], r["id"]))
        if metric == "l2":
            d = ((mat[:, None, :] - q[None, :, :]) ** 2).sum(axis=2)
        elif metric == "inner_product":
            d = -(mat @ q.T)
        else:
            d = 1 - (mat @ q.T) / (
                np.linalg.norm(mat, axis=1)[:, None] * np.linalg.norm(q, axis=1)[None, :]
            )
        for qi in range(3):
            expect = set(ids[np.argsort(d[:, qi], kind="stable")[:5]])
            mine = {i for _, i in by_query[qi]}
            assert mine == expect, metric


def test_ann_recall_against_exact(spark, emb):
    rows = emb.limit(3).collect()
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    exact = exact_knn(emb, "embedding", "vec_id", q, k=10, metric="cosine").collect()
    approx = ann_knn(
        emb, "embedding", "vec_id", q, k=10, metric="cosine",
        num_planes=4, num_tables=12,
    ).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [
        len(exact_sets[qi] & approx_sets.get(qi, set())) / 10 for qi in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


# -------------------------------------------------------------------- dedup
@pytest.fixture(scope="module")
def dup_docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog in the morning sun"),
        (1, "the quick brown fox jumps over the lazy dog in the morning sun"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog in the evening sun"),  # near dup of 0
        (3, "completely different content about spark distributed computing engines"),
        (4, "spark distributed computing engines are completely different content about"),
        (5, "an unrelated short text"),
    ]
    return spark.createDataFrame(base, "doc_id long, text string").cache()


def test_exact_dedup(dup_docs):
    out = exact_dedup(dup_docs, "text", "doc_id").collect()
    groups = {r["keep_id"]: r["dup_count"] for r in out}
    assert groups[0] == 2  # docs 0 and 1 identical
    assert len(out) == 5


def test_minhash_near_dup(dup_docs):
    pairs = minhash_lsh_pairs(
        dup_docs, "text", "doc_id",
        num_hashes=128, shingle_size=2, bands=32, threshold=0.5,
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found           # identical
    assert (0, 2) in found or (1, 2) in found  # near dup
    assert all({a, b} != {3, 5} for a, b in found)


def test_ngram_jaccard_exact(dup_docs):
    pairs = ngram_jaccard_pairs(dup_docs, "text", "doc_id", n=2, threshold=0.4).collect()
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert jac[(0, 1)] == 1.0
    assert (0, 2) in jac and 0.4 <= jac[(0, 2)] < 1.0


def test_minhash_portable_pairs(dup_docs):
    from muller_spark.operators.dedup import minhash_portable_pairs

    pairs = minhash_portable_pairs(
        dup_docs, "text", "doc_id",
        num_hashes=64, shingle_size=2, bands=16, threshold=0.5,
    ).collect()
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    assert est[(0, 1)] == 1.0            # identical docs → identical signatures
    assert (0, 2) in est or (1, 2) in est
    assert all({a, b} != {3, 5} for a, b in est)


def test_simhash_portable_fingerprints(dup_docs):
    from muller_spark.operators.dedup import simhash_portable

    fp = {r["id"]: r["simhash60"] for r in
          simhash_portable(dup_docs, "text", "doc_id").collect()}
    assert fp[0] == fp[1]                # identical docs, identical fingerprint
    assert 0 <= fp[0] < (1 << 60)
    # near-dup within small Hamming distance; unrelated docs far apart
    assert bin(fp[0] ^ fp[2]).count("1") <= 16
    assert bin(fp[0] ^ fp[3]).count("1") > 16


def test_simhash_portable_near_dups(dup_docs):
    from muller_spark.operators.dedup import simhash_portable_near_dups

    pairs = simhash_portable_near_dups(
        dup_docs, "text", "doc_id", max_hamming=10, num_blocks=12
    ).collect()
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert ham[(0, 1)] == 0            # identical docs
    with pytest.raises(ValueError, match="completeness"):
        simhash_portable_near_dups(dup_docs, "text", "doc_id",
                                   max_hamming=4, num_blocks=4)


def test_simhash_near_dup(dup_docs):
    # num_blocks must exceed max_hamming for the pigeonhole guarantee
    # (the operator now enforces this; 10/4 was silently incomplete)
    pairs = simhash_near_dups(
        dup_docs, "text", "doc_id", max_hamming=10, num_blocks=12
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found
    # identical docs → identical simhash → distance 0
    zero = [r for r in pairs if r["id_a"] == 0 and r["id_b"] == 1]
    assert zero[0]["hamming"] == 0


def test_embedding_near_dups(spark):
    rng = np.random.RandomState(0)
    base = rng.randn(20, 16)
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # row 20 = near-copy of row 0
    rows.append((20, [float(x) for x in base[0] + rng.randn(16) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_dups(
        df, "embedding", "vec_id", threshold=0.98, num_planes=4, num_tables=8
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 20) in found


# --------------------------------------------------------------------- text
def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog went to the house in that city"),
            (1, "der Hund und die Katze sind nicht mit der Maus zu Hause"),
            (2, "le chat et le chien sont pour la maison les amis"),
            (3, "xyzzy qwerty plugh"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["lang"] for r in df.select("id", lang_id(F.col("text")).alias("lang")).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "fr" and out[3] == "und"

    scored = quality_score(df, "text").collect()
    by_id = {r["id"]: r for r in scored}
    assert by_id[0]["quality_score"] > by_id[3]["quality_score"]
    assert by_id[0]["n_tokens"] == 12
    counts = {r["id"]: r["n"] for r in df.select("id", token_count(F.col("text")).alias("n")).collect()}
    assert counts[3] == 3


# ------------------------------------------------- index maintenance ops
def test_index_reshard_preserves_results(spark, docs, tmp_path_factory):
    """reshard_index (reference inverted_index_vectorized.py:526):
    changing the shard count must not change any search result."""
    path = str(tmp_path_factory.mktemp("idx") / "reshard_index")
    idx = InvertedIndex.build(docs, "text", path, id_col="doc_id", num_shards=8)
    before = {r["id"] for r in idx.search("vector merge", "fuzzy_match").collect()}
    idx.reshard(3)
    assert idx.manifest["num_shards"] == 3
    after = {r["id"] for r in idx.search("vector merge", "fuzzy_match").collect()}
    assert after == before and before


def test_index_optimize_compacts_files(spark, docs, tmp_path_factory):
    """optimize_index (reference :313): one parquet file per shard after
    compaction, identical results."""
    import glob
    import os as _os

    path = str(tmp_path_factory.mktemp("idx") / "opt_index")
    idx = InvertedIndex.build(docs, "text", path, id_col="doc_id", num_shards=4)
    before = {r["id"] for r in idx.search("spark", "fuzzy_match").collect()}
    idx.optimize()
    for shard_dir in glob.glob(_os.path.join(path, "postings", "shard=*")):
        files = [f for f in _os.listdir(shard_dir) if f.endswith(".parquet")]
        assert len(files) == 1, shard_dir
    after = {r["id"] for r in idx.search("spark", "fuzzy_match").collect()}
    assert after == before and before


def test_index_hot_shard_routing(spark, docs, tmp_path_factory):
    """add_hot_shard (reference :537): top-frequency terms answer from
    the dedicated hot table; results identical for hot, cold, and mixed
    hot+cold queries."""
    import os as _os

    path = str(tmp_path_factory.mktemp("idx") / "hot_index")
    idx = InvertedIndex.build(docs, "text", path, id_col="doc_id")
    queries = ["spark", "vector merge", "stream window"]
    before = {
        q: {r["id"] for r in idx.search(q, "fuzzy_match").collect()} for q in queries
    }
    idx.add_hot_shard(top_n=20)
    assert len(idx.manifest["hot_terms"]) == 20
    assert _os.path.isdir(_os.path.join(path, "postings_hot"))
    # at least one query must actually route through the hot table
    hot = set(idx.manifest["hot_terms"])
    assert any(t in hot for q in queries for t in q.split())
    for q in queries:
        got = {r["id"] for r in idx.search(q, "fuzzy_match").collect()}
        assert got == before[q], q


def test_index_hot_shard_positional_phrase(spark, docs, tmp_path_factory):
    """ADVICE r2: the hot posting table dropped the pos column on a
    positional index, so any phrase/fuzzy query touching a hot term
    died with UNRESOLVED_COLUMN.  The hot table must carry positions
    and phrase_match must return identical hits through it."""
    path = str(tmp_path_factory.mktemp("idx") / "hot_pos_index")
    idx = InvertedIndex.build(docs, "text", path, id_col="doc_id", positions=True)
    phrase_queries = ["vector merge", "stream window"]
    before = {
        q: {r["id"] for r in idx.search(q, "phrase_match").collect()}
        for q in phrase_queries
    }
    idx.add_hot_shard(top_n=20)
    hot = set(idx.manifest["hot_terms"])
    assert any(t in hot for q in phrase_queries for t in q.split())
    for q in phrase_queries:
        got = {r["id"] for r in idx.search(q, "phrase_match").collect()}
        assert got == before[q], q


def test_index_update_refreshes_hot_shard(spark, docs, tmp_path_factory):
    """Incremental update keeps the hot-shard copy consistent."""
    path = str(tmp_path_factory.mktemp("idx") / "hot_upd_index")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    idx = InvertedIndex.build(half, "text", path, id_col="doc_id")
    idx.add_hot_shard(top_n=10)
    idx.update(rest, commit_id="c2")
    full = InvertedIndex.build(
        docs, "text", str(tmp_path_factory.mktemp("idx") / "full_index"),
        id_col="doc_id",
    )
    for q in ["spark", "vector merge"]:
        got = {r["id"] for r in idx.search(q, "fuzzy_match").collect()}
        want = {r["id"] for r in full.search(q, "fuzzy_match").collect()}
        assert got == want, q


def test_sample_matrix_truncation_is_not_partition_ordered(spark, tmp_path):
    """When the Bernoulli overshoot materializes, truncation must drop a
    seeded-random subset, not the tail partitions: the kept rows should
    span the whole id range (a partition-ordered ``[:n]`` would exclude
    the final partitions systematically), and on a stable (parquet-
    backed) partitioning the same seed must reproduce the same matrix."""
    from muller_spark.index.vector import sample_matrix

    path = str(tmp_path / "vecs")
    (
        spark.range(4000)
        .repartitionByRange(8, "id")
        .select("id", F.array(F.col("id").cast("double")).alias("v"))
        .write.parquet(path)
    )
    df = spark.read.parquet(path)
    m1 = sample_matrix(df, "v", 100, seed=7)
    m2 = sample_matrix(df, "v", 100, seed=7)
    assert m1.shape == (100, 1)
    assert np.array_equal(m1, m2)  # seeded → reproducible
    ids = sorted(float(x) for x in m1[:, 0])
    assert ids[-1] >= 3000  # top of the id range represented
    assert ids[0] < 1000  # bottom of the id range represented


def test_ivf_recall_against_exact(spark, emb):
    """IVF coarse-quantizer path (FAISS IVFFLAT analogue): with a healthy
    nprobe/nlist ratio recall should be high; at nprobe=nlist it is
    exhaustive and must equal exact search."""
    from muller_spark.index.vector import ivf_knn

    rows = emb.limit(3).collect()
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    exact = exact_knn(emb, "embedding", "vec_id", q, k=10, metric="l2").collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["id"])

    approx = ivf_knn(
        emb, "embedding", "vec_id", q, k=10, metric="l2",
        num_centroids=8, nprobe=4,
    ).collect()
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [
        len(exact_sets[qi] & approx_sets.get(qi, set())) / 10 for qi in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls

    # exhaustive probing == exact (same ids, rank order identical)
    full = ivf_knn(
        emb, "embedding", "vec_id", q, k=10, metric="l2",
        num_centroids=8, nprobe=8,
    ).collect()
    want = sorted((r["query_id"], r["rank"], r["id"]) for r in exact)
    got = sorted((r["query_id"], r["rank"], r["id"]) for r in full)
    assert got == want


def test_dataset_vector_search_ivf_route(spark, tmp_path):
    """Dataset.create_vector_index(index_type='IVFPQ') routes through the
    IVF probe path and returns k rows per query."""
    import muller_spark.dataset as ds_mod

    d = ds_mod.dataset(str(tmp_path / "ivfds"), spark)
    d.create_tensor("v", htype="vector")
    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 8).astype(float)
    d.extend({"v": [v.tolist() for v in vecs]})
    d.commit("vectors")
    d.create_vector_index("v", index_type="IVFPQ", metric="l2", nlist=4, nprobe=4)
    out = d.vector_search(vecs[0].tolist(), "v", topk=5).collect()
    assert len(out) == 5
    assert out[0]["rank"] == 1 and abs(out[0]["distance"]) < 1e-9


def test_index_hot_term_skew_bounded_rows(spark, tmp_path_factory):
    """A stop-word-like term in >50% of the corpus must NOT become one
    unbounded array row (the round-1 scale-killer): postings are plain
    (term, id) rows, so the hottest term contributes max-1-id-per-row
    and every search over it still intersects correctly."""
    from pyspark.sql import functions as F

    n = 20_000
    df = (
        spark.range(n).withColumnRenamed("id", "doc_id")
        .withColumn(
            "text",
            F.concat(
                F.lit("common "),  # in every row — maximal skew
                F.when(F.col("doc_id") % 2 == 0, F.lit("even ")).otherwise(F.lit("odd ")),
                F.concat(F.lit("tok"), (F.col("doc_id") % 97).cast("string")),
            ),
        )
    )
    path = str(tmp_path_factory.mktemp("idx") / "skew_index")
    idx = InvertedIndex.build(df, "text", path, id_col="doc_id", num_shards=4)

    p = idx._postings()
    assert "id" in p.columns and "ids" not in p.columns
    # the hot term is n rows, not one n-element array
    assert p.filter(F.col("term") == "common").count() == n
    max_per_row = p.groupBy("term", "id").count().agg(F.max("count")).collect()[0][0]
    assert max_per_row == 1

    got = {r["id"] for r in idx.search("common even", "fuzzy_match").collect()}
    assert got == set(range(0, n, 2))
    got2 = {r["id"] for r in idx.search("common tok13 odd", "fuzzy_match").collect()}
    assert got2 == {d for d in range(n) if d % 97 == 13 and d % 2 == 1}


def test_index_cjk_fuzzy_search(spark, tmp_path_factory):
    """CJK corpus parity (reference
    tests/integration/indexing/test_inverted_index_local.py poem corpus,
    jieba tokenizer at inverted_index_vectorized.py:122-158): multi-char
    word queries must match inside sentences — whole-run tokens (the old
    regex fallback) can't do this.  jieba is absent here, so the
    vendored FMM segmenter (index/cjk.py) provides the dictionary
    longest-match path on both the build and query side."""
    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        (0, "白日依山尽，黄河入海流，欲穷千里目，更上一层楼"),
        (1, "床前明月光，疑是地上霜，举头邀明月，低头思故乡"),
        (2, "京口瓜洲一水间，钟山只隔数重山。 春风又绿江南岸，明月何时照我还？"),
        (3, "我是deepseek，迅雷不及掩耳盗铃儿响叮当仁不让世界充满爱之势!你是谁？"),
        (4, "plain english document about spark"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("idx") / "cjk_index")
    idx = InvertedIndex.build(df, "text", path, id_col="doc_id", num_shards=4)
    assert idx.manifest["tokenizer"] == "cjk_fmm"

    # index terms are dictionary words, not whole CJK runs
    terms = {r["term"] for r in idx._postings().select("term").collect()}
    assert "明月" in terms and "京口" in terms and "世界" in terms
    assert all(len(t) < 12 for t in terms), sorted(terms, key=len)[-3:]

    def hits(q):
        return {r["id"] for r in idx.search(q, "fuzzy_match").collect()}

    assert hits("明月") == {1, 2}          # CONTAINS 明月 scenario
    assert hits("京口") == {2}              # CONTAINS 京口 scenario
    assert hits("不让世界充满爱") == {3}    # mixed-idiom AND-of-terms
    assert hits("我是deepseek") == {3}      # mixed CJK + ascii query
    assert hits("spark") == {4}             # pure ascii still works
    assert hits("明月 故乡") == {1}         # multi-word AND


def test_hnsw_recall_against_exact(spark, emb):
    """Per-partition HNSW graph path (reference HNSWFLAT,
    vector_index.py:199-255; recall suite
    test_vector_search_recall.py): recall@10 >= 0.9 vs exact at default
    params.  With hnswlib absent the partition kernel falls back to the
    exact partial top-k, which must make recall exactly 1.0 — either
    way the contract holds and the distributed plumbing is exercised."""
    from muller_spark.index.vector import hnsw_knn

    rows = emb.limit(3).collect()
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    exact = exact_knn(emb, "embedding", "vec_id", q, k=10, metric="l2").collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["id"])

    got = hnsw_knn(emb, "embedding", "vec_id", q, k=10, metric="l2").collect()
    got_sets = {}
    for r in got:
        got_sets.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [
        len(exact_sets[qi] & got_sets.get(qi, set())) / 10 for qi in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_recall_on_clustered_input(spark, emb):
    """Centroid training must survive a corpus that is SORTED/clustered
    on disk (the round-1 limit() bug trained on one region): sort the
    embeddings by their first component, retrain, and require healthy
    recall."""
    from muller_spark.index.vector import ivf_knn
    from pyspark.sql import functions as F

    clustered = emb.orderBy(F.col("embedding")[0]).cache()
    try:
        rows = emb.limit(3).collect()
        q = np.array([r["embedding"] for r in rows], dtype=np.float64)
        exact = exact_knn(clustered, "embedding", "vec_id", q, k=10, metric="l2").collect()
        exact_sets = {}
        for r in exact:
            exact_sets.setdefault(r["query_id"], set()).add(r["id"])
        approx = ivf_knn(
            clustered, "embedding", "vec_id", q, k=10, metric="l2",
            num_centroids=8, nprobe=4,
        ).collect()
        approx_sets = {}
        for r in approx:
            approx_sets.setdefault(r["query_id"], set()).add(r["id"])
        recalls = [
            len(exact_sets[qi] & approx_sets.get(qi, set())) / 10 for qi in exact_sets
        ]
        assert sum(recalls) / len(recalls) >= 0.6, recalls
    finally:
        clustered.unpersist()


def test_vector_index_lifecycle_roundtrip(spark, tmp_path):
    """create → load → search (prebuilt artifacts) → append+commit →
    update (O(delta) assignment append) → unload → drop, mirroring
    reference vector_search_ops.py:18-141."""
    import muller_spark.dataset as ds_mod
    from muller_spark.errors import VectorIndexNotFoundError

    rng = np.random.RandomState(7)
    ds = ds_mod.dataset(str(tmp_path / "vds"), spark)
    ds.create_tensor("vec", htype="embedding", dtype="float32")
    vecs = rng.randn(120, 8)
    ds.extend({"vec": [[float(x) for x in v] for v in vecs]})
    ds.commit("base")

    ds.create_vector_index("vec", index_type="IVFFLAT", metric="l2",
                           nlist=4, nprobe=4, sample_size=120)
    idx_dir = str(tmp_path / "vds" / "_indexes" / "vector" / "vec" / "default")
    import os as _os

    assert _os.path.isdir(_os.path.join(idx_dir, "centroids"))
    assert _os.path.isdir(_os.path.join(idx_dir, "assign"))

    ds.load_vector_index("vec")
    assert ("vec", "default") in ds._vector_loaded
    assert ds._vector_loaded[("vec", "default")]["centroids"].shape == (4, 8)

    # nprobe == nlist → exhaustive: prebuilt search must equal exact
    q = vecs[:2]
    got = ds.vector_search(q, "vec", topk=5).collect()
    from muller_spark.index.vector import exact_knn as _exact

    want = _exact(ds.df, "vec", "_row_id", q, k=5, metric="l2").collect()
    assert sorted((r["query_id"], r["rank"], r["id"]) for r in got) == \
        sorted((r["query_id"], r["rank"], r["id"]) for r in want)

    # stale index (new commit) falls back to exact and stays correct;
    # update_vector_index re-freshens with an O(delta) append
    extra = rng.randn(30, 8)
    ds.extend({"vec": [[float(x) for x in v] for v in extra]})
    ds.commit("more rows")
    n_assign_before = spark.read.parquet(_os.path.join(idx_dir, "assign")).count()
    got_stale = ds.vector_search(q, "vec", topk=5).collect()
    assert len(got_stale) == 10
    ds.update_vector_index("vec")
    n_assign_after = spark.read.parquet(_os.path.join(idx_dir, "assign")).count()
    assert n_assign_after - n_assign_before == 30  # delta only, no rebuild
    assert ds._vector_manifest("vec", "default")["commit_id"] == ds.commit_id
    got_fresh = ds.vector_search(q, "vec", topk=5).collect()
    want_fresh = _exact(ds.df, "vec", "_row_id", q, k=5, metric="l2").collect()
    assert sorted((r["query_id"], r["rank"], r["id"]) for r in got_fresh) == \
        sorted((r["query_id"], r["rank"], r["id"]) for r in want_fresh)

    ds.unload_vector_index("vec")
    assert ("vec", "default") not in ds._vector_loaded
    ds.drop_vector_index("vec")
    assert not _os.path.isdir(idx_dir)
    with pytest.raises(VectorIndexNotFoundError):
        ds.load_vector_index("vec")


def test_simhash_hot_bucket_guard(spark):
    """A corpus dominated by empty docs (simhash 0 → one degenerate
    bucket per block) must not go quadratic: with a small
    max_bucket_size the join prunes the hot buckets, still finds pairs
    among real documents, and completes at a size where the unguarded
    N² join would be 25M bucket pairs."""
    from muller_spark.operators.dedup import simhash_near_dups
    from pyspark.sql import functions as F

    n = 10_000
    df = (
        spark.range(n).withColumnRenamed("id", "doc_id")
        .withColumn(
            "text",
            F.when(F.col("doc_id") < n - 20, F.lit(""))  # degenerate mass
            .otherwise(F.concat(F.lit("identical near duplicate document body "),
                                (F.col("doc_id") % 2).cast("string"))),
        )
    )
    pairs = simhash_near_dups(
        df, "text", "doc_id", max_hamming=3, max_bucket_size=100
    ).collect()
    real = {(r["id_a"], r["id_b"]) for r in pairs}
    # the 20 real docs form 2 identical groups of 10 → 2*C(10,2)=90 pairs
    assert len(real) == 90
    assert all(a >= n - 20 and b >= n - 20 for a, b in real)


def test_ivfpq_recall_and_lifecycle(spark, emb, tmp_path):
    """IVFPQ parity (reference builds FAISS IVFPQ,
    vector_index.py:199-255): ADC over uint8 codes + exact refine must
    reach recall@10 >= 0.8 vs exact on the 64-d embeddings, and the
    Dataset IVFPQ route must serve searches from the persisted codes
    table (32x-compressed corpus representation) including O(delta)
    update after a commit."""
    from muller_spark.index.vector import (
        build_ivfpq_artifacts,
        ivfpq_search,
    )

    path = str(tmp_path / "pq")
    build_ivfpq_artifacts(
        emb, "embedding", "vec_id", path,
        num_centroids=8, num_subspaces=8, codebook_size=64, sample_size=500,
    )
    rows = emb.limit(3).collect()
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    exact = exact_knn(emb, "embedding", "vec_id", q, k=10, metric="l2").collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["id"])

    # exhaustive coarse probe isolates what this test is about: the
    # PQ/ADC+refine quality itself.  (The coarse-probe recall ceiling at
    # partial nprobe matches plain IVF — the near-uniform synthetic
    # embeddings cluster poorly — and is covered by the IVF tests.)
    got = ivfpq_search(
        emb, "embedding", "vec_id", path, q, k=10, nprobe=8, refine=8
    ).collect()
    got_sets = {}
    for r in got:
        got_sets.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [
        len(exact_sets[qi] & got_sets.get(qi, set())) / 10 for qi in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls

    # codes table really is the compressed representation: m smallints
    codes = spark.read.parquet(path + "/codes")
    assert codes.columns == ["id", "code", "cell"] or set(codes.columns) == {"id", "code", "cell"}
    (first,) = codes.limit(1).collect()
    assert len(first["code"]) == 8

    # Dataset route: IVFPQ index end to end with update after commit
    import muller_spark.dataset as ds_mod

    ds = ds_mod.dataset(str(tmp_path / "pqds"), spark)
    ds.create_tensor("vec", htype="embedding", dtype="float32")
    rng = np.random.RandomState(3)
    vecs = rng.randn(160, 16)
    ds.extend({"vec": [[float(x) for x in v] for v in vecs]})
    ds.commit("base")
    ds.create_vector_index("vec", index_type="IVFPQ", metric="l2",
                           nlist=4, nprobe=4, num_subspaces=4,
                           codebook_size=32, sample_size=160, refine=8)
    ds.load_vector_index("vec")
    assert ds._vector_loaded[("vec", "default")]["codebooks"].shape == (4, 32, 4)
    got = ds.vector_search(vecs[:2], "vec", topk=5).collect()
    assert len(got) == 10
    # the true nearest neighbor of a corpus vector is itself — refine
    # must surface it at rank 1 despite quantization
    top1 = {r["query_id"]: r["id"] for r in got if r["rank"] == 1}
    assert top1[0] == 0 and top1[1] == 1

    more = rng.randn(40, 16)
    ds.extend({"vec": [[float(x) for x in v] for v in more]})
    ds.commit("delta")
    import os as _os

    idx_dir = str(tmp_path / "pqds" / "_indexes" / "vector" / "vec" / "default")
    before = spark.read.parquet(_os.path.join(idx_dir, "codes")).count()
    ds.update_vector_index("vec")
    after = spark.read.parquet(_os.path.join(idx_dir, "codes")).count()
    assert after - before == 40
    got2 = ds.vector_search(vecs[:1], "vec", topk=5).collect()
    assert len(got2) == 5 and got2[0]["id"] == 0


def test_index_scans_partition_prune(spark, emb, tmp_path, tmp_path_factory):
    """The scale claims in EXPLAIN.md, asserted: (1) an inverted-index
    term lookup reads only the probed posting shards (PartitionFilters
    on `shard`), (2) an IVF prebuilt search reads only the probed cells
    of the assignment table (PartitionFilters on `cell`)."""
    from muller_spark.index.vector import build_ivf_artifacts, ivf_search_prebuilt
    from pyspark.sql import functions as F

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    docs = spark.createDataFrame(
        [(i, f"word{i % 50} common text") for i in range(500)],
        "doc_id long, text string",
    )
    ipath = str(tmp_path_factory.mktemp("idx") / "prune_index")
    idx = InvertedIndex.build(docs, "text", ipath, id_col="doc_id", num_shards=8)
    lookup_plan = plan_of(idx._lookup_terms(["word7"]))
    assert "PartitionFilters: [" in lookup_plan
    # the shard filter must actually reach the parquet scan
    assert "shard" in lookup_plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]

    vpath = str(tmp_path / "ivf")
    build_ivf_artifacts(emb, "embedding", "vec_id", vpath,
                        num_centroids=8, sample_size=500)
    (qrow,) = emb.limit(1).collect()
    search_plan = plan_of(
        ivf_search_prebuilt(emb, "embedding", "vec_id", vpath,
                            [qrow["embedding"]], k=5, nprobe=2)
    )
    seg = search_plan.split("PartitionFilters: [", 1)
    assert len(seg) == 2 and "cell" in seg[1].split("]", 1)[0], search_plan[:2000]


def test_dedup_ledger_incremental(spark, tmp_path):
    """Batch-append flow: seed a ledger, feed two batches — duplicates
    of the seed corpus, intra-batch duplicates, and cross-batch
    duplicates are all dropped; each batch costs one hash anti-join,
    never a corpus re-scan."""
    from muller_spark.operators.dedup import (
        dedup_against_ledger,
        init_dedup_ledger,
    )

    path = str(tmp_path / "ledger")
    seed = spark.createDataFrame(
        [(0, "alpha doc"), (1, "beta doc")], "id long, text string"
    )
    init_dedup_ledger(seed, "text", path)

    batch1 = spark.createDataFrame(
        [(10, "ALPHA   doc"),   # normalized dup of seed -> dropped
         (11, "gamma doc"),     # fresh
         (12, "gamma doc"),     # intra-batch dup -> dropped
         (13, "delta doc")],    # fresh
        "id long, text string",
    )
    out1 = {r["id"] for r in dedup_against_ledger(batch1, "text", path).collect()}
    assert out1 == {11, 13}

    batch2 = spark.createDataFrame(
        [(20, "gamma doc"),     # dup of batch1 survivor -> dropped
         (21, "epsilon doc")],  # fresh
        "id long, text string",
    )
    out2 = {r["id"] for r in dedup_against_ledger(batch2, "text", path).collect()}
    assert out2 == {21}

    # update=False leaves the ledger untouched
    batch3 = spark.createDataFrame([(30, "zeta doc")], "id long, text string")
    dedup_against_ledger(batch3, "text", path, update=False).collect()
    again = {r["id"] for r in dedup_against_ledger(batch3, "text", path).collect()}
    assert again == {30}  # still fresh: dry run did not commit
    n_hashes = spark.read.parquet(path).distinct().count()
    assert n_hashes == 6  # alpha beta gamma delta epsilon zeta


def test_chunk_documents_windows(spark):
    """10 tokens, chunk=4, overlap=1 (stride 3): starts 0,3,6,9 →
    chunks of 4,4,4,1 tokens; map-only plan (no Exchange)."""
    from muller_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))), (1, ""), (2, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", 4, overlap=1)
    rows = sorted(
        ((r["chunk_id"], r["n_tokens"], r["chunk_text"]) for r in out.collect())
    )
    assert [r[0] for r in rows] == [0, 1, 2, 3]
    assert [r[1] for r in rows] == [4, 4, 4, 1]
    assert rows[0][2] == "t0 t1 t2 t3"
    assert rows[1][2] == "t3 t4 t5 t6"   # 1-token overlap
    assert rows[3][2] == "t9"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]  # chunking is a scan
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 4, overlap=4)


def test_rare_token_stats_reference(spark):
    """Hand-checked corpus: 'zzz' appears in 1 doc, 'qq' in 2, 'the' in
    3 → with max_df=2 both zzz and qq are rare; ratios are exact."""
    from muller_spark.operators.text import rare_token_stats

    df = spark.createDataFrame(
        [
            (0, "the zzz zzz"),        # 3 tokens, zzz rare x2
            (1, "the qq"),             # 2 tokens, qq rare x1
            (2, "the qq common"),      # common df=1 -> rare too
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in rare_token_stats(df, "doc_id", "text").collect()}
    assert rows[0]["n_tokens"] == 3 and rows[0]["n_rare"] == 2
    assert rows[0]["rare_ratio"] == round(2 / 3, 6)
    assert rows[1]["n_tokens"] == 2 and rows[1]["n_rare"] == 1
    assert rows[2]["n_tokens"] == 3 and rows[2]["n_rare"] == 2


def test_index_build_with_nulls_and_cjk(spark, tmp_path_factory):
    """NULL text cells must not crash the Arrow-batched CJK tokenizer
    (ADVICE r2: a null reaching .lower() fails the whole build task) —
    and tokenize_py must ignore every null spelling pandas can deliver
    (None, float NaN, pd.NA)."""
    import pandas as pd

    from muller_spark.index.inverted import tokenize_py

    assert tokenize_py(None) == []
    assert tokenize_py(float("nan")) == []
    assert tokenize_py(pd.NA) == []

    df = spark.createDataFrame(
        [(0, "hello world"), (1, None), (2, "中文分词测试"), (3, None),
         (4, "hello 中文")],
        "doc_id long, text string",
    )
    path = str(tmp_path_factory.mktemp("idx") / "null_cjk_index")
    idx = InvertedIndex.build(df, "text", path, id_col="doc_id")
    assert {r["id"] for r in idx.search("hello", "fuzzy_match").collect()} == {0, 4}
    assert {r["id"] for r in idx.search("中文", "fuzzy_match").collect()} == {2, 4}


def test_ivf_store_vectors_inverted_list_layout(spark, emb, tmp_path):
    """store_vectors=True is FAISS's inverted-list layout: the probed
    cells carry their own float32 vectors, search never joins the
    corpus, and results match the join-based layout exactly (the
    source embeddings are float32-representable)."""
    from muller_spark.index.vector import (
        build_ivf_artifacts,
        build_ivfpq_artifacts,
        ivf_search_prebuilt,
        ivfpq_search,
    )

    plain = str(tmp_path / "ivf_plain")
    stored = str(tmp_path / "ivf_stored")
    build_ivf_artifacts(emb, "embedding", "vec_id", plain,
                        num_centroids=8, sample_size=500)
    build_ivf_artifacts(emb, "embedding", "vec_id", stored,
                        num_centroids=8, sample_size=500, store_vectors=True)
    assert "vec" in spark.read.parquet(stored + "/assign").columns

    rows = emb.limit(3).collect()
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)

    def sets(res):
        out = {}
        for r in res:
            out.setdefault(r["query_id"], []).append((r["rank"], r["id"]))
        return {k: sorted(v) for k, v in out.items()}

    a = sets(ivf_search_prebuilt(emb, "embedding", "vec_id", plain,
                                 q, k=5, nprobe=8).collect())
    b = sets(ivf_search_prebuilt(emb, "embedding", "vec_id", stored,
                                 q, k=5, nprobe=8).collect())
    assert a == b and len(a) == 3

    # the stored-vector search plan has no scan of the corpus df at all
    plan = (
        ivf_search_prebuilt(emb, "embedding", "vec_id", stored, q, k=5, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "embeddings.parquet" not in plan

    # IVFPQ: same contract through the codes table
    pq_stored = str(tmp_path / "pq_stored")
    build_ivfpq_artifacts(
        emb, "embedding", "vec_id", pq_stored,
        num_centroids=8, num_subspaces=8, codebook_size=64, sample_size=500,
        store_vectors=True,
    )
    got = ivfpq_search(emb, "embedding", "vec_id", pq_stored,
                       q, k=10, nprobe=8, refine=8).collect()
    exact = exact_knn(emb, "embedding", "vec_id", q, k=10, metric="l2").collect()
    es, gs = {}, {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["id"])
    for r in got:
        gs.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [len(es[qi] & gs.get(qi, set())) / 10 for qi in es]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_dedup_ledger_staged_materialization(spark, tmp_path):
    """stage_dir mode: survivors materialize as parquet (reliable
    storage, nothing pinned in executor memory) with identical
    semantics to the localCheckpoint default — including the
    cross-batch dedup that depends on the ledger append landing."""
    from muller_spark.operators.dedup import (
        dedup_against_ledger,
        init_dedup_ledger,
    )

    path = str(tmp_path / "ledger")
    stage = str(tmp_path / "stage")
    init_dedup_ledger(
        spark.createDataFrame([(0, "alpha doc")], "id long, text string"),
        "text", path,
    )
    b1 = spark.createDataFrame(
        [(10, "alpha doc"), (11, "gamma doc"), (12, "gamma doc")],
        "id long, text string",
    )
    out1 = {
        r["id"]
        for r in dedup_against_ledger(
            b1, "text", path, keep_by="id", stage_dir=stage
        ).collect()
    }
    assert out1 == {11}
    b2 = spark.createDataFrame(
        [(20, "gamma doc"), (21, "epsilon doc")], "id long, text string"
    )
    out2 = {
        r["id"]
        for r in dedup_against_ledger(
            b2, "text", path, keep_by="id", stage_dir=stage
        ).collect()
    }
    assert out2 == {21}
    import os as _os

    assert _os.listdir(stage), "survivors staged as parquet"


def test_embedding_near_dups_explicit_dim_runs_no_driver_job(spark):
    """With ``dim`` passed, building the pairs plan must stay fully lazy
    — no `first()` probe job on the driver (round-6 item: the probe is
    one extra job per call on the hot path when dim is omitted)."""
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    plan = embedding_near_dups(
        df, "embedding", "vec_id", threshold=0.5,
        num_planes=4, num_tables=2, dim=8,
    )
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "plan construction with explicit dim ran a job"
    assert plan.columns == ["id_a", "id_b", "cosine"]  # still a valid plan


def test_dedup_clusters_raises_on_nonconvergence(spark):
    """A chain component with diameter > max_iterations must RAISE, not
    silently return the component split into several cluster_ids (which
    would let duplicates survive as multiple 'canonical' rows)."""
    from muller_spark.operators.dedup import dedup_clusters

    chain = [(i, i + 1) for i in range(24)]  # diameter 24 > 5
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(pairs, max_iterations=5)
    # with enough rounds the same chain converges to one component
    ok = dedup_clusters(pairs, max_iterations=30)
    assert ok.select("cluster_id").distinct().count() == 1


def test_exact_dedup_and_ledger_null_text_discipline(spark, tmp_path):
    """NULL-text rows have no content identity: exact_dedup excludes
    them (previously all NULL docs collapsed into one fake duplicate
    group), and the ledger path no longer re-admits a NULL-text row
    every batch while appending NULL hashes."""
    from muller_spark.operators.dedup import (
        dedup_against_ledger,
        init_dedup_ledger,
    )

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    groups = exact_dedup(df, "text", "doc_id").collect()
    assert len(groups) == 1 and groups[0]["dup_count"] == 2  # NULLs excluded

    ledger = str(tmp_path / "ledger")
    init_dedup_ledger(df, "text", ledger)
    batch = spark.createDataFrame(
        [(5, None), (6, "fresh")], "doc_id long, text string"
    )
    out1 = dedup_against_ledger(batch, "text", ledger)
    assert [r["doc_id"] for r in out1.collect()] == [6]
    # replaying a NULL-text batch admits nothing (was: one per batch)
    out2 = dedup_against_ledger(
        spark.createDataFrame([(7, None)], "doc_id long, text string"),
        "text", ledger,
    )
    assert out2.count() == 0
    hashes = spark.read.parquet(ledger)
    assert hashes.filter(F.col("content_hash").isNull()).count() == 0


def test_ledger_fresh_rows_core_unit(spark):
    """Unit test on the SHARED hash/anti-join core (round-7: one
    function behind both dedup_against_ledger and the streaming
    handler, replacing by-convention parity): NULL drop, normalization,
    ledger anti-join, deterministic keep_by winner."""
    from muller_spark.operators.dedup import ledger_fresh_rows

    batch = spark.createDataFrame(
        [
            (1, "Seen  Before"),     # normalizes to ledger entry → dropped
            (2, None),                # no content identity → dropped
            (3, "fresh thing"),       # winner of its hash (min doc_id)
            (4, "fresh thing"),       # intra-batch dup → dropped
            (5, "other fresh"),
        ],
        "doc_id long, text string",
    )
    import hashlib

    seen = hashlib.md5(b"seen before").hexdigest()
    ledger = spark.createDataFrame([(seen,)], "content_hash string")
    out = ledger_fresh_rows(batch, "text", ledger, normalize=True, keep_by="doc_id")
    rows = sorted(r["doc_id"] for r in out.collect())
    assert rows == [3, 5]
    assert "content_hash" in out.columns  # callers append these to the ledger
    # without keep_by: still exactly one representative per hash
    any_rep = ledger_fresh_rows(batch, "text", ledger, normalize=True)
    assert any_rep.count() == 2
