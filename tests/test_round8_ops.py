"""Round-8 operator wave: cluster_size_report, contamination_severity,
kfold_assign, zipf_report, bpe_top_pairs — value oracles replayed in
pure Python/numpy on corpora small enough to enumerate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from muller_spark.operators.dedup import (
    cluster_size_report,
    contamination_report,
    contamination_severity,
    ngram_jaccard_pairs,
)
from muller_spark.operators.sampling import kfold_assign
from muller_spark.operators.text import bpe_top_pairs, zipf_report


def test_cluster_size_report_sums_to_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog by the river"
    rows = [(i, base + f" v{i % 2}") for i in range(8)]          # one 8-family
    rows += [(100 + i, f"unrelated text {i} alpha{i} beta{i} gamma{i}")
             for i in range(5)]                                   # singletons
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(
        df, "text", "doc_id", threshold=0.5, max_shingle_freq=None
    )
    out = {r["cluster_size"]: (r["n_clusters"], r["n_docs"])
           for r in cluster_size_report(df, "doc_id", pairs).collect()}
    assert sum(nd for _, nd in out.values()) == 13
    # the 8 variants cluster together (v0/v1 differ by one token of 12)
    assert out.get(8) == (1, 8)
    assert out.get(1) == (5, 5)


def test_cluster_size_report_no_pairs_is_all_singletons(spark):
    df = spark.createDataFrame(
        [(i, f"unique {i} doc{i} tok{i} x{i} y{i}") for i in range(6)],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.9)
    out = cluster_size_report(df, "doc_id", pairs).collect()
    assert [(r["cluster_size"], r["n_clusters"], r["n_docs"]) for r in out] \
        == [(1, 6, 6)]


def test_contamination_severity_is_pairwise_rollup(spark):
    docs = [(i, "shared words alpha beta gamma delta " + ("tail " * (i % 3)),
             "train" if i < 8 else "test") for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string, side string")
    train = df.filter(F.col("side") == "train")
    test = df.filter(F.col("side") == "test")
    rep = contamination_report(train, test, "text", "doc_id", n=3).collect()
    want = {}
    for r in rep:
        t = r["test_id"]
        c, mx, mf = want.get(t, (0, 0, 0.0))
        want[t] = (c + 1, max(mx, r["n_shared"]),
                   max(mf, r["test_window_frac"]))
    got = {r["test_id"]: (r["n_contaminating_train_docs"], r["max_shared"],
                          r["max_test_window_frac"])
           for r in contamination_severity(
               train, test, "text", "doc_id", n=3).collect()}
    assert got == want and got


def test_kfold_assign_matches_hash_and_is_stable(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(-5, 40)], "doc_id long"
    )
    out = {r["doc_id"]: r["fold"]
           for r in kfold_assign(df, F.col("doc_id"), 5, salt=2).collect()}

    def hash_fold(i):
        k = ((i + 2) % 2147483648 + 2147483648) % 2147483648
        return k * 2654435761 % 4294967296 % 5

    assert out == {i: hash_fold(i) for i in range(-5, 40)}
    re = {r["doc_id"]: r["fold"] for r in kfold_assign(
        df.repartition(7), F.col("doc_id"), 5, salt=2).collect()}
    assert re == out


def test_kfold_assign_rejects_bad_k(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        kfold_assign(df, F.col("doc_id"), 0)


def test_zipf_report_matches_numpy_fit(spark):
    import numpy as np

    words = (["alpha"] * 40 + ["beta"] * 20 + ["gamma"] * 10
             + ["delta"] * 5 + ["eps"] * 2)
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    out = zipf_report(df, "text", k=5, n_fit=5).collect()
    assert [(r["rank"], r["token"], r["cnt"]) for r in out] == [
        (1, "alpha", 40), (2, "beta", 20), (3, "gamma", 10),
        (4, "delta", 5), (5, "eps", 2),
    ]
    x = np.log(np.arange(1, 6, dtype=float))
    y = np.log(np.array([40.0, 20, 10, 5, 2]))
    slope = np.polyfit(x, y, 1)[0]
    assert out[0]["zipf_slope"] == pytest.approx(round(slope, 6), abs=2e-6)
    assert len({r["zipf_slope"] for r in out}) == 1  # constant column


def test_bpe_top_pairs_hand_computed(spark):
    # vocab: "aab" x3, "ab" x2  -> pairs: (a,a):3, (a,b):5, (b,</w>):5
    df = spark.createDataFrame(
        [(0, "aab aab ab"), (1, "aab ab")], "doc_id long, text string"
    )
    out = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe_top_pairs(df, "text", k=10).collect()]
    assert out == [
        (1, "a", "b", 5), (2, "b", "</w>", 5), (3, "a", "a", 3),
    ]


def test_bpe_top_pairs_single_char_word(spark):
    # "x" contributes only (x, </w>)
    df = spark.createDataFrame([(0, "x x y")], "doc_id long, text string")
    out = {(r["left"], r["right"]): r["pair_count"]
           for r in bpe_top_pairs(df, "text", k=10).collect()}
    assert out == {("x", "</w>"): 2, ("y", "</w>"): 1}


def test_kfold_leakage_safe_over_cluster_roots(spark):
    """The leakage-safe CV recipe: fold keyed on the near-dup cluster
    root keeps every family in one fold."""
    from muller_spark.operators.dedup import dedup_clusters, lsh_verified_pairs

    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [(i, base + f" v{i % 2}") for i in range(10)]
    rows += [(100 + i, f"solo doc {i} unique{i} tok{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = lsh_verified_pairs(df, "text", "doc_id", threshold=0.5, bands=32)
    clusters = dedup_clusters(pairs.select("id_a", "id_b"))
    rooted = df.join(
        clusters.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).withColumn("root", F.coalesce("cluster_id", "doc_id"))
    out = kfold_assign(rooted, F.col("root"), 4)
    fam = {r["fold"] for r in out.filter(F.col("doc_id") < 100).collect()}
    assert len(fam) == 1  # the whole near-dup family in ONE fold
    assert out.count() == 16


def test_bpe_train_matches_pure_python(spark):
    from muller_spark.operators.text import bpe_train

    corpus = ["low low low low low lower lower newest newest newest "
              "newest newest newest widest widest widest"]
    df = spark.createDataFrame([(0, corpus[0])], "doc_id long, text string")
    got = [(r["merge_idx"], r["left"], r["right"], r["pair_count"])
           for r in bpe_train(df, "text", num_merges=6).collect()]

    # independent pure-python BPE over the same word counts
    vocab = {}
    for w in corpus[0].split():
        key = tuple(w) + ("</w>",)
        vocab[key] = vocab.get(key, 0) + 1
    want = []
    for idx in range(6):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((idx, l, r, c))
        nv = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r); i += 2
                else:
                    out.append(syms[i]); i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    assert got == want
    # the classic toy-corpus property: 'est'-family merges appear early
    assert got[0][1:3] == ("e", "s")


def test_bpe_train_first_merge_equals_kernel_rank1(spark):
    from muller_spark.operators.text import bpe_top_pairs, bpe_train

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i} common words here") for i in range(12)],
        "doc_id long, text string",
    )
    first = bpe_train(df, "text", num_merges=1).collect()[0]
    rank1 = bpe_top_pairs(df, "text", k=1).collect()[0]
    assert (first["left"], first["right"], first["pair_count"]) == (
        rank1["left"], rank1["right"], rank1["pair_count"])


def test_bpe_train_rejects_bad_merges(spark):
    from muller_spark.operators.text import bpe_train

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_train(df, "text", num_merges=0)


def test_feature_hash_embed_matches_python_replay(spark):
    import hashlib

    from muller_spark.operators.embedding import feature_hash_embed

    rows = [(0, "alpha beta alpha gamma"), (1, "beta beta"), (2, None),
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["embedding"] for r in
           feature_hash_embed(df, "text", "doc_id", dim=8).collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = {i: [0] * 8 for i in range(4)}
    for i, text in rows:
        for t in (text or "").lower().split():
            h = h60(t)
            want[i][(h >> 1) % 8] += 1 if h % 2 == 0 else -1
    assert got == want
    assert got[2] == [0] * 8  # NULL text -> zero vector


def test_feature_hash_embed_normalized_unit_or_zero(spark):
    import math

    from muller_spark.operators.embedding import feature_hash_embed

    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "")], "doc_id long, text string"
    )
    out = {r["id"]: (r["embedding"], r["embedding_l2"]) for r in
           feature_hash_embed(df, "text", "doc_id", dim=8,
                              normalize=True).collect()}
    raw, unit = out[0]
    n = math.sqrt(sum(x * x for x in raw))
    assert unit == pytest.approx([x / n for x in raw])
    assert out[1][1] == [0.0] * 8  # zero vector stays zero, no NaN


def test_apply_bpe_matches_pure_python(spark):
    from muller_spark.operators.text import apply_bpe, bpe_train

    corpus = "low low low lower lower newest newest newest widest"
    df = spark.createDataFrame([(0, corpus), (1, "low newest"), (2, None)],
                               "doc_id long, text string")
    merges = [(r["left"], r["right"]) for r in
              bpe_train(df, "text", num_merges=5).collect()]
    got = {r["id"]: r["n_bpe_symbols"] for r in
           apply_bpe(df, "text", "doc_id", merges).collect()}

    ranks = {p: i for i, p in enumerate(merges)}

    def enc(word):
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            cand = [(ranks[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in ranks]
            if not cand:
                break
            _, i = min(cand)
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        return len(syms)

    for i, text in [(0, corpus), (1, "low newest"), (2, None)]:
        want = sum(enc(t) for t in (text or "").lower().split())
        assert got[i] == want
    assert got[2] == 0


def test_apply_bpe_more_merges_fewer_symbols(spark):
    from muller_spark.operators.text import apply_bpe, bpe_train

    df = spark.createDataFrame(
        [(i, "compression compression ratio ratio signal") for i in range(4)],
        "doc_id long, text string",
    )
    m2 = [(r["left"], r["right"]) for r in bpe_train(df, "text", 2).collect()]
    m8 = [(r["left"], r["right"]) for r in bpe_train(df, "text", 8).collect()]
    c2 = apply_bpe(df, "text", "doc_id", m2).agg(
        F.sum("n_bpe_symbols")).first()[0]
    c8 = apply_bpe(df, "text", "doc_id", m8).agg(
        F.sum("n_bpe_symbols")).first()[0]
    c0 = apply_bpe(df, "text", "doc_id", []).agg(
        F.sum("n_bpe_symbols")).first()[0]
    assert c0 > c2 > c8


def test_remove_duplicated_windows_basic(spark):
    from muller_spark.operators.text import remove_duplicated_windows

    rows = [
        (0, "unique alpha one two three shared boiler plate text here tail zero"),
        (1, "other beta four five six shared boiler plate text here tail one"),
        (2, "totally different doc nothing common"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: (r["clean_text"], r["n_tokens_removed"]) for r in
           remove_duplicated_windows(df, "text", "doc_id",
                                     n=3, min_docs=2).collect()}
    # the shared 6-token span vanishes from both docs; unique heads/tails stay
    assert out[0] == ("unique alpha one two three zero", 6)
    assert out[1] == ("other beta four five six one", 6)
    assert out[2] == ("totally different doc nothing common", 0)
    assert out[3] == ("", 0) and out[4] == ("", 0)


def test_remove_duplicated_windows_fully_boilerplate_doc_empties(spark):
    from muller_spark.operators.text import remove_duplicated_windows

    df = spark.createDataFrame(
        [(i, "same exact text every time") for i in range(3)],
        "doc_id long, text string",
    )
    out = remove_duplicated_windows(df, "text", "doc_id", n=3, min_docs=2)
    for r in out.collect():
        assert r["clean_text"] == "" and r["n_tokens_removed"] == 5


def test_remove_duplicated_windows_rejects_bad_args(spark):
    from muller_spark.operators.text import remove_duplicated_windows

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        remove_duplicated_windows(df, "text", "doc_id", n=0)
    with pytest.raises(ValueError):
        remove_duplicated_windows(df, "text", "doc_id", min_docs=1)


def test_zipf_degenerate_single_token_slope_is_null(spark):
    df = spark.createDataFrame([(0, "solo solo solo")], "doc_id long, text string")
    out = zipf_report(df, "text", k=5, n_fit=5).collect()
    assert len(out) == 1 and out[0]["token"] == "solo"
    assert out[0]["zipf_slope"] is None  # zero ln-rank variance -> NULL


def test_quantize_dequantize_roundtrip_error_bound(spark):
    from muller_spark.operators.embedding import (
        dequantize_embeddings, quantize_embeddings,
    )

    rows = [(0, [1.0, -2.5, 0.3, 127.0]), (1, [0.0, 0.0]), (2, None),
            (3, [-0.001, 0.0005])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = quantize_embeddings(df, "embedding", "vec_id")
    out = {r["id"]: r for r in dequantize_embeddings(q).collect()}

    # error bound: per-component |v - q*s| <= s/2
    for vid, vec in [(0, [1.0, -2.5, 0.3, 127.0]), (3, [-0.001, 0.0005])]:
        s = out[vid]["scale"]
        assert s > 0
        for orig, rec in zip(vec, out[vid]["embedding"]):
            assert abs(orig - rec) <= s / 2 + 1e-12
    # zero vector: scale 0, zeros back, no NaN
    assert out[1]["scale"] == 0.0 and out[1]["embedding"] == [0.0, 0.0]
    # int8 range respected on the max component
    qmap = {r["id"]: r["qvec"] for r in q.collect()}
    assert max(abs(x) for x in qmap[0]) == 127


def test_quantize_embeddings_rejects_bad_bits(spark):
    from muller_spark.operators.embedding import quantize_embeddings

    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        quantize_embeddings(df, "embedding", "vec_id", bits=1)


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    from muller_spark.operators.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs,
    )

    short = "the quick brown fox jumps over the lazy dog"
    long = ("completely unrelated preamble text goes here for a while "
            "and keeps going with more filler words before quoting "
            + short + " and then continues with yet more unrelated "
            "trailing content about different topics entirely")
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    jac = ngram_jaccard_pairs(
        df, "text", "doc_id", threshold=0.5, max_shingle_freq=None
    ).collect()
    assert jac == []  # Jaccard under-scores the embedded quote
    con = ngram_containment_pairs(
        df, "text", "doc_id", threshold=0.8, max_shingle_freq=None
    ).collect()
    assert len(con) == 1
    r = con[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment"] >= 0.8
    # the smaller side is the contained one
    assert min(r["size_a"], r["size_b"]) == r["size_a"]


def test_containment_exact_value(spark):
    from muller_spark.operators.dedup import ngram_containment_pairs

    # doc1 trigram set subset of doc2's -> containment exactly 1.0
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e f")], "doc_id long, text string"
    )
    r = ngram_containment_pairs(
        df, "text", "doc_id", threshold=0.5, max_shingle_freq=None
    ).collect()[0]
    assert r["containment"] == 1.0 and r["inter"] == 2  # 'a b c','b c d'


def test_sample_k_per_group_deterministic_and_sized(spark):
    from muller_spark.operators.sampling import sample_k_per_group

    rows = [(i, f"g{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = sample_k_per_group(df, F.col("doc_id"), "grp", k=4)
    got = {(r["doc_id"], r["grp"]) for r in out.collect()}
    per = {}
    for _, g in got:
        per[g] = per.get(g, 0) + 1
    assert per == {"g0": 4, "g1": 4, "g2": 4}
    # stable under repartition AND under appends of higher-hash rows
    re = {(r["doc_id"], r["grp"]) for r in sample_k_per_group(
        df.repartition(7), F.col("doc_id"), "grp", k=4).collect()}
    assert re == got
    # plan: rank-limit pushdown keeps a WindowGroupLimit
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    with pytest.raises(ValueError):
        sample_k_per_group(df, F.col("doc_id"), "grp", k=0)


def test_sample_k_per_group_small_groups_kept_whole(spark):
    from muller_spark.operators.sampling import sample_k_per_group

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, grp string"
    )
    out = sample_k_per_group(df, F.col("doc_id"), "grp", k=10).collect()
    assert len(out) == 3


def test_group_cume_dist_matches_sql_window_and_handles_nulls(spark):
    from pyspark.sql import Window

    from muller_spark.operators.aggregate import group_cume_dist

    rows = [(0, "a", 10), (1, "a", 20), (2, "a", 20), (3, "a", 30),
            (4, "b", 5), (5, "b", None)]
    df = spark.createDataFrame(rows, "id long, grp string, v int")
    got = {r["id"]: r["cume_dist"]
           for r in group_cume_dist(df, "v", "grp").collect()}
    w = Window.partitionBy("grp").orderBy("v")
    want = {r["id"]: r["cd"] for r in
            df.filter(F.col("v").isNotNull())
            .withColumn("cd", F.cume_dist().over(w)).collect()}
    for i in (0, 1, 2, 3, 4):
        assert got[i] == want[i]
    assert got[0] == 0.25 and got[1] == 0.75 and got[2] == 0.75
    assert got[3] == 1.0 and got[4] == 1.0
    assert got[5] is None  # NULL value -> NULL percentile, not ranked


def test_group_cume_dist_plan_windows_distinct_values_only(spark):
    """The running-sum window runs over the (group, value) AGGREGATE,
    not corpus rows: a hash aggregate must appear below the window."""
    from muller_spark.operators.aggregate import group_cume_dist

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", i % 7) for i in range(100)],
        "id long, grp string, v int",
    )
    out = group_cume_dist(docs, "v", "grp")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    before_window = plan.split("Window", 1)[1]
    assert "Aggregate" in before_window, plan[:2000]


def test_winsorize_clips_and_passes_through(spark):
    from muller_spark.operators.quality import winsorize

    rows = [(i, "g", float(v)) for i, v in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = {r["id"]: r["v_winsorized"] for r in
           winsorize(df, "v", "grp", 0.1, 0.9).collect()}
    import numpy as np
    lo = round(float(np.percentile([1,2,3,4,5,6,7,8,9,100], 10)), 6)
    hi = round(float(np.percentile([1,2,3,4,5,6,7,8,9,100], 90)), 6)
    assert out[0] == lo          # 1 clipped up
    assert out[9] == hi          # 100 clipped down
    for i in range(1, 9):        # in-range values untouched, bit-exact
        assert out[i] == float(i + 1)
    with pytest.raises(ValueError):
        winsorize(df, "v", "grp", 0.9, 0.1)


def test_winsorize_null_values_stay_null(spark):
    from muller_spark.operators.quality import winsorize

    df = spark.createDataFrame(
        [(0, "g", 1.0), (1, "g", 2.0), (2, "g", None)],
        "id long, grp string, v double",
    )
    out = {r["id"]: r["v_winsorized"]
           for r in winsorize(df, "v", "grp").collect()}
    assert out[2] is None


def test_ngram_novelty_hand_computed(spark):
    from muller_spark.operators.dedup import ngram_novelty

    rows = [
        (0, "a b c d e"),          # all shingles first-seen here
        (1, "a b c d e"),          # exact dup of 0 -> novelty 0
        (2, "a b c x y z"),        # 'a b c' seen; 3 new of 4
        (3, None),                 # NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: (r["n_windows"], r["n_novel"], r["novelty"])
           for r in ngram_novelty(df, "text", "doc_id").collect()}
    assert out[0] == (3, 3, 1.0)
    assert out[1] == (3, 0, 0.0)
    assert out[2] == (4, 3, 0.75)
    assert out[3] == (0, 0, None)


def test_hll_distinct_error_and_edges(spark):
    from muller_spark.operators.aggregate import hll_distinct

    n = 5000
    df = spark.createDataFrame(
        [(f"val_{i % 2000}",) for i in range(n)], "v string"
    )
    r = hll_distinct(df, "v", precision=10).collect()[0]
    assert r["m"] == 1024
    # standard error 1.04/sqrt(1024) ~ 3.25%; allow 4 sigma
    assert abs(r["estimate"] - 2000) / 2000 < 0.13
    # empty input -> one row, estimate 0
    r0 = hll_distinct(df.filter("v = 'nope'"), "v").collect()
    assert len(r0) == 1 and r0[0]["estimate"] == 0.0
    # NULLs excluded
    dn = spark.createDataFrame([("a",), (None,), ("b",)], "v string")
    rn = hll_distinct(dn, "v", precision=10).collect()[0]
    assert rn["nonzero_registers"] == 2
    with pytest.raises(ValueError):
        hll_distinct(df, "v", precision=2)


def test_hll_distinct_multiplicity_invariant(spark):
    """Duplicates can't move the sketch: max-per-register is
    idempotent, so 1 copy or 100 copies give identical output."""
    from muller_spark.operators.aggregate import hll_distinct

    one = spark.createDataFrame([(f"x{i}",) for i in range(300)], "v string")
    many = spark.createDataFrame(
        [(f"x{i}",) for i in range(300) for _ in range(7)], "v string"
    )
    a = hll_distinct(one, "v", 8).collect()[0]
    b = hll_distinct(many, "v", 8).collect()[0]
    assert (a["estimate"], a["nonzero_registers"]) == (
        b["estimate"], b["nonzero_registers"])


def test_cms_overestimates_never_under(spark):
    from muller_spark.operators.aggregate import cms_frequency_report

    rows = [(f"t{i % 50}",) for i in range(3000)] + [("rare",)]
    df = spark.createDataFrame(rows, "v string")
    out = cms_frequency_report(df, "v", k=51, width=64, depth=3).collect()
    assert len(out) == 51
    for r in out:
        assert r["cms_estimate"] >= r["exact_cnt"]  # one-sided guarantee
    # a wide sketch at this cardinality is exact
    wide = cms_frequency_report(df, "v", k=51, width=4096, depth=4).collect()
    assert all(r["cms_estimate"] == r["exact_cnt"] for r in wide)


def test_cms_rejects_bad_args(spark):
    import pytest as _pytest

    from muller_spark.operators.aggregate import cms_frequency_report

    df = spark.createDataFrame([("a",)], "v string")
    with _pytest.raises(ValueError):
        cms_frequency_report(df, "v", k=0)
    with _pytest.raises(ValueError):
        cms_frequency_report(df, "v", depth=9)


def test_hll_merge_equals_single_pass(spark):
    """The scale property: per-shard sketches merged by register max
    give EXACTLY the combined-data sketch — no rescan needed."""
    from muller_spark.operators.aggregate import (
        hll_distinct, hll_estimate, hll_merge, hll_registers,
    )

    a = spark.createDataFrame([(f"x{i}",) for i in range(400)], "v string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(200, 700)], "v string"  # overlaps a
    )
    merged = hll_merge(
        hll_registers(a, "v", 9), hll_registers(b, "v", 9)
    )
    got = hll_estimate(merged, 9).collect()[0]
    want = hll_distinct(a.unionByName(b), "v", 9).collect()[0]
    assert (got["estimate"], got["nonzero_registers"]) == (
        want["estimate"], want["nonzero_registers"])
    # merge is idempotent: merging a sketch with itself changes nothing
    twice = hll_estimate(hll_merge(
        hll_registers(a, "v", 9), hll_registers(a, "v", 9)), 9).collect()[0]
    solo = hll_distinct(a, "v", 9).collect()[0]
    assert twice["estimate"] == solo["estimate"]
