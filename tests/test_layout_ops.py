"""skew_report and shuffle_shards vs pure-Python oracles."""

from __future__ import annotations

import hashlib

from muller_spark.operators.layout import shuffle_shards, skew_report


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_skew_report_counts_shares_and_ties(spark):
    rows = (
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [(None,)] * 2 + [("d",)] * 1
    )
    df = spark.createDataFrame(rows, "k string")
    got = skew_report(df, "k", k=3).orderBy("rank").collect()
    # ties (b=3, c=3) break on key string asc; NULL is a real group
    assert [(r["rank"], r["key"], r["cnt"]) for r in got] == [
        (1, "a", 5), (2, "b", 3), (3, "c", 3)
    ]
    assert [r["share"] for r in got] == [
        round(5 / 14, 6), round(3 / 14, 6), round(3 / 14, 6)
    ]
    assert [r["cum_share"] for r in got] == [
        round(5 / 14, 6), round(8 / 14, 6), round(11 / 14, 6)
    ]


def test_skew_report_null_group_visible(spark):
    df = spark.createDataFrame([(None,)] * 4 + [("x",)], "k string")
    got = skew_report(df, "k", k=2).orderBy("rank").collect()
    assert (got[0]["key"], got[0]["cnt"]) == ("NULL", 4)


def test_skew_report_plan_is_topk_not_full_window(spark):
    """The cumulative window must run over the k survivors, never the
    full key space: the plan's global sort-limit (TakeOrderedAndProject)
    sits BELOW the Window."""
    df = spark.createDataFrame([(str(i % 7),) for i in range(100)], "k string")
    plan = skew_report(df, "k", k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_shuffle_shards_matches_python_and_is_deterministic(spark):
    ids = list(range(200))
    df = spark.createDataFrame([(i, f"t{i}") for i in ids], "doc_id long, text string")
    out = shuffle_shards(df, "doc_id", num_shards=4, seed=0)
    got = {(r["shard"], r["pos"]): r["doc_id"] for r in out.collect()}

    hv = {i: _h60(f"0|{i}") for i in ids}
    expect = {}
    for shard in range(4):
        members = sorted(
            (i for i in ids if hv[i] % 4 == shard), key=lambda i: (hv[i], i)
        )
        for pos, i in enumerate(members):
            expect[(shard, pos)] = i
    assert got == expect

    again = {(r["shard"], r["pos"]): r["doc_id"]
             for r in shuffle_shards(df, "doc_id", 4, seed=0).collect()}
    assert again == got


def test_shuffle_shards_seed_changes_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = [r["doc_id"] for r in
         shuffle_shards(df, "doc_id", 4, seed=0).orderBy("shard", "pos").collect()]
    b = [r["doc_id"] for r in
         shuffle_shards(df, "doc_id", 4, seed=1).orderBy("shard", "pos").collect()]
    assert a != b
    assert sorted(a) == sorted(b) == list(range(100))


def test_shuffle_shards_positions_contiguous(spark):
    df = spark.createDataFrame([(i,) for i in range(137)], "doc_id long")
    out = shuffle_shards(df, "doc_id", 5, seed=3).collect()
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 5
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert sum(len(v) for v in by_shard.values()) == 137
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_shuffle_shards_null_id_fails_loudly(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with _pytest.raises(Exception) as exc:
        shuffle_shards(df, "doc_id", 2, seed=0).collect()
    assert "NULL value in id column" in str(exc.value)


def test_shuffle_shards_rejects_bad_shard_count(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError):
        shuffle_shards(df, "doc_id", 0)


def test_bloom_and_shuffle_temp_columns_survive(spark):
    """User columns literally named like the internal temp names must
    pass through untouched."""
    df = spark.createDataFrame(
        [(1, "a b c d", 7), (2, "x y z w", 8)],
        "doc_id long, text string, __h int",
    )
    out = shuffle_shards(df, "doc_id", 2, seed=0)
    assert "__h" in out.columns and out.filter("__h in (7,8)").count() == 2


def test_mixture_plan_binding_domain_and_edges(spark):
    from muller_spark.operators.sampling import mixture_plan
    import pytest as _pytest

    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 50 + [(None,)] * 5
    df = spark.createDataFrame(rows, "d string")
    # b is the binding constraint: 10 / (1/3) = 30 => total 30
    got = {r["domain"]: r for r in mixture_plan(
        df, "d", {"a": 1.0, "b": 1.0, "c": 1.0}
    ).collect()}
    third = 1.0 / 3.0
    total = 10 / third
    assert got["a"]["available"] == 100 and got["b"]["available"] == 10
    assert got["a"]["sample_rate"] == round(third * total / 100, 6)
    assert got["b"]["sample_rate"] == round(third * total / 10, 6)  # ~1.0
    assert got["b"]["expected_units"] == 10
    # NULL domain excluded entirely
    assert None not in got and "NULL" not in got
    # target domain absent from data pins feasible total to 0, visibly
    got0 = {r["domain"]: r for r in mixture_plan(
        df, "d", {"a": 0.5, "zz": 0.5}
    ).collect()}
    assert got0["zz"]["available"] == 0
    assert all(r["expected_units"] == 0 for r in got0.values())
    # non-target domains appear at rate 0
    assert got0["c"]["sample_rate"] == 0.0
    with _pytest.raises(ValueError):
        mixture_plan(df, "d", {})
    with _pytest.raises(ValueError):
        mixture_plan(df, "d", {"a": 0.0})
    with _pytest.raises(ValueError):
        mixture_plan(df, "d", {"a": -1.0})


def test_write_shuffled_shards_roundtrip(spark, tmp_path):
    from muller_spark.sources.writers import write_shuffled_shards
    from muller_spark.operators.layout import shuffle_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(300)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    manifest = write_shuffled_shards(df, path, "doc_id", num_shards=6, seed=2)
    rows = {r["shard"]: r["rows"] for r in manifest.collect()}
    expect = {
        r["shard"]: r["cnt"]
        for r in shuffle_shards(df, "doc_id", 6, seed=2)
        .groupBy("shard").count().withColumnRenamed("count", "cnt").collect()
    }
    assert rows == expect and sum(rows.values()) == 300

    # each shard file is pos-ordered and the permutation matches the op
    landed = spark.read.parquet(path)
    got = {
        (r["shard"], r["pos"]): r["doc_id"] for r in landed.collect()
    }
    op = {
        (r["shard"], r["pos"]): r["doc_id"]
        for r in shuffle_shards(df, "doc_id", 6, seed=2).collect()
    }
    assert got == op


def test_write_shuffled_shards_rejects_bad_format(spark, tmp_path):
    import pytest as _pytest
    from muller_spark.sources.writers import write_shuffled_shards

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        write_shuffled_shards(df, str(tmp_path / "x"), "doc_id", 2, format="csv")


def test_leakage_safe_split_keeps_clusters_together(spark):
    from muller_spark.operators.sampling import leakage_safe_split
    from muller_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs

    # three near-identical docs + unrelated singles + a NULL-text doc
    dup = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (1, dup),
        (2, dup + " today"),
        (3, "completely different text about spark adaptive execution"),
        (4, dup + " tonight"),
        (5, None),
        (6, "another unrelated document mentioning parquet row groups"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(
        df, "text", "doc_id", {"train": 0.6, "val": 0.2, "test": 0.2}
    )
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}

    pairs = ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.5)
    clusters = dedup_clusters(pairs.select("id_a", "id_b")).collect()
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r["id"])
    dup_cluster = next(m for m in by_cluster.values() if len(m) >= 2)
    assert {1, 2, 4} <= set(dup_cluster)
    # every member of a near-dup cluster shares one split
    assert len({got[i] for i in dup_cluster}) == 1
    # and the shared split equals the singleton split of the root id
    solo = leakage_safe_split(
        df.filter(f"doc_id = {min(dup_cluster)}"), "text", "doc_id",
        {"train": 0.6, "val": 0.2, "test": 0.2},
    ).collect()[0]["split"]
    assert got[min(dup_cluster)] == solo


def test_leakage_safe_split_is_stable_under_corpus_growth(spark):
    """Adding an UNRELATED doc must not move existing docs between
    splits (the property that makes incremental corpus refreshes safe)."""
    from muller_spark.operators.sampling import leakage_safe_split

    base = [(i, f"unique document number {i} with id token x{i}")
            for i in range(1, 30)]
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    df1 = spark.createDataFrame(base, "doc_id long, text string")
    df2 = spark.createDataFrame(
        base + [(99, "a fresh unrelated document about nothing shared")],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["split"]
         for r in leakage_safe_split(df1, "text", "doc_id", w).collect()}
    b = {r["doc_id"]: r["split"]
         for r in leakage_safe_split(df2, "text", "doc_id", w).collect()}
    assert all(b[i] == a[i] for i in a)


def test_leakage_split_temp_column_collision(spark):
    from muller_spark.operators.sampling import leakage_safe_split

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon", 42)],
        "doc_id long, text string, __lss_root_id int",
    )
    out = leakage_safe_split(df, "text", "doc_id", {"train": 1.0})
    row = out.collect()[0]
    assert row["__lss_root_id"] == 42 and row["split"] == "train"


def test_shuffle_shards_rejects_output_column_collision(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 0)], "doc_id long, pos int")
    with _pytest.raises(ValueError, match="pos"):
        shuffle_shards(df, "doc_id", 2)


def test_pack_bins_rejects_non_integer_id(spark):
    import pytest as _pytest
    from muller_spark.operators.packing import pack_bins

    df = spark.createDataFrame([("a", 10)], "doc_id string, n long")
    with _pytest.raises(ValueError, match="integral id"):
        pack_bins(df, "doc_id", "n", 100)


def test_leakage_split_no_hot_shingle_cutoff_by_default(spark):
    """A boilerplate shingle shared by many docs must still produce the
    near-dup pair (the cutoff that ngram_jaccard_pairs defaults to
    would drop it and let a paraphrase leak across splits)."""
    from muller_spark.operators.sampling import leakage_safe_split

    boiler = "subscribe to our newsletter for updates"
    rows = [(i, f"{boiler} item {i}") for i in range(1, 30)]
    # docs 100/101 are near-identical THROUGH the boilerplate shingles
    rows += [(100, boiler + " final"), (101, boiler + " final")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["split"] for r in leakage_safe_split(
        df, "text", "doc_id", {"train": 0.5, "val": 0.5},
        max_shingle_freq=5,  # cutoff low enough to kill the boiler shingles
    ).collect()}
    out_exact = {r["doc_id"]: r["split"] for r in leakage_safe_split(
        df, "text", "doc_id", {"train": 0.5, "val": 0.5},
    ).collect()}
    # exact mode MUST keep the duplicate pair together
    assert out_exact[100] == out_exact[101]
