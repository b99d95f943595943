"""Views-per-commit, compaction, sub-range, and misc dataset ops."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark import dataset as ds_mod  # noqa: E402
from muller_spark.operators.joins import asof_join, range_join  # noqa: E402


@pytest.fixture()
def ds(spark, tmp_path):
    d = ds_mod.dataset(str(tmp_path / "vds"), spark)
    d.create_tensor("x", dtype="int64")
    d.create_tensor("t", htype="text")
    d.extend({"x": list(range(10)), "t": [f"doc {i}" for i in range(10)]})
    d.commit("ten rows")
    return d


def test_save_and_load_view(ds):
    view = ds.filter_vectorized([("x", ">=", 5)], [])
    vid = ds.save_view(view, message="x >= 5")
    # mutate the dataset afterwards — the view stays pinned to its commit
    ds.pop(0)
    ds.commit("popped")
    loaded = ds.load_view(vid)
    assert sorted(r["x"] for r in loaded.select("x").collect()) == [5, 6, 7, 8, 9]
    metas = ds.get_views()
    assert len(metas) == 1 and metas[0]["message"] == "x >= 5"
    ds.delete_view(vid)
    assert ds.get_views() == []


def test_optimized_view(ds):
    view = ds.filter_vectorized([("x", "<", 3)], [])
    vid = ds.save_view(view, optimize=True)
    loaded = ds.load_view(vid)
    assert sorted(r["x"] for r in loaded.select("x").collect()) == [0, 1, 2]


def test_rechunk_compacts_dirs(ds):
    for i in range(3):
        ds.extend({"x": [100 + i], "t": [f"extra {i}"]})
        ds.commit(f"append {i}")
    assert len(ds.log.resolve("main").data_dirs) == 4
    ds.rechunk(target_partitions=2)
    snap = ds.log.resolve("main")
    assert len(snap.data_dirs) == 1, "rechunk should fold deltas into one dir"
    assert len(ds) == 13
    assert ds.size_approx() > 0


def test_vacuum_removes_orphaned_rewrites(spark, tmp_path):
    """delete_branch orphans a CoW rewrite lineage; vacuum reclaims it
    while every live-history dir survives."""
    d = ds_mod.dataset(str(tmp_path / "gcds"), spark)
    d.create_tensor("x", dtype="int64")
    d.extend({"x": [1, 2, 3]})
    d.commit("base")
    d.checkout("scratch", create=True)
    d.pop(0)                      # mutation → CoW rewrite on commit
    d.commit("rewrite on scratch")
    scratch_snap = d.log.resolve("scratch")
    d.checkout("main")
    d.delete_branch("scratch")

    report = d.vacuum(dry_run=True)
    assert report["removed"] == scratch_snap.data_dirs
    # dry run deleted nothing
    assert os.path.isdir(os.path.join(d.path, scratch_snap.data_dirs[0]))

    report = d.vacuum(prune_snapshots=True)
    assert report["removed"] == scratch_snap.data_dirs
    assert scratch_snap.commit_id in report["snapshots_removed"]
    assert not os.path.isdir(os.path.join(d.path, scratch_snap.data_dirs[0]))
    # live history intact and readable
    assert sorted(r["x"] for r in d.df.select("x").collect()) == [1, 2, 3]
    assert d.vacuum() == {"removed": [], "kept": report["kept"],
                          "snapshots_removed": []}


def test_vacuum_keeps_view_pinned_commits(spark, tmp_path):
    d = ds_mod.dataset(str(tmp_path / "gcv"), spark)
    d.create_tensor("x", dtype="int64")
    d.extend({"x": [1, 2, 3]})
    d.commit("base")
    d.checkout("scratch", create=True)
    d.pop(0)
    d.commit("rewrite")
    vid = d.save_view(d.filter_vectorized([("x", ">", 1)], []), message="pin")
    d.checkout("main")
    d.delete_branch("scratch")
    # the view pins the scratch rewrite commit → nothing to remove
    assert d.vacuum()["removed"] == []
    assert sorted(r["x"] for r in d.load_view(vid).select("x").collect()) == [2, 3]


def test_optimize_layout_clusters_files(spark, tmp_path):
    """optimize_layout range-clusters files on the key: per-file
    [min, max] ranges must be pairwise disjoint so parquet row-group
    stats prune scans on that column."""
    import glob
    import random

    d = ds_mod.dataset(str(tmp_path / "zds"), spark)
    d.create_tensor("k", dtype="int64")
    d.create_tensor("t", htype="text")
    vals = list(range(400))
    random.Random(7).shuffle(vals)
    d.extend({"k": vals, "t": [f"doc {v}" for v in vals]})
    d.commit("shuffled")
    d.optimize_layout(["k"], target_partitions=4)

    snap = d.log.resolve("main")
    assert len(snap.data_dirs) == 1
    files = sorted(
        glob.glob(os.path.join(d.path, snap.data_dirs[0], "*.parquet"))
    )
    assert len(files) >= 2, files
    ranges = []
    for f in files:
        row = (
            spark.read.parquet(f)
            .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
            .first()
        )
        ranges.append((row["lo"], row["hi"]))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next, ranges
    # data intact
    assert sorted(r["k"] for r in d.df.select("k").collect()) == list(range(400))


def test_sub_ds_and_col_info(ds):
    part = ds.sub_ds(2, 5).select("x").collect()
    assert [r["x"] for r in part] == [2, 3, 4]
    info = ds.get_col_info()
    assert info["x"]["dtype"] == "int64" and info["t"]["htype"] == "text"


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 5), (4, "b", 15)],
        "id long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("a", 10, "r1"), ("a", 15, "r2"), ("b", 99, "r3")],
        "k string, ts long, val string",
    )
    out = asof_join(left, right, on="ts", by=["k"], right_cols=["val"])
    got = {r["id"]: r["val_right"] for r in out.collect()}
    # id=1 ts=10 → r1 (inclusive); id=2 ts=20 → r2; id=3 ts=5 → none; id=4 b ts=15 → none
    assert got == {1: "r1", 2: "r2", 3: None, 4: None}


def test_range_join_basic(spark):
    fact = spark.createDataFrame([(1, 5.0), (2, 25.0), (3, 105.0)], "id long, v double")
    bands = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("hi", 100.0, 200.0)], "band string, lo double, hi double"
    )
    out = range_join(fact, bands, "v")
    got = {r["id"]: r["band"] for r in out.collect()}
    assert got == {1: "lo", 3: "hi"}


def test_statistics_cached_per_commit(ds, tmp_path):
    """statistics() caches per commit in the version log (reference keeps
    stats in version meta); cache hits skip recomputation and survive
    checkout round-trips."""
    import os as _os

    first = ds.statistics().collect()
    cid = ds.log.get_ref("main")
    cache = _os.path.join(ds.log.log_dir, "stats", f"{cid}.json")
    assert _os.path.exists(cache)
    again = ds.statistics().collect()
    assert sorted(map(str, again)) == sorted(map(str, first))
    # uncommitted changes bypass the cache (row_count moves)
    ds.extend({"x": [999], "t": ["late"]})
    dirty = {r["column"]: r["row_count"] for r in ds.statistics().collect()}
    assert dirty["x"] == 11
    ds.reset()


def test_salted_join_matches_plain_join(spark):
    """salted_join must be a drop-in for a plain equi-join, spreading a
    hot key over num_salts partitions."""
    from muller_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        "k string, v long",
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unmatched", "U")], "k string, tag string"
    )
    plain = left.join(right, "k").groupBy("k", "tag").count().collect()
    salted = salted_join(left, right, "k").groupBy("k", "tag").count().collect()
    assert sorted(map(str, salted)) == sorted(map(str, plain))
    # left join keeps unmatched-left semantics too
    lp = left.join(right, "k", "left").count()
    ls = salted_join(left, right, "k", how="left").count()
    assert ls == lp


def test_bucketed_table_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must join without a single
    Exchange in the physical plan (the write-once-shuffle-never story)."""
    import uuid as _uuid

    from muller_spark.sources.writers import to_bucketed_table

    suffix = _uuid.uuid4().hex[:8]
    a_name, b_name = f"bkt_a_{suffix}", f"bkt_b_{suffix}"
    a = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn("va", F.col("k") * 2)
    b = spark.range(0, 1000).withColumnRenamed("id", "k").withColumn("vb", F.col("k") + 1)
    to_bucketed_table(a, a_name, "k", num_buckets=8)
    to_bucketed_table(b, b_name, "k", num_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: broadcast would bypass bucketing
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta, tb = spark.table(a_name), spark.table(b_name)
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"drop table if exists {a_name}")
        spark.sql(f"drop table if exists {b_name}")


def test_rechunk_by_target_size(ds):
    """rechunk(target_mb): partition count derived from on-disk bytes —
    tiny datasets fold to one file, like the reference's 128 MB chunks."""
    import glob
    import os as _os

    ds.rechunk(target_mb=128)
    snap = ds.log.resolve("main")
    assert len(snap.data_dirs) == 1
    files = glob.glob(_os.path.join(ds.path, snap.data_dirs[0], "*.parquet"))
    assert len(files) == 1, files
    assert len(ds) == 10
    with pytest.raises(ValueError, match="not both"):
        ds.rechunk(target_partitions=2, target_mb=1)
