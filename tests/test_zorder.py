"""Z-order layout (operators/layout): correctness + real min-max
file-pruning measurements on written parquet."""

from __future__ import annotations

import glob
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.layout import zorder, zvalue_column  # noqa: E402


def _grid_df(spark, n=40_000):
    # two INDEPENDENT uniform keys — the layout-adversarial case for
    # single-key range clustering
    return (
        spark.range(n)
        .select(
            F.col("id"),
            ((F.col("id") * 2654435761) % 1000).alias("x"),
            ((F.col("id") * 40503 + 7) % 1000).alias("y"),
        )
    )


def _file_band_survivors(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo,hi], total files)."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    keep = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if not (fmax < lo or fmin > hi):
            keep += 1
    return keep, len(files)


def test_zorder_preserves_row_multiset(spark):
    df = _grid_df(spark, 5_000)
    out = zorder(df, ["x", "y"], target_partitions=8)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_zorder_prunes_both_keys_range_only_prunes_prefix(spark, tmp_path):
    df = _grid_df(spark)

    zpath = str(tmp_path / "z")
    zorder(df, ["x", "y"], target_partitions=16).write.parquet(zpath)

    rpath = str(tmp_path / "r")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(rpath)
    )

    # prefix-key band: both layouts prune
    zx_keep, zx_tot = _file_band_survivors(zpath, "x", 100, 150)
    rx_keep, rx_tot = _file_band_survivors(rpath, "x", 100, 150)
    assert zx_keep <= zx_tot // 2, f"zorder x-pruning weak: {zx_keep}/{zx_tot}"
    assert rx_keep <= rx_tot // 2

    # second-key band: range layout scans ~everything, zorder prunes
    zy_keep, zy_tot = _file_band_survivors(zpath, "y", 100, 150)
    ry_keep, ry_tot = _file_band_survivors(rpath, "y", 100, 150)
    assert ry_keep >= ry_tot - 1, "range layout unexpectedly y-selective"
    assert zy_keep <= zy_tot // 2, (
        f"zorder y-pruning weak: {zy_keep}/{zy_tot} files survive "
        f"(range layout: {ry_keep}/{ry_tot})"
    )


def test_zorder_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5), (1, 5), (2, 5), (None, 5)], "a int, b int"
    )
    out = zorder(df, ["a", "b"], target_partitions=2)
    from collections import Counter

    got = Counter((r["a"], r["b"]) for r in out.collect())
    assert got == Counter([(None, 5), (1, 5), (2, 5), (None, 5)])


def test_zorder_validation(spark):
    df = _grid_df(spark, 100).withColumn("s", F.lit("t"))
    with pytest.raises(ValueError, match=">= 2 columns"):
        zvalue_column(df, ["x"])
    with pytest.raises(ValueError, match="power of two"):
        zvalue_column(df, ["x", "y"], buckets=60)
    with pytest.raises(ValueError, match="numeric"):
        zvalue_column(df, ["x", "s"])


def test_dataset_optimize_layout_zorder(spark, tmp_path):
    from muller_spark import dataset as ds_mod

    ds = ds_mod.dataset(str(tmp_path / "dz"), spark)
    ds.create_tensor("x", dtype="int64")
    ds.create_tensor("y", dtype="int64")
    ds.extend({"x": [i % 37 for i in range(500)],
               "y": [(i * 17) % 41 for i in range(500)]})
    ds.commit("seed")
    before = sorted((r["x"], r["y"]) for r in ds.df.select("x", "y").collect())
    cid = ds.optimize_layout(["x", "y"], target_partitions=4, zorder=True)
    assert cid
    after = sorted((r["x"], r["y"]) for r in ds.df.select("x", "y").collect())
    assert after == before


def test_zorder_preserves_user_zorder_column(spark):
    from muller_spark.operators.layout import zorder

    # a user column literally named "_zorder" must survive the reorder
    df = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(50)],
        "x long, y long, _zorder double",
    )
    out = zorder(df, ["x", "y"], target_partitions=2)
    assert "_zorder" in out.columns
    got = sorted((r["x"], r["_zorder"]) for r in out.collect())
    assert got == [(i, float(i)) for i in range(50)]
