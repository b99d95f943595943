"""Transform pipeline, ingest/export connectors, multimodal plumbing,
and streaming extension tests."""

from __future__ import annotations

import json
import os
import sys
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark import dataset as ds_mod  # noqa: E402
from muller_spark.multimodal import (  # noqa: E402
    decode_image_batch,
    extract_image_features,
    sample_video_frames,
)
from muller_spark.sources.readers import from_csv, from_file, read_binary_files  # noqa: E402
from muller_spark.sources.writers import to_arrow, to_json, to_numpy  # noqa: E402
from muller_spark.streaming.windows import (  # noqa: E402
    stream_from_directory,
    windowed_aggregate,
    write_stream_to_dataset,
)
from muller_spark.transform import Pipeline, compute  # noqa: E402


# ---------------------------------------------------------------- transform

# round-13 test tiering (VERDICT r12 #6): end-to-end tier, excluded
# from the driver-window default run; run with -m "slow or not slow"
pytestmark = pytest.mark.slow

def test_compute_one_to_one(spark):
    @compute
    def double_it(sample_in, sample_out, factor=2):
        sample_out.append({"x": sample_in["x"] * factor, "tag": sample_in["tag"].upper()})

    df = spark.createDataFrame([(1, "a"), (2, "b")], "x long, tag string")
    out = double_it(factor=3).apply(df, "x long, tag string").collect()
    got = sorted((r["x"], r["tag"]) for r in out)
    assert got == [(3, "A"), (6, "B")]


def test_compute_one_to_many_and_filter(spark):
    @compute
    def explode_evens(sample_in, sample_out):
        if sample_in["x"] % 2 == 0:
            for i in range(sample_in["x"]):
                sample_out.append({"y": i})
        # odd rows → 0 output rows (filtering)

    df = spark.createDataFrame([(2,), (3,), (4,)], "x long")
    out = explode_evens().apply(df, "y long").collect()
    assert sorted(r["y"] for r in out) == [0, 0, 1, 1, 2, 3]


def test_compute_attribute_style_append(spark):
    @compute
    def attr_style(sample_in, sample_out):
        sample_out.val.append(sample_in["x"] + 1)
        sample_out.name.append(f"row{sample_in['x']}")

    df = spark.createDataFrame([(1,), (5,)], "x long")
    out = attr_style().apply(df, "val long, name string").collect()
    assert sorted((r["val"], r["name"]) for r in out) == [(2, "row1"), (6, "row5")]


def test_compute_eval_into_dataset(spark, tmp_path):
    ds = ds_mod.dataset(str(tmp_path / "out_ds"), spark)
    ds.create_tensor("y", dtype="int64")
    ds.commit("schema")

    @compute
    def plus_ten(sample_in, sample_out):
        sample_out.append({"y": sample_in["x"] + 10})

    src = spark.createDataFrame([(1,), (2,)], "x long")
    plus_ten().eval(src, ds)
    assert sorted(ds.y.numpy().tolist()) == [11, 12]


def test_pipeline_chain(spark):
    @compute
    def stage1(sample_in, sample_out):
        sample_out.append({"x": sample_in["x"] * 2})

    @compute
    def stage2(sample_in, sample_out):
        sample_out.append({"x": sample_in["x"] + 1})

    df = spark.createDataFrame([(1,), (2,)], "x long")
    out = Pipeline([stage1(), stage2()]).apply(df, ["x long", "x long"]).collect()
    assert sorted(r["x"] for r in out) == [3, 5]


# ------------------------------------------------------------------ sources
def test_from_csv_and_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = from_csv(spark, str(p), schema={"a": {"htype": "generic", "dtype": "int64"},
                                         "b": {"htype": "text"}})
    assert df.schema["a"].dataType == T.LongType()
    assert df.count() == 2


def test_from_csv_path_columns_equi_join(spark, tmp_path):
    """Path columns attach blob bytes via a directory-scoped binaryFile
    load and a hash EQUI-join on the normalized absolute path — the
    round-2 advisory shape (collect every path to the driver, then an
    endswith condition => BroadcastNestedLoopJoin) must not come back."""
    media = tmp_path / "media"
    media.mkdir()
    payloads = {}
    for i in range(4):
        payloads[f"f{i}.bin"] = bytes([65 + i]) * (10 + i)
        (media / f"f{i}.bin").write_bytes(payloads[f"f{i}.bin"])
    csv = tmp_path / "in.csv"
    csv.write_text(
        "doc,img\n"
        + "".join(f"d{i},{media}/f{i}.bin\n" for i in range(3))
        # row whose file does not exist in the dir → left-join null
        + f"d9,{media}/missing.bin\n"
    )
    df = from_csv(spark, str(csv), path_columns=["img"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan[:2000]
    assert "Join" in plan
    rows = {r["doc"]: r["img_bytes"] for r in df.collect()}
    assert len(rows) == 4
    for i in range(3):
        assert bytes(rows[f"d{i}"]) == payloads[f"f{i}.bin"]
    assert rows["d9"] is None


def test_from_file_jsonl(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('\n'.join(json.dumps({"a": i, "b": f"t{i}"}) for i in range(3)))
    df = from_file(spark, str(p))
    assert df.count() == 3 and set(df.columns) == {"a", "b"}


def test_read_binary_files_and_multimodal(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"img{i}.bin").write_bytes(bytes([i]) * (100 + i))
    df = read_binary_files(spark, str(tmp_path), pattern="*.bin")
    assert df.count() == 3

    # unrecognized payloads (not a real image format) → NULL metadata
    # on the honest path, deterministic stub with fake=True
    strict = decode_image_batch(df).collect()
    assert all(r["image_meta"]["height"] is None for r in strict)

    decoded = decode_image_batch(df, fake=True).collect()
    assert all(r["image_meta"]["height"] >= 16 for r in decoded)
    # determinism
    again = decode_image_batch(df, fake=True).collect()
    assert {r["image_meta"]["checksum"] for r in decoded} == {
        r["image_meta"]["checksum"] for r in again
    }

    feats = extract_image_features(df).collect()
    assert all(abs(sum(x * x for x in r["features"]) - 1.0) < 1e-5 for r in feats)

    frames = sample_video_frames(df, fake=True, every_n=10).collect()
    assert len(frames) >= 3 and all(r["frame_checksum"] for r in frames)


def test_to_webdataset_shards(spark, tmp_path):
    """Tar shards: every row lands in exactly one shard as paired
    {key}.json + {key}.bin entries, shard assignment is deterministic,
    and the manifest matches what is on disk."""
    import json as _json
    import tarfile

    from muller_spark.sources.writers import to_webdataset

    rows = [(i, f"text {i}", bytes([i % 251]) * (5 + i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, content binary")
    out = str(tmp_path / "wds")
    # tiny Arrow batches: a shard MUST span multiple mapInPandas batches
    # (regression: per-batch tarfile.open("w") truncated prior batches)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        manifest = to_webdataset(
            df, out, key_col="doc_id", num_shards=4, bytes_cols={"content": "bin"}
        ).collect()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert sum(r["n_samples"] for r in manifest) == 100
    assert len({r["shard"] for r in manifest}) == len(manifest)  # no dup shards

    seen = {}
    for m in manifest:
        with tarfile.open(f"{out}/{m['shard']}") as tar:
            names = tar.getnames()
            jsons = {n[:-5] for n in names if n.endswith(".json")}
            bins = {n[:-4] for n in names if n.endswith(".bin")}
            assert jsons == bins  # every sample has both entries
            for key in jsons:
                meta = _json.loads(tar.extractfile(f"{key}.json").read())
                data = tar.extractfile(f"{key}.bin").read()
                seen[int(key)] = (meta["text"], data)
    assert len(seen) == 100
    for i, (text, data) in seen.items():
        assert text == f"text {i}"
        assert data == bytes([i % 251]) * (5 + i % 7)

    # deterministic shard membership across runs
    again = to_webdataset(
        df, str(tmp_path / "wds2"), key_col="doc_id", num_shards=4,
        bytes_cols={"content": "bin"},
    ).collect()
    assert sorted((r["shard"], r["n_samples"]) for r in again) == sorted(
        (r["shard"], r["n_samples"]) for r in manifest
    )


def test_exports(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "x long, t string")
    to_json(df, str(tmp_path / "j"))
    back = spark.read.json(str(tmp_path / "j"))
    assert back.count() == 2
    tbl = to_arrow(df)
    assert tbl.num_rows == 2
    import numpy as np

    assert to_numpy(df, "x").tolist() == [1, 2] or sorted(to_numpy(df, "x").tolist()) == [1, 2]


# ---------------------------------------------------------------- streaming
def test_windowed_aggregate_batch_parity(spark):
    import __spark_entry__ as entry

    # normalizes ts to TIMESTAMP_LTZ whatever generation the parquet is
    # (nanos-as-long or timestamp[us]/NTZ)
    events = entry._events(spark, "/root/testdata/sf0.001")
    out = windowed_aggregate(
        events, "ts", "1 hour", group_cols=("event_type",),
        aggs={"value": "sum", "event_id": "count"},
    )
    rows = out.collect()
    assert rows and {"window_start", "window_end", "event_type", "sum_value", "count_event_id"} <= set(out.columns)
    total = sum(r["count_event_id"] for r in rows)
    assert total == events.count()


def test_expectations_stream_batch_parity_and_live(spark, tmp_path):
    """Windowed violation counts agree between batch evaluation and a
    live file-source micro-batch stream of the same rows."""
    import datetime as dt

    from muller_spark.streaming.windows import expectations_stream

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, 10.0, t0),
        (2, -1.0, t0 + dt.timedelta(seconds=10)),       # violation
        (3, None, t0 + dt.timedelta(seconds=20)),       # violation (NULL)
        (4, 5.0, t0 + dt.timedelta(seconds=70)),        # next window
    ]
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ])
    rules = {"v_positive": F.col("v") > 0}
    batch = spark.createDataFrame(rows, schema)
    got = {
        r["window_start"]: (r["n_rows"], r["viol_v_positive"])
        for r in expectations_stream(batch, rules, "ts").collect()
    }
    assert got == {t0.replace(second=0): (3, 2),
                   t0.replace(second=0) + dt.timedelta(minutes=1): (1, 0)}

    src = tmp_path / "exp_src"
    src.mkdir()
    batch.write.parquet(str(src / "b0.parquet"))
    stream = stream_from_directory(spark, str(src) + "/*", schema)
    out = expectations_stream(stream, rules, "ts")
    q = (
        out.writeStream.format("memory").queryName("exp_stream")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    live = {
        r["window_start"]: (r["n_rows"], r["viol_v_positive"])
        for r in spark.sql("SELECT * FROM exp_stream").collect()
    }
    assert live == got


def test_stream_to_dataset_commits(spark, tmp_path):
    src_dir = tmp_path / "stream_in"
    src_dir.mkdir()
    schema = T.StructType([
        T.StructField("x", T.LongType()), T.StructField("t", T.StringType()),
    ])
    ds = ds_mod.dataset(str(tmp_path / "stream_ds"), spark)
    ds.create_tensor("x", dtype="int64")
    ds.create_tensor("t", htype="text")
    ds.commit("schema")

    spark.createDataFrame([(1, "a"), (2, "b")], schema).write.parquet(
        str(src_dir / "batch0.parquet")
    )
    stream = stream_from_directory(spark, str(src_dir) + "/*", schema)
    assert stream.isStreaming
    q = write_stream_to_dataset(stream, ds, str(tmp_path / "ckpt"), trigger_seconds=1)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if len(ds_mod.load(str(tmp_path / "stream_ds"), spark)) >= 2:
                break
            time.sleep(2)
    finally:
        q.stop()
    reloaded = ds_mod.load(str(tmp_path / "stream_ds"), spark)
    assert sorted(reloaded.x.numpy().tolist()) == [1, 2]
    assert any("stream batch" in s.message for s in reloaded.log_history())


# ------------------------------------------------------- stateful streaming
def test_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization emits the same sessions as
    the batch-window oracle (gap=60s), across micro-batch boundaries."""
    import datetime as dt

    from muller_spark.streaming.stateful import sessionize_batch, sessionize_stream

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ev(key, *offsets):
        return [(key, t0 + dt.timedelta(seconds=o)) for o in offsets]

    # u1: two sessions (0-30s, 200-210s); u2: one session spanning the
    # two input files (events 40s apart < gap arrive in separate batches)
    batch1 = ev("u1", 0, 10, 30) + ev("u2", 5, 20)
    batch2 = ev("u1", 200, 210) + ev("u2", 60)
    flush = [("__flush__", t0 + dt.timedelta(days=2))]

    schema = "key string, ts timestamp"
    src = tmp_path / "stream_src"
    src.mkdir()
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(str(src / "f2"))
    spark.createDataFrame(flush, schema).coalesce(1).write.parquet(str(src / "f3"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    sessions = sessionize_stream(stream, "ts", "key", gap_seconds=60, watermark="0 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        expected = sessionize_batch(
            spark.createDataFrame(batch1 + batch2, schema), "ts", "key", gap_seconds=60
        )
        want = sorted(
            (r["key"], r["session_start"], r["session_end"], r["n_events"])
            for r in expected.collect()
        )
        deadline = time.time() + 120
        got = []
        while time.time() < deadline:
            q.processAllAvailable()
            got = sorted(
                (r["key"], r["session_start"], r["session_end"], r["n_events"])
                for r in spark.sql(
                    "select * from sessions_out where key != '__flush__'"
                ).collect()
            )
            if len(got) >= len(want):
                break
            time.sleep(1)
        assert got == want
    finally:
        q.stop()


def test_extract_audio_features_stub(spark):
    """Audio plumbing: schema, batching, deterministic fake decode; the
    real codec path raises clearly when soundfile is absent."""
    from muller_spark.multimodal import extract_audio_features

    df = spark.createDataFrame(
        [(1, b"aaa"), (2, b"bbbb"), (3, None)], "id long, content binary"
    )
    out = extract_audio_features(df, "content", fake=True)
    rows = {r["id"]: r["audio_meta"] for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    m = rows[1]
    assert m["sample_rate"] in (8000, 16000, 22050, 44100)
    assert m["duration_s"] == round(m["n_samples"] / m["sample_rate"], 6)
    assert 0.0 <= m["rms"] <= 1.0 and len(m["checksum"]) == 32
    # determinism: same bytes → same meta
    again = {r["id"]: r["audio_meta"] for r in
             extract_audio_features(df, "content", fake=True).collect()}
    assert again == rows
    # honest path: bytes that are not PCM WAV decode to NULL metadata,
    # never a guess (real WAV decode is covered in test_codecs.py)
    strict = {r["id"]: r["audio_meta"] for r in
              extract_audio_features(df, "content", fake=False).collect()}
    assert all(m["sample_rate"] is None for m in strict.values())


def test_enrich_stream_matches_batch(spark, tmp_path):
    """Stream-static broadcast enrichment: streaming result equals the
    batch join on the same data."""
    from muller_spark.streaming.windows import enrich_stream

    events = [(1, "a"), (2, "b"), (3, "a"), (4, "c")]
    schema = "event_id long, k string"
    src = tmp_path / "enrich_src"
    src.mkdir()
    spark.createDataFrame(events, schema).coalesce(1).write.parquet(str(src / "f1"))
    dim = spark.createDataFrame([("a", 10), ("b", 20)], "k string, attr long")

    want = sorted(
        (r["event_id"], r["attr"])
        for r in enrich_stream(
            spark.createDataFrame(events, schema), dim, "k"
        ).collect()
    )

    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    out = enrich_stream(stream, dim, "k")
    q = (
        out.writeStream.format("memory").queryName("enriched_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "enrich_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
        got = sorted(
            (r["event_id"], r["attr"])
            for r in spark.sql("select * from enriched_out").collect()
        )
        assert got == want
    finally:
        q.stop()


def test_join_streams_matches_batch(spark, tmp_path):
    """Watermarked stream-stream time-band join equals the batch join
    with the same key + band predicate."""
    import datetime as dt

    from muller_spark.streaming.windows import join_streams

    t0 = dt.datetime(2026, 1, 1, 9, 0, 0)
    clicks = [("u1", t0, "c1"), ("u1", t0 + dt.timedelta(minutes=30), "c2"),
              ("u2", t0 + dt.timedelta(minutes=5), "c3")]
    buys = [("u1", t0 + dt.timedelta(minutes=4), "b1"),
            ("u1", t0 + dt.timedelta(minutes=50), "b2"),
            ("u2", t0 + dt.timedelta(minutes=12), "b3")]
    cs = "user string, cts timestamp, click_id string"
    bs = "user string, bts timestamp, buy_id string"
    src_c, src_b = tmp_path / "clicks", tmp_path / "buys"
    src_c.mkdir(), src_b.mkdir()
    spark.createDataFrame(clicks, cs).coalesce(1).write.parquet(str(src_c / "f"))
    spark.createDataFrame(buys, bs).coalesce(1).write.parquet(str(src_b / "f"))

    want = sorted(
        (r["click_id"], r["buy_id"])
        for r in join_streams(
            spark.createDataFrame(clicks, cs).alias("l"),
            spark.createDataFrame(buys, bs).alias("r"),
            "user", "cts", "bts", within="10 minutes",
        ).collect()
    )
    assert want == [("c1", "b1"), ("c3", "b3")]  # sanity of the fixture

    sc = spark.readStream.schema(cs).parquet(str(src_c) + "/*")
    sb = spark.readStream.schema(bs).parquet(str(src_b) + "/*")
    out = join_streams(sc, sb, "user", "cts", "bts", within="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("ss_join_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        got = sorted(
            (r["click_id"], r["buy_id"])
            for r in spark.sql("select * from ss_join_out").collect()
        )
        assert got == want
    finally:
        q.stop()


def test_join_streams_left_outer_matches_batch(spark, tmp_path):
    """Watermarked stream-stream LEFT OUTER join: unmatched left rows emit
    null right columns once the watermark proves no match can arrive.
    A later flush event (second micro-batch) advances the watermark so
    the outer rows are evicted before the query drains."""
    import datetime as dt

    from muller_spark.streaming.windows import join_streams

    t0 = dt.datetime(2026, 1, 1, 9, 0, 0)
    late = t0 + dt.timedelta(hours=6)  # watermark pusher, matches nothing
    clicks = [("u1", t0, "c1"), ("u1", t0 + dt.timedelta(minutes=30), "c2"),
              ("u2", t0 + dt.timedelta(minutes=5), "c3")]
    buys = [("u1", t0 + dt.timedelta(minutes=4), "b1"),
            ("u1", t0 + dt.timedelta(minutes=50), "b2"),
            ("u2", t0 + dt.timedelta(minutes=12), "b3")]
    flush_c = [("zz", late, "c_flush")]
    flush_b = [("zz", late, "b_flush")]
    cs = "user string, cts timestamp, click_id string"
    bs = "user string, bts timestamp, buy_id string"
    src_c, src_b = tmp_path / "clicks", tmp_path / "buys"
    src_c.mkdir(), src_b.mkdir()
    spark.createDataFrame(clicks, cs).coalesce(1).write.parquet(str(src_c / "f0"))
    spark.createDataFrame(buys, bs).coalesce(1).write.parquet(str(src_b / "f0"))
    time.sleep(1.1)  # later mtime => second micro-batch with maxFilesPerTrigger=1
    spark.createDataFrame(flush_c, cs).coalesce(1).write.parquet(str(src_c / "f1"))
    spark.createDataFrame(flush_b, bs).coalesce(1).write.parquet(str(src_b / "f1"))

    want = sorted(
        (r["click_id"], r["buy_id"])
        for r in join_streams(
            spark.createDataFrame(clicks + flush_c, cs).alias("l"),
            spark.createDataFrame(buys + flush_b, bs).alias("r"),
            "user", "cts", "bts", within="10 minutes", how="left_outer",
        ).collect()
    )
    # c2 has no buy within ±10min -> null; flush rows join each other
    assert want == [("c1", "b1"), ("c2", None), ("c3", "b3"), ("c_flush", "b_flush")]

    sc = (spark.readStream.schema(cs).option("maxFilesPerTrigger", 1)
          .parquet(str(src_c) + "/*"))
    sb = (spark.readStream.schema(bs).option("maxFilesPerTrigger", 1)
          .parquet(str(src_b) + "/*"))
    out = join_streams(sc, sb, "user", "cts", "bts",
                       within="10 minutes", watermark="5 minutes", how="left_outer")
    q = (
        out.writeStream.format("memory").queryName("ss_louter_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ss_louter_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
        got = sorted(
            (r["click_id"], r["buy_id"])
            for r in spark.sql("select * from ss_louter_out").collect()
        )
        assert got == want
    finally:
        q.stop()


def test_join_streams_full_outer_matches_batch(spark, tmp_path):
    """Watermarked stream-stream FULL OUTER join: unmatched rows from
    BOTH sides emit with nulls once the watermark clears their band."""
    import datetime as dt

    from muller_spark.streaming.windows import join_streams

    t0 = dt.datetime(2026, 1, 1, 9, 0, 0)
    late = t0 + dt.timedelta(hours=6)
    clicks = [("u1", t0, "c1"), ("u1", t0 + dt.timedelta(minutes=30), "c2")]
    buys = [("u1", t0 + dt.timedelta(minutes=4), "b1"),
            ("u3", t0 + dt.timedelta(minutes=6), "b_orphan")]
    flush_c = [("zz", late, "c_flush")]
    flush_b = [("zz", late, "b_flush")]
    cs = "user string, cts timestamp, click_id string"
    bs = "user string, bts timestamp, buy_id string"
    src_c, src_b = tmp_path / "clicks", tmp_path / "buys"
    src_c.mkdir(), src_b.mkdir()
    spark.createDataFrame(clicks, cs).coalesce(1).write.parquet(str(src_c / "f0"))
    spark.createDataFrame(buys, bs).coalesce(1).write.parquet(str(src_b / "f0"))
    time.sleep(1.1)
    spark.createDataFrame(flush_c, cs).coalesce(1).write.parquet(str(src_c / "f1"))
    spark.createDataFrame(flush_b, bs).coalesce(1).write.parquet(str(src_b / "f1"))

    key = lambda t: tuple(v or "" for v in t)  # noqa: E731
    want = sorted(
        (
            (r["click_id"], r["buy_id"])
            for r in join_streams(
                spark.createDataFrame(clicks + flush_c, cs).alias("l"),
                spark.createDataFrame(buys + flush_b, bs).alias("r"),
                "user", "cts", "bts", within="10 minutes", how="full_outer",
            ).collect()
        ),
        key=key,
    )
    assert want == [(None, "b_orphan"), ("c1", "b1"), ("c2", None),
                    ("c_flush", "b_flush")]

    sc = (spark.readStream.schema(cs).option("maxFilesPerTrigger", 1)
          .parquet(str(src_c) + "/*"))
    sb = (spark.readStream.schema(bs).option("maxFilesPerTrigger", 1)
          .parquet(str(src_b) + "/*"))
    out = join_streams(sc, sb, "user", "cts", "bts",
                       within="10 minutes", watermark="5 minutes", how="full_outer")
    q = (
        out.writeStream.format("memory").queryName("ss_fouter_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ss_fouter_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
        got = sorted(
            ((r["click_id"], r["buy_id"])
             for r in spark.sql("select * from ss_fouter_out").collect()),
            key=key,
        )
        assert got == want
    finally:
        q.stop()


def test_dedup_stream_drops_duplicates(spark, tmp_path):
    """Streaming exact dedup (dedup_stream): duplicate keys arriving
    across micro-batches are dropped; watermark bounds the state.  Run
    a two-batch file stream with overlap and compare against batch
    dropDuplicates."""
    import datetime as dt

    from muller_spark.streaming.windows import dedup_stream, stream_from_directory

    src = tmp_path / "dd_in"
    src.mkdir()
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ])
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def rows(ids, offset):
        return [(i, t0 + dt.timedelta(seconds=offset + i), f"doc {i}") for i in ids]

    spark.createDataFrame(rows([1, 2, 3, 2], 0), schema).coalesce(1).write.parquet(
        str(src / "b0.parquet")
    )
    spark.createDataFrame(rows([3, 4, 5, 1], 10), schema).coalesce(1).write.parquet(
        str(src / "b1.parquet")
    )

    stream = stream_from_directory(spark, str(src) + "/*", schema,
                                   max_files_per_trigger=1)
    out = dedup_stream(stream, ("doc_id",), ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.format("memory").queryName("dd_out")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT doc_id FROM dd_out").collect()
    ids = sorted(r["doc_id"] for r in got)
    assert ids == [1, 2, 3, 4, 5], ids


def test_to_webdataset_always_emits_num_shards_files(spark, tmp_path):
    """Loaders size their worker pools from shard count: shards no key
    hashed into must still exist as empty tars with manifest rows, and
    no .tmp-* litter remains after a clean run."""
    import tarfile

    from muller_spark.sources.writers import to_webdataset

    df = spark.createDataFrame(
        [(1, "only row")], "doc_id long, text string"
    )
    out = str(tmp_path / "wds_sparse")
    manifest = to_webdataset(df, out, key_col="doc_id", num_shards=6).collect()
    names = sorted(r["shard"] for r in manifest)
    assert names == [f"shard-{i:05d}.tar" for i in range(6)]
    assert sum(r["n_samples"] for r in manifest) == 1
    import os as _os

    on_disk = sorted(f for f in _os.listdir(out) if f.endswith(".tar"))
    assert on_disk == names
    assert not [f for f in _os.listdir(out) if ".tmp-" in f]
    for r in manifest:
        with tarfile.open(_os.path.join(out, r["shard"])) as tar:
            assert len(tar.getmembers()) == (1 if r["n_samples"] else 0)


def test_to_mindrecord_gate_contract(spark):
    """to_mindrecord is permanently gated on the optional mindspore
    package (PARITY §sinks): the MindRecord container is a
    mindspore-internal page-based binary with a SQLite index sidecar
    per shard, and with no independent decoder available a from-scratch
    writer would be unverifiable (a self-round-trip proves nothing
    about conformance).  The gate's error contract is the API: a
    NotImplementedError naming the package and the portable exports."""
    import importlib.util

    import pytest as _pytest

    from muller_spark.sources.writers import to_mindrecord

    if importlib.util.find_spec("mindspore") is not None:
        _pytest.skip("mindspore present: the real writer path applies")
    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with _pytest.raises(NotImplementedError) as exc:
        to_mindrecord(df, "/tmp/never_written.mindrecord")
    msg = str(exc.value)
    assert "mindspore" in msg and "to_parquet" in msg
    import os as _os

    assert not _os.path.exists("/tmp/never_written.mindrecord")


def test_orc_round_trip(spark, tmp_path):
    from muller_spark.sources.writers import from_orc, to_orc

    df = spark.createDataFrame(
        [(1, "a", [1.0, 2.0]), (2, "b", [3.0, 4.0])],
        "id long, t string, v array<double>",
    )
    path = str(tmp_path / "orc")
    to_orc(df, path)
    back = from_orc(spark, path)
    assert sorted((r["id"], r["t"], tuple(r["v"])) for r in back.collect()) == [
        (1, "a", (1.0, 2.0)), (2, "b", (3.0, 4.0)),
    ]


def test_jsonl_shards_bounded(spark, tmp_path):
    from muller_spark.sources.writers import to_jsonl_shards

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "jsonl")
    manifest = to_jsonl_shards(df, path, rows_per_shard=150)
    rows = manifest.collect()
    assert sum(r["rows"] for r in rows) == 1000
    assert max(r["rows"] for r in rows) <= 150
    # loader-side read agrees
    assert spark.read.json(path).count() == 1000


def test_jsonl_shards_empty_frame_yields_empty_manifest(spark, tmp_path):
    """An empty export must return an empty manifest, not crash on
    schema inference over zero data files (the manifest read goes
    through read.text, which needs no schema)."""
    from muller_spark.sources.writers import to_jsonl_shards

    df = spark.range(0).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "jsonl_empty")
    manifest = to_jsonl_shards(df, path, rows_per_shard=100)
    assert manifest.collect() == []
    assert manifest.columns == ["file", "rows"]


def test_eval_checkpointed_resumes_after_interruption(spark, tmp_path):
    """Reference resumability contract (pipeline.py:149 auto-commit
    checkpoints + tests/stress/test_process_interrupt.py): an eval with
    checkpoint_interval that dies mid-run must, on re-run, skip the
    committed slices (no reprocessing, no duplicate rows) and finish
    the rest."""
    from muller_spark import dataset as ds_mod
    from muller_spark.transform import compute

    src = ds_mod.dataset(str(tmp_path / "src"), spark)
    src.create_tensor("x", dtype="int64")
    src.extend({"x": list(range(10))})
    src.commit("seed")

    calls = {"n": 0}

    out1 = ds_mod.dataset(str(tmp_path / "out"), spark)
    out1.create_tensor("y", dtype="int64")
    out1.commit("schema")

    @compute
    def double(sample_in, sample_out):
        sample_out.y = sample_in["x"] * 2

    # sabotage: fail the 3rd slice's commit by poisoning extend_df once
    real_extend = out1.extend_df
    state = {"slices": 0}

    def flaky_extend(df):
        state["slices"] += 1
        if state["slices"] == 3:
            raise RuntimeError("simulated crash mid-eval")
        return real_extend(df)

    out1.extend_df = flaky_extend
    with pytest.raises(RuntimeError, match="simulated crash"):
        double.eval(src, out1, message="dbl", checkpoint_interval=4)
    out1.extend_df = real_extend

    # 10 rows / interval 4 = 3 slices; slices 1-2 committed (8 rows)
    assert len(out1) == 8
    ckpts = [s.message for s in out1.log_history() if "[ckpt" in s.message]
    assert len(ckpts) == 2

    # reopen fresh (as a restarted job would) and re-run: only the
    # missing slice executes, rows complete with no duplicates
    out2 = ds_mod.load(str(tmp_path / "out"), spark)
    double.eval(src, out2, message="dbl", checkpoint_interval=4)
    assert len(out2) == 10
    vals = sorted(r["y"] for r in out2.to_df().collect())
    assert vals == [2 * i for i in range(10)]
    ckpts2 = [s.message for s in out2.log_history() if "[ckpt" in s.message]
    assert len(ckpts2) == 3

    # idempotence: a third run is a no-op
    double.eval(src, out2, message="dbl", checkpoint_interval=4)
    assert len(out2) == 10


def test_extend_df_empty_batch_is_noop(spark, tmp_path):
    """Empty distributed append must be a no-op, not an analysis error
    (F.create_map() with zero entries types as map<void,void>)."""
    from muller_spark import dataset as ds_mod

    ds = ds_mod.dataset(str(tmp_path / "e"), spark)
    ds.create_tensor("x", dtype="int64")
    ds.extend({"x": [1]})
    ds.commit("seed")
    ds.extend_df(spark.createDataFrame([], "x long"))
    assert len(ds) == 1
    ds.commit("empty append")
    assert len(ds) == 1


def test_eval_ignore_errors_drops_bad_rows(spark):
    """Reference skip_ok/ignore_errors parity: a transform that raises
    on some rows drops exactly those rows with ignore_errors=True and
    fails the job without it."""
    from muller_spark.transform import compute

    df = spark.createDataFrame([(i,) for i in range(10)], "x long")

    @compute
    def picky(sample_in, sample_out):
        if sample_in["x"] % 3 == 0:
            raise ValueError("bad record")
        sample_out.append({"y": sample_in["x"] * 2})

    ok = picky.apply(df, "y long", ignore_errors=True).collect()
    assert sorted(r["y"] for r in ok) == [2 * i for i in range(10) if i % 3]

    with pytest.raises(Exception):
        picky.apply(df, "y long").collect()


def test_checkpoint_journal_refuses_different_transform(spark, tmp_path):
    """Resume markers carry the transform identity + interval: a
    DIFFERENT transform (or interval) evaled into the same ds_out under
    the same message must refuse, not silently skip or double-append."""
    from muller_spark import dataset as ds_mod
    from muller_spark.transform import compute

    src = ds_mod.dataset(str(tmp_path / "src"), spark)
    src.create_tensor("x", dtype="int64")
    src.extend({"x": list(range(6))})
    src.commit("seed")
    out = ds_mod.dataset(str(tmp_path / "out"), spark)
    out.create_tensor("y", dtype="int64")
    out.commit("schema")

    @compute
    def double(sample_in, sample_out):
        sample_out.append({"y": sample_in["x"] * 2})

    @compute
    def triple(sample_in, sample_out):
        sample_out.append({"y": sample_in["x"] * 3})

    double.eval(src, out, message="m", checkpoint_interval=3)
    assert len(out) == 6
    with pytest.raises(ValueError, match="DIFFERENT"):
        triple.eval(src, out, message="m", checkpoint_interval=3)
    with pytest.raises(ValueError, match="DIFFERENT"):
        double.eval(src, out, message="m", checkpoint_interval=2)
    # same transform + interval: idempotent no-op
    double.eval(src, out, message="m", checkpoint_interval=3)
    assert len(out) == 6


def test_sample_out_assignment_overwrites(spark):
    """`sample_out.y = v` has Python assignment semantics: a second
    assignment to the same field overwrites it in the current row
    instead of flushing an extra output row."""
    from muller_spark.transform import compute

    df = spark.createDataFrame([(1,), (2,)], "x long")

    @compute
    def fixup(sample_in, sample_out):
        sample_out.y = sample_in["x"]
        sample_out.y = sample_in["x"] * 10  # overwrite, not second row

    rows = fixup.apply(df, "y long").collect()
    assert sorted(r["y"] for r in rows) == [10, 20]


def test_checkpoint_journal_refuses_different_args(spark, tmp_path):
    """Round-7 ADVICE: the resume identity must include the transform's
    BOUND ARGS — the same fn re-evaled with different parameters into
    the same ds_out under the same message must refuse (previously it
    found every marker present and silently produced no output)."""
    from muller_spark import dataset as ds_mod
    from muller_spark.transform import compute

    src = ds_mod.dataset(str(tmp_path / "src"), spark)
    src.create_tensor("x", dtype="int64")
    src.extend({"x": list(range(6))})
    src.commit("seed")
    out = ds_mod.dataset(str(tmp_path / "out"), spark)
    out.create_tensor("y", dtype="int64")
    out.commit("schema")

    @compute
    def scale(sample_in, sample_out, factor):
        sample_out.append({"y": sample_in["x"] * factor})

    scale(2).eval(src, out, message="m", checkpoint_interval=3)
    assert len(out) == 6
    with pytest.raises(ValueError, match="DIFFERENT"):
        scale(3).eval(src, out, message="m", checkpoint_interval=3)
    with pytest.raises(ValueError, match="DIFFERENT"):
        scale(factor=2).eval(src, out, message="m", checkpoint_interval=3)
    # identical args: idempotent no-op
    scale(2).eval(src, out, message="m", checkpoint_interval=3)
    assert len(out) == 6


def test_sample_out_reserved_names_rejected(spark):
    """Round-7 ADVICE: `sample_out.rows = v` (or any '_'-prefixed name)
    must raise instead of silently binding an instance attribute and
    losing the value — the exact footgun the __setattr__ hook exists
    to prevent."""
    from muller_spark.transform import SampleOut, compute

    so = SampleOut()
    with pytest.raises(ValueError, match="reserved"):
        so.rows = [1, 2]
    with pytest.raises(ValueError, match="reserved"):
        so._hidden = 3
    # normal fields still route to the current row
    so.y = 7
    assert so._current == {"y": 7}

    # and end-to-end through apply: the error surfaces, not silent loss
    df = spark.createDataFrame([(1,)], "x long")

    @compute
    def bad(sample_in, sample_out):
        sample_out.rows = sample_in["x"]

    with pytest.raises(Exception, match="reserved"):
        bad.apply(df, "rows long").collect()
