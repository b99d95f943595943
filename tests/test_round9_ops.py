"""Round-9 operator tests: per-group HLL."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.operators.aggregate import (  # noqa: E402
    hll_distinct,
    hll_distinct_by,
)


def _frame(spark):
    rows = []
    for g, n in (("a", 300), ("b", 900), ("c", 1)):
        rows += [(g, f"{g}_val_{j}") for j in range(n)]
    return spark.createDataFrame(rows, "grp string, v string")


def test_grouped_estimate_tracks_exact_per_group(spark):
    df = _frame(spark)
    out = {r["grp"]: r for r in hll_distinct_by(df, "v", ["grp"]).collect()}
    exact = {
        r["grp"]: r["n"]
        for r in df.groupBy("grp").agg(
            F.count_distinct("v").alias("n")
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    for g, n in exact.items():
        err = abs(out[g]["estimate"] - n) / n
        # 1.04/sqrt(1024) ~ 3.25%; allow 4 sigma
        assert err < 0.13, (g, out[g]["estimate"], n)
    assert out["c"]["nonzero_registers"] == 1


def test_grouped_matches_global_when_one_group(spark):
    """A single-group frame must reproduce hll_distinct exactly —
    same registers, same fold, same estimate."""
    df = _frame(spark).filter(F.col("grp") == "b")
    grouped = hll_distinct_by(df, "v", ["grp"]).collect()[0]
    glob = hll_distinct(df, "v").collect()[0]
    assert grouped["estimate"] == glob["estimate"]
    assert grouped["nonzero_registers"] == glob["nonzero_registers"]


def test_grouped_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", "x"), ("b", None)], "grp string, v string"
    )
    out = {r["grp"]: r for r in hll_distinct_by(df, "v", ["grp"]).collect()}
    assert set(out) == {"a"}  # b had only NULLs -> no sketch rows
    assert out["a"]["nonzero_registers"] == 1


def test_grouped_validation(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="precision"):
        hll_distinct_by(df, "v", ["grp"], precision=3)
    with pytest.raises(ValueError, match="group_cols"):
        hll_distinct_by(df, "v", [])


# ---------------------------------------------------------------------------
# plan-shape assertions: the round-9 operators must keep their declared
# 100 TB shapes — keyed joins only (no cartesian), no windows on the
# corpus path, bounded aggregate state
# ---------------------------------------------------------------------------

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_neardup_ledger_plan_keyed_joins_only(spark, tmp_path):
    from muller_spark.operators.dedup import (
        init_neardup_ledger, neardup_against_ledger,
    )

    path = str(tmp_path / "ledger")
    seed = spark.createDataFrame(
        [(i, f"seed doc {i} alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    init_neardup_ledger(seed, "text", "doc_id", path)
    batch = spark.createDataFrame(
        [(100, "novel content entirely unseen here")],
        "doc_id long, text string",
    )
    plan = _plan(neardup_against_ledger(
        batch, "text", "doc_id", path, update=False
    ))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_prefix_pairs_plan_no_cartesian_no_window(spark):
    from muller_spark.operators.dedup import prefix_verified_pairs

    df = spark.createDataFrame(
        [(i, f"some shared words plus unique tail {i} x{i} y{i}")
         for i in range(12)],
        "doc_id long, text string",
    )
    plan = _plan(prefix_verified_pairs(df, "text", "doc_id", threshold=0.6))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_hll_by_group_plan_no_window_no_join(spark):
    df = _frame(spark)
    plan = _plan(hll_distinct_by(df, "v", ["grp"]))
    assert "Window" not in plan
    assert "Join" not in plan  # two hash aggregates, nothing else


# ---------------------------------------------------------------------------
# image near-dup: dHash fingerprints + pigeonhole Hamming bucketing
# ---------------------------------------------------------------------------

def _png_rows(spark):
    import numpy as np

    from muller_spark.multimodal.codecs import encode_png

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    noisy = base.copy()
    noisy[::9, ::9] = (noisy[::9, ::9].astype(int) + 10).clip(0, 255)
    other = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(base))),
        (2, bytearray(encode_png(base))),       # byte-identical twin
        (3, bytearray(encode_png(noisy))),      # perceptual near-dup
        (4, bytearray(encode_png(other))),      # unrelated
        (5, bytearray(b"not an image at all")),  # undecodable
    ]
    return spark.createDataFrame(rows, "img_id long, data binary")


def test_image_dhash_stability_and_nulls(spark):
    from muller_spark.operators.dedup import image_dhash

    df = _png_rows(spark)
    out = {r["id"]: r for r in image_dhash(df, "data", "img_id").collect()}
    assert out[1]["dhash"] == out[2]["dhash"]  # identical bytes, same hash
    assert out[1]["height"] == 32 and out[1]["width"] == 32
    assert out[5]["dhash"] is None  # corrupt payload -> NULL, not a crash
    # noise moves FEW bits; unrelated content moves many
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(out[1]["dhash"], out[3]["dhash"]) <= 6
    assert ham(out[1]["dhash"], out[4]["dhash"]) > 10


def test_image_near_dups_finds_twins_not_strangers(spark):
    from muller_spark.operators.dedup import image_near_dups

    df = _png_rows(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dups(df, "data", "img_id", max_hamming=6).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 6
    assert not any(4 in p or 5 in p for p in pairs)


def test_image_near_dups_bucketing_complete_vs_bruteforce(spark):
    """Pigeonhole completeness: the block-bucketed pair set must equal
    the brute-force Hamming-ball pair set over the dHash column."""
    import numpy as np

    from muller_spark.multimodal.codecs import encode_png
    from muller_spark.operators.dedup import image_dhash, image_near_dups

    rng = np.random.RandomState(23)
    rows = []
    base = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    for i in range(12):
        img = base.copy()
        img[: i // 2 + 1, :] = (
            img[: i // 2 + 1, :].astype(int) + 3 * i
        ).clip(0, 255)
        rows.append((i, bytearray(encode_png(img))))
    for i in range(12, 20):
        rows.append((
            i,
            bytearray(encode_png(
                rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
            )),
        ))
    df = spark.createDataFrame(rows, "img_id long, data binary")

    hashes = {
        r["id"]: r["dhash"]
        for r in image_dhash(df, "data", "img_id").collect()
    }
    k = 6
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    truth = {
        (a, b): ham(hashes[a], hashes[b])
        for a in hashes for b in hashes
        if a < b and ham(hashes[a], hashes[b]) <= k
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dups(df, "data", "img_id", max_hamming=k).collect()
    }
    assert got == truth
    assert truth, "fixture must produce at least one near-dup pair"


def test_image_near_dups_plan_no_cartesian(spark):
    from muller_spark.operators.dedup import image_near_dups

    df = _png_rows(spark)
    plan = _plan(image_near_dups(df, "data", "img_id"))
    assert "CartesianProduct" not in plan


def test_image_dhash_validation(spark):
    from muller_spark.operators.dedup import image_dhash, image_near_dups

    df = _png_rows(spark)
    with pytest.raises(ValueError, match="hash_size"):
        image_dhash(df, "data", "img_id", hash_size=12)
    with pytest.raises(ValueError, match="max_hamming"):
        image_near_dups(df, "data", "img_id", max_hamming=64)


# ---------------------------------------------------------------------------
# audio near-dup: spectral fingerprints (Haitsma-Kalker construction)
# ---------------------------------------------------------------------------

def _wav_bytes(samples, rate=8000):
    import io
    import wave

    import numpy as np

    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return bytearray(buf.getvalue())


def _audio_rows(spark):
    import numpy as np

    t = np.arange(8192) / 8000.0
    tone = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1760 * t)
    rng = np.random.RandomState(3)
    noisy = tone + 0.01 * rng.randn(len(t))
    other = 0.6 * np.sin(2 * np.pi * 3100 * t) + 0.3 * rng.randn(len(t))
    rows = [
        (1, _wav_bytes(tone)),
        (2, _wav_bytes(tone)),          # identical
        (3, _wav_bytes(noisy)),         # slightly noisy copy
        (4, _wav_bytes(other)),         # different content
        (5, bytearray(b"RIFFgarbage")),  # undecodable
    ]
    return spark.createDataFrame(rows, "clip_id long, data binary")


def test_audio_fingerprint_stability_and_nulls(spark):
    from muller_spark.operators.dedup import audio_fingerprint

    out = {
        r["id"]: r
        for r in audio_fingerprint(
            _audio_rows(spark), "data", "clip_id"
        ).collect()
    }
    assert out[1]["afp"] == out[2]["afp"]
    assert out[1]["sample_rate"] == 8000 and out[1]["n_frames"] == 8192
    assert out[5]["afp"] is None
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(out[1]["afp"], out[3]["afp"]) <= 6   # noise: few bits
    assert ham(out[1]["afp"], out[4]["afp"]) > 8    # different content


def test_audio_near_dups_pairs(spark):
    from muller_spark.operators.dedup import audio_near_dups

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_dups(
            _audio_rows(spark), "data", "clip_id", max_hamming=6
        ).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_audio_fingerprint_volume_invariance(spark):
    """The fingerprint is built from energy GRADIENT signs, so a
    uniform gain change must not move any bit — the transcode/volume
    robustness claim."""
    import numpy as np

    from muller_spark.operators.dedup import audio_fingerprint

    t = np.arange(8192) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 880 * t)
    df = spark.createDataFrame(
        [(1, _wav_bytes(tone)), (2, _wav_bytes(0.5 * tone))],
        "clip_id long, data binary",
    )
    out = {r["id"]: r["afp"] for r in
           audio_fingerprint(df, "data", "clip_id").collect()}
    assert out[1] == out[2]


def test_audio_fingerprint_validation(spark):
    from muller_spark.operators.dedup import audio_fingerprint

    df = _audio_rows(spark)
    with pytest.raises(ValueError, match="64-bit"):
        audio_fingerprint(df, "data", "clip_id", n_bands=9, max_windows=33)
    with pytest.raises(ValueError, match="n_bands"):
        audio_fingerprint(df, "data", "clip_id", n_bands=1)


def test_audio_short_clip_yields_null(spark):
    import numpy as np

    from muller_spark.operators.dedup import audio_fingerprint

    short = _wav_bytes(np.zeros(1000))  # < 2 windows
    df = spark.createDataFrame([(1, short)], "clip_id long, data binary")
    out = audio_fingerprint(df, "data", "clip_id").collect()[0]
    assert out["afp"] is None and out["sample_rate"] == 8000


# ---------------------------------------------------------------------------
# video (animated GIF) near-dup: real zero-dep frame decode + frame dHash
# ---------------------------------------------------------------------------

def _gif_clip(frames):
    from muller_spark.multimodal.gif import encode_gif_frames

    return bytearray(encode_gif_frames(frames))


def _video_rows(spark):
    import numpy as np

    rng = np.random.RandomState(31)
    pal = rng.randint(0, 256, (32, 3), dtype=np.uint8)

    def frame(seed):
        r = np.random.RandomState(seed)
        return pal[r.randint(0, 32, (24, 24))]

    a_frames = [frame(100 + i) for i in range(10)]
    b_frames = a_frames[3:9]            # trimmed cut of A
    c_frames = [frame(900 + i) for i in range(8)]  # unrelated
    rows = [
        (1, _gif_clip(a_frames)),
        (2, _gif_clip(b_frames)),
        (3, _gif_clip(c_frames)),
        (4, bytearray(b"GIF89a garbage")),  # undecodable
    ]
    return spark.createDataFrame(rows, "clip_id long, data binary")


def test_video_frame_hashes_roundtrip(spark):
    from muller_spark.operators.dedup import video_frame_hashes

    df = _video_rows(spark)
    out = video_frame_hashes(df, "data", "clip_id").collect()
    by_clip = {}
    for r in out:
        by_clip.setdefault(r["id"], {})[r["frame_index"]] = r["dhash"]
    assert len(by_clip.get(1, {})) == 10
    assert len(by_clip.get(2, {})) == 6
    assert 4 not in by_clip  # undecodable -> no rows
    # B's frame k is A's frame k+3, decoded bit-exactly -> same dHash
    for k in range(6):
        assert by_clip[2][k] == by_clip[1][k + 3], k


def test_video_near_dups_trimmed_cut_found(spark):
    from muller_spark.operators.dedup import video_near_dups

    df = _video_rows(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in video_near_dups(
            df, "data", "clip_id", max_hamming=6, min_match_fraction=0.9
        ).collect()
    }
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r["frames_a"] == 10 and r["frames_b"] == 6
    assert r["matched_b"] == 6 and r["match_fraction"] == 1.0
    assert not any(3 in p or 4 in p for p in pairs)


def test_video_sampling_real_gif_path(spark):
    """sample_video_frames decodes GIF payloads for real: frame count
    matches the animation, checksums are the composed-RGB md5 (stable
    across runs), and no `av`/fake flag is needed."""
    import hashlib as _hl

    import numpy as np

    from muller_spark.multimodal.gif import decode_gif_frames
    from muller_spark.multimodal.media import sample_video_frames

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    frames = [pal[np.random.RandomState(50 + i).randint(0, 16, (12, 12))]
              for i in range(7)]
    raw = _gif_clip(frames)
    df = spark.createDataFrame([(0, raw)], "_row_id long, content binary")
    out = sorted(
        sample_video_frames(df, "content", every_n=2).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [r["frame_index"] for r in out] == [0, 2, 4, 6]
    decoded = decode_gif_frames(bytes(raw))
    for r in out:
        want = _hl.md5(decoded[r["frame_index"]].tobytes()).hexdigest()
        assert r["frame_checksum"] == want


def test_video_validation(spark):
    from muller_spark.operators.dedup import (
        video_frame_hashes, video_near_dups,
    )

    df = _video_rows(spark)
    with pytest.raises(ValueError, match="every_n"):
        video_frame_hashes(df, "data", "clip_id", every_n=0)
    with pytest.raises(ValueError, match="min_match_fraction"):
        video_near_dups(df, "data", "clip_id", min_match_fraction=0.0)


def test_video_frame_hashes_rejects_negative_ids(spark):
    from muller_spark.operators.dedup import video_frame_hashes

    df = spark.createDataFrame(
        [(-1, _gif_clip([__import__("numpy").zeros((4, 4, 3), dtype="uint8")]))],
        "clip_id long, data binary",
    )
    with pytest.raises(Exception, match="non-negative|2\\^43"):
        video_frame_hashes(df, "data", "clip_id").collect()
