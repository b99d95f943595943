"""MJPEG-in-Matroska codec (multimodal/mkv.py): EBML element-walk
round-trips through the repo's baseline JPEG codec, hostile-input
contracts shared with the AVI/MP4/GIF decoders, and the Spark video
kernels over mkv payloads."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.multimodal.avi import decode_video_frames  # noqa: E402
from muller_spark.multimodal.mkv import (  # noqa: E402
    decode_mkv_frames,
    encode_mkv_mjpeg,
    is_mkv,
)


def _blocky_frames(n=5, h=48, w=64):
    frames = []
    for k in range(n):
        f = np.zeros((h, w, 3), dtype=np.uint8)
        f[:, :, 0] = 40 * k + 10
        f[8:24, 8:40, 1] = 200
        f[h // 2:, w // 2:, 2] = 120
        frames.append(f)
    return frames


def test_roundtrip_count_shape_and_pixels():
    frames = _blocky_frames(5)
    raw = encode_mkv_mjpeg(frames, quality=95)
    assert is_mkv(raw)
    out = decode_mkv_frames(raw)
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert b.shape == a.shape and b.dtype == np.uint8
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 4.0


def test_grayscale_frames_come_back_rgb():
    g = [np.full((16, 16), 30 * k + 20, dtype=np.uint8) for k in range(3)]
    out = decode_mkv_frames(encode_mkv_mjpeg(g, quality=95))
    assert len(out) == 3
    for f in out:
        assert f.shape == (16, 16, 3)


def test_max_frames_cap():
    raw = encode_mkv_mjpeg(_blocky_frames(6, h=16, w=16))
    assert len(decode_mkv_frames(raw, max_frames=2)) == 2


def test_every_prefix_never_raises():
    raw = encode_mkv_mjpeg(_blocky_frames(3, h=16, w=16))
    for cut in range(0, len(raw), 89):
        r = decode_mkv_frames(raw[:cut])
        assert r is None or len(r) >= 1


def test_hostile_inputs_decode_to_none():
    assert decode_mkv_frames(b"") is None
    assert decode_mkv_frames(b"\x00" * 64) is None
    # EBML magic followed by malformed vints / truncated elements
    assert decode_mkv_frames(b"\x1a\x45\xdf\xa3" + b"\xff" * 40) is None
    assert decode_mkv_frames(b"\x1a\x45\xdf\xa3\x00\x00\x00") is None


def test_pixel_budget_skips_bomb_frames():
    raw = encode_mkv_mjpeg(_blocky_frames(3, h=32, w=32))
    assert decode_mkv_frames(raw, max_pixels=16) is None


def test_laced_blocks_are_skipped_not_missplit():
    """A SimpleBlock with lacing flag bits set is skipped (MJPEG
    muxers never lace; mis-splitting a laced payload would feed
    garbage to the JPEG decoder)."""
    from muller_spark.multimodal.mkv import (
        _CLUSTER,
        _SEGMENT,
        _SIMPLE_BLOCK,
        _elements,
        _find,
    )

    raw = bytearray(encode_mkv_mjpeg(_blocky_frames(2, h=16, w=16)))
    frozen = bytes(raw)
    # flags byte sits after the 1-byte track vint + 2-byte timecode
    n_flipped = 0
    for seg_lo, seg_hi in _find(frozen, 0, len(frozen), _SEGMENT):
        for c_lo, c_hi in _find(frozen, seg_lo, seg_hi, _CLUSTER):
            for eid, b_lo, b_hi in _elements(frozen, c_lo, c_hi):
                if eid == _SIMPLE_BLOCK:
                    raw[b_lo + 3] |= 0x06
                    n_flipped += 1
    assert n_flipped == 2
    assert decode_mkv_frames(bytes(raw)) is None


def test_dispatcher_routes_all_four_containers():
    from muller_spark.multimodal.avi import encode_avi_mjpeg
    from muller_spark.multimodal.gif import encode_gif_frames
    from muller_spark.multimodal.mp4 import encode_mp4_mjpeg

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (8, 3), dtype=np.uint8)
    frames = [pal[rng.randint(0, 8, (8, 8))] for _ in range(2)]
    assert len(decode_video_frames(encode_gif_frames(frames))) == 2
    assert len(decode_video_frames(encode_avi_mjpeg(frames))) == 2
    assert len(decode_video_frames(encode_mp4_mjpeg(frames))) == 2
    assert len(decode_video_frames(encode_mkv_mjpeg(frames))) == 2


def test_cross_codec_dhash_parity():
    from muller_spark.multimodal.gif import encode_gif_frames
    from muller_spark.operators.dedup import _dhash_pixels

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (24, 3), dtype=np.uint8)
    frames = [pal[np.random.RandomState(70 + i).randint(0, 24, (16, 16))]
              for i in range(4)]
    via_gif = decode_video_frames(encode_gif_frames(frames))
    via_mkv = decode_video_frames(encode_mkv_mjpeg(frames, quality=95))
    for g, m in zip(via_gif, via_mkv):
        d = bin((_dhash_pixels(g, 8) ^ _dhash_pixels(m, 8))
                & ((1 << 64) - 1)).count("1")
        assert d <= 6, d


def test_video_kernels_over_mkv(spark):
    """video_frame_hashes / video_near_dups over mkv payloads: the
    trimmed cut is found across containers (clip a as MKV, clip b as
    MP4 — the kernels are container-blind); corrupt payloads and NULL
    ids yield no rows."""
    from muller_spark.multimodal.mp4 import encode_mp4_mjpeg
    from muller_spark.operators.dedup import (
        video_frame_hashes,
        video_near_dups,
    )

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (24, 3), dtype=np.uint8)
    pool = [pal[np.random.RandomState(90 + i).randint(0, 24, (16, 16))]
            for i in range(10)]
    a = encode_mkv_mjpeg(pool, quality=95)
    b = encode_mp4_mjpeg(pool[3:9], quality=95)          # trimmed cut
    other = encode_mkv_mjpeg(
        [pal[np.random.RandomState(777).randint(0, 24, (16, 16))]],
        quality=95,
    )
    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(b)), (3, bytearray(other)),
         (4, bytearray(b"\x1a\x45\xdf\xa3" + bytes(24))),   # corrupt
         (None, bytearray(a))],                             # null id
        "clip_id long, data binary",
    )
    hashes = video_frame_hashes(df, "data", "clip_id").collect()
    assert {r["id"] for r in hashes} == {1, 2, 3}
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in video_near_dups(
            df, "data", "clip_id", max_hamming=6, min_match_fraction=0.9
        ).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["match_fraction"] == 1.0
    assert not any(3 in p or 4 in p for p in pairs)


def test_sample_video_frames_real_mkv_path(spark):
    import hashlib

    from muller_spark.multimodal.media import sample_video_frames

    frames = _blocky_frames(7, h=16, w=16)
    raw = encode_mkv_mjpeg(frames, quality=95)
    df = spark.createDataFrame([(0, bytearray(raw))],
                               "_row_id long, content binary")
    out = sorted(
        sample_video_frames(df, "content", every_n=2).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [r["frame_index"] for r in out] == [0, 2, 4, 6]
    decoded = decode_mkv_frames(raw)
    for r in out:
        want = hashlib.md5(decoded[r["frame_index"]].tobytes()).hexdigest()
        assert r["frame_checksum"] == want
