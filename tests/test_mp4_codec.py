"""MJPEG-in-MP4 codec (multimodal/mp4.py): box-walk round-trips
through the repo's own baseline JPEG codec, the stsc/stco/stsz sample
table reconstruction, hostile-input contracts shared with the AVI/GIF
decoders, and the Spark video kernels over MP4 payloads."""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.multimodal.avi import decode_video_frames  # noqa: E402
from muller_spark.multimodal.mp4 import (  # noqa: E402
    _box,
    _fbox,
    decode_mp4_frames,
    encode_mp4_mjpeg,
    is_mp4,
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
    raw = encode_mp4_mjpeg(frames, quality=95)
    assert is_mp4(raw)
    out = decode_mp4_frames(raw)
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert b.shape == a.shape and b.dtype == np.uint8
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 4.0


def test_grayscale_frames_come_back_rgb():
    g = [np.full((16, 16), 30 * k + 20, dtype=np.uint8) for k in range(3)]
    out = decode_mp4_frames(encode_mp4_mjpeg(g, quality=95))
    assert len(out) == 3
    for f in out:
        assert f.shape == (16, 16, 3)


def test_max_frames_cap():
    raw = encode_mp4_mjpeg(_blocky_frames(6, h=16, w=16))
    assert len(decode_mp4_frames(raw, max_frames=2)) == 2


def test_every_prefix_never_raises():
    raw = encode_mp4_mjpeg(_blocky_frames(3, h=16, w=16))
    for cut in range(0, len(raw), 97):
        r = decode_mp4_frames(raw[:cut])
        assert r is None or len(r) >= 1


def test_hostile_inputs_decode_to_none():
    assert decode_mp4_frames(b"") is None
    assert decode_mp4_frames(b"\x00" * 64) is None
    assert decode_mp4_frames(b"\x00\x00\x00\x0cftypisom") is None
    # ftyp present but moov boxes carry garbage sizes
    junk = _box(b"ftyp", b"isom") + struct.pack(">I", 0xFFFFFFF0) + b"moov"
    assert decode_mp4_frames(junk) is None


def test_pixel_budget_skips_bomb_frames():
    raw = encode_mp4_mjpeg(_blocky_frames(3, h=32, w=32))
    assert decode_mp4_frames(raw, max_pixels=16) is None


def test_dispatcher_routes_all_three_containers():
    from muller_spark.multimodal.avi import encode_avi_mjpeg
    from muller_spark.multimodal.gif import encode_gif_frames

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (8, 3), dtype=np.uint8)
    frames = [pal[rng.randint(0, 8, (8, 8))] for _ in range(2)]
    assert len(decode_video_frames(encode_gif_frames(frames))) == 2
    assert len(decode_video_frames(encode_avi_mjpeg(frames))) == 2
    assert len(decode_video_frames(encode_mp4_mjpeg(frames))) == 2
    assert decode_video_frames(b"\x1a\x45\xdf\xa3" + bytes(32)) is None  # mkv


def test_stsc_multi_sample_chunks_decode():
    """A one-chunk layout (stsc run covering all samples, single stco
    offset) must reconstruct every sample — the encoder writes
    chunk-per-sample, so this pins the run-expansion path real MP4s
    use."""
    from muller_spark.multimodal.jpeg import encode_jpeg

    frames = _blocky_frames(4, h=16, w=16)
    payloads = [encode_jpeg(f, quality=95) for f in frames]
    n = len(payloads)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    mdat = _box(b"mdat", b"".join(payloads))
    base = len(ftyp) + 8
    stsd = _fbox(b"stsd", struct.pack(">I", 1)
                 + _box(b"jpeg", b"\x00" * 6 + struct.pack(">H", 1)
                        + b"\x00" * 70))
    stsc = _fbox(b"stsc", struct.pack(">IIII", 1, 1, n, 1))  # ONE chunk
    stsz = _fbox(b"stsz", struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(p)) for p in payloads))
    stco = _fbox(b"stco", struct.pack(">II", 1, base))
    stbl = _box(b"stbl", stsd + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    out = decode_mp4_frames(ftyp + mdat + moov)
    assert len(out) == 4
    for a, b in zip(frames, out):
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 4.0


def test_co64_offsets_decode():
    """64-bit chunk offsets (co64) resolve like stco."""
    from muller_spark.multimodal.jpeg import encode_jpeg

    frames = _blocky_frames(2, h=16, w=16)
    payloads = [encode_jpeg(f, quality=95) for f in frames]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    mdat = _box(b"mdat", b"".join(payloads))
    base = len(ftyp) + 8
    offs = [base, base + len(payloads[0])]
    stsc = _fbox(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _fbox(b"stsz", struct.pack(">II", 0, 2)
                 + b"".join(struct.pack(">I", len(p)) for p in payloads))
    co64 = _fbox(b"co64", struct.pack(">I", 2)
                 + b"".join(struct.pack(">Q", o) for o in offs))
    stbl = _box(b"stbl", stsc + stsz + co64)
    moov = _box(b"moov", _box(b"trak", _box(b"mdia", _box(b"minf", stbl))))
    out = decode_mp4_frames(ftyp + mdat + moov)
    assert len(out) == 2


def test_cross_codec_dhash_parity():
    """Containers are interchangeable to the near-dup kernels: the
    SAME frames through lossless GIF and through MJPEG-MP4 hash to
    Hamming-close dHashes."""
    from muller_spark.multimodal.gif import encode_gif_frames
    from muller_spark.operators.dedup import _dhash_pixels

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (24, 3), dtype=np.uint8)
    frames = [pal[np.random.RandomState(70 + i).randint(0, 24, (16, 16))]
              for i in range(4)]
    via_gif = decode_video_frames(encode_gif_frames(frames))
    via_mp4 = decode_video_frames(encode_mp4_mjpeg(frames, quality=95))
    for g, m in zip(via_gif, via_mp4):
        d = bin((_dhash_pixels(g, 8) ^ _dhash_pixels(m, 8))
                & ((1 << 64) - 1)).count("1")
        assert d <= 6, d


def test_video_kernels_over_mp4(spark):
    """video_frame_hashes / video_near_dups over MP4 payloads: the
    trimmed cut is found across containers too (clip a as MP4, clip b
    as AVI — the kernels are container-blind), corrupt payloads and
    NULL ids yield no rows instead of killing the task."""
    from muller_spark.multimodal.avi import encode_avi_mjpeg
    from muller_spark.operators.dedup import (
        video_frame_hashes,
        video_near_dups,
    )

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (24, 3), dtype=np.uint8)
    pool = [pal[np.random.RandomState(90 + i).randint(0, 24, (16, 16))]
            for i in range(10)]
    a = encode_mp4_mjpeg(pool, quality=95)
    b = encode_avi_mjpeg(pool[3:9], quality=95)          # trimmed cut
    other = encode_mp4_mjpeg(
        [pal[np.random.RandomState(777).randint(0, 24, (16, 16))]],
        quality=95,
    )
    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(b)), (3, bytearray(other)),
         (4, bytearray(_box(b"ftyp", b"isom") + bytes(24))),   # corrupt
         (None, bytearray(a))],                                # null id
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


def test_sample_video_frames_real_mp4_path(spark):
    import hashlib

    from muller_spark.multimodal.media import sample_video_frames

    frames = _blocky_frames(7, h=16, w=16)
    raw = encode_mp4_mjpeg(frames, quality=95)
    df = spark.createDataFrame([(0, bytearray(raw))],
                               "_row_id long, content binary")
    out = sorted(
        sample_video_frames(df, "content", every_n=2).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [r["frame_index"] for r in out] == [0, 2, 4, 6]
    decoded = decode_mp4_frames(raw)
    for r in out:
        want = hashlib.md5(decoded[r["frame_index"]].tobytes()).hexdigest()
        assert r["frame_checksum"] == want
