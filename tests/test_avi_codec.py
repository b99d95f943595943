"""MJPEG-in-AVI codec (multimodal/avi.py): round-trips through the
repo's own baseline JPEG codec, hostile-input contracts shared with
the GIF decoder, the container-sniffing decode_video_frames entry
point, and the Spark video kernels over AVI payloads."""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.multimodal.avi import (  # noqa: E402
    decode_avi_frames,
    decode_video_frames,
    encode_avi_mjpeg,
)


def _blocky_frames(n=5, h=48, w=64):
    """Smooth block-structured frames: JPEG error stays tiny, so
    round-trip assertions can be tight without being bit-exact."""
    frames = []
    for k in range(n):
        f = np.zeros((h, w, 3), dtype=np.uint8)
        f[:, :, 0] = 40 * k + 10
        f[8:24, 8:40, 1] = 200
        f[h // 2:, w // 2:, 2] = 120
        frames.append(f)
    return frames


def test_roundtrip_count_shape_and_pixels():
    frames = _blocky_frames()
    raw = encode_avi_mjpeg(frames, fps=8, quality=95)
    out = decode_avi_frames(raw)
    assert len(out) == len(frames)
    for o, f in zip(out, frames):
        assert o.shape == f.shape and o.dtype == np.uint8
        assert float(np.abs(o.astype(int) - f.astype(int)).mean()) < 2.0


def test_grayscale_frames_come_back_rgb():
    gray = [np.full((16, 16), 30 * k, dtype=np.uint8) for k in range(3)]
    out = decode_avi_frames(encode_avi_mjpeg(gray, quality=95))
    assert len(out) == 3
    for o, g in zip(out, gray):
        assert o.shape == (16, 16, 3)
        assert np.abs(o[:, :, 0].astype(int) - g.astype(int)).max() <= 3
        assert np.array_equal(o[:, :, 0], o[:, :, 1])


def test_max_frames_cap():
    raw = encode_avi_mjpeg(_blocky_frames(6))
    assert len(decode_avi_frames(raw, max_frames=2)) == 2
    assert len(decode_video_frames(raw, max_frames=4)) == 4


def test_every_prefix_never_raises():
    """Task-kill-proof contract: any truncation decodes to None or a
    valid frame prefix, never raises."""
    frames = _blocky_frames(3, h=16, w=16)
    raw = encode_avi_mjpeg(frames)
    for cut in range(len(raw)):
        out = decode_avi_frames(raw[:cut])
        assert out is None or 1 <= len(out) <= 3


def test_hostile_inputs_decode_to_none():
    assert decode_avi_frames(b"") is None
    assert decode_avi_frames(b"RIFF") is None
    assert decode_avi_frames(b"RIFF\x10\x00\x00\x00WAVE" + bytes(16)) is None
    assert decode_avi_frames(b"RIFF\xff\xff\xff\xffAVI " + bytes(64)) is None
    # a movi chunk whose declared size overruns the buffer
    body = b"AVI " + b"LIST" + struct.pack("<I", 2 ** 31) + b"movi" + b"00dc"
    assert decode_avi_frames(b"RIFF" + struct.pack("<I", len(body)) + body) is None


def test_pixel_budget_skips_bomb_frames():
    raw = encode_avi_mjpeg(_blocky_frames(2))
    assert decode_avi_frames(raw, max_pixels=100) is None
    assert decode_avi_frames(raw, max_pixels=48 * 64) is not None


def test_dispatcher_routes_both_containers():
    from muller_spark.multimodal.gif import encode_gif_frames

    pal_frames = [np.full((8, 8, 3), c, dtype=np.uint8) for c in (0, 80, 160)]
    gif = encode_gif_frames(pal_frames)
    avi = encode_avi_mjpeg(pal_frames, quality=95)
    assert len(decode_video_frames(gif)) == 3
    assert len(decode_video_frames(avi)) == 3
    assert decode_video_frames(b"\x89PNG\r\n\x1a\n" + bytes(32)) is None
    assert decode_video_frames(None) is None


def test_header_structure_is_standard():
    """The fixture writer emits the standard RIFF layout players
    expect: avih body 56 bytes, strh 64 (8-byte fourccs + 56-byte
    header), strf 44 (BITMAPINFOHEADER 40 + 'strf'+size read), idx1
    with one 16-byte entry per frame."""
    frames = _blocky_frames(4, h=16, w=16)
    raw = encode_avi_mjpeg(frames)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
    i = raw.index(b"avih")
    assert struct.unpack("<I", raw[i + 4:i + 8])[0] == 56
    # MainAVIHeader: dwTotalFrames at offset 16, dwWidth/dwHeight at 32/36
    assert struct.unpack("<I", raw[i + 8 + 16:i + 8 + 20])[0] == 4
    assert struct.unpack("<I", raw[i + 8 + 32:i + 8 + 36])[0] == 16
    s = raw.index(b"strh")
    assert struct.unpack("<I", raw[s + 4:s + 8])[0] == 56
    assert raw[s + 8:s + 16] == b"vidsMJPG"
    f = raw.index(b"strf")
    assert struct.unpack("<I", raw[f + 4:f + 8])[0] == 40
    assert raw[f + 8 + 16:f + 8 + 20] == b"MJPG"
    x = raw.index(b"idx1")
    assert struct.unpack("<I", raw[x + 4:x + 8])[0] == 16 * 4


def test_cross_codec_dhash_parity():
    """The near-dup contract across containers: the SAME frames
    encoded as lossless GIF and as MJPEG-AVI hash to Hamming-close
    dHashes (the kernels treat containers as interchangeable)."""
    from muller_spark.multimodal.gif import encode_gif_frames
    from muller_spark.operators.dedup import _dhash_pixels

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (24, 3), dtype=np.uint8)
    frames = [pal[np.random.RandomState(70 + i).randint(0, 24, (16, 16))]
              for i in range(4)]
    via_gif = decode_video_frames(encode_gif_frames(frames))
    via_avi = decode_video_frames(encode_avi_mjpeg(frames, quality=95))
    for g, a in zip(via_gif, via_avi):
        d = bin((_dhash_pixels(g, 8) ^ _dhash_pixels(a, 8))
                & ((1 << 64) - 1)).count("1")
        assert d <= 6, d


def test_video_kernels_over_avi(spark):
    """video_frame_hashes / video_near_dups over AVI payloads: the
    trimmed cut is found (the round-9 GIF scenario replayed on the
    round-10 container), NULL ids and corrupt payloads yield no rows
    instead of killing the task."""
    from muller_spark.operators.dedup import video_near_dups, video_frame_hashes

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (24, 3), dtype=np.uint8)
    pool = [pal[np.random.RandomState(90 + i).randint(0, 24, (16, 16))]
            for i in range(10)]
    a = encode_avi_mjpeg(pool, quality=95)
    b = encode_avi_mjpeg(pool[3:9], quality=95)          # trimmed cut
    other = encode_avi_mjpeg(
        [pal[np.random.RandomState(777).randint(0, 24, (16, 16))]],
        quality=95,
    )
    df = spark.createDataFrame(
        [(1, bytearray(a)), (2, bytearray(b)), (3, bytearray(other)),
         (4, bytearray(b"RIFF\x20\x00\x00\x00AVI " + bytes(24))),  # corrupt
         (None, bytearray(a))],                                    # null id
        "clip_id long, data binary",
    )
    hashes = video_frame_hashes(df, "data", "clip_id").collect()
    ids = {r["id"] for r in hashes}
    assert ids == {1, 2, 3}  # corrupt and null-id rows vanish quietly
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in video_near_dups(
            df, "data", "clip_id", max_hamming=6, min_match_fraction=0.9
        ).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["match_fraction"] == 1.0
    assert not any(3 in p or 4 in p for p in pairs)


def test_sample_video_frames_real_avi_path(spark):
    """sample_video_frames decodes AVI payloads for real — no av, no
    fake flag — with checksums equal to the md5 of the decoded RGB."""
    import hashlib

    from muller_spark.multimodal.media import sample_video_frames

    frames = _blocky_frames(7, h=16, w=16)
    raw = encode_avi_mjpeg(frames, quality=95)
    df = spark.createDataFrame([(0, bytearray(raw))],
                               "_row_id long, content binary")
    out = sorted(
        sample_video_frames(df, "content", every_n=2).collect(),
        key=lambda r: r["frame_index"],
    )
    assert [r["frame_index"] for r in out] == [0, 2, 4, 6]
    decoded = decode_avi_frames(raw)
    for r in out:
        want = hashlib.md5(decoded[r["frame_index"]].tobytes()).hexdigest()
        assert r["frame_checksum"] == want


def _have_pil():
    try:
        import PIL  # type: ignore  # noqa: F401

        return True
    except ImportError:
        return False


def test_fast_decoder_tier_contract(spark):
    """Round 10: the fingerprint kernels gained a decoder='fast' PIL
    tier.  In THIS environment PIL is absent, so the contract to pin
    is: fast output is BIT-IDENTICAL to exact (the fallback IS the
    exact path), and invalid decoder names are rejected everywhere."""
    from muller_spark.multimodal.codecs import (
        decode_pixels, decode_pixels_fast, encode_png,
    )
    from muller_spark.operators.dedup import image_dhash, video_frame_hashes

    rng = np.random.RandomState(21)
    img = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    png = encode_png(img)
    assert np.array_equal(decode_pixels_fast(png), decode_pixels(png))
    assert decode_pixels_fast(b"junk") is None

    rows = [(1, bytearray(png)),
            (2, bytearray(encode_avi_mjpeg(_blocky_frames(3, 16, 16))))]
    imgs = spark.createDataFrame(rows[:1], "img_id long, data binary")
    exact = image_dhash(imgs, "data", "img_id").collect()
    fast = image_dhash(imgs, "data", "img_id", decoder="fast").collect()
    assert [r.asDict() for r in exact] == [r.asDict() for r in fast]

    clips = spark.createDataFrame(rows[1:], "clip_id long, data binary")
    ve = {(r["id"], r["frame_index"]): r["dhash"]
          for r in video_frame_hashes(clips, "data", "clip_id").collect()}
    vf = {(r["id"], r["frame_index"]): r["dhash"]
          for r in video_frame_hashes(
              clips, "data", "clip_id", decoder="fast").collect()}
    assert ve == vf and ve

    with pytest.raises(ValueError, match="decoder"):
        image_dhash(imgs, "data", "img_id", decoder="pil")
    with pytest.raises(ValueError, match="decoder"):
        video_frame_hashes(clips, "data", "clip_id", decoder="pil")
    with pytest.raises(ValueError, match="decoder"):
        decode_avi_frames(b"RIFF\x00\x00\x00\x00AVI ", decoder="pil")


@pytest.mark.skipif(not _have_pil(), reason="PIL not installed here")
def test_fast_tier_lossless_bit_identity_with_pil():
    """Runs only where PIL IS installed: lossless formats (PNG) must
    decode bit-identically on both tiers — the property that makes
    fingerprints portable across environments for lossless corpora."""
    from muller_spark.multimodal.codecs import (
        decode_pixels, decode_pixels_fast, encode_png,
    )

    rng = np.random.RandomState(33)
    for shape in ((8, 8, 3), (31, 17, 3)):
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        png = encode_png(img)
        assert np.array_equal(decode_pixels_fast(png), decode_pixels(png))
