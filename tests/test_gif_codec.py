"""GIF codec (multimodal/gif.py): exact LZW round-trips, interlace,
palette limits, integration with decode_pixels."""

from __future__ import annotations

import glob
import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.multimodal.codecs import decode_pixels, parse_image_header  # noqa: E402
from muller_spark.multimodal.gif import (  # noqa: E402
    _INTERLACE_PASSES,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def test_lzw_roundtrip_exhausts_dictionary():
    rng = np.random.RandomState(0)
    # long, low-entropy stream: forces width growth and a 4096 reset
    data = bytes(rng.randint(0, 4, size=60000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(data, 2), 2) == data
    data8 = bytes(rng.randint(0, 256, size=20000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode(data8, 8), 8) == data8


def test_gif_roundtrip_exact():
    rng = np.random.RandomState(1)
    # 4-color image -> GIF is lossless
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    idx = rng.randint(0, 4, size=(23, 31))
    arr = pal[idx]
    back = decode_gif(encode_gif(arr))
    assert np.array_equal(back, arr)


def test_gif_gray_index_roundtrip():
    rng = np.random.RandomState(2)
    gray = rng.randint(0, 256, size=(9, 14), dtype=np.uint8)
    back = decode_gif(encode_gif(gray))
    assert np.array_equal(back, np.stack([gray] * 3, axis=2))


def test_gif_interlaced_decode():
    """Hand-build an interlaced GIF (rows stored in the 4-pass order)
    and require the decoder to reassemble the original row order."""
    pal = np.array([[i, i, i] for i in range(16)], dtype=np.uint8)
    idx = np.tile(np.arange(16, dtype=np.uint8)[:, None], (1, 8))  # row y = value y
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, 16, step)]
    stored = idx[order]  # what an interlaced file physically stores
    h, w = 16, 8
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h) + bytes([0x80 | 3, 0, 0])
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x40])  # interlace
    out += bytes([4])
    data = _lzw_encode(stored.tobytes(), 4)
    for lo in range(0, len(data), 255):
        chunk = data[lo:lo + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    got = decode_gif(bytes(out))
    assert np.array_equal(got, pal[idx])


def test_gif_skips_extensions():
    arr = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
    raw = bytearray(encode_gif(arr))
    # splice a graphic-control extension between LSD+GCT and the image
    img_at = raw.find(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    raw = raw[:img_at] + gce + raw[img_at:]
    assert np.array_equal(decode_gif(bytes(raw)), arr)


_REAL_GIFS = sorted(glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif"))[:8]


@pytest.mark.skipif(not _REAL_GIFS, reason="no system GIFs available")
def test_decodes_real_world_gifs():
    """The LZW width convention must match giflib/browsers, not merely
    self-round-trip (the round-2→3 off-by-one made the codec consistent
    only with itself).  Every system GIF must decode to its header
    dimensions."""
    from muller_spark.multimodal.codecs import parse_image_header

    for p in _REAL_GIFS:
        raw = open(p, "rb").read()
        out = decode_gif(raw)
        assert out is not None, p
        h, w, _c, fmt = parse_image_header(raw)
        assert fmt == "gif" and out.shape[:2] == (h, w), (p, out.shape)


def _reference_lzw_decode(data, mcs):
    """Independent textbook GIF-LZW decoder (standard width rule),
    written differently from the production code on purpose — proves
    encoder output is readable by third-party implementations."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = {i: bytes([i]) for i in range(clear)}
    next_code, width = eoi + 1, mcs + 1
    acc = nbits = pos = 0
    out, prev = bytearray(), None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code, width, prev = eoi + 1, mcs + 1, None
            continue
        if code == eoi:
            return bytes(out)
        entry = table.get(code) if code != next_code else prev + prev[:1]
        if entry is None:
            raise AssertionError(f"bad code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def test_encoder_readable_by_reference_decoder():
    rng = np.random.RandomState(9)
    data = bytes(rng.randint(0, 7, size=40000, dtype=np.uint8))
    assert _reference_lzw_decode(_lzw_encode(data, 3), 3) == data


def test_gif_rejects_bad_input():
    with pytest.raises(ValueError, match="256"):
        rng = np.random.RandomState(3)
        encode_gif(rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8))
    assert decode_gif(b"GIF89a\x00") is None
    assert decode_gif(b"nope") is None
    # truncated pixel data
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    raw = encode_gif(arr)
    assert decode_gif(raw[: len(raw) // 2]) is None


def test_decode_pixels_routes_gif():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    arr = pal[np.eye(6, dtype=np.uint8)]
    raw = encode_gif(arr)
    assert parse_image_header(raw) == (6, 6, 3, "gif")
    assert np.array_equal(decode_pixels(raw), arr)


# ---------------------------------------------------------------------------
# round-9 animation semantics: GCE transparency + disposal composition
# (hand-built containers so each branch is driven in isolation)
# ---------------------------------------------------------------------------

def _build_gif(frames, palette, sw=4, sh=4, bg_index=0):
    """Minimal GIF89a builder: frames = list of (left, top, idx_2d,
    disposal, transparent_idx|None) over one global palette."""
    import struct

    import numpy as np

    from muller_spark.multimodal.gif import _lzw_encode

    pal = np.asarray(palette, dtype=np.uint8)
    size_bits = max(1, int(np.ceil(np.log2(max(2, len(pal))))))
    table = np.zeros((1 << size_bits, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    mcs = max(2, size_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out += bytes([0x80 | (size_bits - 1), bg_index, 0])
    out += table.tobytes()
    for left, top, idx, disposal, transparent in frames:
        idx = np.asarray(idx, dtype=np.uint8)
        h, w = idx.shape
        flags = (disposal & 0x07) << 2
        tidx = 0
        if transparent is not None:
            flags |= 0x01
            tidx = transparent
        out += b"\x21\xf9\x04" + bytes([flags, 0, 0, tidx]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + b"\x00"
        out += bytes([mcs])
        data = _lzw_encode(idx.tobytes(), mcs)
        for lo in range(0, len(data), 255):
            chunk = data[lo:lo + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


PAL = [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]]


def test_animation_transparency_shows_prior_canvas():
    import numpy as np

    from muller_spark.multimodal.gif import decode_gif_frames

    f1 = np.full((4, 4), 1)                  # all red
    f2 = np.full((4, 4), 3); f2[0, :] = 2    # transparent idx 3 -> row 0 green, rest shows f1
    raw = _build_gif(
        [(0, 0, f1, 1, None), (0, 0, f2, 1, 3)], PAL
    )
    frames = decode_gif_frames(raw)
    assert len(frames) == 2
    assert (frames[0] == [255, 0, 0]).all()
    assert (frames[1][0] == [0, 255, 0]).all()       # painted row
    assert (frames[1][1:] == [255, 0, 0]).all()      # transparency: f1 shows


def test_animation_subrect_placement():
    import numpy as np

    from muller_spark.multimodal.gif import decode_gif_frames

    f1 = np.full((4, 4), 1)
    patch = np.full((2, 2), 2)
    raw = _build_gif(
        [(0, 0, f1, 1, None), (2, 1, patch, 1, None)], PAL
    )
    frames = decode_gif_frames(raw)
    assert (frames[1][1:3, 2:4] == [0, 255, 0]).all()  # patch at (top=1,left=2)
    assert (frames[1][0, :] == [255, 0, 0]).all()      # rest untouched


def test_animation_disposal_restore_background():
    import numpy as np

    from muller_spark.multimodal.gif import decode_gif_frames

    f1 = np.full((4, 4), 1)
    patch = np.full((2, 2), 2)
    f3 = np.full((1, 1), 3)
    raw = _build_gif(
        [(0, 0, f1, 1, None),
         (1, 1, patch, 2, None),   # disposal 2: restore bg over the rect
         (0, 0, f3, 1, None)],
        PAL, bg_index=0,
    )
    frames = decode_gif_frames(raw)
    assert (frames[1][1:3, 1:3] == [0, 255, 0]).all()  # patch visible in f2
    # in f3 the patch rect is BACKGROUND (palette 0 = black), not red
    assert (frames[2][1:3, 1:3] == [0, 0, 0]).all()
    assert (frames[2][0, 0] == [0, 0, 255]).all()      # new 1x1 paint


def test_animation_disposal_restore_previous():
    import numpy as np

    from muller_spark.multimodal.gif import decode_gif_frames

    f1 = np.full((4, 4), 1)
    patch = np.full((2, 2), 2)
    f3 = np.full((1, 1), 3)
    raw = _build_gif(
        [(0, 0, f1, 1, None),
         (1, 1, patch, 3, None),   # disposal 3: restore pre-frame canvas
         (3, 3, f3, 1, None)],
        PAL,
    )
    frames = decode_gif_frames(raw)
    assert (frames[1][1:3, 1:3] == [0, 255, 0]).all()
    # f3: the patch rect reverted to f1's red, only the 1x1 is new
    assert (frames[2][1:3, 1:3] == [255, 0, 0]).all()
    assert (frames[2][3, 3] == [0, 0, 255]).all()


def test_animation_truncated_tail_yields_valid_prefix():
    import numpy as np

    from muller_spark.multimodal.gif import decode_gif_frames

    f1 = np.full((4, 4), 1)
    f2 = np.full((4, 4), 2)
    raw = bytearray(_build_gif([(0, 0, f1, 1, None), (0, 0, f2, 1, None)], PAL))
    # chop the container mid-frame-2: frame 1 must still decode
    frames = decode_gif_frames(bytes(raw[: len(raw) - 12]))
    assert frames is not None and len(frames) >= 1
    assert (frames[0] == [255, 0, 0]).all()


def test_corrupt_inputs_never_raise():
    """Round-10 hardening: the verified crash repros (stream ending
    right after an extension label; truncated local/global color
    tables) must decode to None or a valid prefix, never raise — one
    corrupt GIF must not kill a Spark task and its retries."""
    import numpy as np

    from muller_spark.multimodal.gif import decode_gif_frames

    f1 = np.full((4, 4), 1)
    good = _build_gif([(0, 0, f1, 1, None)], PAL)

    # (a) ends right AFTER the extension label: raw[sub_start] was OOB
    trunc_ext = good[:13 + 4 * 3] + b"\x21\xf9"
    assert decode_gif_frames(trunc_ext) is None

    # (b) GCE truncated mid-sub-block (size byte says 4, bytes absent)
    trunc_gce = good[:13 + 4 * 3] + b"\x21\xf9\x04\x05"
    assert decode_gif_frames(trunc_gce) is None

    # (c) truncated GLOBAL color table: header promises 4 entries
    trunc_gct = good[:13 + 5]
    assert decode_gif_frames(trunc_gct) is None

    # (d) truncated LOCAL color table: descriptor with local-table flag
    # (size bits 1 -> 4 entries = 12 bytes) but only 2 bytes follow
    local = (good[:13 + 4 * 3]
             + b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x81"
             + b"\xff\xff")
    assert decode_gif_frames(local) is None

    # (e) every prefix of a well-formed 2-frame animation decodes to
    # None or a valid prefix without raising
    f2 = np.full((4, 4), 2)
    anim = _build_gif([(0, 0, f1, 1, None), (0, 0, f2, 1, None)], PAL)
    for cut in range(len(anim)):
        out = decode_gif_frames(anim[:cut])
        assert out is None or len(out) >= 1


def test_decompression_bomb_header_rejected():
    """A 13-byte header claiming 65535x65535 (~12.9 GB canvas) must be
    rejected by the pixel budget BEFORE any allocation."""
    from muller_spark.multimodal.gif import decode_gif_frames

    bomb = b"GIF89a" + struct.pack("<HH", 65535, 65535) + bytes([0, 0, 0])
    assert decode_gif_frames(bomb) is None

    # budget is configurable: a 64x64 screen passes the default but
    # fails a tiny explicit budget
    import numpy as np

    f1 = np.zeros((4, 4), dtype=np.uint8)
    small = _build_gif([(0, 0, f1, 1, None)], PAL, sw=4, sh=4)
    assert decode_gif_frames(small) is not None
    assert decode_gif_frames(small, max_pixels=8) is None
