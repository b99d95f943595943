"""Baseline JPEG codec (multimodal/jpeg.py): lossy round-trips with
bounded error, envelope rejection, integration with decode_pixels."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.multimodal.codecs import decode_pixels, parse_image_header  # noqa: E402
from muller_spark.multimodal.jpeg import decode_jpeg, encode_jpeg  # noqa: E402


def _smooth_rgb(h, w, seed=0):
    """Low-frequency test image — JPEG is built for smooth content, so
    quality-90 round-trip error stays small and assertable."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    r = 128 + 100 * np.sin(xx / 9.0 + seed)
    g = 128 + 100 * np.cos(yy / 7.0 - seed)
    b = 128 + 80 * np.sin((xx + yy) / 11.0)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def test_rgb_roundtrip_bounded_error():
    arr = _smooth_rgb(40, 56)
    raw = encode_jpeg(arr, quality=90)
    back = decode_jpeg(raw)
    assert back.shape == arr.shape
    err = np.abs(back.astype(np.int32) - arr.astype(np.int32))
    assert float(err.mean()) < 3.0 and int(err.max()) <= 40, (
        err.mean(), err.max()
    )


def test_gray_roundtrip_bounded_error():
    yy, xx = np.mgrid[0:24, 0:33].astype(np.float64)
    arr = np.clip(128 + 90 * np.sin(xx / 6.0) * np.cos(yy / 5.0), 0, 255).astype(
        np.uint8
    )
    back = decode_jpeg(encode_jpeg(arr, quality=95))
    assert back.shape == arr.shape and back.ndim == 2
    err = np.abs(back.astype(np.int32) - arr.astype(np.int32))
    assert float(err.mean()) < 3.0, err.mean()


def test_non_multiple_of_8_dimensions():
    arr = _smooth_rgb(13, 19, seed=2)  # forces edge-padded partial blocks
    back = decode_jpeg(encode_jpeg(arr, quality=92))
    assert back.shape == (13, 19, 3)
    err = np.abs(back.astype(np.int32) - arr.astype(np.int32))
    assert float(err.mean()) < 4.0, err.mean()


def test_flat_image_is_near_exact():
    arr = np.full((16, 16, 3), 77, dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(arr, quality=90))
    assert int(np.abs(back.astype(np.int32) - 77).max()) <= 2


def test_header_and_decode_pixels_integration():
    arr = _smooth_rgb(17, 21, seed=1)
    raw = encode_jpeg(arr, quality=90)
    assert parse_image_header(raw) == (17, 21, 3, "jpeg")
    pix = decode_pixels(raw)
    assert pix is not None and pix.shape == (17, 21, 3)
    gray = decode_pixels(encode_jpeg(arr[:, :, 0], quality=90))
    assert gray is not None and gray.shape == (17, 21, 1)  # channel-dim'd


def test_rejects_out_of_envelope():
    arr = _smooth_rgb(16, 16)
    raw = bytearray(encode_jpeg(arr))
    # flip SOF0 to SOF2 (progressive) — must refuse, not misdecode
    idx = raw.find(b"\xff\xc0")
    raw[idx + 1] = 0xC2
    assert decode_jpeg(bytes(raw)) is None
    assert decode_jpeg(b"\xff\xd8not a jpeg") is None
    assert decode_jpeg(b"junk") is None


def test_420_roundtrip_bounded_error():
    """4:2:0 chroma subsampling: luma error stays tight; full-pixel
    error is bounded a bit looser (chroma is quarter-resolution)."""
    arr = _smooth_rgb(34, 46, seed=5)
    raw = encode_jpeg(arr, quality=92, subsampling="420")
    back = decode_jpeg(raw)
    assert back.shape == arr.shape
    err = np.abs(back.astype(np.int32) - arr.astype(np.int32))
    assert float(err.mean()) < 6.0, err.mean()
    # the 420 file must actually be smaller than 444 at equal quality
    assert len(raw) < len(encode_jpeg(arr, quality=92, subsampling="444"))


def test_420_odd_dimensions():
    arr = _smooth_rgb(17, 23, seed=6)  # odd dims force chroma edge pad
    back = decode_jpeg(encode_jpeg(arr, quality=92, subsampling="420"))
    assert back.shape == (17, 23, 3)
    err = np.abs(back.astype(np.int32) - arr.astype(np.int32))
    assert float(err.mean()) < 7.0, err.mean()


def test_422_style_sampling_decodes():
    """Hand-flip the SOF sampling byte exercise path: encode 4:2:0,
    then decode — the generic MCU walker handles it; also reject a
    bogus sampling factor of 0."""
    arr = _smooth_rgb(16, 16)
    raw = bytearray(encode_jpeg(arr, subsampling="420"))
    idx = raw.find(b"\xff\xc0")
    # component 1 sampling byte sits at SOF payload offset 7
    assert raw[idx + 2 + 2 + 7] == 0x22
    raw[idx + 2 + 2 + 7] = 0x02  # h=0 → invalid
    assert decode_jpeg(bytes(raw)) is None


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_restart_interval_roundtrip(subsampling):
    """DRI/RSTn streams (camera-style): markers every 2 MCUs must
    decode identically to the marker-free stream."""
    arr = _smooth_rgb(40, 40, seed=8)
    plain = decode_jpeg(encode_jpeg(arr, quality=90, subsampling=subsampling))
    with_rst = encode_jpeg(
        arr, quality=90, subsampling=subsampling, restart_interval=2
    )
    assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst
    rst = decode_jpeg(with_rst)
    assert np.array_equal(rst, plain)
    err = np.abs(rst.astype(np.int32) - arr.astype(np.int32))
    assert float(err.mean()) < 6.0, err.mean()


_REAL_JPEGS = [
    p for p in [
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/flower-of-life.jpg",
        "/usr/lib/google-cloud-sdk/platform/google_appengine/google/appengine/tools/java/jetty12/jetty-home/modules/demo.d/root/images/webtide_logo.jpg",
    ]
    if os.path.exists(p)
]


@pytest.mark.skipif(not _REAL_JPEGS, reason="no system JPEGs available")
def test_decodes_real_world_baseline_jpegs():
    """Files produced by real encoders (Annex-K Huffman tables, real
    quant matrices) must decode to their header dimensions — the codec
    must interoperate, not merely self-round-trip."""
    for p in _REAL_JPEGS:
        raw = open(p, "rb").read()
        h, w, _c, fmt = parse_image_header(raw)
        out = decode_jpeg(raw)
        assert fmt == "jpeg" and out is not None, p
        assert out.shape[:2] == (h, w), (p, out.shape)


@pytest.mark.parametrize("quality", [70, 85, 98])
def test_quality_monotonicity(quality):
    """Higher quality must not increase reconstruction error."""
    arr = _smooth_rgb(32, 32, seed=3)
    err = {}
    for q in (quality, 100):
        back = decode_jpeg(encode_jpeg(arr, quality=q))
        err[q] = float(
            np.abs(back.astype(np.int32) - arr.astype(np.int32)).mean()
        )
    assert err[100] <= err[quality] + 0.25, err


def test_fill_bytes_before_markers_are_consumed():
    """Runs of 0xFF fill bytes before a marker are legal padding (ITU
    T.81 B.1.1.2); the segment loop must consume them one at a time
    instead of misreading a bogus length from the padding."""
    arr = _smooth_rgb(16, 16)
    raw = encode_jpeg(arr, quality=90)
    padded = raw[:2] + b"\xff\xff\xff" + raw[2:]
    got = decode_jpeg(padded)
    want = decode_jpeg(raw)
    assert got is not None and np.array_equal(got, want)
