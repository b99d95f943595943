"""Property-based round-trips for the lossless zero-dep codecs: any
uint8 array survives PNG exactly; any ≤256-color image survives GIF
exactly; BMP/PPM likewise.  (JPEG is lossy by design — its bounded-
error tests live in test_jpeg_codec.py.)"""

from __future__ import annotations

import os
import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muller_spark.multimodal.codecs import (  # noqa: E402
    decode_png,
    decode_pixels,
    encode_bmp,
    encode_png,
)
from muller_spark.multimodal.gif import decode_gif, encode_gif  # noqa: E402


@st.composite
def uint8_image(draw, max_side=24, channels=(1, 2, 3, 4)):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    c = draw(st.sampled_from(channels))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, c), dtype=np.uint8
    )


@settings(max_examples=40, deadline=None)
@given(uint8_image())
def test_png_roundtrip_any_image(arr):
    assert np.array_equal(decode_png(encode_png(arr)), arr)


@settings(max_examples=40, deadline=None)
@given(uint8_image(channels=(3,)))
def test_bmp_roundtrip_any_rgb(arr):
    assert np.array_equal(decode_pixels(encode_bmp(arr)), arr)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.integers(1, 8),
       st.integers(0, 2**31 - 1))
def test_gif_roundtrip_any_palette_image(h, w, ncolors, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(ncolors, 3), dtype=np.uint8)
    pal = np.unique(pal, axis=0)  # encode_gif palettes on distinct colors
    arr = pal[rng.randint(0, len(pal), size=(h, w))]
    assert np.array_equal(decode_gif(encode_gif(arr)), arr)
