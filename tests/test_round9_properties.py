"""Property tests for the round-9 kernels (hypothesis): GIF animation
round-trips, dHash packing, and the pigeonhole block-partition
arithmetic that the media pair stages' COMPLETENESS rests on."""

from __future__ import annotations

import os
import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# GIF multi-frame round-trip: encode → decode must be bit-exact for any
# palette animation (LZW, palette packing, canvas composition all in play)
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(
    n_frames=st.integers(1, 6),
    h=st.integers(1, 23),
    w=st.integers(1, 23),
    n_colors=st.integers(2, 64),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_animation_roundtrip_bit_exact(n_frames, h, w, n_colors, seed):
    from muller_spark.multimodal.gif import (
        decode_gif_frames, encode_gif_frames,
    )

    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (n_colors, 3), dtype=np.uint8)
    frames = [palette[rng.randint(0, n_colors, (h, w))]
              for _ in range(n_frames)]
    raw = encode_gif_frames(frames)
    back = decode_gif_frames(raw)
    assert back is not None and len(back) == n_frames
    for a, b in zip(frames, back):
        assert a.shape == b.shape and (a == b).all()


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 16), w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_single_frame_apis_agree(h, w, seed):
    """decode_gif (frame 1) must equal decode_gif_frames(...)[0] for
    single-frame containers from BOTH encoders."""
    from muller_spark.multimodal.gif import (
        decode_gif, decode_gif_frames, encode_gif, encode_gif_frames,
    )

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (8, 3), dtype=np.uint8)
    frame = pal[rng.randint(0, 8, (h, w))]
    for raw in (encode_gif(frame), encode_gif_frames([frame])):
        a = decode_gif(raw)
        b = decode_gif_frames(raw)[0]
        assert (a == frame).all() and (b == frame).all()


# ---------------------------------------------------------------------------
# dHash packing properties (pure kernel, no Spark)
# ---------------------------------------------------------------------------

@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(9, 40), w=st.integers(9, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_dhash_is_signed_64_and_deterministic(h, w, seed):
    from muller_spark.operators.dedup import _dhash_pixels

    rng = np.random.RandomState(seed)
    pix = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    a = _dhash_pixels(pix, 8)
    assert -(1 << 63) <= a < (1 << 63)
    assert _dhash_pixels(pix.copy(), 8) == a


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    shift=st.integers(1, 40),
)
def test_dhash_invariant_to_clipfree_brightness_shift(seed, shift):
    """dHash is a gradient-sign hash: adding a constant to every pixel
    (without clipping) cannot flip any gradient, so the hash is
    identical — the re-exposure robustness property."""
    from muller_spark.operators.dedup import _dhash_pixels

    rng = np.random.RandomState(seed)
    pix = rng.randint(0, 200 - 40, (20, 20, 3), dtype=np.uint8)
    assert _dhash_pixels(pix, 8) == _dhash_pixels(pix + np.uint8(shift), 8)


# ---------------------------------------------------------------------------
# pigeonhole block partition: the arithmetic behind _hamming_block_pairs
# and the Hamming ledger.  Replayed in pure python so an off-by-one in
# the bounds could never silently break candidate completeness.
# ---------------------------------------------------------------------------

def _blocks_py(value: int, nbits: int, max_hamming: int):
    """Pure-python replay of _hamming_block_rows' (blk, val) extraction:
    unsigned shift + mask over the signed-64 representation."""
    u = value & ((1 << 64) - 1)  # the unsigned view shiftrightunsigned sees
    nblocks = max_hamming + 1
    bounds = [b * nbits // nblocks for b in range(nblocks + 1)]
    out = []
    for b in range(nblocks):
        width = bounds[b + 1] - bounds[b]
        shifted = u >> bounds[b]
        out.append((b, shifted if width >= 64 else shifted & ((1 << width) - 1)))
    return out


@settings(max_examples=200, deadline=None)
@given(
    nbits=st.sampled_from([16, 36, 49, 64]),
    max_hamming=st.integers(0, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_pigeonhole_blocks_partition_and_catch_close_pairs(
    nbits, max_hamming, seed
):
    if max_hamming >= nbits:
        return
    nblocks = max_hamming + 1
    bounds = [b * nbits // nblocks for b in range(nblocks + 1)]
    # the blocks tile [0, nbits) disjointly and completely
    assert bounds[0] == 0 and bounds[-1] == nbits
    assert all(bounds[i] < bounds[i + 1] for i in range(nblocks))

    rng = np.random.RandomState(seed)
    base = int(rng.randint(0, 2**63, dtype=np.int64)) & ((1 << nbits) - 1)
    # flip exactly max_hamming random bits -> a pair AT the radius
    flip_positions = rng.choice(nbits, size=max_hamming, replace=False)
    other = base
    for p in flip_positions:
        other ^= 1 << int(p)

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    a_blocks = dict(_blocks_py(signed(base), nbits, max_hamming))
    b_blocks = dict(_blocks_py(signed(other), nbits, max_hamming))
    # pigeonhole: max_hamming flips cannot touch all max_hamming+1 blocks
    assert any(a_blocks[b] == b_blocks[b] for b in a_blocks), (
        base, other, flip_positions
    )


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), k=st.integers(0, 6))
def test_pigeonhole_block_values_reconstruct_the_hash(seed, k):
    """Concatenating the 64-bit partition's block values (in order)
    must reconstruct the hash — no bit is dropped or double-counted."""
    rng = np.random.RandomState(seed)
    v = int(rng.randint(-(2**63), 2**63 - 1, dtype=np.int64))
    blocks = _blocks_py(v, 64, k)
    bounds = [b * 64 // (k + 1) for b in range(k + 2)]
    acc = 0
    for (b, val) in blocks:
        acc |= val << bounds[b]
    assert acc == (v & ((1 << 64) - 1))
