"""GIF codec, pure stdlib + numpy (no PIL).

Decodes the first frame of a GIF87a/89a stream: logical-screen /
image-descriptor parsing, global and local color tables, full LZW
decompression (LSB-first packing, width growth, clear/EOI, 4096-entry
cap) and Adam-style 4-pass interlace reordering.  Encodes a palette
image back out with real LZW compression, so round-trips are exact
(GIF is lossless for ≤256-color content).

Animation decodes too (round 9): ``decode_gif_frames`` composes every
frame on the logical-screen canvas with GCE transparency + disposal
0/1/2/3 semantics, and ``encode_gif_frames`` writes multi-frame GIF89a
(shared global palette, per-frame GCE, Netscape loop) — GIF is the one
animation container decodable with zero dependencies, so the
video-frame sampling and video near-dup pipelines have a REAL path
while other containers stay gated behind ``av``.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- LZW

def _lzw_decode(data: bytes, mcs: int):
    """Decode GIF LZW (LSB-first) to a bytes object of palette indices,
    or None on a corrupt stream."""
    clear = 1 << mcs
    eoi = clear + 1
    acc = 0
    nbits = 0
    pos = 0
    width = mcs + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # missing EOI: tolerate, common in wild
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        # standard (giflib) convention: widen when the next code the
        # encoder could emit — the KwKwK case, value == len(table) —
        # would no longer fit the current width
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry


class _LSBWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    """Real LZW compression, symmetric with ``_lzw_decode``'s width
    growth (grow after the table reaches 2^width; reset at 4096)."""
    clear = 1 << mcs
    eoi = clear + 1
    writer = _LSBWriter()

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, mcs + 1

    table, next_code, width = fresh()
    writer.write(clear, width)
    buf = b""
    for px in indices:
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        writer.write(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # widen LATE (only once an assigned code value no longer
            # fits): the decoder reconstructs each entry one code after
            # the encoder assigns it, so it widens at len(table) ==
            # 1<<width — these two rules land on the same bit position.
            # Widening at next_code == 1<<width (one step early) makes
            # streams that only this codec can read; verified against
            # real-world GIFs in test_gif_codec.
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            writer.write(clear, width)
            table, next_code, width = fresh()
        buf = bytes([px])
    if buf:
        writer.write(table[buf], width)
    writer.write(eoi, width)
    return writer.flush()


# ---------------------------------------------------------------- decode

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(raw: bytes):
    """numpy (h, w, 3) uint8 RGB of the FIRST frame, or None."""
    frames = decode_gif_frames(raw, max_frames=1)
    return frames[0] if frames else None


def decode_gif_frames(
    raw: bytes,
    max_frames: "int | None" = None,
    max_pixels: int = 1 << 26,
):
    """Full GIF87a/89a animation decode: list of numpy (sh, sw, 3)
    uint8 RGB frames COMPOSED on the logical-screen canvas (image
    descriptors may cover sub-rectangles), or None if the container is
    unparseable.  Honors per-frame Graphic Control Extensions:
    transparency index (transparent pixels keep the underlying canvas)
    and disposal methods 0/1 (leave), 2 (restore background — treated
    as the background palette color over the frame rect), 3 (restore
    the pre-frame canvas).  Local palettes and interlacing are
    per-frame, as in the single-frame path.

    This is the zero-dependency video-frame source: GIF is the one
    animation container decodable without ``av``/``PIL``, so
    frame-sampling and video near-dup pipelines have a REAL path (the
    reference gates video behind installed codecs the same way).
    A corrupt trailing frame truncates the list rather than failing
    the clip: partial animations decode to their valid prefix.

    ``max_pixels`` caps the logical-screen canvas (sw·sh) BEFORE any
    allocation: a 13-byte header can claim 65535×65535 (a ~12.9 GB
    canvas — the decompression-bomb shape), so implausible screens
    decode to None instead of allocating.  The default (2²⁶ ≈ 67 M
    pixels, a ~200 MB RGB canvas) is far above any real GIF."""
    if raw[:6] not in (b"GIF87a", b"GIF89a") or len(raw) < 13:
        return None
    sw, sh = struct.unpack("<HH", raw[6:10])
    packed = raw[10]
    bg_index = raw[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(raw):  # truncated global color table
            return None
        gct = np.frombuffer(raw[pos:pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    if sw == 0 or sh == 0 or sw * sh > max_pixels:
        return None

    if gct is not None and bg_index < len(gct):
        canvas = np.tile(gct[bg_index], (sh, sw, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list = []
    transparent: "int | None" = None
    disposal = 0

    while pos < len(raw):
        block = raw[pos]
        if block == 0x21:  # extension
            if pos + 2 > len(raw):
                break
            label = raw[pos + 1]
            pos += 2
            sub_start = pos
            while pos < len(raw) and raw[pos] != 0:
                pos += 1 + raw[pos]
            # GCE needs 5 readable bytes (size, flags, 2×delay, index):
            # a stream truncated right after the label must not index
            # past the end (valid-prefix contract, not a task kill)
            if (label == 0xF9 and sub_start + 4 < len(raw)
                    and raw[sub_start] >= 4):
                flags = raw[sub_start + 1]
                disposal = (flags >> 2) & 0x07
                transparent = raw[sub_start + 4] if flags & 0x01 else None
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(raw):
                break
            left, top, w, h = struct.unpack("<HHHH", raw[pos + 1:pos + 9])
            ipacked = raw[pos + 9]
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                if pos + 3 * n > len(raw):  # truncated local color table
                    break
                ct = np.frombuffer(
                    raw[pos:pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if (ct is None or w == 0 or h == 0
                    or left + w > sw or top + h > sh or pos >= len(raw)):
                break
            mcs = raw[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                break
            chunks = []
            while pos < len(raw) and raw[pos] != 0:
                size = raw[pos]
                chunks.append(raw[pos + 1:pos + 1 + size])
                pos += 1 + size
            pos += 1  # sub-block terminator
            indices = _lzw_decode(b"".join(chunks), mcs)
            if indices is None or len(indices) < w * h:
                break
            idx = np.frombuffer(indices[: w * h], dtype=np.uint8).reshape(h, w)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                order = [
                    y for start, step in _INTERLACE_PASSES
                    for y in range(start, h, step)
                ]
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            if idx.max() >= len(ct):
                break
            prev = canvas.copy() if disposal == 3 else None
            rect = canvas[top:top + h, left:left + w]
            pixels = ct[idx]
            if transparent is not None:
                mask = idx != transparent
                rect[mask] = pixels[mask]
            else:
                rect[:] = pixels
            frames.append(canvas.copy())
            if max_frames is not None and len(frames) >= max_frames:
                return frames
            # disposal AFTER the frame is shown, for the next one
            if disposal == 2:
                if gct is not None and bg_index < len(gct):
                    canvas[top:top + h, left:left + w] = gct[bg_index]
                else:
                    canvas[top:top + h, left:left + w] = 0
            elif disposal == 3 and prev is not None:
                canvas = prev
            transparent = None
            disposal = 0
        elif block == 0x3B:  # trailer
            break
        else:
            break
    return frames if frames else None


def encode_gif(arr) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array with ≤256 distinct colors
    (or an (h, w) palette-index array + implicit gray palette) as a
    non-interlaced GIF89a.  Raises ValueError beyond 256 colors — GIF
    is a palette format; quantization is a modeling choice left to the
    caller."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        idx = arr
    else:
        h_, w_, _ = arr.shape
        flat = arr.reshape(-1, 3)
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError(
                f"{len(palette)} distinct colors; GIF holds at most 256"
            )
        idx = inverse.astype(np.uint8).reshape(h_, w_)
    h, w = idx.shape
    n_pal = max(2, int(palette[: max(1, idx.max() + 1)].shape[0]))
    # color table size is a power of two >= palette size
    size_bits = max(1, int(np.ceil(np.log2(n_pal))))
    table = np.zeros((1 << size_bits, 3), dtype=np.uint8)
    table[: len(palette[: 1 << size_bits])] = palette[: 1 << size_bits]

    mcs = max(2, size_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (size_bits - 1), 0, 0])
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([mcs])
    data = _lzw_encode(idx.tobytes(), mcs)
    for lo in range(0, len(data), 255):
        chunk = data[lo:lo + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_frames(frames, delay_cs: int = 10) -> bytes:
    """Encode a sequence of (h, w, 3) uint8 RGB arrays (all the same
    shape, ≤256 distinct colors ACROSS the sequence — one shared
    global palette) as an animated GIF89a with a Graphic Control
    Extension per frame (``delay_cs`` centiseconds) and the Netscape
    loop extension.  The multi-frame twin of :func:`encode_gif`,
    kept deliberately simple: full-canvas opaque frames, disposal 1
    (leave in place) — the test/fixture writer for the zero-dep video
    path, not a production optimizer."""
    if not frames:
        raise ValueError("need at least one frame")
    stack = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = stack[0].shape
    if any(f.shape != (h, w, 3) for f in stack):
        raise ValueError("all frames must share one (h, w, 3) shape")
    flat = np.concatenate([f.reshape(-1, 3) for f in stack])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors across frames; GIF holds 256"
        )
    size_bits = max(1, int(np.ceil(np.log2(max(2, len(palette))))))
    table = np.zeros((1 << size_bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    mcs = max(2, size_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (size_bits - 1), 0, 0])
    out += table.tobytes()
    # Netscape loop extension (loop forever) — standard animation marker
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    per_frame = w * h
    for fi, _f in enumerate(stack):
        idx = inverse[fi * per_frame:(fi + 1) * per_frame].astype(
            np.uint8
        ).reshape(h, w)
        # GCE: disposal 1 (leave), no transparency, delay
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack(
            "<H", delay_cs
        ) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([mcs])
        data = _lzw_encode(idx.tobytes(), mcs)
        for lo in range(0, len(data), 255):
            chunk = data[lo:lo + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
