"""Zero-dependency MJPEG-in-AVI video codec.

The reference decodes video containers by shelling out to installed
codec libraries (``/root/reference/muller/compression.py:82``); this
repo's equivalent scope is "every container decodable without ``av`` /
``PIL`` gets a REAL path".  Round 9 made that true for animated GIF
(`multimodal/gif.py`); this module adds the second family: AVI (RIFF)
containers carrying Motion-JPEG streams, decoded frame-by-frame with
the repo's own baseline JPEG codec (`multimodal/jpeg.py`).  MJPEG is
the classic camera/capture interchange format — every frame is a
standalone baseline JPEG, so a container walk + the existing decoder
is a complete playback path, no inter-frame state.

Contracts match the GIF decoder's (they feed the same video near-dup
kernels):

- corrupt/truncated input decodes to the valid frame prefix or None,
  never raises — one bad clip must not kill a Spark task;
- a configurable pixel budget rejects decompression-bomb headers
  BEFORE any allocation;
- frames come back as ``(h, w, 3)`` uint8 RGB (grayscale JPEG frames
  are channel-stacked) so downstream hashing is container-blind.

``encode_avi_mjpeg`` is the fixture writer: a minimal standard RIFF
layout (hdrl with avih/strh/strf, movi with ``00dc`` chunks, idx1)
that mainstream players accept, used by the tests and the media bench.
"""

from __future__ import annotations

import struct

import numpy as np

from muller_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

__all__ = ["encode_avi_mjpeg", "decode_avi_frames", "decode_video_frames"]


def _u32(x: int) -> bytes:
    return struct.pack("<I", x)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""  # RIFF chunks are word-aligned
    return fourcc + _u32(len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 90) -> bytes:
    """Encode a sequence of ``(h, w, 3)`` / ``(h, w)`` uint8 arrays
    (all the same shape) as an MJPEG AVI: one baseline JPEG per frame
    in ``00dc`` chunks, with the standard hdrl headers and an idx1
    index.  JPEG is lossy — round-trips are near-exact, not bit-exact
    (the GIF twin is the lossless fixture when exactness matters)."""
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one (h, w)")
    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    max_bytes = max(len(p) for p in payloads)

    # MainAVIHeader: µs/frame, max bytes/s, pad, flags(HASINDEX),
    # total frames, initial frames, streams, suggested buffer, w, h,
    # 4 reserved
    avih = _chunk(b"avih", struct.pack(
        "<14I",
        1_000_000 // max(fps, 1), max_bytes * fps, 0, 0x10,
        len(frames), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    ))
    # AVIStreamHeader: fccType, fccHandler, flags, prio+lang, initial,
    # scale, rate, start, length, sugg buffer, quality, sample size,
    # rcFrame(l,t,r,b as 4 int16)
    strh = _chunk(b"strh", b"vids" + b"MJPG" + struct.pack(
        "<I2H8I4H",
        0, 0, 0,                       # flags, priority, language
        0, 1, max(fps, 1), 0,          # initial, scale, rate, start
        len(frames), max_bytes, 0xFFFFFFFF, 0,  # length, buf, quality, ssize
        0, 0, w, h,                    # rcFrame
    ))
    # BITMAPINFOHEADER with biCompression='MJPG'
    strf = _chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    ))
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_body = b"".join(_chunk(b"00dc", p) for p in payloads)
    movi = _list(b"movi", movi_body)

    # idx1 offsets are relative to the 'movi' fourcc position
    idx_entries, off = [], 4
    for p in payloads:
        idx_entries.append(b"00dc" + _u32(0x10) + _u32(off) + _u32(len(p)))
        off += 8 + len(p) + (len(p) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + _u32(len(body)) + body


def decode_avi_frames(
    raw: bytes,
    max_frames: "int | None" = None,
    max_pixels: int = 1 << 26,
    decoder: str = "exact",
):
    """Decode an MJPEG AVI to a list of ``(h, w, 3)`` uint8 RGB frames,
    or None if the container is unparseable / holds no decodable
    frames.  Tolerant walk: chunk sizes that overrun the buffer
    truncate to the valid prefix; non-MJPEG ``..dc``/``..db`` payloads
    and frames whose header dims exceed ``max_pixels`` are skipped
    (bomb-shaped SOF dims must not reach the pixel allocator);
    ``LIST rec `` groupings are descended.  Never raises on hostile
    bytes — the task-kill-proof contract shared with
    :func:`muller_spark.multimodal.gif.decode_gif_frames`.

    ``decoder="fast"`` decodes frames with PIL's libjpeg when
    installed (same tiering and determinism contract as
    ``codecs.decode_pixels_fast``: identical to ``"exact"`` when PIL
    is absent; JPEG IDCT rounding may differ when present, so pin one
    tier per fingerprint ledger)."""
    if decoder not in ("exact", "fast"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        return None
    pil = None
    if decoder == "fast":
        try:
            from PIL import Image as pil  # type: ignore
        except ImportError:
            pil = None
    frames: list = []

    def walk(lo: int, hi: int, depth: int) -> bool:
        """Scan chunks in raw[lo:hi]; False = frame cap reached."""
        pos = lo
        while pos + 8 <= hi:
            fourcc = raw[pos:pos + 4]
            size = struct.unpack("<I", raw[pos + 4:pos + 8])[0]
            body_lo = pos + 8
            body_hi = min(body_lo + size, hi, len(raw))
            if fourcc == b"LIST" and body_hi - body_lo >= 4 and depth < 8:
                # descend into movi / 'rec ' groupings (skip the type)
                if not walk(body_lo + 4, body_hi, depth + 1):
                    return False
            elif fourcc[2:4] in (b"dc", b"db"):
                payload = raw[body_lo:body_hi]
                if payload[:2] == b"\xff\xd8":
                    dims = _sof_dims(payload)
                    if dims is not None and dims[0] * dims[1] <= max_pixels:
                        try:
                            if pil is not None:
                                import io

                                with pil.open(io.BytesIO(payload)) as img:
                                    px = np.asarray(
                                        img.convert("RGB"), dtype=np.uint8
                                    )
                            else:
                                px = decode_jpeg(payload)
                        except Exception:
                            px = None  # corrupt frame: skip, keep walking
                        if px is not None:
                            if px.ndim == 2:
                                px = np.stack([px] * 3, axis=2)
                            frames.append(px)
                            if (max_frames is not None
                                    and len(frames) >= max_frames):
                                return False
            pos = body_lo + size + (size & 1)
        return True

    try:
        walk(12, len(raw), 0)
    except Exception:
        pass  # valid-prefix contract: keep whatever decoded
    return frames if frames else None


def _sof_dims(payload: bytes):
    """(h, w) from the first baseline SOF marker, or None — a bounded
    header scan so the pixel budget is enforced before decode."""
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):
            if pos + 9 > len(payload):
                return None
            h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
            return (h, w)
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(payload):
            return None
        pos += 2 + struct.unpack(">H", payload[pos + 2:pos + 4])[0]
    return None


def decode_video_frames(
    raw: bytes,
    max_frames: "int | None" = None,
    max_pixels: int = 1 << 26,
    decoder: str = "exact",
):
    """Container-sniffing video decode: animated GIF, MJPEG AVI, MJPEG
    MP4, and MJPEG Matroska are the four zero-dependency families;
    anything else returns None (the ``av``-gated lane, now non-MJPEG
    codecs only).  The single entry point the video near-dup /
    frame-sampling kernels call, so adding a container automatically
    extends every video pipeline.  ``decoder`` forwards to the
    AVI/MP4/MKV frame decodes (PIL fast tier); the GIF path is always
    the exact zero-dep composition — PIL's own GIF canvas/disposal
    handling is not guaranteed to match it bit-for-bit, and GIF decode
    is cheap (LZW, no IDCT), so there is nothing worth trading
    determinism for."""
    if raw is None:
        return None
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        from muller_spark.multimodal.gif import decode_gif_frames

        return decode_gif_frames(raw, max_frames=max_frames,
                                 max_pixels=max_pixels)
    if raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
        return decode_avi_frames(raw, max_frames=max_frames,
                                 max_pixels=max_pixels, decoder=decoder)
    from muller_spark.multimodal.mp4 import decode_mp4_frames, is_mp4

    if is_mp4(raw):
        return decode_mp4_frames(raw, max_frames=max_frames,
                                 max_pixels=max_pixels, decoder=decoder)
    from muller_spark.multimodal.mkv import decode_mkv_frames, is_mkv

    if is_mkv(raw):
        return decode_mkv_frames(raw, max_frames=max_frames,
                                 max_pixels=max_pixels, decoder=decoder)
    return None
