"""Zero-dependency MJPEG-in-Matroska (mkv) video codec.

Rounds 9–11 gave MJPEG real zero-dep paths through GIF, RIFF/AVI, and
ISO-BMFF/MP4; this module covers the last container family the ``av``
gate named: Matroska (EBML, the publicly specified RFC 8794 element
grammar).  The walk: EBML header → Segment → Tracks (find the
``V_MJPEG`` video track's number) → Clusters → SimpleBlock /
BlockGroup>Block payloads, each a standalone baseline JPEG decoded
with the repo's own codec (`multimodal/jpeg.py`).  With this, the
``av`` gate shrinks to non-MJPEG codecs only — every MJPEG container
a capture pipeline produces decodes in-repo.

Contracts match the AVI/MP4/GIF decoders (same container-blind
near-dup kernels downstream):

- corrupt/truncated input decodes to the valid frame prefix or None,
  never raises;
- the pixel budget rejects decompression-bomb SOF headers BEFORE any
  allocation;
- frames come back as ``(h, w, 3)`` uint8 RGB.

Laced blocks (multiple frames packed per block) are skipped rather
than mis-split — MJPEG muxers emit one keyframe per block (every
frame is an I-frame, lacing buys nothing), so the skip is a
corrupt-input guard, not a feature gap.

``encode_mkv_mjpeg`` is the fixture writer: a minimal standard EBML
header + Segment(Info, Tracks, one Cluster of SimpleBlocks) layout,
used by the tests and available to the media bench.
"""

from __future__ import annotations

import struct

import numpy as np

from muller_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

__all__ = ["encode_mkv_mjpeg", "decode_mkv_frames", "is_mkv"]

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def is_mkv(raw: bytes) -> bool:
    return raw[:4] == _EBML_MAGIC


# --------------------------------------------------------------- encoding

def _vint_size(value: int) -> bytes:
    """EBML data-size varint: value stored after a length-marker bit
    (1-byte form holds < 2^7, 2-byte < 2^14, ...)."""
    for n in range(1, 9):
        if value < (1 << (7 * n)) - 1:
            out = value | (1 << (7 * n))
            return out.to_bytes(n, "big")
    raise ValueError("size too large")


def _el(eid: bytes, body: bytes) -> bytes:
    return eid + _vint_size(len(body)) + body


def _uint(value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return value.to_bytes(n, "big")


def encode_mkv_mjpeg(frames, fps: int = 10, quality: int = 90) -> bytes:
    """Encode ``(h, w, 3)`` / ``(h, w)`` uint8 arrays (one shape) as
    Motion-JPEG in Matroska: track 1, CodecID ``V_MJPEG``, one
    keyframe SimpleBlock per frame in a single Cluster."""
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one (h, w)")
    payloads = [encode_jpeg(f, quality=quality) for f in frames]

    header = _el(_EBML_MAGIC, b"".join([
        _el(b"\x42\x86", _uint(1)),        # EBMLVersion
        _el(b"\x42\xf7", _uint(1)),        # EBMLReadVersion
        _el(b"\x42\xf2", _uint(4)),        # EBMLMaxIDLength
        _el(b"\x42\xf3", _uint(8)),        # EBMLMaxSizeLength
        _el(b"\x42\x82", b"matroska"),     # DocType
        _el(b"\x42\x87", _uint(4)),        # DocTypeVersion
        _el(b"\x42\x85", _uint(2)),        # DocTypeReadVersion
    ]))
    info = _el(b"\x15\x49\xa9\x66", b"".join([
        _el(b"\x2a\xd7\xb1", _uint(1_000_000_000 // max(fps, 1))),
        _el(b"\x4d\x80", b"muller_spark"),  # MuxingApp
        _el(b"\x57\x41", b"muller_spark"),  # WritingApp
    ]))
    video = _el(b"\xe0", b"".join([
        _el(b"\xb0", _uint(w)),            # PixelWidth
        _el(b"\xba", _uint(h)),            # PixelHeight
    ]))
    track = _el(b"\xae", b"".join([
        _el(b"\xd7", _uint(1)),            # TrackNumber
        _el(b"\x73\xc5", _uint(1)),        # TrackUID
        _el(b"\x83", _uint(1)),            # TrackType: video
        _el(b"\x86", b"V_MJPEG"),          # CodecID
        video,
    ]))
    tracks = _el(b"\x16\x54\xae\x6b", track)
    blocks = []
    for i, p in enumerate(payloads):
        # SimpleBlock: track varint (1 | 0x80), int16 timecode, flags
        # 0x80 (keyframe, no lacing), then the JPEG payload
        blocks.append(_el(
            b"\xa3", b"\x81" + struct.pack(">hB", i, 0x80) + p
        ))
    cluster = _el(b"\x1f\x43\xb6\x75",
                  _el(b"\xe7", _uint(0)) + b"".join(blocks))
    segment = _el(b"\x18\x53\x80\x67", info + tracks + cluster)
    return header + segment


# --------------------------------------------------------------- decoding

def _read_vint(raw: bytes, pos: int, hi: int, keep_marker: bool):
    """(value, next_pos) or None.  ``keep_marker`` True reads an
    ELEMENT ID (marker bit kept — IDs compare against their full
    byte form); False reads a DATA SIZE (marker stripped; all-ones
    payload means unknown size → returns -1)."""
    if pos >= hi:
        return None
    first = raw[pos]
    if first == 0:
        return None  # > 8-byte vint: invalid here
    n = 9 - first.bit_length()
    if pos + n > hi:
        return None
    chunk = int.from_bytes(raw[pos:pos + n], "big")
    if keep_marker:
        return chunk, pos + n
    mask = (1 << (7 * n)) - 1
    val = chunk & mask
    return (-1 if val == mask else val), pos + n


def _unknown_size_end(raw: bytes, lo: int, hi: int) -> int:
    """End offset of an unknown-size Cluster per RFC 8794 §6.2: walk
    its child elements until an ID that is NOT a Cluster child (the
    next Cluster or another Segment-level element) — that ID starts
    the next sibling.  A malformed or nested-unknown-size child ends
    the scan at the enclosure end (tolerant, like the rest of the
    walk)."""
    pos = lo
    while pos < hi:
        rid = _read_vint(raw, pos, hi, keep_marker=True)
        if rid is None:
            return hi
        eid, p2 = rid
        if eid not in _CLUSTER_CHILDREN:
            return pos  # sibling starts here
        rsz = _read_vint(raw, p2, hi, keep_marker=False)
        if rsz is None:
            return hi
        size, body_lo = rsz
        if size == -1:
            return hi  # nested unknown-size child: give up tolerantly
        pos = min(body_lo + size, hi)
    return hi


def _elements(raw: bytes, lo: int, hi: int):
    """Yield (element_id, body_lo, body_hi) tolerantly; malformed
    input ends the walk.  Unknown-size elements (the normal output of
    live/streamed muxing, RFC 8794): an unknown-size Cluster is
    bounded at the start of its next sibling (so LATER clusters still
    decode — the walk continues); any other unknown-size element
    extends to the enclosure end and ends the walk (correct for
    Segment, the only other unknown-size element real muxers emit)."""
    pos = lo
    while pos < hi:
        rid = _read_vint(raw, pos, hi, keep_marker=True)
        if rid is None:
            return
        eid, p2 = rid
        rsz = _read_vint(raw, p2, hi, keep_marker=False)
        if rsz is None:
            return
        size, body_lo = rsz
        if size == -1:
            if eid == _CLUSTER:
                body_hi = _unknown_size_end(raw, body_lo, hi)
                yield eid, body_lo, body_hi
                pos = body_hi
                continue
            yield eid, body_lo, hi
            return  # non-Cluster unknown size consumes the enclosure
        body_hi = min(body_lo + size, hi)
        if body_hi < body_lo:
            return
        yield eid, body_lo, body_hi
        pos = body_hi


def _find(raw: bytes, lo: int, hi: int, eid: int):
    for e, blo, bhi in _elements(raw, lo, hi):
        if e == eid:
            yield blo, bhi


def _uint_at(raw: bytes, lo: int, hi: int) -> int:
    return int.from_bytes(raw[lo:hi], "big") if hi > lo else 0


_SEGMENT = 0x18538067
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_CODEC_ID = 0x86
_CLUSTER = 0x1F43B675
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
# Valid direct children of Cluster (Matroska v4) plus the two global
# elements (CRC-32, Void) legal anywhere — anything else seen while
# scanning an unknown-size Cluster starts the next sibling.
_CLUSTER_CHILDREN = frozenset({
    0xE7,    # Timestamp
    0xA7,    # Position
    0xAB,    # PrevSize
    0xA3,    # SimpleBlock
    0xA0,    # BlockGroup
    0xAF,    # EncryptedBlock
    0x5854,  # SilentTracks
    0xBF,    # CRC-32 (global)
    0xEC,    # Void (global)
})


def _mjpeg_tracks(raw: bytes, seg_lo: int, seg_hi: int) -> set:
    nums = set()
    for t_lo, t_hi in _find(raw, seg_lo, seg_hi, _TRACKS):
        for e_lo, e_hi in _find(raw, t_lo, t_hi, _TRACK_ENTRY):
            num, codec = None, None
            for eid, b_lo, b_hi in _elements(raw, e_lo, e_hi):
                if eid == _TRACK_NUMBER:
                    num = _uint_at(raw, b_lo, b_hi)
                elif eid == _CODEC_ID:
                    codec = raw[b_lo:b_hi].rstrip(b"\x00")
            if num is not None and codec == b"V_MJPEG":
                nums.add(num)
    return nums


def _block_payload(raw: bytes, lo: int, hi: int, tracks: set):
    """JPEG payload of a (Simple)Block on an MJPEG track, or None.
    Laced blocks (flag bits 0x06 set) are skipped — see module
    docstring."""
    r = _read_vint(raw, lo, hi, keep_marker=False)
    if r is None:
        return None
    track, p = r
    if tracks and track not in tracks:
        return None
    if p + 3 > hi:
        return None
    flags = raw[p + 2]
    if flags & 0x06:
        return None  # laced: not a shape MJPEG muxers emit
    return raw[p + 3:hi]


def decode_mkv_frames(
    raw: bytes,
    max_frames: "int | None" = None,
    max_pixels: int = 1 << 26,
    decoder: str = "exact",
):
    """Decode a Motion-JPEG Matroska file to ``(h, w, 3)`` uint8 RGB
    frames, or None.  Tolerant walk: blocks whose payload is not a
    JPEG, fails the ``max_pixels`` bomb guard, or fails decode are
    skipped; the valid prefix is kept; never raises on hostile bytes.
    When no track declares ``V_MJPEG`` the block payloads are still
    probed for JPEG magic (tolerance over codec bookkeeping — the
    AVI decoder's ..dc-chunk stance).  ``decoder="fast"`` uses PIL's
    libjpeg when installed (same tier contract as AVI/MP4)."""
    if decoder not in ("exact", "fast"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if not is_mkv(raw):
        return None
    pil = None
    if decoder == "fast":
        try:
            from PIL import Image as pil  # type: ignore
        except ImportError:
            pil = None
    from muller_spark.multimodal.avi import _sof_dims

    frames: list = []

    def emit(payload) -> bool:
        """Decode one block payload; False = frame cap reached."""
        if not payload or payload[:2] != b"\xff\xd8":
            return True
        dims = _sof_dims(payload)
        if dims is None or dims[0] * dims[1] > max_pixels:
            return True
        try:
            if pil is not None:
                import io

                with pil.open(io.BytesIO(payload)) as img:
                    px = np.asarray(img.convert("RGB"), dtype=np.uint8)
            else:
                px = decode_jpeg(payload)
        except Exception:
            px = None  # corrupt frame: skip, keep walking
        if px is not None:
            if px.ndim == 2:
                px = np.stack([px] * 3, axis=2)
            frames.append(px)
            if max_frames is not None and len(frames) >= max_frames:
                return False
        return True

    try:
        for seg_lo, seg_hi in _find(raw, 0, len(raw), _SEGMENT):
            tracks = _mjpeg_tracks(raw, seg_lo, seg_hi)
            for c_lo, c_hi in _find(raw, seg_lo, seg_hi, _CLUSTER):
                for eid, b_lo, b_hi in _elements(raw, c_lo, c_hi):
                    if eid == _SIMPLE_BLOCK:
                        if not emit(_block_payload(raw, b_lo, b_hi, tracks)):
                            return frames
                    elif eid == _BLOCK_GROUP:
                        for g_lo, g_hi in _find(raw, b_lo, b_hi, _BLOCK):
                            if not emit(
                                _block_payload(raw, g_lo, g_hi, tracks)
                            ):
                                return frames
    except Exception:
        pass  # valid-prefix contract: keep whatever decoded
    return frames if frames else None
