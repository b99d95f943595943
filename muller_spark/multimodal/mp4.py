"""Zero-dependency MJPEG-in-MP4 (ISO BMFF) video codec.

Round 10 gave MJPEG a RIFF container (`multimodal/avi.py`); this is
the same play for the ISO Base Media File Format family — the modern
``.mp4`` container (ISO/IEC 14496-12, the publicly specified box
grammar): walk ``ftyp``/``moov``/``mdat``, reconstruct per-sample file
offsets from the ``stbl`` sample tables (``stsc`` sample-to-chunk runs
× ``stco``/``co64`` chunk offsets × ``stsz`` sample sizes), and decode
each Motion-JPEG sample with the repo's own baseline JPEG codec
(`multimodal/jpeg.py`).  The reference decodes video by shelling out
to installed codec libraries (``/root/reference/muller/
compression.py:82``); with this module (and the `multimodal/mkv.py`
sibling) the ``av`` gate shrinks to non-MJPEG codecs only.

Contracts match the AVI/GIF decoders (they feed the same container-
blind video near-dup kernels):

- corrupt/truncated input decodes to the valid frame prefix or None,
  never raises — one bad clip must not kill a Spark task;
- the pixel budget rejects decompression-bomb SOF headers BEFORE any
  allocation;
- frames come back as ``(h, w, 3)`` uint8 RGB.

``encode_mp4_mjpeg`` is the fixture writer: a minimal standard
``ftyp`` + ``mdat`` + ``moov`` layout with a ``'jpeg'`` visual sample
entry (the classic QuickTime/ISO Motion-JPEG convention) that
mainstream demuxers accept, used by the tests and the media bench.
"""

from __future__ import annotations

import struct

import numpy as np

from muller_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

__all__ = ["encode_mp4_mjpeg", "decode_mp4_frames", "is_mp4"]


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def _fbox(typ: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, "big") + body)


def is_mp4(raw: bytes) -> bool:
    """ISO BMFF sniff: the first box is ``ftyp``."""
    return len(raw) >= 12 and raw[4:8] == b"ftyp"


def encode_mp4_mjpeg(frames, fps: int = 10, quality: int = 90) -> bytes:
    """Encode a sequence of ``(h, w, 3)`` / ``(h, w)`` uint8 arrays
    (all one shape) as Motion-JPEG in MP4: one baseline JPEG per
    sample in ``mdat``, one chunk per sample (``stsc`` run of 1),
    absolute ``stco`` offsets.  JPEG is lossy — round-trips are
    near-exact, not bit-exact (GIF stays the lossless fixture)."""
    frames = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one (h, w)")
    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(payloads)
    fps = max(fps, 1)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp41")
    mdat = _box(b"mdat", b"".join(payloads))
    # sample i's absolute offset: after ftyp + the 8-byte mdat header
    base = len(ftyp) + 8
    offsets, off = [], base
    for p in payloads:
        offsets.append(off)
        off += len(p)

    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _fbox(b"mvhd", struct.pack(
        ">IIII", 0, 0, fps, n            # created, modified, timescale, dur
    ) + struct.pack(">iHH", 0x10000, 0x0100, 0)  # rate, volume, reserved
        + b"\x00" * 8 + matrix + b"\x00" * 24
        + struct.pack(">I", 2))          # next track id
    tkhd = _fbox(b"tkhd", struct.pack(
        ">IIIII", 0, 0, 1, 0, n          # created, modified, id, rsvd, dur
    ) + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
        + struct.pack(">II", w << 16, h << 16), flags=7)
    mdhd = _fbox(b"mdhd", struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0))
    hdlr = _fbox(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12
                 + b"MJPEG\x00")
    vmhd = _fbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _fbox(b"dref", struct.pack(">I", 1) + _fbox(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    # VisualSampleEntry 'jpeg': reserved(6) + data-ref-index(2) + the
    # fixed visual fields (dims, 72dpi resolutions, frame_count 1,
    # 32-byte compressor name, depth 24, pre_defined -1)
    sample_entry = _box(b"jpeg", b"\x00" * 6 + struct.pack(">H", 1)
                        + struct.pack(">HH", 0, 0) + b"\x00" * 12
                        + struct.pack(">HH", w, h)
                        + struct.pack(">II", 0x00480000, 0x00480000)
                        + struct.pack(">I", 0) + struct.pack(">H", 1)
                        + b"\x05MJPEG" + b"\x00" * 26
                        + struct.pack(">Hh", 24, -1))
    stsd = _fbox(b"stsd", struct.pack(">I", 1) + sample_entry)
    stts = _fbox(b"stts", struct.pack(">III", 1, n, 1))
    stsc = _fbox(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _fbox(b"stsz", struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(p)) for p in payloads))
    stco = _fbox(b"stco", struct.pack(">I", n)
                 + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _boxes(raw: bytes, lo: int, hi: int):
    """Yield (type, body_lo, body_hi) for the boxes in raw[lo:hi] —
    tolerant: 64-bit largesize and size-0 (to end-of-enclosure)
    handled, malformed sizes end the walk instead of looping."""
    pos = lo
    while pos + 8 <= hi:
        size = struct.unpack(">I", raw[pos:pos + 4])[0]
        typ = raw[pos + 4:pos + 8]
        body_lo = pos + 8
        if size == 1:
            if pos + 16 > hi:
                return
            size = struct.unpack(">Q", raw[pos + 8:pos + 16])[0]
            body_lo = pos + 16
        elif size == 0:
            size = hi - pos
        if size < body_lo - pos:  # malformed: smaller than its header
            return
        body_hi = min(pos + size, hi)
        yield typ, body_lo, body_hi
        pos += size


def _find(raw: bytes, lo: int, hi: int, typ: bytes):
    for t, blo, bhi in _boxes(raw, lo, hi):
        if t == typ:
            yield blo, bhi


def _sample_locs(raw: bytes, stbl_lo: int, stbl_hi: int):
    """(offset, size) per sample from the stbl tables, valid prefix on
    truncation; [] when the tables are absent/empty."""
    sizes: "list[int] | None" = None
    offsets: "list[int] | None" = None
    stsc_runs: "list[tuple[int, int]]" = []
    try:
        for typ, lo, hi in _boxes(raw, stbl_lo, stbl_hi):
            body = raw[lo + 4:hi]  # skip version+flags
            if typ == b"stsz" and len(body) >= 8:
                fixed, count = struct.unpack(">II", body[:8])
                if fixed:
                    # Bomb guard: count is a verbatim 32-bit field; a
                    # ~100-byte hostile file claiming 0xFFFFFFFF samples
                    # must not materialize a multi-GB list. No sample can
                    # start past end-of-file, so the file physically holds
                    # at most len(raw)//fixed samples (+1 slack for a
                    # truncated tail sample).
                    count = min(count, len(raw) // max(fixed, 1) + 1)
                    sizes = [fixed] * count
                else:
                    count = min(count, (len(body) - 8) // 4)
                    sizes = list(struct.unpack(f">{count}I",
                                               body[8:8 + 4 * count]))
            elif typ == b"stco" and len(body) >= 4:
                count = struct.unpack(">I", body[:4])[0]
                count = min(count, (len(body) - 4) // 4)
                offsets = list(struct.unpack(f">{count}I",
                                             body[4:4 + 4 * count]))
            elif typ == b"co64" and len(body) >= 4:
                count = struct.unpack(">I", body[:4])[0]
                count = min(count, (len(body) - 4) // 8)
                offsets = list(struct.unpack(f">{count}Q",
                                             body[4:4 + 8 * count]))
            elif typ == b"stsc" and len(body) >= 4:
                count = struct.unpack(">I", body[:4])[0]
                count = min(count, (len(body) - 4) // 12)
                for i in range(count):
                    first, spc, _ = struct.unpack(
                        ">III", body[4 + 12 * i:16 + 12 * i]
                    )
                    stsc_runs.append((first, spc))
    except Exception:
        return []
    if not sizes or not offsets:
        return []
    if not stsc_runs:
        stsc_runs = [(1, 1)]
    locs: "list[tuple[int, int]]" = []
    si = 0
    run_idx = 0
    for ci in range(1, len(offsets) + 1):
        while (run_idx + 1 < len(stsc_runs)
               and stsc_runs[run_idx + 1][0] <= ci):
            run_idx += 1
        spc = max(stsc_runs[run_idx][1], 0)
        off = offsets[ci - 1]
        for _ in range(spc):
            if si >= len(sizes):
                return locs
            locs.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    return locs


def decode_mp4_frames(
    raw: bytes,
    max_frames: "int | None" = None,
    max_pixels: int = 1 << 26,
    decoder: str = "exact",
):
    """Decode a Motion-JPEG MP4 to a list of ``(h, w, 3)`` uint8 RGB
    frames, or None if the container is unparseable / holds no
    decodable frames.  Tolerant walk: the first track whose samples
    carry JPEG payloads wins; samples that overrun the buffer, fail
    the ``max_pixels`` bomb guard, or fail decode are skipped; the
    valid prefix is kept.  Never raises on hostile bytes — the
    task-kill-proof contract shared with ``decode_avi_frames`` /
    ``decode_gif_frames``.

    ``decoder="fast"`` uses PIL's libjpeg per sample when installed
    (same tiering/determinism contract as the AVI decoder: identical
    to ``"exact"`` when PIL is absent; pin one tier per fingerprint
    ledger)."""
    if decoder not in ("exact", "fast"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if not is_mp4(raw):
        return None
    pil = None
    if decoder == "fast":
        try:
            from PIL import Image as pil  # type: ignore
        except ImportError:
            pil = None
    from muller_spark.multimodal.avi import _sof_dims

    frames: list = []
    try:
        for moov_lo, moov_hi in _find(raw, 0, len(raw), b"moov"):
            for trak_lo, trak_hi in _find(raw, moov_lo, moov_hi, b"trak"):
                locs = []
                for mdia_lo, mdia_hi in _find(raw, trak_lo, trak_hi,
                                              b"mdia"):
                    for minf_lo, minf_hi in _find(raw, mdia_lo, mdia_hi,
                                                  b"minf"):
                        for stbl_lo, stbl_hi in _find(raw, minf_lo,
                                                      minf_hi, b"stbl"):
                            locs = _sample_locs(raw, stbl_lo, stbl_hi)
                for off, size in locs:
                    payload = raw[off:off + size]
                    if payload[:2] != b"\xff\xd8":
                        continue
                    dims = _sof_dims(payload)
                    if dims is None or dims[0] * dims[1] > max_pixels:
                        continue
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
                        px = None  # corrupt sample: skip, keep walking
                    if px is not None:
                        if px.ndim == 2:
                            px = np.stack([px] * 3, axis=2)
                        frames.append(px)
                        if (max_frames is not None
                                and len(frames) >= max_frames):
                            return frames
                if frames:
                    return frames  # first track with JPEG samples wins
    except Exception:
        pass  # valid-prefix contract: keep whatever decoded
    return frames if frames else None
