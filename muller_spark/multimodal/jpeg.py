"""Baseline JPEG codec, pure stdlib + numpy (no PIL).

Covers the interchange-format baseline subset: DCT + quantization +
canonical Huffman entropy coding, SOI/APP/DQT/SOF0/DHT/SOS/EOI segment
structure, byte stuffing, MCU-interleaved component scan.  Decodes
grayscale, 4:4:4 and subsampled-chroma layouts (4:2:0/4:2:2 and any
integer-ratio sampling, nearest-neighbor chroma upsample); encodes
4:4:4 or 4:2:0 (2x2-mean chroma subsample).  Progressive scans,
arithmetic coding and 12-bit precision return ``None`` so callers fall
back to the header tier (``codecs.parse_image_header`` already reads
dimensions for those).

The encoder emits *self-describing* canonical Huffman tables (4-bit
codes for the 12 DC categories, 9-bit codes for all 256 run/size AC
symbols) rather than the Annex K defaults — any conforming baseline
decoder, including this one, reads the tables from the DHT segments it
ships.  Compression ratio is not the goal; producing real, verifiable
JPEG bytes for the decode/resize pipeline is.

JPEG is lossy: round-trips assert bounded pixel error, not equality
(see tests/test_jpeg_codec.py).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order as (row, col) pairs: anti-diagonal s traversed row-
# descending when s is even, row-ascending when odd
_ZZ: list[tuple[int, int]] = []
for _s in range(15):
    _pts = [(k, _s - k) for k in range(max(0, _s - 7), min(_s, 7) + 1)]
    _ZZ.extend(_pts[::-1] if _s % 2 == 0 else _pts)
_ZZ_ROWS = np.array([p[0] for p in _ZZ])
_ZZ_COLS = np.array([p[1] for p in _ZZ])

# orthonormal 8x8 DCT-II matrix: forward F = D f D^T, inverse f = D^T F D
_D = np.zeros((8, 8))
for _i in range(8):
    for _j in range(8):
        _c = (1 / np.sqrt(2)) if _i == 0 else 1.0
        _D[_i, _j] = 0.5 * _c * np.cos((2 * _j + 1) * _i * np.pi / 16)

# Annex K quantization tables (quality 50 base)
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


# ---------------------------------------------------------------- huffman

def _canonical_codes(bits: list[int], symbols: list[int]):
    """(symbol -> (code, length)) from a DHT-style (bits, symbols)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# encoder tables: 12 DC categories at 4 bits; 256 AC symbols as 255
# nine-bit codes + one ten-bit code (a DHT bits field is one byte per
# length, so 256 codes cannot share a single length)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMS = list(range(12))
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_SYMS = list(range(256))
_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def emit_marker(self, marker: int) -> None:
        """Byte-align and append a raw marker (NOT byte-stuffed)."""
        self.pad_to_byte()
        self.buf.append(0xFF)
        self.buf.append(marker)

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        while self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed FF
                else:
                    self.pos -= 1  # a real marker: stop
                    return False
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
            return True
        return False

    def read(self, n: int) -> int | None:
        while self.nbits < n:
            if not self._fill():
                return None
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val

    def restart(self) -> bool:
        """Consume an RSTn marker at a restart boundary: discard pad
        bits, expect FF D0-D7."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return True
        return False

    def read_huffman(self, table: dict) -> int | None:
        """table: (code, length) -> symbol."""
        code = 0
        for length in range(1, 17):
            bit = self.read(1)
            if bit is None:
                return None
            code = (code << 1) | bit
            sym = table.get((code, length))
            if sym is not None:
                return sym
        return None


def _magnitude(value: int) -> tuple[int, int]:
    """(category size, offset bits) per JPEG magnitude coding."""
    if value == 0:
        return 0, 0
    size = int(abs(value)).bit_length()
    offset = value if value >= 0 else value + (1 << size) - 1
    return size, offset


def _extend(offset: int, size: int) -> int:
    if size == 0:
        return 0
    return offset if offset >= (1 << (size - 1)) else offset - (1 << size) + 1


# ---------------------------------------------------------------- encoder

def _encode_one_block(writer, block, q, prev_dc, ci):
    coef = _D @ (block.astype(np.float64) - 128.0) @ _D.T
    quant = np.round(coef / q).astype(np.int32)
    zz = quant[_ZZ_ROWS, _ZZ_COLS]
    diff = int(zz[0]) - prev_dc[ci]
    prev_dc[ci] = int(zz[0])
    size, offset = _magnitude(diff)
    code, length = _DC_CODES[size]
    writer.write(code, length)
    if size:
        writer.write(offset, size)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0].max()) + 1 if zz[1:].any() else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_CODES[0xF0]  # ZRL
            writer.write(c, ln)
            run -= 16
        size, offset = _magnitude(v)
        c, ln = _AC_CODES[(run << 4) | size]
        writer.write(c, ln)
        writer.write(offset, size)
        run = 0
    if last_nz < 63:
        c, ln = _AC_CODES[0x00]  # EOB
        writer.write(c, ln)


def _block_at(plane, row8, col8):
    block = plane[row8 * 8:row8 * 8 + 8, col8 * 8:col8 * 8 + 8]
    if block.size == 0:  # MCU padding block entirely outside the plane
        return np.full((8, 8), 128.0)
    if block.shape != (8, 8):  # edge-replicate pad
        block = np.pad(
            block, ((0, 8 - block.shape[0]), (0, 8 - block.shape[1])),
            mode="edge",
        )
    return block


def _encode_blocks(planes, q_tables, samplings, restart_interval=0):
    """MCU-interleaved entropy coding.  ``planes[i]`` is already at its
    component resolution; ``samplings[i] = (h, v)`` block factors.
    ``restart_interval``: emit RSTn every that many MCUs (0 = none)."""
    writer = _BitWriter()
    prev_dc = [0] * len(planes)
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    ph, pw = planes[0].shape  # luma drives MCU count
    mcu_rows = (ph + 8 * vmax - 1) // (8 * vmax)
    mcu_cols = (pw + 8 * hmax - 1) // (8 * hmax)
    total = mcu_rows * mcu_cols
    done = 0
    rst = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, (plane, q) in enumerate(zip(planes, q_tables)):
                hs, vs = samplings[ci]
                for by in range(vs):
                    for bx in range(hs):
                        block = _block_at(plane, my * vs + by, mx * hs + bx)
                        _encode_one_block(writer, block, q, prev_dc, ci)
            done += 1
            if restart_interval and done % restart_interval == 0 and done < total:
                writer.emit_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                prev_dc = [0] * len(planes)
    return writer.flush()


def _subsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 mean subsample with edge replication to even dimensions."""
    h, w = plane.shape
    if h % 2 or w % 2:
        plane = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return (
        plane[0::2, 0::2] + plane[1::2, 0::2]
        + plane[0::2, 1::2] + plane[1::2, 1::2]
    ) / 4.0


def encode_jpeg(
    arr,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG.  ``subsampling``: ``"444"`` (full chroma) or
    ``"420"`` (2x2-subsampled chroma, the common-camera layout);
    ``restart_interval`` emits a DRI segment + RSTn markers every that
    many MCUs (camera-style error-resilient streams)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2 or arr.shape[2] == 1
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    h, w = arr.shape[:2]
    ql = _scaled_q(_Q_LUMA, quality)
    qc = _scaled_q(_Q_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64)]
        q_tables = [ql]
        samplings = [(1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            planes = [y, _subsample2(cb), _subsample2(cr)]
            samplings = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samplings = [(1, 1), (1, 1), (1, 1)]
        q_tables = [ql, qc, qc]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = ql[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    out += seg(0xDB, b"\x00" + zz_l)
    if not gray:
        zz_c = qc[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += seg(0xDB, b"\x01" + zz_c)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = samplings[ci]
        sof += struct.pack(">BBB", ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1)
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_SYMS))
    out += seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_SYMS))
    sos = struct.pack(">B", ncomp)
    for ci in range(ncomp):
        sos += struct.pack(">BB", ci + 1, 0x00)  # DC table 0 / AC table 0
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += _encode_blocks(planes, q_tables, samplings, restart_interval)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

def decode_jpeg(raw: bytes):
    """numpy (h, w) or (h, w, 3) uint8 pixels for baseline JPEG —
    grayscale, 4:4:4, and subsampled-chroma layouts (4:2:0/4:2:2/any
    integer-ratio sampling, nearest-neighbor chroma upsample); None
    outside the baseline envelope (progressive, 12-bit, arithmetic)."""
    if raw[:2] != b"\xff\xd8":
        return None
    pos = 2
    q_tables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> (code,len)->sym
    frame = None
    scan = None
    restart_interval = 0
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            pos += 1
            continue
        marker = raw[pos + 1]
        if marker == 0xFF:  # legal 0xFF fill byte before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        (length,) = struct.unpack(">H", raw[pos + 2:pos + 4])
        payload = raw[pos + 4:pos + 2 + length]
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables unsupported
                tbl = np.zeros((8, 8))
                vals = payload[p + 1:p + 65]
                tbl[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(bytes(vals), dtype=np.uint8)
                q_tables[tq] = tbl
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                syms = list(payload[p + 17:p + 17 + n])
                codes = _canonical_codes(bits, syms)
                huff[(tc, th)] = {(c, ln): s for s, (c, ln) in codes.items()}
                p += 17 + n
        elif marker == 0xC0:
            precision, fh, fw, ncomp = struct.unpack(">BHHB", payload[:6])
            if precision != 8 or ncomp not in (1, 3):
                return None
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = payload[6 + ci * 3:9 + ci * 3]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    return None
                comps.append((cid, tq, hs, vs))
            frame = (fh, fw, comps)
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:
            ns = payload[0]
            tables = {}
            for ci in range(ns):
                cid, tt = payload[1 + ci * 2:3 + ci * 2]
                tables[cid] = (tt >> 4, tt & 0x0F)
            scan = (tables, pos + 2 + length)
            break
        elif marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        pos += 2 + length
    if frame is None or scan is None:
        return None
    fh, fw, comps = frame
    tables, data_start = scan
    if fh == 0 or fw == 0:
        return None

    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    for _, _, hs, vs in comps:
        if hmax % hs or vmax % vs:
            return None  # non-integer upsample ratio (spec-legal, rare)
    reader = _BitReader(raw[data_start:])
    mcu_rows = (fh + 8 * vmax - 1) // (8 * vmax)
    mcu_cols = (fw + 8 * hmax - 1) // (8 * hmax)
    planes = [
        np.zeros((mcu_rows * 8 * vs, mcu_cols * 8 * hs))
        for _, _, hs, vs in comps
    ]
    prev_dc = [0] * len(comps)

    def decode_block(ci, cid, tq, row8, col8):
        dc_t = huff.get((0, tables[cid][0]))
        ac_t = huff.get((1, tables[cid][1]))
        if dc_t is None or ac_t is None:
            return False
        zz = np.zeros(64)
        size = reader.read_huffman(dc_t)
        if size is None or size > 11:
            return False
        offset = reader.read(size) if size else 0
        if offset is None:
            return False
        prev_dc[ci] += _extend(offset, size)
        zz[0] = prev_dc[ci]
        i = 1
        while i < 64:
            sym = reader.read_huffman(ac_t)
            if sym is None:
                return False
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run != 15:
                    return False
                i += 16  # ZRL
                continue
            i += run
            if i >= 64:
                return False
            offset = reader.read(size)
            if offset is None:
                return False
            zz[i] = _extend(offset, size)
            i += 1
        block = np.zeros((8, 8))
        block[_ZZ_ROWS, _ZZ_COLS] = zz
        block *= q_tables[tq]
        pix = _D.T @ block @ _D + 128.0
        planes[ci][row8 * 8:row8 * 8 + 8, col8 * 8:col8 * 8 + 8] = pix
        return True

    done = 0
    total = mcu_rows * mcu_cols
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, (cid, tq, hs, vs) in enumerate(comps):
                if tq not in q_tables or cid not in tables:
                    return None
                for by in range(vs):
                    for bx in range(hs):
                        if not decode_block(ci, cid, tq, my * vs + by, mx * hs + bx):
                            return None
            done += 1
            if restart_interval and done % restart_interval == 0 and done < total:
                if not reader.restart():
                    return None
                for ci in range(len(comps)):
                    prev_dc[ci] = 0

    # upsample subsampled components to full resolution, crop to frame
    full = []
    for plane, (_, _, hs, vs) in zip(planes, comps):
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        full.append(plane[:fh, :fw])
    planes = full
    if len(comps) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
