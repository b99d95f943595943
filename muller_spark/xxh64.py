"""Pure-Python XXH64 matching Spark's ``xxhash64`` SQL function.

Spark computes ``xxhash64(col)`` as XXH64 (Yann Collet's xxHash, public
spec: https://github.com/Cyan4973/xxHash) with seed 42 over the value's
bytes — for a STRING column, its UTF-8 bytes — and returns the result
as a SIGNED 64-bit long.  Index shard routing is
``pmod(xxhash64(term), num_shards)``; computing that on the DRIVER for
a handful of probe terms replaces a LocalRelation→distinct→collect
Spark job per lookup with plain arithmetic (guide §2.4: the fixed
scheduling latency of those tiny jobs dominates warm index queries).

Equality with Spark is pinned by tests/test_round13_fixes.py, which
compares against ``F.xxhash64`` over a hostile vocabulary (unicode,
empty, long, NUL bytes) — the shard math may only ever be moved
driver-side because the two implementations agree bit-for-bit.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * _P1 + _P4) & _M


def xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as Spark's SIGNED long (seed 42 = Spark's
    default for the ``xxhash64`` SQL function)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def shard_of(term: str, num_shards: int) -> int:
    """Driver-side twin of ``pmod(xxhash64(term), num_shards)`` — the
    index family's shard router."""
    return xxhash64(term.encode("utf-8")) % num_shards
