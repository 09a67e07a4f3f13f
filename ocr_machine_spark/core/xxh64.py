"""Pure-Python / NumPy XXH64 — the public xxHash spec (Yann Collet,
github.com/Cyan4973/xxHash, BSD-2), implemented from the algorithm
description so DuckDB oracle twins can reproduce Spark's ``xxhash64``
expression bit-for-bit WITHOUT running Spark.

Spark semantics reproduced here (org.apache.spark.sql.catalyst XxHash64):
* seed is 42 for the first child;
* a STRING column hashes its UTF-8 bytes           -> :func:`xxh64_bytes`
* a LONG   column hashes its 8 little-endian bytes -> :func:`hash_long`
* an INT   column hashes its 4 little-endian bytes -> :func:`hash_int`
* multi-arg ``xxhash64(a, b)`` folds left: the hash of ``a`` becomes the
  seed when hashing ``b``.

The vectorized variants (`hash_long_vec`, `hash_int_vec`) run the same
single-block path on numpy uint64 arrays — used by the dedup golden builder
to mix thousands of MinHash permutations without a Python-level loop.

A unit test (tests/test_xxh64.py) pins every entry point against Spark's
``F.xxhash64`` on literals covering all length classes (empty, <4, <8, <32,
>=32 bytes, multibyte UTF-8, negative longs, chained seeds).
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, x: int) -> int:
    acc = (acc + x * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """XXH64 of a byte string, returned as a SIGNED 64-bit int (Spark long)."""
    n = len(data)
    i = 0
    seed &= _M
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
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
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _signed(_fmix(h))


def xxh64_str(s: str, seed: int = 42) -> int:
    return xxh64_bytes(s.encode("utf-8"), seed)


def hash_long(value: int, seed: int = 42) -> int:
    """Spark ``xxhash64(<long col>)``: XXH64 of the 8 LE bytes of the long."""
    return xxh64_bytes((value & _M).to_bytes(8, "little"), seed)


def hash_int(value: int, seed: int = 42) -> int:
    """Spark ``xxhash64(<int col>)``: XXH64 of the 4 LE bytes of the int."""
    return xxh64_bytes((value & 0xFFFFFFFF).to_bytes(4, "little"), seed)


# ---------------------------------------------------------------------------
# NumPy-vectorized single-block paths (uint64 modular arithmetic)
# ---------------------------------------------------------------------------


def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    return (x << r_) | (x >> np.uint64(64 - r))


def _fmix_v(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(_P2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(_P3)
    return h ^ (h >> np.uint64(32))


def hash_long_vec(values: np.ndarray, seed) -> np.ndarray:
    """Vectorized :func:`hash_long`. ``values`` int64/uint64 array; ``seed``
    scalar or same-shape uint64 array. Returns uint64 (two's complement)."""
    v = values.astype(np.uint64, copy=False)
    s = np.uint64(seed & _M) if isinstance(seed, int) else seed.astype(np.uint64, copy=False)
    h = s + np.uint64((_P5 + 8) & _M)
    k = _rotl_v(v * np.uint64(_P2), 31) * np.uint64(_P1)
    h = h ^ k
    h = _rotl_v(h, 27) * np.uint64(_P1) + np.uint64(_P4)
    return _fmix_v(h)


def hash_int_vec(value: int, seeds: np.ndarray) -> np.ndarray:
    """Vectorized :func:`hash_int` with a fixed int and per-element seeds."""
    s = seeds.astype(np.uint64, copy=False)
    h = s + np.uint64((_P5 + 4) & _M)
    # fold the scalar product in Python ints (numpy warns on scalar overflow)
    h = h ^ np.uint64(((value & 0xFFFFFFFF) * _P1) & _M)
    h = _rotl_v(h, 23) * np.uint64(_P2) + np.uint64(_P3)
    return _fmix_v(h)


def to_signed(h: np.ndarray) -> np.ndarray:
    return h.astype(np.int64, copy=False)
