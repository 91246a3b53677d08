"""Stable, process-independent hashing primitives.

Everything here is deterministic across processes, machines and Python
versions (no reliance on ``hash()`` / PYTHONHASHSEED).  Used for

* per-row RNG seeds in the fixture generators (splitmix64),
* feature hashing in the from-scratch langid model (crc32),
* content fingerprints / dedup keys (fnv1a64 / polynomial rolling hash).

The reference partitions rows with xxhash32 over concatenated column
values (open_thoughts_3/engine/operators/group_by_operator.py:99-104) and
derives ids with md5 (open_thoughts/code/standardize.py:65-66); we use the
same *idea* (stable content hashing) with stdlib-only primitives.
"""

from __future__ import annotations

import zlib

import numpy as np

_U64 = np.uint64

_SPLITMIX_GAMMA = _U64(0x9E3779B97F4A7C15)
_MIX1 = _U64(0xBF58476D1CE4E5B9)
_MIX2 = _U64(0x94D049BB133111EB)

FNV64_OFFSET = 0xCBF29CE484222325
FNV64_PRIME = 0x100000001B3


def splitmix64(x: np.ndarray | int) -> np.ndarray | int:
    """SplitMix64 mix function; vectorized over uint64 arrays.

    A high-quality, stable 64-bit mixer — used to derive independent
    per-row seeds as ``splitmix64(global_seed ^ row_index)``.
    """
    scalar = np.isscalar(x)
    z = np.asarray(x, dtype=_U64) + _SPLITMIX_GAMMA
    with np.errstate(over="ignore"):
        z = (z ^ (z >> _U64(30))) * _MIX1
        z = (z ^ (z >> _U64(27))) * _MIX2
        z = z ^ (z >> _U64(31))
    return int(z) if scalar else z


def row_seed(table_seed: int, i: int) -> int:
    """Deterministic per-row seed: independent of partition layout."""
    return splitmix64((table_seed << 32) ^ i) & 0x7FFFFFFF


def crc32_str(s: str) -> int:
    """Stable 32-bit string hash (zlib.crc32 — C-speed, stdlib)."""
    return zlib.crc32(s.encode("utf-8"))


def fnv1a64(data: bytes) -> int:
    """FNV-1a 64-bit over bytes (unsigned)."""
    h = FNV64_OFFSET
    for b in data:
        h ^= b
        h = (h * FNV64_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a64_str(s: str) -> int:
    return fnv1a64(s.encode("utf-8"))


_ROLL_MOD = (1 << 61) - 1  # Mersenne prime 2^61-1
_ROLL_BASE = 1_000_003


def rolling_fingerprint(s: str) -> int:
    """Polynomial rolling hash of a string mod 2^61-1 (document
    fingerprinting; content-addressed identity like the reference's md5
    problem ids, open_thoughts/code/standardize.py:65-66)."""
    h = 0
    for ch in s:
        h = (h * _ROLL_BASE + ord(ch)) % _ROLL_MOD
    return h


def uint64_to_int64(x: np.ndarray | int):
    """Reinterpret uint64 as int64 (two's complement) for Arrow int64
    columns (e.g. the phash column)."""
    if np.isscalar(x) or isinstance(x, int):
        return int(np.asarray(x, dtype=_U64).view(np.int64))
    return np.asarray(x, dtype=_U64).view(np.int64)


def int64_to_uint64(x: np.ndarray | int):
    if np.isscalar(x) or isinstance(x, int):
        return int(np.asarray(x, dtype=np.int64).view(_U64))
    return np.asarray(x, dtype=np.int64).view(_U64)
