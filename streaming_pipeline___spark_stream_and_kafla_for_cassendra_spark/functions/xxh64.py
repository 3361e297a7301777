"""Pure-Python port of Spark's ``xxhash64`` expression (XXH64 with
per-column chaining), for oracle generators that must replay
hash-seeded initializations OUTSIDE the JVM.

Spark's ``F.xxhash64(c1, c2, ...)`` starts from seed 42 and folds
each column through the type-specific XXH64 primitive with the
running hash as the seed: integral 1/2/4-byte types go through
``hashInt`` on their sign-extended 32-bit value, 8-byte longs
through ``hashLong`` (see
``org.apache.spark.sql.catalyst.expressions.XxHash64Function`` /
``org.apache.spark.unsafe.hash.XXH64``). Only the int/long paths are
ported — that is the full surface the engine's deterministic factor
initializations use (``operators/als.py::_init_factors``).

Parity with the JVM is pinned by ``tests/test_xxh64.py``, which
compares against ``F.xxhash64`` on a value grid.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_PRIME1 = 0x9E3779B185EBCA87
_PRIME2 = 0xC2B2AE3D27D4EB4F
_PRIME3 = 0x165667B19E3779F9
_PRIME4 = 0x85EBCA77C2B2AE63
_PRIME5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _PRIME2) & _MASK
    h ^= h >> 29
    h = (h * _PRIME3) & _MASK
    h ^= h >> 32
    return h


def _to_u64(v: int) -> int:
    return v & _MASK


def hash_int(value: int, seed: int) -> int:
    """XXH64.hashInt: the 4-byte primitive (Spark int/short/byte/
    boolean columns). ``value`` is the signed 32-bit column value."""
    hash_ = (_to_u64(seed) + _PRIME5 + 4) & _MASK
    hash_ ^= ((value & 0xFFFFFFFF) * _PRIME1) & _MASK
    hash_ = (_rotl(hash_, 23) * _PRIME2 + _PRIME3) & _MASK
    return _fmix(hash_)


def hash_long(value: int, seed: int) -> int:
    """XXH64.hashLong: the 8-byte primitive (Spark long/double-bits/
    timestamp columns). ``value`` is the signed 64-bit column value."""
    hash_ = (_to_u64(seed) + _PRIME5 + 8) & _MASK
    k1 = (_rotl((_to_u64(value) * _PRIME2) & _MASK, 31) * _PRIME1) & _MASK
    hash_ ^= k1
    hash_ = (_rotl(hash_, 27) * _PRIME1 + _PRIME4) & _MASK
    return _fmix(hash_)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*cols: tuple[str, int], seed: int = 42) -> int:
    """Spark ``F.xxhash64`` over typed integral columns: each element
    is ``("int"|"long", value)``; returns the signed 64-bit result."""
    h = seed
    for kind, value in cols:
        if kind == "int":
            h = hash_int(value, h)
        elif kind == "long":
            h = hash_long(value, h)
        else:  # pragma: no cover - guard
            raise ValueError(f"unsupported xxhash64 column kind: {kind}")
    return _signed(h)
