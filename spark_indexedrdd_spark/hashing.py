"""Driver-side reimplementation of Spark's ``F.hash`` (Murmur3 x86_32).

Spark's hash partitioning places a row produced by ``df.repartition(n,
*keys)`` in physical partition ``pmod(hash(keys), n)``, where ``hash`` is
the Catalyst Murmur3 expression with seed 42 (the public algorithm from
``org.apache.spark.unsafe.hash.Murmur3_x86_32`` and
``sql/catalyst/expressions/hash.scala``). Reimplementing it in pure
Python lets the DRIVER compute each key's owning partition without
launching a Spark job — the reference computes owning partitions with its
partitioner on the driver the same way (reference IndexedRDD.scala:80-83)
before scheduling only those partitions.

Semantics mirrored here (verified against ``F.hash`` in
tests/test_point_lookup.py):

- int/short/byte/boolean/date  -> hashInt of the 32-bit value
- long/timestamp               -> hashLong of the 64-bit value
- float                        -> hashInt of the IEEE bits (-0.0 == 0.0)
- double                       -> hashLong of the IEEE bits (-0.0 == 0.0)
- string/binary                -> hashUnsafeBytes over UTF-8 bytes
- multi-column                 -> seed-chained: h = hash(c2, seed=hash(c1, 42))
- NULL column                  -> leaves the running seed unchanged
"""

from __future__ import annotations

import datetime
import struct
from typing import Any, Callable

_M32 = 0xFFFFFFFF
_EPOCH = datetime.date(1970, 1, 1)


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def hash_int32(v: int, seed: int) -> int:
    """Murmur3_x86_32.hashInt (unsigned 32-bit result)."""
    return _fmix(_mix_h1(seed & _M32, _mix_k1(v & _M32)), 4)


def hash_int64(v: int, seed: int) -> int:
    """Murmur3_x86_32.hashLong (unsigned 32-bit result)."""
    h1 = _mix_h1(seed & _M32, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
    return _fmix(h1, 8)


def hash_bytes(b: bytes, seed: int) -> int:
    """Murmur3_x86_32.hashUnsafeBytes: 4-byte little-endian words, then
    trailing SIGNED bytes one at a time (unsigned 32-bit result)."""
    h1 = seed & _M32
    n = len(b)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(b[i : i + 4], "little")))
    for i in range(aligned, n):
        byte = b[i]
        if byte >= 0x80:
            byte -= 0x100  # Java bytes are signed
        h1 = _mix_h1(h1, _mix_k1(byte & _M32))
    return _fmix(h1, n)


def _hash_date(v: datetime.date, seed: int) -> int:
    return hash_int32((v - _EPOCH).days, seed)


def _hash_float(v: float, seed: int) -> int:
    if v == 0.0:
        v = 0.0  # normalize -0.0
    return hash_int32(struct.unpack("<i", struct.pack("<f", v))[0], seed)


def _hash_double(v: float, seed: int) -> int:
    if v == 0.0:
        v = 0.0  # normalize -0.0
    return hash_int64(struct.unpack("<q", struct.pack("<d", v))[0], seed)


# Catalyst type name (DataType.typeName()) -> scalar hasher
_HASHERS: dict[str, Callable[[Any, int], int]] = {
    "byte": hash_int32,
    "short": hash_int32,
    "integer": hash_int32,
    "date": _hash_date,
    "boolean": lambda v, s: hash_int32(1 if v else 0, s),
    "long": hash_int64,
    # timestamp intentionally absent: Spark hashes micros-since-epoch-UTC,
    # but a naive Python datetime's UTC offset depends on the SESSION
    # timezone — driver-side hashing would silently miss keys in non-UTC
    # sessions. Timestamp keys take the ask-Spark fallback instead.
    "float": _hash_float,
    "double": _hash_double,
    "string": lambda v, s: hash_bytes(v.encode("utf-8"), s),
    "binary": lambda v, s: hash_bytes(bytes(v), s),
}


def hashers_for_schema(schema) -> list[Callable[[Any, int], int]] | None:
    """Per-field hasher chain for a StructType, or None if any field's
    type has no driver-side implementation (caller falls back to asking
    Spark)."""
    out = []
    for f in schema.fields:
        h = _HASHERS.get(f.dataType.typeName())
        if h is None:
            return None
        out.append(h)
    return out


def spark_hash_tuple(
    values: tuple, hashers: list[Callable[[Any, int], int]], seed: int = 42
) -> int:
    """Seed-chained multi-column ``F.hash(*cols)`` (signed 32-bit, exactly
    Spark's Java int result)."""
    h = seed & _M32
    for v, hf in zip(values, hashers):
        if v is not None:  # NULL leaves the seed unchanged
            h = hf(v, h)
    return h - 0x100000000 if h >= 0x80000000 else h


def spark_partition_of(
    values: tuple, hashers: list[Callable[[Any, int], int]], n: int
) -> int:
    """``pmod(F.hash(*keys), n)`` — the physical partition id that
    ``df.repartition(n, *keys)`` assigns this key."""
    return spark_hash_tuple(values, hashers) % n
