"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Implements the public xxHash-64 algorithm (Y. Collet,
https://github.com/Cyan4973/xxHash — BSD; algorithm spec is public) with
the same input mapping Spark's ``XxHash64`` expression uses
(``org.apache.spark.sql.catalyst.expressions.XxHash64`` /
``org.apache.spark.unsafe.hash.XXH64`` in the Apache Spark sources):

- default seed 42;
- ``LongType`` values hash as the 8-byte little-endian word (``hashLong``);
- ``IntegerType`` literals hash via the 4-byte path (``hashInt``);
- strings hash their UTF-8 bytes (``hashUnsafeBytes``);
- multi-argument ``xxhash64(a, b, ...)`` CHAINS: the running hash seeds the
  next field's hash.

This exists so expected-value fixtures (tests/fixtures) can be computed in
plain Python, fully independent of the Spark runtime — the independence
that turns rows-only corpus entries into hash-checked ones.  Equality with
Spark is pinned in ``tests/test_expected_fixtures.py``.
"""

from __future__ import annotations

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int = DEFAULT_SEED) -> int:
    """XXH64 of one 64-bit word (Spark hashes long/bigint inputs this way)."""
    value &= MASK
    h = (seed + P5 + 8) & MASK
    k1 = _rotl((value * P2) & MASK, 31) * P1 & MASK
    h ^= k1
    h = ((_rotl(h, 27) * P1) + P4) & MASK
    return _fmix(h)


def hash_int(value: int, seed: int = DEFAULT_SEED) -> int:
    """XXH64 4-byte path (Spark hashes int/short/byte inputs this way)."""
    h = (seed + P5 + 4) & MASK
    h ^= ((value & 0xFFFFFFFF) * P1) & MASK
    h = ((_rotl(h, 23) * P2) + P3) & MASK
    return _fmix(h)


def hash_bytes(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """Standard XXH64 over a byte buffer (Spark's hashUnsafeBytes)."""
    import struct

    length = len(data)
    offset = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while offset + 32 <= length:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, offset)
            v1 = (_rotl((v1 + k1 * P2) & MASK, 31) * P1) & MASK
            v2 = (_rotl((v2 + k2 * P2) & MASK, 31) * P1) & MASK
            v3 = (_rotl((v3 + k3 * P2) & MASK, 31) * P1) & MASK
            v4 = (_rotl((v4 + k4 * P2) & MASK, 31) * P1) & MASK
            offset += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & MASK, 31) * P1) & MASK
            h = ((h * P1) + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + length) & MASK
    while offset + 8 <= length:
        (k1,) = struct.unpack_from("<Q", data, offset)
        h ^= (_rotl((k1 * P2) & MASK, 31) * P1) & MASK
        h = ((_rotl(h, 27) * P1) + P4) & MASK
        offset += 8
    if offset + 4 <= length:
        (k1,) = struct.unpack_from("<I", data, offset)
        h ^= (k1 * P1) & MASK
        h = ((_rotl(h, 23) * P2) + P3) & MASK
        offset += 4
    while offset < length:
        h ^= (data[offset] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        offset += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*values, seed: int = DEFAULT_SEED) -> int:
    """Mirror of Spark's ``F.xxhash64(*cols)``: chain the fields, return a
    SIGNED 64-bit int (Spark longs are signed).

    Field typing mirrors Spark's coercion in this codebase's call sites:
    Python int -> LongType (``hash_long``), ``("int", n)`` -> IntegerType
    (``hash_int``), str -> UTF-8 bytes, bytes -> bytes.  ``None`` fields
    are skipped (Spark hash expressions ignore null children).
    """
    h = seed
    for v in values:
        if v is None:
            continue
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "int":
            h = hash_int(v[1], h)
        elif isinstance(v, bool):
            raise TypeError("bool hashing not mirrored")
        elif isinstance(v, int):
            h = hash_long(v, h)
        elif isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = hash_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported type for xxhash64: {type(v)}")
    return _to_signed(h)
