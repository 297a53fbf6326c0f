"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` on string columns.

Spark's ``xxhash64(col)`` hashes the UTF-8 bytes of a string with the
standard XXH64 algorithm, seed 42 (org.apache.spark.sql.catalyst
.expressions.XxHash64 — public Apache Spark source). The single-process
oracle crawler must compute the *same* url_hash values as the Spark job,
so we carry a reference implementation here; a parity test pins it
against the JVM built-in.

The Spark hot path always uses the JVM built-in (``F.xxhash64``); this
module is only for the oracle, fixtures, and the synthetic-world
generator (where determinism across Python and Spark matters).
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF
PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME64_2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME64_1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * PRIME64_1 + PRIME64_4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Standard XXH64 over ``data`` → unsigned 64-bit int."""
    n = len(data)
    idx = 0
    if n >= 32:
        v1 = (seed + PRIME64_1 + PRIME64_2) & MASK64
        v2 = (seed + PRIME64_2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - PRIME64_1) & MASK64
        limit = n - 32
        while idx <= limit:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME64_5) & MASK64
    h = (h + n) & MASK64
    while idx + 8 <= n:
        k1 = _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * PRIME64_1 + PRIME64_4) & MASK64
        idx += 8
    if idx + 4 <= n:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * PRIME64_1) & MASK64
        h = (_rotl(h, 23) * PRIME64_2 + PRIME64_3) & MASK64
        idx += 4
    while idx < n:
        h ^= (data[idx] * PRIME64_5) & MASK64
        h = (_rotl(h, 11) * PRIME64_1) & MASK64
        idx += 1
    h ^= h >> 33
    h = (h * PRIME64_2) & MASK64
    h ^= h >> 29
    h = (h * PRIME64_3) & MASK64
    h ^= h >> 32
    return h


def to_i64(u: int) -> int:
    """Unsigned 64-bit → Java signed long (what Spark returns)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed-64 XXH64 of a string's UTF-8 bytes — matches
    ``F.xxhash64(lit(s))`` in Spark (parity-pinned in tests)."""
    return to_i64(xxh64(s.encode("utf-8"), seed))


def xxhash64_bytes(b: bytes, seed: int = SPARK_SEED) -> int:
    return to_i64(xxh64(b, seed))
