"""MurmurHash3 x64_128 — from-spec pure-Python implementation + Spark UDF wrappers.

Why this exists
---------------
The reference hashes favicon bytes with ``mmh3.hash64(content)[0]``
(``/root/reference/httpz_scanner/parsers.py:249-250``) and the engine's
north-star mandates murmur3-hashed canonical URLs for the frontier seen-set.
The ``mmh3`` wheel is not available in this environment, so we implement
MurmurHash3 x64_128 directly from the public algorithm (Austin Appleby's
MurmurHash3, public domain).  ``mmh3.hash64(data)`` is defined as the two
64-bit halves of MurmurHash3_x64_128 interpreted as *signed* int64, seed 0 —
``hash64_low`` below is bit-compatible with ``mmh3.hash64(data)[0]``.

Correctness is pinned by the SMHasher verification value for
MurmurHash3_x64_128 (``0x6384BA69``) in ``tests/test_hashing.py``.

Scale notes
-----------
* These hashes run inside Arrow-batched pandas UDFs (never per-row Python
  UDFs registered on the JVM hot path).
* Spark's builtin ``F.hash()`` (murmur3 **x86_32**, seed 42) is used ONLY for
  partition routing (``pmod(hash(host), P)``) where bit-compat with mmh3 is
  irrelevant; the 64-bit identity hash of a URL is always ``url_hash64``.
"""

from __future__ import annotations

import pandas as pd

_MASK64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3_x64_128(data, seed) -> (h1, h2) as unsigned 64-bit ints."""
    length = len(data)
    nblocks = length // 16
    h1 = seed & _MASK64
    h2 = seed & _MASK64

    view = memoryview(data)
    for i in range(nblocks):
        base = i * 16
        k1 = int.from_bytes(view[base : base + 8], "little")
        k2 = int.from_bytes(view[base + 8 : base + 16], "little")

        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64

        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64

    tail = bytes(view[nblocks * 16 :])
    tl = len(tail)
    if tl > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    if tl > 0:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def hash64_pair(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Bit-compatible with ``mmh3.hash64(data, seed)`` (signed=True default)."""
    h1, h2 = murmur3_x64_128(data, seed)
    return _to_signed64(h1), _to_signed64(h2)


def hash64_low(data: bytes, seed: int = 0) -> int:
    """``mmh3.hash64(data)[0]`` — the favicon-hash / url_hash primitive
    (reference usage: ``parsers.py:249``)."""
    return _to_signed64(murmur3_x64_128(data, seed)[0])


# ---------------------------------------------------------------------------
# Batched (pandas-UDF-friendly) variants.  These receive whole Arrow batches;
# the per-key loop is Python but amortized over the batch (no per-row UDF
# dispatch, no JVM<->Python row churn).
# ---------------------------------------------------------------------------

def hash64_str_batch(s: pd.Series, seed: int = 0) -> pd.Series:
    """Series[str|None] -> Series[int64]: signed mmh3-compatible 64-bit hash
    of the UTF-8 encoding.  Nulls hash to null."""
    out = [
        None if v is None else hash64_low(v.encode("utf-8"), seed)
        for v in s
    ]
    return pd.Series(out, dtype="Int64")


def hash64_bytes_batch(s: pd.Series, seed: int = 0) -> pd.Series:
    out = [None if v is None else hash64_low(bytes(v), seed) for v in s]
    return pd.Series(out, dtype="Int64")


def favicon_hash_batch(s: pd.Series) -> pd.Series:
    """Reference favicon-hash semantics (``parsers.py:247-250``):
    empty/None content -> None; hash value 0 -> None; else str(signed int64)."""
    out = []
    for v in s:
        if v is None or len(v) == 0:
            out.append(None)
            continue
        h = hash64_low(bytes(v))
        out.append(str(h) if h != 0 else None)
    return pd.Series(out, dtype="object")


def smhasher_verification(hashbytes: int = 16) -> int:
    """SMHasher VerificationTest for MurmurHash3_x64_128.

    Hash keys of the form [0,1,...,len-1] for len 0..255, seeded with
    256-len; hash the concatenated 256*16 result bytes with seed 0; the
    verification value is the low 32 bits of the first 8-byte word.
    Expected: 0x6384BA69.
    """
    buf = bytearray()
    for i in range(256):
        key = bytes(range(i))
        h1, h2 = murmur3_x64_128(key, 256 - i)
        buf += h1.to_bytes(8, "little") + h2.to_bytes(8, "little")
    f1, _ = murmur3_x64_128(bytes(buf), 0)
    return f1 & 0xFFFFFFFF
