"""Murmur3 x64_128 correctness — pinned to the public SMHasher constant."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from httpz_spark.functions.hashing import (
    favicon_hash_batch,
    hash64_low,
    hash64_pair,
    hash64_str_batch,
    murmur3_x64_128,
    smhasher_verification,
)


def test_smhasher_verification_value():
    # Authoritative public verification value for MurmurHash3_x64_128.
    assert smhasher_verification() == 0x6384BA69


def test_known_vectors():
    # Widely-published mmh3 values (mmh3.hash64(b'foo') etc.).
    assert hash64_pair(b"foo") == (-2129773440516405919, 9128664383759220103)
    assert murmur3_x64_128(b"") == (0, 0)


@given(st.binary(min_size=0, max_size=64), st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=200, deadline=None)
def test_range_and_determinism(data, seed):
    h1a, h2a = murmur3_x64_128(data, seed)
    h1b, h2b = murmur3_x64_128(data, seed)
    assert (h1a, h2a) == (h1b, h2b)
    assert 0 <= h1a < 2**64 and 0 <= h2a < 2**64
    s1, _ = hash64_pair(data, seed)
    assert -(2**63) <= s1 < 2**63


def test_batch_matches_scalar():
    vals = ["", "a", "example.com", "https://h1.test/img00000001", None]
    out = hash64_str_batch(pd.Series(vals))
    for v, h in zip(vals, out):
        if v is None:
            assert pd.isna(h)
        else:
            assert h == hash64_low(v.encode("utf-8"))


def test_favicon_hash_semantics():
    # parsers.py:247-250 — empty -> None; value is str(signed 64-bit).
    out = favicon_hash_batch(pd.Series([None, b"", b"\x89PNG fake icon"]))
    assert out[0] is None and out[1] is None
    assert out[2] == str(hash64_low(b"\x89PNG fake icon"))


@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=64)),
        min_size=1, max_size=64,
    )
)
@settings(max_examples=100, deadline=None)
def test_vectorized_matches_scalar(vals):
    from httpz_spark.functions.hashing import hash64_str_batch_np

    s = pd.Series(vals, dtype="object")
    a = hash64_str_batch(s)
    b = hash64_str_batch_np(s)
    for i in range(len(vals)):
        if vals[i] is None:
            assert pd.isna(a.iloc[i]) and pd.isna(b.iloc[i])
        else:
            assert a.iloc[i] == b.iloc[i], repr(vals[i])
