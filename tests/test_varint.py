"""Codec-core correctness tests, re-expressing the reference's test strategy
(SURVEY.md §5, /root/reference/src/lib.rs tests) over NumPy batches:
known-vector roundtrips at every 7-bit boundary, overflow, truncation,
boundary corpus, and differential testing against a scalar LEB128 oracle.
No Ray involvement."""

import numpy as np
import pytest

from tokenzip.codecs.varint import (
    MAX_VARINT_BYTES,
    decode_leb128,
    decode_leb128_len,
    decode_leb128_zigzag,
    encode_leb128,
    encode_leb128_zigzag,
    leb128_decode_scalar,
    leb128_encode_scalar,
    leb128_size,
    zigzag_decode,
    zigzag_encode,
)
from tokenzip.errors import VarintOverflowError, VarintTruncatedError

# Canonical boundary corpus — NUMS_U8/U16/U32/U64 of
# /root/reference/src/lib.rs:297-353: every 7-bit length boundary, 300, MAX.
NUMS_U8 = [0, 1, 127, 128, 255]
NUMS_U16 = [0, 1, 127, 128, 300, 16383, 16384, 65535]
NUMS_U32 = [0, 1, 127, 128, 300, 16383, 16384, 2097151, 2097152, 268435455,
            268435456, 4294967295]
NUMS_U64 = NUMS_U32[:-1] + [34359738367, 34359738368, 4398046511103,
                            4398046511104, 562949953421311, 562949953421312,
                            72057594037927935, 72057594037927936,
                            9223372036854775807, 9223372036854775808,
                            18446744073709551615]

# Known encode vectors ("borrowed from prost", /root/reference/src/lib.rs:87-185).
KNOWN_VECTORS = [
    (0, b"\x00"),
    (1, b"\x01"),
    (127, b"\x7f"),
    (128, b"\x80\x01"),
    (300, b"\xac\x02"),          # src/lib.rs:105
    (16383, b"\xff\x7f"),
    (16384, b"\x80\x80\x01"),
    (2**32 - 1, b"\xff\xff\xff\xff\x0f"),
    (2**64 - 1, b"\xff" * 9 + b"\x01"),  # u64::MAX -> 10 bytes, src/lib.rs:183
]


def test_known_vectors_encode():
    for value, expected in KNOWN_VECTORS:
        assert encode_leb128(np.array([value], dtype=np.uint64)) == expected
        assert leb128_encode_scalar(value) == expected


def test_known_vectors_decode():
    for value, expected in KNOWN_VECTORS:
        got = decode_leb128(expected, 1, width=64)
        assert int(got[0]) == value
        sval, slen = leb128_decode_scalar(expected, 0, width=64)
        assert sval == value and slen == len(expected)


@pytest.mark.parametrize("width,nums", [(8, NUMS_U8), (16, NUMS_U16),
                                        (32, NUMS_U32), (64, NUMS_U64)])
def test_boundary_roundtrip(width, nums):
    u = np.array(nums, dtype=np.uint64)
    blob = encode_leb128(u)
    # stream walk with the scalar oracle must agree (differential structure of
    # /root/reference/fuzz/fuzz_targets/fuzz_target_1.rs)
    off = 0
    for v in nums:
        sval, slen = leb128_decode_scalar(blob, off, width=64)
        assert sval == v
        off += slen
    assert off == len(blob)
    got = decode_leb128(blob, len(nums), width=width)
    np.testing.assert_array_equal(got.astype(np.uint64), u)
    np.testing.assert_array_equal(decode_leb128_len(blob), leb128_size(u))


def test_zigzag_known_vector():
    # -20 -> 0x27 (doctest /root/reference/src/encode/mod.rs:31-35)
    assert encode_leb128_zigzag(np.array([-20], dtype=np.int32), 32) == b"\x27"
    got = decode_leb128_zigzag(b"\x27", 1, width=32)
    assert int(got[0]) == -20


@pytest.mark.parametrize("width", [8, 16, 32, 64])
def test_zigzag_bijection(width):
    info = np.iinfo(getattr(np, f"int{width}"))
    rng = np.random.default_rng(42)
    x = rng.integers(info.min, info.max, size=10_000, endpoint=True).astype(f"int{width}")
    x = np.concatenate([x, np.array([info.min, info.min + 1, -1, 0, 1, info.max],
                                    dtype=f"int{width}")])
    u = zigzag_encode(x, width)
    assert u.dtype == np.dtype(f"uint{width}")
    np.testing.assert_array_equal(zigzag_decode(u, width), x)
    # small known values: 0->0, -1->1, 1->2, -2->3 (protobuf zigzag table)
    small = zigzag_encode(np.array([0, -1, 1, -2, 2], dtype=f"int{width}"), width)
    np.testing.assert_array_equal(small.astype(np.int64), [0, 1, 2, 3, 4])


@pytest.mark.parametrize("width", [8, 16, 32])
def test_overflow_wider_value_into_narrower_width(width):
    # /root/reference/src/lib.rs:188-209: decode of MAX+1 at width errs
    too_big = np.array([np.iinfo(f"uint{width}").max + 1], dtype=np.uint64)
    blob = encode_leb128(too_big)
    with pytest.raises(VarintOverflowError):
        decode_leb128(blob, 1, width=width)
    with pytest.raises(VarintOverflowError):
        leb128_decode_scalar(blob, 0, width=width)
    # MAX itself decodes fine
    ok = np.array([np.iinfo(f"uint{width}").max], dtype=np.uint64)
    got = decode_leb128(encode_leb128(ok), 1, width=width)
    assert int(got[0]) == int(ok[0])


def test_overflow_too_long_varint():
    blob = b"\x80" * 10 + b"\x01"  # 11 bytes > MAX_VARINT_BYTES[64]
    with pytest.raises(VarintOverflowError):
        decode_leb128(blob, 1, width=64)


def test_truncation_every_prefix():
    # /root/reference/src/lib.rs:212-222: every strict prefix of an
    # i-byte varint errs NotEnoughBytes
    for value in (300, 2**28, 2**63):
        blob = leb128_encode_scalar(value)
        for cut in range(len(blob)):
            with pytest.raises(VarintTruncatedError):
                decode_leb128(blob[:cut], 1, width=64)
            if cut:
                with pytest.raises(VarintTruncatedError):
                    leb128_decode_scalar(blob[:cut], 0, width=64)


def test_trailing_padding_ignored():
    # /root/reference/src/decode/mod.rs:134: data after the requested varints
    # is ignored
    blob = encode_leb128(np.array([300, 7], dtype=np.uint64)) + b"\x00" * 14
    got = decode_leb128(blob, 2, width=32)
    np.testing.assert_array_equal(got.astype(np.int64), [300, 7])


def test_fewer_values_than_promised():
    blob = encode_leb128(np.array([1, 2, 3], dtype=np.uint64))
    with pytest.raises(VarintTruncatedError):
        decode_leb128(blob, 4, width=32)


def test_empty_stream():
    assert encode_leb128(np.empty(0, dtype=np.uint64)) == b""
    assert len(decode_leb128(b"", 0, width=32)) == 0
    assert len(decode_leb128(b"", None, width=32)) == 0


@pytest.mark.parametrize("width", [8, 16, 32, 64])
def test_differential_random_vs_scalar_oracle(width):
    # analog of the reference's fuzz-vs-integer-encoding differential tests
    rng = np.random.default_rng(1234 + width)
    u = rng.integers(0, np.iinfo(f"uint{width}").max, size=5_000,
                     endpoint=True, dtype=np.uint64)
    blob = encode_leb128(u)
    oracle = b"".join(leb128_encode_scalar(int(v)) for v in u)
    assert blob == oracle
    got = decode_leb128(blob, len(u), width=width)
    np.testing.assert_array_equal(got.astype(np.uint64), u)
    assert int(leb128_size(u).sum()) == len(blob)


def test_max_varint_bytes_table():
    # MAX_VARINT_BYTES per width (/root/reference/src/num.rs:50,131,213,301)
    assert MAX_VARINT_BYTES == {8: 2, 16: 3, 32: 5, 64: 10}
    for width, maxb in MAX_VARINT_BYTES.items():
        top = np.array([np.iinfo(f"uint{width}").max], dtype=np.uint64)
        assert int(leb128_size(top)[0]) == maxb
