"""Property-based tests (hypothesis) — the engine analog of the reference's
cargo-fuzz differential targets (/root/reference/fuzz/fuzz_targets/*):
arbitrary inputs, SIMD-style vectorized implementation vs scalar oracle."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tokenzip.codecs.core import INT_CODECS, decode_int_column, encode_int_column
from tokenzip.codecs.strings import decode_str_column, encode_str_column
from tokenzip.codecs.varint import (
    decode_leb128,
    encode_leb128,
    leb128_encode_scalar,
    leb128_size,
    zigzag_decode,
    zigzag_encode,
)

i32 = st.integers(-(2**31), 2**31 - 1)
u64 = st.integers(0, 2**64 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(u64, max_size=200))
def test_leb128_matches_scalar_oracle(vals):
    u = np.array(vals, dtype=np.uint64)
    blob = encode_leb128(u)
    assert blob == b"".join(leb128_encode_scalar(v) for v in vals)
    got = decode_leb128(blob, len(vals), width=64)
    np.testing.assert_array_equal(got.astype(np.uint64), u)
    assert int(leb128_size(u).sum()) == len(blob)


@settings(max_examples=200, deadline=None)
@given(st.lists(i32, max_size=200))
def test_zigzag_roundtrip_and_order(vals):
    x = np.array(vals, dtype=np.int32)
    u = zigzag_encode(x, 32)
    np.testing.assert_array_equal(zigzag_decode(u, 32), x)
    # zigzag maps small magnitudes to small codes: |x| <= 2^k => u < 2^(k+1)
    assert (u.astype(np.int64) <= 2 * np.abs(x.astype(np.int64))).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(i32, max_size=300), st.sampled_from(sorted(INT_CODECS)))
def test_every_int_codec_roundtrips_any_input(vals, codec):
    x = np.array(vals, dtype=np.int32)
    blob = encode_int_column(x, codec, width=32)
    np.testing.assert_array_equal(decode_int_column(blob, dtype=np.int32), x)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=100))
def test_string_auto_codec_roundtrips_any_input(vals):
    import pyarrow as pa

    arr = pa.array(vals, pa.string())
    assert decode_str_column(encode_str_column(arr, "auto")).to_pylist() == vals


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=60))
def test_fsst_any_bytes(blobs):
    # exercise fsst on arbitrary byte content via latin-1 round-trippable text
    import pyarrow as pa

    vals = [b.decode("latin-1") for b in blobs]
    arr = pa.array(vals, pa.string())
    got = decode_str_column(encode_str_column(arr, "fsst")).to_pylist()
    assert got == vals


@settings(deadline=None, max_examples=60)
@given(
    bits=st.lists(st.integers(0, 2**64 - 1), max_size=200),
    width=st.sampled_from([32, 64]),
)
def test_float_codec_roundtrips_any_bit_pattern(bits, width):
    """Every uint bit pattern — including NaN payloads, denormals, ±inf,
    -0.0 — roundtrips bit-exactly through all three float codecs' selector."""
    from tokenzip.codecs.core import decode_float_column, encode_float_column

    udt = np.uint32 if width == 32 else np.uint64
    fdt = np.float32 if width == 32 else np.float64
    u = np.array([b & (2**width - 1) for b in bits], dtype=udt)
    v = u.view(fdt)
    out = decode_float_column(encode_float_column(v, width))
    assert out.dtype == fdt
    assert np.array_equal(u, out.view(udt))
