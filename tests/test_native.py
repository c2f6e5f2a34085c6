"""Differential tests: the native C LEB128 kernels vs the NumPy kernels —
the engine's analog of the reference's fuzz-vs-integer-encoding setup
(/root/reference/fuzz/fuzz_targets/fuzz_target_1.rs:6-15) applied between
the engine's own two implementations of the same contract."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tokenzip.codecs import native as N
from tokenzip.codecs.varint import (
    MAX_LAST_VARINT_BYTE,
    MAX_VARINT_BYTES,
    decode_leb128,
    encode_leb128,
    leb128_size,
)
from tokenzip.errors import VarintOverflowError, VarintTruncatedError

pytestmark = pytest.mark.skipif(
    not N.HAVE_NATIVE, reason="no C compiler available — NumPy path only"
)


def _numpy_encode(u):
    # force the NumPy bucketed-gather path regardless of the native build
    lib, N.LIB = N.LIB, None
    try:
        return encode_leb128(u)
    finally:
        N.LIB = lib


def _numpy_decode(blob, n, width):
    lib, N.LIB = N.LIB, None
    try:
        return decode_leb128(blob, n, width=width)
    finally:
        N.LIB = lib


@given(
    st.lists(st.integers(0, 2**32 - 1), max_size=300),
    st.sampled_from([32, 64]),
)
@settings(max_examples=150, deadline=None)
def test_native_matches_numpy_u32_domain(vals, width):
    dt = np.uint32 if width == 32 else np.uint64
    u = np.array(vals, dtype=dt)
    nat = encode_leb128(u)
    ref = _numpy_encode(u)
    assert nat == ref
    if len(u):
        assert np.array_equal(decode_leb128(nat, len(u), width=width), u)
        assert np.array_equal(_numpy_decode(nat, len(u), width=width), u)


@given(st.lists(st.integers(0, 2**64 - 1), max_size=200))
@settings(max_examples=100, deadline=None)
def test_native_matches_numpy_u64_domain(vals):
    u = np.array(vals, dtype=np.uint64)
    assert encode_leb128(u) == _numpy_encode(u)
    if len(u):
        back = decode_leb128(encode_leb128(u), len(u), width=64)
        assert np.array_equal(back, u)


def test_native_size_matches_numpy():
    rng = np.random.default_rng(7)
    for dt, hi in ((np.uint32, 2**32 - 1), (np.uint64, 2**63)):
        u = rng.integers(0, hi, 10_000).astype(dt)
        assert N.native_size(u) == int(leb128_size(u).sum())


def test_native_error_semantics():
    # truncated: continuation bit on final byte
    with pytest.raises(VarintTruncatedError):
        decode_leb128(b"\xff", 1, width=32)
    # too many bytes for width
    with pytest.raises(VarintOverflowError):
        decode_leb128(b"\xff\xff\xff\xff\xff\x01", 1, width=32)
    # last-byte bound (u32: 5th byte > 0x0F)
    with pytest.raises(VarintOverflowError):
        decode_leb128(b"\xff\xff\xff\xff\x10", 1, width=32)
    # u64: 10th byte > 0x01
    with pytest.raises(VarintOverflowError):
        decode_leb128(b"\xff" * 9 + b"\x02", 1, width=64)
    # boundary accept: u64::MAX = 9 x 0xFF + 0x01
    v = decode_leb128(b"\xff" * 9 + b"\x01", 1, width=64)
    assert int(v[0]) == 2**64 - 1
    # padding after the requested count is ignored
    v = decode_leb128(b"\x05\xab\xcd\xef", 1, width=32)
    assert int(v[0]) == 5


def test_native_decode_consumes_exact_stream():
    rng = np.random.default_rng(11)
    u = rng.integers(0, 2**31, 1000).astype(np.uint32)
    blob = encode_leb128(u)
    # fewer values than present: fine; more: truncated
    assert len(decode_leb128(blob, 500, width=32)) == 500
    with pytest.raises(VarintTruncatedError):
        decode_leb128(blob, 1001, width=32)


def test_native_svb_truncation_and_roundtrip():
    import numpy as np

    from tokenzip.codecs.core import decode_int_column, encode_int_column
    from tokenzip.errors import ChunkFormatError
    from tokenzip.codecs.core import unpack_blob, pack_blob

    rng = np.random.default_rng(13)
    vals = rng.integers(-(2**31), 2**31, 4097).astype(np.int64)
    blob = encode_int_column(vals, "svb", 32)
    assert (decode_int_column(blob) == vals).all()
    # truncate the payload stream -> ChunkFormatError, not garbage
    codec, meta, streams = unpack_blob(blob)
    bad = pack_blob(codec, meta, [bytes(streams[0]), bytes(streams[1])[:-3]])
    with pytest.raises(ChunkFormatError):
        decode_int_column(bad)


def test_native_bitpack_short_buffer():
    import numpy as np

    from tokenzip.codecs.bitpack import pack_bits, unpack_bits
    from tokenzip.errors import CodecError

    v = np.arange(100, dtype=np.uint64)
    b = pack_bits(v, 7)
    with pytest.raises(CodecError):
        unpack_bits(b[:-2], 100, 7)


@pytest.mark.skipif(not N.HAVE_NATIVE, reason="no C compiler in environment")
@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=4096), st.integers(0, 2**31 - 1))
def test_native_fsst_encode_matches_regex(blob, seed):
    """C greedy parse is byte-identical to the regex reference path for any
    blob and its trained table (incl. 0xFF escapes and 0x00-bearing
    symbols), and decodes back to the blob."""
    import os

    from tokenzip.codecs import fsst as F

    # salt the blob with repeated structure so tables are non-trivial
    rng = np.random.default_rng(seed)
    rep = bytes(rng.integers(0, 256, 8, dtype=np.uint8).tolist())
    blob = rep * int(rng.integers(0, 64)) + blob
    table = F.train_symbol_table(blob)
    os.environ["TOKENZIP_NO_NATIVE"] = "1"
    try:
        ref = F.fsst_encode(blob, table)
    finally:
        os.environ.pop("TOKENZIP_NO_NATIVE", None)
    nat = F.fsst_encode(blob, table)
    assert nat == ref
    assert F.fsst_decode(nat, table) == blob


@pytest.mark.skipif(not N.HAVE_NATIVE, reason="no C compiler in environment")
@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-(2**31), 2**31 - 1), min_size=0, max_size=512)
)
def test_native_zz32_fused_matches_unfused(vals):
    """Fused zigzag kernels == zigzag_encode piped through the u32 kernels:
    same bytes, same size, same decoded values, same error-free roundtrip."""
    from tokenzip.codecs.varint import encode_leb128, leb128_size, zigzag_encode

    x = np.array(vals, dtype=np.int32)
    zz = zigzag_encode(x, 32)
    ref_blob = encode_leb128(zz)
    ref_size = int(leb128_size(zz).sum())
    blob = N.native_encode_zz32(x)
    if len(x):
        assert blob == ref_blob
    assert N.native_size_zz32(x) == ref_size
    rc, out = N.native_decode_zz32(np.frombuffer(ref_blob, np.uint8), len(x))
    assert rc == 0
    assert np.array_equal(out, x)


@pytest.mark.skipif(not N.HAVE_NATIVE, reason="no C compiler in environment")
def test_native_zz32_error_codes():
    rc, _ = N.native_decode_zz32(np.frombuffer(b"\x80", np.uint8), 1)
    assert rc == 1  # truncated
    rc, _ = N.native_decode_zz32(np.frombuffer(b"\x80\x80\x80\x80\x80\x01", np.uint8), 1)
    assert rc == 2  # 6-byte varint at width 32
    rc, _ = N.native_decode_zz32(np.frombuffer(b"\x80\x80\x80\x80\x7f", np.uint8), 1)
    assert rc == 2  # last-byte bound


@pytest.mark.skipif(not N.HAVE_NATIVE, reason="no C compiler in environment")
@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-(2**31), 2**31 - 1), min_size=0, max_size=40),
        min_size=0,
        max_size=20,
    )
)
def test_native_doc_chk_matches_numpy(docs):
    """Fused Horner checksum kernel == the NumPy cumsum-differencing
    construction in _DocChecksumStage (uint64 wraparound, per-doc sums)."""
    B = np.uint64(1099511628211)
    MIX = np.uint64(0x9E3779B97F4A7C15)
    lengths = np.array([len(d) for d in docs], dtype=np.int64)
    values = np.array([v for d in docs for v in d], dtype=np.int32)
    starts = np.zeros(len(docs) + 1, np.int64)
    np.cumsum(lengths, out=starts[1:])
    from tokenzip.codecs.varint import zigzag_encode

    with np.errstate(over="ignore"):
        maxlen = int(lengths.max()) if len(docs) else 0
        powers = np.ones(maxlen + 1, np.uint64)
        if maxlen:
            np.cumprod(np.full(maxlen, B, np.uint64), out=powers[1:])
        w = np.arange(len(values), dtype=np.int64) - np.repeat(starts[:-1], lengths)
        terms = (zigzag_encode(values, 32).astype(np.uint64) + MIX) * powers[w]
        cs = np.zeros(len(values) + 1, np.uint64)
        np.cumsum(terms, out=cs[1:])
        ref_h = cs[starts[1:]] - cs[starts[:-1]]
    tvs = np.zeros(len(values) + 1, np.int64)
    np.cumsum(values, dtype=np.int64, out=tvs[1:])
    ref_tv = tvs[starts[1:]] - tvs[starts[:-1]]

    got_h, got_tv = N.native_doc_chk_i32(values, starts, int(MIX), int(B))
    assert np.array_equal(got_h, ref_h)
    assert np.array_equal(got_tv, ref_tv)

    # byte-hash kernel against the same polynomial over raw bytes
    blob = values.view(np.uint8)[: 4 * len(values)]
    offs = starts * 4
    with np.errstate(over="ignore"):
        dmax = int((lengths * 4).max()) if len(docs) else 0
        dpow = np.ones(dmax + 1, np.uint64)
        if dmax:
            np.cumprod(np.full(dmax, B, np.uint64), out=dpow[1:])
        dw = np.arange(len(blob), dtype=np.int64) - np.repeat(offs[:-1], lengths * 4)
        dterms = (blob.astype(np.uint64) + MIX) * dpow[dw]
        dcs = np.zeros(len(blob) + 1, np.uint64)
        np.cumsum(dterms, out=dcs[1:])
        ref_bh = dcs[offs[1:]] - dcs[offs[:-1]]
    got_bh = N.native_byte_chk(blob, offs, int(MIX), int(B))
    assert np.array_equal(got_bh, ref_bh)


@given(
    st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=400),
    st.sampled_from([8, 16, 32]),
)
@settings(max_examples=120, deadline=None)
def test_native_for_fused_matches_numpy(vals, width):
    """tz_unpack_add_i32 (fused FOR decode) vs unpack_bits + _mod_add +
    astype(int32) — value-identical on any int32 input, all widths <= 32."""
    from tokenzip.codecs.core import INT_CODECS

    enc, dec = INT_CODECS["for"]
    v = np.array(vals, dtype=np.int64)
    streams, meta = enc(v, width)
    nat = dec(streams, meta, len(v))
    assert nat.dtype == np.int32
    lib, N.LIB = N.LIB, None
    try:
        ref = dec(streams, meta, len(v))
    finally:
        N.LIB = lib
    np.testing.assert_array_equal(nat, ref)
    np.testing.assert_array_equal(nat.astype(np.int64), v)


@given(st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=400))
@settings(max_examples=120, deadline=None)
def test_native_delta_fused_matches_numpy(vals):
    """tz_dec_delta_i32 (fused delta decode) vs decode+unzigzag+cumsum —
    value-identical including mod-2^64 intermediate wraparound."""
    from tokenzip.codecs.core import INT_CODECS

    enc, dec = INT_CODECS["delta"]
    v = np.array(vals, dtype=np.int64)
    streams, meta = enc(v, 32)
    nat = dec(streams, meta, len(v))
    assert nat.dtype == np.int32
    lib, N.LIB = N.LIB, None
    try:
        ref = dec(streams, meta, len(v))
    finally:
        N.LIB = lib
    np.testing.assert_array_equal(nat, ref)
    np.testing.assert_array_equal(nat.astype(np.int64), v)


def test_native_delta_fused_error_codes():
    from tokenzip.codecs.core import INT_CODECS

    _, dec = INT_CODECS["delta"]
    # truncated: stream ends mid-varint
    with pytest.raises(VarintTruncatedError):
        dec([b"\x80"], {"w": 32}, 1)
    # overflow: an 11-byte varint
    with pytest.raises(VarintOverflowError):
        dec([b"\x80" * 10 + b"\x01"], {"w": 32}, 1)
