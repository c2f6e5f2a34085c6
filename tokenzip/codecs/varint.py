"""Vectorized LEB128/varint + ZigZag kernels over NumPy arrays.

From-scratch re-expression of the reference codec *semantics* (not its SIMD
implementation): protobuf-style base-128 little-endian varints — 7 data bits
per byte, MSB = continuation (/root/reference/src/encode/mod.rs:23-25,
/root/reference/src/decode/mod.rs:28-54) — and the ZigZag signed mapping
``(n << 1) ^ (n >> bits-1)`` (/root/reference/src/num.rs:119-126, 289-296).

The reference operates value-at-a-time with intra-register SIMD batching
(2x/4x/8x kernels, /root/reference/src/decode/mod.rs:223,549,792); here the
batch IS the whole NumPy array: every kernel below is a bounded number of
whole-array vector operations (the per-byte-position loop runs at most
``MAX_VARINT_BYTES`` = 10 iterations regardless of array length), never a
Python loop over values.

Overflow / truncation semantics follow the reference exactly:
  * Overflow: encoded length > ``MAX_VARINT_BYTES`` for the target width, or
    maximal length with last byte > ``MAX_LAST_VARINT_BYTE``
    (/root/reference/src/decode/mod.rs:42-48, src/num.rs:50-51).
  * NotEnoughBytes: input ends inside a varint
    (/root/reference/src/decode/mod.rs:49-50, src/lib.rs:212-222).
  * Trailing bytes after the requested number of varints are ignored
    (/root/reference/src/decode/mod.rs:134 "Any data after the end of the
    varint are ignored") — encoded blobs may carry padding.
"""

from __future__ import annotations

import numpy as np

from tokenzip.errors import VarintOverflowError, VarintTruncatedError

# Per-width constants, mirroring VarIntTarget::{MAX_VARINT_BYTES,
# MAX_LAST_VARINT_BYTE} (/root/reference/src/num.rs:50-51, 131-132, 213-214,
# 301-302).
MAX_VARINT_BYTES = {8: 2, 16: 3, 32: 5, 64: 10}
MAX_LAST_VARINT_BYTE = {8: 0x01, 16: 0x03, 32: 0x0F, 64: 0x01}

_UNSIGNED_DTYPE = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}
_SIGNED_DTYPE = {8: np.int8, 16: np.int16, 32: np.int32, 64: np.int64}


# ---------------------------------------------------------------------------
# ZigZag
# ---------------------------------------------------------------------------

def zigzag_encode(x: np.ndarray, width: int = 32) -> np.ndarray:
    """Signed -> unsigned ZigZag bijection: ``(n << 1) ^ (n >> width-1)``.

    Matches /root/reference/src/num.rs:289-291 for i32 (and siblings for the
    other widths). -20 maps to 39 (0x27), reproducing the reference doctest
    /root/reference/src/encode/mod.rs:31-35.
    """
    sd, ud = _SIGNED_DTYPE[width], _UNSIGNED_DTYPE[width]
    x = np.asarray(x, dtype=sd)
    with np.errstate(over="ignore"):
        return (np.left_shift(x, 1) ^ np.right_shift(x, width - 1)).view(ud)


def zigzag_decode(u: np.ndarray, width: int = 32) -> np.ndarray:
    """Unsigned -> signed inverse ZigZag: ``(n >> 1) ^ -(n & 1)``.

    Matches /root/reference/src/num.rs:294-296.
    """
    sd, ud = _SIGNED_DTYPE[width], _UNSIGNED_DTYPE[width]
    u = np.asarray(u, dtype=ud)
    with np.errstate(over="ignore"):
        neg = (-(u & 1).view(sd)).view(ud)
        return ((u >> 1) ^ neg).view(sd)


# ---------------------------------------------------------------------------
# LEB128 size oracle
# ---------------------------------------------------------------------------

def leb128_size(u: np.ndarray) -> np.ndarray:
    """Per-value encoded byte count: ``max(1, ceil(bit_length(v) / 7))``.

    This is exactly the rustc-serialize scalar LEB128 output size
    (/root/reference/benches/varint_bench/leb128.rs:4-24) and therefore the
    north rule's compressed-size bound, computable without encoding.

    dtype-aware: a uint8/16/32 input stays in its width (fewer threshold
    passes, half the memory traffic of widening to uint64) — the engine
    analog of the reference's width-specialized kernels (README.md:57-59).
    """
    u = np.asarray(u)
    if u.dtype not in (np.dtype(np.uint8), np.dtype(np.uint16), np.dtype(np.uint32),
                      np.dtype(np.uint64)):
        u = u.astype(np.uint64)
    bits = u.dtype.itemsize * 8
    # uint8 byte counts: 1/8 the write traffic of int64; callers widen in
    # cumsum (np.cumsum(..., out=<int64>) accumulates exactly)
    nb = np.ones(u.shape, dtype=np.uint8)
    for t in range(7, bits, 7):
        nb += u >= u.dtype.type(1 << t)
    return nb


# ---------------------------------------------------------------------------
# Vectorized encode
# ---------------------------------------------------------------------------

def encode_leb128(u: np.ndarray, sizes: np.ndarray | None = None) -> bytes:
    """Encode an unsigned array to one concatenated LEB128 byte stream.

    Byte-identical to appending the reference's ``encode``/``encode_to_slice``
    output per value (/root/reference/src/encode/mod.rs:23-25, 53-58): for
    unsigned values SIMD varint-simd and scalar rustc LEB128 agree exactly.

    Vectorization: the loop below is over *byte position within a varint*
    (<= 10 iterations), each iteration a whole-array masked store — the NumPy
    analog of the reference's 7-bit spread kernel
    (``num_to_scalar_stage1``, /root/reference/src/num.rs:251-286).
    """
    u = np.asarray(u)
    if u.dtype not in (np.dtype(np.uint8), np.dtype(np.uint16), np.dtype(np.uint32),
                      np.dtype(np.uint64)):
        u = u.astype(np.uint64)
    u = np.ascontiguousarray(u)
    n = len(u)
    if n == 0:
        return b""
    # native C kernel when built (same bytes, ~30x per core) — the runtime
    # analog of the reference's build-time kernel dispatch (build.rs:57-85)
    from tokenzip.codecs.native import native_encode

    nat = native_encode(u)
    if nat is not None:
        return nat
    nb = sizes if sizes is not None else leb128_size(u)
    offsets = np.empty(n + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(nb, out=offsets[1:])
    out = np.empty(offsets[-1], dtype=np.uint8)
    maxb = int(nb.max())
    dt = u.dtype.type
    # bucket values by encoded length: each (length, byte-position) pair is
    # one gather + one scatter over only the values of that length — fewer
    # masked passes than iterating byte positions over the whole array
    for k in range(1, maxb + 1):
        idx = np.flatnonzero(nb == k)
        if not len(idx):
            continue
        vals = u[idx]
        base = offsets[idx]
        for j in range(k):
            byte = ((vals >> dt(7 * j)) & dt(0x7F)).astype(np.uint8)
            if j < k - 1:
                byte |= np.uint8(0x80)  # continuation bit on non-final bytes
            out[base + j] = byte
    return out.tobytes()


def encode_leb128_zigzag(x: np.ndarray, width: int = 32) -> bytes:
    """ZigZag then varint — the reference's ``encode_zigzag``
    (/root/reference/src/encode/mod.rs:40-42)."""
    return encode_leb128(zigzag_encode(x, width).astype(np.uint64))


# ---------------------------------------------------------------------------
# Vectorized decode
# ---------------------------------------------------------------------------

def decode_leb128(
    blob: bytes | np.ndarray,
    n_values: int | None = None,
    width: int = 64,
) -> np.ndarray:
    """Decode a concatenated LEB128 stream to a uint array of ``width`` bits.

    ``n_values=None`` decodes the entire stream; otherwise exactly that many
    varints are decoded and trailing bytes are ignored (padding contract,
    /root/reference/src/decode/mod.rs:134).

    Raises :class:`VarintTruncatedError` if the stream holds fewer complete
    varints than requested, and :class:`VarintOverflowError` per the
    reference's last-byte bound (/root/reference/src/decode/mod.rs:42-48).

    Algorithm (the whole-buffer analog of the reference's movemask ->
    tzcnt -> shuffle -> compact kernel, /root/reference/src/decode/mod.rs:141-203):
    terminator mask -> per-value start offsets -> per-byte 7-bit contribution
    shifted by its position -> segmented sum (``np.add.reduceat``), the
    vectorized form of the in-register prefix-sum gather the 8x kernel uses
    (/root/reference/src/decode/mod.rs:855-862).
    """
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    b = b.astype(np.uint8, copy=False)
    if n_values is not None and width in (32, 64):
        from tokenzip.codecs.native import native_decode

        res = native_decode(np.ascontiguousarray(b), int(n_values), width)
        if res is not None:
            rc, out = res
            if rc == 1:
                raise VarintTruncatedError(
                    f"expected {n_values} varints, stream ends mid-varint"
                )
            if rc == 2:
                raise VarintOverflowError(
                    f"varint exceeds u{width} bounds "
                    f"(max {MAX_VARINT_BYTES[width]} bytes, last byte "
                    f"<= {MAX_LAST_VARINT_BYTE[width]:#x})"
                )
            return out
    ends = np.flatnonzero(b < 0x80)
    if n_values is None:
        n = len(ends)
        if len(b) and (n == 0 or ends[-1] != len(b) - 1):
            raise VarintTruncatedError(
                f"stream ends mid-varint (continuation bit set on final byte)"
            )
    else:
        n = int(n_values)
        if len(ends) < n:
            raise VarintTruncatedError(
                f"expected {n} varints, found only {len(ends)} complete"
            )
        ends = ends[:n]
    if n == 0:
        return np.empty(0, dtype=_UNSIGNED_DTYPE[width])
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1

    maxb = MAX_VARINT_BYTES[width]
    too_long = lengths > maxb
    if too_long.any():
        i = int(np.argmax(too_long))
        raise VarintOverflowError(
            f"value {i}: {int(lengths[i])}-byte varint exceeds "
            f"{maxb}-byte max for u{width}"
        )
    at_max = lengths == maxb
    if at_max.any():
        bad = b[ends[at_max]] > MAX_LAST_VARINT_BYTE[width]
        if bad.any():
            raise VarintOverflowError(
                f"last-byte bound exceeded for u{width} "
                f"(> {MAX_LAST_VARINT_BYTE[width]:#x})"
            )

    total = int(ends[-1]) + 1
    # width-specialized accumulator: u32 and narrower never shift past 28
    # bits, so stay in uint32; positions in int32 (streams are < 2 GiB)
    acc = np.uint32 if width <= 32 else np.uint64
    data = b[:total].astype(acc)
    data &= acc(0x7F)
    pdt = np.int32 if total < 2**31 else np.int64
    # byte position within its value: index - start_of_value
    pos = np.arange(total, dtype=pdt)
    pos -= np.repeat(starts.astype(pdt), lengths)
    pos = pos.astype(acc, copy=False)
    pos *= acc(7)
    data <<= pos
    vals = np.add.reduceat(data, starts)
    return vals.astype(_UNSIGNED_DTYPE[width], copy=False)


def decode_leb128_zigzag(
    blob: bytes | np.ndarray, n_values: int | None = None, width: int = 32
) -> np.ndarray:
    """Varint-decode then un-ZigZag — the reference's ``decode_zigzag``
    (/root/reference/src/decode/mod.rs:99-101)."""
    u = decode_leb128(blob, n_values, width=width)
    return zigzag_decode(u.astype(_UNSIGNED_DTYPE[width], copy=False), width)


def decode_leb128_len(blob: bytes | np.ndarray) -> np.ndarray:
    """Per-value byte lengths of a varint stream without materializing values —
    the reference's ``decode_len`` skip/seek primitive
    (/root/reference/src/decode/mod.rs:69-83), whole-stream at once."""
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    ends = np.flatnonzero(b < 0x80)
    if len(b) and (len(ends) == 0 or ends[-1] != len(b) - 1):
        raise VarintTruncatedError("stream ends mid-varint")
    if len(ends) == 0:
        return np.empty(0, dtype=np.int64)
    lengths = np.empty(len(ends), dtype=np.int64)
    lengths[0] = ends[0] + 1
    lengths[1:] = np.diff(ends)
    return lengths


# ---------------------------------------------------------------------------
# Scalar pure-Python oracle (differential-test reference)
# ---------------------------------------------------------------------------

def leb128_encode_scalar(value: int) -> bytes:
    """Pure-Python port of the rustc-serialize scalar LEB128 encoder
    (/root/reference/benches/varint_bench/leb128.rs:4-24). Used as the
    differential oracle, mirroring the reference's fuzz-vs-integer-encoding
    setup (/root/reference/fuzz/fuzz_targets/fuzz_target_2.rs:6-14)."""
    if value < 0:
        raise ValueError("oracle encodes unsigned values; zigzag first")
    out = bytearray()
    while True:
        byte = value & 0x7F
        value >>= 7
        if value:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def leb128_decode_scalar(buf: bytes, offset: int = 0, width: int = 64) -> tuple[int, int]:
    """Pure-Python scalar decode ``(value, nbytes)`` with the reference's
    error semantics (/root/reference/benches/varint_bench/leb128.rs:30-53,
    overflow rule of /root/reference/src/decode/mod.rs:42-48)."""
    value = 0
    shift = 0
    maxb = MAX_VARINT_BYTES[width]
    for i in range(offset, len(buf)):
        byte = buf[i]
        nb = i - offset + 1
        if nb > maxb:
            raise VarintOverflowError(f"varint longer than {maxb} bytes for u{width}")
        value |= (byte & 0x7F) << shift
        if byte < 0x80:
            if nb == maxb and byte > MAX_LAST_VARINT_BYTE[width]:
                raise VarintOverflowError("last-byte bound exceeded")
            return value, nb
        shift += 7
    raise VarintTruncatedError("ran out of bytes mid-varint")
