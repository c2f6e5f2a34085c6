"""Fixed-width bit packing over NumPy arrays.

The width-specialized compaction idea comes from the reference's
per-width kernels (``dual_u8/u16/u32_stage2``,
/root/reference/src/decode/mod.rs:342-396): pick the narrowest layout the
values allow, decided per chunk from the actual value range.

Implementation notes: a value < 2**width lives entirely in the first
ceil(width/8) little-endian bytes of its uint64 representation, so packing
is a byte-matrix slice plus a C-speed ``unpackbits``/``packbits`` round to
drop the padding bits — never a per-value Python loop and never an n×width
uint64 intermediate. Byte-aligned widths skip the bit stage entirely.
"""

from __future__ import annotations

import numpy as np

from tokenzip.errors import CodecError


def bit_width(max_value: int) -> int:
    """Bits needed to represent ``max_value`` (0 -> 0 bits)."""
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ``values`` at ``width`` bits each, little-endian bit
    order, into ``ceil(n*width/8)`` bytes. ``width == 0`` packs to b''."""
    values = np.asarray(values)
    if values.dtype == np.dtype("<u4") and width <= 32:
        nb_per = 4
        values = np.ascontiguousarray(values)
    else:
        nb_per = 8
        values = np.ascontiguousarray(values, dtype="<u8")
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise CodecError(f"bit width {width} > 64")
    from tokenzip.codecs.native import native_pack_bits

    nat = native_pack_bits(values, width)
    if nat is not None:
        return nat
    k = (width + 7) // 8
    mat = values.view(np.uint8).reshape(n, nb_per)[:, :k]
    if width % 8 == 0:
        return np.ascontiguousarray(mat).tobytes()
    bits = np.unpackbits(np.ascontiguousarray(mat), axis=1, bitorder="little")
    return np.packbits(np.ascontiguousarray(bits[:, :width]), bitorder="little").tobytes()


def unpack_bits(buf: bytes | np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    need = (n * width + 7) // 8
    if len(b) < need:
        raise CodecError(f"bitpack buffer too short: {len(b)} < {need}")
    from tokenzip.codecs.native import native_unpack_bits

    nat = native_unpack_bits(np.ascontiguousarray(b), n, width)
    if nat is not None:
        return nat
    k = (width + 7) // 8
    full = np.zeros((n, 8), dtype=np.uint8)
    if width % 8 == 0:
        full[:, :k] = b[: n * k].reshape(n, k)
    else:
        bits = np.unpackbits(b[:need], count=n * width, bitorder="little").reshape(n, width)
        padded = np.zeros((n, 8 * k), dtype=np.uint8)
        padded[:, :width] = bits
        full[:, :k] = np.packbits(padded, axis=1, bitorder="little")
    return full.reshape(-1).view("<u8").astype(np.uint64, copy=False)
