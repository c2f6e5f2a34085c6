"""Fixed-width bit packing over NumPy arrays.

The width-specialized compaction idea comes from the reference's
per-width kernels (``dual_u8/u16/u32_stage2``,
/root/reference/src/decode/mod.rs:342-396): pick the narrowest layout the
values allow, decided per chunk from the actual value range. Packing is the
whole-array NumPy expression of the reference's shift/OR bit trees.
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
    values = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise CodecError(f"bit width {width} > 64")
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((values[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(buf: bytes | np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    need = (n * width + 7) // 8
    if len(b) < need:
        raise CodecError(f"bitpack buffer too short: {len(b)} < {need}")
    bits = np.unpackbits(b[:need], count=n * width, bitorder="little")
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)
