"""Vectorized MD5 over Arrow string columns.

The split / mixture / bottom-k sampling rules and the simhash word hasher
all pin md5 (their DuckDB oracles recompute it with SQL ``md5()``), so the
hash function cannot change — only where it runs. These helpers hash a whole
column through ONE C kernel call over the column's flat UTF-8 buffer
(codecs/_native.c ``tz_md5_spans``, the ``tz_byte_chk`` batching pattern)
instead of a per-row Python ``hashlib`` loop; the pure-hashlib mirror below
is the kill-switch / differential oracle, same dispatch philosophy as the
LEB128 kernels (TOKENZIP_NO_NATIVE).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def str_column_spans(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat uint8 buffer, starts, ends) of an Arrow string column —
    zero-copy views over the column's own buffers."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if not isinstance(col, (pa.StringArray, pa.LargeStringArray)):
        # non-string key columns (e.g. int64 doc ids) hash their decimal
        # text — Arrow's cast renders exactly str(value)
        col = col.cast(pa.string())
    if col.null_count:
        raise ValueError("null strings not supported")
    odt = np.int64 if isinstance(col, pa.LargeStringArray) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    buf = col.buffers()[2]
    flat = (
        np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.empty(0, np.uint8)
    )
    return flat, offs[:-1], offs[1:]


def md5_spans(
    flat: np.ndarray, starts: np.ndarray, ends: np.ndarray, prefix: bytes = b""
) -> np.ndarray:
    """(n, 16) uint8 md5 digests: digest i = md5(prefix + flat[starts:ends])."""
    from tokenzip.codecs.native import native_md5_spans

    out = native_md5_spans(prefix, flat, starts, ends)
    if out is not None:
        return out
    n = len(starts)
    out = np.empty((n, 16), dtype=np.uint8)
    mv = memoryview(np.ascontiguousarray(flat))
    for i in range(n):
        out[i] = np.frombuffer(
            hashlib.md5(prefix + mv[starts[i] : ends[i]]).digest(), dtype=np.uint8
        )
    return out


def md5_digests_str(col, prefix: bytes = b"") -> np.ndarray:
    """(n, 16) uint8 md5 digests of each string in an Arrow string column."""
    flat, starts, ends = str_column_spans(col)
    return md5_spans(flat, starts, ends, prefix)


def digests_hi60(dig: np.ndarray) -> np.ndarray:
    """int64 value of the first 15 hex nibbles of each digest — exactly
    ``int(md5(x).hexdigest()[:15], 16)`` (top 60 bits of the big-endian
    first 8 digest bytes)."""
    be = dig[:, :8].astype(np.uint64)
    acc = np.zeros(len(dig), dtype=np.uint64)
    for j in range(8):
        acc = (acc << np.uint64(8)) | be[:, j]
    return (acc >> np.uint64(4)).astype(np.int64)


def md5_hi60_str(col, prefix: bytes = b"") -> np.ndarray:
    """int64[n]: int(md5(prefix + s).hexdigest()[:15], 16) per string."""
    return digests_hi60(md5_digests_str(col, prefix))


def digests_hex(dig: np.ndarray) -> np.ndarray:
    """'<U32' hexdigest strings from an (n, 16) digest matrix, vectorized
    nibble->char (no per-row Python)."""
    n = len(dig)
    chars = np.empty((n, 32), dtype=np.uint8)
    chars[:, 0::2] = _HEX[dig >> 4]
    chars[:, 1::2] = _HEX[dig & 0x0F]
    # uint8 ASCII -> one U32 string per row: latin-1 decode of the raw
    # bytes row-wise via the S32 view (hex is pure ASCII)
    return chars.view("S32").ravel().astype("U32")


def md5_hex_str(col, prefix: bytes = b"") -> np.ndarray:
    """'<U32' md5 hexdigest per string of an Arrow string column."""
    return digests_hex(md5_digests_str(col, prefix))
