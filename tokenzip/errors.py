"""Error model of the engine.

Mirrors the reference's ``VarIntDecodeError::{Overflow, NotEnoughBytes}``
(/root/reference/src/lib.rs:40-53): Overflow = encoded value exceeds the
target integer width (last-byte bound rule, /root/reference/src/decode/mod.rs:42-48);
NotEnoughBytes = truncated input (/root/reference/src/lib.rs:212-222).
"""


class CodecError(Exception):
    """Base class for all codec errors."""


class VarintOverflowError(CodecError):
    """Encoded varint exceeds the target integer width.

    Reference semantics: a varint longer than ``MAX_VARINT_BYTES`` for the
    target, or of maximal length with a last byte greater than
    ``MAX_LAST_VARINT_BYTE`` (/root/reference/src/num.rs:50-51 etc.).
    """


class VarintTruncatedError(CodecError):
    """Input ends in the middle of a varint (continuation bit set on the
    final available byte) or fewer values than promised are present.

    Reference: ``VarIntDecodeError::NotEnoughBytes``
    (/root/reference/src/decode/mod.rs:49-50).
    """


class ChunkFormatError(CodecError):
    """Malformed packed chunk container (bad magic / framing / metadata)."""
