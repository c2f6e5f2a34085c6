from tokenzip.codecs.core import (
    INT_CODECS,
    decode_int_column,
    encode_int_column,
    leb128_oracle_bytes,
    pack_blob,
    register_int_codec,
    unpack_blob,
)
from tokenzip.codecs.selector import choose_int_codec, estimate_int_sizes
from tokenzip.codecs.varint import (
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

__all__ = [
    "INT_CODECS",
    "decode_int_column",
    "encode_int_column",
    "leb128_oracle_bytes",
    "pack_blob",
    "register_int_codec",
    "unpack_blob",
    "choose_int_codec",
    "estimate_int_sizes",
    "decode_leb128",
    "decode_leb128_len",
    "decode_leb128_zigzag",
    "encode_leb128",
    "encode_leb128_zigzag",
    "leb128_decode_scalar",
    "leb128_encode_scalar",
    "leb128_size",
    "zigzag_decode",
    "zigzag_encode",
]
