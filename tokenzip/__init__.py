"""tokenzip — Ray-Data-native per-column lightweight compression for
pre-tokenized training-sequence tables.

From-scratch engine with the codec semantics of as-com/varint-simd
(studied read-only at /root/reference; see SURVEY.md), built Ray-Data-first:
``read_parquet -> map_batches (zero-copy Arrow) -> write_parquet`` with
sampling-based per-column codec auto-selection, checkpoint manifests, and
explicit skew handling.
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Raise glibc's mmap/trim thresholds so the large short-lived NumPy
    temporaries the batch kernels allocate are served from the heap arena
    instead of fresh mmap regions — fresh regions cost a page fault per 4 KiB
    on first touch, which measured 3-6x slower than compute on this class of
    VM and serializes across workers. Runs in EVERY process that imports
    tokenzip (so each Ray worker gets it). Best-effort: silently skipped on
    non-glibc platforms. Kill-switch: TOKENZIP_NO_MALLOPT=1."""
    import ctypes
    import os

    if os.environ.get("TOKENZIP_NO_MALLOPT"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass


_tune_malloc()

from tokenzip.codecs import (  # noqa: E402,F401  (public API re-exports)
    INT_CODECS,
    choose_int_codec,
    decode_int_column,
    decode_leb128,
    decode_leb128_len,
    decode_leb128_zigzag,
    encode_int_column,
    encode_leb128,
    encode_leb128_zigzag,
    estimate_int_sizes,
    leb128_decode_scalar,
    leb128_encode_scalar,
    leb128_oracle_bytes,
    leb128_size,
    pack_blob,
    register_int_codec,
    unpack_blob,
    zigzag_decode,
    zigzag_encode,
)
from tokenzip.errors import (  # noqa: E402,F401
    ChunkFormatError,
    CodecError,
    VarintOverflowError,
    VarintTruncatedError,
)


def __getattr__(name):  # lazy: pipeline pulls in ray; keep bare import light
    if name in (
        "compress",
        "decompress",
        "decompress_map",
        "delete_docs",
        "upsert_docs",
        "fsck",
        "recode",
        "compact",
        "verify_roundtrip",
        "chunk_meta_dataset",
    ):
        from tokenzip import pipeline

        return getattr(pipeline, name)
    if name in ("encode_batch", "decode_chunks"):
        from tokenzip import chunk

        return getattr(chunk, name)
    if name in (
        "pack_sequences",
        "q_pack_stats_by_source",
        "q_vocab_topk",
        "q_split_stats_by_source",
    ):
        from tokenzip import training

        return getattr(training, name)
    if name in ("compress_table", "decompress_table"):
        from tokenzip import table

        return getattr(table, name)
    raise AttributeError(name)
