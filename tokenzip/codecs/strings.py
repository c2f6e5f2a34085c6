"""String-column codecs: plain, dictionary, and prefix+integer structural.

The reference has no string handling (it is an integer codec library); these
codecs exist because the north rule's table has ``doc_id``/``source`` string
columns. They reuse the integer kernels for all their numeric substreams
(lengths, codes, suffix integers), keeping LEB128 as the universal inner
primitive exactly as the reference uses varint framing for every width
(/root/reference/src/num.rs:9-46).

Interface mirrors the int codecs: ``encode(arr: pa.Array) -> (streams, meta)``
and ``decode(streams, meta, n) -> pa.Array`` over ``pa.string()`` arrays.
FSST lives in fsst.py (same registry).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tokenzip.errors import ChunkFormatError, CodecError
from tokenzip.codecs.bitpack import bit_width, pack_bits, unpack_bits
from tokenzip.codecs.core import pack_blob, unpack_blob
from tokenzip.codecs.varint import decode_leb128, encode_leb128


def _str_parts(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """Zero-copy (lengths, concatenated utf8 bytes) of a string array."""
    arr = pc.cast(arr, pa.string())
    if arr.null_count:
        raise CodecError("null strings not supported in v1")
    combined = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    buf_offsets = np.frombuffer(combined.buffers()[1], dtype=np.int32)
    off = combined.offset
    offsets = buf_offsets[off : off + len(combined) + 1].astype(np.int64)
    data = combined.buffers()[2]
    blob = data.to_pybytes()[offsets[0] : offsets[-1]] if data is not None else b""
    return np.diff(offsets), blob


def _mk_str(lengths: np.ndarray, blob: bytes) -> pa.Array:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.large_string(),
        len(lengths),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)],
    ).cast(pa.string())


def _enc_plain(arr):
    lengths, blob = _str_parts(arr)
    return [encode_leb128(lengths.astype(np.uint64)), blob], {}


def _dec_plain(streams, meta, n):
    lengths = decode_leb128(streams[0], n, width=64).astype(np.int64)
    return _mk_str(lengths, streams[1])


def _enc_dict_str(arr):
    """Dictionary-encode: distinct strings stored plain, bit-packed codes.
    The per-chunk symbol-table analog of the reference's static lookup tables
    (/root/reference/src/decode/lookup.rs) — built per chunk, or supplied as a
    shared table by the actor-pool stage."""
    arr = pc.cast(arr, pa.string())
    d = pc.dictionary_encode(
        arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    )
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    k = len(d.dictionary)
    cb = bit_width(k - 1) if k > 1 else 0
    dlen, dblob = _str_parts(d.dictionary)
    return (
        [pack_bits(codes, cb), encode_leb128(dlen.astype(np.uint64)), dblob],
        {"k": k, "cb": cb},
    )


def _dec_dict_str(streams, meta, n):
    k, cb = meta["k"], meta["cb"]
    codes = unpack_bits(streams[0], n, cb).astype(np.int64)
    if n and k == 0:
        raise ChunkFormatError("empty dictionary for non-empty chunk")
    dlen = decode_leb128(streams[1], k, width=64).astype(np.int64)
    dic = _mk_str(dlen, streams[2])
    return pc.take(dic, pa.array(codes))


def _enc_prefix_int(arr):
    """Structural codec for machine-generated ids ``<prefix><fixed-width int>``
    (e.g. ``doc-00001234``): store the prefix once and delta-encode the
    integer suffixes. Raises CodecError when the shape doesn't hold — the
    selector treats that as 'not applicable'."""
    lengths, blob = _str_parts(arr)
    n = len(lengths)
    if n == 0:
        return [b"", b""], {"p": "", "d": 0}
    if not (lengths == lengths[0]).all():
        raise CodecError("prefix_int: varying lengths")
    width = int(lengths[0])
    mat = np.frombuffer(blob, dtype=np.uint8).reshape(n, width)
    is_digit = (mat >= ord("0")) & (mat <= ord("9"))
    digit_cols = is_digit.all(axis=0)
    # suffix = maximal all-digit run at the end; prefix must be constant
    nd = 0
    for c in range(width - 1, -1, -1):
        if digit_cols[c]:
            nd += 1
        else:
            break
    if nd == 0 or nd > 18:
        raise CodecError("prefix_int: no digit suffix")
    pre = mat[:, : width - nd]
    if pre.size and not (pre == pre[0]).all():
        raise CodecError("prefix_int: varying prefix")
    digits = mat[:, width - nd :].astype(np.int64) - ord("0")
    ints = digits @ (10 ** np.arange(nd - 1, -1, -1, dtype=np.int64))
    seq = np.empty(n, dtype=np.int64)
    seq[0] = ints[0]
    seq[1:] = np.diff(ints)
    from tokenzip.codecs.varint import zigzag_encode

    stream = encode_leb128(zigzag_encode(seq, 64).astype(np.uint64))
    return [stream, b""], {"p": pre[0].tobytes().decode(), "d": nd}


def _dec_prefix_int(streams, meta, n):
    if n == 0:
        return _mk_str(np.empty(0, dtype=np.int64), b"")
    from tokenzip.codecs.varint import zigzag_decode

    seq = zigzag_decode(decode_leb128(streams[0], n, width=64), 64).astype(np.int64)
    ints = np.cumsum(seq)
    nd = meta["d"]
    prefix = meta["p"].encode()
    digits = (ints[:, None] // (10 ** np.arange(nd - 1, -1, -1, dtype=np.int64))) % 10
    mat = np.empty((n, len(prefix) + nd), dtype=np.uint8)
    mat[:, : len(prefix)] = np.frombuffer(prefix, dtype=np.uint8)
    mat[:, len(prefix) :] = digits + ord("0")
    lengths = np.full(n, len(prefix) + nd, dtype=np.int64)
    return _mk_str(lengths, mat.tobytes())


def _enc_fsst(arr, symbols: list[bytes] | None = None):
    """FSST symbol-table codec (see fsst.py). ``symbols=None`` trains a
    per-chunk table; a shared (broadcast) table can be passed by the
    actor-pool stage — its hash goes into the meta for lineage."""
    import hashlib

    from tokenzip.codecs import fsst as F

    lengths, blob = _str_parts(arr)
    if symbols is None:
        symbols = F.train_symbol_table(blob)
    codes = F.fsst_encode(blob, symbols)
    table = F.pack_table(symbols)
    meta = {"th": hashlib.sha1(table).hexdigest()[:12]}
    return [encode_leb128(lengths.astype(np.uint64)), table, codes], meta


def _dec_fsst(streams, meta, n):
    from tokenzip.codecs import fsst as F

    lengths = decode_leb128(streams[0], n, width=64).astype(np.int64)
    symbols = F.unpack_table(streams[1]) if len(streams[1]) else []
    blob = F.fsst_decode(streams[2], symbols)
    if len(blob) != int(lengths.sum()):
        raise ChunkFormatError("fsst: decoded byte count mismatch")
    return _mk_str(lengths, blob)


# ---------------------------------------------------------------------------
# Shared symbol tables (stateful actor-pool mode): tables trained once per
# run from a deterministic sample, broadcast via ray.put to the encoder actor
# pool, referenced from chunks by content hash only — the chunk carries NO
# table bytes. Decode resolves hashes against this per-worker registry,
# populated from the run's sidecar (symbols.json) once per worker.
# ---------------------------------------------------------------------------

SHARED_STR_TABLES: dict[str, list[bytes]] = {}


def register_shared_str_table(symbols: list[bytes]) -> str:
    import hashlib

    from tokenzip.codecs import fsst as F

    th = hashlib.sha1(F.pack_table(symbols)).hexdigest()[:12]
    SHARED_STR_TABLES[th] = symbols
    return th


def _enc_fsst_shared(arr, table_hash: str):
    from tokenzip.codecs import fsst as F

    symbols = SHARED_STR_TABLES[table_hash]
    lengths, blob = _str_parts(arr)
    codes = F.fsst_encode(blob, symbols)
    return (
        [encode_leb128(lengths.astype(np.uint64)), codes],
        {"th": table_hash},
    )


def _dec_fsst_shared(streams, meta, n):
    from tokenzip.codecs import fsst as F

    th = meta["th"]
    if th not in SHARED_STR_TABLES:
        raise ChunkFormatError(
            f"shared fsst table {th} not loaded — decode needs the run's "
            f"symbols sidecar registered via load_shared_tables()"
        )
    symbols = SHARED_STR_TABLES[th]
    lengths = decode_leb128(streams[0], n, width=64).astype(np.int64)
    blob = F.fsst_decode(streams[1], symbols)
    if len(blob) != int(lengths.sum()):
        raise ChunkFormatError("fsst_shared: decoded byte count mismatch")
    return _mk_str(lengths, blob)


SHARED_STR_DICTS: dict[str, list[str]] = {}


def register_shared_str_dict(values: list[str]) -> str:
    import hashlib

    values = sorted(values)
    th = hashlib.sha1("\x00".join(values).encode()).hexdigest()[:12]
    SHARED_STR_DICTS[th] = values
    return th


def _enc_dict_str_shared(arr, dict_hash: str):
    """Vectorized shared-dict encode: pc.index_in against the broadcast
    value set (Arrow C++ hash lookup, no per-row Python)."""
    values = SHARED_STR_DICTS[dict_hash]
    arr = pc.cast(arr, pa.string())
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    idx = pc.index_in(arr, value_set=pa.array(values, pa.string()))
    if idx.null_count:
        missing = arr.filter(pc.is_null(idx))[0].as_py()
        raise CodecError(f"value {missing!r} not in shared dictionary")
    codes = idx.to_numpy(zero_copy_only=False).astype(np.uint64)
    cb = bit_width(len(values) - 1) if len(values) > 1 else 0
    return [pack_bits(codes, cb)], {"th": dict_hash, "cb": cb}


def _dec_dict_str_shared(streams, meta, n):
    """Vectorized shared-dict decode: pc.take on the dictionary array."""
    th = meta["th"]
    if th not in SHARED_STR_DICTS:
        raise ChunkFormatError(f"shared string dictionary {th} not loaded")
    values = SHARED_STR_DICTS[th]
    codes = unpack_bits(streams[0], n, meta["cb"]).astype(np.int64)
    if n and len(values) and codes.max() >= len(values):
        raise ChunkFormatError("shared dict code out of range")
    if n and not len(values):
        raise ChunkFormatError("empty shared dictionary for non-empty chunk")
    return pc.take(pa.array(values, pa.string()), pa.array(codes)).cast(pa.string())


STR_CODECS: dict[str, tuple] = {
    "plain_str": (_enc_plain, _dec_plain),
    "dict_str": (_enc_dict_str, _dec_dict_str),
    "prefix_int": (_enc_prefix_int, _dec_prefix_int),
    "fsst": (_enc_fsst, _dec_fsst),
    "fsst_shared": (_enc_fsst_shared, _dec_fsst_shared),
    "dict_str_shared": (_enc_dict_str_shared, _dec_dict_str_shared),
}


def register_str_codec(name: str, encode, decode) -> None:
    STR_CODECS[name] = (encode, decode)


STR_CANDIDATES = ("prefix_int", "dict_str", "plain_str")
_FSST_SAMPLE = 1 << 14


def save_shared_tables(path: str) -> None:
    """Persist every registered shared table/dict to a JSON sidecar (the
    run's symbol-table lineage artifact; hashes appear in chunk metadata and
    the manifest)."""
    import base64
    import json
    import os

    from tokenzip.codecs.core import SHARED_RANK_LENS, SHARED_RANK_TABLES

    data = {
        "fsst": {
            th: [base64.b64encode(s).decode() for s in symbols]
            for th, symbols in SHARED_STR_TABLES.items()
        },
        "dict": dict(SHARED_STR_DICTS),
        "rank": {
            th: base64.b64encode(np.ascontiguousarray(v, dtype="<i8").tobytes()).decode()
            for th, v in SHARED_RANK_TABLES.items()
        },
        "rank_lens": {
            th: base64.b64encode(
                np.ascontiguousarray(v, dtype=np.uint8).tobytes()
            ).decode()
            for th, v in SHARED_RANK_LENS.items()
        },
    }
    from tokenzip import uio

    # path may be a scheme:// URI (multi-node storage contract, uio.py)
    uio.write_bytes_atomic(path, json.dumps(data, sort_keys=True).encode())


def load_shared_tables(path: str) -> None:
    """Load a symbols sidecar into the per-worker registries (idempotent)."""
    import base64
    import json

    from tokenzip.codecs.core import (
        _RANK_LENS_HASH,
        _RANK_LOOKUPS,
        _RANK_VALS32,
        SHARED_RANK_LENS,
        SHARED_RANK_TABLES,
    )

    from tokenzip import uio

    data = json.loads(uio.read_bytes(path).decode())
    for th, symbols in data.get("fsst", {}).items():
        SHARED_STR_TABLES[th] = [base64.b64decode(s) for s in symbols]
    for th, values in data.get("dict", {}).items():
        SHARED_STR_DICTS[th] = values
    for th, blob in data.get("rank", {}).items():
        SHARED_RANK_TABLES[th] = np.frombuffer(
            base64.b64decode(blob), dtype="<i8"
        ).astype(np.int64)
        _RANK_LOOKUPS.pop(th, None)
        _RANK_VALS32.pop(th, None)
        SHARED_RANK_LENS.pop(th, None)
        _RANK_LENS_HASH.pop(th, None)
    for th, blob in data.get("rank_lens", {}).items():
        SHARED_RANK_LENS[th] = np.frombuffer(base64.b64decode(blob), dtype=np.uint8)


def encode_str_column(arr: pa.Array, codec: str = "auto", table_hash: str | None = None) -> bytes:
    """Encode a string column chunk; ``auto`` tries the cheap candidates
    exactly and FSST on a byte sample (extrapolated), keeping the smallest.
    Plain always applies, so auto never fails."""
    n = len(arr)
    if codec in ("fsst_shared", "dict_str_shared"):
        enc, _ = STR_CODECS[codec]
        streams, meta = enc(arr, table_hash)
        meta["n"] = n
        return pack_blob(codec, meta, streams)
    if codec != "auto":
        enc, _ = STR_CODECS[codec]
        streams, meta = enc(arr)
        meta["n"] = n
        return pack_blob(codec, meta, streams)
    best = None
    for cand in STR_CANDIDATES:
        enc, _ = STR_CODECS[cand]
        try:
            streams, meta = enc(arr)
        except CodecError:
            continue
        size = sum(len(s) for s in streams)
        if best is None or size < best[0]:
            meta["n"] = n
            best = (size, cand, meta, streams)
    assert best is not None
    # FSST: estimate on a sample; only pay the full encode if it would win.
    # Skip the (expensive: table training + pattern compile) trial entirely
    # when a structural codec already compresses well — FSST rarely beats
    # 3.3x on machine text, never prefix_int's ~10x on id columns.
    _, blob = _str_parts(arr)
    if len(blob) > 256 and best[0] > len(blob) * 0.3:
        from tokenzip.codecs import fsst as F

        sample = blob[:_FSST_SAMPLE]
        symbols = F.train_symbol_table(sample)
        est = len(F.fsst_encode(sample, symbols)) * (len(blob) / len(sample))
        est += len(F.pack_table(symbols)) + n  # table + ~1B/length varint
        if est < best[0] * 0.95:
            streams, meta = _enc_fsst(arr)
            size = sum(len(s) for s in streams)
            if size < best[0]:
                meta["n"] = n
                best = (size, "fsst", meta, streams)
    _, cand, meta, streams = best
    return pack_blob(cand, meta, streams)


def decode_str_column(blob: bytes) -> pa.Array:
    codec, meta, streams = unpack_blob(blob)
    _, dec = STR_CODECS[codec]
    return dec(streams, meta, meta["n"])
