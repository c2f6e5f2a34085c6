"""Arrow chunk layer: one input batch (doc_id, tokens, n_tok, source) ->
one encoded chunk row; and the exact inverse.

The encoded chunk is the engine's analog of the reference's
``([u8;16], len)`` tuple (/root/reference/src/encode/mod.rs:23-25) scaled to
column chunks: a binary payload per column plus out-of-band metadata
(codec id, counts, byte sizes) carried as sibling Arrow columns. List
offsets are their own delta-encoded stream — the stream-split idea
(/root/reference/README.md:154): lengths live apart from payload bytes, so
decode has no sequential next-offset-depends-on-previous-value dependency
(/root/reference/benches/varint_bench/main.rs:74-81).

Bit-identical reconstruction (including empty lists) is asserted by tests;
the per-chunk ``leb128_bytes`` column records the reference rustc-LEB128
oracle size so the <=-reference bound is auditable per chunk and in the
manifest aggregate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from tokenzip.codecs.core import (
    INT_CODECS,
    int_decoder,
    pack_blob,
    unpack_blob,
)
from tokenzip.codecs.selector import choose_int_codec
from tokenzip.codecs.strings import decode_str_column, encode_str_column
from tokenzip.errors import ChunkFormatError

# sink format: 2 = chunk rows carry did_min/did_max doc-id zone maps
# (decompress doc-id pushdown requires a sink written entirely at >= 2);
# 3 = rows also carry a did_bloom membership bitset (point lookups prune
# chunks whose id RANGE matches but which don't actually hold the id —
# the scattered-id case where range zone maps stop pruning);
# 4 = rows also carry content_chk, an order-sensitive integer checksum of
# the DECODED content (doc ids, sources, token values, list boundaries) —
# pipeline.fsck re-derives it, so silent payload bit rot (a flipped byte
# that decodes to plausible-but-wrong tokens) is detectable without the
# original corpus. Absent/zero means "not checksummed" (older sinks).
CHUNK_FORMAT = 4

# salt for the doc-id bloom hash — shared by encode (build) and
# pipeline._bloom_survivors (probe); changing it invalidates format 3
_DID_BLOOM_SALT = b"db:"

CHUNK_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()),
        ("n_rows", pa.int64()),
        ("n_tokens", pa.int64()),
        ("tokens_enc", pa.large_binary()),
        ("offsets_enc", pa.large_binary()),
        ("doc_id_enc", pa.large_binary()),
        ("source_enc", pa.large_binary()),
        ("n_tok_enc", pa.large_binary()),  # empty when derived from offsets
        ("tokens_codec", pa.string()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("tokens_bytes_out", pa.int64()),
        ("leb128_bytes", pa.int64()),
        ("source_top", pa.string()),
        # doc-id zone map: lexicographic [min, max] of the chunk's doc_id
        # column — the value-range analog of source_top for range/point
        # pushdown (scalar columns so parquet predicates see them)
        ("did_min", pa.string()),
        ("did_max", pa.string()),
        # doc-id bloom zone filter (format 3): ~BITS_PER_KEY bits/doc
        # little-endian uint64 bitset over md5-hashed doc ids; b"" means
        # "no filter — must read" (soundness under any reader)
        ("did_bloom", pa.large_binary()),
        # decoded-content checksum (format 4); 0 = not checksummed
        ("content_chk", pa.int64()),
    ]
)


_CHK_SALT = b"cc:"
_CHK_MASK = (1 << 63) - 1


def content_checksum(
    did: pa.Array, source: pa.Array, lengths: np.ndarray, values32: np.ndarray
) -> int:
    """Exact integer checksum of a chunk's DECODED content: doc ids and
    sources through the C md5 kernel, raw token values, and the doc->length
    binding (id-hash x length products catch a boundary shift that preserves
    the flat token stream). uint64 wrap-around arithmetic — deterministic
    on every platform, one pass per column, no Python loop."""
    from tokenzip.hashutil import md5_hi60_str

    if not len(lengths):
        return 0
    hd = md5_hi60_str(did, _CHK_SALT).astype(np.uint64)
    hs = md5_hi60_str(source, _CHK_SALT).astype(np.uint64)
    with np.errstate(over="ignore"):
        acc = (
            hd.sum()
            + np.uint64(3) * hs.sum()
            + np.uint64(5) * values32.astype(np.uint64).sum()
            + np.uint64(7) * (hd * lengths.astype(np.uint64)).sum()
        )
    return int(acc) & _CHK_MASK


def _tokens_parts(tokens: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (list_lengths, flat int32 values) of a list<int32> column."""
    col = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
    if col.null_count:
        raise ChunkFormatError("null tokens lists not supported")
    if isinstance(col, pa.LargeListArray):
        odt = np.int64
    else:
        odt = np.int32
    off_buf = np.frombuffer(col.buffers()[1], dtype=odt)
    offsets = off_buf[col.offset : col.offset + len(col) + 1].astype(np.int64)
    flat = col.values
    vals_np = flat.to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
    vals_np = vals_np[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets)
    return lengths, vals_np


def encode_batch(
    batch: pa.Table,
    tokens_codec: str = "auto",
    id_codec: str = "auto",
    selector_sample: int = 65_536,
    shared: dict | None = None,
) -> pa.Table:
    """Encode one Arrow batch of the input schema into one chunk row.

    ``tokens_codec='auto'`` runs the sampling-based selector and *guarantees*
    the north rule's size bound by falling back to plain LEB128 whenever the
    chosen codec's actual packed payload exceeds the LEB128 blob (sampling
    can mispredict; the floor cannot)."""
    from tokenzip.codecs.varint import leb128_size, zigzag_encode

    lengths, values32 = _tokens_parts(batch["tokens"])
    n_rows = len(lengths)
    n_tokens = int(lengths.sum())

    # ZIGZAG FUSION (native path): the size oracle and the leb128 encode
    # both run fused zigzag+kernel passes over the SIGNED int32 array — the
    # zz temporary is never materialized unless a zigzag-family codec other
    # than leb128 (svb/bitpack) actually needs it. Halves the memory passes
    # of the hottest encode route (the 8->32 single-box ceiling is DRAM
    # traffic). NumPy fallback keeps the shared-zz layout.
    from tokenzip.codecs.native import native_size_zz32

    nat_total = native_size_zz32(values32)
    if nat_total is not None:
        zz32 = None
        sizes = None
        oracle = nat_total
    else:
        zz32 = zigzag_encode(values32, 32)
        sizes = leb128_size(zz32)
        oracle = int(sizes.sum())

    def _zz32() -> np.ndarray:
        return zigzag_encode(values32, 32) if zz32 is None else zz32

    if tokens_codec == "auto":
        chosen = choose_int_codec(values32, 32, sample=selector_sample)
    else:
        chosen = tokens_codec
    enc, _ = INT_CODECS[chosen]
    if chosen == "leb128":
        if zz32 is None:
            # fused path: _enc_leb128 dispatches on the int32 dtype
            streams, meta = enc(values32, 32)
        else:
            streams, meta = enc(None, 32, zz=zz32, sizes=sizes)
    elif chosen in ("svb", "bitpack"):
        streams, meta = enc(None, 32, zz=_zz32())
    else:
        values = values32.astype(np.int64)  # i64 domain for for/rle/dict/delta
        streams, meta = enc(values, 32)
    meta["n"] = n_tokens
    tokens_blob = pack_blob(chosen, meta, streams)
    if tokens_codec == "auto" and chosen != "leb128":
        if sum(len(s) for s in streams) > oracle:
            if zz32 is None:
                lstreams, lmeta = INT_CODECS["leb128"][0](values32, 32)
            else:
                lstreams, lmeta = INT_CODECS["leb128"][0](
                    None, 32, zz=zz32, sizes=sizes
                )
            lmeta["n"] = n_tokens
            tokens_blob = pack_blob("leb128", lmeta, lstreams)
            chosen = "leb128"

    if (
        tokens_codec == "auto"
        and shared
        and n_rows
        and shared.get("tokens_rank_by_source")
    ):
        # shared per-source token rank table: compete against the stateless
        # winner (sample-estimated first; exact encode only when promising)
        # — shared mode never loses, same floor pattern as doc_id/source.
        th = shared["tokens_rank_by_source"].get(batch["source"][0].as_py())
        if th is not None:
            from tokenzip.codecs.core import SHARED_INT_CODECS, _rank_lookup

            look, k = _rank_lookup(th)
            nv = len(values32)
            if nv > selector_sample:
                half = selector_sample // 2
                stride = max(1, (nv - half) // half)
                s = np.concatenate([values32[:half], values32[half::stride][:half]])
                scale = nv / len(s)
            else:
                s, scale = values32, 1.0
            rs = look(np.ascontiguousarray(s, dtype=np.int64))
            esc = rs == k
            est = float(leb128_size(rs).sum())
            if esc.any():
                est += float(
                    leb128_size(
                        zigzag_encode(
                            np.ascontiguousarray(s, dtype=np.int64)[esc], 64
                        ).astype(np.uint64)
                    ).sum()
                )
            if est * scale < len(tokens_blob):
                senc, _ = SHARED_INT_CODECS["srank"]
                sstreams, smeta = senc(values32, 32, th)
                smeta["n"] = n_tokens
                sblob = pack_blob("srank", smeta, sstreams)
                if len(sblob) < len(tokens_blob):
                    tokens_blob = sblob
                    chosen = "srank"

    # list offsets as their own delta stream (lengths are the deltas)
    len_enc, _ = INT_CODECS["delta"]
    off_streams, off_meta = len_enc(np.cumsum(lengths), 32 if n_tokens < 2**31 else 64)
    off_meta["n"] = n_rows
    offsets_blob = pack_blob("delta", off_meta, off_streams)

    if shared and ("doc_id_fsst" in shared or "doc_id_fsst_by_source" in shared):
        # per-source symbol table when this chunk's source was sampled;
        # the global table is the fallback for unseen sources (FSST's
        # escape mechanism keeps any-bytes correctness either way).
        # Structural floor: machine-generated ids (prefix+int) compress
        # far below any byte-level table — shared mode must never lose to
        # the stateless path, so the cheaper of the two wins per chunk.
        th = None
        by_src = shared.get("doc_id_fsst_by_source") or {}
        if by_src and n_rows:
            th = by_src.get(batch["source"][0].as_py())
        th = th or shared.get("doc_id_fsst")
        doc_id_blob = encode_str_column(batch["doc_id"], "fsst_shared", table_hash=th)
        try:
            structural = encode_str_column(batch["doc_id"], "prefix_int")
            if len(structural) < len(doc_id_blob):
                doc_id_blob = structural
        except Exception:
            pass
    else:
        doc_id_blob = encode_str_column(batch["doc_id"], id_codec)
    if shared and "source_dict" in shared:
        try:
            source_blob = encode_str_column(
                batch["source"], "dict_str_shared", table_hash=shared["source_dict"]
            )
            # floor: a single-source chunk packs to a 0-bit per-chunk dict,
            # below the shared dict's log2(n_sources) bits/row — never lose
            alt = encode_str_column(batch["source"], "auto")
            if len(alt) < len(source_blob):
                source_blob = alt
        except Exception:  # value outside the shared dict: per-chunk fallback
            source_blob = encode_str_column(batch["source"], "auto")
    else:
        source_blob = encode_str_column(batch["source"], "auto")

    n_tok_col = batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    if np.array_equal(n_tok_col, lengths):
        n_tok_blob = b""  # derived: re-materialized from offsets at decode
    else:
        ntc = choose_int_codec(n_tok_col, 32, sample=selector_sample)
        e, _ = INT_CODECS[ntc]
        s, m = e(n_tok_col, 32)
        m["n"] = n_rows
        n_tok_blob = pack_blob(ntc, m, s)

    did = batch["doc_id"]
    first = did[0].as_py() if n_rows else ""
    last = did[-1].as_py() if n_rows else ""
    chunk_id = hashlib.sha1(f"{first}|{last}|{n_rows}|{n_tokens}".encode()).hexdigest()[:16]
    if n_rows:
        mm = pa.compute.min_max(did)
        did_min, did_max = mm["min"].as_py(), mm["max"].as_py()
        # membership bitset beside the range zone map: one C md5 pass over
        # the id column (the hashutil kernel), ~2 bytes/doc in the chunk row
        from tokenzip.bloom import bloom_build
        from tokenzip.hashutil import md5_hi60_str

        did_bloom = bloom_build(
            md5_hi60_str(did, _DID_BLOOM_SALT)
        ).tobytes()
    else:
        did_min = did_max = ""
        did_bloom = b""

    # uncompressed Arrow payload bytes of the four columns
    str_bytes = 0
    for name in ("doc_id", "source"):
        col = batch[name]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        buf = col.buffers()[2]
        str_bytes += (len(buf) if buf is not None else 0) + 4 * (len(col) + 1)
    bytes_in = 4 * n_tokens + 4 * (n_rows + 1) + 4 * n_rows + str_bytes

    blobs = [tokens_blob, offsets_blob, doc_id_blob, source_blob, n_tok_blob]
    bytes_out = sum(len(b) for b in blobs)

    if n_rows:
        # EXCLUSIVE source of the chunk, or "" when mixed (only possible on
        # the by_source=False encode path) — "" means "must be read" to the
        # source-pushdown filter in pipeline.decompress, so pruning on this
        # column is always sound
        vc = batch["source"].value_counts()
        source_top = vc.field("values")[0].as_py() if len(vc) == 1 else ""
    else:
        source_top = ""

    content_chk = content_checksum(
        did.combine_chunks() if isinstance(did, pa.ChunkedArray) else did,
        batch["source"].combine_chunks()
        if isinstance(batch["source"], pa.ChunkedArray)
        else batch["source"],
        lengths,
        values32,
    )

    return pa.table(
        {
            "chunk_id": [chunk_id],
            "n_rows": [n_rows],
            "n_tokens": [n_tokens],
            "tokens_enc": [tokens_blob],
            "offsets_enc": [offsets_blob],
            "doc_id_enc": [doc_id_blob],
            "source_enc": [source_blob],
            "n_tok_enc": [n_tok_blob],
            "tokens_codec": [chosen],
            "bytes_in": [bytes_in],
            "bytes_out": [bytes_out],
            "tokens_bytes_out": [len(tokens_blob)],
            "leb128_bytes": [oracle],
            "source_top": [source_top],
            "did_min": [did_min],
            "did_max": [did_max],
            "did_bloom": [did_bloom],
            "content_chk": [content_chk],
        },
        schema=CHUNK_SCHEMA,
    )


TOKEN_OUT_COLS = ("doc_id", "tokens", "n_tok", "source")


def conform_chunk_rows(t: pa.Table) -> pa.Table:
    """Add any missing CHUNK_SCHEMA columns with their documented "absent"
    sentinels (did_bloom b"" = no filter / must read; content_chk 0 = not
    checksummed) so pass-through rows from an older-format sink can share
    one write with freshly re-encoded current-format rows."""
    for f in CHUNK_SCHEMA:
        if f.name in t.column_names:
            continue
        if f.name == "did_bloom":
            fill = pa.array([b""] * len(t), f.type)
        elif f.name == "content_chk":
            fill = pa.array([0] * len(t), f.type)
        else:
            raise ChunkFormatError(
                f"chunk rows missing required column {f.name!r}"
            )
        t = t.append_column(f.name, fill)
    return t.select([f.name for f in CHUNK_SCHEMA])


def decode_chunk_row(row: dict, columns: list[str] | None = None) -> pa.Table:
    """Inverse of :func:`encode_batch` for one chunk row -> original batch.

    ``columns`` is the PROJECTION pushdown: only the named output columns'
    streams are decoded — an id/length-only query over a 100-TB sink never
    spends a cycle (or a byte of DRAM) on the token payload. Column order
    of the result is canonical (TOKEN_OUT_COLS order) regardless of the
    request order."""
    if columns is None:
        want = set(TOKEN_OUT_COLS)
    else:
        want = set(columns)
        unknown = want - set(TOKEN_OUT_COLS)
        if unknown:
            raise ValueError(f"unknown sink columns: {sorted(unknown)}")
    n_rows = int(row["n_rows"])
    n_tokens = int(row["n_tokens"])

    # offsets decode when tokens are wanted, or when n_tok is wanted and
    # was derived from offsets at encode time (empty n_tok_enc)
    need_ntok_from_offsets = "n_tok" in want and len(row["n_tok_enc"]) == 0
    offsets = lengths = None
    if "tokens" in want or need_ntok_from_offsets:
        codec, meta, streams = unpack_blob(row["offsets_enc"])
        cum = int_decoder(codec)(streams, meta, n_rows).astype(np.int64, copy=False)
        offsets = np.zeros(n_rows + 1, dtype=np.int64)
        offsets[1:] = cum
        lengths = np.diff(offsets)
        if n_rows and int(offsets[-1]) != n_tokens:
            raise ChunkFormatError(
                f"offsets end {offsets[-1]} != n_tokens {n_tokens}"
            )

    cols: dict[str, pa.Array] = {}
    if "doc_id" in want:
        cols["doc_id"] = decode_str_column(row["doc_id_enc"])
    if "tokens" in want:
        codec, meta, streams = unpack_blob(row["tokens_enc"])
        values = int_decoder(codec)(streams, meta, n_tokens).astype(
            np.int32, copy=False
        )
        # zero-copy arrow view over the decoded NumPy buffer (pa.array would
        # copy the whole token payload a second time — measurable DRAM
        # traffic at decode rates); py_buffer keeps the ndarray alive via
        # buf protocol
        values = np.ascontiguousarray(values)
        val_arr = pa.Array.from_buffers(
            pa.int32(), len(values), [None, pa.py_buffer(values)]
        )
        cols["tokens"] = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int64()).cast(pa.int32())
            if n_tokens < 2**31
            else pa.array(offsets, type=pa.int64()),
            val_arr,
        )
    if "n_tok" in want:
        if need_ntok_from_offsets:
            n_tok = lengths.astype(np.int32)
        else:
            codec, meta, streams = unpack_blob(row["n_tok_enc"])
            n_tok = int_decoder(codec)(streams, meta, n_rows).astype(
                np.int32, copy=False
            )
        cols["n_tok"] = pa.array(n_tok)
    if "source" in want:
        cols["source"] = decode_str_column(row["source_enc"])

    return pa.table({k: cols[k] for k in TOKEN_OUT_COLS if k in cols})


def decode_chunks(chunks: pa.Table, columns: list[str] | None = None) -> pa.Table:
    """Decode a table of chunk rows back to original rows (concatenated).
    ``columns`` projects at the STREAM level (see decode_chunk_row)."""
    def cell(k, i):
        v = chunks[k][i]
        # zero-copy buffers for the binary payload columns; python scalars
        # for the small metadata cells
        if isinstance(v, (pa.LargeBinaryScalar, pa.BinaryScalar)):
            buf = v.as_buffer()
            return memoryview(buf) if buf is not None else b""
        return v.as_py()

    parts = [
        decode_chunk_row({k: cell(k, i) for k in chunks.column_names}, columns)
        for i in range(chunks.num_rows)
    ]
    if not parts:
        empty = {
            "doc_id": pa.array([], pa.string()),
            "tokens": pa.array([], pa.list_(pa.int32())),
            "n_tok": pa.array([], pa.int32()),
            "source": pa.array([], pa.string()),
        }
        keep = set(columns) if columns is not None else set(empty)
        return pa.table({k: v for k, v in empty.items() if k in keep})
    return pa.concat_tables(parts)
