"""Integer codec library + chunk-blob container framing + registry.

The codec family mandated by the north rule: stream-split varint (Stream
VByte layout, cited at /root/reference/README.md:154-155), plain LEB128
(byte-identical to the reference encoder, /root/reference/src/encode/mod.rs:23-25
— and therefore exactly the rustc-serialize baseline size,
/root/reference/benches/varint_bench/leb128.rs:4-24), RLE, dictionary,
bit-packing, frame-of-reference, and delta.

Every codec is a pair of pure functions over NumPy int64 arrays:
``encode(values, width) -> (streams, meta)`` and
``decode(streams, meta, n) -> values``. The registry mirrors the reference's
compile-time kernel dispatch (``VarIntTarget`` specialization,
/root/reference/src/num.rs:9-46, and the build-time cfg dispatch,
/root/reference/build.rs:57-85): a name chooses an implementation; the
auto-selector (selector.py) consults the registry the same way users extend it.

``width`` (8/16/32/64) is the declared signed width of the source column
(tokens are int32 -> width 32); decode enforces the reference's overflow
bounds for that width.
"""

from __future__ import annotations

import json
import struct

import numpy as np

from tokenzip.errors import ChunkFormatError, CodecError
from tokenzip.codecs.bitpack import bit_width, pack_bits, unpack_bits
from tokenzip.codecs.varint import (
    decode_leb128,
    encode_leb128,
    leb128_size,
    zigzag_decode,
    zigzag_encode,
)

_MAGIC = b"TKZ1"

# ---------------------------------------------------------------------------
# Container framing: one self-describing binary blob per encoded column chunk.
# The reference returns (bytes, length) tuples out-of-band
# (/root/reference/src/encode/mod.rs:23-25); here the framing carries codec id,
# meta and per-stream lengths so chunks are self-contained and decode is
# embarrassingly parallel.
# ---------------------------------------------------------------------------


def pack_blob(codec: str, meta: dict, streams: list[bytes]) -> bytes:
    header = json.dumps(
        {"c": codec, "m": meta, "sl": [len(s) for s in streams]},
        sort_keys=True,
        separators=(",", ":"),
    ).encode()
    return b"".join([_MAGIC, struct.pack("<I", len(header)), header, *streams])


def unpack_blob(blob) -> tuple[str, dict, list]:
    """Parse a packed chunk blob. Streams are returned as zero-copy
    memoryviews of the input buffer (accepts bytes, memoryview, or a
    pyarrow Buffer) — decoders wrap them with np.frombuffer without
    copying; large payloads never get re-materialized."""
    mv = memoryview(blob)
    if bytes(mv[:4]) != _MAGIC:
        raise ChunkFormatError(f"bad magic {bytes(mv[:4])!r}")
    (hlen,) = struct.unpack_from("<I", mv, 4)
    header = json.loads(bytes(mv[8 : 8 + hlen]).decode())
    streams, off = [], 8 + hlen
    for sl in header["sl"]:
        streams.append(mv[off : off + sl])
        off += sl
    return header["c"], header["m"], streams


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def _as_i64(values: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(values, dtype=np.int64)


def _zz(values: np.ndarray, width: int) -> np.ndarray:
    """ZigZag at the column width, widened to uint64 for the kernels."""
    return zigzag_encode(values.astype(f"int{width}", copy=False), width).astype(np.uint64)


def _unzz(u: np.ndarray, width: int) -> np.ndarray:
    return zigzag_decode(u.astype(f"uint{width}", copy=False), width).astype(np.int64)


def _mod_sub(a: np.ndarray, ref: int) -> np.ndarray:
    """(a - ref) in modular uint64 arithmetic (safe for any int64 range)."""
    with np.errstate(over="ignore"):
        return a.view(np.uint64) - np.uint64(ref & 0xFFFFFFFFFFFFFFFF)


def _mod_add(d: np.ndarray, ref: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (d.astype(np.uint64) + np.uint64(ref & 0xFFFFFFFFFFFFFFFF)).view(np.int64)


def _unique_inverse_counts(
    values: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(uniq ascending, inverse codes, counts) — like np.unique but O(n)
    via bincount when the value RANGE is dense enough (token vocabularies
    are), falling back to sort-based np.unique for wide ranges. The range
    cap also bounds the temporary table to ~32 MB per task (this box
    punishes large per-task page-fault footprints)."""
    n = len(values)
    if n:
        vmin, vmax = int(values.min()), int(values.max())
        rng = vmax - vmin + 1
        if rng <= min(4 * n, 1 << 22):
            shifted = (values - vmin).astype(np.int64, copy=False)
            c = np.bincount(shifted, minlength=rng)
            nz = np.flatnonzero(c)
            code_of = np.empty(rng, dtype=np.int64)
            code_of[nz] = np.arange(len(nz))
            return nz + vmin, code_of[shifted], c[nz]
        # wide range (hashed vocabularies): one-pass C hash distinct+count
        # instead of np.unique's argsort over n
        from tokenzip.codecs.native import native_hash_codes_i64

        res = native_hash_codes_i64(np.ascontiguousarray(values, dtype=np.int64))
        if res is not None:
            keys, counts_s, codes, k = res
            occ = np.flatnonzero(counts_s)
            sidx = np.argsort(keys[occ], kind="stable")
            code_of_slot = np.empty(len(keys), dtype=np.int64)
            code_of_slot[occ[sidx]] = np.arange(k)
            return keys[occ][sidx], code_of_slot[codes], counts_s[occ][sidx]
    uniq, inv, counts = np.unique(values, return_inverse=True, return_counts=True)
    return uniq, inv, counts


def _runs(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = len(values)
    if n == 0:
        return values[:0], np.empty(0, dtype=np.int64)
    idx = np.flatnonzero(np.diff(values) != 0) + 1
    starts = np.concatenate(([0], idx))
    lens = np.diff(np.concatenate((starts, [n])))
    return values[starts], lens


# ---------------------------------------------------------------------------
# Codecs
# ---------------------------------------------------------------------------


def _enc_leb128(values, width, zz=None, sizes=None):
    if (
        zz is None
        and width == 32
        and isinstance(values, np.ndarray)
        and values.dtype == np.dtype(np.int32)
    ):
        # fused zigzag+encode: one pass over the signed array, no zz temp
        from tokenzip.codecs.native import native_encode_zz32

        blob = native_encode_zz32(np.ascontiguousarray(values))
        if blob is not None:
            return [blob], {"w": width}
    u = zz if zz is not None else _zz(values, width)
    return [encode_leb128(u, sizes)], {"w": width}


def _dec_leb128(streams, meta, n):
    if meta["w"] == 32 and n:
        # fused decode+unzigzag straight to int32 (values are int32-ranged
        # by construction at width 32; callers astype(copy=False) as needed)
        from tokenzip.codecs.native import native_decode_zz32
        from tokenzip.errors import VarintOverflowError, VarintTruncatedError

        b = streams[0]
        b = b if isinstance(b, np.ndarray) else np.frombuffer(b, dtype=np.uint8)
        res = native_decode_zz32(np.ascontiguousarray(b), int(n))
        if res is not None:
            rc, out = res
            if rc == 1:
                raise VarintTruncatedError(
                    f"expected {n} varints, stream ends mid-varint"
                )
            if rc == 2:
                raise VarintOverflowError("varint exceeds u32 bounds")
            return out
    return _unzz(decode_leb128(streams[0], n, width=meta["w"]), meta["w"])


def _svb_nbytes(u32: np.ndarray) -> np.ndarray:
    nb = np.ones(len(u32), dtype=np.int64)
    for t in (8, 16, 24):
        nb += (u32 >= np.uint32(1 << t)).astype(np.int64)
    return nb


def _enc_svb(values, width, zz=None):
    """Stream-split varint, Stream VByte layout (README.md:154): 2-bit length
    codes packed 4-per-control-byte in one stream, raw little-endian value
    bytes (full 8-bit groups, no continuation bits) in the other. Removes the
    sequential next-offset-depends-on-previous-length dependency of inline
    varints (/root/reference/benches/varint_bench/main.rs:74-81) — decode
    reads lengths and payload independently."""
    if width > 32:
        raise CodecError("svb codec requires values within int32")
    u = zz.astype(np.uint32) if zz is not None else _zz(values, 32).astype(np.uint32)
    n = len(u)
    from tokenzip.codecs.native import native_svb_encode

    nat = native_svb_encode(np.ascontiguousarray(u))
    if nat is not None:
        return [nat[0], nat[1]], {"w": width}
    nb = _svb_nbytes(u)
    codes = (nb - 1).astype(np.uint8)
    pad = (-n) % 4
    if pad:
        codes = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
    codes = codes.reshape(-1, 4)
    control = (
        codes[:, 0] | (codes[:, 1] << 2) | (codes[:, 2] << 4) | (codes[:, 3] << 6)
    ).astype(np.uint8)
    data4 = u.astype("<u4").view(np.uint8).reshape(n, 4)
    keep = np.arange(4) < nb[:, None]
    payload = data4[keep]
    return [control.tobytes(), payload.tobytes()], {"w": width}


def _dec_svb(streams, meta, n):
    control = np.frombuffer(streams[0], dtype=np.uint8)
    if len(control) < (n + 3) // 4:
        raise ChunkFormatError("svb control stream too short")
    from tokenzip.codecs.native import native_svb_decode

    if n:
        nat = native_svb_decode(
            np.ascontiguousarray(control),
            np.ascontiguousarray(np.frombuffer(streams[1], dtype=np.uint8)),
            n,
        )
        if nat is not None:
            rc, u = nat
            if rc:
                raise ChunkFormatError("svb payload stream too short")
            return _unzz(u, 32)
    codes = np.empty(len(control) * 4, dtype=np.int64)
    for i in range(4):
        codes[i::4] = (control >> (2 * i)) & 0x03
    nb = codes[:n] + 1
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nb, out=offsets[1:])
    payload = np.frombuffer(streams[1], dtype=np.uint8)
    if len(payload) < offsets[-1]:
        raise ChunkFormatError("svb payload stream too short")
    padded = np.concatenate([payload, np.zeros(4, dtype=np.uint8)])
    idx = offsets[:-1, None] + np.arange(4)
    vals4 = padded[idx].astype(np.uint32)
    vals4 *= np.arange(4) < nb[:, None]  # zero out bytes beyond the value's length
    u = (
        vals4[:, 0]
        | (vals4[:, 1] << np.uint32(8))
        | (vals4[:, 2] << np.uint32(16))
        | (vals4[:, 3] << np.uint32(24))
    )
    return _unzz(u.astype(np.uint32), 32)


def _enc_bitpack(values, width, zz=None):
    u = zz if zz is not None else _zz(values, width)
    bits = bit_width(int(u.max())) if len(u) else 0
    return [pack_bits(u, bits)], {"w": width, "b": bits}


def _dec_bitpack(streams, meta, n):
    u = unpack_bits(streams[0], n, meta["b"])
    return _unzz(u, meta["w"])


def _enc_for(values, width):
    """Frame-of-reference: subtract the chunk minimum, bit-pack the deltas.
    Sign handling free (deltas are non-negative) — ZigZag not needed."""
    if len(values) == 0:
        return [b""], {"w": width, "ref": 0, "b": 0}
    ref = int(values.min())
    deltas = _mod_sub(values, ref)
    bits = bit_width(int(deltas.max()))
    return [pack_bits(deltas, bits)], {"w": width, "ref": ref, "b": bits}


def _dec_for(streams, meta, n):
    w, ref, bits = meta["w"], meta["ref"], meta["b"]
    if w <= 32 and n and bits:
        # fused unpack + reference-add straight to int32 (one memory pass;
        # values are int32-ranged by construction at width <= 32)
        from tokenzip.codecs.native import native_unpack_add_i32

        b = streams[0]
        b = b if isinstance(b, np.ndarray) else np.frombuffer(b, dtype=np.uint8)
        if len(b) < (n * bits + 7) // 8:
            raise CodecError(
                f"bitpack buffer too short: {len(b)} < {(n * bits + 7) // 8}"
            )
        out = native_unpack_add_i32(b, n, bits, ref)
        if out is not None:
            return out
    deltas = unpack_bits(streams[0], n, bits)
    res = _mod_add(deltas, ref)
    return res.astype(np.int32, copy=False) if w <= 32 else res


def _bitwidth_u64(u: np.ndarray) -> np.ndarray:
    """Per-value bit widths of a uint64 array, vectorized. Split into
    32-bit halves so float64 log2 is exact (every uint32 is exactly
    representable; log2 of an exact power of two is exact in IEEE)."""
    u = u.astype(np.uint64, copy=False)
    hi = (u >> np.uint64(32)).astype(np.uint32)
    lo = u.astype(np.uint32)  # C-cast truncation keeps the low 32 bits

    def _bw32(x: np.ndarray) -> np.ndarray:
        out = np.zeros(len(x), dtype=np.int64)
        nz = x > 0
        if nz.any():
            out[nz] = np.floor(np.log2(x[nz].astype(np.float64))).astype(np.int64) + 1
        return out

    bhi = _bw32(hi)
    return np.where(bhi > 0, bhi + 32, _bw32(lo))


def _pfor_plan(deltas: np.ndarray) -> tuple[int, np.ndarray]:
    """Choose the PFOR body width b: minimize exact body bytes + exact
    exception-delta LEB128 bytes + a worst-case position-gap bound.
    Pure function of the chunk contents (retry-deterministic).

    Returns (b, per-value bit widths)."""
    n = len(deltas)
    bits = _bitwidth_u64(deltas)
    hist = np.bincount(bits, minlength=65)[:65]
    widths = np.arange(65, dtype=np.int64)
    lebb = np.maximum(1, (widths + 6) // 7)  # LEB128 bytes for a k-bit value
    # suffix sums: S[k] = count of values with bit width >= k,
    #              V[k] = their total LEB128 payload bytes
    S = np.concatenate([np.cumsum(hist[::-1])[::-1], [0]])
    V = np.concatenate([np.cumsum((hist * lebb)[::-1])[::-1], [0]])
    gap_leb = max(1, (max(1, n - 1).bit_length() + 6) // 7)
    # exceptions at body width b are the values needing MORE than b bits
    cost = (n * widths + 7) // 8 + V[1:] + S[1:] * gap_leb
    return int(np.argmin(cost)), bits


def _enc_pfor(values, width):
    """Patched frame-of-reference (PFOR — Zukowski, Héman, Nes & Boncz,
    "Super-Scalar RAM-CPU Cache Compression", ICDE 2006): frame-of-reference
    at the bit width covering the dense body of the delta distribution, with
    outlier deltas patched through an exception stream instead of inflating
    every slot to the max width. Streams: [packed body, exception position
    gaps (LEB128, gap-from-previous with the first gap absolute), exception
    deltas (LEB128)]. Wins over plain FoR exactly when a few spikes stretch
    the max delta (the reference's per-width kernel-choice concern,
    /root/reference/src/num.rs:50, taken to per-value granularity)."""
    n = len(values)
    if n == 0:
        return [b"", b"", b""], {"w": width, "ref": 0, "b": 0, "nx": 0}
    ref = int(values.min())
    deltas = _mod_sub(values, ref)
    b, bits = _pfor_plan(deltas)
    mask = bits > b
    nx = int(mask.sum())
    if nx:
        body = deltas.copy()
        body[mask] = 0
        pos = np.flatnonzero(mask).astype(np.uint64)
        gaps = np.diff(pos, prepend=np.uint64(0))
        streams = [
            pack_bits(body, b),
            encode_leb128(gaps),
            encode_leb128(deltas[mask]),
        ]
    else:
        streams = [pack_bits(deltas, b), b"", b""]
    return streams, {"w": width, "ref": ref, "b": b, "nx": nx}


def _dec_pfor(streams, meta, n):
    w, ref, bits, nx = meta["w"], meta["ref"], meta["b"], meta["nx"]
    if w <= 32 and n and bits and not nx:
        # exception-free chunk: identical layout to FoR — reuse the fused
        # native unpack+add path
        return _dec_for([streams[0]], {"w": w, "ref": ref, "b": bits}, n)
    deltas = unpack_bits(streams[0], n, bits)
    if nx:
        gaps = decode_leb128(streams[1], nx, width=64)
        pos = np.cumsum(gaps.astype(np.uint64)).astype(np.int64)
        if len(pos) and (pos[-1] >= n or pos[0] < 0):
            raise ChunkFormatError(
                f"pfor exception position {int(pos[-1])} out of range (n={n})"
            )
        vals = decode_leb128(streams[2], nx, width=64)
        if not deltas.flags.writeable:
            deltas = deltas.copy()
        deltas[pos] = vals
    res = _mod_add(deltas, ref)
    return res.astype(np.int32, copy=False) if w <= 32 else res


def _enc_rle(values, width):
    run_vals, run_lens = _runs(values)
    return (
        [encode_leb128(_zz(run_vals, width)), encode_leb128(run_lens.astype(np.uint64))],
        {"w": width, "r": len(run_vals)},
    )


def _dec_rle(streams, meta, n):
    r = meta["r"]
    run_vals = _unzz(decode_leb128(streams[0], r, width=meta["w"]), meta["w"])
    run_lens = decode_leb128(streams[1], r, width=64).astype(np.int64)
    if int(run_lens.sum()) != n:
        raise ChunkFormatError(f"rle lengths sum {run_lens.sum()} != n {n}")
    return np.repeat(run_vals, run_lens)


def _enc_dict(values, width):
    """Dictionary: sorted distinct values, delta+LEB128 encoded (ascending
    diffs are small), plus bit-packed per-value codes."""
    uniq, inv, _ = _unique_inverse_counts(values)
    k = len(uniq)
    code_bits = bit_width(k - 1) if k > 1 else 0
    if k == 0:
        dict_stream = b""
    else:
        first = _zz(uniq[:1], 64)
        with np.errstate(over="ignore"):
            diffs = uniq[1:].view(np.uint64) - uniq[:-1].view(np.uint64)  # ascending => >=1
        dict_stream = encode_leb128(np.concatenate([first, diffs]))
    return (
        [dict_stream, pack_bits(inv.astype(np.uint64), code_bits)],
        {"w": width, "k": k, "cb": code_bits},
    )


def _dec_dict(streams, meta, n):
    k = meta["k"]
    if k == 0:
        if n:
            raise ChunkFormatError("empty dictionary for non-empty chunk")
        return np.empty(0, dtype=np.int64)
    raw = decode_leb128(streams[0], k, width=64)
    uniq = np.empty(k, dtype=np.int64)
    uniq[0] = _unzz(raw[:1], 64)[0]
    if k > 1:
        with np.errstate(over="ignore"):
            uniq[1:] = uniq[0] + np.cumsum(raw[1:]).view(np.int64)
    codes_u = unpack_bits(streams[1], n, meta["cb"])
    if len(codes_u) and int(codes_u.max()) >= k:
        raise ChunkFormatError("dictionary code out of range")
    codes = codes_u.view(np.int64)
    if meta["w"] <= 32:
        # gather from an int32 dictionary so the n-sized output is written
        # once at 4 B/value (values are int32-ranged at width <= 32)
        return uniq.astype(np.int32)[codes]
    return uniq[codes]


def _enc_rankdict(values, width):
    """Frequency-rank dictionary: codes are assigned by DESCENDING frequency
    (rank 0 = most common value) and stored as unsigned LEB128, so a skewed
    distribution pays ~1 byte for its hot values where plain ``dict`` pays a
    fixed ceil(log2 k) bits and ``leb128`` pays the value's own magnitude.
    Streams: (1) ascending distinct values, delta+LEB128 (same layout as
    ``dict``); (2) the rank->sorted-index permutation, bit-packed; (3) the
    per-value ranks, unsigned LEB128. Wins on zipf-ish token streams (the
    dominant ``web`` source: 1.18 vs 1.30 B/token)."""
    n = len(values)
    ranks = None
    if n:
        vmin, vmax = int(values.min()), int(values.max())
        rng = vmax - vmin + 1
        if rng <= min(4 * n, 1 << 22):
            # dense-range fast path (token vocabularies): bincount + ONE
            # value->rank table gather — no sort over n, no second gather,
            # minimal fresh allocations (page faults dominate this box)
            shifted = values if vmin == 0 else values - vmin
            c = np.bincount(shifted, minlength=rng)
            nz = np.flatnonzero(c)
            uniq, counts = nz + vmin, c[nz]
            k = len(uniq)
            order = np.argsort(-counts, kind="stable")
            # uint32 ranks: k < 2^31 always; the n-sized gather writes
            # 4 B/value and the LEB128 encode takes the faster u32 kernel
            rank_of = np.empty(k, dtype=np.uint32)
            rank_of[order] = np.arange(k, dtype=np.uint32)
            table = np.zeros(rng, dtype=np.uint32)
            table[nz] = rank_of
            ranks = table[shifted]
    if ranks is None:
        from tokenzip.codecs.native import native_hash_codes_i64

        res = native_hash_codes_i64(np.ascontiguousarray(values, dtype=np.int64))
        if res is not None and n:
            # wide-range fast path: ONE n-sized gather through a fused
            # slot->rank table (hash pass + gather + LEB128 = ~3 passes)
            keys, counts_s, codes, k = res
            occ = np.flatnonzero(counts_s)
            sidx = np.argsort(keys[occ], kind="stable")
            uniq = keys[occ][sidx]
            counts = counts_s[occ][sidx]
            order = np.argsort(-counts, kind="stable")
            rank_of = np.empty(k, dtype=np.uint32)
            rank_of[order] = np.arange(k, dtype=np.uint32)
            slot_rank = np.empty(len(keys), dtype=np.uint32)
            slot_rank[occ[sidx]] = rank_of
            ranks = slot_rank[codes]
        else:
            uniq, inv, counts = _unique_inverse_counts(values)
            k = len(uniq)
            order = np.argsort(-counts, kind="stable")  # rank -> sorted-uniq idx
            rank_of = np.empty(k, dtype=np.uint32)
            rank_of[order] = np.arange(k, dtype=np.uint32)
            ranks = rank_of[inv] if k else np.empty(0, np.uint32)
    code_bits = bit_width(k - 1) if k > 1 else 0
    if k == 0:
        dict_stream = b""
    else:
        first = _zz(uniq[:1], 64)
        with np.errstate(over="ignore"):
            diffs = uniq[1:].view(np.uint64) - uniq[:-1].view(np.uint64)
        dict_stream = encode_leb128(np.concatenate([first, diffs]))
    meta = {"w": width, "k": k, "cb": code_bits}
    rank_stream = None
    if k == 1 and n:
        # single-symbol chunk: zero-bit codes (the decoder replays the count)
        rank_stream = b""
        meta["rs"] = "h"
        meta["blc"] = []
    elif k >= 2 and n:
        # rank-stream coding choice: canonical Huffman vs LEB128, both sized
        # exactly from the rank-count boundaries (no trial encode). Ranks are
        # count-sorted, so the Huffman table ships as a ~40-byte
        # counts-per-length histogram ("blc") — closes LEB128's 1-byte floor
        # on sub-byte-entropy sources (web: 6.5 bits/token).
        from tokenzip.codecs.huffman import blc_from_lens, encode_syms, huff_lengths

        counts_desc = np.ascontiguousarray(counts[order], dtype=np.int64)
        cum = np.cumsum(counts_desc)
        leb_bytes = int(cum[-1])
        for t in (1 << 7, 1 << 14, 1 << 21, 1 << 28):
            if k > t:
                leb_bytes += int(cum[-1] - cum[t - 1])
        lens = huff_lengths(counts_desc)
        hbits = int((counts_desc * lens).sum())
        blc = blc_from_lens(lens)
        # include the histogram's JSON-header cost in the comparison
        if (hbits + 7) // 8 + 4 * len(blc) + 12 < leb_bytes:
            rank_stream = encode_syms(ranks, lens)
            meta["rs"] = "h"
            meta["blc"] = blc
    if rank_stream is None:
        rank_stream = encode_leb128(ranks)
    return (
        [dict_stream, pack_bits(order.astype(np.uint64), code_bits), rank_stream],
        meta,
    )


def _dec_rankdict(streams, meta, n):
    k = meta["k"]
    if k == 0:
        if n:
            raise ChunkFormatError("empty dictionary for non-empty chunk")
        return np.empty(0, dtype=np.int64)
    raw = decode_leb128(streams[0], k, width=64)
    uniq = np.empty(k, dtype=np.int64)
    uniq[0] = _unzz(raw[:1], 64)[0]
    if k > 1:
        with np.errstate(over="ignore"):
            uniq[1:] = uniq[0] + np.cumsum(raw[1:]).view(np.int64)
    order_u = unpack_bits(streams[1], k, meta["cb"])
    if len(order_u) and int(order_u.max()) >= k:
        raise ChunkFormatError("rankdict permutation index out of range")
    order = order_u.view(np.int64)
    if meta.get("rs") == "h":
        from tokenzip.codecs.huffman import decode_syms, lens_from_blc

        if k == 1:
            ranks = np.zeros(n, dtype=np.int64)
        else:
            lens = lens_from_blc(meta["blc"])
            if len(lens) != k:
                raise ChunkFormatError("huffman histogram size != dictionary size")
            ranks = decode_syms(streams[2], n, lens).astype(np.int64, copy=False)
    else:
        ranks_u = decode_leb128(streams[2], n, width=64)
        if len(ranks_u) and int(ranks_u.max()) >= k:
            raise ChunkFormatError("rankdict rank out of range")
        ranks = np.ascontiguousarray(ranks_u).view(np.int64)
    vals_by_rank = uniq[order]
    if meta["w"] <= 32:
        # int32 rank table => the n-sized gather writes 4 B/value
        vals_by_rank = vals_by_rank.astype(np.int32)
    return vals_by_rank[ranks]


def _enc_delta(values, width):
    """Delta + ZigZag + LEB128: first value then successive differences.
    Wins on sorted / clustered streams (list offsets, timestamps). Valid for
    the full int64 domain: differences wrap mod 2^64 and the decoder's
    cumulative sum wraps identically, so the roundtrip is exact even when a
    delta overflows (zigzag64 is a bijection on int64)."""
    n = len(values)
    if n == 0:
        return [b""], {"w": width}
    seq = np.empty(n, dtype=np.int64)
    seq[0] = values[0]
    with np.errstate(over="ignore"):
        seq[1:] = np.diff(values)
    return [encode_leb128(zigzag_encode(seq, 64).astype(np.uint64))], {"w": width}


def _enc_dod(values, width):
    """Delta-of-delta + ZigZag + LEB128: value0, first delta, then
    SECOND-order differences (the Gorilla timestamp trick — Pelkonen et
    al., "Gorilla: A Fast, Scalable, In-Memory Time Series Database",
    VLDB 2015 §4.1 — re-expressed byte-aligned). Near-arithmetic streams
    (regular-cadence timestamps, auto-increment ids) collapse to
    ~1 B/value even when the first-order delta itself is large. Same
    mod-2^64 wraparound contract as `delta`: the decoder's double
    cumulative sum wraps identically, so the roundtrip is exact on the
    full int64 domain."""
    n = len(values)
    if n == 0:
        return [b""], {"w": width}
    seq = np.empty(n, dtype=np.int64)
    seq[0] = values[0]
    if n > 1:
        with np.errstate(over="ignore"):
            d = np.diff(values)
            seq[1] = d[0]
            seq[2:] = np.diff(d)
    return [encode_leb128(zigzag_encode(seq, 64).astype(np.uint64))], {"w": width}


def _dec_dod(streams, meta, n):
    narrow = meta["w"] <= 32
    if n == 0:
        return np.empty(0, dtype=np.int32 if narrow else np.int64)
    seq = zigzag_decode(decode_leb128(streams[0], n, width=64), 64).astype(np.int64)
    with np.errstate(over="ignore"):
        deltas = np.cumsum(seq[1:])  # first-order deltas d_1..d_{n-1}
        out = np.empty(n, dtype=np.int64)
        out[0] = seq[0]
        out[1:] = seq[0] + np.cumsum(deltas)
    return out.astype(np.int32, copy=False) if narrow else out


def _dec_delta(streams, meta, n):
    narrow = meta["w"] <= 32
    if n == 0:
        return np.empty(0, dtype=np.int32 if narrow else np.int64)
    if narrow:
        # fused LEB128 + unzigzag + prefix-sum straight to int32: one pass
        # (final values are int32-ranged by construction at width <= 32;
        # intermediate wraparound is mod-2^64, identical to the NumPy path)
        from tokenzip.codecs.native import native_dec_delta_i32
        from tokenzip.errors import VarintOverflowError, VarintTruncatedError

        b = streams[0]
        b = b if isinstance(b, np.ndarray) else np.frombuffer(b, dtype=np.uint8)
        res = native_dec_delta_i32(np.ascontiguousarray(b), int(n))
        if res is not None:
            rc, out = res
            if rc == 1:
                raise VarintTruncatedError(
                    f"expected {n} varints, stream ends mid-varint"
                )
            if rc == 2:
                raise VarintOverflowError("varint exceeds u64 bounds")
            return out
    seq = zigzag_decode(decode_leb128(streams[0], n, width=64), 64).astype(np.int64)
    with np.errstate(over="ignore"):
        out = np.cumsum(seq)
    return out.astype(np.int32, copy=False) if narrow else out


# ---------------------------------------------------------------------------
# Shared (trained) integer rank tables — the token-stream analog of the
# shared FSST/dict string tables (strings.py): a per-source frequency-rank
# dictionary trained ONCE on a deterministic fragment sample, broadcast to
# every encode/decode actor, and referenced by hash from chunk metadata.
# Amortizes the rankdict dictionary+permutation overhead across ALL chunks
# of a source; values absent from the table escape losslessly.
# ---------------------------------------------------------------------------

SHARED_RANK_TABLES: dict[str, np.ndarray] = {}  # hash -> values ordered by rank
_RANK_LOOKUPS: dict[str, tuple] = {}  # hash -> (kind, ...) value->rank state
_RANK_VALS32: dict[str, np.ndarray] = {}  # hash -> int32 cast of the table
# hash -> per-symbol Huffman lengths (k+1 incl. the escape symbol at index k),
# trained on the same sample as the table; optional — srank falls back to
# LEB128 ranks when absent
SHARED_RANK_LENS: dict[str, np.ndarray] = {}
_RANK_LENS_HASH: dict[str, str] = {}  # hash -> sha1(lens)[:8] integrity tag


def register_shared_rank_table(
    vals_by_rank: np.ndarray, lens_by_sym: np.ndarray | None = None
) -> str:
    import hashlib

    arr = np.ascontiguousarray(vals_by_rank, dtype=np.int64)
    th = hashlib.sha1(arr.tobytes()).hexdigest()[:12]
    SHARED_RANK_TABLES[th] = arr
    _RANK_LOOKUPS.pop(th, None)
    _RANK_VALS32.pop(th, None)
    if lens_by_sym is not None:
        lens = np.ascontiguousarray(lens_by_sym, dtype=np.uint8)
        if len(lens) != len(arr) + 1:
            raise ChunkFormatError(
                "shared rank lengths must cover every rank plus the escape"
            )
        SHARED_RANK_LENS[th] = lens
        _RANK_LENS_HASH[th] = hashlib.sha1(lens.tobytes()).hexdigest()[:8]
    else:
        SHARED_RANK_LENS.pop(th, None)
        _RANK_LENS_HASH.pop(th, None)
    return th


def _rank_lens_hash(th: str) -> str:
    tag = _RANK_LENS_HASH.get(th)
    if tag is None:
        import hashlib

        tag = hashlib.sha1(SHARED_RANK_LENS[th].tobytes()).hexdigest()[:8]
        _RANK_LENS_HASH[th] = tag
    return tag


def _rank_lookup(th: str):
    """value->rank mapper for a registered table: dense gather table when
    the value range allows (token vocabularies), else sorted binary search.
    Unknown values map to k (the escape rank). Built once per process per
    table and cached."""
    state = _RANK_LOOKUPS.get(th)
    if state is None:
        vals = SHARED_RANK_TABLES[th]
        k = len(vals)
        # uint32 rank payloads throughout (k is capped at 2^20): halves the
        # gather write traffic and takes the faster u32 LEB128 kernel
        if k and int(vals.max()) - int(vals.min()) + 1 <= max(1 << 22, 4 * k):
            vmin, vmax = int(vals.min()), int(vals.max())
            dense = np.full(vmax - vmin + 1, k, dtype=np.uint32)
            dense[vals - vmin] = np.arange(k, dtype=np.uint32)
            state = ("dense", vmin, vmax, dense, k)
        else:
            from tokenzip.codecs.native import native_hash_codes_i64

            res = native_hash_codes_i64(vals) if k else None
            if res is not None:
                # wide-range fast path: open-addressing table built with the
                # SAME splitmix64+linear probe sequence the C probe kernel
                # replays — one hash pass per batch instead of searchsorted
                keys, _counts, codes, _ = res
                rank_tbl = np.full(len(keys), 0xFFFFFFFF, dtype=np.uint32)
                rank_tbl[codes] = np.arange(k, dtype=np.uint32)
                state = ("hash", keys, rank_tbl, k)
            else:
                order = np.argsort(vals, kind="stable")
                state = ("sorted", vals[order], order.astype(np.uint32), k)
        _RANK_LOOKUPS[th] = state

    if state[0] == "hash":
        from tokenzip.codecs.native import native_hash_probe_i64

        _, hkeys, rank_tbl, k = state

        def look(values: np.ndarray) -> np.ndarray:
            r = native_hash_probe_i64(
                np.ascontiguousarray(values, dtype=np.int64), hkeys, rank_tbl, k
            )
            if r is None:  # native vanished mid-process: rebuild sorted state
                _RANK_LOOKUPS.pop(th, None)
                order = np.argsort(SHARED_RANK_TABLES[th], kind="stable")
                _RANK_LOOKUPS[th] = (
                    "sorted",
                    SHARED_RANK_TABLES[th][order],
                    order.astype(np.uint32),
                    k,
                )
                return _rank_lookup(th)[0](values)
            return r

    elif state[0] == "dense":
        _, vmin, vmax, dense, k = state

        def look(values: np.ndarray) -> np.ndarray:
            # bounds test on the VALUES (the subtraction can wrap for
            # far-out-of-table int64 inputs; a wrapped index must not be
            # allowed to alias into the table)
            oob = (values < vmin) | (values > vmax)
            with np.errstate(over="ignore"):
                idx = values - vmin
            np.clip(idx, 0, len(dense) - 1, out=idx)
            r = dense[idx]
            if oob.any():
                r[oob] = k
            return r

    else:
        _, svals, sorder, k = state

        def look(values: np.ndarray) -> np.ndarray:
            pos = np.searchsorted(svals, values)
            pos_c = np.minimum(pos, max(k - 1, 0))
            hit = svals[pos_c] == values if k else np.zeros(len(values), bool)
            r = np.full(len(values), k, dtype=np.uint32)
            if hit.any():
                r[hit] = sorder[pos_c[hit]]
            return r

    return look, k


def _enc_srank(values, width, table_hash: str):
    """Shared-rank encode: per-value rank against the broadcast table;
    values outside the table emit the escape rank k plus their raw
    zigzag-LEB128 value in a positional exceptions stream (lossless for any
    int64, mirroring FSST's escape byte). The rank stream is canonical
    Huffman (lengths trained once with the table, broadcast alongside it)
    when that beats LEB128 for this chunk, else LEB128 — per-chunk choice
    recorded in meta["rs"]."""
    values = np.ascontiguousarray(values, dtype=np.int64)
    look, k = _rank_lookup(table_hash)
    ranks = look(values)
    esc = ranks == k
    x = int(esc.sum())
    exc_stream = (
        encode_leb128(zigzag_encode(values[esc], 64).astype(np.uint64)) if x else b""
    )
    meta = {"w": width, "th": table_hash, "k": k, "x": x}
    n = len(values)
    lens = SHARED_RANK_LENS.get(table_hash)
    rank_stream = None
    if lens is not None and n:
        from tokenzip.codecs.huffman import encode_syms

        hbits = int(lens[ranks].astype(np.int64).sum())
        leb_bytes = (
            n
            + int((ranks >= 128).sum())
            + int((ranks >= 16384).sum())
            + int((ranks >= (1 << 21)).sum())
            + int((ranks >= (1 << 28)).sum())
        )
        if (hbits + 7) // 8 < leb_bytes:
            rank_stream = encode_syms(ranks, lens)
            meta["rs"] = "h"
            meta["lh"] = _rank_lens_hash(table_hash)
    if rank_stream is None:
        rank_stream = encode_leb128(ranks)
    return [rank_stream, exc_stream], meta


def _dec_srank(streams, meta, n):
    th, k, x = meta["th"], meta["k"], meta["x"]
    vals = SHARED_RANK_TABLES.get(th)
    if vals is None:
        raise ChunkFormatError(
            f"shared rank table {th} not loaded — decode needs the run's "
            f"symbols sidecar registered via load_shared_tables()"
        )
    if len(vals) != k:
        raise ChunkFormatError(f"shared rank table {th} length {len(vals)} != {k}")
    if meta.get("rs") == "h":
        from tokenzip.codecs.huffman import decode_syms

        lens = SHARED_RANK_LENS.get(th)
        if lens is None:
            raise ChunkFormatError(
                f"shared rank lengths for {th} not loaded — decode needs the "
                f"run's symbols sidecar registered via load_shared_tables()"
            )
        if len(lens) != k + 1 or _rank_lens_hash(th) != meta.get("lh"):
            raise ChunkFormatError(f"shared rank lengths for {th} mismatch chunk")
        ranks = decode_syms(streams[0], n, lens).astype(np.int64, copy=False)
    else:
        ranks_u = decode_leb128(streams[0], n, width=64)
        if len(ranks_u) and int(ranks_u.max()) > k:
            raise ChunkFormatError("srank rank out of range")
        ranks = np.ascontiguousarray(ranks_u).view(np.int64)
    esc = ranks == k
    if int(esc.sum()) != x:
        raise ChunkFormatError("srank escape count mismatch")
    exc = (
        zigzag_decode(decode_leb128(streams[1], x, width=64), 64).astype(np.int64)
        if x
        else None
    )
    # narrow (int32 gather, 4 B/value written) only when every output value
    # fits int32 — srank is documented lossless for ANY int64, so extreme
    # tables/escapes keep the wide path. Table fit is cached per hash.
    fits32 = _RANK_VALS32.get(th)
    if fits32 is None or len(fits32) != k:
        fits32 = _RANK_VALS32[th] = (
            vals.astype(np.int32)
            if (k == 0 or (vals.min() >= -(2**31) and vals.max() < 2**31))
            else np.empty(0, np.int32)  # sentinel: table does not fit
        )
        if len(fits32) != k:
            fits32 = None
    narrow = (
        meta["w"] <= 32
        and (k == 0 or fits32 is not None)
        and (
            exc is None
            or not len(exc)
            or (exc.min() >= -(2**31) and exc.max() < 2**31)
        )
    )
    if narrow and k:
        vals = fits32
    out = np.empty(n, dtype=np.int32 if narrow else np.int64)
    hit = ~esc
    out[hit] = vals[ranks[hit]]
    if exc is not None:
        out[esc] = exc.astype(out.dtype, copy=False)
    return out


SHARED_INT_CODECS: dict[str, tuple] = {"srank": (_enc_srank, _dec_srank)}


INT_CODECS: dict[str, tuple] = {
    "leb128": (_enc_leb128, _dec_leb128),
    "svb": (_enc_svb, _dec_svb),
    "bitpack": (_enc_bitpack, _dec_bitpack),
    "for": (_enc_for, _dec_for),
    "pfor": (_enc_pfor, _dec_pfor),
    "rle": (_enc_rle, _dec_rle),
    "dict": (_enc_dict, _dec_dict),
    "rankdict": (_enc_rankdict, _dec_rankdict),
    "delta": (_enc_delta, _dec_delta),
    "dod": (_enc_dod, _dec_dod),
}


def register_int_codec(name: str, encode, decode) -> None:
    """User-extension surface — the engine analog of the reference's cargo
    feature / build-time dispatch extension points
    (/root/reference/Cargo.toml:17-23, build.rs:57-85)."""
    INT_CODECS[name] = (encode, decode)


def encode_int_column(
    values: np.ndarray, codec: str, width: int = 32
) -> bytes:
    """Encode one integer column chunk with a named codec into a packed blob."""
    values = _as_i64(values)
    enc, _ = INT_CODECS[codec]
    streams, meta = enc(values, width)
    meta["n"] = len(values)
    return pack_blob(codec, meta, streams)


def int_decoder(codec: str):
    """Decoder lookup across the stateless registry and the shared
    (table-referencing) codecs."""
    if codec in INT_CODECS:
        return INT_CODECS[codec][1]
    if codec in SHARED_INT_CODECS:
        return SHARED_INT_CODECS[codec][1]
    raise CodecError(f"unknown integer codec {codec!r}")


def decode_int_column(blob: bytes, dtype=np.int64) -> np.ndarray:
    """Decode a packed integer column blob back to its values."""
    codec, meta, streams = unpack_blob(blob)
    values = int_decoder(codec)(streams, meta, meta["n"])
    return values.astype(dtype, copy=False)


# ---------------------------------------------------------------------------
# Float64 codec family: XOR-delta (Gorilla, Pelkonen et al. VLDB 2015 — the
# published insight that consecutive similar doubles XOR to words that are
# mostly zero) re-expressed over the engine's LEB128 kernels instead of
# Gorilla's bit-level windows:
#   xorf        — xor-delta words LEB128'd directly (similar values differ in
#                 LOW mantissa bits → small uint64s → short varints)
#   xorf_bswap  — xor words BYTESWAPPED first (few-significant-bit regimes
#                 like 0.5-granular prices put the xor noise in HIGH bits;
#                 the swap moves their trailing-zero bytes to the front)
#   rawf        — verbatim 8 B/value floor (random doubles are incompressible;
#                 the floor guarantee mirrors the int selector's LEB128 floor)
# Bit-exact roundtrip for every payload (NaN bits, -0.0, inf) — all paths
# operate on the uint64 views, never on float arithmetic.
# ---------------------------------------------------------------------------

#   decf        — decimal promotion (the published ALP insight, Afroozeh &
#                 Boncz SIGMOD 2023: most real-world doubles are decimals):
#                 find the smallest e with round(v*10^e)/10^e bit-identical
#                 to v for EVERY value, then run the resulting int64s
#                 through the full integer auto-selector. Prices/rates
#                 collapse from 8 B to ~2 B/value; the bit-exact roundtrip
#                 is VERIFIED at encode (uint-view compare, so -0.0 and
#                 NaN payloads reject the promotion instead of corrupting)

FLOAT_CODECS = ("decf", "xorf", "xorf_bswap", "rawf")


_F_BITS = {32: (np.float32, np.uint32), 64: (np.float64, np.uint64)}

_DECF_MAX_E = 6  # 10^6: past micro-units the int stream stops winning


_DECF_EXC_FRAC = 0.05  # promote when >= 95% of values are exact decimals


def _try_decimal(values: np.ndarray, width: int):
    """(e, int64 array, exc_idx, exc_bits) for the smallest decimal
    promotion with at most _DECF_EXC_FRAC per-value exceptions (ALP's
    exception mechanism: non-decimal stragglers — NaN, -0.0, noise —
    store their raw bit patterns beside the int stream), or None.
    Exactness is bitwise: the DECODED floats (ints / 10^e patched with the
    exception bits, in the column's width) equal the original pattern for
    every value by construction."""
    fdt, udt = _F_BITS[width]
    n = len(values)
    if n == 0:
        return None
    bits = values.view(udt)
    v64 = values.astype(np.float64)
    finite = np.isfinite(v64)
    budget = int(n * _DECF_EXC_FRAC)
    for e in range(_DECF_MAX_E + 1):
        scale = float(10**e)  # exactly representable
        scaled = v64 * scale
        # int53 exactness ceiling; NaN/inf can never promote — both become
        # exceptions (their slots hold 0 in the int stream)
        ok = finite & (np.abs(scaled) < 2**53)
        cand = np.zeros(n, dtype=np.int64)
        if ok.any():
            cand[ok] = np.round(scaled[ok]).astype(np.int64)
        # verify from the STORED int64s, not the float round result —
        # np.round keeps -0.0 while int64 cannot, and the decoder divides
        # the int64 stream
        back = (cand / scale).astype(fdt, copy=False)
        exc = back.view(udt) != bits
        n_exc = int(exc.sum())
        if n_exc <= budget:
            if n_exc:
                idx = np.flatnonzero(exc).astype(np.int64)
                cand[idx] = 0  # keep exception slots out of the int stats
                return e, cand, idx, bits[exc].copy()
            return e, cand, None, None
    return None


def _decf_blob(values: np.ndarray, width: int) -> bytes | None:
    from tokenzip.codecs.selector import choose_int_codec

    dec = _try_decimal(values, width)
    if dec is None:
        return None
    e, ints, exc_idx, exc_bits = dec
    inner = encode_int_column(ints, choose_int_codec(ints, 64), 64)
    streams = [inner]
    if exc_idx is not None:
        # ascending positions: the delta-friendly int selector applies
        streams.append(
            encode_int_column(exc_idx, choose_int_codec(exc_idx, 64), 64)
        )
        streams.append(exc_bits.tobytes())
    return pack_blob(
        "decf", {"n": len(values), "w": width, "e": e}, streams
    )


def _xor_words(values: np.ndarray, width: int) -> np.ndarray:
    fdt, udt = _F_BITS[width]
    bits = np.ascontiguousarray(values, dtype=fdt).view(udt)
    x = np.empty(len(bits), udt)
    if len(bits):
        x[0] = bits[0]
        np.bitwise_xor(bits[1:], bits[:-1], out=x[1:])
    return x


def encode_float_column(values: np.ndarray, width: int = 64) -> bytes:
    """float column (width 32 or 64) -> smallest of the three float codecs
    (closed-form size comparison before any trial encode)."""
    fdt, udt = _F_BITS[width]
    values = np.ascontiguousarray(values, dtype=fdt)
    n = len(values)
    best = pack_blob("rawf", {"n": n, "w": width}, [values.view(udt).tobytes()])
    dec = _decf_blob(values, width)
    if dec is not None and len(dec) < len(best):
        best = dec
    if n < 2:
        return best
    x = _xor_words(values, width)
    for name, arr in (("xorf", x), ("xorf_bswap", x.byteswap())):
        est = int(leb128_size(arr.astype(np.uint64, copy=False)).sum())
        if est < len(best):  # header overhead < raw savings check via pack
            blob = pack_blob(
                name,
                {"n": n, "w": width},
                [encode_leb128(arr.astype(np.uint64, copy=False))],
            )
            if len(blob) < len(best):
                best = blob
    return best


def decode_float_column(blob: bytes) -> np.ndarray:
    codec, meta, streams = unpack_blob(blob)
    n = int(meta["n"])
    width = int(meta.get("w", 64))
    fdt, udt = _F_BITS[width]
    if codec == "rawf":
        b = streams[0]
        b = b if isinstance(b, np.ndarray) else np.frombuffer(b, dtype=np.uint8)
        return np.ascontiguousarray(b).view(udt)[:n].view(fdt)
    if codec == "decf":
        def _b(s):
            return s.tobytes() if isinstance(s, np.ndarray) else bytes(s)

        ints = decode_int_column(_b(streams[0]))
        # bit-exact by the encode-time verified contract
        out = np.ascontiguousarray(
            (ints / float(10 ** int(meta["e"]))).astype(fdt, copy=False)
        )
        if len(streams) == 3:  # ALP-style exceptions: patch raw bits back
            idx = decode_int_column(_b(streams[1]))
            out.view(udt)[idx] = np.frombuffer(_b(streams[2]), dtype=udt)
        return out
    if codec not in ("xorf", "xorf_bswap"):
        from tokenzip.errors import ChunkFormatError

        raise ChunkFormatError(f"unknown float codec {codec!r}")
    from tokenzip.codecs.varint import decode_leb128

    u = decode_leb128(streams[0], n, width=64).astype(udt)
    if codec == "xorf_bswap":
        u = u.byteswap()
    return np.bitwise_xor.accumulate(u).view(fdt)


def leb128_oracle_bytes(values: np.ndarray, width: int = 32) -> int:
    """The compressed-size bound: total bytes the reference rustc-serialize
    LEB128 encoder would produce for this (zigzagged) column
    (/root/reference/benches/varint_bench/leb128.rs:4-24)."""
    if len(values) == 0:
        return 0
    u = _zz(_as_i64(values), width)
    from tokenzip.codecs.native import native_size

    total = native_size(u)
    return total if total is not None else int(leb128_size(u).sum())
