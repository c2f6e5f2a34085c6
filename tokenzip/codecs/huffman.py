"""Canonical-Huffman coding for frequency-rank streams.

The rank streams produced by the ``rankdict`` / ``srank`` codecs are ideal
entropy-coding targets: ranks are assigned by DESCENDING count, so optimal
prefix-code lengths are nondecreasing in rank and the whole code table ships
as a ~40-byte counts-per-length histogram (no per-symbol table). This closes
the gap LEB128 leaves on sub-byte-entropy sources (the dominant ``web``
source: 6.5-bit/token entropy pays LEB128's 1-byte floor).

Public constructions only: Huffman 1952 optimal lengths via the two-queue
method (van Leeuwen 1976, O(k) on sorted counts), zlib-style length-cap
repair on the histogram, canonical code assignment ordered by
(length, symbol) — the DEFLATE convention (RFC 1951 §3.2.2). The reference's
static-lookup-table decode pattern (/root/reference/src/decode/lookup.rs) is
mirrored by the W-bit one-level decode LUT.

MAX_LEN caps code lengths at 24 (LUT covers <=12-bit codes; longer codes walk
the canonical first-code ladder). Encode/decode run as C kernels with exact
pure-Python mirrors behind the same ``TOKENZIP_NO_NATIVE`` kill-switch as the
LEB128 kernels.
"""

from __future__ import annotations

import numpy as np

from tokenzip.errors import ChunkFormatError

MAX_LEN = 24  # code-length cap (zlib repair keeps the tree complete)
LUT_BITS = 12  # one-level decode LUT covers codes up to this length


def huff_lengths(counts_desc: np.ndarray, max_len: int = MAX_LEN) -> np.ndarray:
    """Optimal (length-capped) prefix-code lengths for counts sorted
    NONINCREASING. Returns uint8 lengths per rank, nondecreasing in rank —
    the multiset of Huffman-optimal lengths reassigned monotonically (same
    total cost: shorter codes on more frequent symbols). k==1 gets length 0
    (zero-bit stream; the decoder replays the count)."""
    counts_desc = np.ascontiguousarray(counts_desc, dtype=np.int64)
    k = len(counts_desc)
    if k == 0:
        return np.empty(0, dtype=np.uint8)
    if k == 1:
        return np.zeros(1, dtype=np.uint8)
    if (counts_desc <= 0).any():
        raise ChunkFormatError("huffman counts must be positive")
    w_asc = counts_desc[::-1]
    depths = _native_depths(w_asc)
    if depths is None:
        depths = _py_depths(w_asc)
    # histogram of lengths, cap repair, monotone reassignment
    blc = np.bincount(depths, minlength=max_len + 1).astype(np.int64)
    if len(blc) > max_len + 1:
        overflow = int(blc[max_len + 1 :].sum())
        blc = blc[: max_len + 1]
        blc[max_len] += overflow
        # zlib tree.c gen_bitlen repair: restore the Kraft equality by
        # moving leaves up; each step trades one leaf at max_len for a
        # deeper sibling pair one level below some shorter leaf
        kraft = int((blc[1:] * (1 << (max_len - np.arange(1, max_len + 1)))).sum())
        full = 1 << max_len
        while kraft > full:
            bits = max_len - 1
            while blc[bits] == 0:
                bits -= 1
            blc[bits] -= 1
            blc[bits + 1] += 2
            blc[max_len] -= 1
            kraft = int(
                (blc[1:] * (1 << (max_len - np.arange(1, max_len + 1)))).sum()
            )
    return np.repeat(
        np.arange(len(blc), dtype=np.uint8), blc
    )  # nondecreasing lengths, rank order


def huff_lengths_any(counts: np.ndarray, max_len: int = MAX_LEN) -> np.ndarray:
    """Optimal capped lengths for positive counts in ARBITRARY symbol order
    (the srank layout: frequency-ranked table symbols plus a trailing escape
    symbol whose trained count need not be monotone). Sorts by descending
    count, computes monotone lengths, and unsorts."""
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    order = np.argsort(-counts, kind="stable")
    lens_sorted = huff_lengths(counts[order], max_len)
    out = np.empty(len(counts), dtype=np.uint8)
    out[order] = lens_sorted
    return out


def _py_depths(w_asc: np.ndarray) -> np.ndarray:
    """Two-queue Huffman leaf depths, pure Python (fallback / differential
    oracle). Weights ascending."""
    k = len(w_asc)
    leaf_parent = np.empty(k, dtype=np.int64)
    int_w: list[int] = []
    int_parent = np.empty(max(k - 1, 1), dtype=np.int64)
    li = ii = ni = 0
    w = w_asc.tolist()
    for _ in range(k - 1):
        picks = []
        for _ in range(2):
            if li < k and (ii >= ni or w[li] <= int_w[ii]):
                picks.append(("l", li))
                li += 1
            else:
                picks.append(("i", ii))
                ii += 1
        wsum = 0
        for kind, idx in picks:
            if kind == "l":
                wsum += w[idx]
                leaf_parent[idx] = ni
            else:
                wsum += int_w[idx]
                int_parent[idx] = ni
        int_w.append(wsum)
        ni += 1
    idepth = np.zeros(max(ni, 1), dtype=np.int64)
    for j in range(ni - 2, -1, -1):
        idepth[j] = idepth[int_parent[j]] + 1
    return (idepth[leaf_parent] + 1).astype(np.int64) if ni else np.zeros(k, np.int64)


def _native_depths(w_asc: np.ndarray) -> np.ndarray | None:
    from tokenzip.codecs.native import native_huff_depths

    return native_huff_depths(w_asc)


def canonical_tables(lens_by_sym: np.ndarray):
    """Canonical code assignment ordered by (length, symbol) — RFC 1951
    convention. Returns (codes uint32 by symbol, blc int64[maxlen+1],
    first_code int64[maxlen+1], first_sym int64[maxlen+1], sym_ordered
    uint32: symbols sorted by (length, symbol))."""
    lens = np.ascontiguousarray(lens_by_sym, dtype=np.uint8)
    k = len(lens)
    maxlen = int(lens.max()) if k else 0
    if maxlen > MAX_LEN:
        raise ChunkFormatError("huffman length exceeds cap")
    blc = np.bincount(lens, minlength=maxlen + 1).astype(np.int64)
    if maxlen == 0:
        empty = np.zeros(1, dtype=np.int64)
        return (
            np.zeros(k, np.uint32),
            blc,
            empty,
            empty.copy(),
            np.arange(k, dtype=np.uint32),
        )
    blc0 = blc.copy()
    blc0[0] = 0  # length-0 symbols never occur in streams with k >= 2
    first_code = np.zeros(maxlen + 1, dtype=np.int64)
    for l in range(1, maxlen + 1):
        first_code[l] = (first_code[l - 1] + blc0[l - 1]) << 1
    if int(first_code[maxlen] + blc0[maxlen]) > (1 << maxlen):
        raise ChunkFormatError("huffman histogram violates Kraft inequality")
    first_sym = np.zeros(maxlen + 1, dtype=np.int64)
    first_sym[1:] = np.cumsum(blc0)[:-1]
    # symbols sorted by (len, sym): stable argsort on lengths
    sym_ordered = np.argsort(lens, kind="stable").astype(np.uint32)
    codes = np.zeros(k, dtype=np.uint32)
    pos_within = np.arange(k, dtype=np.int64) - first_sym[lens[sym_ordered]]
    codes[sym_ordered] = (first_code[lens[sym_ordered]] + pos_within).astype(
        np.uint32
    )
    return codes, blc0, first_code, first_sym, sym_ordered


def _build_lut(blc, first_code, first_sym, sym_ordered, w: int = LUT_BITS):
    """One-level decode LUT: for each length l <= w, every code of that
    length owns 2^(w-l) consecutive w-bit prefixes."""
    size = 1 << w
    lut_sym = np.zeros(size, dtype=np.uint32)
    lut_len = np.zeros(size, dtype=np.uint8)
    maxlen = len(blc) - 1
    for l in range(1, min(maxlen, w) + 1):
        cnt = int(blc[l])
        if not cnt:
            continue
        span = 1 << (w - l)
        start = int(first_code[l]) << (w - l)
        syms = sym_ordered[int(first_sym[l]) : int(first_sym[l]) + cnt]
        lut_sym[start : start + cnt * span] = np.repeat(syms, span)
        lut_len[start : start + cnt * span] = l
    return lut_sym, lut_len


def encode_syms(syms: np.ndarray, lens_by_sym: np.ndarray) -> bytes:
    """Huffman-encode a uint32 symbol stream with the given per-symbol
    lengths (MSB-first canonical codes)."""
    syms = np.ascontiguousarray(syms, dtype=np.uint32)
    n = len(syms)
    k = len(lens_by_sym)
    if n == 0:
        return b""
    if k == 1:
        if int(syms.max()) != 0:
            raise ChunkFormatError("symbol out of range for k=1 table")
        return b""  # zero-bit codes
    codes, blc, first_code, first_sym, sym_ordered = canonical_tables(lens_by_sym)
    lens = np.ascontiguousarray(lens_by_sym, dtype=np.uint8)
    from tokenzip.codecs.native import native_huff_encode

    nbits = int(lens[syms].astype(np.int64).sum())
    out = native_huff_encode(syms, codes, lens, nbits)
    if out is not None:
        return out
    # pure-Python mirror (kill-switch / differential oracle)
    acc = 0
    nb = 0
    parts = bytearray()
    cl = codes.tolist()
    ll = lens.tolist()
    for s in syms.tolist():
        if s >= k:
            raise ChunkFormatError("symbol out of range")
        l = ll[s]
        acc = (acc << l) | cl[s]
        nb += l
        while nb >= 8:
            nb -= 8
            parts.append((acc >> nb) & 0xFF)
    if nb:
        parts.append((acc << (8 - nb)) & 0xFF)
    return bytes(parts)


def decode_syms(data, n: int, lens_by_sym: np.ndarray) -> np.ndarray:
    """Decode n symbols from a canonical-Huffman stream. Raises
    ChunkFormatError on truncation/corruption."""
    k = len(lens_by_sym)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    if k == 0:
        raise ChunkFormatError("huffman decode with empty table")
    if k == 1:
        return np.zeros(n, dtype=np.uint32)
    b = data if isinstance(data, np.ndarray) else np.frombuffer(data, dtype=np.uint8)
    codes, blc, first_code, first_sym, sym_ordered = canonical_tables(lens_by_sym)
    maxlen = len(blc) - 1
    w = min(LUT_BITS, max(maxlen, 1))
    lut_sym, lut_len = _build_lut(blc, first_code, first_sym, sym_ordered, w)
    from tokenzip.codecs.native import native_huff_decode

    res = native_huff_decode(
        np.ascontiguousarray(b), n, w, lut_sym, lut_len,
        maxlen, blc, first_code, first_sym, sym_ordered,
    )
    if res is not None:
        rc, out = res
        if rc != 0:
            raise ChunkFormatError("huffman stream truncated or corrupt")
        return out
    # pure-Python mirror
    out = np.empty(n, dtype=np.uint32)
    acc = nb = pos = 0
    nbytes = len(b)
    total_bits = nbytes * 8
    used = 0
    bl = b.tolist()
    fc = first_code.tolist()
    fs = first_sym.tolist()
    bc = blc.tolist()
    for i in range(n):
        while nb <= 56 and pos < nbytes:
            acc = (acc << 8) | bl[pos]
            pos += 1
            nb += 8
        peek = (
            (acc >> (nb - w)) & ((1 << w) - 1)
            if nb >= w
            else (acc << (w - nb)) & ((1 << w) - 1)
        )
        l = int(lut_len[peek])
        if l:
            sym = int(lut_sym[peek])
        else:
            ll2 = w + 1
            while True:
                if ll2 > maxlen:
                    raise ChunkFormatError("huffman stream corrupt")
                code = (
                    (acc >> (nb - ll2)) & ((1 << ll2) - 1)
                    if nb >= ll2
                    else (acc << (ll2 - nb)) & ((1 << ll2) - 1)
                )
                off = code - fc[ll2]
                if 0 <= off < bc[ll2]:
                    sym = int(sym_ordered[fs[ll2] + off])
                    l = ll2
                    break
                ll2 += 1
        used += l
        if used > total_bits:
            raise ChunkFormatError("huffman stream truncated")
        nb -= l
        out[i] = sym
    return out


def lens_from_blc(blc: list[int] | np.ndarray) -> np.ndarray:
    """Per-rank lengths from a counts-per-length histogram (index 0 =
    length 1) — the monotone rank-order layout rankdict ships in metadata."""
    blc = np.asarray(blc, dtype=np.int64)
    if (blc < 0).any():
        raise ChunkFormatError("negative counts-per-length")
    return np.repeat(np.arange(1, len(blc) + 1, dtype=np.uint8), blc)


def blc_from_lens(lens: np.ndarray) -> list[int]:
    """Inverse of lens_from_blc for monotone per-rank lengths."""
    lens = np.asarray(lens)
    maxlen = int(lens.max()) if len(lens) else 0
    blc = np.bincount(lens, minlength=maxlen + 1)[1:]
    return [int(x) for x in blc]
